"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: M31 modular-multiply throughput per chip (the reference's only
published number is 8.37e6 scalar muls/s on its CI host -- BASELINE.md).
Also measures CFFT points/s and end-to-end proof latency; those ride along
in auxiliary fields of the same JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_M31_MUL_OPS = 8_373_829.24  # reference bench/results.json


def bench_m31_mul():
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.ops import m31

    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))

    @jax.jit
    def chain(a, b):
        # 8 dependent muls to amortize launch overhead while staying
        # compute-bound
        x = a
        for _ in range(8):
            x = m31.mul(x, b)
        return x

    chain(a, b).block_until_ready()  # compile
    iters = 10
    t0 = time.perf_counter()
    x = None
    for _ in range(iters):
        x = chain(a, b)
    x.block_until_ready()
    dt = time.perf_counter() - t0
    return 8 * n * iters / dt


def bench_cfft(log_n=20):
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    n = 1 << log_n
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = domain_line_twiddles(log_n, tree)
    circ = circle_layer_twiddles(line[0])
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))
    fft_ops.fft_natural_to_bitrev(vals, line, circ).block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fft_ops.fft_natural_to_bitrev(vals, line, circ)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return n * iters / dt


def bench_cfft_pallas(log_n=20):
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops.pallas import fft_kernels
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    n = 1 << log_n
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = tuple(domain_line_twiddles(log_n, tree))
    circ = circle_layer_twiddles(line[0])
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))
    fft_kernels.fft_fused(vals, line, circ, log_n).block_until_ready()
    iters = 20
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fft_kernels.fft_fused(vals, line, circ, log_n)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return n * iters / dt


def bench_m31_mul_pallas():
    import jax.numpy as jnp

    from tstwo_tpu.ops.pallas import m31_kernels

    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32))
    m31_kernels.mul_chain(a, b, reps=8).block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = m31_kernels.mul_chain(a, b, reps=8)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return 8 * n * iters / dt


def bench_prove():
    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)

    t0 = time.perf_counter()
    proof, component, config = prove_basic_air(log_num_rows=4)
    prove_s = time.perf_counter() - t0
    verify_basic_air(proof, component, config, log_num_rows=4)
    return prove_s


def _try(fn, *a):
    try:
        return fn(*a)
    except Exception:
        return None


def main():
    m31_xla = bench_m31_mul()
    m31_pallas = _try(bench_m31_mul_pallas)
    cfft_xla = _try(bench_cfft)
    cfft_pallas = _try(bench_cfft_pallas)
    prove_seconds = _try(bench_prove)
    best = max(m31_xla, m31_pallas or 0)
    print(json.dumps({
        "metric": "m31_mul_ops_per_s",
        "value": best,
        "unit": "ops/s",
        "vs_baseline": best / BASELINE_M31_MUL_OPS,
        "aux": {
            "m31_mul_xla": m31_xla,
            "m31_mul_pallas": m31_pallas,
            "cfft_points_per_s_log20_xla": cfft_xla,
            "cfft_points_per_s_log20_pallas": cfft_pallas,
            "prove_basic_air_seconds_log4": prove_seconds,
        },
    }))


if __name__ == "__main__":
    main()
