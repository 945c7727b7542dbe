"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: M31 modular-multiply throughput per chip (the reference's only
published number is 8.37e6 scalar muls/s on its CI host -- BASELINE.md).
The aux dict carries the five BASELINE.json benchmark configs:
  1. field-op batch throughput (m31 / qm31 multiply)
  2. CFFT round trip at 2^20 (incl. bit-reverse)
  3. SecureColumn DEEP-quotient accumulation at 2^20
  4. FRI commit + Blake2s Merkle on a 2^22 column
  5. end-to-end AIR prove+verify (canonical + wide-Fibonacci)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# Persistent compilation cache: the fused prove/FRI programs take minutes of
# XLA compile on first build; cache them across bench runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np

BASELINE_M31_MUL_OPS = 8_373_829.24  # reference bench/results.json
P = (1 << 31) - 1


def _timeit(fn, iters, min_time=1.0):
    """Steady-state per-iteration time: ramp the dispatch pipeline first
    (the tunneled TPU takes a few batches to reach steady state -- the same
    executable measures 16M pts/s on its first 10-iteration batch and 800M+
    once warm), then take the best batch over >= min_time of wall clock."""
    import jax

    jax.block_until_ready(fn())  # compile
    for _ in range(3):  # ramp batches
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
    best = None
    elapsed = 0.0
    while elapsed < min_time:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        batch = time.perf_counter() - t0
        elapsed += batch
        dt = batch / iters
        best = dt if best is None else min(best, dt)
    return best


def bench_m31_mul():
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.ops import m31

    n = 1 << 24
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(8):
            x = m31.mul(x, b)
        return x

    dt = _timeit(lambda: chain(a, b), 10)
    return 8 * n / dt


def bench_qm31_mul():
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.ops import qm31

    n = 1 << 22
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, P, size=(4, n), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=(4, n), dtype=np.uint32))

    @jax.jit
    def chain(a, b):
        x = a
        for _ in range(4):
            x = qm31.mul(x, b)
        return x

    dt = _timeit(lambda: chain(a, b), 10)
    return 4 * n / dt


def bench_cfft_roundtrip(log_n=20):
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
    line = tuple(domain_line_twiddles(log_n, tree))
    circ = circle_layer_twiddles(line[0])
    line_i = tuple(domain_line_twiddles(log_n, tree, inverse=True))
    circ_i = circle_layer_twiddles(line_i[0])
    n_inv = jnp.uint32(pow(n, P - 2, P))
    rng = np.random.default_rng(1)
    vals = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))

    from tstwo_tpu.ops import m31

    @jax.jit
    def roundtrip(v):
        ev = fft_ops.fft_natural_to_bitrev(v, line, circ)
        nat = fft_ops.bit_reverse(ev, log_n)      # natural-order view
        ev2 = fft_ops.bit_reverse(nat, log_n)     # back to bit-reversed
        back = fft_ops.ifft_bitrev_to_natural(ev2, line_i, circ_i)
        return m31.mul(back, n_inv)

    dt = _timeit(lambda: roundtrip(vals), 10)
    return n / dt


def bench_quotients(log_n=20):
    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN, CanonicCoset
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.ops import m31 as m31_ops
    from tstwo_tpu.pcs.quotients import (ColumnSampleBatch, PointSample,
                                         accumulate_quotients)
    import jax

    rng = np.random.default_rng(2)
    n = 1 << log_n
    domain = CanonicCoset.new(log_n).circle_domain()
    cols = [m31_ops.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
            for _ in range(4)]
    point = SECURE_FIELD_CIRCLE_GEN
    samples = [[PointSample(point, QM31.from_u32_unchecked(i + 1, 2, 3, 4))]
               for i in range(4)]
    batches = ColumnSampleBatch.new_vec(samples)
    coeff = QM31.from_u32_unchecked(5, 6, 7, 8)

    def run():
        return accumulate_quotients(domain, cols, coeff, batches, 1).values

    dt = _timeit(run, 5)
    return 4 * n / dt  # column-rows per second


def bench_fri_commit(log_n=22):
    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.fri import FriConfig, FriProver
    from tstwo_tpu.ops import m31 as m31_ops
    from tstwo_tpu.poly.circle_poly import SecureCirclePoly
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    rng = np.random.default_rng(3)
    config = FriConfig(0, 1, 10)
    coeffs = rng.integers(0, P, size=(4, 1 << (log_n - 1)), dtype=np.uint32)
    sp = SecureCirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(log_n).circle_domain()
    ev = sp.evaluate(domain)
    tree = precompute_twiddles(domain.half_coset)

    def run():
        ch = Blake2sChannel()
        return FriProver.commit(ch, config, [ev], tree)

    t0 = time.perf_counter()
    run()
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    return (1 << log_n) / dt


def bench_prove():
    from tstwo_tpu.examples.basic_air import (prove_basic_air,
                                              verify_basic_air)

    prove_basic_air(log_num_rows=4)  # warm (trace + compile cache)
    t0 = time.perf_counter()
    proof, component, config = prove_basic_air(log_num_rows=4)
    prove_s = time.perf_counter() - t0
    verify_basic_air(proof, component, config, log_num_rows=4)
    return prove_s


def bench_prove_wide_fib(log_n_rows=8, seq=32):
    from tstwo_tpu.examples.wide_fibonacci import (prove_wide_fibonacci,
                                                  verify_wide_fibonacci)

    # warm (compile)
    prove_wide_fibonacci(log_n_rows=log_n_rows, sequence_length=seq)
    t0 = time.perf_counter()
    proof, component, config = prove_wide_fibonacci(
        log_n_rows=log_n_rows, sequence_length=seq)
    dt = time.perf_counter() - t0
    verify_wide_fibonacci(proof, component, config, log_n_rows=log_n_rows)
    return dt


def bench_gkr_layers(log_n=20):
    """Device GKR grand-product layer generation over a 2^log_n hypercube:
    full layer tower (log_n halvings), layers per second."""
    import jax
    import jax.numpy as jnp

    from tstwo_tpu.lookups.gkr import GRAND_PRODUCT, Layer, _gen_layers
    from tstwo_tpu.lookups.mle import Mle

    rng = np.random.default_rng(9)
    evals = jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log_n), dtype=np.uint32))

    def run():
        layers = _gen_layers(Layer(GRAND_PRODUCT, data=Mle(evals)))
        jax.block_until_ready(layers[-1].data.evals)
        return layers

    run()  # compile all sizes
    t0 = time.perf_counter()
    layers = run()
    dt = time.perf_counter() - t0
    return len(layers) / dt


def _try(fn, *a, **k):
    try:
        return fn(*a, **k)
    except Exception:
        return None


def main():
    m31_ops_per_s = bench_m31_mul()
    aux = {
        "qm31_mul_ops_per_s": _try(bench_qm31_mul),
        "cfft_roundtrip_points_per_s_log20": _try(bench_cfft_roundtrip),
        "cfft_roundtrip_points_per_s_log24": _try(bench_cfft_roundtrip, 24),
        "quotient_cells_per_s_log20": _try(bench_quotients),
        "fri_commit_points_per_s_log22": _try(bench_fri_commit),
        "prove_basic_air_seconds_log4": _try(bench_prove),
        "prove_wide_fib_seconds_log8x32": _try(bench_prove_wide_fib),
        "gkr_layers_per_s_log20": _try(bench_gkr_layers),
    }
    print(json.dumps({
        "metric": "m31_mul_ops_per_s",
        "value": m31_ops_per_s,
        "unit": "ops/s",
        "vs_baseline": m31_ops_per_s / BASELINE_M31_MUL_OPS,
        "aux": aux,
    }))


if __name__ == "__main__":
    main()
