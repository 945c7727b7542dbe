"""Empirical roofline study on the bench TPU (v5e single chip).

Measures:
  1. raw VPU int32 throughput (dependent add chain, compute-bound)
  2. HBM streaming bandwidth (single elementwise pass)
  3. M31 modular multiply: jnp twin vs Pallas mul_chain kernel
  4. QM31 multiply
  5. CFFT at 2^22/2^24: dispatched path (Pallas fft_large) vs forced jnp

Prints a table used by PERF.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = (1 << 31) - 1


def timeit(fn, iters=10, min_time=0.6):
    jax.block_until_ready(fn())
    for _ in range(2):
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
        best = min(best, batch / iters) if best else batch / iters
    return best


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    n = 1 << 24
    a = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))

    # 1. raw int32 VPU ops (dependent adds; 64 per element, one HBM trip)
    REPS = 64

    @jax.jit
    def add_chain(a, b):
        x = a
        for _ in range(REPS):
            x = x + b
        return x

    dt = timeit(lambda: add_chain(a, b))
    int_peak = REPS * n / dt
    print(f"raw int32 add chain: {int_peak:.3e} ops/s "
          f"({dt*1e3:.2f} ms / {REPS} reps)", flush=True)

    # 2. HBM streaming bandwidth (read n*4 + write n*4 bytes)
    @jax.jit
    def copy_add(a):
        return a + jnp.uint32(1)

    dt = timeit(lambda: copy_add(a))
    bw = 8.0 * n / dt
    print(f"HBM stream (1 read + 1 write): {bw/1e9:.1f} GB/s "
          f"({dt*1e3:.3f} ms)", flush=True)

    # 3. M31 mul: jnp twin vs pallas kernel (8 dependent muls / element)
    from tstwo_tpu.ops import m31
    from tstwo_tpu.ops.pallas import m31_kernels

    @jax.jit
    def jnp_chain(a, b):
        x = a
        for _ in range(8):
            x = m31.mul(x, b)
        return x

    dt_j = timeit(lambda: jnp_chain(a, b))
    print(f"m31 mul jnp:    {8*n/dt_j:.3e} mul/s ({dt_j*1e3:.2f} ms)",
          flush=True)
    try:
        dt_p = timeit(lambda: m31_kernels.mul_chain(a, b, reps=8))
        ok = np.array_equal(np.asarray(m31_kernels.mul_chain(a, b, reps=8)),
                            np.asarray(jnp_chain(a, b)))
        print(f"m31 mul pallas: {8*n/dt_p:.3e} mul/s ({dt_p*1e3:.2f} ms) "
              f"parity={ok}", flush=True)
    except Exception as e:
        print(f"m31 mul pallas FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)

    # 4. QM31 mul
    from tstwo_tpu.ops import qm31

    q = jnp.asarray(rng.integers(0, P, size=(4, 1 << 22), dtype=np.uint32))
    r = jnp.asarray(rng.integers(0, P, size=(4, 1 << 22), dtype=np.uint32))

    @jax.jit
    def qchain(q, r):
        x = q
        for _ in range(4):
            x = qm31.mul(x, r)
        return x

    dt = timeit(lambda: qchain(q, r))
    print(f"qm31 mul: {4*(1<<22)/dt:.3e} mul/s ({dt*1e3:.2f} ms)", flush=True)

    # 5. CFFT dispatched (pallas) vs forced jnp at 2^22, 2^24
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    for log_n in (22, 24):
        nn = 1 << log_n
        domain = CanonicCoset.new(log_n).circle_domain()
        tree = precompute_twiddles(domain.half_coset)
        line = tuple(domain_line_twiddles(log_n, tree))
        circ = circle_layer_twiddles(line[0])
        vals = jnp.asarray(rng.integers(0, P, size=nn, dtype=np.uint32))
        os.environ["TSTWO_FFT_KERNEL"] = "auto"
        fwd_auto = timeit(
            lambda: fft_ops.fft_natural_to_bitrev(vals, line, circ))
        out_auto = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
        os.environ["TSTWO_FFT_KERNEL"] = "jnp"
        fft_ops.fft_natural_to_bitrev.clear_cache()
        fwd_jnp = timeit(
            lambda: fft_ops.fft_natural_to_bitrev(vals, line, circ))
        out_jnp = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
        os.environ["TSTWO_FFT_KERNEL"] = "auto"
        fft_ops.fft_natural_to_bitrev.clear_cache()
        print(f"cfft log{log_n}: dispatched {nn/fwd_auto/1e6:.0f} Mpts/s "
              f"({fwd_auto*1e3:.2f} ms) | forced-jnp {nn/fwd_jnp/1e6:.0f} "
              f"Mpts/s ({fwd_jnp*1e3:.2f} ms) "
              f"parity={np.array_equal(out_auto, out_jnp)}", flush=True)


if __name__ == "__main__":
    main()
