"""Measure Pallas fused CFFT vs the jnp matrix-view path on the TPU.

Prints one line per (log_n, path): best per-iteration seconds and points/s.
Used to pick the Pallas dispatch window in ops/fft.py (see PERF.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops.pallas import fft_kernels
from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                     domain_line_twiddles,
                                     precompute_twiddles)

P = (1 << 31) - 1


def timeit(fn, iters=10, min_time=0.5):
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
    batches = [1, 8]
    for log_n in [10, 12, 14, 16, 18, 20, 21, 22]:
        n = 1 << log_n
        domain = CanonicCoset.new(log_n).circle_domain()
        tree = precompute_twiddles(domain.half_coset)
        line = tuple(domain_line_twiddles(log_n, tree))
        circ = circle_layer_twiddles(line[0])
        rng = np.random.default_rng(log_n)
        for b in batches:
            if b * n > (1 << 24):
                continue
            shape = (n,) if b == 1 else (b, n)
            vals = jnp.asarray(rng.integers(0, P, size=shape, dtype=np.uint32))

            def jnp_path():
                return fft_ops.fft_natural_to_bitrev(vals, line, circ)

            try:
                dt_jnp = timeit(jnp_path)
            except Exception as e:
                print(f"log{log_n} b{b} jnp FAILED: {type(e).__name__} {e}",
                      flush=True)
                dt_jnp = None

            def pallas_path():
                if b == 1:
                    return fft_kernels.fft_fused(vals, line, circ, log_n)
                return jax.vmap(
                    lambda v: fft_kernels.fft_fused(v, line, circ, log_n)
                )(vals)

            try:
                dt_pal = timeit(pallas_path)
                # parity check on TPU
                got = np.asarray(pallas_path())
                want = np.asarray(jnp_path())
                ok = np.array_equal(got, want)
            except Exception as e:
                print(f"log{log_n} b{b} pallas FAILED: {type(e).__name__} {e}",
                      flush=True)
                dt_pal, ok = None, False
            msg = f"log{log_n} b{b}:"
            if dt_jnp:
                msg += f" jnp {dt_jnp*1e3:8.3f} ms ({b*n/dt_jnp/1e6:9.1f} Mpts/s)"
            if dt_pal:
                msg += (f" | pallas {dt_pal*1e3:8.3f} ms"
                        f" ({b*n/dt_pal/1e6:9.1f} Mpts/s) parity={ok}")
            print(msg, flush=True)


if __name__ == "__main__":
    main()
