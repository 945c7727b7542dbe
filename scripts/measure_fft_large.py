"""Measure two-stage blocked Pallas CFFT (fft_large) vs jnp path on TPU."""
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
    for log_n, b, chunk in [(18, 1, 15), (18, 8, 15), (20, 1, 16),
                            (20, 4, 16), (22, 1, 16), (24, 1, 16),
                            (22, 1, 18), (24, 1, 18)]:
        n = 1 << log_n
        domain = CanonicCoset.new(log_n).circle_domain()
        tree = precompute_twiddles(domain.half_coset)
        line = tuple(domain_line_twiddles(log_n, tree))
        circ = circle_layer_twiddles(line[0])
        rng = np.random.default_rng(log_n)
        shape = (n,) if b == 1 else (b, n)
        vals = jnp.asarray(rng.integers(0, P, size=shape, dtype=np.uint32))

        def jnp_path():
            return fft_ops.fft_natural_to_bitrev(vals, line, circ)

        def pallas_path():
            if b == 1:
                return fft_kernels.fft_large(vals, line, circ, log_n,
                                             chunk_log=chunk)
            return jax.vmap(lambda v: fft_kernels.fft_large(
                v, line, circ, log_n, chunk_log=chunk))(vals)

        msg = f"log{log_n} b{b} chunk{chunk}:"
        try:
            dt_jnp = timeit(jnp_path)
            msg += f" jnp {dt_jnp*1e3:8.3f} ms ({b*n/dt_jnp/1e6:9.1f} Mpts/s)"
        except Exception as e:
            msg += f" jnp FAILED {type(e).__name__}"
        try:
            dt_pal = timeit(pallas_path)
            got = np.asarray(pallas_path())
            want = np.asarray(jnp_path())
            ok = bool(np.array_equal(got, want))
            msg += (f" | pallas {dt_pal*1e3:8.3f} ms"
                    f" ({b*n/dt_pal/1e6:9.1f} Mpts/s) parity={ok}")
        except Exception as e:
            msg += f" | pallas FAILED {type(e).__name__}: {str(e)[:100]}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
