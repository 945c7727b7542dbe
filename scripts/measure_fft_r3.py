"""Round-3 CFFT measurements: batched/compact-twiddle fft_large vs XLA.

Tunnel-proof methodology: the axon tunnel result-caches identical
(executable, args) pairs, block_until_ready returns early, and a
device->host fetch costs ~25 ms.  So every timing below runs a
serially-dependent K-iteration chain inside ONE jit, fetches 4 words, and
reports (time(K2) - time(K1)) / (K2 - K1) -- all constant costs
(dispatch, fetch) cancel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

P = (1 << 31) - 1
K1, K2 = 4, 20


def delta_time(make_chain, x):
    """make_chain(k) -> jitted fn x->x applying the op k times."""
    c1 = make_chain(K1)
    c2 = make_chain(K2)
    t = {}
    for name, c in (("k1", c1), ("k2", c2)):
        y = c(x)
        _ = np.asarray(y.reshape(-1)[:4])  # compile + settle
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            y = c(y)
            _ = np.asarray(y.reshape(-1)[:4])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        t[name] = best
    return (t["k2"] - t["k1"]) / (K2 - K1)


def main():
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.ops import fft as fft_ops
    from tstwo_tpu.ops.pallas.fft_kernels import (_fft_large_impl,
                                                  cached_layouts)
    from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                         domain_line_twiddles,
                                         precompute_twiddles)

    rng = np.random.default_rng(0)
    for log_n, batch in ((20, 1), (22, 1), (24, 1), (20, 4), (18, 16)):
        n = 1 << log_n
        domain = CanonicCoset.new(log_n).circle_domain()
        tree = precompute_twiddles(domain.half_coset)
        line = tuple(domain_line_twiddles(log_n, tree))
        circ = circle_layer_twiddles(line[0])
        cl = min(16, log_n - 1)
        layouts = cached_layouts(line, circ, log_n, cl)
        n1 = 1 << (log_n - cl)
        r2 = 1 << (cl - 7)
        total = batch * n

        def make_p(k):
            @jax.jit
            def chain(v3):
                for _ in range(k):
                    v3 = _fft_large_impl(v3, layouts, log_n, cl, False,
                                         True, False)
                return v3
            return chain

        def make_x(k):
            @jax.jit
            def chain(v):
                for _ in range(k):
                    v = fft_ops._fft_dispatch_jnp(v, line, circ, log_n,
                                                  False)
                return v
            return chain

        shape = (batch, n) if batch > 1 else (n,)
        x = jnp.asarray(rng.integers(0, P, size=shape, dtype=np.uint32))
        tp = delta_time(make_p, x.reshape(-1, n1, r2, 128))
        tx = delta_time(make_x, x)
        print(f"2^{log_n} x{batch}: pallas {tp*1e3:7.3f} ms "
              f"({total/tp/1e6:7.0f} Mpts/s)   "
              f"xla {tx*1e3:7.3f} ms ({total/tx/1e6:7.0f} Mpts/s)  "
              f"speedup {tx/tp:.2f}x", flush=True)


if __name__ == "__main__":
    main()
