"""Serial-dependent Merkle/Blake2s measurements (no caching possible)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tstwo_tpu.ops import blake2s as b2
from scripts.measure_merkle import hash64_wm, merkle_level_wm

P = (1 << 31) - 1


def main():
    rng = np.random.default_rng(0)
    log_n = 21
    n = 1 << log_n

    # serial chain: hash level -> expand digests back to 16 words -> hash
    @jax.jit
    def chain_nm(words, k=8):
        for _ in range(k):
            d = b2.hash_u32_batch(words, byte_len=64)   # [N, 8]
            words = jnp.concatenate([d, d], axis=1)     # [N, 16]
        return words

    @jax.jit
    def chain_wm(msg, k=8):
        for _ in range(k):
            d = hash64_wm(msg)                          # [8, N]
            msg = jnp.concatenate([d, d], axis=0)       # [16, N]
        return msg

    words = jnp.asarray(rng.integers(0, 2**32, size=(n, 16), dtype=np.uint32))
    msg = jnp.asarray(np.asarray(words).T.copy())

    for name, fn, arg in (("chain  [N,16]", chain_nm, words),
                          ("chain  [16,N]", chain_wm, msg)):
        jax.block_until_ready(fn(arg))
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(arg))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rate = 8 * n / best
        print(f"{name} 8x serial n=2^{log_n}: {best*1e3:.2f} ms"
              f" = {rate/1e6:.1f} Mhash/s")

    # one-level timing with fresh inputs each call (defeat any result cache)
    inputs = [jnp.asarray(rng.integers(0, 2**32, size=(n, 16),
                                       dtype=np.uint32)) for _ in range(8)]
    f = jax.jit(lambda w: b2.hash_u32_batch(w, byte_len=64))
    jax.block_until_ready(f(inputs[0]))
    t0 = time.perf_counter()
    outs = [f(w) for w in inputs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(inputs)
    print(f"one level fresh-input [N,16]: {dt*1e3:.2f} ms"
          f" = {n/dt/1e6:.1f} Mhash/s")

    # full current tree, serial-dependent across iterations
    from tstwo_tpu.vcs.prover import _commit_all_layers

    @jax.jit
    def tree_chain(cols, k=4):
        for _ in range(k):
            layers = _commit_all_layers(log_n, cols)
            # feed root back into col0 to serialize
            cols = tuple(jnp.where(jnp.arange(c.shape[0]) < 8,
                                   c ^ layers[0][0, 0], c) for c in cols)
        return cols
    cols = tuple(jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
                 for _ in range(4))
    jax.block_until_ready(tree_chain(cols))
    t0 = time.perf_counter()
    jax.block_until_ready(tree_chain(cols))
    dt = (time.perf_counter() - t0) / 4
    print(f"tree serial 2^{log_n} x4cols: {dt*1e3:.2f} ms"
          f" = {2*n/dt/1e6:.1f} Mhash/s")


if __name__ == "__main__":
    main()
