"""Profile the Merkle/Blake2s stage: current layout vs word-major prototype.

Run on the real TPU: python scripts/measure_merkle.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tstwo_tpu.ops import blake2s as b2

P = (1 << 31) - 1


def timeit(fn, iters=5, ramp=2):
    jax.block_until_ready(fn())
    for _ in range(ramp):
        jax.block_until_ready(fn())
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        best = dt if best is None else min(best, dt)
    return best


# ---------------- word-major prototype ----------------

def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _g(v, a, b, c, d, x, y):
    v[a] = v[a] + v[b] + x
    v[d] = _rotr(v[d] ^ v[a], 16)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 12)
    v[a] = v[a] + v[b] + y
    v[d] = _rotr(v[d] ^ v[a], 8)
    v[c] = v[c] + v[d]
    v[b] = _rotr(v[b] ^ v[c], 7)


def compress_wm(h, m, t, is_final):
    """h: list of 8 [N] arrays; m: list of 16 [N] arrays."""
    n = h[0].shape
    v = list(h) + [jnp.broadcast_to(jnp.uint32(b2.IV[i]), n) for i in range(8)]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if is_final:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)
    for r in range(10):
        s = b2.SIGMA[r]
        _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
        _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
        _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
        _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
        _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
        _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
        _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
        _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


@jax.jit
def hash64_wm(msg):
    """msg: u32[16, N] -> u32[8, N]."""
    n = msg.shape[1]
    h = [jnp.broadcast_to(jnp.uint32(b2.H0[i]), (n,)) for i in range(8)]
    out = compress_wm(h, [msg[i] for i in range(16)], 64, True)
    return jnp.stack(out)


@jax.jit
def merkle_level_wm(level):
    """level: u32[8, N] digests word-major -> parents u32[8, N/2]."""
    m = level.reshape(8, -1, 2)
    msg = jnp.concatenate([m[:, :, 0], m[:, :, 1]])  # [16, N/2]
    return hash64_wm(msg)


@jax.jit
def tree_wm(leaves):
    """Full tree from u32[8, N] leaf digests; returns root level list."""
    levels = [leaves]
    cur = leaves
    while cur.shape[1] > 1:
        cur = merkle_level_wm(cur)
        levels.append(cur)
    return levels[-1]


def main():
    rng = np.random.default_rng(0)
    log_n = 21
    n = 1 << log_n

    # 1. current layout: one 64-byte-message level
    words = jnp.asarray(rng.integers(0, 2**32, size=(n, 16), dtype=np.uint32))
    f = jax.jit(lambda w: b2.hash_u32_batch(w, byte_len=64))
    dt = timeit(lambda: f(words))
    print(f"current [N,16] one level n=2^{log_n}: {dt*1e3:.2f} ms "
          f"= {n/dt/1e6:.1f} Mhash/s")

    # 2. word-major one level
    words_t = jnp.asarray(words.T)  # [16, N]
    dt = timeit(lambda: hash64_wm(words_t))
    print(f"word-major [16,N] one level n=2^{log_n}: {dt*1e3:.2f} ms "
          f"= {n/dt/1e6:.1f} Mhash/s")

    # 3. full tree comparison at 2^21 leaves (digests given)
    leaves_nm = jnp.asarray(rng.integers(0, 2**32, size=(n, 8),
                                         dtype=np.uint32))
    from tstwo_tpu.vcs.prover import _commit_all_layers
    cols = tuple(jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
                 for _ in range(4))
    dt = timeit(lambda: _commit_all_layers(log_n, cols), iters=3)
    tot = 2 * n
    print(f"current _commit_all_layers 2^{log_n} x4cols: {dt*1e3:.2f} ms "
          f"= {tot/dt/1e6:.1f} Mhash/s = {n/dt/1e6:.1f} Mpts/s")

    leaves_wm = jnp.asarray(np.asarray(leaves_nm).T.copy())
    dt = timeit(lambda: tree_wm(leaves_wm), iters=3)
    print(f"word-major tree (pure levels) 2^{log_n}: {dt*1e3:.2f} ms "
          f"= {tot/dt/1e6:.1f} Mhash/s")


if __name__ == "__main__":
    main()
