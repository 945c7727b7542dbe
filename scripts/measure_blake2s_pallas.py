"""Prototype Pallas blake2s kernel vs the XLA-fused path."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tstwo_tpu.ops import blake2s as b2

P = (1 << 31) - 1


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


def _kernel(m_ref, out_ref, *, t, is_final):
    # m_ref: [16, R, 128]; out_ref: [8, R, 128]
    shp = m_ref.shape[1:]
    v = [jnp.broadcast_to(jnp.uint32(b2.H0[i]), shp) for i in range(8)] + \
        [jnp.broadcast_to(jnp.uint32(b2.IV[i]), shp) for i in range(8)]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    if is_final:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)
    for r in range(10):
        s = b2.SIGMA[r]
        _g(v, 0, 4, 8, 12, m_ref[s[0]], m_ref[s[1]])
        _g(v, 1, 5, 9, 13, m_ref[s[2]], m_ref[s[3]])
        _g(v, 2, 6, 10, 14, m_ref[s[4]], m_ref[s[5]])
        _g(v, 3, 7, 11, 15, m_ref[s[6]], m_ref[s[7]])
        _g(v, 0, 5, 10, 15, m_ref[s[8]], m_ref[s[9]])
        _g(v, 1, 6, 11, 12, m_ref[s[10]], m_ref[s[11]])
        _g(v, 2, 7, 8, 13, m_ref[s[12]], m_ref[s[13]])
        _g(v, 3, 4, 9, 14, m_ref[s[14]], m_ref[s[15]])
    for i in range(8):
        out_ref[i] = jnp.uint32(b2.H0[i]) ^ v[i] ^ v[i + 8]


@partial(jax.jit, static_argnames=("rows_per",))
def hash64_pallas(msg, rows_per=64):
    """msg: u32[16, N] (N mult of 128*rows_per) -> u32[8, N]; one 64-byte
    final block."""
    n = msg.shape[1]
    r = n // 128
    m3 = msg.reshape(16, r, 128)
    out = pl.pallas_call(
        partial(_kernel, t=64, is_final=True),
        out_shape=jax.ShapeDtypeStruct((8, r, 128), jnp.uint32),
        grid=(r // rows_per,),
        in_specs=[pl.BlockSpec((16, rows_per, 128), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, rows_per, 128), lambda g: (0, g, 0),
                               memory_space=pltpu.VMEM),
    )(m3)
    return out.reshape(8, n)


def main():
    rng = np.random.default_rng(0)
    log_n = 21
    n = 1 << log_n

    msg0 = jnp.asarray(rng.integers(0, 2**32, size=(16, n), dtype=np.uint32))

    # correctness vs hashlib on a few messages
    out = np.asarray(hash64_pallas(msg0))
    import hashlib
    for j in [0, 1, 12345]:
        m_bytes = b"".join(int(w).to_bytes(4, "little")
                           for w in np.asarray(msg0[:, j]))
        expect = hashlib.blake2s(m_bytes).digest()
        got = b"".join(int(w).to_bytes(4, "little") for w in out[:, j])
        assert got == expect, (j, got.hex(), expect.hex())
    print("pallas kernel correct vs hashlib")

    for rows_per in (8, 32, 64, 128, 256):
        @jax.jit
        def chain(msg, k=8, rp=rows_per):
            for _ in range(k):
                d = hash64_pallas(msg, rows_per=rp)
                msg = jnp.concatenate([d, d], axis=0)
            return msg
        jax.block_until_ready(chain(msg0))
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(msg0))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"pallas rows_per={rows_per:3d}: {best*1e3:7.2f} ms"
              f" = {8*n/best/1e6:7.1f} Mhash/s")


if __name__ == "__main__":
    main()
