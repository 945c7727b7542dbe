"""Batched Blake2s-256 on device (jnp uint32).

Hashes N equal-length messages in parallel -- the Merkle-layer hot loop
(HOT LOOP #3 in SURVEY.md section 3) and the PoW grind.  The compression
function is 10 rounds x 8 G-mixes of u32 add/xor/rotate, all VPU ops,
vectorized across the message batch; the message schedule (SIGMA) is static
so the whole block compress unrolls into one fused XLA computation.

Semantics: standard (unkeyed) blake2s-256, bit-exact with hashlib.blake2s /
@noble/hashes (reference vcs/blake2s_ref.ts:4-21, vcs/blake2_hash.ts).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)

SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
]

# h0 ^= param block (digest_length=32, fanout=1, depth=1)
H0 = IV.copy()
H0[0] ^= 0x01010020


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


_SIGMA_ARR = np.array(SIGMA, dtype=np.int32)  # [10, 16]


def compress(h, m, t, is_final):
    """One blake2s block compress, batched over leading axes.

    h: uint32[..., 8]; m: uint32[..., 16]; t: byte counter (int);
    is_final: bool.

    Two lowering strategies, chosen by static batch size:

      * large batches (>= 2^15 messages, the compute-bound Merkle leaf and
        lower tree levels): the 10 rounds unroll statically so every
        message-schedule access is a static slice -- a traced SIGMA lookup
        would lower to a dynamic LANE gather per word (measured ~5 ms of
        pure relayout overhead per big layer on TPU);
      * small batches (the many tiny upper tree levels, where per-kernel
        overhead dominates): rounds run under lax.fori_loop to keep the
        traced graph ~10x smaller (a fused FRI commit traces ~250 distinct
        compress instances; fully unrolled they blow XLA compile time past
        10 minutes), with message words stacked on the LEADING axis so the
        SIGMA lookup is a cheap sublane dynamic slice, not a lane gather.
    """
    lead = h.shape[:-1]
    batch = 1
    for d in lead:
        batch *= int(d)
    v = [h[..., i] for i in range(8)] + [
        jnp.broadcast_to(jnp.uint32(IV[i]), lead) for i in range(8)
    ]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if is_final:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)

    if batch >= (1 << 15):
        mw = [m[..., i] for i in range(16)]
        for r in range(10):
            s = SIGMA[r]
            _g(v, 0, 4, 8, 12, mw[s[0]], mw[s[1]])
            _g(v, 1, 5, 9, 13, mw[s[2]], mw[s[3]])
            _g(v, 2, 6, 10, 14, mw[s[4]], mw[s[5]])
            _g(v, 3, 7, 11, 15, mw[s[6]], mw[s[7]])
            _g(v, 0, 5, 10, 15, mw[s[8]], mw[s[9]])
            _g(v, 1, 6, 11, 12, mw[s[10]], mw[s[11]])
            _g(v, 2, 7, 8, 13, mw[s[12]], mw[s[13]])
            _g(v, 3, 4, 9, 14, mw[s[14]], mw[s[15]])
        out = [h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)]
        return jnp.stack(out, axis=-1)

    mw = jnp.stack([m[..., i] for i in range(16)])  # [16, *lead]
    sigma = jnp.asarray(_SIGMA_ARR)

    def round_body(r, carry):
        v = list(carry)
        s = sigma[r]
        ms = [mw[s[i]] for i in range(16)]
        _g(v, 0, 4, 8, 12, ms[0], ms[1])
        _g(v, 1, 5, 9, 13, ms[2], ms[3])
        _g(v, 2, 6, 10, 14, ms[4], ms[5])
        _g(v, 3, 7, 11, 15, ms[6], ms[7])
        _g(v, 0, 5, 10, 15, ms[8], ms[9])
        _g(v, 1, 6, 11, 12, ms[10], ms[11])
        _g(v, 2, 7, 8, 13, ms[12], ms[13])
        _g(v, 3, 4, 9, 14, ms[14], ms[15])
        return tuple(v)

    v = list(jax.lax.fori_loop(0, 10, round_body, tuple(v)))
    out = [h[..., i] ^ v[i] ^ v[i + 8] for i in range(8)]
    return jnp.stack(out, axis=-1)


# ---------------------------------------------------------------------------
# Word-major API: batch on the MINOR axis, message words on the leading axis.
#
# The word-minor [N, n_words] layout above puts the 8/16 state words on the
# 128-lane axis (wasting 112+ lanes and forcing relayouts when XLA slices
# them); word-major [n_words, N] keeps every state word a full-width [N]
# array, so the whole compress is pure elementwise VPU work.  On TPU the
# compress runs as a Pallas kernel (grid over batch strips, message block in
# VMEM, ~16 live vregs) -- measured 4.4x the XLA-fused path at 2^21 messages
# (570 vs 129 Mhash/s, scripts/measure_blake2s_pallas.py).
# ---------------------------------------------------------------------------


def _compress_rows(h, m, t, is_final, unroll=True, sigma_arr=None):
    """One block compress on word-major state.

    h: list of 8 same-shape arrays; m: list of 16 message-word arrays;
    returns the 8 output words (list).  unroll=False runs the 10 rounds
    under lax.fori_loop (~10x smaller traced graph; required for small
    batches -- an unrolled compress inside lax.scan sends the XLA:CPU
    compiler into a multi-minute loop-optimization pathology).
    """
    shp = h[0].shape
    v = list(h) + [jnp.broadcast_to(jnp.uint32(IV[i]), shp) for i in range(8)]
    v[12] = v[12] ^ jnp.uint32(t & 0xFFFFFFFF)
    v[13] = v[13] ^ jnp.uint32((t >> 32) & 0xFFFFFFFF)
    if is_final:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)
    if unroll:
        for r in range(10):
            s = SIGMA[r]
            _g(v, 0, 4, 8, 12, m[s[0]], m[s[1]])
            _g(v, 1, 5, 9, 13, m[s[2]], m[s[3]])
            _g(v, 2, 6, 10, 14, m[s[4]], m[s[5]])
            _g(v, 3, 7, 11, 15, m[s[6]], m[s[7]])
            _g(v, 0, 5, 10, 15, m[s[8]], m[s[9]])
            _g(v, 1, 6, 11, 12, m[s[10]], m[s[11]])
            _g(v, 2, 7, 8, 13, m[s[12]], m[s[13]])
            _g(v, 3, 4, 9, 14, m[s[14]], m[s[15]])
        return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]

    mw = jnp.stack(m)  # [16, ...]; word index is the leading axis
    sigma = jnp.asarray(_SIGMA_ARR) if sigma_arr is None else sigma_arr

    def round_body(r, carry):
        v = list(carry)
        s = sigma[r]
        ms = [mw[s[i]] for i in range(16)]
        _g(v, 0, 4, 8, 12, ms[0], ms[1])
        _g(v, 1, 5, 9, 13, ms[2], ms[3])
        _g(v, 2, 6, 10, 14, ms[4], ms[5])
        _g(v, 3, 7, 11, 15, ms[6], ms[7])
        _g(v, 0, 5, 10, 15, ms[8], ms[9])
        _g(v, 1, 6, 11, 12, ms[10], ms[11])
        _g(v, 2, 7, 8, 13, ms[12], ms[13])
        _g(v, 3, 4, 9, 14, ms[14], ms[15])
        return tuple(v)

    v = list(jax.lax.fori_loop(0, 10, round_body, tuple(v)))
    return [h[i] ^ v[i] ^ v[i + 8] for i in range(8)]


def _wm_kernel(m_ref, out_ref, *, n_blocks, byte_len, unroll=True):
    h = [jnp.broadcast_to(jnp.uint32(H0[i]), m_ref.shape[1:])
         for i in range(8)]
    for b in range(n_blocks):
        final = b == n_blocks - 1
        t = byte_len if final else (b + 1) * 64
        h = _compress_rows(h, [m_ref[16 * b + i] for i in range(16)], t,
                           final, unroll=unroll)
    for i in range(8):
        out_ref[i] = h[i]


def _wm_kernel_fori(m_ref, sigma_ref, out_ref, *, n_blocks, byte_len):
    """fori-compress kernel variant with SIGMA as an INPUT ref (a traced
    in-kernel constant table is rejected by pallas_call; used by the
    interpret path, where the unrolled form hits a pathological multi-
    minute XLA:CPU compile once n_blocks > 1)."""
    h = [jnp.broadcast_to(jnp.uint32(H0[i]), m_ref.shape[1:])
         for i in range(8)]
    sigma = sigma_ref[...]
    for b in range(n_blocks):
        final = b == n_blocks - 1
        t = byte_len if final else (b + 1) * 64
        h = _compress_rows(h, [m_ref[16 * b + i] for i in range(16)], t,
                           final, unroll=False, sigma_arr=sigma)
    for i in range(8):
        out_ref[i] = h[i]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _pallas_rows(total: int, r: int) -> int:
    """Rows per grid block: a power-of-two DIVISOR of r (a non-divisor
    leaves floor(r/rows) blocks covered and the tail uninitialized --
    ADVICE r3 medium), halved while the VMEM block exceeds budget."""
    rows = min(64, r & -r)  # largest power of two dividing r, capped
    while total * rows * 128 * 4 > (4 << 20) and rows > 8:
        rows //= 2
    return rows


def _hash_words_major_pallas(words: jnp.ndarray, byte_len: int,
                             interpret: bool = False):
    if interpret:
        # interpret mode uses the fori-compress kernel variant (SIGMA as a
        # kernel input): the unrolled form compiles pathologically on
        # XLA:CPU once n_blocks > 1 (minutes; hung two suite runs, r4)
        return _hash_words_major_pallas_jit(words, byte_len,
                                            interpret=True, unroll=False)
    return _hash_words_major_pallas_jit(words, byte_len)


def _hash_words_major_pallas_impl(words: jnp.ndarray, byte_len: int,
                                  interpret: bool = False,
                                  unroll: bool = True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    total, n = words.shape
    n_blocks = total // 16
    r = n // 128
    rows = _pallas_rows(total, r)
    assert r % rows == 0
    m3 = words.reshape(total, r, 128)
    if unroll:
        out = pl.pallas_call(
            partial(_wm_kernel, n_blocks=n_blocks, byte_len=byte_len),
            out_shape=jax.ShapeDtypeStruct((8, r, 128), jnp.uint32),
            grid=(r // rows,),
            in_specs=[pl.BlockSpec((total, rows, 128), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, rows, 128), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(m3)
    else:
        out = pl.pallas_call(
            partial(_wm_kernel_fori, n_blocks=n_blocks, byte_len=byte_len),
            out_shape=jax.ShapeDtypeStruct((8, r, 128), jnp.uint32),
            grid=(r // rows,),
            in_specs=[pl.BlockSpec((total, rows, 128), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, rows, 128), lambda g: (0, g, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(m3, jnp.asarray(_SIGMA_ARR))
    return out.reshape(8, n)


_hash_words_major_pallas_jit = partial(
    jax.jit, static_argnames=("byte_len", "interpret", "unroll"))(
        _hash_words_major_pallas_impl)


@partial(jax.jit, static_argnames=("byte_len", "unroll"))
def _hash_words_major_xla(words: jnp.ndarray, byte_len: int,
                          unroll: bool = None):
    total, n = words.shape
    n_blocks = total // 16
    if unroll is None:
        unroll = n >= (1 << 15)
    h = [jnp.broadcast_to(jnp.uint32(H0[i]), (n,)) for i in range(8)]
    for b in range(n_blocks):
        final = b == n_blocks - 1
        t = byte_len if final else (b + 1) * 64
        h = _compress_rows(h, [words[16 * b + i] for i in range(16)], t,
                           final, unroll=unroll)
    return jnp.stack(h)


def hash_words_major(words: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """blake2s-256 of N messages given word-major as u32[W, N] LE words.

    W*4 >= byte_len (extra words must be zero).  Returns uint32[8, N]
    digest words.  Dispatches to the Pallas kernel for large batches on
    TPU, XLA elsewhere; both paths are bit-identical.
    """
    w, n = words.shape
    n_blocks = max(1, -(-byte_len // 64))
    total = n_blocks * 16
    if w < total:
        words = jnp.pad(words, ((0, total - w), (0, 0)))
    if (n >= 2048 and n % 128 == 0 and (n // 128) % 8 == 0 and _on_tpu()):
        return _hash_words_major_pallas(words, byte_len)
    return _hash_words_major_xla(words, byte_len)


@partial(jax.jit, static_argnames=("byte_len",))
def hash_u32_batch(words: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """blake2s-256 of N identical-length messages given as u32 LE words.

    words: uint32[N, n_words] with n_words*4 >= byte_len (extra words are
    ignored/zero).  Returns uint32[N, 8] digest words (LE).
    """
    n = words.shape[0]
    n_blocks = max(1, -(-byte_len // 64))
    total_words = n_blocks * 16
    if words.shape[1] < total_words:
        words = jnp.pad(words, ((0, 0), (0, total_words - words.shape[1])))
    h = jnp.broadcast_to(jnp.asarray(H0), (n, 8))
    for b in range(n_blocks):
        final = b == n_blocks - 1
        t = byte_len if final else (b + 1) * 64
        h = compress(h, words[:, 16 * b: 16 * (b + 1)], t, final)
    return h


def digest_words_to_bytes(words: np.ndarray) -> bytes:
    """uint32[8] -> 32-byte digest."""
    return b"".join(int(w).to_bytes(4, "little") for w in words)


def digest_bytes_to_words(digest: bytes) -> np.ndarray:
    return np.frombuffer(digest, dtype="<u4").copy()
