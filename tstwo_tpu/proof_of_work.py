"""Proof-of-work grind: find the smallest nonce whose mixed digest has
>= pow_bits trailing zeros (reference backend/cpu/grind.ts:31-42).

The device path evaluates batches of candidate nonces in one Blake2s sweep
(HOT LOOP #5), returning the same smallest nonce the sequential scan would.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .channel.blake2s import Blake2sChannel
from .ops import blake2s as b2


def grind_host(channel, pow_bits: int) -> int:
    nonce = 0
    while True:
        ch = channel.clone()
        ch.mix_u64(nonce)
        if ch.trailing_zeros() >= pow_bits:
            return nonce
        nonce += 1


@partial(jax.jit, static_argnames=("pow_bits",))
def _grind_batch(digest_words: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                 pow_bits: int) -> jnp.ndarray:
    """Check a batch of nonces (given as u32 lo/hi words); return index of
    first hit or batch size."""
    batch = lo.shape[0]
    words = jnp.concatenate(
        [
            jnp.broadcast_to(digest_words[:, None], (8, batch)),
            lo[None, :],
            hi[None, :],
        ],
        axis=0,
    )
    dig = b2.hash_words_major(words, byte_len=40)
    # trailing zeros of the LE u128 formed by digest words d0..d3
    tz = jnp.zeros((batch,), dtype=jnp.uint32)
    carry = jnp.ones((batch,), dtype=jnp.bool_)
    for w in range(4):
        d = dig[w]
        wtz = _word_tz(d)
        tz = tz + jnp.where(carry, wtz, 0)
        carry = carry & (d == 0)
    ok = tz >= pow_bits
    return jnp.where(ok.any(), jnp.argmax(ok), batch)


def _word_tz(d: jnp.ndarray) -> jnp.ndarray:
    """Trailing zeros of a u32 (32 when zero)."""
    lsb = d & (jnp.uint32(0) - d)  # isolate lowest set bit (0 if d==0)
    f = lsb.astype(jnp.float32)
    e = (jax.lax.bitcast_convert_type(f, jnp.uint32) >> 23) & 0xFF
    tz = jnp.where(lsb == 0, 32, e - 127).astype(jnp.uint32)
    return tz


def grind_device(channel: Blake2sChannel, pow_bits: int,
                 batch: int = 1 << 16) -> int:
    """Batched nonce search; bit-identical result to grind_host."""
    digest_words = jnp.asarray(b2.digest_bytes_to_words(channel.digest))
    start = 0
    while True:
        nonces = np.arange(start, start + batch, dtype=np.uint64)
        lo = jnp.asarray((nonces & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((nonces >> 32).astype(np.uint32))
        from .utils import to_host

        idx = int(to_host(_grind_batch(digest_words, lo, hi, pow_bits)))
        if idx < batch:
            return start + idx
        start += batch


def grind(channel, pow_bits: int, use_device: bool = True) -> int:
    if (use_device and pow_bits >= 12
            and isinstance(channel, Blake2sChannel)):
        return grind_device(channel, pow_bits)
    return grind_host(channel, pow_bits)
