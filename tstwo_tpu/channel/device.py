"""Device-resident Blake2s Fiat-Shamir transcript.

The host channel (channel/blake2s.py) is a sequential 32-byte hash chain.
Bit-exact, but every mix/draw that feeds a device kernel forces a host
round trip; over a tunneled TPU one 32-byte fetch costs ~25 ms, and FRI's
commit loop does ~2 per layer -- measured to dominate the 2^22 FRI commit
(0.87 s of which <0.05 s is compute).

This module re-expresses the channel primitives as jnp computations on a
(digest u32[8], n_sent i32) state so a whole Fiat-Shamir-sequenced pipeline
(Merkle commit -> mix_root -> draw_felt -> fold -> ...) traces into ONE jit
dispatch with zero host synchronization.  Semantics are bit-exact with the
host channel (reference channel/blake2.ts:25-224 / Rust stwo Blake2sChannel):

  mix_root:   digest' = blake2s(digest || root)             (64-byte block)
  draw bytes: blake2s(digest || LE64(n_sent) || 0^24), n_sent += 1
  draw felts: 8 u32 per hash, rejected whole if any >= 2P, then reduced

The host channel is re-synced from the final device state with a single
fetch (see sync_host_channel).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import blake2s as b2

P = (1 << 31) - 1
_2P = jnp.uint32(0xFFFFFFFE)  # 2 * P


def _hash_words(words: jnp.ndarray, byte_len: int) -> jnp.ndarray:
    """blake2s-256 of one message given as LE u32 words -> u32[8]."""
    return b2.hash_u32_batch(words[None, :], byte_len)[0]


def state_from_channel(channel):
    """(digest u32[8], n_sent i32) device state from a host Blake2sChannel."""
    digest = jnp.asarray(np.frombuffer(channel.digest, dtype="<u4").copy())
    return digest, jnp.int32(channel.channel_time.n_sent)


def sync_host_channel(channel, digest_words: np.ndarray, n_sent: int,
                      n_mixes: int) -> None:
    """Replay the device transcript's effect onto the host channel.

    n_mixes = number of mix_* ops performed on device (each bumps
    n_challenges and reset n_sent); n_sent = device counter after the last
    draw.
    """
    channel.digest = b"".join(
        int(w).to_bytes(4, "little") for w in np.asarray(digest_words))
    channel.channel_time.n_challenges += n_mixes
    channel.channel_time.n_sent = int(n_sent)


def mix_root(digest: jnp.ndarray, root_words: jnp.ndarray):
    """digest' = blake2s(digest || root); resets n_sent
    (reference vcs/blake2_merkle.ts:28-32)."""
    msg = jnp.concatenate([digest, root_words])
    return _hash_words(msg, 64), jnp.int32(0)


def mix_u64(digest: jnp.ndarray, value):
    """digest' = blake2s(digest || LE64(value)); value may be traced
    (uint32 lo, hi) or a python int."""
    if isinstance(value, (int, np.integer)):
        lo = jnp.uint32(value & 0xFFFFFFFF)
        hi = jnp.uint32((value >> 32) & 0xFFFFFFFF)
    else:
        lo, hi = value
    msg = jnp.concatenate([digest, lo[None] if lo.ndim == 0 else lo,
                           hi[None] if hi.ndim == 0 else hi])
    return _hash_words(msg, 40), jnp.int32(0)


def mix_felts(digest: jnp.ndarray, felts: jnp.ndarray):
    """digest' = blake2s(digest || 16-byte LE QM31s).

    felts: u32[k, 4] coordinate rows (to_m31_array order), k static.
    """
    k = felts.shape[0]
    msg = jnp.concatenate([digest, felts.reshape(-1)])
    return _hash_words(msg, 32 + 16 * k), jnp.int32(0)


def draw_base_felts(digest: jnp.ndarray, n_sent: jnp.ndarray):
    """8 uniform M31s (reference channel/blake2.ts:159-175).

    Returns (n_sent', u32[8] in [0, P)).  The rejection loop (reject the
    whole hash if any u32 >= 2P, probability ~2^-28) runs as a device
    while_loop.
    """
    def attempt(ns):
        ctr = jnp.zeros(8, dtype=jnp.uint32).at[0].set(ns.astype(jnp.uint32))
        return _hash_words(jnp.concatenate([digest, ctr]), 64)

    def body(carry):
        ns, _ = carry
        return ns + 1, attempt(ns)

    carry = body((n_sent, jnp.zeros(8, dtype=jnp.uint32)))
    ns, data = jax.lax.while_loop(
        lambda c: jnp.any(c[1] >= _2P), body, carry)
    felts = jnp.where(data >= jnp.uint32(P), data - jnp.uint32(P), data)
    return ns, felts


def draw_felt(digest: jnp.ndarray, n_sent: jnp.ndarray):
    """One QM31 as u32[4] (first 4 of 8 drawn base felts)."""
    ns, felts = draw_base_felts(digest, n_sent)
    return ns, felts[:4]


def draw_felts(digest: jnp.ndarray, n_sent: jnp.ndarray, n: int):
    """n QM31s as u32[n, 4] (reference channel/blake2.ts draw_felts:
    consume 8-felt batches through a 4-felt queue)."""
    out = []
    queue = []
    ns = n_sent
    while len(out) < n:
        if len(queue) < 4:
            ns, felts = draw_base_felts(digest, ns)
            queue.extend([felts[i] for i in range(8)])
        out.append(jnp.stack(queue[:4]))
        queue = queue[4:]
    return ns, jnp.stack(out)
