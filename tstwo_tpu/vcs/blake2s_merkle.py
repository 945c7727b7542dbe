"""Blake2s Merkle hashing: host node hash + device layer kernel.

node = blake2s(left || right || LE32(column values))
(reference vcs/blake2_merkle.ts:8-25).
"""
from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import M31
from ..ops import blake2s as b2


def hash_node(children: Optional[Tuple[bytes, bytes]],
              column_values: Sequence[M31]) -> bytes:
    h = hashlib.blake2s(digest_size=32)
    if children is not None:
        h.update(children[0])
        h.update(children[1])
    for v in column_values:
        h.update(int(v.value).to_bytes(4, "little"))
    return h.digest()


def commit_on_layer(log_size: int,
                    prev_layer,
                    columns: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Hash one Merkle layer on device.

    prev_layer: uint32[2^(log+1), 8] digest words of the child layer (or None
    at the leaf layer).  columns: base-field columns of length 2^log hashed
    into this layer.  Returns uint32[2^log, 8], device-resident.
    """
    n = 1 << log_size
    parts: List[jnp.ndarray] = []
    n_words = 0
    if prev_layer is not None:
        parts.append(jnp.asarray(prev_layer, dtype=jnp.uint32).reshape(n, 16))
        n_words += 16
    if columns:
        parts.append(jnp.stack([jnp.asarray(c) for c in columns], axis=1))
        n_words += len(columns)
    if parts:
        words = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    else:
        words = jnp.zeros((n, 0), dtype=jnp.uint32)
    return b2.hash_u32_batch(words, byte_len=4 * n_words)


class Blake2sMerkleChannel:
    """MerkleChannel for Blake2s (reference vcs/blake2_merkle.ts:28-32)."""

    @staticmethod
    def mix_root(channel, root: bytes) -> None:
        channel.mix_root(root)
