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

    prev_layer: uint32[8, 2^(log+1)] digest words (word-major) of the child
    layer, or None at the leaf layer.  columns: base-field columns of length
    2^log hashed into this layer.  Returns uint32[8, 2^log], device-resident
    and word-major (each digest word is a full-width batch row, which keeps
    the whole compress elementwise on the VPU -- see ops/blake2s.py).
    """
    n = 1 << log_size
    parts: List[jnp.ndarray] = []
    n_words = 0
    if prev_layer is not None:
        from ..ops.fri_ops import _deinterleave

        # message = left digest (8 words) || right digest (8 words)
        left, right = _deinterleave(jnp.asarray(prev_layer,
                                                dtype=jnp.uint32))
        parts.append(left)
        parts.append(right)
        n_words += 16
    if columns:
        parts.append(jnp.stack([jnp.asarray(c) for c in columns], axis=0))
        n_words += len(columns)
    if parts:
        words = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    else:
        words = jnp.zeros((0, n), dtype=jnp.uint32)
    return b2.hash_words_major(words, byte_len=4 * n_words)


class Blake2sMerkleChannel:
    """MerkleChannel for Blake2s (reference vcs/blake2_merkle.ts:28-32)."""

    @staticmethod
    def mix_root(channel, root: bytes) -> None:
        channel.mix_root(root)
