"""Poseidon252 Merkle hasher: packs 8 M31 per felt252
(reference vcs/poseidon252_merkle.ts)."""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from ..channel.poseidon import (FieldElement252, Poseidon252Channel,
                                poseidon_hash_many)
from ..fields import M31

ELEMENTS_IN_BLOCK = 8


def construct_felt252_from_m31s(word: Sequence[M31]) -> int:
    """Pack 8 M31 limbs into one felt252 (31 bits each, first limb highest)."""
    if len(word) != 8:
        raise ValueError("expected exactly 8 M31 elements")
    acc = 0
    for limb in word:
        acc = (acc << 31) | limb.value
    return acc % ((1 << 251) + 17 * (1 << 192) + 1)


def hash_node(children: Optional[Tuple[FieldElement252, FieldElement252]],
              column_values: Sequence[M31]) -> FieldElement252:
    n_blocks = -(-len(column_values) // ELEMENTS_IN_BLOCK) if column_values else 0
    values = []
    if children is not None:
        values.append(children[0].value)
        values.append(children[1].value)
    padded = list(column_values) + [M31.zero()] * (
        ELEMENTS_IN_BLOCK * n_blocks - len(column_values))
    for i in range(0, len(padded), ELEMENTS_IN_BLOCK):
        values.append(construct_felt252_from_m31s(padded[i: i + 8]))
    return FieldElement252(poseidon_hash_many(values))


class Poseidon252MerkleChannel:
    @staticmethod
    def mix_root(channel: Poseidon252Channel, root: FieldElement252) -> None:
        channel.mix_root(root)
