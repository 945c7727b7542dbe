"""MerkleChannel flavors: pairs a Merkle hasher/prover with the channel that
absorbs its roots (reference vcs/ops.ts MerkleChannel + vcs/blake2s_merkle.ts /
vcs/poseidon252_merkle.ts).

A flavor bundles everything the PCS/FRI layers need to stay hash-agnostic:
  prover_cls.commit(columns)      device-batched Merkle tree prover
  hash_node(children, values)     host verifier-side node hash
  default_channel()               the matching Fiat-Shamir channel
"""
from __future__ import annotations


class Blake2sMerkleOps:
    """Blake2s flavor (reference vcs/blake2s_merkle.ts).  Roots are 32-byte
    digests; supports the fused device-resident FRI transcript."""

    name = "blake2s"
    fused_fri_transcript = True

    @staticmethod
    def prover_cls():
        from .prover import MerkleProver

        return MerkleProver

    @staticmethod
    def commit(columns):
        return Blake2sMerkleOps.prover_cls().commit(columns)

    @staticmethod
    def device_root_words(prover):
        """Root as device u32[8] words, for zero-RTT channel mixing."""
        return prover.layers[0][:, 0]

    @staticmethod
    def hash_node(children, values):
        from .blake2s_merkle import hash_node

        return hash_node(children, values)

    @staticmethod
    def default_channel():
        from ..channel.blake2s import Blake2sChannel

        return Blake2sChannel()


class Poseidon252MerkleOps:
    """Poseidon252 flavor (reference vcs/poseidon252_merkle.ts:19-56).  Roots
    are FieldElement252; layer hashing runs as batched device Hades sweeps
    (ops/poseidon252.py), the transcript stays on the host channel."""

    name = "poseidon252"
    fused_fri_transcript = False

    @staticmethod
    def prover_cls():
        from .poseidon252_merkle import Poseidon252MerkleProver

        return Poseidon252MerkleProver

    @staticmethod
    def commit(columns):
        return Poseidon252MerkleOps.prover_cls().commit(columns)

    @staticmethod
    def hash_node(children, values):
        from .poseidon252_merkle import hash_node

        return hash_node(children, values)

    @staticmethod
    def default_channel():
        from ..channel.poseidon import Poseidon252Channel

        return Poseidon252Channel()


MERKLE_OPS = {
    "blake2s": Blake2sMerkleOps,
    "poseidon252": Poseidon252MerkleOps,
}
