"""Merkle commitment prover over mixed-size base-field columns.

Layer hashing runs batched on device (ops/blake2s); the query-dependent
decommit witness assembly is a host-side peekable merge over sorted indices
(reference vcs/prover.ts:13-109, mirroring Rust stwo vcs/prover.rs).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import M31
from ..ops.blake2s import digest_words_to_bytes
from .blake2s_merkle import commit_on_layer
from .utils import Peekable, next_decommitment_node


@dataclass
class MerkleDecommitment:
    """Hash + column witness (reference vcs/verifier.ts:5-8)."""

    hash_witness: List[bytes] = field(default_factory=list)
    column_witness: List[M31] = field(default_factory=list)

    def size_estimate(self) -> int:
        return 32 * len(self.hash_witness) + 4 * len(self.column_witness)


class MerkleProver:
    """Multi-column Merkle tree (one commitOnLayer per log size, leaves->root)."""

    def __init__(self, layers: List[np.ndarray]):
        # layers[log] has shape [2^log, 8]; layers[0] is the root layer.
        self.layers = layers

    @staticmethod
    def commit(columns: Sequence[jnp.ndarray]) -> "MerkleProver":
        cols = sorted(columns, key=lambda c: -c.shape[-1])
        if not cols:
            return MerkleProver([commit_on_layer(0, None, [])])
        max_log = int(cols[0].shape[-1]).bit_length() - 1
        layers_by_log: List[Optional[np.ndarray]] = [None] * (max_log + 1)
        prev: Optional[np.ndarray] = None
        for log in range(max_log, -1, -1):
            layer_cols = [c for c in cols if c.shape[-1] == (1 << log)]
            prev = commit_on_layer(log, prev, layer_cols)
            layers_by_log[log] = prev
        return MerkleProver(layers_by_log)  # type: ignore[arg-type]

    def root(self) -> bytes:
        return digest_words_to_bytes(self.layers[0][0])

    def decommit(
        self,
        queries_per_log_size: Mapping[int, Sequence[int]],
        columns: Sequence[jnp.ndarray],
    ) -> Tuple[List[M31], MerkleDecommitment]:
        """Witness assembly (reference vcs/prover.ts:32-109)."""
        cols_sorted = sorted(columns, key=lambda c: -c.shape[-1])
        cols_np = [np.asarray(c) for c in cols_sorted]
        queried: List[M31] = []
        dec = MerkleDecommitment()
        col_idx = 0
        last_layer_queries: List[int] = []
        n_layers = len(self.layers)
        for layer_log in range(n_layers - 1, -1, -1):
            layer_cols: List[np.ndarray] = []
            while (col_idx < len(cols_np)
                   and len(cols_np[col_idx]) == (1 << layer_log)):
                layer_cols.append(cols_np[col_idx])
                col_idx += 1
            child_hashes = (self.layers[layer_log + 1]
                            if layer_log + 1 < n_layers else None)
            layer_total: List[int] = []
            prev_q = Peekable(last_layer_queries)
            direct_q = Peekable(list(queries_per_log_size.get(layer_log, [])))
            while True:
                node = next_decommitment_node(prev_q, direct_q)
                if node is None:
                    break
                if child_hashes is not None:
                    if not prev_q.next_if_eq(2 * node):
                        dec.hash_witness.append(
                            digest_words_to_bytes(child_hashes[2 * node]))
                    if not prev_q.next_if_eq(2 * node + 1):
                        dec.hash_witness.append(
                            digest_words_to_bytes(child_hashes[2 * node + 1]))
                node_values = [M31(int(c[node])) for c in layer_cols]
                if direct_q.next_if_eq(node):
                    queried.extend(node_values)
                else:
                    dec.column_witness.extend(node_values)
                layer_total.append(node)
            last_layer_queries = layer_total
        return queried, dec
