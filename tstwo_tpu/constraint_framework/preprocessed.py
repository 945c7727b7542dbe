"""Preprocessed (phase-0) trace columns.

Rust stwo `constraint_framework/preprocessed_columns.rs` (symbols pinned by
reference roadmap/deps_map.json keys
`stwo_prover::constraint_framework::preprocessed_columns::*`): columns known
to both prover and verifier, committed in tree PREPROCESSED_TRACE_IDX and
referenced by components through stable string ids.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..circle import CanonicCoset
from ..poly.circle_poly import CircleEvaluation


@dataclass(frozen=True)
class PreProcessedColumnId:
    id: str


class IsFirst:
    """1 at the first trace row (coset order), 0 elsewhere.  The first coset
    row lands at committed index 0 (bit_reverse(domain_index(0)) == 0)."""

    def __init__(self, log_size: int):
        self.log_size = log_size

    def id(self) -> PreProcessedColumnId:
        return PreProcessedColumnId(f"preprocessed_is_first_{self.log_size}")

    def gen_column(self) -> CircleEvaluation:
        n = 1 << self.log_size
        vals = jnp.zeros(n, dtype=jnp.uint32).at[0].set(1)
        domain = CanonicCoset.new(self.log_size).circle_domain()
        return CircleEvaluation(domain, vals)


class Seq:
    """Committed row r holds the value r (stwo preprocessed_columns.rs Seq:
    Col::from_iter(0..n) over the bit-reversed circle domain)."""

    def __init__(self, log_size: int):
        self.log_size = log_size

    def id(self) -> PreProcessedColumnId:
        return PreProcessedColumnId(f"preprocessed_seq_{self.log_size}")

    def gen_column(self) -> CircleEvaluation:
        n = 1 << self.log_size
        domain = CanonicCoset.new(self.log_size).circle_domain()
        return CircleEvaluation(domain, jnp.arange(n, dtype=jnp.uint32))
