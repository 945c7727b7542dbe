"""Merkle commitment prover over mixed-size base-field columns.

Layer hashing runs batched on device (ops/blake2s) and every layer stays
device-resident; the query-dependent decommitment logic is host-side but
touches only the queried indices: the peekable merge is computed on
indices alone (it does not depend on values), then the few needed hashes
and column values are fetched with one small device gather per layer.
(reference vcs/prover.ts:13-109, mirroring Rust stwo vcs/prover.rs.)
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


from functools import partial

import jax


_SCAN_TOP_LOG = 11  # pure-hash levels at/below this size run under one scan


def _scan_levels(top: jnp.ndarray, s: int):
    """Hash the pure (column-free) levels s-1 .. 0 of a Merkle tree whose
    level s is `top` (word-major u32[8, 2^s]) with ONE lax.scan.

    Each iteration hashes a fixed-capacity padded buffer (valid prefix
    halves every step; the padding hashes are garbage and ignored), so the
    ~log2(N) tiny upper levels cost one traced instance and one fused loop
    instead of log2(N) separate kernels -- a fused FRI commit otherwise
    traces ~230 distinct tiny compress graphs (minutes of XLA compile time,
    ~1 ms of launch overhead each at runtime).

    On TPU the compress in the scan body is fully UNROLLED: the
    lax.fori_loop compress was measured 6x slower per scan step (2.6 vs
    0.44 ms per 11-level scan, round 4) -- its traced SIGMA lookups become
    dynamic sublane slices each iteration.  On CPU the fori form is kept:
    an unrolled compress inside lax.scan sends the XLA:CPU loop optimizer
    into a multi-minute pathology (ops/blake2s.py docstring).
    """
    from ..ops.blake2s import _hash_words_major_xla

    cap = 1 << s
    try:
        unroll = jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # pragma: no cover
        unroll = False

    def body(buf, _):
        from ..ops.fri_ops import _deinterleave

        left, right = _deinterleave(buf)
        msg = jnp.concatenate([left, right], axis=0)
        parents = _hash_words_major_xla(msg, 64, unroll=unroll)
        nxt = jnp.concatenate(
            [parents, jnp.zeros((8, cap - cap // 2), dtype=jnp.uint32)],
            axis=1)
        return nxt, parents

    _, ys = jax.lax.scan(body, top, None, length=s)
    return ys  # ys[i] = level s-1-i (valid prefix 2^(s-1-i), word-major)


@partial(jax.jit, static_argnames=("max_log",))
def _commit_all_layers(max_log: int, cols: tuple):
    """Whole Merkle tree in ONE device dispatch: every layer hash chained
    inside a single jitted computation (sizes are static per layer, so the
    loop unrolls; each large layer is one batched Blake2s sweep, and the
    small pure-hash top levels collapse into one lax.scan)."""
    from .blake2s_merkle import commit_on_layer as _col

    layers = {}
    prev = None
    log = max_log
    while log >= 0:
        # 2-D [C, n] entries expand to C same-size columns here, INSIDE the
        # jit, where row slicing is free (an eager slice costs a tunnel
        # dispatch each; FRI alone has ~17 trees x 4 columns).
        layer_cols = []
        for c in cols:
            if c.shape[-1] == (1 << log):
                if c.ndim == 2:
                    layer_cols.extend(c[i] for i in range(c.shape[0]))
                else:
                    layer_cols.append(c)
        lower_has_cols = any(c.shape[-1] < (1 << log) for c in cols)
        if (prev is not None and not layer_cols and not lower_has_cols
                and log + 1 <= _SCAN_TOP_LOG):
            ys = _scan_levels(prev, log + 1)
            for j in range(log, -1, -1):
                layers[j] = ys[log - j][:, : 1 << j]
            break
        prev = _col(log, prev, layer_cols)
        layers[log] = prev
        log -= 1
    return tuple(layers[i] for i in range(max_log + 1))


def stack_column_groups(cols: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Normalize a layer's column entries (1-D columns and/or 2-D [C, n]
    stacks) into one 2-D [total_cols, n] array, preserving order."""
    if len(cols) == 1:
        c = cols[0]
        return c if c.ndim == 2 else c[None, :]
    if all(c.ndim == 1 for c in cols):
        return jnp.stack(cols)
    return jnp.concatenate(
        [c if c.ndim == 2 else c[None, :] for c in cols], axis=0)


def column_count(cols: Sequence[jnp.ndarray]) -> int:
    """Number of logical columns across 1-D / 2-D [C, n] entries."""
    return sum(int(c.shape[0]) if c.ndim == 2 else 1 for c in cols)


def plan_decommitment(queries_per_log_size: Mapping[int, Sequence[int]],
                      n_layers: int, columns: Sequence[jnp.ndarray]):
    """Phase 1 of decommitment: index-only traversal (hash-agnostic, shared
    by the Blake2s and Poseidon252 provers).  Per layer (big->small) returns
    a dict with the visited nodes, which child hashes enter the witness,
    and which nodes carry queried values (reference vcs/prover.ts:32-109)."""
    cols_sorted = sorted(columns, key=lambda c: -c.shape[-1])
    col_idx = 0
    layer_plans = []
    last_layer_queries: List[int] = []
    for layer_log in range(n_layers - 1, -1, -1):
        layer_cols: List[jnp.ndarray] = []
        while (col_idx < len(cols_sorted)
               and cols_sorted[col_idx].shape[-1] == (1 << layer_log)):
            layer_cols.append(cols_sorted[col_idx])
            col_idx += 1
        has_children = layer_log + 1 < n_layers
        plan = {
            "log": layer_log,
            "cols": layer_cols,
            "steps": [],  # (node, [child hash idxs], queried: bool)
            "hash_idxs": [],
            "node_idxs": [],
        }
        prev_q = Peekable(last_layer_queries)
        direct_q = Peekable(list(queries_per_log_size.get(layer_log, [])))
        layer_total: List[int] = []
        while True:
            node = next_decommitment_node(prev_q, direct_q)
            if node is None:
                break
            witness_children = []
            if has_children:
                if not prev_q.next_if_eq(2 * node):
                    witness_children.append(2 * node)
                if not prev_q.next_if_eq(2 * node + 1):
                    witness_children.append(2 * node + 1)
            queried = direct_q.next_if_eq(node)
            plan["steps"].append((node, witness_children, queried))
            plan["hash_idxs"].extend(witness_children)
            plan["node_idxs"].append(node)
            layer_total.append(node)
        last_layer_queries = layer_total
        layer_plans.append(plan)
    return layer_plans


class MerkleProver:
    """Multi-column Merkle tree (one commitOnLayer per log size,
    leaves->root).  Layers are word-major device arrays [8, 2^log]."""

    def __init__(self, layers: List[jnp.ndarray]):
        self.layers = layers
        self._root: Optional[bytes] = None

    @staticmethod
    def commit(columns: Sequence[jnp.ndarray]) -> "MerkleProver":
        cols = sorted(columns, key=lambda c: -c.shape[-1])
        if not cols:
            return MerkleProver([commit_on_layer(0, None, [])])
        max_log = int(cols[0].shape[-1]).bit_length() - 1
        layers = _commit_all_layers(max_log, tuple(cols))
        return MerkleProver(list(layers))  # index == log size

    def root(self) -> bytes:
        if self._root is None:
            from ..utils import to_host

            self._root = digest_words_to_bytes(
                to_host(self.layers[0][:, 0]))
        return self._root

    def root_deferred(self, batch):
        """Fetch the root through a FetchBatch; returns a thunk -> bytes."""
        if self._root is not None:
            cached = self._root
            return lambda: cached
        handle = batch.defer(self.layers[0][:, 0])
        tree = self

        def get() -> bytes:
            if tree._root is None:
                tree._root = digest_words_to_bytes(np.asarray(handle.get()))
            return tree._root

        return get

    def decommit(
        self,
        queries_per_log_size: Mapping[int, Sequence[int]],
        columns: Sequence[jnp.ndarray],
    ) -> Tuple[List[M31], MerkleDecommitment]:
        from ..utils import FetchBatch

        batch = FetchBatch()
        finish = self.decommit_deferred(queries_per_log_size, columns, batch)
        batch.materialize()
        return finish()

    def decommit_deferred(
        self,
        queries_per_log_size: Mapping[int, Sequence[int]],
        columns: Sequence[jnp.ndarray],
        batch,
        pool=None,
    ):
        """Witness assembly (reference vcs/prover.ts:32-109).

        Phase 1 derives, from query indices alone, which nodes are visited
        per layer and which child hashes enter the witness; phase 2
        registers exactly those gathers into a utils.GatherPool — when the
        caller passes a shared `pool`, EVERY tree of the proof (4
        commitment trees + ~17 FRI layer trees) coalesces into one
        concatenate + one bucketed take per array kind, and `batch` pulls
        them all in one device->host transfer.  Entries of `columns` may
        be 1-D single columns or 2-D [C, n] stacks of C same-size columns
        (avoids eager per-column slice/re-stack dispatches on the tunnel).
        """
        layer_plans = plan_decommitment(queries_per_log_size, len(self.layers),
                                        columns)

        # ---- phase 2: pooled deferred device gathers -----------------------
        from ..utils import GatherPool

        local_pool = pool if pool is not None else GatherPool(batch)
        for plan in layer_plans:
            log = plan["log"]
            if plan["hash_idxs"]:
                plan["_hashes_h"] = local_pool.take(self.layers[log + 1],
                                                    plan["hash_idxs"])
            if plan["node_idxs"] and plan["cols"]:
                plan["_values_h"] = local_pool.take(
                    stack_column_groups(plan["cols"]), plan["node_idxs"])
        if pool is None:
            local_pool.seal()

        # ---- phase 3: canonical-order assembly (after materialize) --------
        def finish() -> Tuple[List[M31], MerkleDecommitment]:
            queried: List[M31] = []
            dec = MerkleDecommitment()
            for plan in layer_plans:
                hashes = (plan["_hashes_h"]()
                          if "_hashes_h" in plan else None)
                gathered = (plan["_values_h"]()
                            if "_values_h" in plan else None)
                values = ([gathered[k] for k in range(gathered.shape[0])]
                          if gathered is not None else [])
                hi = 0
                for si, (node, witness_children, was_queried) in enumerate(
                        plan["steps"]):
                    for _ in witness_children:
                        dec.hash_witness.append(
                            digest_words_to_bytes(hashes[:, hi]))
                        hi += 1
                    node_values = [M31(int(vals[si])) for vals in values]
                    if was_queried:
                        queried.extend(node_values)
                    else:
                        dec.column_witness.extend(node_values)
            return queried, dec

        return finish
