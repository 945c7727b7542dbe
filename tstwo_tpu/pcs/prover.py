"""CommitmentSchemeProver: commit trees of circle polys, then open at
sampled points via DEEP quotients + FRI + PoW + Merkle decommitments.

Built from the embedded Rust spec (reference pcs/prover.ts:28-252); the TS
file contains no implementation.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..circle import CirclePoint
from ..fields import M31, QM31
from ..fri import FriProof, FriProver
from ..poly.circle_poly import (CircleEvaluation, CirclePoly,
                                eval_columns_at_point)
from ..poly.twiddles import TwiddleTree
from ..proof_of_work import grind
from ..tracing import span
from ..vcs import MerkleDecommitment, MerkleProver
from . import PcsConfig, TreeSubspan
from .quotients import PointSample, compute_fri_quotients
from .utils import TreeVec


@dataclass
class CommitmentSchemeProof:
    """reference pcs/prover.ts:159-168 (embedded Rust struct)."""

    config: PcsConfig
    commitments: TreeVec  # of bytes
    sampled_values: TreeVec  # per tree: per column: List[QM31]
    decommitments: TreeVec  # of MerkleDecommitment
    queried_values: TreeVec  # per tree: List[M31]
    proof_of_work: int
    fri_proof: FriProof

    def size_estimate(self) -> int:
        size = 0
        size += 32 * len(self.commitments)
        size += 16 * len(self.sampled_values.flatten_cols())
        size += sum(d.size_estimate() for d in self.decommitments)
        size += 4 * sum(len(v) for v in self.queried_values)
        size += 8
        size += 16 * len(self.fri_proof.first_layer.fri_witness)
        size += self.fri_proof.first_layer.decommitment.size_estimate() + 32
        for layer in self.fri_proof.inner_layers:
            size += 16 * len(layer.fri_witness)
            size += layer.decommitment.size_estimate() + 32
        size += 16 * len(self.fri_proof.last_layer_poly)
        return size


class CommitmentTreeProver:
    """One committed set of polynomials (reference pcs/prover.ts:209-252).

    With `mesh`, the extension CFFT runs via the explicit all-to-all
    factorization (parallel/fft.py) and the evaluations stay point-sharded,
    so the Merkle leaf hashing and every downstream kernel (quotients, FRI)
    are GSPMD-partitioned over the mesh.
    """

    def __init__(self, polynomials: List[CirclePoly], log_blowup_factor: int,
                 channel, twiddles: TwiddleTree, mesh=None, merkle_ops=None):
        from ..circle import CanonicCoset

        self.polynomials = polynomials
        self.evaluations: List[CircleEvaluation] = [None] * len(polynomials)
        with span("extension"):
            # batch all same-size polynomials into one CFFT sweep
            from ..poly.circle_poly import evaluate_values

            groups: Dict[int, List[int]] = {}
            for i, poly in enumerate(polynomials):
                groups.setdefault(poly.log_size(), []).append(i)
            for log_size, idxs in groups.items():
                domain = CanonicCoset.new(
                    log_size + log_blowup_factor).circle_domain()
                stacked = jnp.stack([polynomials[i].coeffs for i in idxs])
                if mesh is not None:
                    from ..parallel.fft import evaluate_values_sharded

                    ext = evaluate_values_sharded(stacked, domain, twiddles,
                                                  mesh)
                else:
                    ext = evaluate_values(stacked, domain, twiddles)
                for k, i in enumerate(idxs):
                    self.evaluations[i] = CircleEvaluation(domain, ext[k])
        with span("merkle"):
            from ..vcs.ops import Blake2sMerkleOps

            ops = merkle_ops or Blake2sMerkleOps
            self.commitment = ops.commit(
                [ev.values for ev in self.evaluations])
        root_words = (getattr(ops, "device_root_words", lambda t: None)
                      (self.commitment))
        if root_words is not None and hasattr(channel, "mix_root_device"):
            # async device mix: the commit phase never blocks on the tunnel
            # just to advance the Fiat-Shamir digest
            channel.mix_root_device(root_words)
        else:
            channel.mix_root(self.commitment.root())

    def decommit(self, queries: Dict[int, List[int]]):
        return self.commitment.decommit(
            queries, [ev.values for ev in self.evaluations])

    def decommit_deferred(self, queries: Dict[int, List[int]], batch,
                          pool=None):
        return self.commitment.decommit_deferred(
            queries, [ev.values for ev in self.evaluations], batch,
            pool=pool)


class TreeBuilder:
    def __init__(self, scheme: "CommitmentSchemeProver", tree_index: int):
        self._scheme = scheme
        self.tree_index = tree_index
        self.polys: List[CirclePoly] = []

    def extend_polys(self, columns: Sequence[CirclePoly]) -> TreeSubspan:
        start = len(self.polys)
        self.polys.extend(columns)
        return TreeSubspan(self.tree_index, start, len(self.polys))

    def extend_evals(self, columns: Sequence[CircleEvaluation]) -> TreeSubspan:
        from ..poly.circle_poly import interpolate_values

        interp_span = span("interpolation")
        interp_span.__enter__()
        columns = list(columns)
        polys: List[Optional[CirclePoly]] = [None] * len(columns)
        groups: Dict[int, List[int]] = {}
        for i, col in enumerate(columns):
            groups.setdefault(col.domain.log_size(), []).append(i)
        for log_size, idxs in groups.items():
            domain = columns[idxs[0]].domain
            stacked = jnp.stack([columns[i].values for i in idxs])
            if self._scheme.mesh is not None:
                from ..parallel.fft import interpolate_values_sharded

                coeffs = interpolate_values_sharded(
                    stacked, domain, self._scheme.twiddles, self._scheme.mesh)
            else:
                coeffs = interpolate_values(stacked, domain,
                                            self._scheme.twiddles)
            for k, i in enumerate(idxs):
                polys[i] = CirclePoly(coeffs[k])
        interp_span.__exit__(None, None, None)
        return self.extend_polys(polys)

    def commit(self, channel) -> None:
        self._scheme._commit(self.polys, channel)


class CommitmentSchemeProver:
    """With `mesh` (a jax.sharding.Mesh), the whole proving pipeline runs
    point-sharded: extension CFFTs use the explicit all-to-all split,
    Merkle/quotient/FRI kernels partition over the sharded columns via
    GSPMD.  All field math is exact uint32, so the proof bytes are
    bit-identical to the single-device path (tested)."""

    def __init__(self, config: PcsConfig, twiddles: TwiddleTree, mesh=None,
                 merkle_ops=None):
        self.config = config
        self.twiddles = twiddles
        self.mesh = mesh
        self.merkle_ops = merkle_ops
        self.trees: TreeVec = TreeVec()

    def _commit(self, polynomials: List[CirclePoly], channel) -> None:
        self.trees.append(CommitmentTreeProver(
            polynomials, self.config.fri_config.log_blowup_factor, channel,
            self.twiddles, mesh=self.mesh, merkle_ops=self.merkle_ops))

    def tree_builder(self) -> TreeBuilder:
        return TreeBuilder(self, len(self.trees))

    def roots(self) -> TreeVec:
        return TreeVec(t.commitment.root() for t in self.trees)

    def polynomials(self) -> TreeVec:
        return TreeVec(list(t.polynomials) for t in self.trees)

    def evaluations(self) -> TreeVec:
        return TreeVec(list(t.evaluations) for t in self.trees)

    def trace(self):
        from ..air import Trace

        return Trace(self.polynomials(), self.evaluations())

    def prove_values(self, sampled_points: TreeVec, channel
                     ) -> CommitmentSchemeProof:
        """reference pcs/prover.ts:86-156 (embedded Rust prove_values)."""
        # 1. Evaluate polynomials at the open points, batching all columns
        # of the same size sampled at the same point into one device fold.
        from ..poly.circle_poly import eval_columns_at_point

        oods_span = span("evaluate_columns_out_of_domain")
        oods_span.__enter__()
        from ..poly.circle_poly import eval_columns_at_point_deferred
        from ..utils import FetchBatch

        oods_batch = FetchBatch()
        pending = []  # (tree_samples, point, members, thunk)
        samples = TreeVec()
        for tree, tree_points in zip(self.trees, sampled_points):
            tree_samples = [[None] * len(points)
                            for points in tree_points]
            groups = {}  # (log_size, point_key) -> (point, [(col, point_idx)])
            for ci, (poly, points) in enumerate(zip(tree.polynomials,
                                                    tree_points)):
                for pi, p in enumerate(points):
                    key = (poly.log_size(), p.x.to_ints(), p.y.to_ints())
                    groups.setdefault(key, (p, []))[1].append((ci, pi))
            for (log_size, _, _), (point, members) in groups.items():
                stack = jnp.stack(
                    [tree.polynomials[ci].coeffs for ci, _ in members])
                thunk = eval_columns_at_point_deferred(stack, point,
                                                       log_size, oods_batch)
                pending.append((tree_samples, point, members, thunk))
            samples.append(tree_samples)
        oods_batch.materialize()  # ONE transfer for every sampled value
        for tree_samples, point, members, thunk in pending:
            for (ci, pi), v in zip(members, thunk()):
                tree_samples[ci][pi] = PointSample(point, v)
        sampled_values = TreeVec(
            [[s.value for s in col] for col in tree] for tree in samples)
        channel.mix_felts(
            [v for tree in sampled_values for col in tree for v in col])
        oods_span.__exit__(None, None, None)

        # 2. DEEP quotients on device.
        columns = self.evaluations().flatten()
        flat_samples = samples.flatten()
        random_coeff = channel.draw_felt()
        with span("fri_quotients"):
            quotients = compute_fri_quotients(
                columns, flat_samples, random_coeff,
                self.config.fri_config.log_blowup_factor)
        if self.mesh is not None:
            from ..parallel.fft import shard_column
            from ..poly.circle_poly import SecureEvaluation

            quotients = [
                SecureEvaluation(q.domain, shard_column(q.values, self.mesh))
                for q in quotients]

        # 3. FRI commitment phase.
        with span("fri_commit"):
            fri_prover = FriProver.commit(
                channel, self.config.fri_config, quotients, self.twiddles,
                merkle_ops=self.merkle_ops)

        # 4. Proof of work.
        with span("grind"):
            proof_of_work = grind(channel, self.config.pow_bits)
        channel.mix_u64(proof_of_work)

        # 5. FRI decommitment + Merkle decommitments: every gather of every
        # tree (4 commitment trees + every FRI layer tree) coalesces through
        # ONE GatherPool — one concatenate + one bucketed take per array
        # kind — and is pulled with ONE device->host transfer.
        from ..utils import FetchBatch, GatherPool

        with span("decommitment"):
            batch = FetchBatch()
            pool = GatherPool(batch)
            with span("decommit_build"):
                fri_finish, query_positions_per_log_size = (
                    fri_prover.decommit_deferred(channel, batch, pool=pool))
                tree_fins = [
                    tree.decommit_deferred(query_positions_per_log_size,
                                           batch, pool=pool)
                    for tree in self.trees]
                root_fins = [t.commitment.root_deferred(batch)
                             for t in self.trees]
                pool.seal()
            with span("decommit_transfer"):
                batch.materialize()
            with span("decommit_finish"):
                fri_proof = fri_finish()
                queried_values = TreeVec()
                decommitments = TreeVec()
                for fin in tree_fins:
                    values, dec = fin()
                    queried_values.append(values)
                    decommitments.append(dec)

        return CommitmentSchemeProof(
            config=self.config,
            commitments=TreeVec(f() for f in root_fins),
            sampled_values=sampled_values,
            decommitments=decommitments,
            queried_values=queried_values,
            proof_of_work=proof_of_work,
            fri_proof=fri_proof,
        )
