"""Proof and channel-state serialization (JSON-compatible dicts).

The reference keeps proofs as plain data with byte-size estimation
(reference prover/index.ts:128-250); here we add full round-trip
serialization so proofs can be shipped between hosts and long multi-host
proving runs can checkpoint the transcript state between phases
(SURVEY.md section 5 checkpoint/resume).
"""
from __future__ import annotations

from typing import Any, Dict, List

from .channel.blake2s import Blake2sChannel
from .channel import ChannelTime
from .fields import M31, QM31
from .fri import FriLayerProof, FriProof
from .pcs import PcsConfig
from .fri import FriConfig
from .pcs.prover import CommitmentSchemeProof
from .pcs.utils import TreeVec
from .poly.line import LinePoly
from .prover import StarkProof
from .vcs.prover import MerkleDecommitment


def _qm31_to(v: QM31) -> List[int]:
    return list(v.to_ints())


def _qm31_from(v: List[int]) -> QM31:
    return QM31.from_ints(v)


def decommitment_to_dict(d: MerkleDecommitment) -> Dict[str, Any]:
    return {
        "hash_witness": [h.hex() for h in d.hash_witness],
        "column_witness": [m.value for m in d.column_witness],
    }


def decommitment_from_dict(d: Dict[str, Any]) -> MerkleDecommitment:
    return MerkleDecommitment(
        hash_witness=[bytes.fromhex(h) for h in d["hash_witness"]],
        column_witness=[M31(v) for v in d["column_witness"]],
    )


def fri_layer_to_dict(l: FriLayerProof) -> Dict[str, Any]:
    return {
        "fri_witness": [_qm31_to(v) for v in l.fri_witness],
        "decommitment": decommitment_to_dict(l.decommitment),
        "commitment": l.commitment.hex(),
    }


def fri_layer_from_dict(d: Dict[str, Any]) -> FriLayerProof:
    return FriLayerProof(
        fri_witness=[_qm31_from(v) for v in d["fri_witness"]],
        decommitment=decommitment_from_dict(d["decommitment"]),
        commitment=bytes.fromhex(d["commitment"]),
    )


def proof_to_dict(proof: StarkProof) -> Dict[str, Any]:
    p = proof.commitment_scheme_proof
    return {
        "config": {
            "pow_bits": p.config.pow_bits,
            "fri_config": {
                "log_last_layer_degree_bound":
                    p.config.fri_config.log_last_layer_degree_bound,
                "log_blowup_factor": p.config.fri_config.log_blowup_factor,
                "n_queries": p.config.fri_config.n_queries,
            },
        },
        "commitments": [c.hex() for c in p.commitments],
        "sampled_values": [[[_qm31_to(v) for v in col] for col in tree]
                           for tree in p.sampled_values],
        "decommitments": [decommitment_to_dict(d) for d in p.decommitments],
        "queried_values": [[m.value for m in tree] for tree in p.queried_values],
        "proof_of_work": p.proof_of_work,
        "fri_proof": {
            "first_layer": fri_layer_to_dict(p.fri_proof.first_layer),
            "inner_layers": [fri_layer_to_dict(l)
                             for l in p.fri_proof.inner_layers],
            "last_layer_poly": [_qm31_to(c)
                                for c in p.fri_proof.last_layer_poly.coeffs],
        },
    }


def proof_from_dict(d: Dict[str, Any]) -> StarkProof:
    cfg = PcsConfig(
        pow_bits=d["config"]["pow_bits"],
        fri_config=FriConfig(
            d["config"]["fri_config"]["log_last_layer_degree_bound"],
            d["config"]["fri_config"]["log_blowup_factor"],
            d["config"]["fri_config"]["n_queries"],
        ),
    )
    csp = CommitmentSchemeProof(
        config=cfg,
        commitments=TreeVec(bytes.fromhex(c) for c in d["commitments"]),
        sampled_values=TreeVec(
            [[_qm31_from(v) for v in col] for col in tree]
            for tree in d["sampled_values"]),
        decommitments=TreeVec(decommitment_from_dict(x)
                              for x in d["decommitments"]),
        queried_values=TreeVec([M31(v) for v in tree]
                               for tree in d["queried_values"]),
        proof_of_work=d["proof_of_work"],
        fri_proof=FriProof(
            first_layer=fri_layer_from_dict(d["fri_proof"]["first_layer"]),
            inner_layers=[fri_layer_from_dict(l)
                          for l in d["fri_proof"]["inner_layers"]],
            last_layer_poly=LinePoly(tuple(
                _qm31_from(c) for c in d["fri_proof"]["last_layer_poly"])),
        ),
    )
    return StarkProof(csp)


def channel_state_to_dict(ch: Blake2sChannel) -> Dict[str, Any]:
    """Checkpoint the Fiat-Shamir transcript state between proving phases."""
    return {
        "digest": ch.digest.hex(),
        "n_challenges": ch.channel_time.n_challenges,
        "n_sent": ch.channel_time.n_sent,
    }


def channel_state_from_dict(d: Dict[str, Any]) -> Blake2sChannel:
    return Blake2sChannel(
        digest=bytes.fromhex(d["digest"]),
        channel_time=ChannelTime(d["n_challenges"], d["n_sent"]),
    )


# ---------------------------------------------------------------------------
# Mid-prove phase checkpointing (SURVEY.md section 5 checkpoint/resume;
# VERDICT r3 next-round #9)
#
# A long multi-host prove has two expensive device phases separated by
# cheap host-side transcript steps: the commit phase (extension CFFTs +
# Merkle trees per committed tree) and the opening phase (quotients / FRI /
# decommitment).  `save_prover_checkpoint` snapshots everything the
# opening phase needs -- the Fiat-Shamir transcript state plus every
# committed tree's polynomials, evaluations and device-resident Merkle
# layers -- into one .npz; `load_prover_checkpoint` restores a
# CommitmentSchemeProver that continues to a byte-identical proof without
# re-running any committed work.
# ---------------------------------------------------------------------------

def prover_checkpoint_arrays(scheme, channel):
    """(meta dict, {name: numpy array}) snapshot of a CommitmentSchemeProver
    with N committed trees + the channel state."""
    import numpy as np

    from .vcs.ops import Blake2sMerkleOps

    meta: Dict[str, Any] = {
        "channel": channel_state_to_dict(channel),
        "config": {
            "pow_bits": scheme.config.pow_bits,
            "fri": [scheme.config.fri_config.log_last_layer_degree_bound,
                    scheme.config.fri_config.log_blowup_factor,
                    scheme.config.fri_config.n_queries],
        },
        # flavor/mesh-ness recorded so load can't silently rebuild the
        # wrong Merkle prover class (ADVICE r4 medium)
        "merkle_flavor": (scheme.merkle_ops or Blake2sMerkleOps).name,
        "mesh": scheme.mesh is not None,
        "trees": [],
    }
    arrays: Dict[str, Any] = {}
    for ti, tree in enumerate(scheme.trees):
        tmeta = {"poly_logs": [p.log_size() for p in tree.polynomials],
                 "eval_logs": [ev.domain.log_size()
                               for ev in tree.evaluations],
                 "n_layers": len(tree.commitment.layers)}
        meta["trees"].append(tmeta)
        for pi, poly in enumerate(tree.polynomials):
            arrays[f"t{ti}_p{pi}"] = np.asarray(poly.coeffs)
        for ei, ev in enumerate(tree.evaluations):
            arrays[f"t{ti}_e{ei}"] = np.asarray(ev.values)
        for li, layer in enumerate(tree.commitment.layers):
            arrays[f"t{ti}_l{li}"] = np.asarray(layer)
    return meta, arrays


def save_prover_checkpoint(path: str, scheme, channel) -> None:
    import json

    import numpy as np

    meta, arrays = prover_checkpoint_arrays(scheme, channel)
    np.savez_compressed(path, __meta__=json.dumps(meta), **arrays)


def load_prover_checkpoint(path: str, twiddles, mesh=None):
    """Restore (scheme, channel); `twiddles` is the same TwiddleTree a
    fresh prove would precompute (deterministic from the domain sizes).

    The checkpoint records its Merkle flavor and whether the saved scheme
    was mesh-sharded; the matching prover class is reconstructed, and a
    mesh-sharded checkpoint refuses to load without `mesh` (a silent
    default-to-Blake2s restore produced diverging proofs; ADVICE r4)."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from .circle import CanonicCoset
    from .pcs.prover import (CommitmentSchemeProver, CommitmentTreeProver)
    from .poly.circle_poly import CircleEvaluation, CirclePoly
    from .vcs.ops import Blake2sMerkleOps, Poseidon252MerkleOps

    data = np.load(path)
    meta = json.loads(str(data["__meta__"]))
    channel = channel_state_from_dict(meta["channel"])
    cfg = PcsConfig(meta["config"]["pow_bits"],
                    FriConfig(*meta["config"]["fri"]))
    flavor = meta.get("merkle_flavor", "blake2s")
    ops_by_name = {Blake2sMerkleOps.name: Blake2sMerkleOps,
                   Poseidon252MerkleOps.name: Poseidon252MerkleOps}
    if flavor not in ops_by_name:
        raise ValueError(f"checkpoint has unsupported Merkle flavor "
                         f"{flavor!r}; known: {sorted(ops_by_name)}")
    merkle_ops = ops_by_name[flavor]
    if meta.get("mesh", False) and mesh is None:
        raise ValueError(
            "checkpoint was saved from a mesh-sharded prove; pass the same "
            "jax.sharding.Mesh to load_prover_checkpoint(mesh=...)")
    scheme = CommitmentSchemeProver(
        cfg, twiddles, mesh=mesh,
        merkle_ops=None if merkle_ops is Blake2sMerkleOps else merkle_ops)
    prover_cls = merkle_ops.prover_cls()
    for ti, tmeta in enumerate(meta["trees"]):
        tree = CommitmentTreeProver.__new__(CommitmentTreeProver)
        tree.polynomials = [
            CirclePoly(jnp.asarray(data[f"t{ti}_p{pi}"]))
            for pi in range(len(tmeta["poly_logs"]))]
        tree.evaluations = [
            CircleEvaluation(
                CanonicCoset.new(log).circle_domain(),
                jnp.asarray(data[f"t{ti}_e{ei}"]))
            for ei, log in enumerate(tmeta["eval_logs"])]
        tree.commitment = prover_cls(
            [jnp.asarray(data[f"t{ti}_l{li}"])
             for li in range(tmeta["n_layers"])])
        scheme.trees.append(tree)
    return scheme, channel
