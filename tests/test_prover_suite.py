"""Prover orchestration suite: error paths, size estimates, proof-mutation
rejections (port of reference test/prover/index.test.ts -- 43 Rust-mirrored
cases -- restricted to the behavior the Rust spec defines; the TS file's
null/undefined-handling cases are TypeScript-isms and are not ported)."""
import copy

import numpy as np
import pytest

from tstwo_tpu.examples.basic_air import (TestEval,
                                          CONSTRAINT_EVAL_BLOWUP_FACTOR,
                                          generate_trace, prove_basic_air,
                                          verify_basic_air)
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.prover import (InvalidOodsSampleStructure, ProvingError,
                              StarkProof, VerificationError, prove, verify)

P = (1 << 31) - 1


@pytest.fixture(scope="module")
def basic_proof():
    return prove_basic_air(log_num_rows=4)


# ---------------------------------------------------------------------------
# Error model (prover/index.ts:39-121)
# ---------------------------------------------------------------------------

def test_proving_error_enum():
    assert "Constraints" in ProvingError.CONSTRAINTS_NOT_SATISFIED


def test_verification_error_enum():
    assert VerificationError.INVALID_STRUCTURE
    assert VerificationError.OODS_NOT_MATCHING
    assert VerificationError.PROOF_OF_WORK
    assert (VerificationError.INVALID_STRUCTURE
            != VerificationError.OODS_NOT_MATCHING)


def test_constraints_failure_detected():
    """An unsatisfiable trace must raise ConstraintsNotSatisfied at prove
    time (reference test 'should test constraints failure detection')."""
    import jax.numpy as jnp

    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.constraint_framework import (FrameworkComponent,
                                                TraceLocationAllocator)
    from tstwo_tpu.pcs import PcsConfig
    from tstwo_tpu.pcs.prover import CommitmentSchemeProver
    from tstwo_tpu.poly.circle_poly import CircleEvaluation
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    log_num_rows = 4
    config = PcsConfig()
    columns = generate_trace(log_num_rows)
    # break the constraint col1*col2 + col1 == col3 in one row
    bad = np.asarray(columns[2]).copy()
    bad[0] = (bad[0] + 1) % P
    columns = [columns[0], columns[1], jnp.asarray(bad)]
    domain = CanonicCoset.new(log_num_rows).circle_domain()
    trace = [CircleEvaluation(domain, col) for col in columns]
    twiddles = precompute_twiddles(
        CanonicCoset.new(log_num_rows + CONSTRAINT_EVAL_BLOWUP_FACTOR
                         + config.fri_config.log_blowup_factor
                         ).circle_domain().half_coset)
    channel = Blake2sChannel()
    scheme = CommitmentSchemeProver(config, twiddles)
    tb = scheme.tree_builder()
    tb.extend_evals([])
    tb.commit(channel)
    channel.mix_u64(log_num_rows)
    tb = scheme.tree_builder()
    tb.extend_evals(trace)
    tb.commit(channel)
    component = FrameworkComponent(TraceLocationAllocator(),
                                   TestEval(log_num_rows), QM31.zero())
    with pytest.raises(ProvingError):
        prove([component], channel, scheme)


# ---------------------------------------------------------------------------
# Size estimation (prover/index.ts:128-250; Rust SizeEstimate impls)
# ---------------------------------------------------------------------------

def test_merkle_decommitment_size_estimate_formula():
    from tstwo_tpu.vcs.prover import MerkleDecommitment

    d = MerkleDecommitment(hash_witness=[b"\0" * 32] * 3,
                           column_witness=[M31(1), M31(2)])
    assert d.size_estimate() == 32 * 3 + 4 * 2


def test_fri_layer_proof_size_estimate(basic_proof):
    proof, _, _ = basic_proof
    fp = proof.commitment_scheme_proof.fri_proof
    # 16 bytes per QM31 witness value + decommitment + 32-byte commitment
    first = fp.first_layer
    expected = (16 * len(first.fri_witness)
                + first.decommitment.size_estimate() + 32)
    total = proof.size_estimate()
    assert expected > 0 and expected < total


def test_proof_size_estimate_matches_breakdown(basic_proof):
    proof, _, _ = basic_proof
    bd = proof.size_breakdown_estimate()
    # the 8-byte proof-of-work nonce is the only part outside the
    # breakdown categories
    assert proof.size_estimate() - sum(bd.values()) == 8
    for key in ("oods_samples", "queries_values", "fri_samples",
                "fri_decommitments", "trace_decommitments"):
        assert key in bd, bd.keys()
        assert bd[key] >= 0


def test_size_estimate_cached_and_positive(basic_proof):
    proof, _, _ = basic_proof
    a = proof.size_estimate()
    assert a > 0
    assert proof.size_estimate() == a


# ---------------------------------------------------------------------------
# StarkProof accessors + OODS extraction (prover/index.ts:393-468)
# ---------------------------------------------------------------------------

def test_proof_accessors(basic_proof):
    proof, _, _ = basic_proof
    assert len(proof.commitments) == 3  # preprocessed, trace, composition
    assert all(isinstance(c, bytes) and len(c) == 32
               for c in proof.commitments)
    sv = proof.sampled_values
    assert len(sv[-1]) == 4  # composition tree: 4 coordinate columns


def test_extract_composition_oods_eval_from_partial_evals(basic_proof):
    proof, _, _ = basic_proof
    v = proof.extract_composition_oods_eval()
    cols = proof.sampled_values[-1]
    want = QM31.from_partial_evals([col[0] for col in cols])
    assert v == want


def test_extract_composition_oods_eval_empty_rejected(basic_proof):
    proof, _, _ = basic_proof
    csp = copy.copy(proof.commitment_scheme_proof)
    csp.sampled_values = type(csp.sampled_values)([])
    with pytest.raises(InvalidOodsSampleStructure):
        StarkProof(csp).extract_composition_oods_eval()


# ---------------------------------------------------------------------------
# verify() mutation rejections (Rust prover.rs error paths)
# ---------------------------------------------------------------------------

def _reverify(proof, component, config, log=4):
    verify_basic_air(proof, component, config, log_num_rows=log)


def test_verify_ok(basic_proof):
    proof, component, config = basic_proof
    _reverify(proof, component, config)


def test_verify_rejects_wrong_pow(basic_proof):
    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    bad.proof_of_work = proof.commitment_scheme_proof.proof_of_work + 1
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


def test_verify_rejects_removed_fri_inner_layer(basic_proof):
    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    fp = copy.copy(bad.fri_proof)
    fp.inner_layers = fp.inner_layers[:-1]
    bad.fri_proof = fp
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


def test_verify_rejects_truncated_queried_values(basic_proof):
    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    qv = type(bad.queried_values)(list(v) for v in bad.queried_values)
    qv[1] = qv[1][:-1]
    bad.queried_values = qv
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


def test_verify_rejects_tampered_fri_last_layer(basic_proof):
    from tstwo_tpu.poly.line import LinePoly

    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    fp = copy.copy(bad.fri_proof)
    coeffs = [c + QM31.one() for c in fp.last_layer_poly.coeffs]
    fp.last_layer_poly = LinePoly.new(coeffs)
    bad.fri_proof = fp
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


def test_verify_rejects_swapped_commitments(basic_proof):
    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    cm = list(bad.commitments)
    cm[1], cm[2] = cm[2], cm[1]
    bad.commitments = type(bad.commitments)(cm)
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


def test_verify_rejects_tampered_sampled_trace_value(basic_proof):
    proof, component, config = basic_proof
    bad = copy.copy(proof.commitment_scheme_proof)
    sv = type(bad.sampled_values)(
        [list(col) for col in tree] for tree in bad.sampled_values)
    sv[1][0][0] = sv[1][0][0] + QM31.one()
    bad.sampled_values = sv
    with pytest.raises(Exception):
        _reverify(StarkProof(bad), component, config)


@pytest.mark.parametrize("log_num_rows", [4, 5, 6])
def test_prove_verify_cycle_multiple_sizes(log_num_rows):
    proof, component, config = prove_basic_air(log_num_rows=log_num_rows)
    verify_basic_air(proof, component, config, log_num_rows=log_num_rows)


# ---------------------------------------------------------------------------
# Size-estimate primitives + OODS structure variants
# (prover/index.test.ts:97-156, 313-336 — Rust SizeEstimate impls)
# ---------------------------------------------------------------------------

def test_base_field_size_estimate():
    """Rust test_base_field_size_estimate: an M31 serializes to 4 bytes."""
    from tstwo_tpu.fields import M31

    assert len(M31(123).to_bytes()) == 4


def test_secure_field_size_estimate():
    """Rust test_secure_field_size_estimate: a QM31 serializes to 16."""
    assert len(QM31.from_ints([1, 2, 3, 4]).to_bytes()) == 16


def test_hash_size_estimate():
    """A Merkle root (Blake2s) contributes 32 bytes."""
    import hashlib

    assert len(hashlib.blake2s(b"x").digest()) == 32


def test_size_estimate_vec_is_sum(basic_proof):
    proof, _, _ = basic_proof
    p = proof.commitment_scheme_proof
    flat = p.sampled_values.flatten_cols()
    assert 16 * len(flat) == proof.size_breakdown_estimate()["oods_samples"]


def test_oods_wrong_column_count_rejected(basic_proof):
    import copy

    proof, _, _ = basic_proof
    csp = copy.copy(proof.commitment_scheme_proof)
    sv = list(csp.sampled_values)
    sv[-1] = sv[-1][:3]  # drop one coordinate column
    csp.sampled_values = type(csp.sampled_values)(sv)
    with pytest.raises(InvalidOodsSampleStructure, match="4"):
        StarkProof(csp).extract_composition_oods_eval()


def test_oods_multiple_evals_per_column_rejected(basic_proof):
    import copy

    proof, _, _ = basic_proof
    csp = copy.copy(proof.commitment_scheme_proof)
    sv = list(csp.sampled_values)
    sv[-1] = [[col[0], col[0]] for col in sv[-1]]
    csp.sampled_values = type(csp.sampled_values)(sv)
    with pytest.raises(InvalidOodsSampleStructure, match="one eval"):
        StarkProof(csp).extract_composition_oods_eval()


def test_size_breakdown_keys_complete(basic_proof):
    proof, _, _ = basic_proof
    bd = proof.size_breakdown_estimate()
    assert set(bd) == {"oods_samples", "queries_values", "fri_samples",
                      "fri_decommitments", "trace_decommitments"}
    assert all(v >= 0 for v in bd.values())
