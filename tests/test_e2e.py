"""End-to-end STARK prove + verify of the canonical 3-column AIR
(rust-examples/05_proving_an_air.rs), plus tamper-rejection tests."""
import copy

import pytest

from tstwo_tpu.examples.basic_air import (prove_basic_air, verify_basic_air)
from tstwo_tpu.fields import M31, QM31


def test_prove_and_verify_basic_air():
    proof, component, config = prove_basic_air(log_num_rows=4)
    verify_basic_air(proof, component, config, log_num_rows=4)


def test_verify_rejects_tampered_sampled_value():
    proof, component, config = prove_basic_air(log_num_rows=4)
    proof.sampled_values[1][0][0] = (
        proof.sampled_values[1][0][0] + QM31.one())
    with pytest.raises(Exception):
        verify_basic_air(proof, component, config, log_num_rows=4)


def test_verify_rejects_tampered_queried_value():
    proof, component, config = prove_basic_air(log_num_rows=4)
    if proof.commitment_scheme_proof.queried_values[1]:
        proof.commitment_scheme_proof.queried_values[1][0] = (
            proof.commitment_scheme_proof.queried_values[1][0] + M31(1))
        with pytest.raises(Exception):
            verify_basic_air(proof, component, config, log_num_rows=4)


def test_verify_rejects_tampered_pow():
    proof, component, config = prove_basic_air(log_num_rows=4)
    proof.commitment_scheme_proof.proof_of_work += 1
    with pytest.raises(Exception):
        verify_basic_air(proof, component, config, log_num_rows=4)


def test_proof_size_estimate_positive():
    proof, component, config = prove_basic_air(log_num_rows=4)
    assert proof.size_estimate() > 0
    bd = proof.size_breakdown_estimate()
    assert all(v >= 0 for v in bd.values())
    assert sum(bd.values()) > 0


def test_invalid_oods_structure_detected():
    from tstwo_tpu.prover import InvalidOodsSampleStructure

    proof, component, config = prove_basic_air(log_num_rows=4)
    # drop a composition column -> invalid structure
    del proof.sampled_values[-1][0]
    with pytest.raises(Exception):
        verify_basic_air(proof, component, config, log_num_rows=4)


def test_verify_rejects_tampered_commitment():
    proof, component, config = prove_basic_air(log_num_rows=4)
    proof.commitment_scheme_proof.commitments[1] = b"\x07" * 32
    with pytest.raises(Exception):
        verify_basic_air(proof, component, config, log_num_rows=4)
