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


def test_two_components_share_trace_tree():
    import jax.numpy as jnp

    from tstwo_tpu.channel.blake2s import Blake2sChannel
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.constraint_framework import (FrameworkComponent,
                                                TraceLocationAllocator)
    from tstwo_tpu.examples.basic_air import TestEval, generate_trace
    from tstwo_tpu.pcs import PcsConfig
    from tstwo_tpu.pcs.prover import CommitmentSchemeProver
    from tstwo_tpu.pcs.verifier import CommitmentSchemeVerifier
    from tstwo_tpu.poly.circle_poly import CircleEvaluation
    from tstwo_tpu.poly.twiddles import precompute_twiddles
    from tstwo_tpu.prover import prove, verify

    log = 4
    config = PcsConfig()
    cols_a = generate_trace(log, col1_vals=(1, 7), col2_vals=(5, 11))
    cols_b = generate_trace(log, col1_vals=(2, 8), col2_vals=(6, 12))
    domain = CanonicCoset.new(log).circle_domain()
    trace = [CircleEvaluation(domain, c) for c in cols_a + cols_b]
    twiddles = precompute_twiddles(
        CanonicCoset.new(log + 2).circle_domain().half_coset)
    channel = Blake2sChannel()
    scheme = CommitmentSchemeProver(config, twiddles)
    tb = scheme.tree_builder()
    tb.extend_evals([])
    tb.commit(channel)
    channel.mix_u64(log)
    tb = scheme.tree_builder()
    tb.extend_evals(trace)
    tb.commit(channel)
    allocator = TraceLocationAllocator()
    from tstwo_tpu.fields import QM31

    comp_a = FrameworkComponent(allocator, TestEval(log), QM31.zero())
    comp_b = FrameworkComponent(allocator, TestEval(log), QM31.zero())
    assert comp_b.trace_locations[1].col_start == 3
    proof = prove([comp_a, comp_b], channel, scheme)

    vch = Blake2sChannel()
    vscheme = CommitmentSchemeVerifier(config)
    sizes_a = comp_a.trace_log_degree_bounds()
    sizes_b = comp_b.trace_log_degree_bounds()
    vscheme.commit(proof.commitments[0], [], vch)
    vch.mix_u64(log)
    vscheme.commit(proof.commitments[1],
                   list(sizes_a[1]) + list(sizes_b[1]), vch)
    verify([comp_a, comp_b], vch, vscheme, proof)
