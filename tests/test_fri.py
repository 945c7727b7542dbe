"""FRI prover/verifier roundtrip tests (ports of reference test/fri.test.ts
semantics, with real commitments)."""
import numpy as np
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.fields import QM31
from tstwo_tpu.fri import (CirclePolyDegreeBound, FriConfig, FriProver,
                           FriVerificationError, FriVerifier)
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.poly.circle_poly import SecureCirclePoly, SecureEvaluation
from tstwo_tpu.poly.twiddles import precompute_twiddles
from tstwo_tpu.queries import Queries
from tstwo_tpu.utils import bit_reverse_index


def make_secure_eval(log_degree, log_blowup, seed=0):
    rng = np.random.default_rng(seed)
    coeffs = rng.integers(0, (1 << 31) - 1, size=(4, 1 << log_degree),
                          dtype=np.uint32)
    sp = SecureCirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(log_degree + log_blowup).circle_domain()
    return sp.evaluate(domain), sp


def query_evals_for_column(se: SecureEvaluation, positions):
    return [se.at(p) for p in positions]


@pytest.mark.parametrize("log_degree", [4, 6])
def test_fri_prove_verify_single_column(log_degree):
    config = FriConfig(1, 1, 3)
    ev, _ = make_secure_eval(log_degree, config.log_blowup_factor)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, positions = prover.decommit(ch)

    vch = Blake2sChannel()
    bounds = [CirclePolyDegreeBound(log_degree)]
    verifier = FriVerifier.commit(vch, config, proof, bounds)
    vpos = verifier.sample_query_positions(vch)
    assert vpos == positions
    log_size = ev.domain.log_size()
    evals = query_evals_for_column(ev, vpos[log_size])
    verifier.decommit([evals])  # should not raise


def test_fri_multiple_column_sizes():
    config = FriConfig(1, 1, 2)
    ev1, _ = make_secure_eval(6, config.log_blowup_factor, seed=1)
    ev2, _ = make_secure_eval(4, config.log_blowup_factor, seed=2)
    tree = precompute_twiddles(ev1.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev1, ev2], tree)
    proof, positions = prover.decommit(ch)

    vch = Blake2sChannel()
    bounds = [CirclePolyDegreeBound(6), CirclePolyDegreeBound(4)]
    verifier = FriVerifier.commit(vch, config, proof, bounds)
    vpos = verifier.sample_query_positions(vch)
    evals = [query_evals_for_column(ev1, vpos[ev1.domain.log_size()]),
             query_evals_for_column(ev2, vpos[ev2.domain.log_size()])]
    verifier.decommit(evals)


def test_fri_rejects_tampered_witness():
    config = FriConfig(1, 1, 2)
    ev, _ = make_secure_eval(5, config.log_blowup_factor, seed=3)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, _ = prover.decommit(ch)
    if proof.inner_layers[0].fri_witness:
        proof.inner_layers[0].fri_witness[0] = (
            proof.inner_layers[0].fri_witness[0] + QM31.one())
    vch = Blake2sChannel()
    verifier = FriVerifier.commit(vch, config, proof,
                                  [CirclePolyDegreeBound(5)])
    vpos = verifier.sample_query_positions(vch)
    evals = [query_evals_for_column(ev, vpos[ev.domain.log_size()])]
    with pytest.raises(FriVerificationError):
        verifier.decommit(evals)


def test_fri_rejects_high_degree():
    config = FriConfig(0, 1, 2)
    rng = np.random.default_rng(7)
    domain = CanonicCoset.new(5).circle_domain()
    values = m31_ops.asarray(
        rng.integers(0, (1 << 31) - 1, size=(4, 32), dtype=np.uint32))
    ev = SecureEvaluation(domain, values)  # random values: NOT low degree
    tree = precompute_twiddles(domain.half_coset)
    ch = Blake2sChannel()
    with pytest.raises(ValueError, match="invalid degree"):
        FriProver.commit(ch, config, [ev], tree)


def test_fri_larger_last_layer():
    # exercises LinePoly.eval_at_point with multiple doublings
    config = FriConfig(3, 1, 2)
    ev, _ = make_secure_eval(6, config.log_blowup_factor, seed=9)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, _ = prover.decommit(ch)
    assert len(proof.last_layer_poly) == 8
    vch = Blake2sChannel()
    verifier = FriVerifier.commit(vch, config, proof, [CirclePolyDegreeBound(6)])
    vpos = verifier.sample_query_positions(vch)
    evals = [query_evals_for_column(ev, vpos[ev.domain.log_size()])]
    verifier.decommit(evals)


def test_fri_invalid_num_layers_rejected():
    # proof for log 6 verified against wrong bounds -> InvalidNumFriLayers
    config = FriConfig(1, 1, 2)
    ev, _ = make_secure_eval(6, config.log_blowup_factor, seed=11)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, _ = prover.decommit(ch)
    vch = Blake2sChannel()
    with pytest.raises((FriVerificationError, ValueError)):
        FriVerifier.commit(vch, config, proof, [CirclePolyDegreeBound(4)])


def test_fri_last_layer_degree_rejected():
    config = FriConfig(1, 1, 2)
    ev, _ = make_secure_eval(5, config.log_blowup_factor, seed=12)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, _ = prover.decommit(ch)
    # inflate the last layer polynomial beyond the bound
    from tstwo_tpu.fields import QM31
    from tstwo_tpu.poly.line import LinePoly

    big = LinePoly(tuple([QM31.one()] * 4))
    proof.last_layer_poly = big
    vch = Blake2sChannel()
    with pytest.raises(FriVerificationError, match="degree"):
        FriVerifier.commit(vch, config, proof, [CirclePolyDegreeBound(5)])


def test_fri_tampered_commitment_rejected():
    config = FriConfig(1, 1, 2)
    ev, _ = make_secure_eval(5, config.log_blowup_factor, seed=13)
    tree = precompute_twiddles(ev.domain.half_coset)
    ch = Blake2sChannel()
    prover = FriProver.commit(ch, config, [ev], tree)
    proof, _ = prover.decommit(ch)
    proof.inner_layers[0].commitment = b"\x01" * 32
    vch = Blake2sChannel()
    verifier = FriVerifier.commit(vch, config, proof, [CirclePolyDegreeBound(5)])
    vpos = verifier.sample_query_positions(vch)
    evals = [query_evals_for_column(ev, vpos[ev.domain.log_size()])]
    with pytest.raises(FriVerificationError):
        verifier.decommit(evals)


def test_fused_commit_matches_host_commit():
    """The device-transcript commit must be bit-identical to the host-channel
    commit: same roots, alphas (via identical channel state), witnesses,
    last-layer poly, and final channel state."""
    config = FriConfig(1, 1, 3)
    ev1, _ = make_secure_eval(7, config.log_blowup_factor, seed=11)
    ev2, _ = make_secure_eval(5, config.log_blowup_factor, seed=12)
    tree = precompute_twiddles(ev1.domain.half_coset)

    ch_f = Blake2sChannel()
    prover_f = FriProver.commit(ch_f, config, [ev1, ev2], tree)
    ch_h = Blake2sChannel()
    prover_h = FriProver.commit_host(ch_h, config, [ev1, ev2], tree)

    assert ch_f.digest == ch_h.digest
    assert ch_f.channel_time.n_challenges == ch_h.channel_time.n_challenges
    assert ch_f.channel_time.n_sent == ch_h.channel_time.n_sent
    assert prover_f.last_layer_poly.coeffs == prover_h.last_layer_poly.coeffs
    assert (prover_f.first_layer.merkle_tree.root()
            == prover_h.first_layer.merkle_tree.root())
    assert len(prover_f.inner_layers) == len(prover_h.inner_layers)
    for lf, lh in zip(prover_f.inner_layers, prover_h.inner_layers):
        assert lf.merkle_tree.root() == lh.merkle_tree.root()
        assert np.array_equal(np.asarray(lf.evaluation.values),
                              np.asarray(lh.evaluation.values))

    proof_f, pos_f = prover_f.decommit(ch_f)
    proof_h, pos_h = prover_h.decommit(ch_h)
    assert pos_f == pos_h
    assert proof_f.first_layer.fri_witness == proof_h.first_layer.fri_witness
    assert (proof_f.first_layer.decommitment.hash_witness
            == proof_h.first_layer.decommitment.hash_witness)
    for a, b in zip(proof_f.inner_layers, proof_h.inner_layers):
        assert a.fri_witness == b.fri_witness
        assert a.commitment == b.commitment


def test_decompose_semantics_and_first_layer_is_raw():
    """`decompose` (reference fri.ts:107 FriOps, backend/cpu/fri.ts:133-163)
    splits a FRI-space eval into an fft-space part g and a remainder lambda:
    lambda = (sum(first half) - sum(second half)) / N, g = v -/+ lambda.

    The op is part of the backend trait surface but -- exactly like the
    reference and current Rust stwo -- it has NO call site on the production
    commit path: FriProver.commit's first layer commits the RAW secure
    evaluations (reference fri.ts:485 FriFirstLayerProver commits
    `columns.flatMap(coordinate columns)` without decomposing; the
    circle->line fold happens after the first alpha is drawn).  This test
    pins both facts so a future port of older-stwo semantics (which DID
    decompose before the first commit) fails loudly.
    """
    import jax.numpy as jnp

    from tstwo_tpu.ops.fri_ops import decompose

    P = (1 << 31) - 1
    rng = np.random.default_rng(42)
    n = 1 << 8
    vals = rng.integers(0, P, size=(4, n), dtype=np.uint32)
    g, lam = decompose(jnp.asarray(vals))
    g = np.asarray(g).astype(np.uint64)
    lam = np.asarray(lam).astype(np.uint64)
    # host oracle
    half = n // 2
    a = vals[:, :half].astype(np.uint64).sum(axis=1) % P
    b = vals[:, half:].astype(np.uint64).sum(axis=1) % P
    n_inv = pow(n, P - 2, P)
    lam_want = ((a + P - b) % P) * n_inv % P
    assert np.array_equal(lam, lam_want)
    want_first = (vals[:, :half].astype(np.uint64) + P - lam_want[:, None]) % P
    want_second = (vals[:, half:].astype(np.uint64) + lam_want[:, None]) % P
    assert np.array_equal(g[:, :half], want_first)
    assert np.array_equal(g[:, half:], want_second)

    # first FRI layer commits the raw evaluations (no decompose)
    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.fri import FriFirstLayerProver
    from tstwo_tpu.poly.circle_poly import SecureEvaluation
    from tstwo_tpu.vcs import MerkleProver

    domain = CanonicCoset.new(8).circle_domain()
    se = SecureEvaluation(domain, jnp.asarray(vals))
    first = FriFirstLayerProver([se])
    direct = MerkleProver.commit([se.values[i] for i in range(4)])
    assert first.merkle_tree.root() == direct.root()
