"""FRI proof-mutation matrix: every FriVerificationError variant produced
from a VALID proof mutated one field at a time.

Port of the Rust-spec suite embedded in reference test/fri.test.ts:153-640
(fold_line_works, fold_circle_to_line_works, committing_* failures,
valid_* verifications, proof_with_* mutations).  The reference's own FRI
commitments are mocked; here every case runs against real Merkle
commitments and channel-drawn alphas.
"""
import copy

import numpy as np
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.circle import (CanonicCoset, CircleDomain, CirclePointIndex,
                              Coset)
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.fri import (CIRCLE_TO_LINE_FOLD_STEP, CirclePolyDegreeBound,
                           FriConfig, FriProof, FriProver,
                           FriVerificationError, FriVerifier,
                           LinePolyDegreeBound)
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.poly.circle_poly import SecureCirclePoly, SecureEvaluation
from tstwo_tpu.poly.line import Coset as _LC  # noqa: F401 (import check)
from tstwo_tpu.poly.line import LineDomain, LinePoly
from tstwo_tpu.poly.twiddles import precompute_twiddles
from tstwo_tpu.queries import Queries

LOG_BLOWUP_FACTOR = 2
P = (1 << 31) - 1


def polynomial_evaluation(log_degree, log_blowup_factor, seed=None):
    """Random (or all-ones) poly of degree 2^log_degree evaluated on the
    canonic domain of size 2^(log_degree+blowup), bit-reversed order
    (reference fri.test.ts:71-106)."""
    if seed is None:
        coeffs = np.ones((4, 1 << log_degree), dtype=np.uint32)
        coeffs[1:] = 0
    else:
        rng = np.random.default_rng(seed)
        coeffs = rng.integers(0, P, size=(4, 1 << log_degree),
                              dtype=np.uint32)
    sp = SecureCirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(log_degree + log_blowup_factor).circle_domain()
    return sp.evaluate(domain)


def query_polynomial(se: SecureEvaluation, queries: Queries):
    column_queries = queries.fold(
        queries.log_domain_size - se.domain.log_size())
    return [se.at(p) for p in column_queries.positions]


def commit_and_decommit(log_degree, positions, config=None, seed=7):
    config = config or FriConfig(2, LOG_BLOWUP_FACTOR, len(positions))
    ev = polynomial_evaluation(log_degree, config.log_blowup_factor,
                               seed=seed)
    tree = precompute_twiddles(ev.domain.half_coset)
    queries = Queries.from_positions(positions, ev.domain.log_size())
    prover = FriProver.commit(Blake2sChannel(), config, [ev], tree)
    proof = prover.decommit_on_queries(queries)
    return ev, queries, config, proof


def assert_fails_with(proof, config, bounds, queries, query_evals, msg_part):
    verifier = None
    try:
        verifier = FriVerifier.commit(Blake2sChannel(), config, proof, bounds)
    except FriVerificationError as e:
        assert msg_part in str(e)
        return
    with pytest.raises(FriVerificationError) as exc:
        verifier.decommit_on_queries(queries, query_evals)
    assert msg_part in str(exc.value)


# ---------------------------------------------------------------------------
# fold semantics (reference fri.test.ts:206-268, Rust fri.rs fold tests)
# ---------------------------------------------------------------------------

def test_fold_line_works():
    """f' = 2 * (f_even(pi(x)) + alpha * f_odd(pi(x)))."""
    from tstwo_tpu.ops import fri_ops, qm31 as qm31_ops
    from tstwo_tpu.poly.line import LineEvaluation
    from tstwo_tpu.utils import bit_reverse_permutation

    DEGREE = 8
    even = [QM31.from_base(M31(v)) for v in (1, 2, 1, 3)]
    odd = [QM31.from_base(M31(v)) for v in (3, 5, 4, 1)]
    poly = LinePoly.new(even + odd)
    even_poly = LinePoly.new(even)
    odd_poly = LinePoly.new(odd)
    alpha = QM31.from_base(M31(19283))
    domain = LineDomain.new(Coset.half_odds(3))
    drp_domain = domain.double()

    values = [poly.eval_at_point(QM31.from_base(x)) for x in domain.xs()]
    perm = bit_reverse_permutation(3)
    rev = [values[p] for p in perm]
    arr = np.array([v.to_ints() for v in rev], dtype=np.uint32).T
    tree = precompute_twiddles(domain.coset)
    itw = tree.layer_of_size(DEGREE // 2, inverse=True)
    out = np.asarray(fri_ops.fold_line(
        m31_ops.asarray(arr), itw, qm31_ops.scalar(alpha)))
    perm2 = bit_reverse_permutation(2)
    # invert the permutation: folded[i] corresponds to natural index
    folded_nat = [None] * 4
    for i, p in enumerate(perm2):
        folded_nat[p] = QM31.from_ints(out[:, i].tolist())
    for i in range(4):
        x = drp_domain.at(i)
        f_e = even_poly.eval_at_point(QM31.from_base(x))
        f_o = odd_poly.eval_at_point(QM31.from_base(x))
        want = (f_e + alpha * f_o).double()
        assert folded_nat[i] == want


def test_fold_circle_to_line_works():
    """Folded circle evaluation has log degree bound LOG_DEGREE - 1."""
    from tstwo_tpu.ops import fri_ops, qm31 as qm31_ops
    from tstwo_tpu.poly.line import LineEvaluation

    LOG_DEGREE = 4
    ev = polynomial_evaluation(LOG_DEGREE, LOG_BLOWUP_FACTOR, seed=3)
    folded_domain = LineDomain.new(ev.domain.half_coset)
    import jax.numpy as jnp

    dst = jnp.zeros((4, folded_domain.size()), dtype=jnp.uint32)
    alpha = QM31.one()
    vals = fri_ops.fold_circle_into_line(
        dst, ev.values, fri_ops.domain_y_itwiddles(ev.domain),
        qm31_ops.scalar(alpha))
    folded = LineEvaluation(folded_domain, vals)
    coeffs = folded.interpolate().into_ordered_coefficients()
    degree = max(i for i, c in enumerate(coeffs) if not c.is_zero())
    assert (degree + 1).bit_length() - 1 == LOG_DEGREE - \
        CIRCLE_TO_LINE_FOLD_STEP


# ---------------------------------------------------------------------------
# commit failures (reference fri.test.ts:270-312)
# ---------------------------------------------------------------------------

def test_committing_high_degree_polynomial_fails():
    config = FriConfig(2, LOG_BLOWUP_FACTOR, 3)
    column = polynomial_evaluation(6, LOG_BLOWUP_FACTOR - 1, seed=1)
    tree = precompute_twiddles(column.domain.half_coset)
    with pytest.raises(ValueError, match="invalid degree"):
        FriProver.commit(Blake2sChannel(), config, [column], tree)


def test_committing_column_from_invalid_domain_fails():
    invalid_domain = CircleDomain(Coset(CirclePointIndex.generator(), 3))
    assert not invalid_domain.is_canonic()
    import jax.numpy as jnp

    config = FriConfig(2, 2, 3)
    values = jnp.ones((4, 1 << 4), dtype=jnp.uint32)
    column = SecureEvaluation(invalid_domain, values)
    tree = precompute_twiddles(CanonicCoset.new(6).half_coset())
    with pytest.raises(ValueError, match="not canonic"):
        FriProver.commit(Blake2sChannel(), config, [column], tree)


# ---------------------------------------------------------------------------
# valid proofs (reference fri.test.ts:316-478)
# ---------------------------------------------------------------------------

def _verify_ok(ev_list, config, proof, bounds, queries):
    verifier = FriVerifier.commit(Blake2sChannel(), config, proof, bounds)
    evals = [query_polynomial(ev, queries) for ev in ev_list]
    verifier.decommit_on_queries(queries, evals)


def test_valid_proof_passes_verification():
    LOG_DEGREE = 4
    config = FriConfig(1, LOG_BLOWUP_FACTOR, 1)
    ev = polynomial_evaluation(LOG_DEGREE, LOG_BLOWUP_FACTOR, seed=11)
    tree = precompute_twiddles(ev.domain.half_coset)
    queries = Queries.from_positions([5], ev.domain.log_size())
    prover = FriProver.commit(Blake2sChannel(), config, [ev], tree)
    proof = prover.decommit_on_queries(queries)
    _verify_ok([ev], config, proof, [CirclePolyDegreeBound(LOG_DEGREE)],
               queries)


def test_valid_proof_with_constant_last_layer_passes_verification():
    LOG_DEGREE, LAST_LAYER_LOG_BOUND = 3, 0
    config = FriConfig(LAST_LAYER_LOG_BOUND, LOG_BLOWUP_FACTOR, 1)
    ev = polynomial_evaluation(LOG_DEGREE, LOG_BLOWUP_FACTOR, seed=12)
    tree = precompute_twiddles(ev.domain.half_coset)
    queries = Queries.from_positions([5], ev.domain.log_size())
    prover = FriProver.commit(Blake2sChannel(), config, [ev], tree)
    proof = prover.decommit_on_queries(queries)
    _verify_ok([ev], config, proof, [CirclePolyDegreeBound(LOG_DEGREE)],
               queries)


def test_valid_mixed_degree_proof_passes_verification():
    LOG_DEGREES = [6, 5, 4]
    config = FriConfig(2, LOG_BLOWUP_FACTOR, 2)
    evs = [polynomial_evaluation(d, LOG_BLOWUP_FACTOR, seed=20 + d)
           for d in LOG_DEGREES]
    tree = precompute_twiddles(evs[0].domain.half_coset)
    queries = Queries.from_positions([7, 70], evs[0].domain.log_size())
    prover = FriProver.commit(Blake2sChannel(), config, evs, tree)
    proof = prover.decommit_on_queries(queries)
    _verify_ok(evs, config, proof,
               [CirclePolyDegreeBound(d) for d in LOG_DEGREES], queries)


def test_mixed_degree_proof_with_queries_sampled_from_channel():
    LOG_DEGREES = [6, 5, 4]
    config = FriConfig(2, LOG_BLOWUP_FACTOR, 3)
    evs = [polynomial_evaluation(d, LOG_BLOWUP_FACTOR, seed=30 + d)
           for d in LOG_DEGREES]
    tree = precompute_twiddles(evs[0].domain.half_coset)
    prover = FriProver.commit(Blake2sChannel(), config, evs, tree)
    proof, prover_positions = prover.decommit(Blake2sChannel())

    verifier = FriVerifier.commit(Blake2sChannel(), config, proof,
                                  [CirclePolyDegreeBound(d)
                                   for d in LOG_DEGREES])
    verifier_positions = verifier.sample_query_positions(Blake2sChannel())
    assert verifier_positions == prover_positions
    evals = [[ev.at(p) for p in verifier_positions[ev.domain.log_size()]]
             for ev in evs]
    verifier.decommit(evals)


# ---------------------------------------------------------------------------
# mutation matrix (reference fri.test.ts:479-640; Rust fri.rs
# proof_with_* tests -- each verifier error from a valid proof mutated
# one field at a time)
# ---------------------------------------------------------------------------

def test_proof_with_removed_layer_fails_verification():
    _, queries, config, proof = commit_and_decommit(6, [1])
    # expect one more layer than the prover produced
    invalid_config = FriConfig(config.log_last_layer_degree_bound - 1,
                               config.log_blowup_factor, config.n_queries)
    with pytest.raises(FriVerificationError) as exc:
        FriVerifier.commit(Blake2sChannel(), invalid_config, proof,
                           [CirclePolyDegreeBound(6)])
    assert "invalid number of FRI layers" in str(exc.value)


def test_proof_with_added_layer_fails_verification():
    _, queries, config, proof = commit_and_decommit(6, [1])
    invalid_config = FriConfig(config.log_last_layer_degree_bound + 1,
                               config.log_blowup_factor, config.n_queries)
    with pytest.raises(FriVerificationError) as exc:
        FriVerifier.commit(Blake2sChannel(), invalid_config, proof,
                           [CirclePolyDegreeBound(6)])
    assert "invalid number of FRI layers" in str(exc.value)


def test_proof_with_invalid_inner_layer_evaluation_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    # remove an evaluation from the second inner layer's witness
    assert len(proof.inner_layers) > 1
    proof.inner_layers[1].fri_witness.pop()
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "evaluations are invalid in inner layer")


def test_proof_with_invalid_inner_layer_decommitment_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    w = proof.inner_layers[1].fri_witness
    w[0] = w[0] + QM31.one()
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "commitment in inner layer")


def test_proof_with_invalid_first_layer_evaluation_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    proof.first_layer.fri_witness.pop()
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "invalid in the first layer")


def test_proof_with_extra_first_layer_evaluation_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    proof.first_layer.fri_witness.append(QM31.one())
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "invalid in the first layer")


def test_proof_with_invalid_first_layer_decommitment_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    w = proof.first_layer.fri_witness
    w[0] = w[0] + QM31.one()
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "first layer")


def test_proof_with_tampered_first_layer_commitment_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    root = bytearray(proof.first_layer.commitment)
    root[0] ^= 1
    proof.first_layer.commitment = bytes(root)
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "first layer")


def test_proof_with_tampered_inner_layer_commitment_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    root = bytearray(proof.inner_layers[0].commitment)
    root[0] ^= 1
    proof.inner_layers[0].commitment = bytes(root)
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "inner layer")


def test_proof_with_invalid_last_layer_degree_fails_verification():
    ev, queries, config, proof = commit_and_decommit(4, [0],
                                                     FriConfig(1, LOG_BLOWUP_FACTOR, 1))
    invalid_coeffs = [QM31.one()] * (1 << (config.log_last_layer_degree_bound
                                           + 2))
    proof.last_layer_poly = LinePoly.from_ordered_coefficients(invalid_coeffs)
    with pytest.raises(FriVerificationError) as exc:
        FriVerifier.commit(Blake2sChannel(), config, proof,
                           [CirclePolyDegreeBound(4)])
    assert "degree of last layer is invalid" in str(exc.value)


def test_proof_with_invalid_last_layer_fails_verification():
    ev, queries, config, proof = commit_and_decommit(6, [5])
    coeffs = list(proof.last_layer_poly.coeffs)
    coeffs[0] = coeffs[0] + QM31.one()
    proof.last_layer_poly = LinePoly.new(coeffs)
    assert_fails_with(proof, config, [CirclePolyDegreeBound(6)], queries,
                      [query_polynomial(ev, queries)],
                      "last layer")


def test_decommit_queries_on_invalid_domain_fails_verification():
    ev, queries, config, proof = commit_and_decommit(3, [5],
                                                     FriConfig(1, LOG_BLOWUP_FACTOR, 1))
    verifier = FriVerifier.commit(Blake2sChannel(), config, proof,
                                  [CirclePolyDegreeBound(3)])
    invalid_queries = Queries.from_positions([2], queries.log_domain_size - 1)
    with pytest.raises((ValueError, FriVerificationError)):
        verifier.decommit_on_queries(invalid_queries,
                                     [query_polynomial(ev, queries)])


# ---------------------------------------------------------------------------
# config / bound units (reference fri.test.ts:642-686)
# ---------------------------------------------------------------------------

def test_fri_config_validation():
    FriConfig(0, 1, 1)
    FriConfig(10, 16, 100)
    with pytest.raises(ValueError):
        FriConfig(11, 1, 1)
    with pytest.raises(ValueError):
        FriConfig(-1, 1, 1)
    with pytest.raises(ValueError):
        FriConfig(0, 0, 1)
    with pytest.raises(ValueError):
        FriConfig(0, 17, 1)


def test_fri_config_security_bits():
    assert FriConfig(2, 3, 5).security_bits() == 15
    assert FriConfig(0, 1, 3).security_bits() == 3


def test_degree_bound_folding():
    b = CirclePolyDegreeBound(5)
    line = b.fold_to_line()
    assert line.log_degree_bound == 5 - CIRCLE_TO_LINE_FOLD_STEP
    assert line.fold(2).log_degree_bound == line.log_degree_bound - 2
    assert LinePolyDegreeBound(1).fold(2) is None
