"""Port of the reference FRI test cases beyond test_fri.py /
test_fri_mutations.py: test/fri.test.ts:687-936 (fold kernels vs scalar
folds, SparseEvaluation validation, decommitment-position machinery,
accumulate_line) and test/backend/cpu/fri.test.ts decompose edges
(~25 cases).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.circle import CanonicCoset, Coset
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.fri import (FOLD_STEP, InsufficientWitnessError,
                           SparseEvaluation, accumulate_line,
                           compute_decommitment_positions_and_rebuild_evals,
                           compute_decommitment_positions_and_witness_evals,
                           fold_circle_pair, fold_line_pair)
from tstwo_tpu.ops.fri_ops import (decompose, domain_y_itwiddles,
                                   fold_circle_into_line, fold_line)
from tstwo_tpu.poly.line import LineDomain
from tstwo_tpu.queries import Queries
from tstwo_tpu.utils import bit_reverse_index

P = (1 << 31) - 1


def _q(vals):
    return QM31.from_ints([int(v) for v in vals])


def _col(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, P, size=(4, n), dtype=np.uint32)


# ---------------------------------------------------------------------------
# fold_line / fold_circle_into_line — device kernel vs scalar fold
# ---------------------------------------------------------------------------

def test_fold_line_matches_scalar_pairs():
    log = 3
    domain = LineDomain(Coset.half_odds(log))
    vals = _col(1 << log, seed=1)
    alpha = _q([19283, 0, 0, 0])
    itw = np.array(
        [domain.coset.index_at(bit_reverse_index(2 * i, log))
         .to_point().x.inverse().value
         for i in range(1 << (log - 1))], dtype=np.uint32)
    out = np.asarray(fold_line(jnp.asarray(vals), jnp.asarray(itw),
                               jnp.asarray(np.array(alpha.to_ints(),
                                                    dtype=np.uint32))))
    assert out.shape == (4, 1 << (log - 1))
    for i in range(1 << (log - 1)):
        e0, e1 = _q(vals[:, 2 * i]), _q(vals[:, 2 * i + 1])
        x = domain.coset.index_at(bit_reverse_index(2 * i, log)).to_point().x
        want = fold_line_pair(e0, e1, x, alpha)
        assert _q(out[:, i]) == want


def test_fold_line_halves_length():
    itw = np.ones(4, dtype=np.uint32)
    out = fold_line(jnp.asarray(_col(8)), jnp.asarray(itw),
                    jnp.asarray(np.array([1, 0, 0, 0], dtype=np.uint32)))
    assert out.shape == (4, 4)


def test_fold_circle_into_line_matches_scalar_pairs():
    log = 4
    domain = CanonicCoset.new(log).circle_domain()
    vals = _col(1 << log, seed=2)
    dst = _col(1 << (log - 1), seed=3)
    alpha = _q([7, 11, 13, 17])
    y_itw = domain_y_itwiddles(domain)
    a_arr = jnp.asarray(np.array(alpha.to_ints(), dtype=np.uint32))
    out = np.asarray(fold_circle_into_line(
        jnp.asarray(dst), jnp.asarray(vals), y_itw, a_arr))
    for i in range(1 << (log - 1)):
        e0, e1 = _q(vals[:, 2 * i]), _q(vals[:, 2 * i + 1])
        p = domain.at(bit_reverse_index(2 * i, log))
        f_prime = fold_circle_pair(e0, e1, p.y, alpha)
        want = _q(dst[:, i]) * (alpha * alpha) + f_prime
        assert _q(out[:, i]) == want


def test_fold_circle_reduces_size_by_fold_step():
    log = 4
    domain = CanonicCoset.new(log).circle_domain()
    vals = _col(1 << log)
    dst = np.zeros((4, 1 << (log - 1)), dtype=np.uint32)
    out = fold_circle_into_line(
        jnp.asarray(dst), jnp.asarray(vals), domain_y_itwiddles(domain),
        jnp.asarray(np.array([1, 0, 0, 0], dtype=np.uint32)))
    assert out.shape == (4, 1 << (log - 1))


# ---------------------------------------------------------------------------
# SparseEvaluation
# ---------------------------------------------------------------------------

def test_sparse_evaluation_valid():
    fold_factor = 1 << FOLD_STEP
    se = SparseEvaluation(
        [[QM31.one()] * fold_factor, [QM31.zero()] * fold_factor], [0, 1])
    assert len(se.subset_evals) == 2
    assert len(se.subset_domain_initial_indexes) == 2


def test_sparse_evaluation_wrong_subset_size():
    with pytest.raises(ValueError, match="2\\^FOLD_STEP"):
        SparseEvaluation([[QM31.one()], [QM31.zero(), QM31.one()]], [0, 1])


def test_sparse_evaluation_mismatched_lengths():
    fold_factor = 1 << FOLD_STEP
    with pytest.raises(ValueError, match="length mismatch"):
        SparseEvaluation([[QM31.one()] * fold_factor], [0, 1])


def test_sparse_fold_line_matches_pair_fold():
    log = 3
    domain = LineDomain(Coset.half_odds(log))
    evals = [[_q([1, 2, 3, 4]), _q([5, 6, 7, 8])]]
    se = SparseEvaluation(evals, [0])
    alpha = _q([9, 0, 1, 0])
    [got] = se.fold_line(alpha, domain)
    x = domain.coset.index_at(0).to_point().x
    assert got == fold_line_pair(evals[0][0], evals[0][1], x, alpha)


def test_sparse_fold_circle_matches_pair_fold():
    log = 3
    domain = CanonicCoset.new(log).circle_domain()
    evals = [[_q([1, 0, 2, 0]), _q([0, 3, 0, 4])]]
    se = SparseEvaluation(evals, [2])
    alpha = _q([5, 5, 5, 5])
    [got] = se.fold_circle(alpha, domain)
    p = domain.index_at(2).to_point()
    assert got == fold_circle_pair(evals[0][0], evals[0][1], p.y, alpha)


# ---------------------------------------------------------------------------
# computeDecommitmentPositionsAndWitnessEvals
# ---------------------------------------------------------------------------

def test_decommitment_positions_cover_query_cosets():
    col = np.array([[1, 2, 3, 4]] * 4, dtype=np.uint32)
    positions, witness = compute_decommitment_positions_and_witness_evals(
        col, [0, 2], 1)
    assert positions == [0, 1, 2, 3]
    # witness = the non-queried half of each coset: positions 1 and 3
    assert [w.to_ints()[0] for w in witness] == [2, 4]


def test_decommitment_positions_single_query():
    col = _col(8, seed=4)
    positions, witness = compute_decommitment_positions_and_witness_evals(
        col, [5], 1)
    assert positions == [4, 5]
    assert len(witness) == 1
    assert witness[0] == _q(col[:, 4])


def test_decommitment_positions_full_coset_queried_no_witness():
    col = _col(4, seed=5)
    positions, witness = compute_decommitment_positions_and_witness_evals(
        col, [0, 1], 1)
    assert positions == [0, 1]
    assert witness == []


def test_decommitment_positions_fold_step_2():
    col = _col(16, seed=6)
    positions, witness = compute_decommitment_positions_and_witness_evals(
        col, [4], 2)
    assert positions == [4, 5, 6, 7]
    assert [w.to_ints() for w in witness] == [
        _q(col[:, k]).to_ints() for k in (5, 6, 7)]


# ---------------------------------------------------------------------------
# computeDecommitmentPositionsAndRebuildEvals
# ---------------------------------------------------------------------------

def test_rebuild_evals_roundtrip_with_witness():
    log = 2
    col = _col(1 << log, seed=7)
    qpos = [0, 2]
    _, witness = compute_decommitment_positions_and_witness_evals(
        col, qpos, 1)
    queries = Queries.from_positions(qpos, log)
    query_evals = [_q(col[:, p]) for p in qpos]
    positions, sparse = compute_decommitment_positions_and_rebuild_evals(
        queries, query_evals, iter(witness), 1)
    assert positions == [0, 1, 2, 3]
    # the rebuilt subsets are exactly the original column cosets
    flat = [e for subset in sparse.subset_evals for e in subset]
    assert [e.to_ints() for e in flat] == [
        _q(col[:, k]).to_ints() for k in range(4)]
    # and the initial indexes are the bit-reversed coset starts
    assert sparse.subset_domain_initial_indexes == [
        bit_reverse_index(0, log), bit_reverse_index(2, log)]


def test_rebuild_evals_insufficient_witness():
    queries = Queries.from_positions([0, 2], 2)
    query_evals = [_q([1, 0, 0, 0]), _q([3, 0, 0, 0])]
    with pytest.raises(InsufficientWitnessError):
        compute_decommitment_positions_and_rebuild_evals(
            queries, query_evals, iter([]), 1)


def test_rebuild_then_fold_matches_direct_fold():
    """Verifier-side rebuild + sparse fold == prover-side direct fold."""
    log = 3
    domain = CanonicCoset.new(log).circle_domain()
    col = _col(1 << log, seed=8)
    alpha = _q([21, 4, 1, 9])
    qpos = [1, 6]
    _, witness = compute_decommitment_positions_and_witness_evals(
        col, qpos, 1)
    queries = Queries.from_positions(qpos, log)
    query_evals = [_q(col[:, p]) for p in qpos]
    _, sparse = compute_decommitment_positions_and_rebuild_evals(
        queries, query_evals, iter(witness), 1)
    folded = sparse.fold_circle(alpha, domain)
    for k, coset_start in enumerate([0, 6]):
        e0, e1 = _q(col[:, coset_start]), _q(col[:, coset_start + 1])
        p = domain.at(bit_reverse_index(coset_start, log))
        assert folded[k] == fold_circle_pair(e0, e1, p.y, alpha)


# ---------------------------------------------------------------------------
# accumulateLine
# ---------------------------------------------------------------------------

def test_accumulate_line_formula():
    layer = [_q([1, 0, 0, 0]), _q([2, 0, 0, 0])]
    column = [_q([3, 0, 0, 0]), _q([4, 0, 0, 0])]
    alpha = _q([5, 0, 0, 0])
    snapshot = list(layer)
    accumulate_line(layer, column, alpha)
    a2 = alpha * alpha
    for i in range(2):
        assert layer[i] == snapshot[i] * a2 + column[i]


def test_accumulate_line_alpha_zero_replaces():
    layer = [_q([9, 9, 9, 9])]
    column = [_q([3, 1, 4, 1])]
    accumulate_line(layer, column, QM31.zero())
    assert layer[0] == column[0]


# ---------------------------------------------------------------------------
# backend/cpu/fri.test.ts — decompose edges
# ---------------------------------------------------------------------------

def _decompose_np(vals):
    g, lam = decompose(jnp.asarray(vals))
    return np.asarray(g), np.asarray(lam)


def test_decompose_zero_values():
    g, lam = _decompose_np(np.zeros((4, 8), dtype=np.uint32))
    assert not g.any() and not lam.any()


def test_decompose_reconstruction_property():
    """v = g + lambda on the first half and v = g - lambda on the second
    (reference backend/cpu/fri.ts:96-163 decomposition invariant)."""
    vals = _col(16, seed=9)
    g, lam = _decompose_np(vals)
    lam_q = _q(lam)
    for k in range(8):
        assert _q(vals[:, k]) == _q(g[:, k]) + lam_q
    for k in range(8, 16):
        assert _q(vals[:, k]) == _q(g[:, k]) - lam_q


def test_decompose_single_pair():
    vals = _col(2, seed=10)
    g, lam = _decompose_np(vals)
    assert _q(vals[:, 0]) == _q(g[:, 0]) + _q(lam)
    assert _q(vals[:, 1]) == _q(g[:, 1]) - _q(lam)


def test_decompose_alternating_pattern():
    vals = np.zeros((4, 8), dtype=np.uint32)
    vals[0] = [1, P - 1] * 4
    g, lam = _decompose_np(vals)
    # sum(first half) == sum(second half) -> lambda == 0, g == v
    assert not lam.any()
    assert np.array_equal(g, vals)


def test_decompose_max_field_values():
    vals = np.full((4, 8), P - 1, dtype=np.uint32)
    g, lam = _decompose_np(vals)
    assert not lam.any()  # halves are equal
    lam_q = _q(lam)
    for k in range(8):
        want = _q(vals[:, k]) + (lam_q if k < 4 else -lam_q)
        assert _q(g[:, k]) == want


def test_decompose_deterministic():
    vals = _col(32, seed=11)
    g1, l1 = _decompose_np(vals)
    g2, l2 = _decompose_np(vals)
    assert np.array_equal(g1, g2) and np.array_equal(l1, l2)


def test_decompose_large():
    vals = _col(1 << 12, seed=12)
    g, lam = _decompose_np(vals)
    assert g.shape == vals.shape
    lam_q = _q(lam)
    half = 1 << 11
    for k in (0, half - 1):
        assert _q(vals[:, k]) == _q(g[:, k]) + lam_q
    for k in (half, (1 << 12) - 1):
        assert _q(vals[:, k]) == _q(g[:, k]) - lam_q
