"""Port of the reference poly/circle test pool:
test/poly/circle/{poly,evaluation,mod,secure_poly}.test.ts,
test/poly/{canonicCoset,domain,cosetSubEvaluation}.test.ts (~70 cases).

Where the TS files test mocks (MockCpuCirclePoly etc.), the cases here
run against the REAL CFFT/eval implementations, which is strictly
stronger than the reference assertions.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.circle import (CanonicCoset, CircleDomain, CirclePoint,
                              CirclePointIndex, Coset)
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.poly.circle_poly import (CircleEvaluation, CirclePoly,
                                        CosetSubEvaluation, SecureCirclePoly,
                                        SecureEvaluation, evaluate_values,
                                        interpolate_values)
from tstwo_tpu.poly.twiddles import precompute_twiddles
from tstwo_tpu.utils import bit_reverse_index

P = (1 << 31) - 1


def _secure_pt(index: int) -> CirclePoint:
    return CirclePoint.get_point(index)


# ---------------------------------------------------------------------------
# poly/circle/poly.test.ts — CirclePoly
# ---------------------------------------------------------------------------

def test_circle_poly_extend_preserves_evaluation():
    """Rust test_circle_poly_extend: extended poly evaluates identically."""
    coeffs = jnp.arange(16, dtype=jnp.uint32)
    poly = CirclePoly(coeffs)
    extended = poly.extend(8)
    pt = _secure_pt(21903)
    assert poly.eval_at_point(pt) == extended.eval_at_point(pt)
    assert extended.log_size() == 8
    assert extended.coeffs.shape[-1] == 256


def test_non_power_of_two_coeffs_raise():
    with pytest.raises(ValueError, match="power of two"):
        CirclePoly(jnp.asarray(np.array([1, 2, 3], dtype=np.uint32)))


def test_valid_construction_log_size():
    poly = CirclePoly(jnp.asarray(np.array([1, 2, 3, 4], dtype=np.uint32)))
    assert poly.log_size() == 2


def test_evaluate_over_domain_and_roundtrip():
    coeffs = jnp.arange(8, dtype=jnp.uint32)
    poly = CirclePoly(coeffs)
    domain = CanonicCoset.new(3).circle_domain()
    evaluation = poly.evaluate(domain)
    assert evaluation.domain == domain
    assert evaluation.values.shape[-1] == 8
    back = evaluation.interpolate()
    assert np.array_equal(np.asarray(back.coeffs), np.asarray(coeffs))


def test_evaluate_with_precomputed_twiddles_matches():
    coeffs = jnp.arange(4, dtype=jnp.uint32)
    poly = CirclePoly(coeffs)
    domain = CanonicCoset.new(2).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    with_tree = np.asarray(poly.evaluate(domain, tree).values)
    without = np.asarray(poly.evaluate(domain).values)
    assert np.array_equal(with_tree, without)


def test_is_in_fft_space():
    poly = CirclePoly(jnp.arange(1, 9, dtype=jnp.uint32))
    assert poly.is_in_fft_space(4)
    assert poly.is_in_fft_space(3)
    assert not poly.is_in_fft_space(2)


def test_is_in_fri_space():
    poly = CirclePoly(jnp.arange(1, 9, dtype=jnp.uint32))
    assert poly.is_in_fri_space(4)
    assert poly.is_in_fri_space(3)
    assert not poly.is_in_fri_space(2)


def test_trailing_zeros_in_space_checks():
    poly = CirclePoly(jnp.asarray(np.array([1, 2, 0, 0], dtype=np.uint32)))
    assert poly.is_in_fft_space(1)
    assert poly.is_in_fri_space(1)
    # FRI space allows one extra (decomposition) coefficient beyond 2^log
    poly2 = CirclePoly(jnp.asarray(np.array([1, 2, 3, 0], dtype=np.uint32)))
    assert poly2.is_in_fri_space(1)
    assert not poly2.is_in_fft_space(1)


def test_single_coefficient_poly():
    poly = CirclePoly(jnp.asarray(np.array([42], dtype=np.uint32)))
    assert poly.log_size() == 0
    assert poly.eval_at_point(_secure_pt(7)) == QM31.from_ints([42, 0, 0, 0])


def test_large_poly_log_size():
    poly = CirclePoly(jnp.arange(1024, dtype=jnp.uint32) % 256)
    assert poly.log_size() == 10
    assert poly.coeffs.shape[-1] == 1024


def test_extend_to_same_size():
    poly = CirclePoly(jnp.arange(8, dtype=jnp.uint32))
    extended = poly.extend(3)
    assert extended.log_size() == 3
    assert extended.coeffs.shape[-1] == 8


def test_extend_to_smaller_raises():
    """Rust spec: extend asserts log_size >= current (the TS mock silently
    clamps — Rust-spec behavior is kept here)."""
    poly = CirclePoly(jnp.arange(8, dtype=jnp.uint32))
    with pytest.raises(ValueError):
        poly.extend(2)


# ---------------------------------------------------------------------------
# poly/circle/evaluation.test.ts — CircleEvaluation
# ---------------------------------------------------------------------------

def test_interpolate_non_canonic():
    """Rust test_interpolate_non_canonic, run on the REAL CFFT: evaluate
    i at the bit-reversed position of domain point i, interpolate, and
    check eval_at_point reproduces each value."""
    log = 3
    half = Coset.new(CirclePointIndex.generator(), log - 1)
    domain = CircleDomain.new(half)
    assert not domain.is_canonic()
    n = 1 << log
    natural = np.arange(n, dtype=np.uint32)
    bitrev = natural[[bit_reverse_index(i, log) for i in range(n)]]
    evaluation = CircleEvaluation(domain, jnp.asarray(bitrev))
    poly = evaluation.interpolate()
    for i in range(n):
        pt = domain.at(i)
        sec = CirclePoint(QM31.from_base(pt.x), QM31.from_base(pt.y))
        assert poly.eval_at_point(sec) == QM31.from_ints([i, 0, 0, 0])


def test_evaluation_size_mismatch_raises():
    domain = CanonicCoset.new(2).circle_domain()
    with pytest.raises(ValueError, match="size mismatch"):
        CircleEvaluation(domain, jnp.zeros(2, dtype=jnp.uint32))


def test_evaluation_valid_construction():
    domain = CanonicCoset.new(2).circle_domain()
    vals = jnp.arange(4, dtype=jnp.uint32)
    evaluation = CircleEvaluation(domain, vals)
    assert evaluation.domain == domain
    assert np.array_equal(evaluation.to_numpy(), np.arange(4))


def test_bit_reverse_natural_to_bitrev():
    from tstwo_tpu.ops import fft as fft_ops

    vals = jnp.asarray(np.array([0, 1, 2, 3], dtype=np.uint32))
    out = np.asarray(fft_ops.bit_reverse(vals, 2))
    assert out.tolist() == [0, 2, 1, 3]


def test_bit_reverse_back_to_natural():
    from tstwo_tpu.ops import fft as fft_ops

    vals = jnp.asarray(np.array([0, 2, 1, 3], dtype=np.uint32))
    out = np.asarray(fft_ops.bit_reverse(vals, 2))
    assert out.tolist() == [0, 1, 2, 3]


def test_interpolate_with_explicit_twiddles_matches():
    domain = CanonicCoset.new(2).circle_domain()
    vals = jnp.arange(4, dtype=jnp.uint32)
    tree = precompute_twiddles(domain.half_coset)
    a = np.asarray(interpolate_values(vals, domain, tree))
    b = np.asarray(interpolate_values(vals, domain))
    assert np.array_equal(a, b)


def test_coset_sub_evaluation_access():
    vals = [M31(0), M31(1), M31(2), M31(3)]
    sub = CosetSubEvaluation(vals, 1, 2)
    assert sub.at(0) == M31(1)
    assert sub.at(1) == M31(3)
    assert sub.get(0) == M31(1)
    assert sub[1] == M31(3)


def test_coset_sub_evaluation_wraparound():
    vals = [M31(0), M31(1), M31(2), M31(3)]
    sub = CosetSubEvaluation(vals, 3, 2)
    assert sub.at(0) == M31(3)
    assert sub.at(1) == M31(1)  # (3 + 2) & 3 == 1


def test_coset_sub_evaluation_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        CosetSubEvaluation([M31(0), M31(1), M31(2)], 0, 1)


def test_empty_canonic_coset_rejected():
    with pytest.raises(ValueError):
        CanonicCoset.new(0)


def test_bit_reverse_column_validates_length():
    from tstwo_tpu.ops import fft as fft_ops

    with pytest.raises(ValueError):
        fft_ops.bit_reverse(jnp.zeros(3, dtype=jnp.uint32), 2)
    fft_ops.bit_reverse(jnp.zeros(4, dtype=jnp.uint32), 2)  # no raise


# ---------------------------------------------------------------------------
# poly/circle/mod.test.ts — integration
# ---------------------------------------------------------------------------

def test_interpolate_and_eval_roundtrip():
    domain = CanonicCoset.new(3).circle_domain()
    assert domain.log_size() == 3
    vals = jnp.arange(8, dtype=jnp.uint32)
    coeffs = interpolate_values(vals, domain)
    back = evaluate_values(coeffs, domain)
    assert np.array_equal(np.asarray(back), np.asarray(vals))


def test_is_canonic_valid_domain():
    assert CanonicCoset.new(4).circle_domain().is_canonic()


def test_is_canonic_invalid_domain():
    domain = CircleDomain.new(Coset.new(CirclePointIndex(1), 4))
    assert not domain.is_canonic()


def test_is_canonic_half_odds():
    assert CircleDomain.new(Coset.half_odds(3)).is_canonic()


def test_bit_reverse_indices_repeated_double():
    """The property the TS file stubs out: folding a domain point
    n_folds times lands on the corresponding small-domain point."""
    log_domain, log_small = 7, 5
    domain = CanonicCoset.new(log_domain)
    small = CanonicCoset.new(log_small)
    n_folds = log_domain - log_small
    for i in range(0, 1 << log_domain, 13):
        point = domain.at(bit_reverse_index(i, log_domain))
        small_point = small.at(
            bit_reverse_index(i >> n_folds, log_small))
        folded = point.repeated_double(n_folds)
        assert folded.x == small_point.x and folded.y == small_point.y


def test_canonic_coset_validates_log_size():
    with pytest.raises(ValueError):
        CanonicCoset.new(0)
    with pytest.raises(ValueError):
        CanonicCoset.new(-1)


def test_canonic_coset_properties():
    coset = CanonicCoset.new(4)
    assert coset.size() == 16
    assert coset.log_size == 4
    assert coset.half_coset().log_size == 3
    assert coset.initial_index() is not None
    assert coset.step_size() is not None
    assert coset.step() is not None


def test_coset_is_half_coset_with_conjugate():
    """Rust test_coset_is_half_coset_with_conjugate (canonicCoset.test.ts:26):
    half_coset ∪ conj(half_coset) == full coset, disjointly."""
    cc = CanonicCoset.new(8)
    full = {(p.x.value, p.y.value) for p in cc.coset.iter()}
    half = {(p.x.value, p.y.value) for p in cc.half_coset().iter()}
    conj = {(p.x.value, p.y.value)
            for p in cc.half_coset().conjugate().iter()}
    assert not (half & conj)
    assert (half | conj) == full


# ---------------------------------------------------------------------------
# poly/domain.test.ts — CircleDomain
# ---------------------------------------------------------------------------

def test_domain_iterates_all_points():
    coset = Coset.new(CirclePointIndex(1), 2)
    domain = CircleDomain.new(coset)
    expected = ([p.x.value for p in coset.iter()]
                + [(-i).to_point().x.value for i in coset.iter_indices()])
    assert [p.x.value for p in domain.iter()] == expected


def test_domain_split():
    coset = Coset.new(CirclePointIndex.generator(), 3)
    domain = CircleDomain.new(coset)
    sub, shifts = domain.split(1)
    assert sub.log_size() == domain.log_size() - 1
    assert [s.value for s in shifts] == [0, coset.step_size.value]


def test_domain_shift():
    coset = Coset.new(CirclePointIndex(5), 2)
    domain = CircleDomain.new(coset)
    shifted = domain.shift(CirclePointIndex(3))
    assert (shifted.half_coset.initial_index.value
            == (coset.initial_index + CirclePointIndex(3)).value)
    assert shifted.half_coset.log_size == coset.log_size


def test_domain_size_and_iteration():
    domain = CircleDomain.new(Coset.new(CirclePointIndex(1), 2))
    assert domain.size() == 1 << domain.log_size()
    assert len(list(domain)) == domain.size()


def test_domain_iter_indices_conjugate_order():
    coset = Coset.new(CirclePointIndex.zero(), 2)
    domain = CircleDomain.new(coset)
    expected = ([i.value for i in coset.iter_indices()]
                + [(-i).value for i in coset.iter_indices()])
    assert [i.value for i in domain.iter_indices()] == expected
    # set equality with the TS conjugate-coset order also holds
    ts_order = {i.value for i in coset.conjugate().iter_indices()}
    assert {(-i).value for i in coset.iter_indices()} == ts_order


def test_domain_at_and_index_at():
    coset = Coset.new(CirclePointIndex(2), 2)
    domain = CircleDomain.new(coset)
    assert domain.index_at(1).value == coset.index_at(1).value
    assert domain.at(1).x.value == coset.index_at(1).to_point().x.value


def test_domain_iter_matches_at():
    domain = CanonicCoset.new(3).circle_domain()
    for i, p in enumerate(domain.iter()):
        q = domain.at(i)
        assert p.x == q.x and p.y == q.y


# ---------------------------------------------------------------------------
# poly/circle/secure_poly.test.ts — SecureCirclePoly / SecureEvaluation
# ---------------------------------------------------------------------------

def _secure_poly(log):
    rng = np.random.default_rng(log)
    return SecureCirclePoly(jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log), dtype=np.uint32)))


def test_secure_poly_from_coordinate_polys():
    sp = _secure_poly(3)
    polys = sp.coordinate_polys()
    assert len(polys) == 4
    for i, p in enumerate(polys):
        assert np.array_equal(np.asarray(p.coeffs), np.asarray(sp.coeffs[i]))


def test_secure_poly_log_size():
    assert _secure_poly(5).log_size() == 5


def test_secure_poly_consistent_coordinate_log_sizes():
    sp = _secure_poly(4)
    assert {p.log_size() for p in sp.coordinate_polys()} == {4}


def test_secure_poly_eval_at_point_combines_coordinates():
    sp = _secure_poly(3)
    pt = _secure_pt(12345)
    want = QM31.from_partial_evals(
        [p.eval_at_point(pt) for p in sp.coordinate_polys()])
    assert sp.eval_at_point(pt) == want


def test_secure_poly_evaluate_interpolate_roundtrip():
    sp = _secure_poly(4)
    domain = CanonicCoset.new(4).circle_domain()
    ev = sp.evaluate(domain)
    back = ev.interpolate()
    assert np.array_equal(np.asarray(back.coeffs), np.asarray(sp.coeffs))


def test_secure_evaluation_construction():
    domain = CanonicCoset.new(2).circle_domain()
    vals = jnp.zeros((4, 4), dtype=jnp.uint32)
    ev = SecureEvaluation(domain, vals)
    assert len(ev) == 4


def test_secure_evaluation_size_mismatch_raises():
    domain = CanonicCoset.new(2).circle_domain()
    with pytest.raises(ValueError, match="size mismatch"):
        SecureEvaluation(domain, jnp.zeros((4, 8), dtype=jnp.uint32))


def test_secure_evaluation_columns_view():
    domain = CanonicCoset.new(2).circle_domain()
    rng = np.random.default_rng(0)
    vals = rng.integers(0, P, size=(4, 4), dtype=np.uint32)
    ev = SecureEvaluation(domain, jnp.asarray(vals))
    cols = ev.columns()
    assert len(cols) == 4
    for i in range(4):
        assert np.array_equal(np.asarray(cols[i]), vals[i])
    for i in range(4):
        assert ev.at(i) == QM31.from_ints(vals[:, i].tolist())


def test_secure_evaluation_from_qm31_list():
    domain = CanonicCoset.new(1).circle_domain()
    vals = [QM31.from_ints([1, 2, 3, 4]), QM31.from_ints([5, 6, 7, 8])]
    ev = SecureEvaluation.from_qm31_list(domain, vals)
    assert ev.at(0) == vals[0] and ev.at(1) == vals[1]


def test_secure_poly_empty_rejected():
    with pytest.raises(Exception):
        SecureCirclePoly(jnp.zeros((4, 3), dtype=jnp.uint32)).coordinate_polys()
