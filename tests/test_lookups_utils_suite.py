"""Fine-grained port of reference test/lookups/utils.test.ts (48 cases):
UnivariatePoly (lagrange interpolation, arithmetic, evaluation), hornerEval,
randomLinearCombination, the eq Lagrange kernel, foldMleEvals, projective
Fractions, fraction sums, and Reciprocal.  Values are the reference's own
(which mirror Rust stwo's lookups::utils tests).  TypeScript type-mixing
cases (BaseField-vs-SecureField runtime guards) are not ported: here every
value is a QM31 array column and the type split is meaningless.
"""
import pytest

from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.lookups.utils import (Fraction, Reciprocal, UnivariatePoly,
                                     eq, fold_mle_evals, horner_eval,
                                     random_linear_combination)


def q(v: int) -> QM31:
    return QM31.from_base(M31(v % ((1 << 31) - 1)))


ZERO, ONE = QM31.zero(), QM31.one()


# ---------------------------------------------------------------------------
# UnivariatePoly: lagrange interpolation
# ---------------------------------------------------------------------------

def test_lagrange_interpolation_works():
    xs = [q(5), q(1), q(3), q(9)]
    ys = [q(1), q(2), q(3), q(4)]
    poly = UnivariatePoly.interpolate_lagrange(xs, ys)
    for x, y in zip(xs, ys):
        assert poly.eval_at_point(x) == y


def test_lagrange_single_point():
    poly = UnivariatePoly.interpolate_lagrange([q(5)], [q(10)])
    assert poly.eval_at_point(q(5)) == q(10)
    assert poly.eval_at_point(q(3)) == q(10)  # constant


def test_lagrange_mismatched_lengths():
    with pytest.raises(ValueError):
        UnivariatePoly.interpolate_lagrange([q(1), q(2)], [q(3)])


def test_lagrange_empty_arrays():
    with pytest.raises(ValueError):
        UnivariatePoly.interpolate_lagrange([], [])


# ---------------------------------------------------------------------------
# UnivariatePoly: operations
# ---------------------------------------------------------------------------

def test_poly_from_coefficients():
    poly = UnivariatePoly([q(1), q(2), q(3)])
    assert len(poly.coeffs) == 3
    assert poly.coeffs == [q(1), q(2), q(3)]


def test_poly_degree():
    assert UnivariatePoly([q(1), q(2), q(3)]).degree() == 2
    assert UnivariatePoly([q(5)]).degree() == 0
    assert UnivariatePoly.zero().degree() == 0


def test_zero_polynomial():
    z = UnivariatePoly.zero()
    assert z.is_zero()
    assert len(z.coeffs) == 0
    assert z.degree() == 0


def test_poly_add():
    s = UnivariatePoly([q(1), q(2)]).add(UnivariatePoly([q(3), q(4)]))
    assert s.coeffs == [q(4), q(6)]


def test_poly_sub_via_neg_scalar():
    """p1 - p2 == p1 + (-1)*p2 (the reference has a sub method; here
    subtraction composes from add + mul_scalar(-1))."""
    p1 = UnivariatePoly([q(5), q(7)])
    p2 = UnivariatePoly([q(2), q(3)])
    diff = p1.add(p2.mul_scalar(-ONE))
    assert diff.coeffs == [q(3), q(4)]


def test_poly_neg():
    negated = UnivariatePoly([q(1), q(2)]).mul_scalar(-ONE)
    assert negated.coeffs == [-q(1), -q(2)]


def test_poly_mul_scalar():
    scaled = UnivariatePoly([q(1), q(2)]).mul_scalar(q(3))
    assert scaled.coeffs == [q(3), q(6)]


def test_poly_eval_at_points():
    # 2x^2 + 3x + 1
    poly = UnivariatePoly([q(1), q(3), q(2)])
    assert poly.eval_at_point(q(0)) == q(1)
    assert poly.eval_at_point(q(1)) == q(6)
    assert poly.eval_at_point(q(2)) == q(15)


def test_zero_poly_eval():
    assert UnivariatePoly.zero().eval_at_point(q(5)) == ZERO


def test_poly_truncates_leading_zeros():
    poly = UnivariatePoly([q(1), q(2), ZERO, ZERO])
    assert len(poly.coeffs) == 2
    assert poly.degree() == 1


def test_poly_all_zero_coeffs():
    poly = UnivariatePoly([ZERO, ZERO, ZERO])
    assert poly.is_zero()
    assert len(poly.coeffs) == 0


def test_poly_empty_and_single():
    assert UnivariatePoly([]).is_zero()
    single = UnivariatePoly([q(42)])
    assert single.degree() == 0
    assert single.eval_at_point(q(100)) == q(42)


# ---------------------------------------------------------------------------
# hornerEval
# ---------------------------------------------------------------------------

def test_horner_eval_works():
    coeffs = [q(9), q(2), q(3)]
    x = q(7)
    # 9 + 2*7 + 3*49 = 170
    assert horner_eval(coeffs, x) == q(170)


def test_horner_eval_empty():
    assert horner_eval([], q(5)) == ZERO


def test_horner_eval_single():
    assert horner_eval([q(42)], q(7)) == q(42)


# ---------------------------------------------------------------------------
# randomLinearCombination
# ---------------------------------------------------------------------------

def test_random_linear_combination_correct():
    v = [q(1), q(2), q(3)]
    # 1 + 2*5 + 3*25 = 86
    assert random_linear_combination(v, q(5)) == q(86)
    assert random_linear_combination(v, q(5)) == horner_eval(v, q(5))


def test_random_linear_combination_empty():
    assert random_linear_combination([], q(7)) == ZERO


# ---------------------------------------------------------------------------
# eq (Lagrange kernel of the boolean hypercube)
# ---------------------------------------------------------------------------

def test_eq_identical_points_is_one():
    a = [ONE, ZERO, ONE]
    assert eq(a, a) == ONE


def test_eq_different_points_is_zero():
    assert eq([ONE, ZERO, ONE], [ONE, ZERO, ZERO]) == ZERO


@pytest.mark.parametrize("a,b,expected", [
    ([0, 0], [0, 0], 1),
    ([0, 1], [0, 1], 1),
    ([1, 1], [1, 1], 1),
    ([0, 0], [0, 1], 0),
    ([1, 0], [0, 1], 0),
])
def test_eq_boolean_combinations(a, b, expected):
    av = [ONE if x else ZERO for x in a]
    bv = [ONE if x else ZERO for x in b]
    assert eq(av, bv) == (ONE if expected else ZERO)


def test_eq_mismatched_sizes():
    with pytest.raises(ValueError):
        eq([ZERO, ONE], [ZERO])


def test_eq_empty_arrays_is_empty_product():
    """Deviation from the TS reference (which throws): empty hypercube
    points give the empty product 1 — the GKR batch verifier relies on
    this for the largest instance's unused-variable suffix."""
    assert eq([], []) == ONE


def test_eq_non_boolean_points():
    """eq extends multilinearly off the hypercube: eq(x,y) =
    prod(x*y + (1-x)(1-y))."""
    x, y = q(3), q(5)
    expected = x * y + (ONE - x) * (ONE - y)
    assert eq([x], [y]) == expected


# ---------------------------------------------------------------------------
# foldMleEvals
# ---------------------------------------------------------------------------

def test_fold_mle_evals_base():
    # 2 * (10 - 5) + 5 = 15
    assert fold_mle_evals(q(2), M31(5), M31(10)) == q(15)


def test_fold_mle_evals_secure():
    # 3 * (12 - 7) + 7 = 22
    assert fold_mle_evals(q(3), q(7), q(12)) == q(22)


def test_fold_mle_evals_zero_assignment():
    assert fold_mle_evals(ZERO, M31(100), M31(200)) == q(100)


def test_fold_mle_evals_equal_evals():
    assert fold_mle_evals(q(42), M31(17), M31(17)) == q(17)


# ---------------------------------------------------------------------------
# Fraction
# ---------------------------------------------------------------------------

def test_fraction_create():
    f = Fraction(q(1), q(3))
    assert f.numerator == q(1)
    assert f.denominator == q(3)


def test_fraction_zero():
    z = Fraction.zero()
    assert z.numerator == ZERO
    assert z.denominator == ONE
    assert z.is_zero()


def test_fraction_is_zero_semantics():
    assert Fraction(ZERO, q(5)).is_zero()
    assert not Fraction(q(3), q(5)).is_zero()
    assert not Fraction(ZERO, ZERO).is_zero()  # 0/0 is not a valid zero


def test_fraction_addition():
    # 1/3 + 2/6 -> (6*1 + 3*2)/(3*6) = 12/18
    r = Fraction(q(1), q(3)) + Fraction(q(2), q(6))
    assert r.numerator == q(12)
    assert r.denominator == q(18)
    # cross-multiply: 12/18 == 2/3
    assert r.numerator * q(3) == r.denominator * q(2)


def test_fraction_addition_quarter():
    # 1/4 + 1/4 = 8/16
    r = Fraction(q(1), q(4)) + Fraction(q(1), q(4))
    assert r.numerator == q(8)
    assert r.denominator == q(16)


def test_fraction_addition_with_zero():
    r = Fraction.zero() + Fraction(q(3), q(7))
    assert r.numerator == q(3)
    assert r.denominator == q(7)


def test_fraction_rust_mirror():
    """Rust stwo fraction_addition_works."""
    r = Fraction(q(1), q(3)) + Fraction(q(2), q(6))
    assert r.numerator * q(3) == r.denominator * q(2)


def test_sum_fractions_empty():
    total = Fraction.zero()
    assert total.is_zero()


def test_sum_fractions_single():
    f = Fraction(q(3), q(7))
    total = Fraction.zero() + f
    assert total.numerator * f.denominator == total.denominator * f.numerator


def test_sum_fractions_multiple():
    # 1/2 + 1/3 + 1/6 = 1
    total = Fraction(q(1), q(2)) + Fraction(q(1), q(3)) + Fraction(q(1), q(6))
    assert total.numerator == total.denominator


def test_sum_fractions_with_zeros():
    total = Fraction.zero() + Fraction(q(5), q(8)) + Fraction.zero()
    # == 5/8 projectively
    assert total.numerator * q(8) == total.denominator * q(5)


# ---------------------------------------------------------------------------
# Reciprocal
# ---------------------------------------------------------------------------

def test_reciprocal_create():
    assert Reciprocal(q(5)).x == q(5)


def test_reciprocal_add():
    # 1/2 + 1/3 = 5/6
    r = Reciprocal(q(2)) + Reciprocal(q(3))
    assert r.numerator == q(5)
    assert r.denominator == q(6)


def test_reciprocal_sub():
    # 1/2 - 1/4 = (4-2)/8 = 2/8
    r = Reciprocal(q(2)) - Reciprocal(q(4))
    assert r.numerator == q(2)
    assert r.denominator == q(8)


def test_reciprocal_add_secure():
    # 1/3 + 1/6 = 9/18
    r = Reciprocal(q(3)) + Reciprocal(q(6))
    assert r.numerator == q(9)
    assert r.denominator == q(18)
