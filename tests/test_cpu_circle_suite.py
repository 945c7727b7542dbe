"""Port of reference test/backend/cpu/circle.test.ts (18 cases) and
test/backend/circlePolyOps.test.ts (13 cases): the Rust-canonical
CirclePoly eval/evaluate/interpolate tests (basis semantics pinned
value-by-value), run against the real CFFT kernels.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.circle import CanonicCoset, CirclePoint
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.poly.circle_poly import (CircleEvaluation, CirclePoly,
                                        evaluate_values, interpolate_values)
from tstwo_tpu.poly.twiddles import precompute_twiddles
from tstwo_tpu.utils import bit_reverse_index


def _poly(coeffs):
    return CirclePoly(jnp.asarray(np.array(coeffs, dtype=np.uint32)))


def _pt(x, y):
    return CirclePoint(QM31.from_base(M31(x)), QM31.from_base(M31(y)))


def _qb(v):
    return QM31.from_base(M31(v))


# ---------------------------------------------------------------------------
# eval_at_point — basis semantics (Rust test_eval_at_point_with_*_coeffs)
# ---------------------------------------------------------------------------

def test_eval_at_point_with_4_coeffs():
    """coeffs [c0,c1,c2,c3] represent c0 + c1*y + c2*x + c3*x*y."""
    poly = _poly([1, 2, 3, 4])
    x, y = _qb(5), _qb(8)
    got = poly.eval_at_point(CirclePoint(x, y))
    want = _qb(1) + _qb(2) * y + _qb(3) * x + _qb(4) * x * y
    assert got == want


def test_eval_at_point_with_2_coeffs():
    """coeffs [c0,c1] represent c0 + c1*y."""
    poly = _poly([1, 2])
    x, y = _qb(5), _qb(8)
    got = poly.eval_at_point(CirclePoint(x, y))
    assert got == _qb(1) + _qb(2) * y


def test_eval_at_point_with_1_coeff():
    poly = _poly([1])
    got = poly.eval_at_point(_pt(5, 8))
    assert got == QM31.one()


def test_eval_at_point_8_coeffs_basis():
    """Third layer basis element is pi(x) = 2x^2 - 1."""
    poly = _poly([0, 0, 0, 0, 1, 0, 0, 0])  # coefficient of pi(x)
    x, y = _qb(5), _qb(8)
    got = poly.eval_at_point(CirclePoint(x, y))
    two = _qb(2)
    assert got == two * x * x - QM31.one()


# ---------------------------------------------------------------------------
# evaluate — CFFT values equal pointwise evaluation at every domain point
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_size,coeffs", [
    (1, [1, 2]),
    (2, [1, 2, 3, 4]),
    (3, [1, 2, 3, 4, 5, 6, 7, 8]),
])
def test_evaluate_matches_eval_at_point(log_size, coeffs):
    domain = CanonicCoset.new(log_size).circle_domain()
    poly = _poly(coeffs)
    tree = precompute_twiddles(domain.half_coset)
    evaluation = np.asarray(poly.evaluate(domain, tree).values)
    for i in range(1 << log_size):
        stored = int(evaluation[bit_reverse_index(i, log_size)])
        point = domain.at(i)
        want = poly.eval_at_point(
            CirclePoint(QM31.from_base(point.x), QM31.from_base(point.y)))
        assert _qb(stored) == want


# ---------------------------------------------------------------------------
# interpolate — exact coefficient recovery
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_size,coeffs", [
    (1, [1, 2]),
    (2, [1, 2, 3, 4]),
    (3, [1, 2, 3, 4, 5, 6, 7, 8]),
])
def test_interpolate_recovers_coeffs(log_size, coeffs):
    domain = CanonicCoset.new(log_size).circle_domain()
    poly = _poly(coeffs)
    tree = precompute_twiddles(domain.half_coset)
    evals = poly.evaluate(domain, tree)
    back = evals.interpolate(tree)
    assert np.asarray(back.coeffs).tolist() == coeffs


# ---------------------------------------------------------------------------
# extend (cpu/circle.test.ts CpuCirclePoly extend)
# ---------------------------------------------------------------------------

def test_extend_to_larger_size():
    poly = _poly([1, 2])
    ext = poly.extend(3)
    assert ext.log_size() == 3
    arr = np.asarray(ext.coeffs)
    assert arr[:2].tolist() == [1, 2] and not arr[2:].any()


def test_extend_same_size_noop():
    poly = _poly([1, 2, 3, 4])
    ext = poly.extend(2)
    assert np.array_equal(np.asarray(ext.coeffs), np.asarray(poly.coeffs))


def test_extend_smaller_raises():
    with pytest.raises(ValueError):
        _poly([1, 2, 3, 4]).extend(1)


def test_extend_preserves_evaluation():
    poly = _poly([3, 1, 4, 1])
    ext = poly.extend(5)
    pt = CirclePoint.get_point(31415)
    assert poly.eval_at_point(pt) == ext.eval_at_point(pt)


# ---------------------------------------------------------------------------
# constructor / log_size (both files)
# ---------------------------------------------------------------------------

def test_constructor_keeps_coeffs():
    poly = _poly([7, 8, 9, 10])
    assert np.asarray(poly.coeffs).tolist() == [7, 8, 9, 10]


@pytest.mark.parametrize("n,log", [(1, 0), (2, 1), (4, 2), (16, 4), (256, 8)])
def test_log_size_calculation(n, log):
    assert _poly(list(range(n))).log_size() == log


# ---------------------------------------------------------------------------
# CpuCircleEvaluation (cpu/circle.test.ts)
# ---------------------------------------------------------------------------

def test_evaluation_holds_domain_and_values():
    domain = CanonicCoset.new(2).circle_domain()
    vals = jnp.asarray(np.array([10, 20, 30, 40], dtype=np.uint32))
    ev = CircleEvaluation(domain, vals)
    assert ev.domain == domain
    assert ev.to_numpy().tolist() == [10, 20, 30, 40]


def test_evaluation_bit_reverse_column():
    from tstwo_tpu.ops import fft as fft_ops

    vals = jnp.asarray(np.array([0, 1, 2, 3, 4, 5, 6, 7], dtype=np.uint32))
    out = np.asarray(fft_ops.bit_reverse(vals, 3))
    perm = [bit_reverse_index(i, 3) for i in range(8)]
    assert out.tolist() == [i for i in perm]


# ---------------------------------------------------------------------------
# circlePolyOps.test.ts extras
# ---------------------------------------------------------------------------

def test_zero_polynomial_evaluates_to_zero():
    domain = CanonicCoset.new(3).circle_domain()
    poly = _poly([0] * 8)
    vals = np.asarray(poly.evaluate(domain).values)
    assert not vals.any()
    assert poly.eval_at_point(_pt(5, 8)) == QM31.zero()


def test_single_coeff_poly_constant_on_domain():
    domain = CanonicCoset.new(2).circle_domain()
    vals = np.asarray(evaluate_values(
        jnp.asarray(np.array([42], dtype=np.uint32)), domain))
    assert vals.tolist() == [42, 42, 42, 42]


@pytest.mark.parametrize("log_size", [1, 2, 3, 4, 5, 6])
def test_roundtrip_consistency_all_sizes(log_size):
    rng = np.random.default_rng(log_size)
    domain = CanonicCoset.new(log_size).circle_domain()
    coeffs = rng.integers(0, (1 << 31) - 1,
                          size=1 << log_size, dtype=np.uint32)
    vals = evaluate_values(jnp.asarray(coeffs), domain)
    back = np.asarray(interpolate_values(vals, domain))
    assert np.array_equal(back, coeffs)
