"""Circle FFT tests: round trips, ordering, and an independent host oracle.

The key gate: device `evaluate` must satisfy
    values[j] == P(domain.at(bit_reverse_index(j)))
with P evaluated by plain host folding -- this pins the twiddle layout and
ordering (and proves the reference's log_size==3 swap hack is a TS bug, not
a property of the math).
"""
import numpy as np
import pytest

from tstwo_tpu.circle import CanonicCoset, CirclePoint
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.poly.circle_poly import (CircleEvaluation, CirclePoly,
                                        SecureCirclePoly, evaluate_values,
                                        interpolate_values)
from tstwo_tpu.poly.twiddles import precompute_twiddles
from tstwo_tpu.utils import bit_reverse_index


def host_eval(coeffs, point_x, point_y):
    """Evaluate sum over the CFFT basis at an M31 point, by folding."""
    vals = [M31(int(c)) for c in coeffs]
    mappings = [M31(point_y)]
    x = M31(point_x)
    n_log = len(vals).bit_length() - 1
    for _ in range(1, n_log):
        mappings.append(x)
        x = CirclePoint.double_x(x, M31.one())
    for f in mappings:
        vals = [vals[2 * i] + f * vals[2 * i + 1] for i in range(len(vals) // 2)]
    return vals[0].value


@pytest.mark.parametrize("log_size", [1, 2, 3, 4, 5, 8])
def test_evaluate_matches_host_pointwise(log_size):
    rng = np.random.default_rng(log_size)
    n = 1 << log_size
    coeffs = rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32)
    domain = CanonicCoset.new(log_size).circle_domain()
    vals = np.asarray(evaluate_values(m31_ops.asarray(coeffs), domain))
    for j in range(n):
        p = domain.at(bit_reverse_index(j, log_size))
        assert int(vals[j]) == host_eval(coeffs, p.x.value, p.y.value), (
            f"mismatch at j={j} (log_size={log_size})")


@pytest.mark.parametrize("log_size", [1, 2, 3, 4, 6, 10, 12])
def test_roundtrip_interpolate_evaluate(log_size):
    rng = np.random.default_rng(42 + log_size)
    n = 1 << log_size
    coeffs = rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32)
    domain = CanonicCoset.new(log_size).circle_domain()
    vals = evaluate_values(m31_ops.asarray(coeffs), domain)
    back = np.asarray(interpolate_values(vals, domain))
    np.testing.assert_array_equal(back, coeffs)


def test_evaluate_on_larger_domain_then_interpolate():
    log_size, blowup = 5, 2
    rng = np.random.default_rng(7)
    coeffs = rng.integers(0, (1 << 31) - 1, size=1 << log_size, dtype=np.uint32)
    domain = CanonicCoset.new(log_size + blowup).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    vals = evaluate_values(m31_ops.asarray(coeffs), domain, tree)
    back = np.asarray(interpolate_values(vals, domain, tree))
    np.testing.assert_array_equal(back[: 1 << log_size], coeffs)
    assert not back[1 << log_size:].any()


@pytest.mark.parametrize("log_size", [2, 4, 7])
def test_eval_at_point_matches_fft(log_size):
    """poly.eval_at_point at a domain point == FFT evaluation there."""
    rng = np.random.default_rng(9 + log_size)
    n = 1 << log_size
    coeffs = rng.integers(0, (1 << 31) - 1, size=n, dtype=np.uint32)
    poly = CirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(log_size).circle_domain()
    vals = np.asarray(evaluate_values(poly.coeffs, domain))
    for j in [0, 1, n - 1]:
        p = domain.at(bit_reverse_index(j, log_size))
        pq = CirclePoint(QM31.from_base(p.x), QM31.from_base(p.y))
        assert poly.eval_at_point(pq) == QM31.from_base(M31(int(vals[j])))


def test_eval_at_secure_point_roundtrip():
    # evaluate a random poly at a random QM31 point two ways:
    # via coefficients, and via Lagrange-style barycentric check on a shift.
    rng = np.random.default_rng(11)
    coeffs = rng.integers(0, (1 << 31) - 1, size=16, dtype=np.uint32)
    poly = CirclePoly(m31_ops.asarray(coeffs))
    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN

    p = SECURE_FIELD_CIRCLE_GEN
    v = poly.eval_at_point(p)
    # linearity check: (2*poly) at p == 2*v
    poly2 = CirclePoly(m31_ops.add(poly.coeffs, poly.coeffs))
    assert poly2.eval_at_point(p) == v + v


def test_bit_reverse_permutation():
    rng = np.random.default_rng(3)
    for log in [1, 2, 5, 9]:
        v = rng.integers(0, 1 << 31, size=1 << log, dtype=np.uint32)
        out = np.asarray(fft_ops.bit_reverse(m31_ops.asarray(v), log))
        expected = np.array(
            [v[bit_reverse_index(i, log)] for i in range(1 << log)])
        np.testing.assert_array_equal(out, expected)


def test_secure_poly_evaluate_matches_coordinates():
    rng = np.random.default_rng(5)
    coeffs = rng.integers(0, (1 << 31) - 1, size=(4, 32), dtype=np.uint32)
    sp = SecureCirclePoly(m31_ops.asarray(coeffs))
    domain = CanonicCoset.new(6).circle_domain()
    ev = sp.evaluate(domain)
    for i, cp in enumerate(sp.coordinate_polys()):
        np.testing.assert_array_equal(
            np.asarray(cp.evaluate(domain).values), np.asarray(ev.values[i]))


def test_twiddle_tree_against_reference_slow_path():
    """Check the per-layer twiddles equal the reference flat-buffer layout."""
    from tstwo_tpu.circle import Coset

    coset = CanonicCoset.new(6).circle_domain().half_coset
    tree = precompute_twiddles(coset)
    # recompute layer 0 directly from coset points
    pts = list(coset.iter())[: coset.size() // 2]
    xs = [p.x.value for p in pts]
    perm = [bit_reverse_index(i, 4) for i in range(16)]
    expected0 = [xs[p] for p in perm]
    np.testing.assert_array_equal(np.asarray(tree.layers[0]), expected0)
    # doubled layer matches doubled coset
    dbl = coset.double()
    pts2 = list(dbl.iter())[: dbl.size() // 2]
    xs2 = [p.x.value for p in pts2]
    perm2 = [bit_reverse_index(i, 3) for i in range(8)]
    np.testing.assert_array_equal(np.asarray(tree.layers[1]),
                                  [xs2[p] for p in perm2])
    # inverses are exact
    for lay, ilay in zip(tree.layers_np, tree.ilayers_np):
        prod = (lay.astype(np.uint64) * ilay.astype(np.uint64)) % ((1 << 31) - 1)
        np.testing.assert_array_equal(prod, np.ones_like(prod))
