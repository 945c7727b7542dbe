"""Butterfly/IFFT semantics suite.

Port of reference test/fft.test.ts (33 cases): the butterfly / ibutterfly
primitive pair (a' = a + b*t, b' = a - b*t; inverse a' = a + b,
b' = (a - b) * t_inv), their round-trip-up-to-doubling identity, and
forward-then-inverse CFFT scaling across sizes and value extremes.  The
reference's list-based fft(values, twiddles) maps here to the array CFFT
(ops/fft.fft_natural_to_bitrev / ifft_bitrev_to_natural); its non-power-of-
two / insufficient-twiddle error cases map to the array API's size checks.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops import m31, qm31
from tstwo_tpu.poly.twiddles import (circle_layer_twiddles,
                                     domain_line_twiddles,
                                     precompute_twiddles)

P = (1 << 31) - 1


def butterfly(a, b, t):
    prod = m31.mul(b, t)
    return m31.add(a, prod), m31.sub(a, prod)


def ibutterfly(a, b, t_inv):
    return m31.add(a, b), m31.mul(m31.sub(a, b), t_inv)


def qbutterfly(a, b, t):
    prod = qm31.mul(b, t)
    return qm31.add(a, prod), qm31.sub(a, prod)


def qibutterfly(a, b, t_inv):
    return qm31.add(a, b), qm31.mul(qm31.sub(a, b), t_inv)


def test_butterfly_ibutterfly_roundtrip_doubles():
    """100 random (v0, v1, t): ibutterfly(butterfly(v0, v1, t), t^-1)
    == (2*v0, 2*v1) (fft.test.ts:15-30)."""
    rng = np.random.default_rng(1)
    v0 = jnp.asarray(rng.integers(0, P, 100, dtype=np.uint32))
    v1 = jnp.asarray(rng.integers(0, P, 100, dtype=np.uint32))
    t = jnp.asarray(rng.integers(1, P, 100, dtype=np.uint32))
    a, b = butterfly(v0, v1, t)
    a, b = ibutterfly(a, b, m31.inv(t))
    np.testing.assert_array_equal(np.asarray(a),
                                  np.asarray(m31.add(v0, v0)))
    np.testing.assert_array_equal(np.asarray(b),
                                  np.asarray(m31.add(v1, v1)))


def test_butterfly_m31_formula():
    a, b = butterfly(jnp.uint32(5), jnp.uint32(3), jnp.uint32(7))
    assert int(a) == (5 + 3 * 7) % P
    assert int(b) == (5 - 3 * 7) % P


def test_butterfly_qm31():
    a = jnp.asarray([[1], [2], [3], [4]], dtype=jnp.uint32)
    b = jnp.asarray([[5], [6], [7], [8]], dtype=jnp.uint32)
    t = jnp.asarray([[2], [0], [0], [0]], dtype=jnp.uint32)
    x, y = qbutterfly(a, b, t)
    np.testing.assert_array_equal(
        np.asarray(x), np.asarray(qm31.add(a, qm31.mul(b, t))))
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(qm31.sub(a, qm31.mul(b, t))))


def test_butterfly_zero_twiddle():
    a, b = butterfly(jnp.uint32(9), jnp.uint32(4), jnp.uint32(0))
    assert int(a) == 9 and int(b) == 9


def test_butterfly_unit_twiddle():
    a, b = butterfly(jnp.uint32(9), jnp.uint32(4), jnp.uint32(1))
    assert int(a) == 13 and int(b) == 5


def test_ibutterfly_m31_formula():
    a, b = ibutterfly(jnp.uint32(13), jnp.uint32(5), jnp.uint32(1))
    assert int(a) == 18 and int(b) == 8


def test_ibutterfly_qm31_roundtrip():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, P, (4, 8), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, P, (4, 8), dtype=np.uint32))
    t = jnp.asarray(rng.integers(1, P, (4, 8), dtype=np.uint32))
    x, y = qbutterfly(a, b, t)
    x, y = qibutterfly(x, y, qm31.inv(t))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(qm31.add(a, a)))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(qm31.add(b, b)))


def test_ibutterfly_zero_inverse_twiddle():
    a, b = ibutterfly(jnp.uint32(7), jnp.uint32(3), jnp.uint32(0))
    assert int(a) == 10 and int(b) == 0


# ---------------------------------------------------------------------------
# forward-then-inverse CFFT scaling (fft.test.ts:44-65, 309-440)
# ---------------------------------------------------------------------------

def _twiddles(log_n):
    domain = CanonicCoset.new(log_n).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    line = tuple(domain_line_twiddles(log_n, tree))
    circ = circle_layer_twiddles(line[0])
    line_i = tuple(domain_line_twiddles(log_n, tree, inverse=True))
    circ_i = circle_layer_twiddles(line_i[0])
    return line, circ, line_i, circ_i


def _roundtrip(vals, log_n):
    line, circ, line_i, circ_i = _twiddles(log_n)
    ev = fft_ops.fft_natural_to_bitrev(vals, line, circ)
    back = fft_ops.ifft_bitrev_to_natural(ev, line_i, circ_i)
    n_inv = jnp.uint32(pow(1 << log_n, P - 2, P))
    return m31.mul(back, n_inv)


@pytest.mark.parametrize("log_n", [3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
def test_fft_ifft_roundtrip_scales_by_length(log_n):
    rng = np.random.default_rng(123 + log_n)
    vals = jnp.asarray(rng.integers(0, P, 1 << log_n, dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(_roundtrip(vals, log_n)),
                                  np.asarray(vals))


def test_fft_rejects_wrong_size():
    line, circ, _, _ = _twiddles(3)
    with pytest.raises((ValueError, TypeError)):
        fft_ops.fft_natural_to_bitrev(jnp.zeros(6, dtype=jnp.uint32),
                                      line, circ)


def test_fft_rejects_insufficient_twiddles():
    line, circ, _, _ = _twiddles(3)
    with pytest.raises(Exception):
        fft_ops.fft_natural_to_bitrev(jnp.zeros(16, dtype=jnp.uint32),
                                      line, circ)


def test_roundtrip_max_field_values():
    vals = jnp.full(16, P - 1, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(_roundtrip(vals, 4)),
                                  np.asarray(vals))


def test_roundtrip_zero_values():
    vals = jnp.zeros(16, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(_roundtrip(vals, 4)),
                                  np.zeros(16))


def test_roundtrip_mixed_zero_nonzero():
    vals = jnp.asarray([0, 5, 0, 7, 0, 0, 3, 0], dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(_roundtrip(vals, 3)),
                                  np.asarray(vals))


def test_roundtrip_batched_rows():
    rng = np.random.default_rng(9)
    vals = jnp.asarray(rng.integers(0, P, (3, 64), dtype=np.uint32))
    line, circ, line_i, circ_i = _twiddles(6)
    ev = fft_ops.fft_natural_to_bitrev(vals, line, circ)
    back = fft_ops.ifft_bitrev_to_natural(ev, line_i, circ_i)
    n_inv = jnp.uint32(pow(64, P - 2, P))
    np.testing.assert_array_equal(np.asarray(m31.mul(back, n_inv)),
                                  np.asarray(vals))


def test_fft_deterministic():
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(0, P, 32, dtype=np.uint32))
    line, circ, _, _ = _twiddles(5)
    a = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
    b = np.asarray(fft_ops.fft_natural_to_bitrev(vals, line, circ))
    np.testing.assert_array_equal(a, b)


def test_single_point_domain_fold():
    """fold() with no factors is identity (1-element transform analog)."""
    vals = jnp.asarray([42], dtype=jnp.uint32)
    out = fft_ops.fold(vals, [], m31.mul, m31.add)
    assert int(np.asarray(out).reshape(-1)[0]) == 42
