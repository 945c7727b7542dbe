"""Array-first ports of the reference SIMD mega-suite
(test/backend/simd.test.ts, 2228 LoC).

The reference's PackedM31/CM31/QM31 classes, UnsafeMut wrappers and
placeholder modules are TS structure with no behavioral content here (a
whole-column jnp array IS the packed type -- backend.py); what this file
ports is the BEHAVIOR those tests pin: interleave/deinterleave semantics,
bit-reverse properties, batch inversion, boundary values, domain
iteration, and evaluate/interpolate/extend/eval-at-point parity across
edge sizes.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.circle import CanonicCoset
from tstwo_tpu.fields import CM31, M31, QM31, batch_inverse
from tstwo_tpu.ops import cm31 as cm31_ops
from tstwo_tpu.ops import fft as fft_ops
from tstwo_tpu.ops import m31 as m31_ops
from tstwo_tpu.ops import qm31 as qm31_ops
from tstwo_tpu.ops.fri_ops import _deinterleave
from tstwo_tpu.utils import bit_reverse_index, bit_reverse_permutation

P = (1 << 31) - 1

BOUNDARY = np.array([0, 1, 2, P - 1, P - 2, 1 << 16, (1 << 16) - 1,
                     (1 << 30), (1 << 30) + 12345], dtype=np.uint32)


# ---------------------------------------------------------------------------
# interleave / deinterleave (simd.test.ts "handle interleave and
# deinterleave" for Packed M31/CM31/QM31)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [16, 256, 1 << 10, 1 << 13, 3 * 256])
def test_deinterleave_matches_strided(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, P, size=(4, n), dtype=np.uint32)
    e, o = _deinterleave(jnp.asarray(x))
    assert np.array_equal(np.asarray(e), x[:, 0::2])
    assert np.array_equal(np.asarray(o), x[:, 1::2])


def test_deinterleave_interleave_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, P, size=(1 << 12,), dtype=np.uint32)
    e, o = _deinterleave(jnp.asarray(x))
    back = np.empty_like(x)
    back[0::2] = np.asarray(e)
    back[1::2] = np.asarray(o)
    assert np.array_equal(back, x)


# ---------------------------------------------------------------------------
# bit reverse (simd.test.ts BitReverse module + "SIMD backend compatibility")
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_n", [1, 2, 3, 5, 8, 11, 14])
def test_bit_reverse_matches_naive(log_n):
    rng = np.random.default_rng(log_n)
    x = rng.integers(0, P, size=1 << log_n, dtype=np.uint32)
    got = np.asarray(fft_ops.bit_reverse(jnp.asarray(x), log_n))
    perm = bit_reverse_permutation(log_n)
    assert np.array_equal(got, x[perm])


def test_bit_reverse_is_own_inverse():
    log_n = 10
    rng = np.random.default_rng(1)
    x = rng.integers(0, P, size=1 << log_n, dtype=np.uint32)
    once = fft_ops.bit_reverse(jnp.asarray(x), log_n)
    twice = np.asarray(fft_ops.bit_reverse(once, log_n))
    assert np.array_equal(twice, x)


def test_bit_reverse_rejects_wrong_size():
    with pytest.raises(ValueError):
        fft_ops.bit_reverse(jnp.zeros(12, dtype=jnp.uint32), 4)


def test_bit_reverse_index_math():
    # simd.test.ts:890-918
    assert bit_reverse_index(0b0110, 4) == 0b0110
    assert bit_reverse_index(0b100, 3) == 0b001
    assert bit_reverse_index(1, 10) == 1 << 9
    for i in range(1 << 6):
        assert bit_reverse_index(bit_reverse_index(i, 6), 6) == i


def test_bit_reverse_batched_leading_axes():
    log_n = 8
    rng = np.random.default_rng(2)
    x = rng.integers(0, P, size=(4, 3, 1 << log_n), dtype=np.uint32)
    got = np.asarray(fft_ops.bit_reverse(jnp.asarray(x), log_n))
    perm = bit_reverse_permutation(log_n)
    assert np.array_equal(got, x[..., perm])


# ---------------------------------------------------------------------------
# batch inverse (simd.test.ts "batch inverse operations" x3 field types)
# ---------------------------------------------------------------------------

def test_m31_batch_inverse_matches_scalar():
    vals = [M31(int(v)) for v in BOUNDARY if v % P != 0] + \
        [M31(int(v)) for v in
         np.random.default_rng(3).integers(1, P, size=40, dtype=np.uint32)]
    out = batch_inverse(vals)
    for v, i in zip(vals, out):
        assert v * i == M31(1)


def test_cm31_batch_inverse_matches_scalar():
    rng = np.random.default_rng(4)
    vals = [CM31(int(a), int(b)) for a, b in
            rng.integers(0, P, size=(30, 2), dtype=np.uint32)
            if (a, b) != (0, 0)]
    out = batch_inverse(vals)
    for v, i in zip(vals, out):
        assert v * i == CM31(1, 0)


def test_qm31_batch_inverse_matches_scalar():
    rng = np.random.default_rng(5)
    vals = [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(30, 4), dtype=np.uint32)]
    out = batch_inverse(vals)
    for v, i in zip(vals, out):
        assert v * i == QM31.one()


def test_device_inv_matches_scalar_boundary():
    vals = np.array([v for v in BOUNDARY if v % P != 0], dtype=np.uint32)
    got = np.asarray(m31_ops.inv(jnp.asarray(vals)))
    for v, i in zip(vals, got):
        assert (int(v) * int(i)) % P == 1


def test_device_cm31_inv_matches_scalar():
    rng = np.random.default_rng(6)
    arr = rng.integers(1, P, size=(2, 64), dtype=np.uint32)
    got = np.asarray(cm31_ops.inv(jnp.asarray(arr)))
    for k in range(64):
        v = CM31(int(arr[0, k]), int(arr[1, k]))
        i = CM31(int(got[0, k]), int(got[1, k]))
        assert v * i == CM31(1, 0)


# ---------------------------------------------------------------------------
# boundary-value arithmetic (simd.test.ts "special values", "boundary
# values", "maintain precision across operations")
# ---------------------------------------------------------------------------

def test_boundary_value_matrix_device_vs_int():
    a = np.repeat(BOUNDARY, len(BOUNDARY))
    b = np.tile(BOUNDARY, len(BOUNDARY))
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    assert np.array_equal(np.asarray(m31_ops.add(ja, jb)),
                          ((a.astype(np.uint64) + b) % P).astype(np.uint32))
    assert np.array_equal(np.asarray(m31_ops.sub(ja, jb)),
                          ((a.astype(np.uint64) + P - b) % P).astype(np.uint32))
    assert np.array_equal(np.asarray(m31_ops.mul(ja, jb)),
                          ((a.astype(np.uint64) * b) % P).astype(np.uint32))
    assert np.array_equal(np.asarray(m31_ops.neg(ja)),
                          ((P - a.astype(np.uint64)) % P).astype(np.uint32))


def test_qm31_mul_device_matches_host():
    rng = np.random.default_rng(7)
    a = rng.integers(0, P, size=(4, 32), dtype=np.uint32)
    b = rng.integers(0, P, size=(4, 32), dtype=np.uint32)
    got = np.asarray(qm31_ops.mul(jnp.asarray(a), jnp.asarray(b)))
    for k in range(32):
        x = QM31.from_u32_unchecked(*a[:, k].tolist())
        y = QM31.from_u32_unchecked(*b[:, k].tolist())
        want = x * y
        assert QM31.from_ints(got[:, k].tolist()) == want


# ---------------------------------------------------------------------------
# domain bit-rev iterator (simd.test.ts Domain module; feeds quotients)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_size", [3, 5, 8])
def test_domain_points_bitrev_matches_index_at(log_size):
    from tstwo_tpu.pcs.quotients import domain_points_bitrev

    domain = CanonicCoset.new(log_size).circle_domain()
    xs, ys = domain_points_bitrev(domain)
    xs, ys = np.asarray(xs), np.asarray(ys)
    for i in range(1 << log_size):
        p = domain.at(bit_reverse_index(i, log_size))
        assert int(xs[i]) == p.x.value
        assert int(ys[i]) == p.y.value


# ---------------------------------------------------------------------------
# evaluate / interpolate / extend / eval-at-point parity across edge sizes
# (simd.test.ts Circle module tests)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_size", [1, 2, 3, 9, 11])
def test_interpolate_evaluate_roundtrip_edges(log_size):
    from tstwo_tpu.poly.circle_poly import (evaluate_values,
                                            interpolate_values)
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    rng = np.random.default_rng(log_size + 100)
    n = 1 << log_size
    domain = CanonicCoset.new(log_size).circle_domain()
    tree = precompute_twiddles(domain.half_coset)
    vals = jnp.asarray(rng.integers(0, P, size=(1, n), dtype=np.uint32))
    coeffs = interpolate_values(vals, domain, tree)
    back = evaluate_values(coeffs, domain, tree)
    assert np.array_equal(np.asarray(back), np.asarray(vals))


@pytest.mark.parametrize("log_size,log_ext", [(3, 5), (5, 8), (8, 10)])
def test_extend_evaluate_consistent(log_size, log_ext):
    """Evaluating zero-padded coefficients on a larger domain restricts
    back to the original evaluations (simd.test.ts 'test extend
    function' + 'test evaluate function')."""
    from tstwo_tpu.poly.circle_poly import (evaluate_values,
                                            interpolate_values)
    from tstwo_tpu.poly.twiddles import precompute_twiddles
    from tstwo_tpu.utils import bit_reverse_index as bri

    rng = np.random.default_rng(log_size * 31 + log_ext)
    n = 1 << log_size
    small = CanonicCoset.new(log_size).circle_domain()
    big = CanonicCoset.new(log_ext).circle_domain()
    tree = precompute_twiddles(big.half_coset)
    vals = jnp.asarray(rng.integers(0, P, size=(1, n), dtype=np.uint32))
    coeffs = interpolate_values(vals, small, tree)
    ext = jnp.pad(coeffs, ((0, 0), (0, (1 << log_ext) - n)))
    big_vals = np.asarray(evaluate_values(ext, big, tree))[0]

    # check at a handful of shared points via pointwise evaluation
    from tstwo_tpu.poly.circle_poly import eval_columns_at_point

    for i in (0, 1, n // 2, n - 1):
        pt_small = small.at(bri(i, log_size))
        # locate the same point in the big domain by brute force over a
        # few candidates (the small domain is not a subset of big in
        # general, so compare against the poly value instead)
        want = eval_columns_at_point(
            coeffs, _to_secure_point(pt_small), log_size)[0]
        got = eval_columns_at_point(
            ext, _to_secure_point(pt_small), log_ext)[0]
        assert got == want


def _to_secure_point(p):
    from tstwo_tpu.circle import CirclePoint

    return CirclePoint(QM31.from_base(p.x), QM31.from_base(p.y))


@pytest.mark.parametrize("log_size", [1, 3, 6, 9])
def test_eval_at_point_matches_pointwise(log_size):
    from tstwo_tpu.poly.circle_poly import eval_columns_at_point

    rng = np.random.default_rng(log_size + 40)
    n = 1 << log_size
    coeffs = jnp.asarray(rng.integers(0, P, size=(2, n), dtype=np.uint32))
    domain = CanonicCoset.new(log_size).circle_domain()
    # evaluating at an in-domain point must reproduce the CFFT evaluation
    from tstwo_tpu.poly.circle_poly import evaluate_values
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    tree = precompute_twiddles(domain.half_coset)
    evals = np.asarray(evaluate_values(coeffs, domain, tree))
    i = min(3, n - 1)
    pt = domain.at(bit_reverse_index(i, log_size))
    got = eval_columns_at_point(coeffs, _to_secure_point(pt), log_size)
    for c in range(2):
        assert got[c] == QM31.from_base(M31(int(evals[c, i])))


# ---------------------------------------------------------------------------
# quotient edge sizes (simd.test.ts Quotients module)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("log_size", [3, 4, 6])
def test_quotients_device_matches_host_rows(log_size):
    from tstwo_tpu.circle import SECURE_FIELD_CIRCLE_GEN
    from tstwo_tpu.pcs.quotients import (ColumnSampleBatch, PointSample,
                                         accumulate_quotients,
                                         accumulate_row_quotients,
                                         domain_points_bitrev,
                                         quotient_constants)

    rng = np.random.default_rng(log_size + 50)
    n = 1 << log_size
    domain = CanonicCoset.new(log_size).circle_domain()
    cols = [jnp.asarray(rng.integers(0, P, size=n, dtype=np.uint32))
            for _ in range(2)]
    point = SECURE_FIELD_CIRCLE_GEN
    samples = [[PointSample(point, QM31.from_u32_unchecked(i + 1, 0, 3, 4))]
               for i in range(2)]
    batches = ColumnSampleBatch.new_vec(samples)
    coeff = QM31.from_u32_unchecked(9, 8, 7, 6)
    out = np.asarray(
        accumulate_quotients(domain, cols, coeff, batches, 1).values)
    consts = quotient_constants(batches, coeff)
    host_cols = [np.asarray(c) for c in cols]
    for i in range(n):
        dp = domain.at(bit_reverse_index(i, log_size))
        row = [M31(int(c[i])) for c in host_cols]
        want = accumulate_row_quotients(batches, row, consts, dp)
        assert QM31.from_ints(out[:, i].tolist()) == want


# ---------------------------------------------------------------------------
# scalar ops / pointwise / reverse / immutability
# (simd.test.ts:328-339, 365-392, 973-993)
# ---------------------------------------------------------------------------

def test_scalar_broadcast_ops_match_elementwise():
    rng = np.random.default_rng(60)
    arr = rng.integers(0, P, size=64, dtype=np.uint32)
    s = np.uint32(12345)
    ja = jnp.asarray(arr)
    assert np.array_equal(np.asarray(m31_ops.add(ja, s)),
                          ((arr.astype(np.uint64) + int(s)) % P).astype(np.uint32))
    assert np.array_equal(np.asarray(m31_ops.mul(ja, s)),
                          ((arr.astype(np.uint64) * int(s)) % P).astype(np.uint32))
    assert np.array_equal(np.asarray(m31_ops.sub(ja, s)),
                          ((arr.astype(np.uint64) + P - int(s)) % P).astype(np.uint32))


def test_pointwise_mul_matches_scalar_loop():
    rng = np.random.default_rng(61)
    a = rng.integers(0, P, size=32, dtype=np.uint32)
    b = rng.integers(0, P, size=32, dtype=np.uint32)
    got = np.asarray(m31_ops.mul(jnp.asarray(a), jnp.asarray(b)))
    for i in range(32):
        assert int(got[i]) == (int(a[i]) * int(b[i])) % P


def test_reverse_operation():
    rng = np.random.default_rng(62)
    arr = rng.integers(0, P, size=128, dtype=np.uint32)
    got = np.asarray(jnp.asarray(arr)[::-1])
    assert np.array_equal(got, arr[::-1])


def test_double_equals_add_self():
    rng = np.random.default_rng(63)
    arr = jnp.asarray(np.random.default_rng(63).integers(
        0, P, size=64, dtype=np.uint32))
    assert np.array_equal(np.asarray(m31_ops.add(arr, arr)),
                          np.asarray(m31_ops.mul(arr, np.uint32(2))))


def test_device_arrays_immutable():
    arr = jnp.asarray(np.arange(8, dtype=np.uint32))
    out = m31_ops.add(arr, np.uint32(1))
    assert np.asarray(arr).tolist() == list(range(8))  # input unchanged
    assert np.asarray(out).tolist() == list(range(1, 9))


def test_qm31_scalar_broadcast():
    rng = np.random.default_rng(64)
    a = rng.integers(0, P, size=(4, 16), dtype=np.uint32)
    s = np.array([3, 1, 4, 1], dtype=np.uint32)
    got = np.asarray(qm31_ops.mul(jnp.asarray(a), jnp.asarray(s)[:, None]))
    from tstwo_tpu.fields import QM31
    sq = QM31.from_ints([3, 1, 4, 1])
    for k in range(16):
        want = QM31.from_ints([int(v) for v in a[:, k]]) * sq
        assert QM31.from_ints([int(v) for v in got[:, k]]) == want
