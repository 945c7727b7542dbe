"""Field-layer unit suite: host M31/CM31/QM31 algebra + batch inversion
edges (ports of reference test/fields/{fields,m31,cm31,qm31}.test.ts
Rust-mirrored cases; the JSON-vector replay in test_fields.py stays the
primary oracle -- these pin the API edges the vectors do not reach)."""
import numpy as np
import pytest

from tstwo_tpu.fields import (CM31, M31, QM31, SECURE_EXTENSION_DEGREE,
                              batch_inverse)

P = (1 << 31) - 1
P2 = P * P
P4 = P2 * P2


def test_m31_reduce_and_partial():
    assert M31.reduce(P).value == 0
    assert M31.reduce(P + 5).value == 5
    assert M31.reduce((1 << 62) - 1).value == ((1 << 62) - 1) % P
    assert M31.partial_reduce(P + 3).value == 3 if hasattr(M31, "partial_reduce") else True


def test_m31_pow_chain_inverse():
    for v in (1, 2, 7, P - 1, 12345):
        m = M31(v)
        assert m * m.inverse() == M31(1)
    with pytest.raises(ZeroDivisionError):
        M31(0).inverse()


def test_m31_into_slice_le():
    vals = [M31(1), M31(P - 1), M31(0x12345678)]
    blob = b"".join(int(v.value).to_bytes(4, "little") for v in vals)
    assert blob[:4] == (1).to_bytes(4, "little")
    assert blob[4:8] == (P - 1).to_bytes(4, "little")


def test_cm31_basic_algebra():
    a = CM31(3, 5)
    b = CM31(7, 11)
    assert a + b == CM31(10, 16)
    assert a - b == CM31((3 - 7) % P, (5 - 11) % P)
    # (3+5i)(7+11i) = 21 - 55 + (33 + 35)i
    assert a * b == CM31((21 - 55) % P, 68)
    assert -a == CM31(P - 3, P - 5)
    assert a * a.inverse() == CM31(1, 0)


def test_cm31_zero_inverse_raises():
    with pytest.raises(ZeroDivisionError):
        CM31(0, 0).inverse()


def test_qm31_from_partial_evals():
    """e0 + e1*(0,1,0,0) + e2*(0,0,1,0) + e3*(0,0,0,1): base-field
    embeddings land in their coordinate slots (reference qm31.ts:168-174)."""
    v = QM31.from_u32_unchecked(1, 2, 3, 4)
    parts = [
        QM31.from_u32_unchecked(1, 0, 0, 0),
        QM31.from_u32_unchecked(2, 0, 0, 0),
        QM31.from_u32_unchecked(3, 0, 0, 0),
        QM31.from_u32_unchecked(4, 0, 0, 0),
    ]
    assert QM31.from_partial_evals(parts) == v
    # and the general linear identity on arbitrary evals
    e = [QM31.from_u32_unchecked(5, 6, 7, 8) for _ in range(4)]
    want = (e[0] + e[1] * QM31.from_u32_unchecked(0, 1, 0, 0)
            + e[2] * QM31.from_u32_unchecked(0, 0, 1, 0)
            + e[3] * QM31.from_u32_unchecked(0, 0, 0, 1))
    assert QM31.from_partial_evals(e) == want


def test_qm31_mul_by_m31_and_cm31():
    q = QM31.from_u32_unchecked(1, 2, 3, 4)
    m = M31(7)
    assert q.mul_m31(m) == QM31.from_u32_unchecked(7, 14, 21, 28)
    c = CM31(2, 3)
    # mul_cm31 multiplies both CM31 halves
    want = QM31(q.c0 * c, q.c1 * c)
    assert q.mul_cm31(c) == want


def test_qm31_double_square_pow():
    q = QM31.from_u32_unchecked(5, 6, 7, 8)
    assert q.double() == q + q
    assert q.square() == q * q
    assert q.pow(5) == q * q * q * q * q
    assert q.pow(0) == QM31.one()


def test_qm31_inverse_and_zero():
    q = QM31.from_u32_unchecked(9, 8, 7, 6)
    assert q * q.inverse() == QM31.one()
    assert QM31.zero().is_zero()
    with pytest.raises(ZeroDivisionError):
        QM31.zero().inverse()


def test_qm31_complex_conjugate_is_galois_u_map():
    """conjugate negates the u-part (Galois map u -> -u), NOT
    coordinate-wise conjugation (the documented reference-TS bug)."""
    q = QM31.from_u32_unchecked(1, 2, 3, 4)
    c = q.complex_conjugate()
    assert c.c0 == q.c0
    assert c.c1 == -q.c1


def test_qm31_to_m31_array_roundtrip():
    q = QM31.from_u32_unchecked(10, 20, 30, 40)
    arr = q.to_m31_array()
    assert [a.value for a in arr] == [10, 20, 30, 40]
    assert QM31.from_ints([a.value for a in arr]) == q


def test_secure_extension_degree():
    assert SECURE_EXTENSION_DEGREE == 4


def test_batch_inverse_empty_and_single():
    assert batch_inverse([]) == []
    out = batch_inverse([M31(7)])
    assert out[0] == M31(7).inverse()


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 16, 33])
def test_batch_inverse_non_aligned_sizes(n):
    rng = np.random.default_rng(n)
    vals = [M31(int(v)) for v in rng.integers(1, P, size=n)]
    out = batch_inverse(vals)
    for v, i in zip(vals, out):
        assert v * i == M31(1)


def test_batch_inverse_mixed_not_allowed_with_zero():
    with pytest.raises(ZeroDivisionError):
        batch_inverse([M31(3), M31(0), M31(5)])


def test_batch_inverse_does_not_modify_input():
    vals = [M31(3), M31(5)]
    batch_inverse(vals)
    assert vals == [M31(3), M31(5)]


def test_p4_constant():
    # order of the QM31 multiplicative group + 1 (qm31.test.ts:315)
    assert P4 == (2**31 - 1) ** 4
    g = QM31.from_u32_unchecked(1, 2, 3, 4)
    assert g.pow(P4 - 1) == QM31.one()  # Lagrange


# ---------------------------------------------------------------------------
# SecureColumnByCoords SoA layout (reference fields/secure_columns.test.ts,
# 26 cases -- here the [4, N] uint32 array IS the SoA type)
# ---------------------------------------------------------------------------

def _secure_eval(vals):
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.poly.circle_poly import SecureEvaluation

    log = max(1, (len(vals) - 1).bit_length())
    domain = CanonicCoset.new(log).circle_domain()
    return SecureEvaluation.from_qm31_list(domain, vals)


def test_secure_column_at_roundtrip():
    rng = np.random.default_rng(60)
    vals = [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(8, 4), dtype=np.uint32)]
    se = _secure_eval(vals)
    assert len(se) == 8
    for i, v in enumerate(vals):
        assert se.at(i) == v


def test_secure_column_coordinate_major_layout():
    vals = [QM31.from_u32_unchecked(1, 2, 3, 4),
            QM31.from_u32_unchecked(5, 6, 7, 8)]
    se = _secure_eval(vals)
    cols = [np.asarray(c) for c in se.columns()]
    assert len(cols) == 4
    # coordinate c of element i lives at cols[c][i]
    assert cols[0].tolist() == [1, 5]
    assert cols[1].tolist() == [2, 6]
    assert cols[2].tolist() == [3, 7]
    assert cols[3].tolist() == [4, 8]


def test_secure_column_zeros_and_len():
    vals = [QM31.zero()] * 4
    se = _secure_eval(vals)
    assert len(se) == 4
    assert all(se.at(i).is_zero() for i in range(4))


def test_secure_column_from_to_qm31_bijective():
    rng = np.random.default_rng(61)
    vals = [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(16, 4), dtype=np.uint32)]
    se = _secure_eval(vals)
    back = [se.at(i) for i in range(len(vals))]
    assert back == vals


def test_secure_column_interpolate_evaluate_roundtrip():
    import jax.numpy as jnp

    from tstwo_tpu.circle import CanonicCoset
    from tstwo_tpu.poly.circle_poly import SecureEvaluation
    from tstwo_tpu.poly.twiddles import precompute_twiddles

    rng = np.random.default_rng(62)
    log = 4
    domain = CanonicCoset.new(log).circle_domain()
    vals = [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(1 << log, 4), dtype=np.uint32)]
    se = SecureEvaluation.from_qm31_list(domain, vals)
    tree = precompute_twiddles(domain.half_coset)
    poly = se.interpolate(tree)
    back = poly.evaluate(domain)
    for i in range(1 << log):
        assert back.at(i) == vals[i]
