"""Deep port of reference test/fields/{fields,qm31,cm31}.test.ts
(the cases beyond test_fields_suite.py): exact Rust-mirrored operation
values, field axioms, batch-inverse variant semantics
(classic / in-place / chunked), and serialization layout.
"""
import numpy as np
import pytest

from tstwo_tpu.fields import (CM31, M31, QM31, batch_inverse,
                              batch_inverse_chunked, batch_inverse_in_place)

P = (1 << 31) - 1


def qm31(a, b, c, d):
    return QM31.from_ints([a, b, c, d])


def cm31(a, b):
    return CM31(a, b)


# ---------------------------------------------------------------------------
# qm31.test.ts — exact Rust-mirrored operation values
# ---------------------------------------------------------------------------

def test_qm31_inverse_exact():
    qm = qm31(1, 2, 3, 4)
    assert qm * qm.inverse() == QM31.one()


def test_qm31_ops_exact_rust_values():
    qm0 = qm31(1, 2, 3, 4)
    qm1 = qm31(4, 5, 6, 7)
    m = M31(8)
    qm = QM31.from_base(m)
    qm0_x_qm1 = qm31(P - 71, 93, P - 16, 50)

    assert qm0 + qm1 == qm31(5, 7, 9, 11)
    assert qm1.add_m31(m) == qm1 + qm
    assert qm0 * qm1 == qm0_x_qm1
    assert qm1.mul_m31(m) == qm1 * qm
    assert -qm0 == qm31(P - 1, P - 2, P - 3, P - 4)
    assert qm0 - qm1 == qm31(P - 3, P - 3, P - 3, P - 3)
    assert qm1.sub_m31(m) == qm1 - qm
    assert qm0_x_qm1.div(qm1) == qm31(1, 2, 3, 4)
    assert qm1.div_m31(m) == qm1.div(qm)


def test_qm31_into_slice_layout():
    rng = np.random.default_rng(0)
    elems = [qm31(*r.tolist())
             for r in rng.integers(0, P, size=(100, 4), dtype=np.uint32)]
    blob = QM31.into_slice(elems)
    assert len(blob) == 1600
    for i, e in enumerate(elems):
        sub = blob[i * 16:(i + 1) * 16]
        vals = [int.from_bytes(sub[j * 4:(j + 1) * 4], "little")
                for j in range(4)]
        assert e == qm31(*vals)


def test_qm31_from_m31_constructors_agree():
    arr = [M31(1), M31(2), M31(3), M31(4)]
    f1 = QM31.from_m31(*arr)
    f2 = QM31.from_m31_array(arr)
    assert f1 == qm31(1, 2, 3, 4) and f2 == f1
    assert [v.value for v in f1.to_m31_array()] == [1, 2, 3, 4]


def test_qm31_from_partial_evals_unit_vectors():
    """e_k = unit QM31 vectors combine to zero (Rust formula)."""
    e = [qm31(1, 0, 0, 0), qm31(0, 1, 0, 0),
         qm31(0, 0, 1, 0), qm31(0, 0, 0, 1)]
    assert QM31.from_partial_evals(e) == QM31.zero()


def test_qm31_additive_identities():
    zero, one = QM31.zero(), QM31.one()
    x = qm31(5, 6, 7, 8)
    assert x + zero == x
    assert zero + x == x
    assert x - zero == x
    assert zero - x == -x
    assert -zero == zero


def test_qm31_multiplicative_identities():
    zero, one = QM31.zero(), QM31.one()
    x = qm31(5, 6, 7, 8)
    assert x * one == x
    assert one * x == x
    assert x * zero == zero
    assert x.mul_m31(M31(1)) == x
    assert x.mul_m31(M31(0)) == zero


def test_qm31_double_and_square():
    x = qm31(3, 1, 4, 1)
    assert x.double() == x + x
    assert x.square() == x * x


def test_qm31_pow_chain():
    x = qm31(2, 3, 5, 7)
    assert x.pow(0) == QM31.one()
    assert x.pow(1) == x
    assert x.pow(2) == x.square()
    assert x.pow(5) == x * x * x * x * x


def test_qm31_mul_cm31():
    x = qm31(1, 2, 3, 4)
    c = cm31(5, 6)
    want = x * QM31.from_cm31(c)
    assert x.mul_cm31(c) == want


def test_qm31_inverse_of_zero_raises():
    with pytest.raises(ZeroDivisionError):
        QM31.zero().inverse()


def test_qm31_inverse_random_batch():
    rng = np.random.default_rng(1)
    for r in rng.integers(0, P, size=(20, 4), dtype=np.uint32):
        x = qm31(*r.tolist())
        if x == QM31.zero():
            continue
        assert x * x.inverse() == QM31.one()


def test_qm31_is_zero_and_equality():
    assert QM31.zero() == qm31(0, 0, 0, 0)
    assert qm31(1, 0, 0, 0) != QM31.zero()
    assert qm31(1, 2, 3, 4) == qm31(1, 2, 3, 4)
    assert qm31(1, 2, 3, 4) != qm31(1, 2, 3, 5)


def test_qm31_from_base_embeds():
    m = M31(42)
    q = QM31.from_base(m)
    assert q == qm31(42, 0, 0, 0)
    assert q.to_ints() == (42, 0, 0, 0)


def test_qm31_try_into_m31():
    """A QM31 with only the first coordinate set is a base-field value."""
    q = qm31(7, 0, 0, 0)
    a, b, c, d = q.to_m31_array()
    assert b.is_zero() and c.is_zero() and d.is_zero()
    assert a == M31(7)
    q2 = qm31(7, 1, 0, 0)
    assert not q2.to_m31_array()[1].is_zero()


def test_qm31_into_slice_empty_and_single():
    assert QM31.into_slice([]) == b""
    e = qm31(1, 2, 3, 4)
    blob = QM31.into_slice([e])
    assert len(blob) == 16
    assert int.from_bytes(blob[0:4], "little") == 1
    assert int.from_bytes(blob[12:16], "little") == 4


# ---------------------------------------------------------------------------
# cm31.test.ts — exact Rust-mirrored operation values
# ---------------------------------------------------------------------------

def test_cm31_static_constants():
    assert CM31.zero() == cm31(0, 0)
    assert CM31.one() == cm31(1, 0)


def test_cm31_factory_methods():
    c = CM31.from_u32_unchecked(123, 456)
    assert c.real.value == 123 and c.imag.value == 456
    c3 = CM31.from_m31(M31(789), M31(321))
    assert c3.real == M31(789) and c3.imag == M31(321)
    c4 = CM31.from_base(M31(789))
    assert c4.real == M31(789) and c4.imag.is_zero()


def test_cm31_inverse_exact():
    cm = cm31(1, 2)
    assert cm * cm.inverse() == cm31(1, 0)


def test_cm31_zero_inverse_raises():
    with pytest.raises(ZeroDivisionError):
        CM31.zero().inverse()


def test_cm31_ops_exact_rust_values():
    cm0 = cm31(1, 2)
    cm1 = cm31(4, 5)
    m = M31(8)
    cm = CM31.from_base(m)
    cm0_x_cm1 = cm31(P - 6, 13)

    assert cm0 + cm1 == cm31(5, 7)
    assert cm0 * cm1 == cm0_x_cm1
    assert cm1.mul_m31(m) == cm1 * cm
    assert -cm0 == cm31(P - 1, P - 2)
    assert cm0 - cm1 == cm31(P - 3, P - 3)
    assert cm1.sub_m31(m) == cm1 - cm
    assert cm0_x_cm1 * cm1.inverse() == cm31(1, 2)


def test_cm31_double():
    cm = cm31(100, 200)
    d = cm.double()
    assert d == cm + cm
    assert d.real.value == 200 and d.imag.value == 400


def test_cm31_square_exact():
    cm = cm31(2, 3)
    sq = cm.square()
    assert sq == cm * cm
    # (2+3i)^2 = -5 + 12i
    assert sq.real.value == P - 5 and sq.imag.value == 12


def test_cm31_pow_chain():
    cm = cm31(2, 3)
    assert cm.pow(0) == CM31.one()
    assert cm.pow(1) == cm
    assert cm.pow(2) == cm.square()
    assert cm.pow(3) == cm * cm * cm
    assert cm.pow(5) == cm * cm * cm * cm * cm


def test_cm31_complex_conjugate_norm():
    cm = cm31(123, 456)
    conj = cm.complex_conjugate()
    assert conj.real == cm.real
    assert conj.imag == -cm.imag
    prod = cm * conj
    assert prod.real == cm.real.square() + cm.imag.square()
    assert prod.imag.is_zero()


def test_cm31_zero_detection_and_equality():
    assert CM31.zero().is_zero()
    assert not cm31(1, 0).is_zero()
    assert not cm31(0, 1).is_zero()
    assert cm31(3, 4) == cm31(3, 4)
    assert cm31(3, 4) != cm31(4, 3)


def test_cm31_into_slice_layout():
    elems = [cm31(1, 2), cm31(P - 1, 0)]
    blob = CM31.into_slice(elems)
    assert len(blob) == 16
    assert int.from_bytes(blob[0:4], "little") == 1
    assert int.from_bytes(blob[4:8], "little") == 2
    assert int.from_bytes(blob[8:12], "little") == P - 1
    assert CM31.into_slice([]) == b""


def test_cm31_field_axioms():
    rng = np.random.default_rng(2)
    vals = [cm31(int(a), int(b)) for a, b in
            rng.integers(0, P, size=(6, 2), dtype=np.uint32)]
    a, b, c = vals[0], vals[1], vals[2]
    assert a + b == b + a
    assert (a + b) + c == a + (b + c)
    assert a * b == b * a
    assert (a * b) * c == a * (b * c)
    assert a * (b + c) == a * b + a * c


def test_cm31_i_squared_is_minus_one():
    i = cm31(0, 1)
    assert i * i == cm31(P - 1, 0)


# ---------------------------------------------------------------------------
# fields.test.ts — batch inverse variants
# ---------------------------------------------------------------------------

def _rand_m31s(n, seed=0):
    rng = np.random.default_rng(seed)
    return [M31(int(v))
            for v in rng.integers(1, P, size=n, dtype=np.uint32)]


def test_batch_inverse_in_place_matches_scalar():
    vals = _rand_m31s(17)
    dst = [M31(0)] * 17
    batch_inverse_in_place(vals, dst)
    for v, i in zip(vals, dst):
        assert v * i == M31(1)


def test_batch_inverse_in_place_dst_too_small():
    vals = _rand_m31s(4)
    with pytest.raises(ValueError, match="smaller"):
        batch_inverse_in_place(vals, [M31(0)] * 3)


def test_batch_inverse_in_place_empty():
    batch_inverse_in_place([], [])  # no raise


def test_batch_inverse_in_place_cm31_qm31():
    cvals = [cm31(i + 1, 2 * i + 1) for i in range(9)]
    cdst = [CM31.zero()] * 9
    batch_inverse_in_place(cvals, cdst)
    for v, i in zip(cvals, cdst):
        assert v * i == CM31.one()
    qvals = [qm31(i + 1, i, 3, 4) for i in range(9)]
    qdst = [QM31.zero()] * 9
    batch_inverse_in_place(qvals, qdst)
    for v, i in zip(qvals, qdst):
        assert v * i == QM31.one()


@pytest.mark.parametrize("n,chunk", [(16, 4), (17, 4), (3, 8), (20, 7)])
def test_batch_inverse_chunked_matches_single_pass(n, chunk):
    vals = _rand_m31s(n, seed=n * 31 + chunk)
    dst = [M31(0)] * n
    batch_inverse_chunked(vals, dst, chunk)
    assert dst == batch_inverse(vals)


def test_batch_inverse_chunked_dst_too_small():
    with pytest.raises(ValueError, match="smaller"):
        batch_inverse_chunked(_rand_m31s(8), [M31(0)] * 7, 4)


def test_batch_inverse_chunked_invalid_chunk():
    with pytest.raises(ValueError):
        batch_inverse_chunked(_rand_m31s(8), [M31(0)] * 8, 0)


def test_batch_inverse_large():
    vals = _rand_m31s(1 << 10, seed=99)
    out = batch_inverse(vals)
    idx = [0, 1, 511, 1023]
    for i in idx:
        assert vals[i] * out[i] == M31(1)


def test_batch_inverse_preserves_input():
    vals = _rand_m31s(8, seed=3)
    snapshot = [v.value for v in vals]
    batch_inverse(vals)
    assert [v.value for v in vals] == snapshot


def test_batch_inverse_single_element():
    v = M31(12345)
    assert batch_inverse([v]) == [v.inverse()]
