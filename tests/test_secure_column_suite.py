"""Port of reference test/fields/secure_columns.test.ts (26 cases):
SecureColumnByCoords -- the SoA QM31 column container
(reference src/fields/secure_columns.ts).  Here the four coordinate
columns are one u32[4, n] array (the device kernel layout), so the
"defensive copy" cases pin numpy-copy semantics instead of JS array
aliasing, and two device-interop cases replace the TS to_cpu no-ops.
"""
import numpy as np
import pytest

from tstwo_tpu.fields import (M31, QM31, SECURE_EXTENSION_DEGREE,
                              SecureColumnByCoords)

QM1 = QM31.from_ints([0, 1, 2, 3])
QM2 = QM31.from_ints([4, 5, 6, 7])
QZERO = QM31.zero()


def _valid_columns(n, offset=0):
    return [[M31((i + 1) * (j + 1) + offset) for j in range(n)]
            for i in range(SECURE_EXTENSION_DEGREE)]


# -- constructor ------------------------------------------------------------

def test_create_with_valid_columns():
    cols = _valid_columns(3)
    sc = SecureColumnByCoords(cols)
    assert sc.len() == 3
    assert int(sc.columns[0][0]) == cols[0][0].value


def test_constructor_copies_input():
    cols = _valid_columns(3)
    sc = SecureColumnByCoords(cols)
    cols[0][0] = M31(100)
    assert int(sc.columns[0][0]) != 100


def test_wrong_column_count_raises():
    with pytest.raises(ValueError, match="coordinate columns"):
        SecureColumnByCoords([_valid_columns(2)[0]])


def test_mismatched_lengths_raise():
    cols = _valid_columns(2)
    cols[1].append(M31.one())
    with pytest.raises(ValueError, match="length mismatch"):
        SecureColumnByCoords(cols)


def test_mutating_instance_does_not_touch_input():
    cols = _valid_columns(1)
    sc = SecureColumnByCoords(cols)
    sc.set(0, QM31.from_ints([123, 0, 0, 0]))
    assert cols[0][0].value != 123


# -- zeros / uninitialized --------------------------------------------------

def test_zeros_length():
    assert SecureColumnByCoords.zeros(5).len() == 5


def test_zeros_all_zero():
    sc = SecureColumnByCoords.zeros(3)
    for i in range(3):
        assert sc.at(i) == QZERO


def test_zeros_empty():
    sc = SecureColumnByCoords.zeros(0)
    assert sc.len() == 0 and sc.is_empty()


def test_uninitialized_behaves_like_zeros():
    a = SecureColumnByCoords.uninitialized(4)
    b = SecureColumnByCoords.zeros(4)
    assert a.len() == 4
    for i in range(4):
        assert a.at(i) == b.at(i) == QZERO


# -- len / is_empty ---------------------------------------------------------

def test_len_reports():
    assert SecureColumnByCoords.zeros(0).len() == 0
    assert SecureColumnByCoords.from_iter([QM1, QM2, QZERO]).len() == 3
    assert len(SecureColumnByCoords.from_iter([QM1])) == 1


def test_is_empty_reports():
    assert SecureColumnByCoords.zeros(0).is_empty()
    assert not SecureColumnByCoords.from_iter([QM1]).is_empty()


# -- at / set ---------------------------------------------------------------

def test_set_get_roundtrip():
    sc = SecureColumnByCoords.zeros(3)
    sc.set(1, QM1)
    assert sc.at(1) == QM1
    assert sc.at(0) == QZERO and sc.at(2) == QZERO


def test_at_begin_middle_end():
    vals = [QM1, QM2, QM1 + QM2, QM2 * QM2, QM1 - QM2]
    sc = SecureColumnByCoords.from_iter(vals)
    assert sc.at(0) == vals[0]
    assert sc.at(2) == vals[2]
    assert sc.at(4) == vals[4]


def test_set_updates_coordinate_columns():
    sc = SecureColumnByCoords.zeros(2)
    sc.set(0, QM31.from_ints([10, 20, 30, 40]))
    assert [int(sc.columns[c][0]) for c in range(4)] == [10, 20, 30, 40]


def test_at_out_of_bounds():
    sc = SecureColumnByCoords.from_iter([QM1])
    with pytest.raises(IndexError):
        sc.at(1)
    with pytest.raises(IndexError):
        sc.at(-1)


def test_set_out_of_bounds():
    sc = SecureColumnByCoords.from_iter([QM1])
    with pytest.raises(IndexError):
        sc.set(1, QM2)
    with pytest.raises(IndexError):
        sc.set(-1, QM2)


# -- to_cpu -----------------------------------------------------------------

def test_to_cpu_new_instance():
    sc = SecureColumnByCoords.from_iter([QM1, QM2])
    cp = sc.to_cpu()
    assert cp is not sc and cp == sc


def test_to_cpu_same_values():
    sc = SecureColumnByCoords.from_iter([QM1, QM2, QZERO])
    cp = sc.to_cpu()
    for i in range(3):
        assert cp.at(i) == sc.at(i)


def test_to_cpu_deep_copy():
    sc = SecureColumnByCoords.from_iter([QM1, QM2])
    cp = sc.to_cpu()
    cp.set(0, QZERO)
    assert sc.at(0) == QM1


# -- iteration --------------------------------------------------------------

def test_iterate_empty():
    assert list(SecureColumnByCoords.zeros(0)) == []


def test_iterate_in_order():
    vals = [QM1, QM2, QM1 * QM2]
    assert list(SecureColumnByCoords.from_iter(vals)) == vals


# -- from (iterable) --------------------------------------------------------

def test_from_empty_iterable():
    sc = SecureColumnByCoords.from_iter([])
    assert sc.is_empty()


def test_from_list():
    sc = SecureColumnByCoords.from_iter([QM1, QM2, QZERO])
    assert sc.len() == 3 and sc.at(1) == QM2


def test_from_generator():
    sc = SecureColumnByCoords.from_iter(
        QM31.from_ints([i, 0, 0, 0]) for i in range(4))
    assert [v.to_ints()[0] for v in sc] == [0, 1, 2, 3]


# -- to_vec -----------------------------------------------------------------

def test_to_vec_empty():
    assert SecureColumnByCoords.zeros(0).to_vec() == []


def test_to_vec_order():
    vals = [QM2, QM1, QZERO, QM1 + QM2]
    assert SecureColumnByCoords.from_iter(vals).to_vec() == vals


# -- device interop (tpu-native surface; no TS counterpart) -----------------

def test_to_device_is_soa_layout():
    sc = SecureColumnByCoords.from_iter([QM1, QM2])
    dev = sc.to_device()
    assert dev.shape == (4, 2)
    assert np.array_equal(np.asarray(dev), sc.data)


def test_from_device_roundtrip_and_validation():
    sc = SecureColumnByCoords.from_iter([QM1, QM2, QM1 * QM2])
    back = SecureColumnByCoords.from_device(sc.to_device())
    assert back == sc
    with pytest.raises(ValueError):
        SecureColumnByCoords.from_device(np.zeros((3, 5), dtype=np.uint32))
