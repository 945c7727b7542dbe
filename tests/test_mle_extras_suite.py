"""Port of reference test/lookups/mle.test.ts cases beyond
test_lookups_suite.py (validation, oracle interface, sum-as-poly
semantics) and test/backend/cpu/lookups/mle.test.ts edges (~14 cases).
"""
import numpy as np
import pytest

from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.lookups.mle import BaseMle, Mle, SecureMle

P = (1 << 31) - 1


def _mle(n, seed=0, cls=Mle):
    rng = np.random.default_rng(seed)
    return cls(rng.integers(0, P, size=(4, n), dtype=np.uint32))


def _sum(mle, lo, hi):
    acc = QM31.zero()
    for i in range(lo, hi):
        acc = acc + mle.at(i)
    return acc


def test_mle_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        Mle(np.zeros((4, 3), dtype=np.uint32))


def test_mle_rejects_empty():
    with pytest.raises(ValueError):
        Mle(np.zeros((4, 0), dtype=np.uint32))


def test_mle_at_out_of_bounds():
    m = _mle(4)
    with pytest.raises(IndexError):
        m.at(4)
    with pytest.raises(IndexError):
        m.at(-1)


def test_mle_single_eval_zero_variables():
    m = Mle([QM31.from_ints([7, 0, 0, 0])])
    assert m.n_variables() == 0 and len(m) == 1
    assert m.eval_at_point([]) == QM31.from_ints([7, 0, 0, 0])


def test_mle_eval_wrong_point_length_rejected():
    m = _mle(8)  # 3 variables
    with pytest.raises(ValueError, match="variables"):
        m.eval_at_point([QM31.one()])
    with pytest.raises(ValueError, match="variables"):
        m.eval_at_point([QM31.one()] * 4)


def test_mle_fix_does_not_mutate_original():
    m = _mle(8, seed=1)
    before = [m.at(i).to_ints() for i in range(8)]
    m.fix_first_variable(QM31.from_ints([3, 1, 4, 1]))
    assert [m.at(i).to_ints() for i in range(8)] == before


def test_mle_into_evals_roundtrip():
    m = _mle(4, seed=2)
    evals = m.into_evals()
    m2 = Mle(evals)
    assert all(m.at(i) == m2.at(i) for i in range(4))


def test_secure_mle_sum_as_poly_halves():
    """p(0) = sum over first half, p(1) = sum over second half
    (MultivariatePolyOracle contract, mle.test.ts:250-277)."""
    m = _mle(8, seed=3, cls=SecureMle)
    claim = _sum(m, 0, 8)
    poly = m.sum_as_poly_in_first_variable(claim)
    assert poly.eval_at_point(QM31.zero()) == _sum(m, 0, 4)
    assert poly.eval_at_point(QM31.one()) == _sum(m, 4, 8)


def test_secure_mle_sum_poly_consistent_with_claim():
    m = _mle(16, seed=4, cls=SecureMle)
    claim = _sum(m, 0, 16)
    poly = m.sum_as_poly_in_first_variable(claim)
    assert (poly.eval_at_point(QM31.zero())
            + poly.eval_at_point(QM31.one())) == claim


def test_secure_mle_fix_returns_secure_mle():
    m = _mle(8, seed=5, cls=SecureMle)
    fixed = m.fix_first_variable(QM31.from_ints([2, 0, 0, 0]))
    assert isinstance(fixed, SecureMle)
    assert fixed.n_variables() == m.n_variables() - 1


def test_mle_oracle_fix_chain_matches_eval():
    m = _mle(8, seed=6)
    pt = [QM31.from_ints([i + 2, 0, 1, 0]) for i in range(3)]
    cur = m
    for p in pt:
        cur = cur.fix_first_variable(p)
    assert cur.at(0) == m.eval_at_point(pt)


def test_base_mle_rejects_invalid():
    with pytest.raises(ValueError):
        BaseMle(np.zeros(5, dtype=np.uint32))


def test_base_mle_to_secure_preserves_values():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, P, size=8, dtype=np.uint32)
    bm = BaseMle(vals)
    sm = bm.to_secure()
    for i in range(8):
        assert sm.at(i) == QM31.from_base(M31(int(vals[i])))


def test_mle_large_efficiency():
    m = _mle(1 << 12, seed=8)
    assert m.n_variables() == 12
    fixed = m.fix_first_variable(QM31.from_ints([5, 0, 0, 0]))
    assert len(fixed) == 1 << 11
