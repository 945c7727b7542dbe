"""MLE / sumcheck / lookup-utils unit suite (ports of reference
test/lookups/{mle,sumcheck,utils}.test.ts, Rust-spec behavior)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.lookups.mle import BaseMle, Mle, SecureMle
from tstwo_tpu.lookups.sumcheck import (MAX_DEGREE, SumcheckError,
                                        partially_verify, prove_batch)
from tstwo_tpu.lookups.utils import (Fraction, Reciprocal, UnivariatePoly,
                                     eq, fold_mle_evals,
                                     random_linear_combination)

P = (1 << 31) - 1


def rand_qm31s(n, seed):
    rng = np.random.default_rng(seed)
    return [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(n, 4), dtype=np.uint32)]


def rand_mle_arr(log_n, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log_n), dtype=np.uint32))


# ---------------------------------------------------------------------------
# MLE (mle.test.ts)
# ---------------------------------------------------------------------------

def test_mle_n_variables_and_len():
    m = Mle(rand_mle_arr(3, 1))
    assert m.n_variables() == 3
    assert len(m) == 8


def test_mle_at_access():
    vals = rand_qm31s(4, 2)
    m = Mle(vals)
    for i, v in enumerate(vals):
        assert m.at(i) == v


def test_mle_eval_constant():
    v = rand_qm31s(1, 3)
    m = Mle(v)
    assert m.eval_at_point([]) == v[0]


def test_mle_eval_univariate():
    v = rand_qm31s(2, 4)
    m = Mle(v)
    t = rand_qm31s(1, 5)[0]
    # f(t) = (1-t)*f(0) + t*f(1)
    want = (QM31.one() - t) * v[0] + t * v[1]
    assert m.eval_at_point([t]) == want


def test_mle_eval_bivariate():
    v = rand_qm31s(4, 6)
    m = Mle(v)
    t0, t1 = rand_qm31s(2, 7)
    one = QM31.one()
    want = ((one - t0) * ((one - t1) * v[0] + t1 * v[1])
            + t0 * ((one - t1) * v[2] + t1 * v[3]))
    assert m.eval_at_point([t0, t1]) == want


def test_mle_eval_matches_hypercube_identity():
    """eval at a boolean point == the stored evaluation."""
    m = Mle(rand_qm31s(8, 8))
    for i in range(8):
        pt = [QM31.one() if (i >> (2 - k)) & 1 else QM31.zero()
              for k in range(3)]
        assert m.eval_at_point(pt) == m.at(i)


def test_mle_fix_first_variable_semantics():
    m = Mle(rand_qm31s(8, 9))
    t = rand_qm31s(1, 10)[0]
    fixed = m.fix_first_variable(t)
    assert fixed.n_variables() == 2
    for i in range(4):
        want = fold_mle_evals(t, m.at(i), m.at(i + 4))
        assert fixed.at(i) == want


def test_mle_repeated_fix_equals_eval():
    m = Mle(rand_qm31s(8, 11))
    pt = rand_qm31s(3, 12)
    cur = m
    for t in pt:
        cur = cur.fix_first_variable(t)
    assert cur.at(0) == m.eval_at_point(pt)


def test_base_mle_to_secure_and_fix():
    rng = np.random.default_rng(13)
    base = rng.integers(0, P, size=8, dtype=np.uint32)
    bm = BaseMle(jnp.asarray(base))
    assert bm.n_variables() == 3
    assert bm.at(2) == M31(int(base[2]))
    sm = bm.to_secure()
    for i in range(8):
        assert sm.at(i) == QM31.from_base(M31(int(base[i])))
    t = rand_qm31s(1, 14)[0]
    assert np.array_equal(np.asarray(bm.fix_first_variable(t).evals),
                          np.asarray(sm.fix_first_variable(t).evals))


def test_mle_all_same_values():
    v = rand_qm31s(1, 15)[0]
    m = Mle([v] * 8)
    pt = rand_qm31s(3, 16)
    assert m.eval_at_point(pt) == v


# ---------------------------------------------------------------------------
# Sumcheck (sumcheck.test.ts)
# ---------------------------------------------------------------------------

def _secure_mle(log_n, seed):
    return SecureMle(rand_mle_arr(log_n, seed))


def _mle_sum(m):
    s = QM31.zero()
    for i in range(len(m)):
        s = s + m.at(i)
    return s


def test_basic_sumcheck_roundtrip():
    m = _secure_mle(3, 20)
    claim = _mle_sum(m)
    proof, ood, _, _ = prove_batch([claim], [m], QM31.one(),
                                   Blake2sChannel())
    vp, ve = partially_verify(claim, proof, Blake2sChannel())
    assert vp == ood
    assert ve == m.eval_at_point(vp)


def test_batch_sumcheck_same_sizes():
    m1, m2 = _secure_mle(4, 21), _secure_mle(4, 22)
    lam = rand_qm31s(1, 23)[0]
    claims = [_mle_sum(m1), _mle_sum(m2)]
    proof, ood, _, _ = prove_batch(claims, [m1, m2], lam, Blake2sChannel())
    batched_claim = claims[0] + lam * claims[1]
    vp, ve = partially_verify(batched_claim, proof, Blake2sChannel())
    assert ve == m1.eval_at_point(vp) + lam * m2.eval_at_point(vp)


def test_sumcheck_rejects_wrong_claim():
    m = _secure_mle(3, 24)
    claim = _mle_sum(m) + QM31.one()
    proof, _, _, _ = prove_batch([_mle_sum(m)], [m], QM31.one(),
                                 Blake2sChannel())
    with pytest.raises(SumcheckError):
        partially_verify(claim, proof, Blake2sChannel())


def test_sumcheck_rejects_tampered_round_poly():
    m = _secure_mle(3, 25)
    claim = _mle_sum(m)
    proof, _, _, _ = prove_batch([claim], [m], QM31.one(),
                                 Blake2sChannel())
    rp = proof.round_polys[1]
    proof.round_polys[1] = rp.add(UnivariatePoly([QM31.one()]))
    with pytest.raises(SumcheckError):
        partially_verify(claim, proof, Blake2sChannel())


def test_sumcheck_rejects_excess_degree():
    m = _secure_mle(2, 26)
    claim = _mle_sum(m)
    proof, _, _, _ = prove_batch([claim], [m], QM31.one(),
                                 Blake2sChannel())
    coeffs = [QM31.zero()] * (MAX_DEGREE + 2)
    coeffs[-1] = QM31.one()
    proof.round_polys[0] = UnivariatePoly(coeffs)
    with pytest.raises(SumcheckError):
        partially_verify(claim, proof, Blake2sChannel())


def test_sumcheck_channel_determinism():
    m = _secure_mle(3, 27)
    claim = _mle_sum(m)
    p1, ood1, _, _ = prove_batch([claim], [m], QM31.one(), Blake2sChannel())
    m2 = SecureMle(rand_mle_arr(3, 27))
    p2, ood2, _, _ = prove_batch([claim], [m2], QM31.one(),
                                 Blake2sChannel())
    assert ood1 == ood2
    assert [rp.get_coeffs() for rp in p1.round_polys] == \
        [rp.get_coeffs() for rp in p2.round_polys]


# ---------------------------------------------------------------------------
# utils (utils.test.ts)
# ---------------------------------------------------------------------------

def test_univariate_interpolate_and_eval():
    xs = rand_qm31s(4, 30)
    ys = rand_qm31s(4, 31)
    poly = UnivariatePoly.interpolate_lagrange(xs, ys)
    for x, y in zip(xs, ys):
        assert poly.eval_at_point(x) == y


def test_univariate_degree_truncates_leading_zeros():
    p = UnivariatePoly([QM31.one(), QM31.zero(), QM31.zero()])
    assert p.degree() == 0
    q = UnivariatePoly([QM31.zero(), QM31.one()])
    assert q.degree() == 1


def test_eq_identity_and_orthogonality():
    # eq(x, x) = 1 and eq over the boolean hypercube is the indicator
    for i in range(4):
        x = [QM31.one() if (i >> (1 - k)) & 1 else QM31.zero()
             for k in range(2)]
        for j in range(4):
            y = [QM31.one() if (j >> (1 - k)) & 1 else QM31.zero()
                 for k in range(2)]
            want = QM31.one() if i == j else QM31.zero()
            assert eq(x, y) == want


def test_eq_rejects_mismatched_lengths():
    with pytest.raises(Exception):
        eq(rand_qm31s(2, 32), rand_qm31s(3, 33))


def test_fraction_projective_addition():
    a, b, c, d = rand_qm31s(4, 34)
    f = Fraction(a, b) + Fraction(c, d)
    assert f.numerator == a * d + c * b
    assert f.denominator == b * d


def test_fraction_zero():
    z = Fraction.zero()
    assert z.is_zero()
    a, b = rand_qm31s(2, 35)
    f = Fraction(a, b) + z
    # x/y + 0/1 = x/y (projectively: (x*1 + 0*y) / (y*1))
    assert f.numerator == a
    assert f.denominator == b


def test_reciprocal_addition():
    a, b = rand_qm31s(2, 36)
    r = Reciprocal(a) + Reciprocal(b)
    assert r.numerator == a + b
    assert r.denominator == a * b


def test_random_linear_combination_horner():
    vals = rand_qm31s(3, 37)
    alpha = rand_qm31s(1, 38)[0]
    want = vals[0] + alpha * vals[1] + alpha * alpha * vals[2]
    assert random_linear_combination(vals, alpha) == want


def test_fold_mle_evals_semantics():
    a, b, t = rand_qm31s(3, 39)
    assert fold_mle_evals(t, a, b) == a + t * (b - a)
