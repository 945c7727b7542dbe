"""GKR prover/verifier unit suite: layer semantics, EqEvals, oracle
mechanics, sum correction, and tamper rejections (port of reference
test/lookups/gkr_prover.test.ts, 743 LoC, restricted to the Rust-spec
behavior; the TS toCpu()/error-class cases are structure-only)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.lookups.gkr import (GATE_GRAND_PRODUCT, GATE_LOGUP,
                                   GRAND_PRODUCT, LOGUP_GENERIC,
                                   LOGUP_MULTIPLICITIES, LOGUP_SINGLES,
                                   EqEvals, GkrError, Layer,
                                   correct_sum_as_poly_in_first_variable,
                                   partially_verify_batch, prove_batch)
from tstwo_tpu.lookups.mle import BaseMle, Mle
from tstwo_tpu.lookups.utils import eq
from tstwo_tpu.channel.blake2s import Blake2sChannel

P = (1 << 31) - 1


def rand_qm31s(n, seed):
    rng = np.random.default_rng(seed)
    return [QM31.from_u32_unchecked(*r.tolist())
            for r in rng.integers(0, P, size=(n, 4), dtype=np.uint32)]


def mle_of(vals):
    return Mle(vals)


def rand_mle(log_n, seed):
    rng = np.random.default_rng(seed)
    return Mle(jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log_n), dtype=np.uint32)))


# ---------------------------------------------------------------------------
# EqEvals (gkr_prover.test.ts:62-104)
# ---------------------------------------------------------------------------

def test_eq_evals_empty_y():
    e = EqEvals.generate([])
    assert len(e) == 1
    assert e.at(0) == QM31.one()


def test_eq_evals_single_y():
    y = rand_qm31s(1, 1)
    e = EqEvals.generate(y)
    assert len(e) == 1
    assert e.at(0) == eq([QM31.zero()], y)


@pytest.mark.parametrize("n_vars", [2, 3, 5])
def test_eq_evals_multi_y_matches_eq(n_vars):
    y = rand_qm31s(n_vars, n_vars)
    e = EqEvals.generate(y)
    assert len(e) == 1 << (n_vars - 1)
    # entry i = eq((0, bits of i), y), bits most-significant first
    for i in (0, 1, (1 << (n_vars - 1)) - 1):
        x = [QM31.zero()] + [
            QM31.one() if (i >> (n_vars - 2 - k)) & 1 else QM31.zero()
            for k in range(n_vars - 1)]
        assert e.at(i) == eq(x, y)


# ---------------------------------------------------------------------------
# Layer semantics (gkr_prover.test.ts:106-345)
# ---------------------------------------------------------------------------

def test_layer_n_variables_all_kinds():
    gp = Layer(GRAND_PRODUCT, data=rand_mle(3, 2))
    assert gp.n_variables() == 3
    lg = Layer(LOGUP_GENERIC, numerators=rand_mle(4, 3),
               denominators=rand_mle(4, 4))
    assert lg.n_variables() == 4
    lm = Layer(LOGUP_MULTIPLICITIES,
               numerators=BaseMle(jnp.asarray(
                   np.arange(8, dtype=np.uint32))),
               denominators=rand_mle(3, 5))
    assert lm.n_variables() == 3
    ls = Layer(LOGUP_SINGLES, denominators=rand_mle(2, 6))
    assert ls.n_variables() == 2


def test_layer_is_output_layer():
    out = Layer(GRAND_PRODUCT, data=rand_mle(0, 7))
    assert out.is_output_layer()
    assert not Layer(GRAND_PRODUCT, data=rand_mle(1, 8)).is_output_layer()
    assert out.next_layer() is None


def test_output_layer_values_all_kinds():
    v = rand_qm31s(2, 9)
    gp = Layer(GRAND_PRODUCT, data=Mle([v[0]]))
    assert gp.try_into_output_layer_values() == [v[0]]
    ls = Layer(LOGUP_SINGLES, denominators=Mle([v[0]]))
    assert ls.try_into_output_layer_values() == [QM31.one(), v[0]]
    lm = Layer(LOGUP_MULTIPLICITIES,
               numerators=BaseMle(jnp.asarray(np.array([7], np.uint32))),
               denominators=Mle([v[1]]))
    assert lm.try_into_output_layer_values() == [
        QM31.from_base(M31(7)), v[1]]
    lg = Layer(LOGUP_GENERIC, numerators=Mle([v[0]]),
               denominators=Mle([v[1]]))
    assert lg.try_into_output_layer_values() == [v[0], v[1]]


def test_output_layer_values_rejects_non_output():
    with pytest.raises(GkrError):
        Layer(GRAND_PRODUCT,
              data=rand_mle(2, 10)).try_into_output_layer_values()


def test_fix_first_variable_matches_mle():
    layer = Layer(GRAND_PRODUCT, data=rand_mle(3, 11))
    x0 = rand_qm31s(1, 12)[0]
    fixed = layer.fix_first_variable(x0)
    want = layer.data.fix_first_variable(x0)
    assert np.array_equal(np.asarray(fixed.data.evals),
                          np.asarray(want.evals))


def test_fix_first_variable_multiplicities_becomes_generic():
    layer = Layer(LOGUP_MULTIPLICITIES,
                  numerators=BaseMle(jnp.asarray(
                      np.arange(8, dtype=np.uint32))),
                  denominators=rand_mle(3, 13))
    fixed = layer.fix_first_variable(rand_qm31s(1, 14)[0])
    assert fixed.kind == LOGUP_GENERIC


def test_fix_first_variable_output_layer_identity():
    out = Layer(GRAND_PRODUCT, data=rand_mle(0, 15))
    assert out.fix_first_variable(rand_qm31s(1, 16)[0]) is out


def test_next_layer_grand_product_semantics():
    layer = Layer(GRAND_PRODUCT, data=rand_mle(3, 17))
    nxt = layer.next_layer()
    host = np.asarray(layer.data.evals)
    got = np.asarray(nxt.data.evals)
    for i in range(4):
        a = QM31.from_ints(host[:, 2 * i].tolist())
        b = QM31.from_ints(host[:, 2 * i + 1].tolist())
        assert QM31.from_ints(got[:, i].tolist()) == a * b


def test_next_layer_logup_fraction_addition():
    n = rand_mle(2, 18)
    d = rand_mle(2, 19)
    layer = Layer(LOGUP_GENERIC, numerators=n, denominators=d)
    nxt = layer.next_layer()
    hn, hd = np.asarray(n.evals), np.asarray(d.evals)
    gn, gd = np.asarray(nxt.numerators.evals), np.asarray(
        nxt.denominators.evals)
    for i in range(2):
        n0 = QM31.from_ints(hn[:, 2 * i].tolist())
        n1 = QM31.from_ints(hn[:, 2 * i + 1].tolist())
        d0 = QM31.from_ints(hd[:, 2 * i].tolist())
        d1 = QM31.from_ints(hd[:, 2 * i + 1].tolist())
        assert QM31.from_ints(gn[:, i].tolist()) == n0 * d1 + n1 * d0
        assert QM31.from_ints(gd[:, i].tolist()) == d0 * d1


# ---------------------------------------------------------------------------
# correct_sum_as_poly_in_first_variable (gkr_prover.test.ts:466-541)
# ---------------------------------------------------------------------------

def test_correct_sum_rejects_k_zero():
    y = rand_qm31s(3, 20)
    with pytest.raises(ValueError):
        correct_sum_as_poly_in_first_variable(
            QM31.one(), QM31.one(), QM31.one(), y, 0)


def test_correct_sum_rejects_k_above_len_y():
    y = rand_qm31s(3, 21)
    with pytest.raises(ValueError):
        correct_sum_as_poly_in_first_variable(
            QM31.one(), QM31.one(), QM31.one(), y, 4)


def test_correct_sum_k_equals_len_y():
    y = rand_qm31s(3, 22)
    r = correct_sum_as_poly_in_first_variable(
        rand_qm31s(1, 23)[0], rand_qm31s(1, 24)[0], rand_qm31s(1, 25)[0],
        y, 3)
    # degree-3 univariate; r(0) + r(1) must equal the claim
    claim = rand_qm31s(1, 25)[0]
    assert r.eval_at_point(QM31.zero()) + r.eval_at_point(QM31.one()) == claim


# ---------------------------------------------------------------------------
# prove/verify batch edges + tamper rejections (proveBatch describe +
# Rust gkr e2e error paths)
# ---------------------------------------------------------------------------

def _gp_instance(log_n, seed):
    return Layer(GRAND_PRODUCT, data=rand_mle(log_n, seed))


def test_prove_batch_single_instance_verifies():
    layer = _gp_instance(4, 30)
    proof, artifact = prove_batch(Blake2sChannel(), [layer])
    art = partially_verify_batch([GATE_GRAND_PRODUCT], proof,
                                 Blake2sChannel())
    assert art.ood_point == artifact.ood_point
    assert art.claims_to_verify_by_instance == \
        artifact.claims_to_verify_by_instance


def test_prove_batch_different_sizes_verifies():
    layers = [_gp_instance(5, 31), _gp_instance(3, 32)]
    proof, artifact = prove_batch(Blake2sChannel(), layers)
    art = partially_verify_batch([GATE_GRAND_PRODUCT] * 2, proof,
                                 Blake2sChannel())
    assert art.n_variables_by_instance == [5, 3]


def test_verify_rejects_tampered_output_claim():
    layer = _gp_instance(4, 33)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    proof.output_claims_by_instance[0][0] = (
        proof.output_claims_by_instance[0][0] + QM31.one())
    with pytest.raises(GkrError):
        partially_verify_batch([GATE_GRAND_PRODUCT], proof,
                               Blake2sChannel())


def test_verify_rejects_tampered_mask():
    layer = _gp_instance(4, 34)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    mask = proof.layer_masks_by_instance[0][1]
    a, b = mask.columns_[0]
    mask.columns_[0] = (a + QM31.one(), b)
    with pytest.raises(GkrError):
        partially_verify_batch([GATE_GRAND_PRODUCT], proof,
                               Blake2sChannel())


def test_verify_rejects_wrong_gate():
    layer = _gp_instance(3, 35)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    with pytest.raises(GkrError):
        partially_verify_batch([GATE_LOGUP], proof, Blake2sChannel())


def test_verify_rejects_wrong_instance_count():
    layer = _gp_instance(3, 36)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    with pytest.raises(GkrError):
        partially_verify_batch([GATE_GRAND_PRODUCT] * 2, proof,
                               Blake2sChannel())


def test_verify_rejects_truncated_sumcheck_proofs():
    layer = _gp_instance(4, 37)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    proof.sumcheck_proofs = proof.sumcheck_proofs[:-1]
    with pytest.raises(GkrError):
        partially_verify_batch([GATE_GRAND_PRODUCT], proof,
                               Blake2sChannel())


def test_grand_product_output_equals_product():
    log_n = 4
    layer = _gp_instance(log_n, 38)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    host = np.asarray(layer.data.evals)
    want = QM31.one()
    for i in range(1 << log_n):
        want = want * QM31.from_ints(host[:, i].tolist())
    assert proof.output_claims_by_instance[0] == [want]


def test_minimal_layer_size_one_variable():
    layer = _gp_instance(1, 39)
    proof, _ = prove_batch(Blake2sChannel(), [layer])
    art = partially_verify_batch([GATE_GRAND_PRODUCT], proof,
                                 Blake2sChannel())
    assert art.n_variables_by_instance == [1]


def test_all_logup_variants_prove_and_verify():
    rng = np.random.default_rng(40)
    log_n = 3
    dens = Mle(jnp.asarray(
        rng.integers(1, P, size=(4, 1 << log_n), dtype=np.uint32)))
    nums = Mle(jnp.asarray(
        rng.integers(0, P, size=(4, 1 << log_n), dtype=np.uint32)))
    base = BaseMle(jnp.asarray(
        rng.integers(0, P, size=(1 << log_n,), dtype=np.uint32)))
    layers = [
        Layer(LOGUP_GENERIC, numerators=nums, denominators=dens),
        Layer(LOGUP_MULTIPLICITIES, numerators=base, denominators=dens),
        Layer(LOGUP_SINGLES, denominators=dens),
    ]
    proof, _ = prove_batch(Blake2sChannel(), layers)
    art = partially_verify_batch([GATE_LOGUP] * 3, proof, Blake2sChannel())
    assert art.n_variables_by_instance == [log_n] * 3
