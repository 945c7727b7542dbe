"""Lookup argument tests: sumcheck + GKR (ports of the reference's
gkr/sumcheck test intent: prove then verify, claims match direct sums)."""
import numpy as np
import pytest

from tstwo_tpu.channel.blake2s import Blake2sChannel
from tstwo_tpu.fields import M31, QM31
from tstwo_tpu.lookups.gkr import (GATE_GRAND_PRODUCT, GATE_LOGUP, Layer,
                                   GRAND_PRODUCT, LOGUP_GENERIC,
                                   LOGUP_MULTIPLICITIES, LOGUP_SINGLES,
                                   gen_eq_evals, partially_verify_batch,
                                   prove_batch)
from tstwo_tpu.lookups.mle import BaseMle, Mle, SecureMle
from tstwo_tpu.lookups.sumcheck import partially_verify, prove_batch as sc_prove
from tstwo_tpu.lookups.utils import Fraction, Reciprocal, eq


def rand_qm31_list(rng, n):
    return [QM31.from_ints([int(x) for x in rng.integers(1, (1 << 31) - 1, 4)])
            for _ in range(n)]


def test_gen_eq_evals_matches_scalar_eq():
    rng = np.random.default_rng(0)
    y = rand_qm31_list(rng, 3)
    v = QM31.from_u32_unchecked(7, 1, 2, 3)
    mle = gen_eq_evals(y, v)
    # evals are bit-reversed over the hypercube: index bits map to (x0..x2)
    for i in range(8):
        x = [QM31.from_base(M31((i >> (2 - b)) & 1)) for b in range(3)]
        assert mle.at(i) == eq(x, y) * v, i


def test_sumcheck_secure_mle_roundtrip():
    rng = np.random.default_rng(1)
    vals = rand_qm31_list(rng, 16)
    mle = SecureMle(vals)
    claim = QM31.zero()
    for v in vals:
        claim = claim + v
    ch = Blake2sChannel()
    lam = QM31.one()
    proof, assignment, _, _ = sc_prove([claim], [mle], lam, ch)
    vch = Blake2sChannel()
    v_assignment, eval_claim = partially_verify(claim, proof, vch)
    assert v_assignment == assignment
    assert mle.eval_at_point(v_assignment) == eval_claim


def test_grand_product_gkr():
    rng = np.random.default_rng(2)
    vals = rand_qm31_list(rng, 8)
    product = QM31.one()
    for v in vals:
        product = product * v
    layer = Layer(GRAND_PRODUCT, data=Mle(vals))
    ch = Blake2sChannel()
    proof, artifact = prove_batch(ch, [layer])
    assert proof.output_claims_by_instance[0] == [product]
    vch = Blake2sChannel()
    v_artifact = partially_verify_batch([GATE_GRAND_PRODUCT], proof, vch)
    assert v_artifact.ood_point == artifact.ood_point
    # input-layer claim matches MLE evaluation at OOD point
    assert Mle(vals).eval_at_point(v_artifact.ood_point) == \
        v_artifact.claims_to_verify_by_instance[0][0]


def test_logup_generic_gkr():
    rng = np.random.default_rng(3)
    nums = rand_qm31_list(rng, 8)
    dens = rand_qm31_list(rng, 8)
    total = Fraction.zero()
    for n, d in zip(nums, dens):
        total = total + Fraction(n, d)
    layer = Layer(LOGUP_GENERIC, numerators=Mle(nums), denominators=Mle(dens))
    ch = Blake2sChannel()
    proof, artifact = prove_batch(ch, [layer])
    out_n, out_d = proof.output_claims_by_instance[0]
    # output claim equals the projective sum
    assert out_n * total.denominator == out_d * total.numerator
    vch = Blake2sChannel()
    v_artifact = partially_verify_batch([GATE_LOGUP], proof, vch)
    assert Mle(nums).eval_at_point(v_artifact.ood_point) == \
        v_artifact.claims_to_verify_by_instance[0][0]
    assert Mle(dens).eval_at_point(v_artifact.ood_point) == \
        v_artifact.claims_to_verify_by_instance[0][1]


def test_logup_singles_gkr():
    rng = np.random.default_rng(4)
    dens = rand_qm31_list(rng, 16)
    total = Fraction.zero()
    for d in dens:
        total = total + Fraction(QM31.one(), d)
    layer = Layer(LOGUP_SINGLES, denominators=Mle(dens))
    ch = Blake2sChannel()
    proof, artifact = prove_batch(ch, [layer])
    out_n, out_d = proof.output_claims_by_instance[0]
    assert out_n * total.denominator == out_d * total.numerator
    vch = Blake2sChannel()
    partially_verify_batch([GATE_LOGUP], proof, vch)


def test_logup_multiplicities_gkr():
    rng = np.random.default_rng(5)
    mults = np.array(rng.integers(0, 100, size=8), dtype=np.uint64)
    dens = rand_qm31_list(rng, 8)
    layer = Layer(LOGUP_MULTIPLICITIES, numerators=BaseMle(mults),
                  denominators=Mle(dens))
    ch = Blake2sChannel()
    proof, _ = prove_batch(ch, [layer])
    total = Fraction.zero()
    for m, d in zip(mults, dens):
        total = total + Fraction(QM31.from_base(M31(int(m))), d)
    out_n, out_d = proof.output_claims_by_instance[0]
    assert out_n * total.denominator == out_d * total.numerator
    vch = Blake2sChannel()
    partially_verify_batch([GATE_LOGUP], proof, vch)


def test_gkr_batch_mixed_sizes():
    rng = np.random.default_rng(6)
    a = rand_qm31_list(rng, 8)
    b = rand_qm31_list(rng, 4)
    layers = [Layer(GRAND_PRODUCT, data=Mle(a)),
              Layer(GRAND_PRODUCT, data=Mle(b))]
    ch = Blake2sChannel()
    proof, artifact = prove_batch(ch, layers)
    vch = Blake2sChannel()
    v_artifact = partially_verify_batch(
        [GATE_GRAND_PRODUCT, GATE_GRAND_PRODUCT], proof, vch)
    assert v_artifact.n_variables_by_instance == [3, 2]
    for vals, claims, nvars in zip(
            [a, b], v_artifact.claims_to_verify_by_instance, [3, 2]):
        point = v_artifact.ood_point[-nvars:]
        assert Mle(vals).eval_at_point(point) == claims[0]


def test_reciprocal_and_fraction():
    a = QM31.from_u32_unchecked(3, 0, 0, 0)
    b = QM31.from_u32_unchecked(5, 0, 0, 0)
    f = Reciprocal(a) + Reciprocal(b)
    # 1/3 + 1/5 = 8/15
    assert f.numerator == QM31.from_u32_unchecked(8, 0, 0, 0)
    assert f.denominator == QM31.from_u32_unchecked(15, 0, 0, 0)
