"""GKR batch prover/verifier for GrandProduct and LogUp lookup arguments.

Layer generation and per-round sums run on the DEVICE: each is one jitted
jnp kernel over the hypercube (QM31 SoA uint32 [4, n], same layout as
ops/qm31); the round structure (sumcheck, channel interaction) is
host-driven.  reference lookups/gkr_prover.ts + gkr_verifier.ts +
backend/cpu/lookups/gkr.ts (their CpuBackend ops become fused XLA kernels
here -- SURVEY build step 9).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import M31, QM31
from . import npqm31
from .mle import BaseMle, Mle
from .sumcheck import (SumcheckProof, partially_verify as sumcheck_verify,
                       prove_batch as sumcheck_prove_batch)
from .utils import (UnivariatePoly, eq, fold_mle_evals,
                    random_linear_combination)

GRAND_PRODUCT = "GrandProduct"
LOGUP_GENERIC = "LogUpGeneric"
LOGUP_MULTIPLICITIES = "LogUpMultiplicities"
LOGUP_SINGLES = "LogUpSingles"


class GkrError(Exception):
    pass


@dataclass
class Layer:
    """One GKR circuit layer (reference gkr_prover.ts:96-266)."""

    kind: str
    data: Optional[Mle] = None            # GrandProduct
    numerators: Optional[object] = None   # Mle | BaseMle
    denominators: Optional[Mle] = None    # LogUp variants

    def n_variables(self) -> int:
        if self.kind == GRAND_PRODUCT:
            return self.data.n_variables()
        return self.denominators.n_variables()

    def is_output_layer(self) -> bool:
        return self.n_variables() == 0

    def next_layer(self) -> Optional["Layer"]:
        if self.is_output_layer():
            return None
        if self.kind == GRAND_PRODUCT:
            return Layer(GRAND_PRODUCT, data=Mle(_next_gp(self.data.evals)))
        d = self.denominators.evals
        if self.kind == LOGUP_SINGLES:
            num, den = _next_logup_singles(d)
        else:
            if self.kind == LOGUP_MULTIPLICITIES:
                n_arr = self.numerators.to_secure().evals
            else:
                n_arr = self.numerators.evals
            num, den = _next_logup(n_arr, d)
        return Layer(LOGUP_GENERIC, numerators=Mle(num), denominators=Mle(den))

    def try_into_output_layer_values(self) -> List[QM31]:
        if not self.is_output_layer():
            raise GkrError("not an output layer")
        if self.kind == GRAND_PRODUCT:
            return [self.data.at(0)]
        if self.kind == LOGUP_SINGLES:
            return [QM31.one(), self.denominators.at(0)]
        if self.kind == LOGUP_MULTIPLICITIES:
            return [QM31.from_base(self.numerators.at(0)),
                    self.denominators.at(0)]
        return [self.numerators.at(0), self.denominators.at(0)]

    def fix_first_variable(self, x0: QM31) -> "Layer":
        if self.n_variables() == 0:
            return self
        if self.kind == GRAND_PRODUCT:
            return Layer(GRAND_PRODUCT, data=self.data.fix_first_variable(x0))
        if self.kind == LOGUP_SINGLES:
            return Layer(LOGUP_SINGLES,
                         denominators=self.denominators.fix_first_variable(x0))
        nums = (self.numerators.to_secure()
                if isinstance(self.numerators, BaseMle) else self.numerators)
        return Layer(LOGUP_GENERIC,
                     numerators=nums.fix_first_variable(x0),
                     denominators=self.denominators.fix_first_variable(x0))

    def into_multivariate_poly(self, lambda_: QM31,
                               eq_evals: "EqEvals") -> "GkrMultivariatePolyOracle":
        return GkrMultivariatePolyOracle(eq_evals, self, QM31.one(), lambda_)


class EqEvals:
    """eq(x, y) evaluations with the first variable fixed to 0
    (reference gkr_prover.ts:45-95)."""

    def __init__(self, y: List[QM31], evals: Mle):
        self.y = list(y)
        self.evals = evals

    @staticmethod
    def generate(y: Sequence[QM31]) -> "EqEvals":
        y = list(y)
        if not y:
            return EqEvals(y, Mle([QM31.one()]))
        v = eq([QM31.zero()], [y[0]])
        evals = gen_eq_evals(y[1:], v)
        assert len(evals) == 1 << (len(y) - 1)
        return EqEvals(y, evals)

    def at(self, i: int) -> QM31:
        return self.evals.at(i)

    def __len__(self) -> int:
        return len(self.evals)


# ---------------------------------------------------------------------------
# Jitted device kernels for layer generation and round sums
# (the hypercube-sized work; one fused XLA program per shape, cached)
# ---------------------------------------------------------------------------

def _next_gp_body(ev):
    from ..ops.fri_ops import _deinterleave

    e0, e1 = _deinterleave(ev)
    return npqm31.mul(e0, e1)


def _next_logup_body(n_arr, d):
    from ..ops.fri_ops import _deinterleave

    d0, d1 = _deinterleave(d)
    n0, n1 = _deinterleave(n_arr)
    return (npqm31.add(npqm31.mul(n0, d1), npqm31.mul(n1, d0)),
            npqm31.mul(d0, d1))


def _next_logup_singles_body(d):
    from ..ops.fri_ops import _deinterleave

    d0, d1 = _deinterleave(d)
    return npqm31.add(d0, d1), npqm31.mul(d0, d1)


_next_gp = jax.jit(_next_gp_body)
_next_logup = jax.jit(_next_logup_body)
_next_logup_singles = jax.jit(_next_logup_singles_body)


# Whole-tower kernels: GKR layer generation has NO interleaved channel
# interaction (all layers are generated before the sumcheck rounds,
# reference gkr_prover.ts:440-607), so the full halving tower fuses into
# ONE jit dispatch instead of one per layer -- the per-layer path paid the
# ~2.3 ms tunnel dispatch floor log2(n) times (VERDICT r3 weak #7).

def _gp_tower_body(ev):
    outs = []
    while ev.shape[-1] > 1:
        ev = _next_gp_body(ev)
        outs.append(ev)
    return tuple(outs)


def _logup_tower_body(n_arr, d):
    outs = []
    while d.shape[-1] > 1:
        n_arr, d = _next_logup_body(n_arr, d)
        outs.append((n_arr, d))
    return tuple(outs)


def _logup_singles_tower_body(d):
    num, den = _next_logup_singles_body(d)
    outs = [(num, den)]
    while den.shape[-1] > 1:
        num, den = _next_logup_body(num, den)
        outs.append((num, den))
    return tuple(outs)


_gp_tower = jax.jit(_gp_tower_body)
_logup_tower = jax.jit(_logup_tower_body)
_logup_singles_tower = jax.jit(_logup_singles_tower_body)


@jax.jit
def _gen_eq_evals_kernel(y_arr, v0):
    """y_arr uint32 [k, 4, 1] (most-significant variable first), v0 [4, 1].

    Doubling loop: sizes change each step, so it unrolls statically inside
    one jit trace (k is a shape constant)."""
    arr = v0
    for i in range(y_arr.shape[0] - 1, -1, -1):
        tmp = npqm31.mul(arr, y_arr[i])
        arr = jnp.concatenate([npqm31.sub(arr, tmp), tmp], axis=1)
    return arr


def gen_eq_evals(y: Sequence[QM31], v: QM31) -> Mle:
    """eq(x, y) * v for all x in {0,1}^n, bit-reversed
    (reference backend/cpu/lookups/gkr.ts:90-108), one device kernel."""
    y = list(y)
    if not y:
        return Mle(npqm31.scalar(v, 1))
    y_arr = jnp.asarray(np.array([q.to_ints() for q in y],
                                 dtype=np.uint32)).reshape(-1, 4, 1)
    return Mle(_gen_eq_evals_kernel(y_arr, npqm31.scalar(v, 1)))


@dataclass
class GkrMask:
    """Two evaluations per column of a layer (reference gkr_verifier.ts:256)."""

    columns_: List[Tuple[QM31, QM31]]

    def columns(self) -> List[Tuple[QM31, QM31]]:
        return list(self.columns_)

    def to_rows(self) -> Tuple[List[QM31], List[QM31]]:
        return ([a for a, _ in self.columns_], [b for _, b in self.columns_])

    def reduce_at_point(self, x: QM31) -> List[QM31]:
        return [fold_mle_evals(x, a, b) for a, b in self.columns_]


class GkrMultivariatePolyOracle:
    """reference gkr_prover.ts:299-425."""

    def __init__(self, eq_evals: EqEvals, input_layer: Layer,
                 eq_fixed_var_correction: QM31, lambda_: QM31):
        self.eq_evals = eq_evals
        self.input_layer = input_layer
        self.eq_fixed_var_correction = eq_fixed_var_correction
        self.lambda_ = lambda_

    def n_variables(self) -> int:
        return self.input_layer.n_variables() - 1

    def is_constant(self) -> bool:
        return self.n_variables() == 0

    def sum_as_poly_in_first_variable(self, claim: QM31) -> UnivariatePoly:
        n_variables = self.n_variables()
        if n_variables == 0:
            raise GkrError("number of variables must not be zero")
        n_terms = 1 << (n_variables - 1)
        y = self.eq_evals.y
        lam = self.lambda_
        layer = self.input_layer
        eq_arr = self.eq_evals.evals.evals

        if layer.kind == GRAND_PRODUCT:
            e0, e2 = _eval_grand_product_sum(eq_arr, layer.data.evals, n_terms)
        elif layer.kind in (LOGUP_GENERIC, LOGUP_MULTIPLICITIES):
            nums = (layer.numerators.to_secure().evals
                    if isinstance(layer.numerators, BaseMle)
                    else layer.numerators.evals)
            e0, e2 = _eval_logup_sum(eq_arr, nums, layer.denominators.evals,
                                     n_terms, lam)
        else:
            e0, e2 = _eval_logup_singles_sum(eq_arr, layer.denominators.evals,
                                             n_terms, lam)
        e0 = e0 * self.eq_fixed_var_correction
        e2 = e2 * self.eq_fixed_var_correction
        return correct_sum_as_poly_in_first_variable(e0, e2, claim, y,
                                                     n_variables)

    def fix_first_variable(self, challenge: QM31) -> "GkrMultivariatePolyOracle":
        if self.is_constant():
            return self
        y = self.eq_evals.y
        z0 = y[len(y) - self.n_variables()]
        corr = self.eq_fixed_var_correction * eq([challenge], [z0])
        return GkrMultivariatePolyOracle(
            self.eq_evals, self.input_layer.fix_first_variable(challenge),
            corr, self.lambda_)

    def try_into_mask(self) -> GkrMask:
        if not self.is_constant():
            raise GkrError("polynomial is not constant")
        layer = self.input_layer
        if layer.kind == GRAND_PRODUCT:
            cols = [(layer.data.at(0), layer.data.at(1))]
        elif layer.kind == LOGUP_SINGLES:
            cols = [(QM31.one(), QM31.one()),
                    (layer.denominators.at(0), layer.denominators.at(1))]
        elif layer.kind == LOGUP_MULTIPLICITIES:
            raise GkrError("LogUpMultiplicities should never reach try_into_mask")
        else:
            cols = [(layer.numerators.at(0), layer.numerators.at(1)),
                    (layer.denominators.at(0), layer.denominators.at(1))]
        return GkrMask(cols)


def _two_sums(a0, a2) -> Tuple[QM31, QM31]:
    out = np.asarray(jnp.stack([a0, a2]))
    return (QM31.from_ints([int(v) for v in out[0]]),
            QM31.from_ints([int(v) for v in out[1]]))


@jax.jit
def _eval_grand_product_sum_kernel(eq_arr, inp):
    """reference backend/cpu/lookups/gkr.ts:185-220, one fused kernel."""
    n_terms = eq_arr.shape[1]
    r0i0 = inp[:, 0: 2 * n_terms: 2]
    r0i1 = inp[:, 1: 2 * n_terms: 2]
    r1i0 = inp[:, 2 * n_terms:: 2]
    r1i1 = inp[:, 2 * n_terms + 1:: 2]
    r2i0 = npqm31.sub(npqm31.double(r1i0), r0i0)
    r2i1 = npqm31.sub(npqm31.double(r1i1), r0i1)
    at0 = npqm31.sum_all_arr(npqm31.mul(eq_arr, npqm31.mul(r0i0, r0i1)))
    at2 = npqm31.sum_all_arr(npqm31.mul(eq_arr, npqm31.mul(r2i0, r2i1)))
    return at0, at2


def _eval_grand_product_sum(eq_arr, inp, n_terms) -> Tuple[QM31, QM31]:
    return _two_sums(*_eval_grand_product_sum_kernel(eq_arr[:, :n_terms],
                                                     inp))


@jax.jit
def _eval_logup_sum_kernel(eq_arr, nums, dens, lam_arr):
    n_terms = eq_arr.shape[1]
    n0 = nums[:, 0: 2 * n_terms: 2]
    n1 = nums[:, 1: 2 * n_terms: 2]
    d0 = dens[:, 0: 2 * n_terms: 2]
    d1 = dens[:, 1: 2 * n_terms: 2]
    n0b = nums[:, 2 * n_terms:: 2]
    n1b = nums[:, 2 * n_terms + 1:: 2]
    d0b = dens[:, 2 * n_terms:: 2]
    d1b = dens[:, 2 * n_terms + 1:: 2]
    n0_2 = npqm31.sub(npqm31.double(n0b), n0)
    n1_2 = npqm31.sub(npqm31.double(n1b), n1)
    d0_2 = npqm31.sub(npqm31.double(d0b), d0)
    d1_2 = npqm31.sub(npqm31.double(d1b), d1)

    def frac_acc(na, da, nb, db):
        numer = npqm31.add(npqm31.mul(na, db), npqm31.mul(nb, da))
        denom = npqm31.mul(da, db)
        return npqm31.add(numer, npqm31.mul(lam_arr, denom))

    at0 = npqm31.sum_all_arr(npqm31.mul(eq_arr, frac_acc(n0, d0, n1, d1)))
    at2 = npqm31.sum_all_arr(
        npqm31.mul(eq_arr, frac_acc(n0_2, d0_2, n1_2, d1_2)))
    return at0, at2


def _eval_logup_sum(eq_arr, nums, dens, n_terms, lam) -> Tuple[QM31, QM31]:
    return _two_sums(*_eval_logup_sum_kernel(
        eq_arr[:, :n_terms], nums, dens, npqm31.scalar(lam, 1)))


@jax.jit
def _eval_logup_singles_sum_kernel(eq_arr, dens, lam_arr):
    n_terms = eq_arr.shape[1]
    d0 = dens[:, 0: 2 * n_terms: 2]
    d1 = dens[:, 1: 2 * n_terms: 2]
    d0b = dens[:, 2 * n_terms:: 2]
    d1b = dens[:, 2 * n_terms + 1:: 2]
    d0_2 = npqm31.sub(npqm31.double(d0b), d0)
    d1_2 = npqm31.sub(npqm31.double(d1b), d1)

    def recip_acc(da, db):
        numer = npqm31.add(da, db)
        denom = npqm31.mul(da, db)
        return npqm31.add(numer, npqm31.mul(lam_arr, denom))

    at0 = npqm31.sum_all_arr(npqm31.mul(eq_arr, recip_acc(d0, d1)))
    at2 = npqm31.sum_all_arr(npqm31.mul(eq_arr, recip_acc(d0_2, d1_2)))
    return at0, at2


def _eval_logup_singles_sum(eq_arr, dens, n_terms, lam) -> Tuple[QM31, QM31]:
    return _two_sums(*_eval_logup_singles_sum_kernel(
        eq_arr[:, :n_terms], dens, npqm31.scalar(lam, 1)))


def correct_sum_as_poly_in_first_variable(f_at_0: QM31, f_at_2: QM31,
                                          claim: QM31, y: List[QM31],
                                          k: int) -> UnivariatePoly:
    """r(t) correction (reference gkr_prover.ts:609-670; ia.cr/2024/108 s3.2)."""
    if k == 0:
        raise ValueError("k must not be 0")
    n = len(y)
    if k > n:
        raise ValueError("k must not exceed len(y)")
    zeros = [QM31.zero()] * (n - k + 1)
    a_const = eq(zeros, y[: n - k + 1]).inverse()
    y_nk = y[n - k]
    b_const = (QM31.one() - y_nk).div(QM31.one() - y_nk.double())
    r_at_0 = f_at_0 * eq([QM31.zero()], [y_nk]) * a_const
    r_at_1 = claim - r_at_0
    r_at_2 = f_at_2 * eq([QM31.from_base(M31(2))], [y_nk]) * a_const
    r_at_b = QM31.zero()
    two = QM31.from_base(M31(2))
    return UnivariatePoly.interpolate_lagrange(
        [QM31.zero(), QM31.one(), two, b_const],
        [r_at_0, r_at_1, r_at_2, r_at_b])


# ---------------------------------------------------------------------------
# Batch prover / verifier
# ---------------------------------------------------------------------------

@dataclass
class GkrBatchProof:
    sumcheck_proofs: List[SumcheckProof]
    layer_masks_by_instance: List[List[GkrMask]]
    output_claims_by_instance: List[List[QM31]]


@dataclass
class GkrArtifact:
    ood_point: List[QM31]
    claims_to_verify_by_instance: List[List[QM31]]
    n_variables_by_instance: List[int]


def prove_batch(channel, input_layer_by_instance: List[Layer]
                ) -> Tuple[GkrBatchProof, GkrArtifact]:
    """reference gkr_prover.ts:440-580."""
    n_instances = len(input_layer_by_instance)
    n_layers_by_instance = [l.n_variables() for l in input_layer_by_instance]
    n_layers = max(n_layers_by_instance)

    layers_by_instance = []
    for input_layer in input_layer_by_instance:
        layers = _gen_layers(input_layer)
        layers.reverse()
        layers_by_instance.append(iter(layers))

    output_claims: List[Optional[List[QM31]]] = [None] * n_instances
    layer_masks: List[List[GkrMask]] = [[] for _ in range(n_instances)]
    sumcheck_proofs: List[SumcheckProof] = []
    ood_point: List[QM31] = []
    claims_to_verify: List[Optional[List[QM31]]] = [None] * n_instances

    for layer_idx in range(n_layers):
        n_remaining = n_layers - layer_idx
        for inst in range(n_instances):
            if n_layers_by_instance[inst] == n_remaining:
                output_layer = next(layers_by_instance[inst])
                values = output_layer.try_into_output_layer_values()
                claims_to_verify[inst] = list(values)
                output_claims[inst] = values
        for claims in claims_to_verify:
            if claims is not None:
                channel.mix_felts(claims)
        eq_evals = EqEvals.generate(ood_point)
        sumcheck_alpha = channel.draw_felt()
        instance_lambda = channel.draw_felt()

        sumcheck_oracles = []
        sumcheck_claims = []
        sumcheck_instances = []
        for inst in range(n_instances):
            claims = claims_to_verify[inst]
            if claims is not None:
                layer = next(layers_by_instance[inst])
                sumcheck_oracles.append(
                    layer.into_multivariate_poly(instance_lambda, eq_evals))
                sumcheck_claims.append(
                    random_linear_combination(claims, instance_lambda))
                sumcheck_instances.append(inst)

        proof, sumcheck_ood_point, constant_oracles, _ = sumcheck_prove_batch(
            sumcheck_claims, sumcheck_oracles, sumcheck_alpha, channel)
        sumcheck_proofs.append(proof)
        masks = [o.try_into_mask() for o in constant_oracles]
        for inst, mask in zip(sumcheck_instances, masks):
            flat = [v for col in mask.columns() for v in col]
            channel.mix_felts(flat)
            layer_masks[inst].append(mask)
        challenge = channel.draw_felt()
        ood_point = list(sumcheck_ood_point) + [challenge]
        for inst, mask in zip(sumcheck_instances, masks):
            claims_to_verify[inst] = mask.reduce_at_point(challenge)

    proof = GkrBatchProof(sumcheck_proofs, layer_masks,
                          [c for c in output_claims])
    artifact = GkrArtifact(ood_point, [c for c in claims_to_verify],
                           n_layers_by_instance)
    return proof, artifact


def _gen_layers(input_layer: Layer) -> List[Layer]:
    """All circuit layers, input first, via ONE fused device dispatch."""
    n_variables = input_layer.n_variables()
    layers = [input_layer]
    if n_variables > 0:
        if input_layer.kind == GRAND_PRODUCT:
            outs = _gp_tower(input_layer.data.evals)
            layers += [Layer(GRAND_PRODUCT, data=Mle(o)) for o in outs]
        elif input_layer.kind == LOGUP_SINGLES:
            outs = _logup_singles_tower(input_layer.denominators.evals)
            layers += [Layer(LOGUP_GENERIC, numerators=Mle(n),
                             denominators=Mle(d)) for n, d in outs]
        else:
            if input_layer.kind == LOGUP_MULTIPLICITIES:
                n_arr = input_layer.numerators.to_secure().evals
            else:
                n_arr = input_layer.numerators.evals
            outs = _logup_tower(n_arr, input_layer.denominators.evals)
            layers += [Layer(LOGUP_GENERIC, numerators=Mle(n),
                             denominators=Mle(d)) for n, d in outs]
    assert len(layers) == n_variables + 1
    return layers


GATE_GRAND_PRODUCT = "GrandProduct"
GATE_LOGUP = "LogUp"


def _evaluate_gate(gate: str, mask: GkrMask) -> List[QM31]:
    from .utils import Fraction

    if gate == GATE_LOGUP:
        if len(mask.columns()) != 2:
            raise GkrError("mask has an invalid number of columns")
        (na, nb), (da, db) = mask.columns()
        res = Fraction(na, da) + Fraction(nb, db)
        return [res.numerator, res.denominator]
    if gate == GATE_GRAND_PRODUCT:
        if len(mask.columns()) != 1:
            raise GkrError("mask has an invalid number of columns")
        a, b = mask.columns()[0]
        return [a * b]
    raise GkrError(f"unknown gate {gate}")


def partially_verify_batch(gate_by_instance: List[str], proof: GkrBatchProof,
                           channel) -> GkrArtifact:
    """reference gkr_verifier.ts:14-166."""
    if len(proof.layer_masks_by_instance) != len(proof.output_claims_by_instance):
        raise GkrError("proof data is invalid")
    n_instances = len(proof.layer_masks_by_instance)
    inst_n_layers = lambda i: len(proof.layer_masks_by_instance[i])  # noqa: E731
    n_layers = max(inst_n_layers(i) for i in range(n_instances))
    if n_layers != len(proof.sumcheck_proofs):
        raise GkrError("proof data is invalid")
    if len(gate_by_instance) != n_instances:
        raise GkrError("invalid number of instances")

    ood_point: List[QM31] = []
    claims_to_verify: List[Optional[List[QM31]]] = [None] * n_instances

    for layer_idx, sumcheck_proof in enumerate(proof.sumcheck_proofs):
        n_remaining = n_layers - layer_idx
        for inst in range(n_instances):
            if inst_n_layers(inst) == n_remaining:
                claims_to_verify[inst] = list(
                    proof.output_claims_by_instance[inst])
        for claims in claims_to_verify:
            if claims is not None:
                channel.mix_felts(claims)
        sumcheck_alpha = channel.draw_felt()
        instance_lambda = channel.draw_felt()
        sumcheck_claims = []
        sumcheck_instances = []
        for inst in range(n_instances):
            claims = claims_to_verify[inst]
            if claims is not None:
                n_unused = n_layers - inst_n_layers(inst)
                claim = random_linear_combination(
                    claims, instance_lambda).mul_m31(M31.from_int(1 << n_unused))
                sumcheck_claims.append(claim)
                sumcheck_instances.append(inst)
        sumcheck_claim = random_linear_combination(sumcheck_claims,
                                                   sumcheck_alpha)
        try:
            sumcheck_ood_point, sumcheck_eval = sumcheck_verify(
                sumcheck_claim, sumcheck_proof, channel)
        except Exception as e:
            raise GkrError(f"sum-check invalid in layer {layer_idx}: {e}")
        layer_evals = []
        for inst in sumcheck_instances:
            n_unused = n_layers - inst_n_layers(inst)
            mask = proof.layer_masks_by_instance[inst][layer_idx - n_unused]
            gate_output = _evaluate_gate(gate_by_instance[inst], mask)
            eq_eval = eq(ood_point[n_unused:], sumcheck_ood_point[n_unused:])
            layer_evals.append(
                eq_eval * random_linear_combination(gate_output,
                                                    instance_lambda))
        layer_eval = random_linear_combination(layer_evals, sumcheck_alpha)
        if sumcheck_eval != layer_eval:
            raise GkrError(
                f"circuit check failed in layer {layer_idx} "
                f"(calculated {layer_eval}, claim {sumcheck_eval})")
        for inst in sumcheck_instances:
            n_unused = n_layers - inst_n_layers(inst)
            mask = proof.layer_masks_by_instance[inst][layer_idx - n_unused]
            flat = [v for col in mask.columns() for v in col]
            channel.mix_felts(flat)
        challenge = channel.draw_felt()
        ood_point = list(sumcheck_ood_point) + [challenge]
        for inst in sumcheck_instances:
            n_unused = n_layers - inst_n_layers(inst)
            mask = proof.layer_masks_by_instance[inst][layer_idx - n_unused]
            claims_to_verify[inst] = mask.reduce_at_point(challenge)

    return GkrArtifact(ood_point, [c for c in claims_to_verify],
                       [inst_n_layers(i) for i in range(n_instances)])
