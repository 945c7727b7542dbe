"""Circle polynomials and their evaluations (device columns).

CirclePoly holds coefficients in the CFFT basis
{1,y} x {1,x} x {1,pi(x)} x ... (natural order); CircleEvaluation holds
values on a CircleDomain in bit-reversed order.  Secure variants hold 4
coordinate columns in the SecureColumnByCoords SoA layout.

reference: poly/circle/{poly,evaluation,secure_poly,ops}.ts and
backend/cpu/circle.ts (kernels re-derived TPU-first; the reference's
log_size==3 index-swap workaround is a TS bug and is intentionally absent).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..circle import CanonicCoset, CircleDomain, CirclePoint
from ..fields import M31, QM31
from ..ops import fft as fft_ops
from ..ops import m31 as m31_ops
from ..ops import qm31 as qm31_ops
from .twiddles import (TwiddleTree, circle_layer_twiddles,
                       domain_line_twiddles, precompute_twiddles)

MAX_CIRCLE_DOMAIN_LOG_SIZE = 30


def _check_tree(domain: CircleDomain, tree: TwiddleTree) -> None:
    if not domain.half_coset.is_doubling_of(tree.root_coset):
        raise ValueError("twiddle tree mismatch for domain")


def _mappings_for_point(point: CirclePoint, log_size: int,
                        one) -> List:
    """[y, x, pi(x), pi^2(x), ...]: innermost-to-outermost fold factors."""
    mappings = [point.y]
    x = point.x
    for _ in range(1, log_size):
        mappings.append(x)
        x = CirclePoint.double_x(x, one)
    return mappings


def _fft_twiddles(domain: CircleDomain, tree: TwiddleTree, inverse: bool):
    line = domain_line_twiddles(domain.log_size(), tree, inverse)
    circle = circle_layer_twiddles(line[0])
    return line, circle


def evaluate_values(coeffs: jnp.ndarray, domain: CircleDomain,
                    tree: Optional[TwiddleTree] = None) -> jnp.ndarray:
    """CFFT-evaluate coefficient array(s) on `domain` (bit-reversed output).

    Works for base columns (shape [..., n]) where n <= domain.size();
    coefficients are zero-extended (reference backend/cpu/circle.ts:71-82).
    """
    n = domain.size()
    log = domain.log_size()
    if coeffs.shape[-1] > n:
        raise ValueError("domain too small for polynomial")
    if coeffs.shape[-1] < n:
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n - coeffs.shape[-1])]
        coeffs = jnp.pad(coeffs, pad)
    if log == 1:
        y = jnp.asarray(np.uint32(domain.half_coset.initial.y.value))
        v0, v1 = coeffs[..., 0], coeffs[..., 1]
        prod = m31_ops.mul(v1, y)
        return jnp.stack([m31_ops.add(v0, prod), m31_ops.sub(v0, prod)], axis=-1)
    if tree is None:
        tree = precompute_twiddles(domain.half_coset)
    _check_tree(domain, tree)
    if log == 2:
        # twiddles [x] for layer 1 and [y, -y] for layer 0
        # (reference backend/cpu/circle.ts:99-109)
        init = domain.half_coset.initial
        x = jnp.asarray(np.uint32(init.x.value))[None]
        y = np.uint32(init.y.value)
        circle = jnp.asarray(np.array([y, (0x7FFFFFFF - y + 1) % 0x7FFFFFFF],
                                      dtype=np.uint32))
        circle = jnp.asarray(
            np.array([init.y.value, (-init.y).value], dtype=np.uint32))
        return fft_ops.fft_natural_to_bitrev(coeffs, [x], circle)
    line, circle = _fft_twiddles(domain, tree, inverse=False)
    return fft_ops.fft_natural_to_bitrev(coeffs, line, circle)


def interpolate_values(values: jnp.ndarray, domain: CircleDomain,
                       tree: Optional[TwiddleTree] = None) -> jnp.ndarray:
    """Inverse CFFT: bit-reversed evaluations -> coefficients (natural)."""
    log = domain.log_size()
    n = domain.size()
    ninv = jnp.asarray(np.uint32(M31(n % ((1 << 31) - 1)).inverse().value))
    if log == 1:
        yinv = jnp.asarray(
            np.uint32(domain.half_coset.initial.y.inverse().value))
        v0, v1 = values[..., 0], values[..., 1]
        out = jnp.stack(
            [m31_ops.add(v0, v1), m31_ops.mul(m31_ops.sub(v0, v1), yinv)],
            axis=-1)
        return m31_ops.mul(out, ninv)
    if tree is None:
        tree = precompute_twiddles(domain.half_coset)
    _check_tree(domain, tree)
    if log == 2:
        init = domain.half_coset.initial
        xinv = jnp.asarray(np.uint32(init.x.inverse().value))[None]
        yi = init.y.inverse()
        circle_inv = jnp.asarray(
            np.array([yi.value, (-yi).value], dtype=np.uint32))
        out = fft_ops.ifft_bitrev_to_natural(values, [xinv], circle_inv)
        return m31_ops.mul(out, ninv)
    line_i = domain_line_twiddles(log, tree, inverse=True)
    circle_i = circle_layer_twiddles(line_i[0])
    out = fft_ops.ifft_bitrev_to_natural(values, line_i, circle_i)
    return m31_ops.mul(out, ninv)


@dataclass
class CirclePoly:
    """Base-field circle polynomial; coeffs natural order (poly/circle/poly.ts:9)."""

    coeffs: jnp.ndarray  # uint32 [n]

    def __post_init__(self):
        n = self.coeffs.shape[-1]
        if n & (n - 1):
            raise ValueError("coeffs length must be a power of two")

    def log_size(self) -> int:
        return int(self.coeffs.shape[-1]).bit_length() - 1

    def extend(self, log_size: int) -> "CirclePoly":
        n = 1 << log_size
        if n < self.coeffs.shape[-1]:
            raise ValueError("log size too small")
        return CirclePoly(jnp.pad(self.coeffs, (0, n - self.coeffs.shape[-1])))

    def evaluate(self, domain: CircleDomain,
                 tree: Optional[TwiddleTree] = None) -> "CircleEvaluation":
        return CircleEvaluation(domain, evaluate_values(self.coeffs, domain, tree))

    def eval_at_point(self, point: CirclePoint) -> QM31:
        """Evaluate at a QM31 point via hierarchical fold
        (reference backend/cpu/circle.ts:52-69)."""
        return eval_columns_at_point(self.coeffs[None, :], point,
                                     self.log_size())[0]

    def is_in_fft_space(self, log_fft_size: int) -> bool:
        c = np.asarray(self.coeffs)
        return not c[1 << log_fft_size:].any()

    def is_in_fri_space(self, log_fft_size: int) -> bool:
        """FFT-space + possibly the extra decomposition coefficient
        (reference poly/circle/poly.ts is_in_fri_space)."""
        c = np.asarray(self.coeffs)
        n = 1 << log_fft_size
        return not c[n + 1:].any() if len(c) > n else True


@dataclass
class CircleEvaluation:
    """Values over a CircleDomain in bit-reversed order
    (poly/circle/evaluation.ts:17)."""

    domain: CircleDomain
    values: jnp.ndarray  # uint32 [n]

    def __post_init__(self):
        if int(self.values.shape[-1]) != self.domain.size():
            raise ValueError("domain/values size mismatch")

    def interpolate(self, tree: Optional[TwiddleTree] = None) -> CirclePoly:
        return CirclePoly(interpolate_values(self.values, self.domain, tree))

    def to_numpy(self) -> np.ndarray:
        return np.asarray(self.values)


@dataclass
class SecureCirclePoly:
    """4 coordinate polynomials = one QM31 polynomial (secure_poly.ts:11)."""

    coeffs: jnp.ndarray  # uint32 [4, n]

    def log_size(self) -> int:
        return int(self.coeffs.shape[-1]).bit_length() - 1

    def coordinate_polys(self) -> List[CirclePoly]:
        return [CirclePoly(self.coeffs[i]) for i in range(4)]

    def evaluate(self, domain: CircleDomain,
                 tree: Optional[TwiddleTree] = None) -> "SecureEvaluation":
        return SecureEvaluation(domain, evaluate_values(self.coeffs, domain, tree))

    def eval_at_point(self, point: CirclePoint) -> QM31:
        evals = [p.eval_at_point(point) for p in self.coordinate_polys()]
        return QM31.from_partial_evals(evals)


@dataclass
class SecureEvaluation:
    """QM31 values (SoA [4, n]) over a CircleDomain, bit-reversed order."""

    domain: CircleDomain
    values: jnp.ndarray  # uint32 [4, n]

    def __post_init__(self):
        if int(self.values.shape[-1]) != self.domain.size():
            raise ValueError("domain/values size mismatch")

    def __len__(self) -> int:
        return int(self.values.shape[-1])

    def interpolate(self, tree: Optional[TwiddleTree] = None) -> SecureCirclePoly:
        return SecureCirclePoly(interpolate_values(self.values, self.domain, tree))

    def columns(self) -> List[jnp.ndarray]:
        return [self.values[i] for i in range(4)]

    def at(self, i: int) -> QM31:
        return QM31.from_ints([int(self.values[c, i]) for c in range(4)])

    @staticmethod
    def from_qm31_list(domain: CircleDomain, vals: Sequence[QM31]) -> "SecureEvaluation":
        arr = np.array([v.to_ints() for v in vals], dtype=np.uint32).T
        return SecureEvaluation(domain, jnp.asarray(arr))


class CosetSubEvaluation:
    """Strided wraparound view over an evaluation's values
    (reference poly/circle/evaluation.ts CosetSubEvaluation): element i is
    ``values[(offset + i * step) & (len(values) - 1)]``."""

    def __init__(self, values, offset: int, step: int):
        n = len(values)
        if n & (n - 1):
            raise ValueError("values length must be a power of two")
        self._values = values
        self._offset = offset
        self._step = step
        self._mask = n - 1

    def at(self, index: int):
        return self._values[(self._offset + index * self._step) & self._mask]

    get = at

    def __getitem__(self, index: int):
        return self.at(index)


import jax as _jax


@_jax.jit
def _fold_columns_kernel(coeff_stack: jnp.ndarray, mappings) -> jnp.ndarray:
    """One fused fold of [k, n] base columns by QM31 factors (list of [4])."""
    v = qm31_ops.from_m31(coeff_stack)  # [4, k, n]
    from ..ops.fri_ops import _deinterleave

    for f in mappings:
        fb = f[:, None, None]
        v0, v1 = _deinterleave(v)
        v = qm31_ops.add(v0, qm31_ops.mul(v1, fb))
    return v[:, :, 0]


def eval_columns_at_point(coeff_stack: jnp.ndarray, point: CirclePoint,
                          log_size: int) -> List[QM31]:
    """Evaluate a batch of base-coefficient columns [k, n] at one QM31 point
    in a single fused device computation."""
    if log_size == 0:
        return [QM31.from_base(M31(int(coeff_stack[i, 0])))
                for i in range(coeff_stack.shape[0])]
    mappings = _mappings_for_point(point, log_size, QM31.one())
    factors = [qm31_ops.scalar(f) for f in mappings]
    from ..utils import to_host

    out = to_host(_fold_columns_kernel(coeff_stack, factors))
    return [QM31.from_ints(out[:, i].tolist()) for i in range(out.shape[1])]


def eval_columns_at_point_deferred(coeff_stack: jnp.ndarray,
                                   point: CirclePoint, log_size: int,
                                   batch):
    """Deferred variant: dispatches the fold kernel, registers the (tiny)
    result in `batch` (utils.FetchBatch) and returns a thunk -> List[QM31].
    Lets a prove fetch ALL out-of-domain sample values with ONE device->
    host transfer instead of one blocking round trip per (tree, point,
    size) group (measured ~60 ms of the 0.43 s basic-air prove, round 4)."""
    if log_size == 0:
        vals = [QM31.from_base(M31(int(coeff_stack[i, 0])))
                for i in range(coeff_stack.shape[0])]
        return lambda: vals
    mappings = _mappings_for_point(point, log_size, QM31.one())
    factors = [qm31_ops.scalar(f) for f in mappings]
    handle = batch.defer(_fold_columns_kernel(coeff_stack, factors))

    def get() -> List[QM31]:
        out = handle.get()
        return [QM31.from_ints(out[:, i].tolist())
                for i in range(out.shape[1])]

    return get
