"""Multilinear extensions, stored bit-reversed over the boolean hypercube.

Backed by device (jnp) QM31 SoA [4, n] arrays; base-field MLEs hold a
uint32 [n] device array.  The per-variable fold is one fused jit kernel.
reference lookups/mle.ts.
"""
from __future__ import annotations

from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import M31, QM31
from . import npqm31
from .utils import UnivariatePoly, fold_mle_evals


def _as_u32(arr) -> jnp.ndarray:
    if isinstance(arr, jnp.ndarray) and arr.dtype == jnp.uint32:
        return arr
    return jnp.asarray(np.asarray(arr).astype(np.uint32))


@jax.jit
def _fold_first_variable(arr: jnp.ndarray, pv: jnp.ndarray) -> jnp.ndarray:
    """lhs + p * (rhs - lhs) over the hypercube halves (one fused kernel)."""
    mid = arr.shape[1] // 2
    lhs, rhs = arr[:, :mid], arr[:, mid:]
    return npqm31.add(npqm31.mul(pv, npqm31.sub(rhs, lhs)), lhs)


class Mle:
    """Secure-field MLE: evals uint32 [4, 2^n] on device."""

    def __init__(self, evals: Union[jnp.ndarray, np.ndarray, Sequence[QM31]]):
        if isinstance(evals, (jnp.ndarray, np.ndarray)):
            self.evals = _as_u32(evals)
        else:
            self.evals = npqm31.from_qm31_list(list(evals))
        n = self.evals.shape[1]
        if n == 0 or (n & (n - 1)):
            raise ValueError("number of evaluations must be a power of two")

    def n_variables(self) -> int:
        return int(self.evals.shape[1]).bit_length() - 1

    def __len__(self) -> int:
        return int(self.evals.shape[1])

    def at(self, i: int) -> QM31:
        if not 0 <= i < len(self):
            raise IndexError(f"index {i} out of bounds for {len(self)} evals")
        col = np.asarray(self.evals[:, i])
        return QM31.from_ints([int(v) for v in col])

    def into_evals(self) -> List[QM31]:
        return npqm31.to_qm31_list(self.evals)

    def eval_at_point(self, point: Sequence[QM31]) -> QM31:
        """Fold halves by eq(0,p)/eq(1,p) weights (reference mle.ts:81-113).

        point[0] corresponds to the most significant hypercube variable.
        """
        if len(point) != self.n_variables():
            raise ValueError(
                f"point has {len(point)} coordinates, MLE has "
                f"{self.n_variables()} variables")
        arr = self.evals
        for p in point:
            arr = _fold_first_variable(arr, npqm31.scalar(p))
        a = np.asarray(arr)
        return QM31.from_ints([int(a[c, 0]) for c in range(4)])

    def fix_first_variable(self, assignment: QM31) -> "Mle":
        return Mle(_fold_first_variable(self.evals,
                                        npqm31.scalar(assignment)))


class BaseMle:
    """Base-field MLE: evals uint32 [2^n] on device."""

    def __init__(self, evals: Union[jnp.ndarray, np.ndarray, Sequence[M31]]):
        if isinstance(evals, (jnp.ndarray, np.ndarray)):
            self.evals = _as_u32(evals)
        else:
            self.evals = jnp.asarray(
                np.array([e.value for e in evals], dtype=np.uint32))
        n = len(self.evals)
        if n == 0 or (n & (n - 1)):
            raise ValueError("number of evaluations must be a power of two")

    def n_variables(self) -> int:
        return int(len(self.evals)).bit_length() - 1

    def __len__(self) -> int:
        return len(self.evals)

    def at(self, i: int) -> M31:
        return M31(int(self.evals[i]))

    def to_secure(self) -> Mle:
        z = jnp.zeros_like(self.evals)
        return Mle(jnp.stack([self.evals, z, z, z]))

    def fix_first_variable(self, assignment: QM31) -> Mle:
        return self.to_secure().fix_first_variable(assignment)


class SecureMle(Mle):
    """Mle that is also a MultivariatePolyOracle (reference mle.ts:149-200)."""

    def sum_as_poly_in_first_variable(self, claim: QM31) -> UnivariatePoly:
        half = self.evals.shape[1] // 2
        y0 = npqm31.sum_all(self.evals[:, :half])
        y1 = claim - y0
        return UnivariatePoly.interpolate_lagrange(
            [QM31.zero(), QM31.one()], [y0, y1])

    def fix_first_variable(self, assignment: QM31) -> "SecureMle":
        return SecureMle(super().fix_first_variable(assignment).evals)
