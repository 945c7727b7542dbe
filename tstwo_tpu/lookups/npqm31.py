"""Vectorized QM31 arithmetic for the lookups layer — device (jnp) backed.

Shape convention: uint32 [4, n] coordinate-major, the same SoA layout as
ops/qm31 (which provides the exact limb-split modular kernels).  The MLE /
GKR round structure stays host-driven; every hypercube-sized array op here
runs on the device.  Composite per-round kernels are jitted at their call
sites (lookups/gkr.py, lookups/mle.py).

Kept under its historical name so the lookups modules did not churn when
the backend moved from host numpy (round 1) to device jnp (round 2).
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from ..fields import QM31
from ..ops import m31 as m31_ops
from ..ops import qm31 as qm31_ops

P = (1 << 31) - 1


def from_qm31_list(vals: Sequence[QM31]) -> jnp.ndarray:
    arr = np.array([v.to_ints() for v in vals], dtype=np.uint32)
    return jnp.asarray(arr.T.reshape(4, -1))


def to_qm31_list(arr) -> List[QM31]:
    a = np.asarray(arr)
    return [QM31.from_ints([int(a[c, i]) for c in range(4)])
            for i in range(a.shape[1])]


def scalar(v: QM31, n: int = 1) -> jnp.ndarray:
    a = np.array(v.to_ints(), dtype=np.uint32).reshape(4, 1)
    return jnp.asarray(np.repeat(a, n, axis=1))


def add(x, y):
    return qm31_ops.add(x, y)


def sub(x, y):
    return qm31_ops.sub(x, y)


def neg(x):
    return m31_ops.neg(x)


def mul(x, y):
    return qm31_ops.mul(x, y)


def mul_scalar(x, v: QM31):
    return qm31_ops.mul(x, scalar(v, 1))


def double(x):
    return m31_ops.add(x, x)


def sum_all_arr(x) -> jnp.ndarray:
    """Modular sum over the point axis -> [4] (device; log-depth fold)."""
    while x.shape[1] > 1:
        half = x.shape[1] // 2
        rem = x[:, 2 * half:]
        x = m31_ops.add(x[:, :half], x[:, half:2 * half])
        if rem.shape[1]:
            x = jnp.concatenate(
                [m31_ops.add(x[:, :rem.shape[1]], rem),
                 x[:, rem.shape[1]:]], axis=1)
    return x[:, 0]


def sum_all(x) -> QM31:
    return QM31.from_ints([int(v) for v in np.asarray(sum_all_arr(x))])
