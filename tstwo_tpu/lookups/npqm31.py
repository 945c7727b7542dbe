"""Vectorized QM31 arithmetic on numpy uint64 arrays (exact, host side).

Shape convention: [4, n] coordinate-major (same SoA layout as ops/qm31).
Used by the lookups layer (MLE / GKR) where per-round host control flow
dominates and compile latency would swamp device gains at test sizes; the
formulas are identical to ops/qm31 so a jnp backend can be swapped in.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..fields import QM31

P = np.uint64((1 << 31) - 1)


def from_qm31_list(vals: Sequence[QM31]) -> np.ndarray:
    return np.array([v.to_ints() for v in vals], dtype=np.uint64).T.reshape(4, -1)


def to_qm31_list(arr: np.ndarray) -> List[QM31]:
    return [QM31.from_ints([int(arr[c, i]) for c in range(4)])
            for i in range(arr.shape[1])]


def scalar(v: QM31, n: int = 1) -> np.ndarray:
    return np.array(v.to_ints(), dtype=np.uint64).reshape(4, 1).repeat(n, 1)


def add(x, y):
    return (x + y) % P


def sub(x, y):
    return (x + P - y) % P


def neg(x):
    return (P - x) % P


def _cmul(a_re, a_im, b_re, b_im):
    return ((a_re * b_re + (P * P - a_im * b_im)) % P,
            (a_re * b_im + a_im * b_re) % P)


def mul(x, y):
    a, b, c, d = x[0], x[1], x[2], x[3]
    e, f, g, h = y[0], y[1], y[2], y[3]
    # (ac) with R = 2 + i:  lo = x0*y0 + R * x1*y1 ; hi = x0*y1 + x1*y0
    ac_re, ac_im = _cmul(a, b, e, f)
    bd_re, bd_im = _cmul(c, d, g, h)
    # R * bd = (2+i)(u+vi) = (2u - v) + (u + 2v) i
    rbd_re = (2 * bd_re + P - bd_im) % P
    rbd_im = (bd_re + 2 * bd_im) % P
    lo_re = (ac_re + rbd_re) % P
    lo_im = (ac_im + rbd_im) % P
    ad_re, ad_im = _cmul(a, b, g, h)
    bc_re, bc_im = _cmul(c, d, e, f)
    hi_re = (ad_re + bc_re) % P
    hi_im = (ad_im + bc_im) % P
    return np.stack([lo_re, lo_im, hi_re, hi_im])


def mul_scalar(x, v: QM31):
    return mul(x, scalar(v, 1))


def sum_all(x) -> QM31:
    # exact: reduce with % after each chunk
    acc = np.zeros((4,), dtype=np.uint64)
    # sum in float-free chunks: each element < 2^31, up to 2^33 elements safe
    acc = x.sum(axis=1) % P
    return QM31.from_ints([int(v) for v in acc])


def double(x):
    return (2 * x) % P
