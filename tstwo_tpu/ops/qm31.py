"""Vectorized QM31 = CM31[u]/(u^2 - (2+i)) arithmetic.

A QM31 array is a stacked uint32 array of shape (4, ...): axis 0 holds the
coordinates (c0.re, c0.im, c1.re, c1.im) -- the SecureColumnByCoords SoA
layout (reference fields/secure_columns.ts:124).  All formulas mirror
reference qm31.ts:300-305 / :396-406.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import cm31, m31


def pack(a, b, c, d):
    return jnp.stack([a, b, c, d])


def c0(x):
    return x[:2]


def c1(x):
    return x[2:]


def join(lo, hi):
    return jnp.concatenate([lo, hi], axis=0)


def add(x, y):
    return m31.add(x, y)


def sub(x, y):
    return m31.sub(x, y)


def neg(x):
    return m31.neg(x)


def _mul_by_r(x2):
    """Multiply a CM31 stack by R = 2 + i."""
    a, b = x2[0], x2[1]
    # (2+i)(a+bi) = (2a - b) + (a + 2b)i
    return jnp.stack([
        m31.sub(m31.double(a), b),
        m31.add(a, m31.double(b)),
    ])


@jax.jit
def mul(x, y):
    """Karatsuba over CM31: with m1 = ac, m2 = bd, m3 = (a+b)(c+d),
    lo = m1 + R*m2 and hi = m3 - m1 - m2.  Three CM31 products (each
    itself a 3-mul Gauss product) = 9 M31 multiplies total vs the
    schoolbook 16 — ~30% fewer VPU ops on the QM31-heavy paths
    (quotients, FRI folds, GKR towers).  Exact mod-P, value-identical."""
    a, b = x[:2], x[2:]
    c, d = y[:2], y[2:]
    m1 = cm31.mul(a, c)
    m2 = cm31.mul(b, d)
    m3 = cm31.mul(cm31.add(a, b), cm31.add(c, d))
    lo = cm31.add(m1, _mul_by_r(m2))
    hi = cm31.sub(m3, cm31.add(m1, m2))
    return jnp.concatenate([lo, hi], axis=0)


def mul_m31(x, s):
    return m31.mul(x, jnp.broadcast_to(s, x.shape))


def mul_cm31(x, s2):
    return jnp.concatenate([cm31.mul(x[:2], s2), cm31.mul(x[2:], s2)], axis=0)


def square(x):
    return mul(x, x)


@jax.jit
def inv(x):
    a, b = x[:2], x[2:]
    b2 = cm31.square(b)
    ib2 = jnp.stack([m31.neg(b2[1]), b2[0]])
    denom = cm31.sub(cm31.square(a), cm31.add(cm31.add(b2, b2), ib2))
    dinv = cm31.inv(denom)
    return jnp.concatenate([cm31.mul(a, dinv), cm31.mul(cm31.neg(b), dinv)], axis=0)


def conj(x):
    """Galois conjugation u -> -u: (c0, -c1) (see fields.QM31.complex_conjugate)."""
    return jnp.stack([x[0], x[1], m31.neg(x[2]), m31.neg(x[3])])


def from_m31(a):
    z = jnp.zeros_like(a)
    return jnp.stack([a, z, z, z])


def scalar(q, shape=()):
    """Broadcast a host QM31 (4 ints) to a stacked array of given trailing shape."""
    import numpy as np

    vals = np.asarray(q.to_ints() if hasattr(q, "to_ints") else q, dtype=np.uint32)
    out = jnp.asarray(vals.reshape(4, *([1] * len(shape))), dtype=jnp.uint32)
    return jnp.broadcast_to(out, (4, *shape)) if shape else out


def zeros(shape):
    return jnp.zeros((4, *shape), dtype=jnp.uint32)
