"""Vectorized CM31 = M31[i]/(i^2+1) arithmetic.

A CM31 array is a stacked uint32 array of shape (2, ...): axis 0 holds the
(real, imag) coordinates.  This SoA layout mirrors SecureColumnByCoords
(reference fields/secure_columns.ts:124) and keeps every lane op a pure M31
VPU op on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import m31


def pack(a, b):
    return jnp.stack([a, b])


def real(x):
    return x[0]


def imag(x):
    return x[1]


def add(x, y):
    return m31.add(x, y)


def sub(x, y):
    return m31.sub(x, y)


def neg(x):
    return m31.neg(x)


def mul(x, y):
    """Gauss 3-multiplication complex product: re = ac - bd,
    im = (a+b)(c+d) - ac - bd.  An m31 mul is ~28 VPU ops vs ~3 for an
    add, so trading the 4th multiplication for 3 extra adds is ~16%
    fewer ops (exact mod-P arithmetic, value-identical to schoolbook)."""
    a, b = x[0], x[1]
    c, d = y[0], y[1]
    m1 = m31.mul(a, c)
    m2 = m31.mul(b, d)
    m3 = m31.mul(m31.add(a, b), m31.add(c, d))
    return jnp.stack([
        m31.sub(m1, m2),
        m31.sub(m3, m31.add(m1, m2)),
    ])


def mul_m31(x, s):
    return jnp.stack([m31.mul(x[0], s), m31.mul(x[1], s)])


def square(x):
    return mul(x, x)


def conj(x):
    return jnp.stack([x[0], m31.neg(x[1])])


@jax.jit
def inv(x):
    # 1/(a+bi) = (a-bi)/(a^2+b^2)
    norm = m31.add(m31.mul(x[0], x[0]), m31.mul(x[1], x[1]))
    ninv = m31.inv(norm)
    return jnp.stack([m31.mul(x[0], ninv), m31.mul(m31.neg(x[1]), ninv)])


def from_m31(a):
    return jnp.stack([a, jnp.zeros_like(a)])
