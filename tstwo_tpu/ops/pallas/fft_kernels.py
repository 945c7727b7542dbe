"""Pallas fused circle-FFT kernel: the whole transform in one VMEM
residency.

The XLA path executes one butterfly layer per fused elementwise kernel --
2*log2(N) HBM passes.  For columns that fit VMEM (N <= 2^20: 4MB values +
~4MB twiddles) this kernel loads everything once and applies every layer
(line layers high->low, then the circle layer) before writing back: 1 read
+ 1 write of HBM total, a ~log2(N)x bandwidth reduction on the commit-path
hot loop (HOT LOOP #2 in SURVEY.md).

Butterflies are the same reshape+broadcast formulation as ops.fft; Mosaic
lowers the stride-2^l regroupings to sublane/lane shuffles inside VMEM.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = (1 << 31) - 1



def _mul(a, b):
    _P32 = jnp.uint32(P)
    _MASK16 = jnp.uint32(0xFFFF)
    _MASK15 = jnp.uint32(0x7FFF)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl
    mid = al * bh + ah * bl
    hh = ah * bh
    t_mid = (mid >> 15) + ((mid & _MASK15) << 16)
    t_hh = hh << 1
    t_ll = (ll >> 31) + (ll & _P32)

    def red(x):
        y = (x >> 31) + (x & _P32)
        return jnp.where(y >= _P32, y - _P32, y)

    return red(red(t_hh + t_ll) + t_mid)


def _add(a, b):
    _P32 = jnp.uint32(P)
    s = a + b
    return jnp.where(s >= _P32, s - _P32, s)


def _sub(a, b):
    _P32 = jnp.uint32(P)
    s = a + _P32 - b
    return jnp.where(s >= _P32, s - _P32, s)


def _layer(v, layer, t, inverse):
    n = v.shape[-1]
    stride = 1 << layer
    x = v.reshape(n // (2 * stride), 2, stride)
    tb = t.reshape(-1, 1)
    v0 = x[:, 0, :]
    v1 = x[:, 1, :]
    if not inverse:
        prod = _mul(v1, tb)
        out = jnp.stack([_add(v0, prod), _sub(v0, prod)], axis=1)
    else:
        out = jnp.stack([_add(v0, v1), _mul(_sub(v0, v1), tb)], axis=1)
    return out.reshape(n)


@partial(jax.jit, static_argnames=("n_log", "inverse", "interpret"))
def fft_fused(values: jnp.ndarray, line_twiddles: Sequence[jnp.ndarray],
              circle_twiddles: jnp.ndarray, n_log: int,
              inverse: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Whole-CFFT kernel for 2^n_log values resident in VMEM (n_log <= 20)."""
    n = 1 << n_log
    if values.shape[-1] != n:
        raise ValueError("size mismatch")
    rows = max(1, n // 128)
    cols = min(n, 128)
    # pad twiddle arrays to at least one lane row for clean VMEM tiling
    def shape2d(a):
        m = a.shape[-1]
        if m >= 128:
            return a.reshape(m // 128, 128)
        return jnp.pad(a, (0, 128 - m)).reshape(1, 128)

    tw2d = [shape2d(t) for t in line_twiddles]
    circ2d = shape2d(circle_twiddles)
    n_inv = pow(n, P - 2, P)

    def body(vals_ref, circle_ref, *rest):
        tw_refs = rest[:-1]
        out_ref = rest[-1]
        v = vals_ref[...].reshape(-1)
        line = []
        for i, r in enumerate(tw_refs):
            m = line_twiddles[i].shape[-1]
            line.append(r[...].reshape(-1)[:m])
        circ = circle_ref[...].reshape(-1)[: circle_twiddles.shape[-1]]
        if not inverse:
            for l in range(n_log - 1, 0, -1):
                v = _layer(v, l, line[l - 1], False)
            v = _layer(v, 0, circ, False)
        else:
            v = _layer(v, 0, circ, True)
            for l in range(1, n_log):
                v = _layer(v, l, line[l - 1], True)
            v = _mul(v, jnp.uint32(n_inv))
        out_ref[...] = v.reshape(out_ref.shape)

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + len(tw2d)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values.reshape(rows, cols), circ2d, *tw2d)
    return out.reshape(n)
