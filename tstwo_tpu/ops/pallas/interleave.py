"""Pallas even/odd pair-split (deinterleave) on the minor axis.

The XLA lowerings of `x[..., 0::2]` -- a strided lane gather, or the
[..., 128, 2] mini-transpose used by ops/fri_ops._deinterleave -- cost
~16-22 ms on a [4, 2^22] uint32 column on TPU v5e (measured round 4),
~100x the HBM bound, because both relayout across the 128-lane axis
element by element.

This kernel routes the pair bit through the sublane axis, where stride-2
selection is a cheap leading-axis reshape:

    v[br, 128] --T--> w[128, br]             (transpose unit)
    w2 = w.reshape(64, 2, br)                (sublane split, free)
    e = w2[:, 0, :].T  -> [br, 64]           (evens of each input row)

Element bookkeeping: input element i = r*128 + l, so e[r, j] = v-element
r*128 + 2j = even-output element (r*128 + 2j)/2 = r*64 + j -- i.e. the
[br, 64] tile IS the standard row-major layout of the halved column when
the output array is declared [r, 64] (byte-identical to [r/2, 128]).
Declaring it that way avoids the [br, 64] -> [br/2, 128] lane reshape
Mosaic cannot lower; the caller reshapes the HBM array (free) afterwards.

One HBM read + one write, all shuffles in VMEM.  (The reference SIMD
backend solves the same problem with AVX interleave intrinsics,
backend/simd/m31.ts:72-105.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _body(x_ref, e_ref, o_ref):
    v = x_ref[0]            # [br, 128]
    w = v.T                 # [128, br]
    w2 = w.reshape(64, 2, w.shape[-1])   # stride-2 via sublane split
    e_ref[0] = w2[:, 0, :].T             # [br, 64]
    o_ref[0] = w2[:, 1, :].T


@partial(jax.jit, static_argnames=("interpret",))
def _deinterleave_pallas_impl(x3, interpret: bool = False):
    lead, r, _ = x3.shape
    br = min(256, r & -r)
    out_shape = [jax.ShapeDtypeStruct((lead, r, 64), jnp.uint32)] * 2
    e, o = pl.pallas_call(
        _body,
        out_shape=out_shape,
        grid=(lead, r // br),
        in_specs=[pl.BlockSpec((1, br, 128), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, br, 64), lambda b, g: (b, g, 0),
                                memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(x3)
    return e, o


def deinterleave_pallas(x: jnp.ndarray, interpret: bool = False):
    """(x[..., 0::2], x[..., 1::2]) for uint32 x; requires n % 256 == 0."""
    n = x.shape[-1]
    lead = x.shape[:-1]
    x3 = x.reshape(-1, n // 128, 128)
    e, o = _deinterleave_pallas_impl(x3, interpret=interpret)
    return (e.reshape(*lead, n // 2), o.reshape(*lead, n // 2))
