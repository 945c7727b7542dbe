"""Pallas kernels for M31 field arithmetic.

The modular multiply is the framework's roofline primitive (BASELINE.json
config #1): 4 16-bit limb products + shifts/adds per lane, all VPU ops on
(8, 128) uint32 tiles.  `mul_kernel` streams row tiles HBM->VMEM->HBM;
`mul_chain_kernel` keeps a tile resident and applies a dependent chain of
multiplies -- the compute-bound shape used to measure ops/s against
speed-of-light.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = (1 << 31) - 1



def _mul(a, b):
    """Exact M31 product via 16-bit limbs (same math as ops.m31.mul)."""
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


def _mul_body(a_ref, b_ref, o_ref):
    o_ref[...] = _mul(a_ref[...], b_ref[...])


@partial(jax.jit, static_argnames=("interpret",))
def mul(a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Elementwise modular multiply of [N] arrays, N % 1024 == 0."""
    n = a.shape[-1]
    rows = n // 128
    tile_rows = min(rows, 512)
    a2 = a.reshape(rows, 128)
    b2 = b.reshape(rows, 128)
    out = pl.pallas_call(
        _mul_body,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        grid=(rows // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a2, b2)
    return out.reshape(n)


def _mul_chain_body(a_ref, b_ref, o_ref, *, reps: int):
    x = a_ref[...]
    b = b_ref[...]
    for _ in range(reps):
        x = _mul(x, b)
    o_ref[...] = x


@partial(jax.jit, static_argnames=("reps", "interpret"))
def mul_chain(a: jnp.ndarray, b: jnp.ndarray, reps: int = 8,
              interpret: bool = False) -> jnp.ndarray:
    """reps dependent multiplies per element with one HBM round trip."""
    n = a.shape[-1]
    rows = n // 128
    tile_rows = min(rows, 512)
    out = pl.pallas_call(
        partial(_mul_chain_body, reps=reps),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        grid=(rows // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a.reshape(rows, 128), b.reshape(rows, 128))
    return out.reshape(n)
