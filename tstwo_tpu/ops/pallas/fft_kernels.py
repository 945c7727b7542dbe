"""Pallas fused circle-FFT kernel: the whole transform in one VMEM
residency.

The XLA path executes one butterfly layer per fused elementwise kernel --
~2*log2(N) HBM passes.  This kernel loads values + twiddles once and
applies every layer before writing back.

Mosaic cannot relayout across the 128-lane axis, so the kernel works on
the matrix view V[R, 128] (natural index i = r*128 + c):

  * layers with stride >= 128 pair ROWS -- leading-axis reshapes only;
  * one 2-D transpose moves lanes to rows;
  * layers with stride < 128 (incl. the circle layer) then also pair rows
    on the transposed view W[c, r], with twiddle matrices
    T_l[c >> (l+1), r] = t_l[r * 2^(6-l) + (c >> (l+1))] pre-transposed on
    the host;
  * transpose back.

This mirrors the reference SIMD backend's vecwise/transpose split
(backend/simd/fft/rfft.ts:36-67, simd/fft/index.ts:39-66) mapped onto the
(8,128) vreg geometry.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = (1 << 31) - 1
LANE_LOG = 7  # 128 lanes


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


def _row_butterfly(v, stride_rows, t, inverse):
    """Butterfly pairing rows r ^ stride_rows of v[Rows, Last]; t broadcasts
    as [groups, 1, 1] or [groups, 1, Last]."""
    rows, last = v.shape
    x = v.reshape(rows // (2 * stride_rows), 2, stride_rows, last)
    v0 = x[:, 0]
    v1 = x[:, 1]
    if not inverse:
        prod = _mul(v1, t)
        out = jnp.stack([_add(v0, prod), _sub(v0, prod)], axis=1)
    else:
        out = jnp.stack([_add(v0, v1), _mul(_sub(v0, v1), t)], axis=1)
    return out.reshape(rows, last)


@partial(jax.jit, static_argnames=("n_log", "inverse", "interpret"))
def fft_fused(values: jnp.ndarray, line_twiddles: Sequence[jnp.ndarray],
              circle_twiddles: jnp.ndarray, n_log: int,
              inverse: bool = False, interpret: bool = False) -> jnp.ndarray:
    """Whole-CFFT kernel for 2^n_log values resident in VMEM.

    Requires n_log > 8 (smaller sizes: use the jnp path; they are cheap).
    """
    n = 1 << n_log
    if values.shape[-1] != n:
        raise ValueError("size mismatch")
    if n_log <= LANE_LOG + 1:
        raise ValueError("fft_fused requires n_log > 8")
    r = n >> LANE_LOG
    n_inv = pow(n, P - 2, P)

    # high layers l in [7, n_log): stride_rows = 2^(l-7); groups = n >> (l+1)
    high = [line_twiddles[l - 1].reshape(-1, 1, 1)
            for l in range(n_log - 1, LANE_LOG - 1, -1)]
    # low layers on the transposed view: l = 6..1
    lows = [line_twiddles[l - 1].reshape(r, 1 << (LANE_LOG - 1 - l)).T
            .reshape(-1, 1, r)
            for l in range(LANE_LOG - 1, 0, -1)]
    circ_t = circle_twiddles.reshape(r, 1 << (LANE_LOG - 1)).T \
        .reshape(-1, 1, r)

    n_high = len(high)
    n_low = len(lows)

    def body(vals_ref, circ_ref, *rest):
        high_refs = rest[:n_high]
        low_refs = rest[n_high: n_high + n_low]
        out_ref = rest[-1]
        v = vals_ref[...]
        if not inverse:
            for i, tref in enumerate(high_refs):
                l = n_log - 1 - i
                v = _row_butterfly(v, 1 << (l - LANE_LOG), tref[...], False)
            w = v.T  # [128, r]
            for i, tref in enumerate(low_refs):
                l = LANE_LOG - 1 - i
                w = _row_butterfly(w, 1 << l, tref[...], False)
            w = _row_butterfly(w, 1, circ_ref[...], False)
            out_ref[...] = w.T
        else:
            w = v.T
            w = _row_butterfly(w, 1, circ_ref[...], True)
            for i, tref in enumerate(reversed(low_refs)):
                w = _row_butterfly(w, 1 << (i + 1), tref[...], True)
            v = w.T
            for i, tref in enumerate(reversed(high_refs)):
                v = _row_butterfly(v, 1 << i, tref[...], True)
            out_ref[...] = _mul(v, jnp.uint32(n_inv))

    out = pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (2 + n_high + n_low),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(values.reshape(r, 128), circ_t, *high, *lows)
    return out.reshape(n)
