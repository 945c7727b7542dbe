"""Pallas fused circle-FFT kernels.

The XLA path executes one butterfly layer per fused elementwise kernel --
~2*log2(N) HBM passes.  These kernels load values + twiddles once per grid
pass and apply many layers per HBM round-trip.

Mosaic cannot relayout across the 128-lane axis, so the kernels work on
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

Two entry points:
  * fft_fused  -- whole transform in one VMEM residency (n_log <= ~16).
  * fft_large  -- two grid passes (high-stride layers / in-chunk layers),
    with a NATIVE batch grid axis (a stacked [B, N] sweep runs as a B-wide
    grid dimension -- vmap-over-pallas serializes, measured 0.55x XLA in
    round 2) and host-cached twiddle layouts (`prepare_layouts`), so the
    per-call cost is exactly 2 read+write passes over the data plus ~N
    twiddle-words of reads.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = (1 << 31) - 1
LANE_LOG = 7  # 128 lanes


def _mul(a, b):
    """Single-partial-reduction M31 product (same regrouping + overflow
    proof as ops/m31.mul: u <= 2^31-2, folded v <= 2^31, u+v < 2^32)."""
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
    u = hh + hh + (mid >> 15)
    v = (ll & _P32) + ((mid & _MASK15) << 16) + (ll >> 31)
    v = (v >> 31) + (v & _P32)
    y = u + v  # < 2^32 exactly (coupled bound)
    y = (y >> 31) + (y & _P32)
    return jnp.where(y >= _P32, y - _P32, y)


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


# ---------------------------------------------------------------------------
# Two-stage blocked CFFT for columns too large for one VMEM residency.
#
# View the column as V[n1, r2, 128] (natural index i = r1*n2 + j*128 + c,
# n2 = r2*128).  Layers with stride >= n2 pair elements at the same (j, c)
# across r1 -- their twiddle index i >> (l+1) depends only on r1, so stage 1
# runs a grid over j: each program holds one [n1, 8, 128] strip in VMEM and
# applies ALL high layers.  The remaining layers live inside one row r1:
# stage 2 runs a grid over r1, each program holding one [r2, 128] chunk and
# applying the in-chunk layers exactly like fft_fused (row layers, one
# transpose, lane layers, circle layer).  Total HBM traffic: 2 read+write
# passes instead of ~log2(N) for the per-layer XLA path.
#
# This is the single-chip analogue of the reference SIMD backend's
# cached-FFT split (backend/simd/fft/rfft.ts:47-66): their transposeVecs
# boundary is our stage-1/stage-2 grid boundary.
# ---------------------------------------------------------------------------


def _pad8(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Zero-pad `axis` up to a multiple of 8 (sublane tile alignment)."""
    size = a.shape[axis]
    pad = (-size) % 8
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


class FftLayouts(NamedTuple):
    """Kernel-shaped twiddle tables for fft_large, host-precomputable.

    stage1:     per high layer (stride >= chunk): [G, 1, 1, 1] values.
    chunk_high: per in-chunk row layer: COMPACT [n1, pad8(G), 1] values --
                broadcast to the 128 lanes inside the kernel instead of
                materializing the x128 copy in HBM (at 2^24/chunk 2^16 the
                broadcast tables were ~67 MB of pure HBM traffic per call).
    chunk_low:  per in-chunk lane layer (on the transposed view):
                [n1, pad8(G), r2] transposed matrices (true twiddle data).
    circ:       [n1, 64, r2] circle-layer matrix, transposed view.
    """

    stage1: Tuple[jnp.ndarray, ...]
    chunk_high: Tuple[jnp.ndarray, ...]
    chunk_low: Tuple[jnp.ndarray, ...]
    circ: jnp.ndarray


def prepare_layouts(line_twiddles: Sequence[jnp.ndarray],
                    circle_twiddles: jnp.ndarray, n_log: int,
                    chunk_log: int) -> FftLayouts:
    n1 = 1 << (n_log - chunk_log)
    r2 = 1 << (chunk_log - LANE_LOG)
    stage1 = tuple(line_twiddles[l - 1].reshape(-1, 1, 1, 1)
                   for l in range(n_log - 1, chunk_log - 1, -1))
    chunk_high = tuple(
        _pad8(line_twiddles[l - 1].reshape(n1, -1, 1), 1)
        for l in range(chunk_log - 1, LANE_LOG - 1, -1))
    chunk_low = tuple(
        _pad8(line_twiddles[l - 1].reshape(n1, r2, 1 << (LANE_LOG - 1 - l))
              .transpose(0, 2, 1), 1)
        for l in range(LANE_LOG - 1, 0, -1))
    circ = (circle_twiddles.reshape(n1, r2, 1 << (LANE_LOG - 1))
            .transpose(0, 2, 1))
    return FftLayouts(stage1, chunk_high, chunk_low, circ)


# Host cache of prepared layouts keyed by twiddle-array identity (stable:
# TwiddleTree caches its layer arrays per coset).  The value keeps refs to
# the source arrays so their ids cannot be recycled.  Bounded LRU (ADVICE
# r3: unbounded entries pin device memory forever in a long-lived prover).
from collections import OrderedDict

_LAYOUT_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_LAYOUT_CACHE_MAX = 8


def cached_layouts(line_twiddles, circle_twiddles, n_log: int,
                   chunk_log: int) -> FftLayouts:
    if isinstance(circle_twiddles, jax.core.Tracer) or any(
            isinstance(t, jax.core.Tracer) for t in line_twiddles):
        return prepare_layouts(line_twiddles, circle_twiddles, n_log,
                               chunk_log)
    key = (tuple(id(t) for t in line_twiddles), id(circle_twiddles),
           n_log, chunk_log)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        _LAYOUT_CACHE.move_to_end(key)
    if hit is None:
        layouts = prepare_layouts(line_twiddles, circle_twiddles, n_log,
                                  chunk_log)
        if any(isinstance(a, jax.core.Tracer)
               for a in jax.tree_util.tree_leaves(layouts)):
            # concrete inputs but an ambient trace (an outer jit closed over
            # the twiddles): can't cache the traced layouts
            return layouts
        layouts = jax.tree_util.tree_map(
            lambda a: jax.device_put(a).block_until_ready(), layouts)
        hit = (layouts, (tuple(line_twiddles), circle_twiddles))
        _LAYOUT_CACHE[key] = hit
        while len(_LAYOUT_CACHE) > _LAYOUT_CACHE_MAX:
            _LAYOUT_CACHE.popitem(last=False)
    return hit[0]


class InvFftLayouts(NamedTuple):
    """u-space twiddle tables for the inverse kernel (see `_ifft_large_u`).

    stage1: per u-layer with stride >= chunk: [s1, r2, 128] (s1 = 2^(m-c)),
            varying along the low-U1 and in-chunk axes, broadcast over the
            pairing groups.
    rows:   per in-chunk row layer: [s2, 128] (s2 = 2^(m-7)), chunk-
            independent.
    lanes:  per lane layer (transposed view): [2^m, r2] pre-broadcast.
    """

    stage1: Tuple[jnp.ndarray, ...]
    rows: Tuple[jnp.ndarray, ...]
    lanes: Tuple[jnp.ndarray, ...]


def prepare_inv_layouts(line_itwiddles: Sequence[jnp.ndarray],
                        circle_itwiddles: jnp.ndarray, n_log: int,
                        chunk_log: int) -> InvFftLayouts:
    """Twiddle tables for the bit-reversed-index-space inverse kernel.

    The inverse DIT order applies element-stride-2^l ibutterflies for
    l = 0 (circle), 1, ..., n_log-1 -- INCREASING strides, which Mosaic
    compiles ~7x slower than decreasing chains (measured round 4).  Under
    the full bit-reverse permutation u = rev(r), layer l becomes u-stride
    2^(n_log-1-l) -- a DECREASING, forward-structured schedule -- and its
    twiddle index g = r >> (l+1) becomes rev_m(u mod 2^m): i.e. the table
    varies along the STRIDE axis (bit-reverse-permuted) and is constant
    across pairing groups.  The array is bit-reversed before and after the
    kernel with the cheap XLA gather-pair (ops/fft.bit_reverse, ~0.5 ms at
    2^24).
    """
    from ...utils import bit_reverse_permutation

    L = n_log
    r2 = 1 << (chunk_log - LANE_LOG)

    def table(l: int) -> jnp.ndarray:
        return circle_itwiddles if l == 0 else line_itwiddles[l - 1]

    stage1 = []
    rows = []
    lanes = []
    for l in range(L):
        m = L - 1 - l
        perm = bit_reverse_permutation(m)
        tp = jnp.take(table(l), jnp.asarray(perm), axis=0)
        if m >= chunk_log:
            stage1.append(tp.reshape(1 << (m - chunk_log), r2, 128))
        elif m >= LANE_LOG:
            rows.append(tp.reshape(1 << (m - LANE_LOG), 128))
        else:
            # pre-broadcast along the transposed view's lane axis (tiny)
            lanes.append(jnp.broadcast_to(tp[:, None], (1 << m, r2)))
    return InvFftLayouts(tuple(stage1), tuple(rows), tuple(lanes))


def _ibf(v0, v1, t):
    return _add(v0, v1), _mul(_sub(v0, v1), t)


@partial(jax.jit,
         static_argnames=("n_log", "chunk_log", "scale_n_inv", "interpret"))
def _ifft_large_u_impl(values3, layouts: InvFftLayouts, n_log: int,
                       chunk_log: int, scale_n_inv: bool, interpret: bool):
    """Inverse CFFT on bit-reversed-index data: values3 u32[B, n1, r2, 128]
    indexed by u = rev(r); returns the same layout (still u-indexed)."""
    b, n1, r2, _ = values3.shape
    n = 1 << n_log
    n_inv = pow(n, P - 2, P)
    s1_tabs = layouts.stage1
    row_tabs = layouts.rows
    lane_tabs = layouts.lanes
    n_s1 = len(s1_tabs)
    n_row = len(row_tabs)
    n_lane = len(lane_tabs)

    def stage1_body(vals_ref, *rest):
        t_refs = rest[:n_s1]
        out_ref = rest[-1]
        v = vals_ref[0]  # [n1, 8, 128]
        for tref in t_refs:  # u-strides n1/2 ... 1 on the leading axis
            s1 = tref.shape[0]
            g = n1 // (2 * s1)
            x = v.reshape(g, 2, s1, 8, 128)
            o0, o1 = _ibf(x[:, 0], x[:, 1], tref[...])
            v = jnp.concatenate([o0[:, None], o1[:, None]],
                                axis=1).reshape(n1, 8, 128)
        out_ref[0] = v

    def stage2_body(vals_ref, *rest):
        r_refs = rest[:n_row]
        l_refs = rest[n_row:n_row + n_lane]
        out_ref = rest[-1]
        v = vals_ref[0, 0]  # [r2, 128]
        for tref in r_refs:  # row layers, strides r2/2 ... 1
            s2 = tref.shape[0]
            g = r2 // (2 * s2)
            x = v.reshape(g, 2, s2, 128)
            o0, o1 = _ibf(x[:, 0], x[:, 1], tref[...])
            v = jnp.concatenate([o0[:, None], o1[:, None]],
                                axis=1).reshape(r2, 128)
        w = v.T  # [128, r2]
        for tref in l_refs:  # lane layers on the transposed view
            s = tref.shape[0]
            g = 128 // (2 * s)
            x = w.reshape(g, 2, s, r2)
            o0, o1 = _ibf(x[:, 0], x[:, 1], tref[...])
            w = jnp.concatenate([o0[:, None], o1[:, None]],
                                axis=1).reshape(128, r2)
        v = w.T
        if scale_n_inv:
            v = _mul(v, jnp.uint32(n_inv))
        out_ref[0, 0] = v

    def run_stage1(v3):
        return pl.pallas_call(
            stage1_body,
            out_shape=jax.ShapeDtypeStruct((b, n1, r2, 128), jnp.uint32),
            grid=(b, r2 // 8),
            in_specs=[pl.BlockSpec((1, n1, 8, 128),
                                   lambda bi, g: (bi, 0, g, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((t.shape[0], 8, 128), lambda bi, g: (0, g, 0),
                            memory_space=pltpu.VMEM) for t in s1_tabs],
            out_specs=pl.BlockSpec((1, n1, 8, 128),
                                   lambda bi, g: (bi, 0, g, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v3, *s1_tabs)

    def run_stage2(v3):
        tspecs = ([pl.BlockSpec(t.shape, lambda bi, r: (0, 0),
                                memory_space=pltpu.VMEM) for t in row_tabs]
                  + [pl.BlockSpec(t.shape, lambda bi, r: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for t in lane_tabs])
        return pl.pallas_call(
            stage2_body,
            out_shape=jax.ShapeDtypeStruct((b, n1, r2, 128), jnp.uint32),
            grid=(b, n1),
            in_specs=[pl.BlockSpec((1, 1, r2, 128),
                                   lambda bi, r: (bi, r, 0, 0),
                                   memory_space=pltpu.VMEM)] + tspecs,
            out_specs=pl.BlockSpec((1, 1, r2, 128),
                                   lambda bi, r: (bi, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v3, *row_tabs, *lane_tabs)

    # u-space schedule: stage1 (big u-strides, = element layers 0..) first
    v3 = run_stage1(values3)
    v3 = run_stage2(v3)
    return v3


def _stockham_istep(v, t_compact, copies):
    """One inverse (Stockham autosort) butterfly step on v[R, ...]:
    pair ADJACENT leading rows, write results to the two halves.

    Equivalent to the strided ibutterfly layer with stride 2^k when the
    rows carry the rotate-right-by-k permutation of the original index
    (each step rotates by one more; after log2(R) steps the rotation is
    the identity, so the final output is back in natural order).  The
    compact per-group twiddle table is tiled `copies` times along the
    leading axis in-register -- t'[h*G + l] = t[l].

    Why: Mosaic compiles INCREASING-stride butterfly chains ~7x slower
    than decreasing ones (measured 10.2 vs 1.5 ms for the same 9 layers
    at 2^24, round 4); the classic inverse DIT order is
    smallest-stride-first, so the naive inverse kernel hit exactly that.
    Stockham keeps every step stride-1.
    """
    r = v.shape[0]
    y = v.reshape(r // 2, 2, *v.shape[1:])
    v0 = y[:, 0]
    v1 = y[:, 1]
    if copies > 1:
        t = jnp.broadcast_to(t_compact[None],
                             (copies,) + t_compact.shape)
        t = t.reshape(copies * t_compact.shape[0], *t_compact.shape[1:])
    else:
        t = t_compact
    return jnp.concatenate([_add(v0, v1), _mul(_sub(v0, v1), t)], axis=0)


def _axis0_butterfly(v, stride, t, inverse):
    """Butterfly pairing leading-axis indices r ^ stride of v[R, 8, 128];
    t is [groups, 1, 1, 1]."""
    rows = v.shape[0]
    x = v.reshape(rows // (2 * stride), 2, stride, *v.shape[1:])
    v0 = x[:, 0]
    v1 = x[:, 1]
    if not inverse:
        prod = _mul(v1, t)
        out = jnp.stack([_add(v0, prod), _sub(v0, prod)], axis=1)
    else:
        out = jnp.stack([_add(v0, v1), _mul(_sub(v0, v1), t)], axis=1)
    return out.reshape(v.shape)


@partial(jax.jit,
         static_argnames=("n_log", "chunk_log", "inverse", "scale_n_inv",
                          "interpret"))
def _fft_large_impl(values3, layouts: FftLayouts, n_log: int, chunk_log: int,
                    inverse: bool, scale_n_inv: bool, interpret: bool):
    """values3: u32[B, n1, r2, 128]; returns the same shape."""
    b, n1, r2, _ = values3.shape
    n = 1 << n_log
    n_inv = pow(n, P - 2, P)
    stage1 = layouts.stage1
    chunk_high = layouts.chunk_high
    chunk_low = layouts.chunk_low
    circ = layouts.circ
    n_s1 = len(stage1)
    n_ch = len(chunk_high)
    n_cl = len(chunk_low)

    def stage1_body(vals_ref, *rest):
        t_refs = rest[:n_s1]
        out_ref = rest[-1]
        v = vals_ref[0]  # [n1, 8, 128]
        if not inverse:
            for i, tref in enumerate(t_refs):
                l = n_log - 1 - i
                v = _axis0_butterfly(v, 1 << (l - chunk_log), tref[...],
                                     False)
            out_ref[0] = v
        else:
            for i, tref in enumerate(reversed(t_refs)):
                v = _axis0_butterfly(v, 1 << i, tref[...], True)
            out_ref[0] = _mul(v, jnp.uint32(n_inv)) if scale_n_inv else v

    def stage2_body(vals_ref, circ_ref, *rest):
        ch_refs = rest[:n_ch]
        cl_refs = rest[n_ch:n_ch + n_cl]
        out_ref = rest[-1]
        v = vals_ref[0, 0]  # [r2, 128]

        def row_t(tref, g):
            # compact [gp, 1] block -> [g, 1, 128]: lane-broadcast here
            # (Mosaic supports lane-only broadcast), sublane-broadcast
            # happens implicitly in the butterfly multiply.  This keeps the
            # x128 twiddle inflation out of HBM entirely.
            t = tref[0][0:g].reshape(g, 1, 1)
            return jnp.broadcast_to(t, (g, 1, 128))

        if not inverse:
            for i, tref in enumerate(ch_refs):
                l = chunk_log - 1 - i
                g = 1 << (chunk_log - 1 - l)
                v = _row_butterfly(v, 1 << (l - LANE_LOG), row_t(tref, g),
                                   False)
            w = v.T  # [128, r2]
            for i, tref in enumerate(cl_refs):
                l = LANE_LOG - 1 - i
                g = 1 << (LANE_LOG - 1 - l)
                w = _row_butterfly(w, 1 << l,
                                   tref[0][0:g][:, None, :], False)
            w = _row_butterfly(w, 1, circ_ref[0][:, None, :], False)
            out_ref[0, 0] = w.T
        else:
            # Stockham steps (see _stockham_istep): every inverse layer is
            # a stride-1 pairing; after all steps of a section the row
            # rotation is the identity, so no reordering is needed.
            w = v.T  # [128, r2]
            w = _stockham_istep(w, circ_ref[0], 1)  # circle layer (k=0)
            for k in range(1, LANE_LOG):
                g = 1 << (LANE_LOG - 1 - k)
                w = _stockham_istep(w, cl_refs[LANE_LOG - 1 - k][0][0:g],
                                    1 << k)
            v = w.T  # [r2, 128]
            for k in range(n_ch):
                g = 1 << (chunk_log - 1 - (LANE_LOG + k))
                # compact [g, 1]: sublane-tile in the step, lane-broadcast
                # implicitly in the multiply (Mosaic cannot broadcast both
                # dims in one op)
                v = _stockham_istep(v, ch_refs[n_ch - 1 - k][0][0:g], 1 << k)
            out_ref[0, 0] = v

    def run_stage1(v3):
        return pl.pallas_call(
            stage1_body,
            out_shape=jax.ShapeDtypeStruct((b, n1, r2, 128), jnp.uint32),
            grid=(b, r2 // 8),
            in_specs=[pl.BlockSpec((1, n1, 8, 128),
                                   lambda bi, g: (bi, 0, g, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_s1,
            out_specs=pl.BlockSpec((1, n1, 8, 128),
                                   lambda bi, g: (bi, 0, g, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v3, *stage1)

    def run_stage2(v3):
        tspecs = (
            [pl.BlockSpec((1,) + circ.shape[1:], lambda bi, r: (r, 0, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((1,) + t.shape[1:], lambda bi, r: (r, 0, 0),
                            memory_space=pltpu.VMEM)
               for t in chunk_high + chunk_low]
        )
        return pl.pallas_call(
            stage2_body,
            out_shape=jax.ShapeDtypeStruct((b, n1, r2, 128), jnp.uint32),
            grid=(b, n1),
            in_specs=[pl.BlockSpec((1, 1, r2, 128),
                                   lambda bi, r: (bi, r, 0, 0),
                                   memory_space=pltpu.VMEM)] + tspecs,
            out_specs=pl.BlockSpec((1, 1, r2, 128),
                                   lambda bi, r: (bi, r, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(v3, circ, *chunk_high, *chunk_low)

    if not inverse:
        v3 = run_stage1(values3)
        v3 = run_stage2(v3)
    else:
        v3 = run_stage2(values3)
        v3 = run_stage1(v3)
    return v3


def cached_inv_layouts(line_itwiddles, circle_itwiddles, n_log: int,
                       chunk_log: int) -> InvFftLayouts:
    """id-keyed LRU of prepare_inv_layouts (same policy as cached_layouts)."""
    if isinstance(circle_itwiddles, jax.core.Tracer) or any(
            isinstance(t, jax.core.Tracer) for t in line_itwiddles):
        return prepare_inv_layouts(line_itwiddles, circle_itwiddles, n_log,
                                   chunk_log)
    key = ("inv", tuple(id(t) for t in line_itwiddles),
           id(circle_itwiddles), n_log, chunk_log)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        _LAYOUT_CACHE.move_to_end(key)
    if hit is None:
        layouts = prepare_inv_layouts(line_itwiddles, circle_itwiddles,
                                      n_log, chunk_log)
        if any(isinstance(a, jax.core.Tracer)
               for a in jax.tree_util.tree_leaves(layouts)):
            return layouts
        layouts = jax.tree_util.tree_map(
            lambda a: jax.device_put(a).block_until_ready(), layouts)
        hit = (layouts, (tuple(line_itwiddles), circle_itwiddles))
        _LAYOUT_CACHE[key] = hit
        while len(_LAYOUT_CACHE) > _LAYOUT_CACHE_MAX:
            _LAYOUT_CACHE.popitem(last=False)
    return hit[0]


def fft_large(values: jnp.ndarray, line_twiddles: Sequence[jnp.ndarray],
              circle_twiddles: jnp.ndarray, n_log: int,
              chunk_log: int = 16, inverse: bool = False,
              scale_n_inv: bool = True,
              interpret: bool = False) -> jnp.ndarray:
    """Whole CFFT in two grid passes for 2^n_log values, n_log > chunk_log.

    values: u32[..., 2^n_log]; leading axes run as a native batch grid
    dimension.  The inverse runs in bit-reversed index space (see
    prepare_inv_layouts: Mosaic compiles the increasing-stride inverse
    order ~7x slower, so the kernel is forward-structured under u=rev(r)
    with two cheap XLA bit-reverses around it) and includes the 1/N
    scaling unless scale_n_inv=False (drop-in for
    ops.fft.ifft_bitrev_to_natural, which leaves the scaling to the
    caller).  Requires chunk_log >= 14 (stage-2 twiddle tables need
    r2 = n2/128 to be a multiple of 128 lanes) and n_log > chunk_log.
    """
    from .. import fft as fft_mod

    n = 1 << n_log
    if values.shape[-1] != n:
        raise ValueError("size mismatch")
    if not (LANE_LOG + 7 <= chunk_log < n_log):
        raise ValueError("need 14 <= chunk_log < n_log")
    n1 = 1 << (n_log - chunk_log)
    r2 = 1 << (chunk_log - LANE_LOG)
    lead = values.shape[:-1]
    if inverse:
        inv_layouts = cached_inv_layouts(line_twiddles, circle_twiddles,
                                         n_log, chunk_log)
        u = fft_mod.bit_reverse(values, n_log)
        v3 = u.reshape(-1, n1, r2, 128)
        out = _ifft_large_u_impl(v3, inv_layouts, n_log, chunk_log,
                                 scale_n_inv, interpret)
        return fft_mod.bit_reverse(out.reshape(*lead, n), n_log)
    layouts = cached_layouts(line_twiddles, circle_twiddles, n_log,
                             chunk_log)
    v3 = values.reshape(-1, n1, r2, 128)
    out = _fft_large_impl(v3, layouts, n_log, chunk_log, inverse,
                          scale_n_inv, interpret)
    return out.reshape(*lead, n)
