"""Circle FFT (CFFT) on device arrays.

The transform maps circle-polynomial coefficients (natural order, in the
basis {1,y} x {1,x} x {1,pi(x)} x ...) to evaluations on a CircleDomain in
bit-reversed order, via log2(N)-1 line-twiddle butterfly layers plus one
circle-twiddle layer (reference backend/cpu/circle.ts:84-207, fft.ts:12-30).

Data layout: values are uint32 arrays whose LAST axis is the point axis; any
leading axes (e.g. the 4 QM31 coordinates, or a batch of columns) broadcast
through, since every butterfly multiplies by a base-field twiddle.

Each layer is expressed as a reshape + broadcast multiply, which XLA fuses
into a handful of elementwise kernels; the Pallas path (ops/pallas) fuses
multiple layers per HBM round-trip.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp

from . import m31
from ..utils import bit_reverse_permutation


def bit_reverse(values: jnp.ndarray, log_size: int) -> jnp.ndarray:
    """Permute the last axis into bit-reversed order.

    Implemented as two half-width gathers around a transpose (XLA lowers this
    to an efficient tiled transpose rather than a full gather), using
    bitrev(hi||lo) = bitrev(lo)||bitrev(hi).
    """
    n = 1 << log_size
    if values.shape[-1] != n:
        raise ValueError("size mismatch")
    if log_size <= 1:
        return values
    a = log_size // 2
    b = log_size - a
    pa = jnp.asarray(bit_reverse_permutation(a))
    pb = jnp.asarray(bit_reverse_permutation(b))
    lead = values.shape[:-1]
    # both gathers run on the second-to-last (row) axis around one
    # transpose -- row-granular data movement only, no lane gathers
    v = values.reshape(*lead, 1 << a, 1 << b)
    v = jnp.take(v, pa, axis=-2)
    v = jnp.swapaxes(v, -1, -2)
    v = jnp.take(v, pb, axis=-2)
    return v.reshape(*lead, n)


def _butterfly_layer(values: jnp.ndarray, layer: int, twiddles: jnp.ndarray,
                     inverse: bool) -> jnp.ndarray:
    """Apply stride-2^layer (i)butterflies with per-block twiddles.

    Index layout (reference backend/cpu/circle.ts:243-257): element
    (h, j, l) = h*2^(layer+1) + j*2^layer + l pairs j=0 with j=1, twiddle
    depends on h only.
    """
    lead = values.shape[:-1]
    n = values.shape[-1]
    stride = 1 << layer
    v = values.reshape(*lead, n // (2 * stride), 2, stride)
    t = twiddles[:, None]  # broadcast over the low-bit axis
    v0 = v[..., 0, :]
    v1 = v[..., 1, :]
    if not inverse:
        prod = m31.mul(v1, t)
        out = jnp.stack([m31.add(v0, prod), m31.sub(v0, prod)], axis=-2)
    else:
        out = jnp.stack(
            [m31.add(v0, v1), m31.mul(m31.sub(v0, v1), t)], axis=-2)
    return out.reshape(*lead, n)


LANE_LOG = 7  # 128-lane tiling for the matrix-view fast path


def _row_butterfly(v: jnp.ndarray, stride_rows: int, t: jnp.ndarray,
                   inverse: bool) -> jnp.ndarray:
    """Butterfly pairing rows r ^ stride_rows of v[Rows, Last].

    Row-axis regrouping keeps the 128-lane axis intact, so XLA/Mosaic fuse
    each layer into contiguous-block elementwise work (no per-layer
    relayouts).  t broadcasts as [groups, 1, 1] or [groups, 1, Last].
    """
    rows, last = v.shape
    x = v.reshape(rows // (2 * stride_rows), 2, stride_rows, last)
    v0 = x[:, 0]
    v1 = x[:, 1]
    if not inverse:
        prod = m31.mul(v1, t)
        out = jnp.stack([m31.add(v0, prod), m31.sub(v0, prod)], axis=1)
    else:
        out = jnp.stack([m31.add(v0, v1), m31.mul(m31.sub(v0, v1), t)],
                        axis=1)
    return out.reshape(rows, last)


def _prep_matrix_twiddles(line_twiddles, circle_twiddles, n_log: int):
    """Split twiddles into row-layer arrays and lane-layer transposed
    matrices T_l[c >> (l+1), r] for the matrix-view CFFT."""
    r = 1 << (n_log - LANE_LOG)
    high = [line_twiddles[l - 1].reshape(-1, 1, 1)
            for l in range(n_log - 1, LANE_LOG - 1, -1)]
    lows = [line_twiddles[l - 1].reshape(r, 1 << (LANE_LOG - 1 - l)).T
            .reshape(-1, 1, r)
            for l in range(LANE_LOG - 1, 0, -1)]
    circ_t = circle_twiddles.reshape(r, 1 << (LANE_LOG - 1)).T \
        .reshape(-1, 1, r)
    return high, lows, circ_t


def _fft_matrix(values, line_twiddles, circle_twiddles, n_log, inverse):
    """Matrix-view CFFT: row layers, one transpose, lane layers as row
    layers on the transposed view, transpose back.  Two real transposes
    total instead of log2(N) strided relayouts."""
    high, lows, circ_t = _prep_matrix_twiddles(line_twiddles,
                                               circle_twiddles, n_log)
    r = 1 << (n_log - LANE_LOG)
    v = values.reshape(r, 128)
    if not inverse:
        for i, t in enumerate(high):
            l = n_log - 1 - i
            v = _row_butterfly(v, 1 << (l - LANE_LOG), t, False)
        w = v.T
        for i, t in enumerate(lows):
            l = LANE_LOG - 1 - i
            w = _row_butterfly(w, 1 << l, t, False)
        w = _row_butterfly(w, 1, circ_t, False)
        return w.T.reshape(1 << n_log)
    else:
        w = v.T
        w = _row_butterfly(w, 1, circ_t, True)
        for i, t in enumerate(reversed(lows)):
            w = _row_butterfly(w, 1 << (i + 1), t, True)
        v = w.T
        for i, t in enumerate(reversed(high)):
            v = _row_butterfly(v, 1 << i, t, True)
        return v.reshape(1 << n_log)


def _fft_small(values, line_twiddles, circle_twiddles, inverse):
    n_log = len(line_twiddles) + 1
    if not inverse:
        for l in range(n_log - 1, 0, -1):
            values = _butterfly_layer(values, l, line_twiddles[l - 1],
                                      inverse=False)
        return _butterfly_layer(values, 0, circle_twiddles, inverse=False)
    values = _butterfly_layer(values, 0, circle_twiddles, inverse=True)
    for l in range(1, n_log):
        values = _butterfly_layer(values, l, line_twiddles[l - 1],
                                  inverse=True)
    return values


# Pallas dispatch window (measured on TPU v5e, scripts/measure_fft_large.py;
# see PERF.md): the two-stage blocked kernel with the native batch grid axis
# beats the per-layer XLA path for 1-D and stacked columns >= 2^20 total.
PALLAS_MIN_LOG = 20
_FFT_KERNEL_ENV = "TSTWO_FFT_KERNEL"  # auto (default) | jnp | pallas


def _use_pallas(n_log: int, total_log2_hint: int) -> bool:
    """total_log2_hint: log2 of total elements (batch * n)."""
    import os

    mode = os.environ.get(_FFT_KERNEL_ENV, "auto")
    if mode == "jnp":
        return False
    min_log = PALLAS_MIN_LOG if mode != "pallas" else 15
    if n_log < 15 or total_log2_hint < min_log:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon") or mode == "pallas"


@partial(jax.jit, static_argnames=("n_log", "inverse"))
def _fft_dispatch_jnp(values, line_twiddles, circle_twiddles, n_log: int,
                      inverse: bool):
    if n_log > LANE_LOG + 1:
        if values.ndim == 1:
            return _fft_matrix(values, line_twiddles, circle_twiddles,
                               n_log, inverse=inverse)
        lead = values.shape[:-1]
        flat = values.reshape(-1, values.shape[-1])
        out = jax.vmap(
            lambda v: _fft_matrix(v, line_twiddles, circle_twiddles, n_log,
                                  inverse=inverse))(flat)
        return out.reshape(*lead, values.shape[-1])
    return _fft_small(values, line_twiddles, circle_twiddles, inverse=inverse)


def _batch_log2(values) -> int:
    total = 1
    for d in values.shape:
        total *= int(d)
    return int(total - 1).bit_length()


def fft_natural_to_bitrev(values: jnp.ndarray,
                          line_twiddles: Sequence[jnp.ndarray],
                          circle_twiddles: jnp.ndarray) -> jnp.ndarray:
    """Forward CFFT: coefficients (natural) -> evaluations (bit-reversed).

    (reference backend/cpu/circle.ts:115-121 layer order; two-stage blocked
    Pallas kernel with native batch grid for large columns on TPU,
    matrix-view fast path for other large shapes, generic layered path
    otherwise.)  Eager dispatcher: the Pallas path caches its prepared
    twiddle layouts per TwiddleTree across calls.
    """
    n_log = len(line_twiddles) + 1
    if _use_pallas(n_log, _batch_log2(values)):
        from .pallas.fft_kernels import fft_large

        return fft_large(values, tuple(line_twiddles), circle_twiddles,
                         n_log, chunk_log=min(16, n_log - 1))
    return _fft_dispatch_jnp(values, tuple(line_twiddles), circle_twiddles,
                             n_log, False)


def ifft_bitrev_to_natural(values: jnp.ndarray,
                           line_itwiddles: Sequence[jnp.ndarray],
                           circle_itwiddles: jnp.ndarray) -> jnp.ndarray:
    """Inverse CFFT without the final 1/N scaling.

    (reference backend/cpu/circle.ts:186-199)
    """
    n_log = len(line_itwiddles) + 1
    if _use_pallas(n_log, _batch_log2(values)):
        from .pallas.fft_kernels import fft_large

        return fft_large(values, tuple(line_itwiddles), circle_itwiddles,
                         n_log, chunk_log=min(16, n_log - 1), inverse=True,
                         scale_n_inv=False)
    return _fft_dispatch_jnp(values, tuple(line_itwiddles), circle_itwiddles,
                             n_log, True)


def fold(values: jnp.ndarray, factors, mul_fn, add_fn) -> jnp.ndarray:
    """Horner-like hierarchical fold (reference poly/utils.ts:36-59).

    values last axis has length 2^len(factors); factors are applied from the
    innermost (adjacent pairs) to the outermost, i.e. pass factors in
    [innermost, ..., outermost] order.
    """
    from .fri_ops import _deinterleave

    for f in factors:
        v0, v1 = _deinterleave(values)
        values = add_fn(v0, mul_fn(v1, f))
    return values[..., 0]
