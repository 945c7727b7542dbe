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
    v = values.reshape(*lead, 1 << a, 1 << b)
    v = jnp.take(v, pa, axis=-2)
    v = jnp.take(v, pb, axis=-1)
    v = jnp.swapaxes(v, -1, -2)
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


@jax.jit
def fft_natural_to_bitrev(values: jnp.ndarray,
                          line_twiddles: Sequence[jnp.ndarray],
                          circle_twiddles: jnp.ndarray) -> jnp.ndarray:
    """Forward CFFT: coefficients (natural) -> evaluations (bit-reversed)."""
    n_log = len(line_twiddles) + 1
    # line layers high -> low (reference backend/cpu/circle.ts:115-118)
    for l in range(n_log - 1, 0, -1):
        values = _butterfly_layer(values, l, line_twiddles[l - 1], inverse=False)
    return _butterfly_layer(values, 0, circle_twiddles, inverse=False)


@jax.jit
def ifft_bitrev_to_natural(values: jnp.ndarray,
                           line_itwiddles: Sequence[jnp.ndarray],
                           circle_itwiddles: jnp.ndarray) -> jnp.ndarray:
    """Inverse CFFT without the final 1/N scaling.

    (reference backend/cpu/circle.ts:186-199)
    """
    n_log = len(line_itwiddles) + 1
    values = _butterfly_layer(values, 0, circle_itwiddles, inverse=True)
    for l in range(1, n_log):
        values = _butterfly_layer(values, l, line_itwiddles[l - 1], inverse=True)
    return values


def fold(values: jnp.ndarray, factors, mul_fn, add_fn) -> jnp.ndarray:
    """Horner-like hierarchical fold (reference poly/utils.ts:36-59).

    values last axis has length 2^len(factors); factors are applied from the
    innermost (adjacent pairs) to the outermost, i.e. pass factors in
    [innermost, ..., outermost] order.
    """
    for f in factors:
        values = add_fn(values[..., 0::2], mul_fn(values[..., 1::2], f))
    return values[..., 0]
