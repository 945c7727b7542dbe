"""Sharded circle FFT over a device mesh.

Factorization (the distributed form of the reference's cached-FFT split,
backend/simd/fft/rfft.ts:47-66 / transposeVecs at simd/fft/index.ts:39-66):

  natural-order coefficients [N] viewed as [D, M] (D shards, M = N/D local):
    all_to_all transpose  ->  high k=log2(D) line layers local on the shard
    axis  ->  all_to_all back  ->  low line layers + circle layer local.

Twiddles: high-layer arrays (size < D) replicated; low-layer arrays sharded
on the point axis (each device's slice is exactly its butterfly block).
Output is the standard bit-reversed evaluation order, sharded on the
bit-reversed index axis.

Columns support leading batch axes (replicated): pass leading_dims > 0 and
arrays shaped [..., N]; the transform runs on the last axis of every row.
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import m31
from ..ops.fft import _butterfly_layer


def _axis_butterfly(x: jnp.ndarray, layer: int, twiddles: jnp.ndarray,
                    inverse: bool) -> jnp.ndarray:
    """Butterfly along the second-to-last axis of a [..., D, M_loc] block
    (the shard axis brought local by the transpose)."""
    *lead, d, m_loc = x.shape
    stride = 1 << layer
    v = x.reshape(*lead, d // (2 * stride), 2, stride, m_loc)
    t = twiddles[:, None, None]
    v0 = v[..., 0, :, :]
    v1 = v[..., 1, :, :]
    if not inverse:
        prod = m31.mul(v1, t)
        out = jnp.stack([m31.add(v0, prod), m31.sub(v0, prod)], axis=-3)
    else:
        out = jnp.stack([m31.add(v0, v1), m31.mul(m31.sub(v0, v1), t)],
                        axis=-3)
    return out.reshape(*lead, d, m_loc)


def make_sharded_fft(mesh: Mesh, log_n: int, line_twiddles: Sequence,
                     circle_twiddles, inverse: bool = False,
                     axis_name=None, leading_dims: int = 0,
                     jit: bool = True):
    """Build a jitted sharded (i)CFFT for size 2^log_n over `mesh`.

    Returns fn(values_sharded) -> values_sharded.  Forward maps natural
    coefficients -> bit-reversed evaluations; inverse maps back (including
    the 1/N scale).  `leading_dims` replicated batch axes may precede the
    point axis.
    """
    from .mesh import point_axes

    if axis_name is None:
        axis_name = point_axes(mesh)
    d = mesh.devices.size
    k = d.bit_length() - 1
    if (1 << k) != d:
        raise ValueError("mesh size must be a power of two")
    n = 1 << log_n
    m = n // d
    m_log = log_n - k
    if m_log < max(1, k):
        raise ValueError(
            f"local size 2^{m_log} must be >= mesh size {d} for the "
            f"all-to-all transpose (need log_n >= 2*log2(devices))")
    # split twiddles: line layer l uses line_twiddles[l-1] (size n >> (l+1))
    high_tws = [line_twiddles[l - 1] for l in range(log_n - 1, m_log - 1, -1)]
    low_tws = [line_twiddles[l - 1] for l in range(1, m_log)]
    n_inv = jnp.asarray(
        jnp.uint32(pow(n, (1 << 31) - 3, (1 << 31) - 1)))
    tr_axis = leading_dims  # position of the shard axis after the reshape

    def local_fn(x, circle_tw_loc, *low_tws_loc):
        lead = x.shape[:-1]
        if not inverse:
            x = x.reshape(*lead, d, m // d)
            x = jax.lax.all_to_all(x, axis_name, tr_axis, tr_axis, tiled=True)
            for i, t in enumerate(high_tws):
                layer = (log_n - 1 - i) - m_log
                x = _axis_butterfly(x, layer, t, inverse=False)
            x = jax.lax.all_to_all(x, axis_name, tr_axis, tr_axis, tiled=True)
            x = x.reshape(*lead, m)
            for l in range(m_log - 1, 0, -1):
                x = _butterfly_layer(x, l, low_tws_loc[l - 1], inverse=False)
            x = _butterfly_layer(x, 0, circle_tw_loc, inverse=False)
            return x
        else:
            # mirror of the forward pass: local inverse layers ascending,
            # then the transposed high layers, then 1/N
            x = _butterfly_layer(x, 0, circle_tw_loc, inverse=True)
            for l in range(1, m_log):
                x = _butterfly_layer(x, l, low_tws_loc[l - 1], inverse=True)
            x = x.reshape(*lead, d, m // d)
            x = jax.lax.all_to_all(x, axis_name, tr_axis, tr_axis, tiled=True)
            for i, t in enumerate(reversed(high_tws)):
                x = _axis_butterfly(x, i, t, inverse=True)
            x = jax.lax.all_to_all(x, axis_name, tr_axis, tr_axis, tiled=True)
            x = x.reshape(*lead, m)
            return m31.mul(x, n_inv)

    col_spec = P(*([None] * leading_dims), axis_name)
    tw_spec = P(axis_name)
    shard_fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(col_spec, tw_spec) + tuple(tw_spec for _ in low_tws),
        out_specs=col_spec,
    )

    def run(values):
        return shard_fn(values, circle_twiddles, *low_tws)

    return jax.jit(run) if jit else run


def shard_column(values, mesh: Mesh, axis_name=None):
    from .mesh import point_axes

    if axis_name is None:
        axis_name = point_axes(mesh)
    spec = [None] * (values.ndim - 1) + [axis_name]
    return jax.device_put(values, NamedSharding(mesh, P(*spec)))


# ---------------------------------------------------------------------------
# Production-path sharded poly ops (used by CommitmentSchemeProver(mesh=...))
# ---------------------------------------------------------------------------

_SHARDED_FFT_CACHE: dict = {}


def _mesh_key(mesh: Mesh):
    return (tuple(mesh.axis_names), mesh.devices.shape,
            tuple(d.id for d in mesh.devices.flat))


def _get_sharded_fft(mesh: Mesh, log_n: int, tree, inverse: bool,
                     leading_dims: int, axis_name):
    from ..poly.twiddles import circle_layer_twiddles, domain_line_twiddles

    key = (_mesh_key(mesh), log_n, inverse, leading_dims, axis_name)
    fn = _SHARDED_FFT_CACHE.get(key)
    if fn is None:
        line = domain_line_twiddles(log_n, tree, inverse=inverse)
        circ = circle_layer_twiddles(line[0])
        fn = make_sharded_fft(mesh, log_n, line, circ, inverse=inverse,
                              axis_name=axis_name, leading_dims=leading_dims)
        _SHARDED_FFT_CACHE[key] = fn
    return fn


def sharded_fft_applicable(mesh: Mesh, log_n: int) -> bool:
    d = mesh.devices.size
    k = d.bit_length() - 1
    return (1 << k) == d and log_n - k >= max(1, k)


def evaluate_values_sharded(coeffs, domain, tree, mesh: Mesh,
                            axis_name=None):
    """CFFT-evaluate point-sharded coefficient array(s) on `domain` via the
    explicit all-to-all factorization; falls back to the single-device
    kernel on sharded inputs (GSPMD partitioning) when the domain is too
    small for the transpose split.  Bit-identical to
    poly.circle_poly.evaluate_values (exact integer math; partitioning
    cannot change results)."""
    from ..poly.circle_poly import evaluate_values

    log = domain.log_size()
    n = domain.size()
    if coeffs.shape[-1] < n:
        pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, n - coeffs.shape[-1])]
        coeffs = jnp.pad(coeffs, pad)
    from .mesh import point_axes

    if axis_name is None:
        axis_name = point_axes(mesh)
    coeffs = shard_column(coeffs, mesh, axis_name)
    if not sharded_fft_applicable(mesh, log) or log < 3:
        return evaluate_values(coeffs, domain, tree)
    fn = _get_sharded_fft(mesh, log, tree, False, coeffs.ndim - 1,
                          axis_name if isinstance(axis_name, str)
                          else tuple(axis_name))
    return fn(coeffs)


def interpolate_values_sharded(values, domain, tree, mesh: Mesh,
                               axis_name=None):
    """Inverse CFFT (including 1/N) on point-sharded evaluations."""
    from ..poly.circle_poly import interpolate_values

    log = domain.log_size()
    from .mesh import point_axes

    if axis_name is None:
        axis_name = point_axes(mesh)
    values = shard_column(values, mesh, axis_name)
    if not sharded_fft_applicable(mesh, log) or log < 3:
        return interpolate_values(values, domain, tree)
    fn = _get_sharded_fft(mesh, log, tree, True, values.ndim - 1,
                          axis_name if isinstance(axis_name, str)
                          else tuple(axis_name))
    return fn(values)
