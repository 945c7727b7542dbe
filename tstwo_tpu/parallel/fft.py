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
    """Butterfly along axis 0 of a [D, M_loc] block (the shard axis brought
    local by the transpose)."""
    d, m_loc = x.shape
    stride = 1 << layer
    v = x.reshape(d // (2 * stride), 2, stride, m_loc)
    t = twiddles[:, None, None]
    v0 = v[:, 0]
    v1 = v[:, 1]
    if not inverse:
        prod = m31.mul(v1, t)
        out = jnp.stack([m31.add(v0, prod), m31.sub(v0, prod)], axis=1)
    else:
        out = jnp.stack([m31.add(v0, v1), m31.mul(m31.sub(v0, v1), t)], axis=1)
    return out.reshape(d, m_loc)


def make_sharded_fft(mesh: Mesh, log_n: int, line_twiddles: Sequence,
                     circle_twiddles, inverse: bool = False,
                     axis_name: str = "chips"):
    """Build a jitted sharded (i)CFFT for size 2^log_n over `mesh`.

    Returns fn(values_sharded) -> values_sharded.  Forward maps natural
    coefficients -> bit-reversed evaluations; inverse maps back (including
    the 1/N scale).
    """
    d = mesh.devices.size
    k = d.bit_length() - 1
    if (1 << k) != d:
        raise ValueError("mesh size must be a power of two")
    n = 1 << log_n
    m = n // d
    m_log = log_n - k
    if m_log < 1:
        raise ValueError("local size must be >= 2")
    # split twiddles: line layer l uses line_twiddles[l-1] (size n >> (l+1))
    high_tws = [line_twiddles[l - 1] for l in range(log_n - 1, m_log - 1, -1)]
    low_tws = [line_twiddles[l - 1] for l in range(1, m_log)]
    n_inv = jnp.asarray(
        jnp.uint32(pow(n, (1 << 31) - 3, (1 << 31) - 1)))

    def local_fn(x, circle_tw_loc, *low_tws_loc):
        if not inverse:
            x = x.reshape(d, m // d)
            x = jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
            for i, t in enumerate(high_tws):
                layer = (log_n - 1 - i) - m_log
                x = _axis_butterfly(x, layer, t, inverse=False)
            x = jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
            x = x.reshape(m)
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
            x = x.reshape(d, m // d)
            x = jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
            for i, t in enumerate(reversed(high_tws)):
                x = _axis_butterfly(x, i, t, inverse=True)
            x = jax.lax.all_to_all(x, axis_name, 0, 0, tiled=True)
            x = x.reshape(m)
            return m31.mul(x, n_inv)

    col_spec = P(axis_name)
    shard_fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(col_spec, col_spec) + tuple(col_spec for _ in low_tws),
        out_specs=col_spec,
    )

    def run(values):
        return shard_fn(values, circle_twiddles, *low_tws)

    return jax.jit(run)


def shard_column(values, mesh: Mesh, axis_name: str = "chips"):
    return jax.device_put(values, NamedSharding(mesh, P(axis_name)))
