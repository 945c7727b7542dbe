"""Sharded column operations via GSPMD.

The quotient accumulation, FRI folds and Merkle leaf hashing are
row-elementwise over the point axis, so sharding the inputs with
NamedSharding lets XLA partition the existing jitted kernels across the
mesh with no cross-chip traffic (folds halve locally; only the FFT needs
the explicit all-to-all in parallel/fft.py).
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_points(mesh: Mesh, arr: jnp.ndarray,
                 axis_name: str = "chips") -> jnp.ndarray:
    """Shard the last (point) axis of a column array."""
    spec = [None] * (arr.ndim - 1) + [axis_name]
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def sharded_accumulate_quotients(mesh: Mesh, domain, columns, random_coeff,
                                 sample_batches, log_blowup_factor):
    """Quotient accumulation with point-sharded inputs (pure local work)."""
    from ..pcs.quotients import accumulate_quotients

    cols = [shard_points(mesh, c) for c in columns]
    return accumulate_quotients(domain, cols, random_coeff, sample_batches,
                                log_blowup_factor)


def sharded_fold_line(mesh: Mesh, values, itwiddles, alpha):
    """FRI line fold on point-sharded values: pairs are adjacent, so each
    shard folds locally (output shard = half-size)."""
    from ..ops import fri_ops

    return fri_ops.fold_line(shard_points(mesh, values),
                             shard_points(mesh, itwiddles), alpha)


def sharded_merkle_leaf_layer(mesh: Mesh, columns: Sequence[jnp.ndarray],
                              log_size: int):
    """Leaf-layer Blake2s hashing with node-sharded columns."""
    from ..vcs.blake2s_merkle import commit_on_layer

    cols = [shard_points(mesh, c) for c in columns]
    return commit_on_layer(log_size, None, cols)
