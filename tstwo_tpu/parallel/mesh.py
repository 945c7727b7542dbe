"""Device mesh construction."""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "chips") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n]), (axis_name,))


def col_sharding(mesh: Mesh, axis_name: str = "chips",
                 leading_dims: int = 0) -> NamedSharding:
    """Shard a column's point axis (the last axis) across the mesh."""
    spec = PartitionSpec(*([None] * leading_dims), axis_name)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
