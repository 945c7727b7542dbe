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


def make_mesh2d(n_hosts: int, chips_per_host: int,
                axis_names: Sequence[str] = ("hosts", "chips")) -> Mesh:
    """2-D (host, chip) mesh (SURVEY.md §2.12): the leading axis crosses
    hosts (DCN on a real pod), the trailing axis stays within a host (ICI).

    Point axes shard over BOTH axes hosts-major, so the sharded CFFT's
    all-to-all over the combined axis keeps intra-host neighbors adjacent
    (the bulk of the transpose traffic rides ICI) and XLA lowers tree
    reductions (Merkle tops, decompose sums) hierarchically: chip-axis
    first, then one value per host over DCN."""
    devices = jax.devices()
    n = n_hosts * chips_per_host
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(n_hosts, chips_per_host)
    return Mesh(arr, tuple(axis_names))


def point_axes(mesh: Mesh):
    """All mesh axis names as one tuple: the spec entry for a point axis
    sharded across the entire mesh (hosts-major)."""
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def col_sharding(mesh: Mesh, axis_name: str = "chips",
                 leading_dims: int = 0) -> NamedSharding:
    """Shard a column's point axis (the last axis) across the mesh."""
    spec = PartitionSpec(*([None] * leading_dims), axis_name)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
