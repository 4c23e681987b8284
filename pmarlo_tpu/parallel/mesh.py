"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replica_mesh(n_devices: Optional[int] = None, axis: str = "replica") -> Mesh:
    """1-D mesh over the replica axis (REMD sharding)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def data_mesh(
    n_devices: Optional[int] = None, axis: str = "shard"
) -> Mesh:
    """1-D mesh over the shard/data axis (estimation sharding)."""
    return replica_mesh(n_devices, axis=axis)


def shard_replicas(array: jax.Array, mesh: Mesh, axis: str = "replica") -> jax.Array:
    """Place an array with its leading axis split over the mesh."""
    spec = P(axis, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


__all__ = ["replica_mesh", "data_mesh", "shard_replicas"]
