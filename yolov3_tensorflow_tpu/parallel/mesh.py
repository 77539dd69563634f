"""Device mesh construction helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_data_mesh(num_devices: Optional[int] = None,
                   axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}")
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def batch_sharded(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, PartitionSpec(axis_name))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """device_put a host batch with its leading dim split over the mesh."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
