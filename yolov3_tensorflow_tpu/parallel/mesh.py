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
    """device_put a host batch with its leading dim split over the mesh.

    Single-process: `tree` holds the full global batch. Multi-host: `tree`
    holds this process's slice of the global batch (global batch =
    process_count * local rows, assembled via
    jax.make_array_from_process_local_data — the DCN-aware path)."""
    sharding = batch_sharded(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)
    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh (all processes
    must hold the same values — true for seeded init and restored ckpts)."""
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x, x.shape)
    return jax.tree_util.tree_map(put, tree)
