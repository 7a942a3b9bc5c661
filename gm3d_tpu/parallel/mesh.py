"""Mesh construction and sharding placement."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices.

    Model sizes here (<= 30M params) need no tensor/pipeline axes
    (SURVEY.md §2.4 — TP/PP/EP absent in the reference and out of scope);
    scaling is pure DP with gradients psum-ed over ICI.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated placement (params, opt state, scalars)."""
    return NamedSharding(mesh, P())


def _put(x, sharding: NamedSharding):
    """Place a host array under ``sharding``, including onto meshes that span
    multiple processes (every host holds the FULL array — the loader contract,
    ``data.datasets.DataLoader`` — and each process materialises only its
    addressable shards)."""
    if jax.process_count() > 1:
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
    return jax.device_put(x, sharding)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host array batch-sharded on the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: _put(x, sharding), batch)


def shard_eval_batch(mesh: Mesh, batch, axis: str = "data"):
    """Batch-shard when the leading dim divides the mesh, replicate otherwise
    — eval loaders run ``drop_last=False`` and may end with a ragged batch."""
    n = int(mesh.devices.size)

    def put(x):
        x = np.asarray(x)
        if x.shape[0] % n == 0:
            return _put(x, batch_sharding(mesh, axis))
        return _put(x, replicated(mesh))

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _put(x, sharding), tree)
