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


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host array batch-sharded on the mesh."""
    return jax.device_put(batch, batch_sharding(mesh, axis))


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
