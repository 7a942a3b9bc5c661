"""Host->device prefetching: overlap the next batch's transfer with the
current step's compute (SURVEY.md §7.2 step 9 — "overlap host IO ... so the
TPU never stalls on host preprocessing")."""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def device_prefetch(loader: Iterable, size: int = 2, sharding=None) -> Iterator:
    """Yield device-resident batches while the next transfers are in flight.

    ``jax.device_put`` is async: enqueuing the next batch's copy before
    yielding the current one overlaps PCIe/ICI transfer with the running
    step. ``sharding`` places batches directly on a mesh.
    """
    queue = []
    it = iter(loader)

    def put(batch):
        if sharding is not None:
            from gm3d_tpu.parallel.mesh import _put  # multi-process aware

            return jax.tree.map(lambda x: _put(np.asarray(x), sharding), batch)
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), batch)

    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.pop(0)
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
