"""Process-wide compute-mesh registry.

The training CLIs build ONE data mesh (``cli/common.py::setup_mesh``); the
Pallas routes (fused attention in ``models/blocks.py``, the exact-KNN
kernel in ``ops/knn.py``) read it at trace time to wrap their kernels in
``jax.shard_map`` over the data axis — each device runs the proven
single-chip kernel on its batch shard, which is the partitioning validated
on the virtual CPU mesh (tests/test_parallel.py). Without a registered
mesh, a multi-device context leaves pallas_call's GSPMD partitioning to
XLA (unvalidated here), so the routes yield to plain XLA there.
"""

from __future__ import annotations

_COMPUTE_MESH = None


def set_compute_mesh(mesh) -> None:
    """Register the data mesh Pallas routes shard over (None clears; a
    1-device mesh is equivalent to None)."""
    global _COMPUTE_MESH
    _COMPUTE_MESH = mesh


def get_compute_mesh():
    return _COMPUTE_MESH
