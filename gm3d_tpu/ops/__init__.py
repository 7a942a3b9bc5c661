"""Geometry ops: TPU-native replacements for the reference's CUDA extensions.

Reference native deps (see /root/reference README.md:30-40):
  - pointnet2_ops.furthest_point_sample / gather_operation  -> fps.py
  - KNN_CUDA                                                -> knn.py
  - extensions/chamfer_dist (per-point Chamfer)             -> chamfer.py
  - extensions/emd                                          -> emd.py
  - Group (FPS+KNN+gather+center, Point_MAE.py:50-78)       -> group.py
"""

from gm3d_tpu.ops.fps import fps_indices, fps_indices_pallas_batched, fps_gather, fps
from gm3d_tpu.ops.knn import knn_indices
from gm3d_tpu.ops.group import group_points
from gm3d_tpu.ops.chamfer import (
    chamfer_per_point,
    chamfer_l1,
    chamfer_l2,
    chamfer_group,
)
from gm3d_tpu.ops.emd import emd_loss

__all__ = [
    "fps_indices",
    "fps_gather",
    "fps",
    "knn_indices",
    "group_points",
    "chamfer_per_point",
    "chamfer_l1",
    "chamfer_l2",
    "chamfer_group",
    "emd_loss",
]
