"""Patchify: FPS centers -> KNN neighbourhood -> gather -> center-normalise.

TPU-native equivalent of ``Group.forward`` (``models/Point_MAE.py:50-78`` and
the GM3D variant ``models_mae_learn_loss_Classifier_SVM_feature_besed.py:
1222-1260`` which additionally returns the un-normalised neighbourhood).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gm3d_tpu.ops.fps import fps_indices, fps_gather
from gm3d_tpu.ops.knn import knn_indices


class Grouped(NamedTuple):
    neighborhood: jax.Array  # (B, G, S, 3) center-normalised
    center: jax.Array  # (B, G, 3)
    neighborhood_org: jax.Array  # (B, G, S, 3) absolute coordinates


def group_points(xyz: jax.Array, num_group: int, group_size: int) -> Grouped:
    """Divide each cloud into ``num_group`` patches of ``group_size`` points.

    xyz: (B, N, 3). Patch centers come from FPS; members from exact KNN
    around each center (points may repeat across patches, as in the
    reference).
    """
    center_idx = fps_indices(xyz, num_group)
    center = fps_gather(xyz, center_idx)  # (B, G, 3)
    idx = knn_indices(xyz, center, group_size)  # (B, G, S)
    batch, _, _ = xyz.shape
    flat_idx = idx.reshape(batch, -1)  # (B, G*S)
    neighborhood_org = jnp.take_along_axis(xyz, flat_idx[..., None], axis=1)
    neighborhood_org = neighborhood_org.reshape(batch, num_group, group_size, 3)
    neighborhood = neighborhood_org - center[:, :, None, :]
    return Grouped(neighborhood, center, neighborhood_org)
