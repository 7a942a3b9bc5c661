"""Reconstruction + mask-heatmap visualisation (reference ``tools/runner.py``
test_net and the PLY dumps of ``engine_pretrain_Classifier_SVM.py:735-827``)."""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from gm3d_tpu.models.pointmae import take_groups
from gm3d_tpu.ops.group import group_points
from gm3d_tpu.utils.ply import loss_heatmap_ply, reconstruction_ply


def dump_reconstruction(model, variables, pts, mask, num_mask: int, out_dir: str,
                        prefix: str = "vis") -> None:
    """Run a masked Point-MAE forward and write per-sample reconstruction PLYs
    (visible patches grey, rebuilt masked patches red) — the
    ``Point_MAE.forward(vis=True)`` path (``models/Point_MAE.py:428-439``)."""
    os.makedirs(out_dir, exist_ok=True)
    pts = jnp.asarray(pts)
    mask = jnp.asarray(mask)
    out = model.apply(variables, pts, mask, num_mask)
    grouped = group_points(pts, model.num_group, model.group_size)
    vis_abs = take_groups(grouped.neighborhood_org, out["vis_idx"])  # (B, V, S, 3)
    rebuild_abs = out["rebuild"] + take_groups(grouped.center, out["mask_idx"])[:, :, None, :]
    for b in range(pts.shape[0]):
        reconstruction_ply(
            os.path.join(out_dir, f"{prefix}_{b}.ply"),
            np.asarray(vis_abs[b]),
            np.asarray(rebuild_abs[b]),
        )


def dump_loss_heatmap(student, variables, pts, out_dir: str, prefix: str = "heat") -> None:
    """EMA/student unmasked forward -> per-group predicted-loss heatmap PLY
    (the paper's geometric-complexity attention maps)."""
    os.makedirs(out_dir, exist_ok=True)
    pts = jnp.asarray(pts)
    batch = pts.shape[0]
    mask = jnp.zeros((batch, student.num_group), bool)
    out = student.apply(variables, pts, mask, 0)
    for b in range(batch):
        loss_heatmap_ply(
            os.path.join(out_dir, f"{prefix}_{b}.ply"),
            np.asarray(out["neighborhood_org"][b]),
            np.asarray(out["loss_pred"][b]),
        )
