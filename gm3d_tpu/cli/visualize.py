"""Visualisation CLI (reference ``tools/runner.py`` test_net + the PLY
attention-map dumps): render masked reconstructions and predicted-loss
heatmaps from a checkpoint.

  python -m gm3d_tpu.cli.visualize --config configs/pointmae/config.yaml \
      --ckpt runs/teacher/ckpt --synthetic --out_dir ./vis
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ckpt import restore_checkpoint
from gm3d_tpu.cli.common import base_parser, compute_dtype, load_config
from gm3d_tpu.config import build_model_from_cfg
from gm3d_tpu.data.datasets import SyntheticClouds, build_dataset_from_cfg
from gm3d_tpu.eval.visualize import dump_loss_heatmap, dump_reconstruction
from gm3d_tpu.masking import random_mask
from gm3d_tpu.models import GM3DStudent
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.state import create_train_state
from gm3d_tpu.utils import get_logger


def parse_args():
    p = base_parser("reconstruction / heatmap visualisation")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out_dir", default="./vis")
    p.add_argument("--num_samples", type=int, default=4)
    p.add_argument("--mask_ratio", type=float, default=0.6)
    p.add_argument("--heatmap", action="store_true",
                   help="also dump GM3D predicted-loss heatmaps (needs a GM3D ckpt)")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args)
    logger = get_logger("gm3d.vis")
    dtype = compute_dtype(args)
    npoints = cfg.get("npoints", 1024)

    if args.synthetic:
        ds = SyntheticClouds(args.num_samples, npoints, seed=0)
    else:
        ds = build_dataset_from_cfg(cfg["dataset"]["val"])
    pts = np.stack([ds[i][2] if not isinstance(ds[i][2], tuple) else ds[i][2][0]
                    for i in range(args.num_samples)])
    pts = jnp.asarray(pts[:, :npoints])

    model = build_model_from_cfg(cfg["model"], dtype=dtype)
    # DELIBERATE: this is the Point_MAE visualisation path (tools/runner.py),
    # which uses Point_MAE's own random-mask count int(G*ratio)
    # (models/Point_MAE.py:308) — NOT GM3D's generate_mask convention
    # (masking.gm3d_num_mask)
    num_mask = int(model.num_group * args.mask_ratio)
    mask = random_mask(jax.random.key(args.seed), pts.shape[0], model.num_group, num_mask)
    mask0 = jnp.zeros((2, model.num_group), bool).at[:, :num_mask].set(True)
    variables = model.init(jax.random.key(0), pts[:2], mask0, num_mask)
    if args.ckpt:
        state = create_train_state(variables, build_adamw(1e-3))
        restored = restore_checkpoint(args.ckpt, state)
        if restored is not None:
            variables = restored.variables()
            logger.info(f"restored step {int(restored.step)}")

    dump_reconstruction(model, variables, pts, mask, num_mask, args.out_dir)
    logger.info(f"wrote {pts.shape[0]} reconstruction PLYs to {args.out_dir}")

    if args.heatmap:
        student = GM3DStudent(dtype=dtype)
        svars = student.init(jax.random.key(0), pts[:2], mask0, num_mask)
        dump_loss_heatmap(student, svars, pts, args.out_dir)
        logger.info("wrote loss-prediction heatmap PLYs")


if __name__ == "__main__":
    main()
