"""Point-M2AE CLI families end-to-end (slow): the hierarchical model through
the real pretrain entry — plain M2AE (random coarse mask) and M2AE+GM3D
(EMA loss predictor + geometric coarse mask + learning loss)."""

import json
import os
import re

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("family", ["m2ae", "m2ae_gm3d"])
def test_m2ae_pretrain_cli(tmp_path, family):
    out = str(tmp_path / family)
    acc = run_cli("gm3d_tpu.cli.pretrain", [
        "pt", "--config", "configs/m2ae/config_Point_M2AE.yaml",
        "--model_family", family, "--synthetic",
        "--epochs", "1", "--batch_size", "8", "--synthetic_samples", "8",
        "--output_dir", out,
    ])
    assert 0.0 <= acc <= 1.0
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert "loss" in log[-1] and "val_svm_acc" in log[-1]
    if family == "m2ae_gm3d":
        assert "loss_learn" in log[-1]
    assert os.path.isdir(os.path.join(out, "ckpt"))


def test_m2ae_seg_cli_with_pretrained(tmp_path):
    """Point-M2AE part segmentation end-to-end (README.md:79 capability; the
    reference ships no code/config for it): a pretrain-shaped checkpoint's
    encoder transfers into Point_M2AE_SEG through the seg CLI, trains, and
    reports mIoU. The checkpoint is synthesized (full-size encoder init, tiny
    point count) instead of re-running the ~14-min m2ae pretrain CLI."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gm3d_tpu.ckpt import save_checkpoint
    from gm3d_tpu.config.config import cfg_from_yaml_file
    from gm3d_tpu.models import PointM2AE

    cfg = cfg_from_yaml_file("configs/m2ae/seg_shapenetpart_PointM2AE.yaml")["model"]
    pre = PointM2AE(
        num_groups=tuple(cfg["num_groups"]), group_sizes=tuple(cfg["group_sizes"]),
        encoder_depths=tuple(cfg["encoder_depths"]), encoder_dims=tuple(cfg["encoder_dims"]),
        local_radius=tuple(cfg["local_radius"]), num_heads=cfg["num_heads"],
        drop_path_rate=cfg["drop_path_rate"],
    )
    # param shapes don't depend on the point count; init on a small cloud
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 600, 3)), jnp.float32)
    vis = jnp.ones((2, cfg["num_groups"][-1]), bool)
    variables = pre.init(jax.random.key(0), pts, vis)
    ckpt = str(tmp_path / "pretrain_ckpt")
    save_checkpoint(ckpt, {"params": variables["params"],
                           "batch_stats": variables.get("batch_stats")}, 0)

    out = str(tmp_path / "seg")
    run_cli("gm3d_tpu.cli.finetune_seg", [
        "sg", "--config", "configs/m2ae/seg_shapenetpart_PointM2AE.yaml",
        "--synthetic", "--epochs", "1", "--batch_size", "8",
        "--synthetic_samples", "8", "--val_freq", "1",
        "--pretrained", ckpt, "--output_dir", out,
    ])
    log = open(os.path.join(out, "seg.log")).read()
    m = re.search(r"transfer: (\d+) leaves", log)
    assert m and int(m.group(1)) > 100, log  # full 15-block encoder overlaid
    epoch_log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert "instance_miou" in epoch_log[-1]
    assert os.path.isdir(os.path.join(out, "ckpt"))
