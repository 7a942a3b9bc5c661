"""Point-M2AE CLI families end-to-end (slow): the hierarchical model through
the real pretrain entry — plain M2AE (random coarse mask) and M2AE+GM3D
(EMA loss predictor + geometric coarse mask + learning loss)."""

import json
import os

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
