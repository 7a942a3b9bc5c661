"""Full CLI pipeline integration test (slow): teacher pretrain -> GM3D with
distillation -> classification fine-tune, all through the real entry points
on synthetic data."""

import json
import re
import os

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


def test_teacher_gm3d_finetune_pipeline(tmp_path):
    teach = str(tmp_path / "teacher")
    gm3d = str(tmp_path / "gm3d")
    ft = str(tmp_path / "ft")

    run_cli("gm3d_tpu.cli.pretrain", [
        "pt", "--config", "configs/pointmae/config_m.yaml", "--model_family", "pointmae",
        "--synthetic", "--epochs", "1", "--batch_size", "8", "--synthetic_samples", "16",
        "--output_dir", teach,
    ])
    assert os.path.isdir(os.path.join(teach, "ckpt"))

    acc = run_cli("gm3d_tpu.cli.pretrain", [
        "pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
        "--epochs", "1", "--batch_size", "8", "--synthetic_samples", "16",
        "--teacher_ckpt", os.path.join(teach, "ckpt"), "--output_dir", gm3d,
    ])
    assert 0.0 <= acc <= 1.0
    log = [json.loads(l) for l in open(os.path.join(gm3d, "log.txt"))]
    assert "val_svm_acc" in log[-1]
    assert all(k in log[-1] for k in ("loss", "loss_mse", "loss_chfr", "loss_learn"))
    # checkpoint cadence: rolling last (numeric step dirs) + best on SVM
    # improvement (reference *_temp_last / *_temp_best parity)
    ckpt = os.path.join(gm3d, "ckpt")
    assert any(d.isdigit() for d in os.listdir(ckpt)), os.listdir(ckpt)
    assert os.path.isdir(os.path.join(ckpt, "best"))

    # --accum_iter 2 also exercises the legacy-recipe SUM accumulation path
    # (runner semantics, DESIGN.md §14) end-to-end at no extra test cost
    best = run_cli("gm3d_tpu.cli.finetune", [
        "ft", "--config", "configs/pointmae/finetune_modelnet.yaml", "--synthetic",
        "--epochs", "1", "--batch_size", "8", "--synthetic_samples", "16",
        "--accum_iter", "2",
        "--pretrained", os.path.join(gm3d, "ckpt"), "--output_dir", ft,
    ])
    assert best >= 0.0
    # the pretrain->finetune handoff must actually transfer weights (round-1
    # VERDICT bug: MAE_encoder re-rooting missing -> 0 leaves overlaid).
    # load_pretrained_into raises on a zero count; also assert the logged
    # count is substantial (the full 12-block encoder is ~150 leaves).
    ft_log = open(os.path.join(ft, "finetune.log")).read()
    m = re.search(r"pretrain->finetune transfer: (\d+) leaves", ft_log)
    assert m, "transfer log line missing"
    assert int(m.group(1)) > 100
    # TensorBoard surface (reference main_finetune.py:538 Metric/ACC;
    # engine_finetune.py:177-178 loss/lr): event files must exist for both
    # the pretrain and finetune runs
    for d in (gm3d, ft):
        tfdir = os.path.join(d, "tfboard")
        assert os.path.isdir(tfdir) and os.listdir(tfdir), d
