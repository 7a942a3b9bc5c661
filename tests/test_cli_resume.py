"""--resume through the real pretrain CLI (slow): restores the
multi_transform optimizer state from the rolling last checkpoint, continues
at the right epoch, and does not redo completed epochs (reference crash
recovery: ``main_pretrain.py:444-453`` auto-resume from the last save)."""

import json
import os

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


def test_pretrain_resume_continues_epochs(tmp_path):
    out = str(tmp_path / "run")
    base = [
        "pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
        "--learn_feature_loss", "ema",
        "--batch_size", "8", "--synthetic_samples", "16",
        "--val_freq", "100", "--output_dir", out,
    ]
    run_cli("gm3d_tpu.cli.pretrain", base + ["--epochs", "2"])
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert [e["epoch"] for e in log] == [0, 1]

    run_cli("gm3d_tpu.cli.pretrain", base + ["--epochs", "4", "--resume"])
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    # appended epochs 2 and 3 only — completed epochs are NOT redone
    assert [e["epoch"] for e in log] == [0, 1, 2, 3], log
    # the step counter continued (2 steps/epoch at 16 samples / batch 8)
    assert log[-1]["steps"] == 2
