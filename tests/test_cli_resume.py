"""--resume through the real pretrain CLI (slow): restores the
multi_transform optimizer state from the rolling last checkpoint, continues
at the right epoch, and does not redo completed epochs (reference crash
recovery: ``main_pretrain.py:444-453`` auto-resume from the last save)."""

import json
import os

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


def test_finetune_resume_preserves_best_checkpoint(tmp_path):
    """A resumed run must restore best-so-far, so a worse post-resume epoch
    cannot overwrite ckpt/best (the legacy runner restores ``best_metrics``
    from ckpt-last.pth, ``tools/builder.py:109-115``; the pretrain main's
    reset-to-zero at ``main_pretrain.py:456`` is the accident we deliberately
    do NOT reproduce). Poisoning the sidecar with an unbeatable best makes
    the assertion deterministic: no epoch can clear 101%."""
    from gm3d_tpu.ckpt import latest_step, load_best_metrics, save_best_metrics

    out = str(tmp_path / "ft")
    base = [
        "ft", "--config", "configs/pointmae/finetune_modelnet.yaml",
        "--synthetic", "--batch_size", "8", "--synthetic_samples", "16",
        "--val_freq", "1", "--output_dir", out,
    ]
    run_cli("gm3d_tpu.cli.finetune", base + ["--epochs", "2"])
    ckpt = os.path.join(out, "ckpt")
    first_best = load_best_metrics(ckpt)
    assert first_best.get("best", 0.0) > 0.0  # val ran, sidecar written
    best_step = latest_step(os.path.join(ckpt, "best"))
    assert best_step is not None

    save_best_metrics(ckpt, {"best": 101.0, "best_vote": 0.0})
    run_cli("gm3d_tpu.cli.finetune", base + ["--epochs", "4", "--resume"])
    # restored (not reset) best: logged on resume, never beaten, best ckpt
    # untouched by the two post-resume epochs
    log = open(os.path.join(out, "finetune.log")).read()
    assert "best 101.00" in log
    assert load_best_metrics(ckpt)["best"] == 101.0
    assert latest_step(os.path.join(ckpt, "best")) == best_step


def test_seg_resume_preserves_best_checkpoint(tmp_path):
    """Same poisoned-sidecar protocol as the finetune test, through the
    segmentation CLI (its best tracking is keyed on instance mIoU and the
    sidecar stores fractions)."""
    from gm3d_tpu.ckpt import latest_step, load_best_metrics, save_best_metrics

    out = str(tmp_path / "seg")
    base = [
        "sg", "--config", "configs/pointmae/seg_shapenetpart.yaml",
        "--synthetic", "--batch_size", "8", "--synthetic_samples", "16",
        "--val_freq", "1", "--output_dir", out,
    ]
    run_cli("gm3d_tpu.cli.finetune_seg", base + ["--epochs", "1"])
    ckpt = os.path.join(out, "ckpt")
    assert load_best_metrics(ckpt).get("instance_miou", 0.0) > 0.0
    best_step = latest_step(os.path.join(ckpt, "best"))
    assert best_step is not None

    save_best_metrics(ckpt, {"instance_miou": 1.01, "class_miou": 1.01})
    run_cli("gm3d_tpu.cli.finetune_seg", base + ["--epochs", "2", "--resume"])
    log = open(os.path.join(out, "seg.log")).read()
    assert "best inst mIoU 101.00" in log  # restored, not reset
    assert load_best_metrics(ckpt)["instance_miou"] == 1.01
    assert latest_step(os.path.join(ckpt, "best")) == best_step


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


def test_pretrain_save_steps_mid_epoch_crash_resume(tmp_path, monkeypatch):
    """--save_steps: a crash mid-epoch resumes from the last step-level save
    WITHOUT replaying already-trained batches (the loader-position sidecar
    names the exact next batch). Total optimizer steps across crash + resume
    must equal an uninterrupted run's."""
    from gm3d_tpu.ckpt import load_loader_state
    from gm3d_tpu.ckpt.checkpoint import latest_step
    from gm3d_tpu.utils import debug as dbg

    out = str(tmp_path / "run")
    ckpt = os.path.join(out, "ckpt")
    base = [
        "pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
        "--learn_feature_loss", "ema", "--steps_per_dispatch", "1",
        "--batch_size", "8", "--synthetic_samples", "32", "--save_steps", "1",
        "--val_freq", "100", "--output_dir", out,
    ]

    # crash on the 3rd step (after its loss check, BEFORE its save): the
    # rolling ckpt holds step 2 and the sidecar points at epoch 0 / batch 2
    orig = dbg.check_finite_loss
    calls = {"n": 0}

    def crashing(loss_value, logger=None, exit_on_nan=True):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return orig(loss_value, logger, exit_on_nan)

    monkeypatch.setattr(dbg, "check_finite_loss", crashing)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_cli("gm3d_tpu.cli.pretrain", base + ["--epochs", "2"])
    monkeypatch.setattr(dbg, "check_finite_loss", orig)

    assert latest_step(ckpt) == 2
    assert load_loader_state(ckpt) == {"epoch": 0, "batch": 2}

    # resume: finishes epoch 0 from batch 2 (2 steps) then epoch 1 (4 steps)
    run_cli("gm3d_tpu.cli.pretrain", base + ["--epochs", "2", "--resume"])
    # 4 steps/epoch x 2 epochs; replaying batches would overshoot 8
    assert latest_step(ckpt) == 8
    log = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
    assert [e["epoch"] for e in log] == [0, 1]
    assert log[0]["steps"] == 2  # the resumed partial epoch ran 2 steps only
    assert log[1]["steps"] == 4
    # completed-epoch sidecar points at the next epoch boundary
    assert load_loader_state(ckpt) == {"epoch": 2, "batch": 0}
