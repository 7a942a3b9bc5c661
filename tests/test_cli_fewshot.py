"""Few-shot CLI end-to-end (reference few-shot protocol: per-fold finetune
from the config recipe, mean/std over folds — README.md:83 numbers). Drives
``cli/fewshot.py``'s real ``main()`` on synthetic episodes, covering the
legacy-recipe optimizer build, the M2AE ``model.smooth`` label smoothing,
and the fold loop."""

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


def test_fewshot_cli_m2ae_smoothed(tmp_path):
    """M2AE few-shot config carries smooth 0.3 (the legacy get_loss_acc
    knob); the run must finish with finite accuracy stats over 2 folds."""
    mean, std = run_cli("gm3d_tpu.cli.fewshot", [
        "fs", "--config", "configs/m2ae/fewshot-Point-M2AE.yaml",
        "--synthetic", "--way", "3", "--shot", "4", "--folds", "2",
        "--epochs", "2", "--val_freq", "1",
        "--output_dir", str(tmp_path),
    ])
    assert 0.0 <= mean <= 100.0
    assert std >= 0.0
    assert (tmp_path / "log.txt").exists()
