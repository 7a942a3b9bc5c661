"""Few-shot CLI end-to-end (reference few-shot protocol: per-fold finetune
from the config recipe, mean/std over folds — README.md:83 numbers). Drives
``cli/fewshot.py``'s real ``main()`` on synthetic episodes, covering the
legacy-recipe optimizer build and the fold loop. Uses the Point-MAE fewshot
config (the M2AE model's CPU compile is ~15 min and its CLI path is already
covered end-to-end by ``test_cli_m2ae.py``; the M2AE ``model.smooth``
application is pinned by ``test_losses.py::TestFinetuneRecipe`` and the
smoothing loss formula by ``test_losses.py::test_smoothing``)."""

import json
import os

import pytest

from cli_harness import run_cli

pytestmark = pytest.mark.slow


def test_fewshot_cli_two_folds(tmp_path):
    """Two synthetic folds through the real main(): per-fold finetune with
    the legacy recipe (cfgs/fewshot.yaml stack), finite mean/std, JSONL
    summary with per-fold accuracies."""
    mean, std = run_cli("gm3d_tpu.cli.fewshot", [
        "fs", "--config", "configs/pointmae/fewshot.yaml",
        "--synthetic", "--way", "3", "--shot", "4", "--folds", "2",
        "--epochs", "2", "--val_freq", "1",
        "--output_dir", str(tmp_path),
    ])
    assert 0.0 <= mean <= 100.0
    assert std >= 0.0
    log = [json.loads(l) for l in open(os.path.join(str(tmp_path), "log.txt"))]
    assert log[-1]["way"] == 3 and log[-1]["shot"] == 4
    assert len(log[-1]["accs"]) == 2


def test_parallel_folds_match_sequential(tmp_path):
    """The vmapped all-folds-at-once path is numerically identical to the
    sequential per-fold loop: same init keys, same per-step rng splits, same
    data order -> identical per-fold accuracies."""
    common = ["--config", "configs/pointmae/fewshot.yaml",
              "--synthetic", "--way", "3", "--shot", "4", "--folds", "2",
              "--epochs", "2", "--val_freq", "1"]
    run_cli("gm3d_tpu.cli.fewshot", ["fs"] + common +
            ["--output_dir", str(tmp_path / "par")])
    run_cli("gm3d_tpu.cli.fewshot", ["fs"] + common +
            ["--no-parallel_folds", "--output_dir", str(tmp_path / "seq")])
    par = json.loads(open(str(tmp_path / "par" / "log.txt")).readlines()[-1])
    seq = json.loads(open(str(tmp_path / "seq" / "log.txt")).readlines()[-1])
    assert par["accs"] == seq["accs"], (par, seq)
