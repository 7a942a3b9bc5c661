"""DeferredMetrics (utils/pipeline.py): the one-dispatch-deep metrics
pipeline must preserve order and coverage — the CLIs' epoch stats depend on
every step's metrics arriving exactly once, in dispatch order."""

import numpy as np
import pytest

from gm3d_tpu.utils.pipeline import DeferredMetrics


def test_defers_by_depth_and_flushes_in_order():
    seen = []
    dm = DeferredMetrics(lambda item, tag: seen.append((item, tag)), depth=1)
    dm.push("a", 1)
    assert seen == []  # held: nothing drained until a second push
    dm.push("b", 2)
    assert seen == [("a", 1)]  # FIFO: oldest drains first
    dm.push("c", 3)
    assert seen == [("a", 1), ("b", 2)]
    dm.flush()
    assert seen == [("a", 1), ("b", 2), ("c", 3)]
    dm.flush()  # idempotent
    assert seen == [("a", 1), ("b", 2), ("c", 3)]


def test_depth_zero_is_synchronous():
    seen = []
    dm = DeferredMetrics(lambda item: seen.append(item), depth=0)
    dm.push("a")
    assert seen == ["a"]  # --sync_metrics path: drained immediately
    dm.push("b")
    assert seen == ["a", "b"]


def test_drain_exception_propagates_and_queue_not_stuck():
    """check_finite_loss raises SystemExit inside drain — the exception must
    propagate (the NaN hard exit), and the already-drained item must not be
    re-drained by a later flush."""
    seen = []

    def drain(item):
        seen.append(item)
        if item == "nan":
            raise SystemExit(1)

    dm = DeferredMetrics(drain, depth=1)
    dm.push("nan")
    with pytest.raises(SystemExit):
        dm.push("next")
    assert seen == ["nan"]
    dm.flush()  # the queued follower still drains cleanly afterwards
    assert seen == ["nan", "next"]


def test_cli_epoch_stats_cover_all_steps_with_pipeline(tmp_path):
    """End-to-end: the default (pipelined) pretrain epoch must report the
    full step count and finite averaged metrics — coverage identical to
    --sync_metrics."""
    import json
    import os

    from tests.cli_harness import run_cli

    def run(out, extra):
        run_cli(
            "gm3d_tpu.cli.pretrain",
            ["pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
             "--learn_feature_loss", "ema", "--epochs", "1",
             "--batch_size", "8", "--synthetic_samples", "48",
             "--steps_per_dispatch", "2", "--val_freq", "1000",
             "--output_dir", out] + extra)
        entries = [json.loads(l) for l in open(os.path.join(out, "log.txt"))]
        return entries[-1]

    piped = run(str(tmp_path / "piped"), [])
    sync = run(str(tmp_path / "sync"), ["--sync_metrics"])
    # 48 samples / bs 8 = 6 steps; both modes must meter every one
    assert piped["steps"] == 6
    assert sync["steps"] == 6
    # same data, same seed, same math — identical epoch averages
    np.testing.assert_allclose(piped["loss"], sync["loss"], rtol=1e-6)


@pytest.mark.slow
def test_async_probe_matches_sync_and_preserves_log_order(tmp_path):
    """The async SVM probe (cli.pretrain --sync_probe default-off path) must
    produce the SAME per-epoch accuracies as the synchronous probe, emit one
    line per epoch in epoch order, and attach each probe to its own epoch."""
    import json
    import os

    from tests.cli_harness import run_cli

    def run(out, extra):
        run_cli(
            "gm3d_tpu.cli.pretrain",
            ["pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
             "--learn_feature_loss", "ema", "--epochs", "3",
             "--batch_size", "8", "--synthetic_samples", "16",
             "--val_freq", "2", "--output_dir", out] + extra)
        return [json.loads(l) for l in open(os.path.join(out, "log.txt"))]

    async_log = run(str(tmp_path / "a"), [])
    sync_log = run(str(tmp_path / "s"), ["--sync_probe"])
    # one line per epoch, strictly ordered, in both modes
    assert [e["epoch"] for e in async_log] == [0, 1, 2]
    assert [e["epoch"] for e in sync_log] == [0, 1, 2]
    # probes land on epochs 1 ((e+1)%2==0) and 2 (final) only
    for log in (async_log, sync_log):
        assert "val_svm_acc" not in log[0]
        assert "val_svm_acc" in log[1] and "val_svm_acc" in log[2]
    # identical state -> identical probe results, async or not
    for a, s in zip(async_log[1:], sync_log[1:]):
        np.testing.assert_allclose(a["val_svm_acc"], s["val_svm_acc"])
    # ckpt/best written from the probe-time snapshot
    assert os.path.isdir(os.path.join(tmp_path, "a", "ckpt", "best"))
