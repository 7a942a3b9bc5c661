"""Preemption-safe training (slow): SIGTERM mid-run must checkpoint at the
next step boundary, exit 0, and --resume must continue from the saved
position. Spot/preemptible TPU VMs deliver SIGTERM with a grace window; the
reference loses everything since its last epoch-boundary save (SURVEY.md
§5.3). Run as a real subprocess — signal delivery can't be simulated
in-process."""

import json
import os
import re
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn(out_dir, extra):
    env = dict(os.environ)
    env["GM3D_PLATFORM"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device
    env["PYTHONPATH"] = REPO
    argv = [
        sys.executable, "-m", "gm3d_tpu.cli.pretrain",
        "--config", "configs/pointmae/config.yaml", "--synthetic",
        "--learn_feature_loss", "ema",  # no teacher build needed
        "--batch_size", "8", "--synthetic_samples", "48",
        "--warmup_epochs", "0", "--val_freq", "1000",
        "--steps_per_dispatch", "1",
        "--output_dir", out_dir,
    ] + extra
    return subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env,
                            cwd=REPO)


def _wait_for(path, needle, proc, timeout=900):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            out, _ = proc.communicate()
            raise AssertionError(f"process exited early ({proc.returncode}):\n{out[-3000:]}")
        if os.path.exists(path) and needle in open(path).read():
            return
        time.sleep(0.5)
    proc.kill()
    raise AssertionError(f"timed out waiting for {needle!r} in {path}")


def test_sigterm_checkpoints_and_resume_continues(tmp_path):
    out = str(tmp_path / "run")
    log = os.path.join(out, "pretrain.log")

    # phase 1: open-ended run; SIGTERM once epoch 0 has completed (so the
    # signal lands mid-epoch-1 or later, never before any step ran)
    p = _spawn(out, ["--epochs", "1000"])
    try:
        _wait_for(log, "epoch 0:", p)
        p.send_signal(signal.SIGTERM)
        outtext, _ = p.communicate(timeout=600)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, outtext[-3000:]
    logtext = open(log).read()
    assert "preempted: checkpoint + loader position saved" in logtext
    ckpt_dir = os.path.join(out, "ckpt")
    from gm3d_tpu.ckpt import load_loader_state

    token = load_loader_state(ckpt_dir)
    assert token, "preemption save must leave a loader-position sidecar"
    jsonl_path = os.path.join(out, "log.txt")
    n_phase1 = sum(1 for _ in open(jsonl_path)) if os.path.exists(jsonl_path) else 0

    # phase 2: --resume must pick up from the saved step and run to the end
    p2 = _spawn(out, ["--epochs", "3", "--resume"])
    out2, _ = p2.communicate(timeout=1800)
    assert p2.returncode == 0, out2[-3000:]
    logtext = open(log).read()
    m = re.search(r"resumed from step (\d+)", logtext)
    assert m, logtext[-2000:]
    n_resumed = int(m.group(1))
    entries = [json.loads(l) for l in open(jsonl_path)]
    assert entries[-1]["epoch"] == 2  # ran through to the final epoch
    # exact step accounting: steps restored at resume + steps run after it
    # equal one uninterrupted 3-epoch run's (6 steps/epoch x 3) — the resume
    # replayed nothing and skipped nothing
    assert n_resumed + sum(e["steps"] for e in entries[n_phase1:]) == 18


def test_preempt_emits_pending_async_probe_row(tmp_path, monkeypatch):
    """Round-5 soak regression: SIGTERM while the PREVIOUS epoch's async SVM
    probe is still in flight must not eat that epoch's JSONL row — a
    mid-epoch resume never re-runs that probe, so before the fix the
    completed epoch's row (observed: epoch 8 in the soak) vanished forever.
    In-process with a deterministic trigger: the guard 'fires' on its 10th
    poll (mid-epoch 1), while a slowed probe for epoch 0 is still pending;
    `preempt_save` must join + record + emit epoch 0's row before exiting."""
    import json as _json
    import time as _time

    import gm3d_tpu.eval.svm as svm_mod
    from gm3d_tpu.utils.preempt import PreemptionGuard

    def slow_probe(*a, **kw):
        _time.sleep(4.0)
        return 0.5

    monkeypatch.setattr(svm_mod, "svm_probe", slow_probe)

    calls = {"n": 0}
    orig = PreemptionGuard.exit_if_triggered

    def fake_exit(self, save_fn):
        calls["n"] += 1
        if calls["n"] == 10:  # 7 polls in epoch 0 (6 steps + epoch end)
            self.triggered = True
        return orig(self, save_fn)

    monkeypatch.setattr(PreemptionGuard, "exit_if_triggered", fake_exit)

    out = str(tmp_path / "run")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cli_harness import run_cli

    with pytest.raises(SystemExit) as ei:
        run_cli("gm3d_tpu.cli.pretrain", [
            "pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
            "--learn_feature_loss", "ema",
            "--batch_size", "8", "--synthetic_samples", "48",
            "--warmup_epochs", "0", "--val_freq", "1",
            "--steps_per_dispatch", "1", "--epochs", "5",
            "--output_dir", out,
        ])
    assert ei.value.code == 0
    jsonl_path = os.path.join(out, "log.txt")
    rows = [_json.loads(l) for l in open(jsonl_path)]
    assert any(r["epoch"] == 0 and r.get("val_svm_acc") == 0.5 for r in rows), (
        f"epoch 0's row (with its probe result) was dropped on preemption: "
        f"{rows}")
