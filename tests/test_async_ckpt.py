"""AsyncCheckpointWriter (ckpt/async_writer.py): the background save must
see the state AS OF the submit — donated train dispatches that follow must
not leak into it — and failures must surface, never silently drop a save."""

import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.ckpt import (
    AsyncCheckpointWriter,
    device_snapshot,
    restore_raw,
    save_checkpoint,
)


def test_snapshot_survives_donated_update():
    """The snapshot owns separate buffers: a later dispatch that DONATES the
    live state's buffers (every train step does) must not corrupt it."""
    state = {"w": jnp.arange(8.0), "b": jnp.ones((4,)), "step": 3}
    snap = device_snapshot(state)

    update = jax.jit(lambda s: {"w": s["w"] * 0 - 1.0, "b": s["b"] * 0 - 1.0,
                                "step": s["step"]},
                     donate_argnums=0)
    new_state = update({"w": state["w"], "b": state["b"], "step": 3})
    np.testing.assert_array_equal(np.asarray(new_state["w"]), -np.ones(8))
    # the snapshot still reads the pre-update values
    np.testing.assert_array_equal(np.asarray(snap["w"]), np.arange(8.0))
    np.testing.assert_array_equal(np.asarray(snap["b"]), np.ones(4))
    # non-array leaves pass through with their Python types intact
    assert snap["step"] == 3 and isinstance(snap["step"], int)


def test_writer_runs_in_background_and_serialises():
    order = []
    release = threading.Event()

    def slow_save(snap):
        release.wait(timeout=10)
        order.append(("saved", int(np.asarray(snap["x"]))))

    w = AsyncCheckpointWriter()
    w.submit({"x": jnp.asarray(1)}, slow_save)
    order.append(("submitted", 1))  # submit returned while the save blocks
    release.set()
    # the second submit waits for the first save (one outstanding)
    w.submit({"x": jnp.asarray(2)}, lambda s: order.append(
        ("saved", int(np.asarray(s["x"])))))
    w.wait()
    assert order[0] == ("submitted", 1)
    assert ("saved", 1) in order and ("saved", 2) in order
    assert order.index(("saved", 1)) < order.index(("saved", 2))


def test_writer_failure_surfaces_on_next_wait():
    w = AsyncCheckpointWriter()

    def bad_save(_snap):
        raise OSError("disk full")

    w.submit({"x": jnp.asarray(0)}, bad_save)
    with pytest.raises(RuntimeError, match="asynchronous checkpoint save"):
        w.wait()
    # the error is consumed: the writer is usable again afterwards
    done = []
    w.submit({"x": jnp.asarray(1)}, lambda s: done.append(1))
    w.wait()
    assert done == [1]


def test_sync_mode_passes_live_state_through():
    w = AsyncCheckpointWriter(enabled=False)
    seen = []
    state = {"x": jnp.asarray(5)}
    w.submit(state, lambda s: seen.append(s))
    assert seen and seen[0] is state  # no snapshot, no thread
    w.wait()  # no-op


@pytest.mark.slow
def test_pretrain_joins_final_probe_best_save_before_returning(tmp_path):
    """The last epoch's async SVM probe lands AFTER the epoch loop's writer
    drain and submits the best-checkpoint save then; the CLI must wait on
    the writer AGAIN before returning. An unjoined daemon save thread dies
    inside orbax at interpreter shutdown (observed: SIGABRT, 'terminate
    called', after an otherwise-clean run) and its best checkpoint is not
    durable. Asserted in-process, the moment main() returns: no live writer
    thread, and the best checkpoint already restorable."""
    from cli_harness import run_cli

    from gm3d_tpu.ckpt.checkpoint import latest_step

    out = str(tmp_path / "run")
    run_cli(
        "gm3d_tpu.cli.pretrain",
        ["pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
         "--learn_feature_loss", "ema", "--epochs", "1", "--batch_size", "8",
         "--synthetic_samples", "16", "--val_freq", "1000",
         "--output_dir", out])
    leaked = [t for t in threading.enumerate()
              if t.name == "gm3d-ckpt-writer" and t.is_alive()]
    assert not leaked, f"writer thread still running after main(): {leaked}"
    assert latest_step(os.path.join(out, "ckpt", "best")) is not None


def test_async_save_restores_submit_time_state(tmp_path):
    """End-to-end through orbax: save via the writer, keep 'training' the
    live state, then restore — the checkpoint must hold the submit-time
    values."""
    w = AsyncCheckpointWriter()
    state = {"w": jnp.full((16,), 2.0), "step": jnp.asarray(7)}
    ckpt = os.path.join(tmp_path, "ckpt")
    w.submit(state, lambda s: save_checkpoint(ckpt, s, 7))
    # the live state moves on immediately (donation)
    bump = jax.jit(lambda s: {"w": s["w"] + 100.0, "step": s["step"] + 1},
                   donate_argnums=0)
    state = bump(state)
    w.wait()
    restored = restore_raw(ckpt)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(16, 2.0))
    assert int(np.asarray(restored["step"])) == 7


def test_probe_thread_joined_on_mid_epoch_crash(tmp_path, monkeypatch):
    """An exception during epoch e+1 while epoch e's async SVM probe is
    still running must JOIN the probe thread (and restore the SIGTERM
    handler) before main() unwinds: a daemon thread still running jit
    dispatches at interpreter shutdown SIGABRTs after an otherwise-clean
    traceback (CLAUDE.md pattern). Pre-fix, finish_pending_probe() ran only
    on the normal path and guard.uninstall() was outside the finally."""
    import signal

    import gm3d_tpu.eval.svm as svm_mod
    import gm3d_tpu.train.schedules as schedules_mod
    from cli_harness import run_cli

    # slow enough that the epoch-1 crash lands while it is still running
    def slow_probe(*a, **k):
        time.sleep(3.0)
        return 0.5

    monkeypatch.setattr(svm_mod, "svm_probe", slow_probe)

    orig_sched = schedules_mod.ema_decay_schedule

    def exploding(epoch):
        if epoch >= 1:
            raise RuntimeError("injected epoch-1 failure")
        return orig_sched(epoch)

    monkeypatch.setattr(schedules_mod, "ema_decay_schedule", exploding)
    # run_cli reloads cli.pretrain, whose from-imports re-bind to the
    # patched dependency modules above
    prev_handler = signal.getsignal(signal.SIGTERM)
    out = str(tmp_path / "run")
    with pytest.raises(RuntimeError, match="injected epoch-1 failure"):
        run_cli(
            "gm3d_tpu.cli.pretrain",
            ["pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
             "--learn_feature_loss", "ema", "--epochs", "2", "--batch_size",
             "8", "--synthetic_samples", "16", "--val_freq", "1",
             "--output_dir", out])
    leaked = [t for t in threading.enumerate()
              if t.name in ("gm3d-svm-probe", "gm3d-ckpt-writer")
              and t.is_alive()]
    assert not leaked, f"threads still running after crash: {leaked}"
    assert signal.getsignal(signal.SIGTERM) == prev_handler, (
        "SIGTERM handler leaked past main()")


def test_classification_forces_sync_probe(tmp_path, monkeypatch):
    """--classification draws per-step batches from the SAME svm_train
    DataLoader the probe's feature extraction iterates; running the probe
    from a background thread would race the loader's epoch counter and
    per-item subsample RNG. The probe must run on the main thread."""
    import gm3d_tpu.eval.svm as svm_mod
    from cli_harness import run_cli

    calls = []

    def recording_probe(*a, **k):
        calls.append(threading.current_thread().name)
        return 0.1

    monkeypatch.setattr(svm_mod, "svm_probe", recording_probe)
    out = str(tmp_path / "run")
    run_cli(
        "gm3d_tpu.cli.pretrain",
        ["pt", "--config", "configs/pointmae/config.yaml", "--synthetic",
         "--learn_feature_loss", "ema", "--epochs", "1", "--batch_size", "8",
         "--synthetic_samples", "16", "--val_freq", "1", "--classification",
         "--output_dir", out])
    assert calls == ["MainThread"], calls
