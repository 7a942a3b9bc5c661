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
