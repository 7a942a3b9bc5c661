"""Asynchronous checkpoint writer: overlap saves with training.

A synchronous ``save_checkpoint`` blocks the training loop for the full
device→host transfer plus the disk write. On this deployment the D2H path is
the bottleneck — host reads through the remote-accelerator tunnel measure
~tens of MB/s (docs/BENCHMARKS.md), so a ~0.5 GB GM3D train state costs
>10 s per save against ~30 s ShapeNet epochs. Orbax's own async mode does
not help here: it snapshots to HOST memory synchronously (the D2H is the
part it doesn't hide) and only backgrounds the disk write.

This writer instead snapshots the state ON DEVICE — one jitted dispatch
copying every array leaf (HBM-bandwidth, sub-ms) — and hands the snapshot to
a background thread that runs the ordinary orbax save. Training resumes
immediately; the next train dispatch can donate the live state's buffers
because the snapshot owns separate ones. The D2H streams through the tunnel
concurrently with the (small) train-dispatch traffic.

Semantics:
  - one outstanding save at a time (``submit`` waits for the previous one,
    bounding extra device memory at one state copy);
  - a failed background save raises at the next ``submit``/``wait`` — a run
    never silently loses its checkpoints;
  - preemption/exit paths call ``wait()`` before their own synchronous save
    so two orbax managers never race on one directory;
  - the training CLIs drain via ``try/finally`` around the epoch loop, so an
    exception escaping the loop (injected test crash, NaN ``sys.exit``)
    still commits the in-flight save before the process unwinds — which is
    always safe, because saves are only submitted for states whose NaN
    checks already ran (the CLIs flush the metrics pipeline first), and
    deterministic, which crash/resume step accounting relies on;
  - ``enabled=False`` (the ``--sync_save`` escape hatch) degrades to the
    synchronous behavior.

The reference saves synchronously from the main process
(``tools/builder.py:128-137``, ``util/misc.py save_model``); this is the
TPU-native replacement, not a translation.
"""

from __future__ import annotations

import threading
from typing import Any, Callable

import jax
import jax.numpy as jnp

# ONE dispatch for the whole tree: per-leaf jnp.copy outside jit would pay
# the ~36 ms tunnel dispatch latency per leaf (hundreds of leaves). jit
# never aliases inputs to outputs without donation, and jnp.copy keeps an
# explicit copy op in the HLO; output shardings follow the inputs.
_copy_arrays = jax.jit(lambda arrs: [jnp.copy(a) for a in arrs])


def device_snapshot(tree: Any) -> Any:
    """Copy every ``jax.Array`` leaf of ``tree`` on device, in one dispatch.

    Non-array leaves (python ints, numpy scalars) pass through unchanged so
    the snapshot's pytree types match the live state's — they are immutable
    for our purposes and must not be traced into weak-typed device arrays.
    """
    leaves, treedef = jax.tree.flatten(tree)
    arr_idx = [i for i, leaf in enumerate(leaves) if isinstance(leaf, jax.Array)]
    if arr_idx:
        copies = _copy_arrays([leaves[i] for i in arr_idx])
        for i, c in zip(arr_idx, copies):
            leaves[i] = c
    return jax.tree.unflatten(treedef, leaves)


class AsyncCheckpointWriter:
    """Serialised background executor for checkpoint saves.

    ``submit(state, save_fn)`` snapshots ``state`` on device and runs
    ``save_fn(snapshot)`` — the orbax save plus any sidecar writes, in
    order — on a background thread. Sidecars therefore commit only after
    their checkpoint does, same as the synchronous path.
    """

    def __init__(self, enabled: bool = True):
        self._enabled = bool(enabled)
        self._thread: threading.Thread | None = None
        self._err: BaseException | None = None

    def submit(self, state: Any, save_fn: Callable[[Any], None]) -> None:
        if not self._enabled:
            save_fn(state)
            return
        self.wait()  # serialize saves; surfaces a prior failure loudly

        snap = device_snapshot(state)

        def run() -> None:
            try:
                save_fn(snap)
            except BaseException as e:  # noqa: BLE001 — re-raised on wait()
                self._err = e

        # daemon: a NaN-guard sys.exit must not hang on a half-written save
        # of the very state it is rejecting (orbax commits atomically, so an
        # interrupted save leaves the previous checkpoint intact)
        self._thread = threading.Thread(
            target=run, name="gm3d-ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) completes; re-raise its
        failure. Call before process exit and before any synchronous save."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("asynchronous checkpoint save failed") from err
