"""Orbax-backed checkpoint save/restore."""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_best_metrics(ckpt_dir: str, metrics: dict) -> None:
    """Persist best-so-far metrics next to the rolling checkpoint so resume
    can restore them (the legacy runner restores ``best_metrics`` from
    ``ckpt-last.pth``, ``tools/builder.py:109-115``; without this a resumed
    run would let a worse post-resume epoch overwrite ckpt/best)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "best_metrics.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(metrics, f)
    os.replace(tmp, path)


def load_best_metrics(ckpt_dir: str) -> dict:
    path = os.path.join(ckpt_dir, "best_metrics.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def save_loader_state(ckpt_dir: str, state: dict) -> None:
    """Persist the data-loader resume token ``{"epoch", "batch"}`` next to the
    rolling checkpoint (mid-epoch saves, ``--save_steps``): restoring the
    model state without the loader position would replay already-trained
    batches. Written atomically, like the best-metrics sidecar."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, "loader_state.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def load_loader_state(ckpt_dir: str) -> dict:
    path = os.path.join(ckpt_dir, "loader_state.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: Any, step: int, metrics: Optional[dict] = None,
                    max_to_keep: int = 3) -> None:
    """Save a train-state pytree at ``step`` (best/last retention via
    max_to_keep, mirroring ckpt-best/ckpt-last of ``tools/builder.py:128-137``)."""
    mgr = _manager(ckpt_dir, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(jax.tree.map(lambda x: x, state)),
             metrics=metrics)
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_raw(ckpt_dir: str, step: Optional[int] = None) -> Optional[dict]:
    """Restore the checkpoint as a raw pytree (no target structure needed) —
    for weights-only loads where the optimizer tree differs (e.g. loading a
    teacher's params into a differently-scheduled state)."""
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore())
    mgr.close()
    return restored


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of ``target`` (auto-resume from the latest
    step, the reference's resume-from-last behaviour,
    ``main_pretrain.py:444-453``)."""
    mgr = _manager(ckpt_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored
