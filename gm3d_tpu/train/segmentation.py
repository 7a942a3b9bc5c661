"""Part-segmentation train/eval steps (per-point CE; eval restricts argmax to
the parts of the ground-truth category — the published ShapeNetPart protocol
behind ``log_files/segmentation.txt``).

Engine provenance: the reference ships its own seg engine
(``engine_finetune_segmentation.py:79-183``), but it is a copy-edit of the
finetune engine — identical FPS→point_all subsample, the same active
``PointcloudScaleAndTranslate``-only transform stack (``:30-40``), the same
per-iteration lr schedule / accum_iter / NaN hard-exit skeleton — with the
model+loss swapped for an EXTERNAL ``pt.py`` that is absent from the repo
(``main_finetune_segmentation.py:298-303`` imports it via importlib). The
loop semantics here are therefore pinned transitively by the finetune
trajectory-parity harness (``tests/test_finetune_trajectory.py``); the model
itself is rebuilt from the published protocol, not parity-testable."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gm3d_tpu.data.transforms import scale_and_translate
from gm3d_tpu.models.blocks import bn_replica_tiling
from gm3d_tpu.train.finetune import floor_reps
from gm3d_tpu.train.state import TrainState


def make_seg_train_step(model, tx: optax.GradientTransformation, augment: bool = True,
                        batch_floor: int = 0):
    @jax.jit
    def step(state: TrainState, pts, cls_label, seg_label, rng):
        r_aug, r_drop, r_dp = jax.random.split(rng, 3)
        x = scale_and_translate(r_aug, pts) if augment else pts
        # compile-shape floor (train.finetune.floor_reps): seg recipes run
        # bs=16/32, below this TPU's batch<=64 compiler SIGABRT threshold
        reps = floor_reps(x.shape[0], batch_floor)
        cls_t, seg_t = cls_label, seg_label
        if reps > 1:
            x = jnp.tile(x, (reps,) + (1,) * (x.ndim - 1))
            cls_t = jnp.tile(cls_label, (reps,) + (1,) * (cls_label.ndim - 1))
            seg_t = jnp.tile(seg_label, (reps,) + (1,) * (seg_label.ndim - 1))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            with bn_replica_tiling(reps):
                logits, updates = model.apply(
                    variables,
                    x,
                    cls_t,
                    deterministic=False,
                    rngs={"dropout": r_drop, "droppath": r_dp},
                    mutable=["batch_stats"],
                )
            one_hot = jax.nn.one_hot(seg_t, model.num_parts)
            loss = jnp.mean(
                optax.softmax_cross_entropy(logits.astype(jnp.float32), one_hot)
            )
            acc = jnp.mean((jnp.argmax(logits, -1) == seg_t).astype(jnp.float32))
            return loss, (acc, updates)

        # NOT fused-attention routed: the finetune-family A/B measured the
        # kernel 25% slower in the CE train step (docs/BENCHMARKS.md) —
        # train-path fusion is only kept where measured positive (GM3D)
        (loss, (acc, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, new_updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "acc": acc * 100.0}

    return step


def make_seg_multi_step(step_fn):
    """Scan ``k`` seg steps in ONE dispatch (same contract as
    ``train.finetune.make_finetune_multi_step``); metrics come back (K,)."""
    inner = getattr(step_fn, "__wrapped__", step_fn)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, pts_stack, cls_stack, seg_stack, rngs):
        def body(carry, xs):
            pts, cls_label, seg_label, rng = xs
            return inner(carry, pts, cls_label, seg_label, rng)

        return jax.lax.scan(body, state, (pts_stack, cls_stack, seg_stack, rngs))

    return multi


def make_seg_eval_step(model, batch_floor: int = 0):
    @jax.jit
    def step(variables, pts, cls_label):
        reps = floor_reps(pts.shape[0], batch_floor)
        x, c = pts, cls_label
        if reps > 1:
            x = jnp.tile(pts, (reps, 1, 1))
            c = jnp.tile(cls_label, (reps,) + (1,) * (cls_label.ndim - 1))
        logits = model.apply(variables, x, c, deterministic=True)
        return logits[: pts.shape[0]]

    return step


def run_seg_val(eval_step, variables, loader, seg_classes, cls_names,
                put=jnp.asarray, depth: int = 4):
    """One full pass of the seg eval protocol — category-restricted argmax
    per batch, Point-MAE part mIoU over the set (returns the
    :func:`~gm3d_tpu.eval.metrics.part_miou` dict). Shared by the
    in-training val pass (``cli/finetune_seg.py``) and the test-only probe
    (``cli/evaluate.py --probe seg``) so the protocol cannot drift between
    them.

    ``put`` places each host batch on device (CLIs pass
    ``shard_eval_batch`` partials on a mesh). Dispatches are pipelined with
    a bounded in-flight window (``depth``; 0 = synchronous): seg logits are
    (B, N, num_parts) — the whole val set held on device would be >1 GB."""
    from gm3d_tpu.eval.metrics import part_miou
    from gm3d_tpu.utils.pipeline import DeferredMetrics

    preds, targets, clss = [], [], []

    def drain(logits_dev, cls_np, seg_np):
        preds.append(category_restricted_argmax(
            np.asarray(logits_dev), cls_np, seg_classes, cls_names))
        targets.append(seg_np)
        clss.append(cls_np)

    flight = DeferredMetrics(drain, depth=depth)
    for pts, cls_label, seg in loader:
        flight.push(eval_step(variables, put(pts), put(cls_label)),
                    np.asarray(cls_label), np.asarray(seg))
    flight.flush()
    return part_miou(np.concatenate(preds), np.concatenate(targets),
                     np.concatenate(clss), seg_classes, cls_names)


def category_restricted_argmax(
    logits: np.ndarray, cls_labels: np.ndarray, seg_classes, cls_names
) -> np.ndarray:
    """Argmax over only the parts valid for each shape's category."""
    pred = np.zeros(logits.shape[:2], np.int64)
    for i in range(logits.shape[0]):
        parts = seg_classes[cls_names[int(cls_labels[i])]]
        sub = logits[i][:, parts]
        pred[i] = np.asarray(parts)[sub.argmax(-1)]
    return pred
