"""Classification fine-tune / evaluation steps.

Mirrors ``engine_finetune.py:79-218``: FPS to ``point_all`` -> random
subsample to ``npoints`` -> scale-and-translate -> encoder -> CE loss. The
whole pipeline (including FPS and subsampling) runs inside the jit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from gm3d_tpu.data.transforms import scale_and_translate
from gm3d_tpu.models.blocks import bn_replica_tiling
from gm3d_tpu.ops.fps import fps
from gm3d_tpu.train import losses
from gm3d_tpu.train.state import TrainState


def floor_reps(batch: int, batch_floor: int) -> int:
    """Tile factor for the TPU compile-shape floor.

    The axon TPU compiler SIGABRTs on the PointTransformer/GM3D graphs at
    batch <= 64 (CLAUDE.md) — which blocks the reference's small-batch
    recipes (few-shot way*shot = 50 episodes, the bs=32 finetune config,
    ragged last eval batches). The fix: tile the batch with exact copies up
    to ``batch_floor`` INSIDE the jit, right before the model. Replication
    is numerically transparent: batch-mean loss, gradients, accuracies and
    biased BN batch statistics over K identical copies equal the untiled
    values exactly (only per-sample dropout/droppath draw independent masks
    per copy — an average over K draws with the same expectation); the BN
    Bessel correction is kept exact via ``bn_replica_tiling``. Pinned by
    tests/test_batch_floor.py.
    """
    if batch_floor and 0 < batch < batch_floor:
        return -(-batch_floor // batch)
    return 1


def point_all_for(npoints: int) -> int:
    """Oversampling table (``engine_finetune.py:117-134``)."""
    table = {1024: 1200, 2048: 2400, 4096: 4800, 8192: 8192}
    if npoints not in table:
        raise ValueError(f"unsupported npoints {npoints}")
    return table[npoints]


def subsample(rng: jax.Array, pts: jax.Array, npoints: int) -> jax.Array:
    """Per-sample random subset of npoints (``np.random.choice`` equivalent,
    ``engine_finetune.py:129-134``)."""
    batch, total, _ = pts.shape
    noise = jax.random.uniform(rng, (batch, total))
    order = jnp.argsort(noise, axis=-1)[:, :npoints]
    return jnp.take_along_axis(pts, order[..., None], axis=1)


def make_finetune_train_step(
    model,
    tx: optax.GradientTransformation,
    npoints: int = 1024,
    smoothing: float = 0.0,
    augment: bool = True,
    batch_floor: int = 0,
):
    point_all = point_all_for(npoints)

    @jax.jit
    def step(state: TrainState, pts: jax.Array, labels: jax.Array, rng: jax.Array):
        r_sub, r_aug, r_drop, r_dp = jax.random.split(rng, 4)
        x = pts
        if x.shape[1] > point_all:
            x = fps(x, point_all)
        if x.shape[1] > npoints or x.shape[1] == point_all:
            x = subsample(r_sub, x, npoints)
        if augment:
            x = scale_and_translate(r_aug, x)
        # compile-shape floor: tile AFTER fps/subsample/augment so every
        # copy is the exact untiled sample (see floor_reps)
        reps = floor_reps(x.shape[0], batch_floor)
        y = labels if reps == 1 else jnp.tile(labels, (reps,))
        if reps > 1:
            x = jnp.tile(x, (reps, 1, 1))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            with bn_replica_tiling(reps):
                logits, updates = model.apply(
                    variables,
                    x,
                    deterministic=False,
                    rngs={"dropout": r_drop, "droppath": r_dp},
                    mutable=["batch_stats"],
                )
            loss, acc = losses.classification_loss(logits, y, smoothing)
            return loss, (acc, updates)

        # NOT fused-attention routed: measured 25% SLOWER with the Pallas
        # kernel in this step (2359 vs 3143 clouds/s same-session A/B,
        # docs/BENCHMARKS.md "Fused attention — where it does NOT pay") —
        # the kernel's micro-win loses to XLA's scheduling of the in-step
        # FPS/grouping around the attention GEMMs here
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
        return new_state, {"loss": loss, "acc": acc, "grad_norm": optax.global_norm(grads)}

    return step


def make_finetune_multi_step(step_fn):
    """Scan ``k`` finetune steps inside ONE dispatch (same rationale as
    ``train.pretrain.make_multi_step``: amortise dispatch latency — the
    finetune step is small, so per-step dispatch overhead costs relatively
    MORE here than in pretrain). Metrics are returned per step, shape (K,).

    Usage:
        multi = make_finetune_multi_step(step_fn)
        state, metrics = multi(state, pts (K,B,N,3), labels (K,B), rngs (K,))
    """
    inner = getattr(step_fn, "__wrapped__", step_fn)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, pts_stack, labels_stack, rngs):
        def body(carry, xs):
            pts, labels, rng = xs
            return inner(carry, pts, labels, rng)

        return jax.lax.scan(body, state, (pts_stack, labels_stack, rngs))

    return multi


def make_eval_step(model, npoints: int = 1024, batch_floor: int = 0):
    """Validation forward (``engine_finetune.py:186-218``): FPS straight to
    npoints, no augmentation, running BN stats. ``batch_floor`` tiles small
    batches to the compile-shape floor (exact — deterministic forward) and
    slices the logits back."""

    @jax.jit
    def step(variables: dict, pts: jax.Array) -> jax.Array:
        x = fps(pts, npoints) if pts.shape[1] > npoints else pts
        reps = floor_reps(x.shape[0], batch_floor)
        if reps > 1:
            x = jnp.tile(x, (reps, 1, 1))
        # XLA attention: the fused kernel measured 16% slower in this
        # forward (serve A/B, docs/BENCHMARKS.md "where it does NOT pay")
        logits = model.apply(variables, x, deterministic=True)
        return logits[: pts.shape[0]]

    return step


def make_vote_eval_step(model, npoints: int = 1024, times: int = 10,
                        batch_floor: int = 0):
    """Voting eval (``tools/runner_finetune.py:271-333``): FPS once to
    point_all, then ``times`` random subsamples + test transform, average
    logits. The batch floor tiles each vote's subsampled batch (exact —
    subsample/augment draw on the untiled batch, the forward is
    deterministic)."""
    point_all = point_all_for(npoints)

    @jax.jit
    def step(variables: dict, pts: jax.Array, rng: jax.Array) -> jax.Array:
        x_all = fps(pts, point_all) if pts.shape[1] > point_all else pts
        reps = floor_reps(pts.shape[0], batch_floor)

        def one(r):
            r_sub, r_aug = jax.random.split(r)
            x = subsample(r_sub, x_all, npoints)
            x = scale_and_translate(r_aug, x)
            if reps > 1:
                x = jnp.tile(x, (reps, 1, 1))
            return model.apply(variables, x, deterministic=True)[: pts.shape[0]]

        logits = jax.vmap(one)(jax.random.split(rng, times))  # (times, B, C)
        return jnp.mean(logits, axis=0)

    return step
