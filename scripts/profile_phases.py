"""Per-phase timing of the GM3D pretrain step at bench shapes.

Times each phase as its own jitted dispatch with the forced-host-read
methodology (CLAUDE.md): grouping (FPS+KNN), fused patch embed, EMA forward,
student forward+backward, teacher encode + replays, optimizer update. The sum
exceeds the one-jit step time (XLA overlaps/fuses across phases there); the
RATIOS say where the next optimization dollar goes. Results recorded in
docs/BENCHMARKS.md.

Run on the real chip:  python scripts/profile_phases.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing (scripts/_bootstrap.py)



def timed(fn, *args, reps=3):
    # IMPORTANT: fn must return a SCALAR — np.asarray of a large output would
    # time the remote tunnel's host-read bandwidth, not the device compute
    # (observed: 645 ms "compute" for a 25 MB fetch).
    out = fn(*args)
    _ = np.asarray(out)  # compile + force completion
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / reps


def scalarize(fn):
    def wrapped(*args):
        out = fn(*args)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out),
        )
    return jax.jit(wrapped)


if __name__ == "__main__":
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gm3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gm3d_tpu.models import GM3DStudent, PointMAE
    from gm3d_tpu.ops.group import group_points
    from gm3d_tpu.ops.patch_embed import fused_patch_embed, params_from_variables
    from gm3d_tpu.train import losses
    from gm3d_tpu.train.state import create_train_state

    B, N = 256, 1024
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    student = GM3DStudent(dtype=dtype)
    teacher = PointMAE(dtype=dtype)
    num_mask = int(student.num_group * 0.6)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)
    mask0 = jnp.zeros((2, student.num_group), bool).at[:, :num_mask].set(True)
    svars = student.init(jax.random.key(0), pts[:2], mask0, num_mask)
    tvars = teacher.init(jax.random.key(1), pts[:2], mask0, num_mask)
    if dtype == jnp.bfloat16:
        tvars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tvars
        )
    tx = optax.adamw(1e-4)
    state = create_train_state(svars, tx, with_ema=True)

    mask = jnp.zeros((B, student.num_group), bool).at[:, :num_mask].set(True)
    grouped = group_points(pts, student.num_group, student.group_size)

    res = {}

    res["grouping_fps_knn"] = timed(
        scalarize(lambda p: group_points(p, student.num_group, student.group_size)), pts
    )

    pe = params_from_variables(state.ema_variables(), ("MAE_encoder", "encoder"))
    res["fused_patch_embed"] = timed(
        scalarize(lambda n: fused_patch_embed(n, pe)), grouped.neighborhood
    )

    @scalarize
    def ema_fwd(pts, grouped):
        outs = student.apply(
            state.ema_variables(), pts, jnp.zeros((B, student.num_group), bool), 0,
            deterministic=True, grouped=grouped,
        )
        return outs["loss_pred"]

    res["ema_forward"] = timed(ema_fwd, pts, grouped)

    @scalarize
    def teacher_all(pts, grouped, pred_masked):
        feats = teacher.apply(tvars, pts, method=teacher.encode_features, grouped=grouped)
        pt = teacher.apply(tvars, feats, grouped.center, method=teacher.decode_replay)
        pr = teacher.apply(
            tvars, pred_masked, grouped.center[:, :num_mask], method=teacher.decode_replay
        )
        return pt, pr

    pred_masked = jnp.zeros((B, num_mask, student.trans_dim), dtype)
    res["teacher_encode_and_replays"] = timed(teacher_all, pts, grouped, pred_masked)

    @scalarize
    def student_fwd_bwd(params, pts, grouped):
        def loss_fn(params):
            outs, _ = student.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, mask, num_mask, deterministic=False,
                rngs={"dropout": jax.random.key(0), "droppath": jax.random.key(1)},
                mutable=["batch_stats"], grouped=grouped,
            )
            pred = outs["pix_pred"][:, -num_mask:].astype(jnp.float32)
            lp = outs["loss_pred"][:, -num_mask:]
            return jnp.mean(pred ** 2) + losses.relative_learning_loss(lp, jnp.abs(lp) + 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, jax.tree.map(lambda g: jnp.sum(jnp.abs(g)), grads)

    res["student_fwd_bwd"] = timed(student_fwd_bwd, state.params, pts, grouped)

    @scalarize
    def opt_update(state):
        grads = jax.tree.map(jnp.zeros_like, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return params

    res["adamw_update"] = timed(opt_update, state)

    total = sum(res.values())
    out = {k: round(v * 1e3, 2) for k, v in res.items()}
    out["sum_ms"] = round(total * 1e3, 2)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
