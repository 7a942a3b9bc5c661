"""Per-phase timing of the M2AE+GM3D pretrain step at bench shapes.

Same methodology as scripts/profile_phases.py (forced-host-read scalar
timing, per-phase jitted dispatches; the sum exceeds the one-jit step — the
RATIOS say where the next optimization dollar goes). Shapes are the
reference config (``configs/m2ae/config_Point_M2AE.yaml``): bs 128 x 2048
pts, groups [512, 256, 64].

Phases:
  - hierarchy_fps_knn: the 3-scale FPS center pyramid + per-scale KNN
    membership (``M2AEEncoder.hierarchy``) — serial VPU work
  - propagate_masks: coarse->fine visibility back-projection (2 KNN-1 calls)
  - ema_forward_loss_pred: full-visibility EMA pass reduced to loss_pred
    (XLA DCEs the dead reconstruction arm, as in the real step)
  - student_fwd_bwd: masked forward + full backward incl. both losses
  - adamw_update: clip-5 AdamW + EMA tree update

Run on the real chip:  python scripts/profile_phases_m2ae.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing


def timed(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(out)  # compile + force completion
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/gm3d_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gm3d_tpu.masking import gm3d_num_mask
    from gm3d_tpu.models import PointM2AE
    from gm3d_tpu.models.m2ae import propagate_masks
    from gm3d_tpu.train import losses
    from gm3d_tpu.train.pretrain import _m2ae_losses
    from gm3d_tpu.train.state import create_train_state

    B = int(os.environ.get("GM3D_PROFILE_B", "128"))
    N = int(os.environ.get("GM3D_PROFILE_N", "2048"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = PointM2AE(dtype=dtype)
    coarse_groups = model.num_groups[-1]
    num_mask = gm3d_num_mask(coarse_groups, 0.8)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)
    vis0 = jnp.ones((2, coarse_groups), bool)
    variables = model.init(jax.random.key(0), pts[:2], vis0)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(1e-4))
    state = create_train_state(variables, tx, with_ema=True)

    coarse_vis = jnp.ones((B, coarse_groups), bool).at[:, :num_mask].set(False)

    def scalar(tree):
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), tree),
        )

    res = {}

    @jax.jit
    def hierarchy(pts):
        bound = model.bind(state.variables())
        centers, member_idx = bound.encoder.hierarchy(pts)
        return scalar(centers) + scalar([i.astype(jnp.int32) for i in member_idx])

    res["hierarchy_fps_knn"] = timed(hierarchy, pts)

    @jax.jit
    def centers_only(pts):
        bound = model.bind(state.variables())
        centers, _ = bound.encoder.hierarchy(pts)
        return centers

    centers = jax.block_until_ready(centers_only(pts))

    @jax.jit
    def prop(coarse_vis, centers):
        vis = propagate_masks(coarse_vis, centers)
        return scalar([v.astype(jnp.int32) for v in vis])

    res["propagate_masks"] = timed(prop, coarse_vis, centers)

    # precomputed hierarchy, mirroring the round-5 shared-hierarchy step
    # (train/pretrain.py::make_m2ae_gm3d_train_step): the EMA/student phases
    # below measure pure network compute; "hierarchy_fps_knn" above is its
    # once-per-step cost
    from gm3d_tpu.models.m2ae import build_hierarchy

    @jax.jit
    def hier_fn(pts):
        return build_hierarchy(pts, model.num_groups, model.group_sizes)

    hier = jax.block_until_ready(hier_fn(pts))

    @jax.jit
    def ema_fwd(pts, hier):
        all_vis = jnp.ones((B, coarse_groups), bool)
        outs = model.apply(state.ema_variables(), pts, all_vis,
                           deterministic=True, hierarchy=hier)
        return jnp.sum(outs["loss_pred"].astype(jnp.float32))

    res["ema_forward_loss_pred"] = timed(ema_fwd, pts, hier)

    @jax.jit
    def student_fwd_bwd(params, pts, coarse_vis, hier):
        def loss_fn(params):
            outs, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, coarse_vis, deterministic=False,
                rngs={"dropout": jax.random.key(0), "droppath": jax.random.key(1)},
                mutable=["batch_stats"],
                hierarchy=hier,
            )
            loss, matrix = _m2ae_losses(model, outs)
            matrix = jax.lax.stop_gradient(matrix)
            order = jnp.argsort(coarse_vis.astype(jnp.int32), axis=-1, stable=True)
            mask_idx = order[:, :num_mask]
            lp = jnp.take_along_axis(outs["loss_pred"], mask_idx, axis=1)
            mt = jnp.take_along_axis(matrix, mask_idx, axis=1)
            return loss + losses.relative_learning_loss(lp, mt)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss + scalar(jax.tree.map(jnp.sum, grads))

    res["student_fwd_bwd"] = timed(student_fwd_bwd, state.params, pts,
                                   coarse_vis, hier)

    @jax.jit
    def opt_update(state):
        grads = jax.tree.map(jnp.zeros_like, state.params)
        updates, _ = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return scalar(params)

    res["adamw_update"] = timed(opt_update, state)

    total = sum(res.values())
    out = {k: round(v * 1e3, 2) for k, v in res.items()}
    out["sum_ms"] = round(total * 1e3, 2)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
