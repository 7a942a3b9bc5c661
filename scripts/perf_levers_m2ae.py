"""Per-lever perf measurements for the M2AE+GM3D pretrain step (round-5,
verdict r4 #1): same methodology as scripts/perf_levers.py — K steps scanned
in one dispatch, clock stopped on a forced host read of a device scalar,
one line per lever for docs/BENCHMARKS.md.

Levers:
  base        shared-hierarchy step at the reference shapes (bs 128 x 2048
              pts, scan 8) — the round-5 default
  k16         16 steps per dispatch (dispatch amortisation residual)
  k1          one step per dispatch (quantifies the scan win)
  b256        batch 256 (MXU saturation check at the hierarchical shapes)
  no_shared_hierarchy  per-pass hierarchy recomputation (the pre-round-5
              behaviour) — quantifies the de-duplication win in-place
  fused_decoder  route the UNMASKED decoder-stage attention through the
              Pallas kernel (the encoder's local-radius mask declines it) —
              the per-scale fused-attention A/B for this family

Run ON TPU:  python scripts/perf_levers_m2ae.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")


def time_config(name, batch=128, scan_steps=8, timed=2, warmup=1,
                shared_hierarchy=True, fused=False):
    import jax
    import jax.numpy as jnp

    from gm3d_tpu.models import PointM2AE
    from gm3d_tpu.train.optim import build_adamw
    from gm3d_tpu.train.pretrain import (
        make_m2ae_gm3d_train_step, make_multi_step)
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = PointM2AE(dtype=dtype)
    rng = np.random.default_rng(0)
    pts_stack = jnp.asarray(
        rng.standard_normal((scan_steps, batch, 2048, 3)).astype(np.float32) * 0.5
    )
    vis0 = jnp.ones((2, model.num_groups[-1]), bool)
    variables = model.init(jax.random.key(0), pts_stack[0, :2], vis0)
    sched = cosine_warmup_schedule(effective_lr(1e-3, batch), 0.0, 40, 300, 100)
    tx = build_adamw(sched, 0.05, grad_clip=5.0)
    state = create_train_state(variables, tx, with_ema=True)

    if shared_hierarchy:
        step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=0.8,
                                         use_fused_attention=fused)
    else:
        # reconstruct the pre-round-5 step inline: hierarchy recomputed by
        # every apply (pass hierarchy=None through a wrapper is not possible
        # from outside, so patch build_hierarchy pass-through off)
        import functools

        import optax

        from gm3d_tpu.data.transforms import scale_and_translate
        from gm3d_tpu.masking import geometric_mask, gm3d_num_mask
        from gm3d_tpu.train import losses
        from gm3d_tpu.train.pretrain import _global_norm, _m2ae_losses
        from gm3d_tpu.train.state import ema_update

        coarse_groups = model.num_groups[-1]
        num_mask = gm3d_num_mask(coarse_groups, 0.8)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, pts, rng_, scalars):
            r_aug, r_mask, r_drop, r_dp = jax.random.split(rng_, 4)
            samples = scale_and_translate(r_aug, pts)
            b = samples.shape[0]
            all_vis = jnp.ones((b, coarse_groups), bool)
            outs_ema = model.apply(state.ema_variables(), samples, all_vis,
                                   deterministic=True)
            masked = geometric_mask(r_mask, outs_ema["loss_pred"], num_mask,
                                    scalars["keep_ratio"])
            coarse_vis = ~masked

            def loss_fn(params):
                v = {"params": params, "batch_stats": state.batch_stats}
                outs, updates = model.apply(
                    v, samples, coarse_vis, deterministic=False,
                    rngs={"dropout": r_drop, "droppath": r_dp},
                    mutable=["batch_stats"])
                loss, matrix = _m2ae_losses(model, outs)
                matrix = jax.lax.stop_gradient(matrix)
                order = jnp.argsort(coarse_vis.astype(jnp.int32), axis=-1,
                                    stable=True)
                mask_idx = order[:, :num_mask]
                lp = jnp.take_along_axis(outs["loss_pred"], mask_idx, axis=1)
                mt = jnp.take_along_axis(matrix, mask_idx, axis=1)
                return loss + losses.relative_learning_loss(lp, mt), (loss, updates)

            (total, (loss, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, new_updates)
            decay = scalars["ema_decay"]
            return state.replace(
                step=state.step + 1, params=params,
                batch_stats=updates.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                ema_params=ema_update(state.ema_params, params, decay),
                ema_batch_stats=ema_update(
                    state.ema_batch_stats,
                    updates.get("batch_stats", state.batch_stats), decay),
            ), {"loss": total, "grad_norm": _global_norm(grads)}

    multi = make_multi_step(step, has_teacher=False, has_scalars=True)
    scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999)}

    def run(state, seed):
        rngs = jax.random.split(jax.random.key(seed), scan_steps)
        return multi(state, None, pts_stack, rngs, scalars)

    for i in range(warmup):
        state, metrics = run(state, i)
    _ = np.asarray(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(timed):
        state, metrics = run(state, 100 + i)
    _ = np.asarray(metrics["loss"])
    dt = time.perf_counter() - t0
    cps = batch * scan_steps * timed / dt
    print(json.dumps({"lever": name, "clouds_per_sec": round(cps, 1),
                      "batch": batch, "scan_steps": scan_steps}), flush=True)
    return cps


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--levers",
                    default="base,k16,k1,b256,no_shared_hierarchy,fused_decoder")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    timed = 1 if args.quick else 2

    want = set(args.levers.split(","))
    if "base" in want:
        time_config("base", timed=timed)
    if "k16" in want:
        time_config("k16", scan_steps=16, timed=timed)
    if "k1" in want:
        time_config("k1", scan_steps=1, timed=16 * timed)
    if "b256" in want:
        time_config("b256", batch=256, timed=timed)
    if "no_shared_hierarchy" in want:
        time_config("no_shared_hierarchy", shared_hierarchy=False, timed=timed)
    if "fused_decoder" in want:
        time_config("fused_decoder", fused=True, timed=timed)
