"""Per-lever perf measurements for the GM3D pretrain step (round-3 VERDICT
item 2): times each configuration with the bench methodology (K steps scanned
in one dispatch, clock stopped on a forced host read of a device scalar) and
prints one line per lever for docs/BENCHMARKS.md.

Levers:
  base            current default step (EMA loss_pred_only trim ON, fused
                  grad-free patch embed ON, clip-5 + frozen coord head)
  no_ema_trim     EMA pass recomputes recon decoder + coord head (round-2
                  behaviour) — quantifies the trim
  no_fused_embed  XLA patch embed in the grad-free passes
  remat_student   jax.checkpoint around the student forward
  b512            batch 512 (same clouds/s accounting)
  k1              one step per dispatch (quantifies dispatch amortisation)
  int8_ema        opt-in parity-breaking: dynamic-int8 EMA forward
                  (serve/quantize.py; mask ranking only, grads untouched)

Run ON TPU:  python scripts/perf_levers.py [--quick]
(CPU works for plumbing checks but the numbers are meaningless there.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing (scripts/_bootstrap.py)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")


def time_config(name, batch=256, scan_steps=8, timed=2, warmup=1, **step_kw):
    import jax
    import jax.numpy as jnp

    from gm3d_tpu.models import GM3DStudent, PointMAE
    from gm3d_tpu.train.optim import build_gm3d_shared_optimizer
    from gm3d_tpu.train.pretrain import make_gm3d_train_step, make_multi_step
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    student = GM3DStudent(dtype=dtype)
    teacher = PointMAE(dtype=dtype)
    rng = np.random.default_rng(0)
    pts_stack = jnp.asarray(
        rng.standard_normal((scan_steps, batch, 1024, 3)).astype(np.float32) * 0.5
    )
    from gm3d_tpu.masking import gm3d_num_mask

    num_mask = gm3d_num_mask(student.num_group, 0.6)
    mask0 = jnp.zeros((2, student.num_group), bool).at[:, :num_mask].set(True)
    svars = student.init(jax.random.key(0), pts_stack[0, :2], mask0, num_mask)
    tvars = teacher.init(jax.random.key(1), pts_stack[0, :2], mask0, num_mask)
    if dtype == jnp.bfloat16:
        tvars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tvars
        )
    sched = cosine_warmup_schedule(effective_lr(1e-3, batch), 0.0, 40, 300, 100)
    tx = build_gm3d_shared_optimizer(svars["params"], sched)
    state = create_train_state(svars, tx, with_ema=True)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6, **step_kw)
    multi = make_multi_step(step)
    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(13.889),
        "w_cd": jnp.asarray(1000.0),
    }

    def run(state, seed):
        rngs = jax.random.split(jax.random.key(seed), scan_steps)
        if scan_steps == 1:
            return step(state, tvars, pts_stack[0], rngs[0], scalars)
        return multi(state, tvars, pts_stack, rngs, scalars)

    for i in range(warmup):
        state, metrics = run(state, i)
    _ = np.asarray(metrics["loss"])  # force completion (axon quirk)

    best = float("inf")
    for w in range(timed):
        t0 = time.perf_counter()
        state, metrics = run(state, 100 + w)
        _ = np.asarray(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    clouds = batch * scan_steps / best
    print(json.dumps({"lever": name, "batch": batch, "scan_steps": scan_steps,
                      "sec_per_dispatch": round(best, 4),
                      "ms_per_step": round(best / scan_steps * 1e3, 2),
                      "clouds_per_sec": round(clouds, 1)}), flush=True)
    return clouds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="fewer timed windows")
    p.add_argument("--levers", nargs="*", default=None)
    args = p.parse_args()
    timed = 1 if args.quick else 2

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}",
          flush=True)

    levers = {
        "base": dict(),
        "no_ema_trim": dict(trim_ema=False),
        "no_fused_embed": dict(use_fused_embed=False),
        "remat_student": dict(remat_student=True),
        "b512": dict(_batch=512),
        "k1": dict(_scan=1),
        # opt-in parity-breaking: int8 w8a8 EMA forward (mask ranking only)
        "int8_ema": dict(quantize_ema=True),
    }
    selected = args.levers or list(levers)
    for name in selected:
        kw = dict(levers[name])
        batch = kw.pop("_batch", 256)
        scan = kw.pop("_scan", 8)
        try:
            time_config(name, batch=batch, scan_steps=scan, timed=timed, **kw)
        except Exception as e:  # keep measuring other levers
            print(json.dumps({"lever": name, "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
