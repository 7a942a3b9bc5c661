"""Benchmark: GM3D pretrain step throughput (point clouds / sec / chip).

The reference publishes no throughput numbers (BASELINE.md) — the TPU
roofline is established here. Workload = the full GM3D core path (SURVEY.md
§3.1): ShapeNet-shaped batch (256 x 1024 pts), EMA forward, geometric mask,
student forward/backward (12-layer encoder, dual decoders), frozen-teacher
distillation replay, AdamW + EMA update — bf16 compute, donated state.

Timing methodology: the steps are chained through ``lax.scan`` inside ONE
dispatch (amortising controller/tunnel latency) and the clock stops on a
FORCED HOST READ of the final loss — ``block_until_ready`` alone does not
guarantee completion on the axon remote backend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``BASELINE_CLOUDS_PER_SEC`` is this repo's recorded round-1 roofline; later
rounds report their speedup against it.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 1475.0  # round-1 honest single-dispatch-per-step roofline

BATCH = 256
NPOINTS = 1024
SCAN_STEPS = 8
WARMUP_DISPATCHES = 2
TIMED_DISPATCHES = 3


def main():
    import os

    import jax

    # persistent compile cache: first-compile over the TPU tunnel can take
    # minutes; subsequent bench runs hit the cache
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from gm3d_tpu.models import GM3DStudent, PointMAE
    from gm3d_tpu.train.optim import build_adamw
    from gm3d_tpu.train.pretrain import make_gm3d_train_step, make_multi_step
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    student = GM3DStudent(dtype=dtype)
    teacher = PointMAE(dtype=dtype)

    rng = np.random.default_rng(0)
    pts_stack = jnp.asarray(
        rng.standard_normal((SCAN_STEPS, BATCH, NPOINTS, 3)).astype(np.float32) * 0.5
    )
    num_mask = int(student.num_group * 0.6)
    mask0 = jnp.zeros((2, student.num_group), bool).at[:, :num_mask].set(True)

    svars = student.init(jax.random.key(0), pts_stack[0, :2], mask0, num_mask)
    tvars = teacher.init(jax.random.key(1), pts_stack[0, :2], mask0, num_mask)
    if dtype == jnp.bfloat16:
        # frozen teacher: store weights in bf16 — halves its HBM weight traffic
        tvars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tvars
        )

    sched = cosine_warmup_schedule(effective_lr(1e-3, BATCH), 0.0, 40, 300, 100)
    tx = build_adamw(sched)
    state = create_train_state(svars, tx, with_ema=True)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)
    multi = make_multi_step(step)

    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(13.889),
        "w_cd": jnp.asarray(1000.0),
    }

    def run(state, seed):
        rngs = jax.random.split(jax.random.key(seed), SCAN_STEPS)
        state, metrics = multi(state, tvars, pts_stack, rngs, scalars)
        return state, metrics

    for i in range(WARMUP_DISPATCHES):
        state, metrics = run(state, i)
    _ = np.asarray(metrics["loss"])  # force completion

    t0 = time.perf_counter()
    for i in range(TIMED_DISPATCHES):
        state, metrics = run(state, 100 + i)
    _ = np.asarray(metrics["loss"])  # force completion
    dt = time.perf_counter() - t0

    total_clouds = BATCH * SCAN_STEPS * TIMED_DISPATCHES
    clouds_per_sec = total_clouds / dt
    print(
        json.dumps(
            {
                "metric": "gm3d_pretrain_clouds_per_sec_per_chip",
                "value": round(clouds_per_sec, 1),
                "unit": "clouds/s",
                "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
