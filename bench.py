"""Benchmark: GM3D pretrain step throughput (point clouds / sec / chip).

The reference publishes no throughput numbers (BASELINE.md) — the TPU
roofline is established here. Workload = the full GM3D core path (SURVEY.md
§3.1): ShapeNet-shaped batch (256 x 1024 pts), EMA forward, geometric mask,
student forward/backward (12-layer encoder, dual decoders), frozen-teacher
distillation replay, AdamW + EMA update — all in one jit, bf16 compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``BASELINE_CLOUDS_PER_SEC`` is this repo's recorded round-1 roofline; later
rounds report their speedup against it.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 44000.0  # round-1 recorded roofline on one v5e chip

BATCH = 256
NPOINTS = 1024
WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from gm3d_tpu.models import GM3DStudent, PointMAE
    from gm3d_tpu.train.optim import build_adamw
    from gm3d_tpu.train.pretrain import make_gm3d_train_step
    from gm3d_tpu.train.schedules import cosine_warmup_schedule, effective_lr
    from gm3d_tpu.train.state import create_train_state

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    student = GM3DStudent(dtype=dtype)
    teacher = PointMAE(dtype=dtype)

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((BATCH, NPOINTS, 3)).astype(np.float32) * 0.5)
    num_mask = int(student.num_group * 0.6)
    mask0 = jnp.zeros((BATCH, student.num_group), bool).at[:, :num_mask].set(True)

    svars = student.init(jax.random.key(0), pts[:2], mask0[:2], num_mask)
    tvars = teacher.init(jax.random.key(1), pts[:2], mask0[:2], num_mask)

    sched = cosine_warmup_schedule(effective_lr(1e-3, BATCH), 0.0, 40, 300, 100)
    tx = build_adamw(sched)
    state = create_train_state(svars, tx, with_ema=True)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)

    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(13.889),
        "w_cd": jnp.asarray(1000.0),
    }

    for i in range(WARMUP):
        state, metrics = step(state, tvars, pts, jax.random.key(i), scalars)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, tvars, pts, jax.random.key(100 + i), scalars)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    clouds_per_sec = BATCH * ITERS / dt
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
