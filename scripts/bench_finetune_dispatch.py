"""Measure the finetune-step scan-fusion win on the real chip.

The finetune step (B=128: on-device FPS 8192->1200, subsample, augment,
22M-param PointTransformer fwd+bwd, AdamW) measured ~50 ms/step hardware-
validated (CLAUDE.md); the ~36 ms tunnel dispatch latency is therefore a
much larger RELATIVE tax than in pretrain (~163 ms steps, +22.5% from the
8-step scan). This script times K=1 vs K=8 with the bench methodology
(forced host read of a scalar) and prints one JSON line for
docs/BENCHMARKS.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_finetune_dispatch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing (scripts/_bootstrap.py)


BATCH = 128
NPOINTS_IN = 8192  # dataset-shaped input; FPS to 1200 + subsample in-step
SCAN_K = 8
WINDOWS = 2
DISPATCHES_PER_WINDOW = 3  # at K=8: 24 steps per window


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from gm3d_tpu.config import build_model_from_cfg, cfg_from_yaml_file
    from gm3d_tpu.train.finetune import (
        make_finetune_multi_step,
        make_finetune_train_step,
    )
    from gm3d_tpu.train.optim import build_finetune_optimizer
    from gm3d_tpu.train.state import create_train_state

    cfg = cfg_from_yaml_file("configs/pointmae/finetune_modelnet.yaml")
    model = build_model_from_cfg(cfg["model"], dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(BATCH, NPOINTS_IN, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 40, BATCH))
    variables = model.init(jax.random.key(0), pts[:, :1024])
    tx = build_finetune_optimizer(variables["params"], 5e-4)
    step = make_finetune_train_step(model, tx, npoints=1024)
    multi = make_finetune_multi_step(step)

    def timed(fn, *args, steps_per_dispatch):
        # warm (compile)
        state = create_train_state(variables, tx)
        state, m = fn(state, *args)
        _ = float(np.sum(np.asarray(m["loss"])))  # forced host read
        results = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(DISPATCHES_PER_WINDOW):
                state, m = fn(state, *args)
            _ = float(np.sum(np.asarray(m["loss"])))
            dt = time.perf_counter() - t0
            results.append(
                BATCH * steps_per_dispatch * DISPATCHES_PER_WINDOW / dt)
        return results

    key = jax.random.key(1)
    single_windows = timed(step, pts, labels, key, steps_per_dispatch=1)

    stack = jnp.broadcast_to(pts, (SCAN_K,) + pts.shape)
    lstack = jnp.broadcast_to(labels, (SCAN_K,) + labels.shape)
    keys = jax.random.split(jax.random.key(2), SCAN_K)
    multi_windows = timed(multi, stack, lstack, keys, steps_per_dispatch=SCAN_K)

    single = max(single_windows)
    fused = max(multi_windows)
    print(json.dumps({
        "metric": "finetune_clouds_per_sec",
        "value": round(fused, 1),
        "unit": "clouds/s/chip",
        "single_step_clouds_per_sec": round(single, 1),
        "scan_speedup": round(fused / single, 3),
        "single_windows": [round(w, 1) for w in single_windows],
        "multi_windows": [round(w, 1) for w in multi_windows],
        "batch": BATCH,
        "input_points": NPOINTS_IN,
        "scan_k": SCAN_K,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
