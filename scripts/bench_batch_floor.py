"""Measure the batch-floor tiling tax on small-batch finetune steps.

The compile-shape floor (``train/finetune.py::floor_reps``, DESIGN.md §16)
tiles sub-128 batches with exact copies inside the jit to dodge this TPU's
batch<=64 compiler SIGABRT. The SIGABRT was re-probed HEALED late round 3
(CLAUDE.md), so ``--batch_floor 0`` is usable again — this script quantifies
what the insurance costs: the reference's bs=32 ScanObjectNN finetune step
with floor 128 (4x tiled FLOPs) vs floor 0 (native small batch), bench
methodology (forced host read of a scalar), one JSON line for
docs/BENCHMARKS.md.

Usage: PYTHONPATH=.:/root/.axon_site python scripts/bench_batch_floor.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing


BATCH = 32
NPOINTS_IN = 2048  # ScanObjectNN-shaped input (hardest split recipe)
NPOINTS = 2048
WINDOWS = 2
DISPATCHES_PER_WINDOW = 8


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
    from gm3d_tpu.train.finetune import make_finetune_train_step
    from gm3d_tpu.train.optim import build_finetune_optimizer
    from gm3d_tpu.train.state import create_train_state

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = cfg_from_yaml_file(
        os.path.join(repo_root, "configs/pointmae/config_finetune_scan_hardest.yaml")
    )
    model = build_model_from_cfg(cfg["model"], dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(BATCH, NPOINTS_IN, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, cfg["model"]["cls_dim"], BATCH))
    variables = model.init(jax.random.key(0), pts[:, :NPOINTS])
    tx = build_finetune_optimizer(variables["params"], 5e-4)

    def timed(batch_floor):
        step = make_finetune_train_step(model, tx, npoints=NPOINTS,
                                        batch_floor=batch_floor)
        key = jax.random.key(1)
        state = create_train_state(variables, tx)
        state, m = step(state, pts, labels, key)  # warm (compile)
        _ = float(np.sum(np.asarray(m["loss"])))  # forced host read
        results = []
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            for _ in range(DISPATCHES_PER_WINDOW):
                state, m = step(state, pts, labels, key)
            _ = float(np.sum(np.asarray(m["loss"])))
            dt = time.perf_counter() - t0
            results.append(BATCH * DISPATCHES_PER_WINDOW / dt)
        return results

    floored = timed(128)
    native = timed(0)
    print(json.dumps({
        "metric": "finetune_bs32_clouds_per_sec",
        "value": round(max(native), 1),
        "unit": "clouds/s/chip",
        "floored_clouds_per_sec": round(max(floored), 1),
        "native_over_floored": round(max(native) / max(floored), 3),
        "native_windows": [round(w, 1) for w in native],
        "floored_windows": [round(w, 1) for w in floored],
        "batch": BATCH,
        "batch_floor": 128,
        "input_points": NPOINTS_IN,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
