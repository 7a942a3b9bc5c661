"""Accuracy delta of the dynamic-int8 serving export vs the fp forward.

Runs a trained classifier checkpoint over a labelled eval set (synthetic by
default — the real datasets are not in this container) twice: the plain eval
forward and the w8a8-quantized one (serve/quantize.py), and reports accuracy
plus logit agreement. CPU-safe (pure forwards).

    python scripts/quantize_accuracy.py --ckpt /path/to/ckpt \
        [--config configs/pointmae/finetune_modelnet.yaml] [--samples 2560]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _bootstrap  # noqa: F401,E402  repo-root path + GM3D_PLATFORM forcing (scripts/_bootstrap.py)



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config", default="configs/pointmae/finetune_modelnet.yaml")
    ap.add_argument("--samples", type=int, default=2560)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gm3d_tpu.ckpt import restore_raw
    from gm3d_tpu.config import build_model_from_cfg, cfg_from_yaml_file
    from gm3d_tpu.data.datasets import DataLoader, SyntheticClouds
    from gm3d_tpu.serve.quantize import quantize_variables, quantized_dense
    from gm3d_tpu.train.finetune import make_eval_step

    cfg = cfg_from_yaml_file(args.config)
    npoints = cfg.get("npoints", 1024)
    model = build_model_from_cfg(cfg["model"])
    raw = restore_raw(args.ckpt)
    if raw is None:
        raise FileNotFoundError(args.ckpt)
    variables = {"params": raw["params"]}
    if raw.get("batch_stats") is not None:
        variables["batch_stats"] = raw["batch_stats"]

    ds = SyntheticClouds(args.samples, npoints, seed=3, labelled=True)
    loader = DataLoader(ds, args.batch, shuffle=False, drop_last=False)

    # ragged last batches (drop_last=False) tile to the TPU compile-shape
    # floor, matching every CLI (CLAUDE.md small-batch compiler SIGABRT)
    floor = 0 if jax.default_backend() != "tpu" else 128
    fp_step = make_eval_step(model, npoints, batch_floor=floor)
    # quantized twin: same eval body, traced under the interceptor with
    # pre-quantized kernels
    q_vars = quantize_variables(variables)

    @jax.jit
    def q_forward(v, pts):
        from gm3d_tpu.ops.fps import fps
        from gm3d_tpu.train.finetune import floor_reps

        x = fps(pts, npoints) if pts.shape[1] > npoints else pts
        reps = floor_reps(x.shape[0], floor)
        if reps > 1:
            x = jnp.tile(x, (reps, 1, 1))
        with quantized_dense():
            return model.apply(v, x, deterministic=True)[: pts.shape[0]]

    n = agree = fp_correct = q_correct = 0
    max_rel = 0.0
    for pts, labels in loader:
        pts_j = jnp.asarray(pts)
        fp_logits = np.asarray(fp_step(variables, pts_j))
        q_logits = np.asarray(q_forward(q_vars, pts_j))
        fp_pred, q_pred = fp_logits.argmax(-1), q_logits.argmax(-1)
        n += len(labels)
        agree += int((fp_pred == q_pred).sum())
        fp_correct += int((fp_pred == np.asarray(labels)).sum())
        q_correct += int((q_pred == np.asarray(labels)).sum())
        max_rel = max(max_rel, float(np.abs(q_logits - fp_logits).max()
                                     / max(np.abs(fp_logits).max(), 1e-9)))

    print(json.dumps({
        "fp_acc": round(fp_correct / n, 4),
        "int8_acc": round(q_correct / n, 4),
        "argmax_agreement": round(agree / n, 4),
        "max_logit_rel_err": round(max_rel, 4),
        "samples": n,
    }))


if __name__ == "__main__":
    main()
