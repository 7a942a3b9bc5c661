"""Export a trained model to a self-contained serving artifact (``.gm3dx``).

  # classifier (finetune config + checkpoint)
  python -m gm3d_tpu.cli.export_model --config configs/pointmae/finetune_modelnet.yaml \
      --ckpt experiments/ft/ckpt/best --out model.gm3dx --export_batch 256

  # frozen featurizer (pretrain config + checkpoint, SVM/kNN feature contract)
  python -m gm3d_tpu.cli.export_model --config configs/pointmae/config.yaml \
      --ckpt experiments/pt/ckpt --mode features --out feats.gm3dx

  # part segmentation (seg config + checkpoint; artifact takes (points,
  # cls_label) and returns per-point part logits)
  python -m gm3d_tpu.cli.export_model --config configs/pointmae/seg_shapenetpart.yaml \
      --ckpt experiments/seg/ckpt/best --mode segmentation --out seg.gm3dx

``--ckpt`` takes a checkpoint ROOT (the rolling ``.../ckpt`` dir — the
latest step is resolved automatically) or a pinned subdir like
``.../ckpt/best``.

The artifact is loadable WITHOUT this codebase's model code (see
``gm3d_tpu/serve/export.py``); serve it with ``gm3d_tpu.cli.serve``. The
reference has no equivalent — its checkpoints require the full training
stack to evaluate (``tools/runner_finetune.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.cli.common import base_parser, compute_dtype, load_config
from gm3d_tpu.config import build_model_from_cfg
from gm3d_tpu.utils import get_logger


def parse_args():
    p = base_parser("export a serving artifact")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .gm3dx path")
    p.add_argument("--mode", choices=["classifier", "features", "segmentation"],
                   default="classifier")
    p.add_argument("--model_family", choices=["gm3d", "pointmae", "m2ae"],
                   default="gm3d", help="pretrain family for --mode features")
    p.add_argument("--export_batch", type=int, default=128,
                   help="static batch baked into the artifact (requests are "
                        "padded/chunked onto it by ServingModel). Keep >= 128 "
                        "for TPU serving on this device: the remote compiler "
                        "SIGABRTs on these transformer graphs at batch <= 64 "
                        "(CLAUDE.md) — compilation happens at SERVE time")
    p.add_argument("--input_points", type=int, default=None,
                   help="points per input cloud (default: the config's "
                        "dataset N_POINTS; FPS to npoints is inside the "
                        "exported graph when larger)")
    p.add_argument("--platforms", default=None,
                   help="comma list of lowering targets, e.g. 'cpu,tpu' "
                        "(default: the current backend only)")
    p.add_argument("--quantize", choices=["int8"], default=None,
                   help="dynamic-int8 w8a8 quantization of every Dense "
                        "matmul (serve/quantize.py): 1.7x smaller artifact, "
                        "zero measured accuracy loss — but ~12% slower than "
                        "bf16 on this chip (docs/BENCHMARKS.md); use for "
                        "size-constrained deployments")
    return p.parse_args()


def _restore_or_init(args, model, npoints, n_input, logger):
    """Same contract as cli/evaluate.py: a bad --ckpt raises; no --ckpt
    warns and exports random init (smoke/test use only)."""
    if args.ckpt:
        from gm3d_tpu.ckpt import restore_raw

        raw = restore_raw(args.ckpt)
        if raw is None:
            raise FileNotFoundError(f"no checkpoint at {args.ckpt}")
        variables = {"params": raw["params"]}
        if raw.get("batch_stats") is not None:
            variables["batch_stats"] = raw["batch_stats"]
        logger.info(f"restored ckpt step {int(raw['step'])}")
        return variables, int(raw["step"])
    logger.warning("no --ckpt: exporting RANDOM weights")
    pts0 = jnp.asarray(np.zeros((2, n_input, 3), np.float32))
    if args.mode == "classifier":
        return model.init(jax.random.key(0), pts0[:, :npoints]), -1
    if args.mode == "segmentation":
        cls0 = jnp.zeros((2,), jnp.int32)
        return model.init(jax.random.key(0), pts0[:, :npoints], cls0), -1
    if args.model_family == "gm3d":
        from gm3d_tpu.masking import gm3d_num_mask

        num_mask = gm3d_num_mask(model.num_group, 0.6)
        mask0 = jnp.zeros((2, model.num_group), bool).at[:, :num_mask].set(True)
        return model.init(jax.random.key(0), pts0, mask0, num_mask), -1
    if args.model_family == "m2ae":
        vis0 = jnp.ones((2, model.num_groups[-1]), bool)
        return model.init(jax.random.key(0), pts0, vis0), -1
    mask0 = jnp.zeros((2, model.num_group), bool)
    return model.init(jax.random.key(0), pts0, mask0, 0), -1


def main():
    args = parse_args()
    cfg = load_config(args)
    logger = get_logger("gm3d.export")
    dtype = compute_dtype(args)
    npoints = cfg.get("npoints", 1024)
    n_input = args.input_points or npoints

    if args.mode in ("classifier", "segmentation"):
        model = build_model_from_cfg(cfg["model"], dtype=dtype)
        model_name = cfg["model"]["NAME"]
    elif args.model_family == "gm3d":
        from gm3d_tpu.models import GM3DStudent

        model = GM3DStudent(dtype=dtype)
        model_name = "GM3DStudent"
    else:
        model = build_model_from_cfg(cfg["model"], dtype=dtype)
        model_name = cfg["model"]["NAME"]

    if args.mode == "segmentation" and n_input != npoints:
        # seg outputs are PER-POINT: an in-graph FPS would relabel a
        # different cloud than the caller sent (serve/export.py build_seg_fn)
        raise ValueError(
            f"--mode segmentation requires --input_points == npoints "
            f"({npoints}); got {n_input}")

    variables, step = _restore_or_init(args, model, npoints, n_input, logger)
    if args.quantize == "int8":
        # pre-quantize so the int8 kernels serialize as baked constants
        from gm3d_tpu.serve.quantize import quantize_variables

        variables = quantize_variables(variables)

    from gm3d_tpu.serve.export import (
        build_classifier_fn,
        build_feature_fn,
        build_seg_fn,
        export_forward,
        save_artifact,
    )

    manifest = {
        "mode": args.mode,
        "model": model_name,
        "npoints": npoints,
        "ckpt_step": step,
        "compute_dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
        "quantization": args.quantize or "none",
    }
    if args.mode == "classifier":
        fn = build_classifier_fn(model, variables, npoints)
        example = jnp.zeros((args.export_batch, n_input, 3), jnp.float32)
    elif args.mode == "segmentation":
        fn = build_seg_fn(model, variables)
        example = (jnp.zeros((args.export_batch, npoints, 3), jnp.float32),
                   jnp.zeros((args.export_batch,), jnp.int32))
        # bake the category->parts table so the server can serve the
        # reference's category-restricted argmax without this codebase
        from gm3d_tpu.data.datasets import SEG_CLASSES

        manifest["seg_classes"] = {k: list(v) for k, v in SEG_CLASSES.items()}
        manifest["cls_names"] = sorted(SEG_CLASSES)
    else:
        fn = build_feature_fn(model, variables, npoints)
        example = jnp.zeros((args.export_batch, n_input, 3), jnp.float32)
    platforms = (tuple(p.strip() for p in args.platforms.split(","))
                 if args.platforms else None)
    exported = export_forward(fn, example, platforms, quantize=args.quantize)
    path = save_artifact(args.out, exported, manifest)
    logger.info(f"exported {args.mode} ({model_name}) -> {path} "
                f"platforms={list(exported.platforms)} "
                f"quantization={args.quantize or 'none'}")
    return path


if __name__ == "__main__":
    main()
