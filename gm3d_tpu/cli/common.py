"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import os
from typing import Tuple

import jax

# The axon TPU plugin ignores JAX_PLATFORMS (CLAUDE.md); GM3D_PLATFORM=cpu
# forces the backend for all CLIs (applied before first backend use).
if os.environ.get("GM3D_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["GM3D_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from gm3d_tpu.config import cfg_from_yaml_file
from gm3d_tpu.data.datasets import DataLoader, SyntheticClouds, build_dataset_from_cfg


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", required=True, help="YAML config (configs/...)")
    p.add_argument("--output_dir", default="./experiments/run")
    p.add_argument("--epochs", type=int, default=None, help="override max_epoch")
    p.add_argument("--batch_size", type=int, default=None, help="override total_bs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_freq", type=int, default=1)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save_steps", type=int, default=0,
                   help="also checkpoint every N optimizer steps WITHIN an "
                        "epoch (rolling last + loader-position sidecar); "
                        "resume continues mid-epoch without replaying "
                        "batches. 0 (default) = epoch-boundary saves only, "
                        "the reference cadence. With --native_loader the "
                        "loader position is epoch-granular (the resumed "
                        "epoch restarts from its first batch)")
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic clouds instead of on-disk datasets")
    p.add_argument("--synthetic_samples", type=int, default=512)
    p.add_argument("--bf16", action="store_true", help="bf16 compute dtype")
    p.add_argument("--native_loader", action="store_true",
                   help="use the C++ threaded cloud loader for ShapeNet-style "
                        ".npy datasets (gm3d_tpu/native)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all visible); the "
                        "global batch is sharded over a 1-D mesh and grads "
                        "psum over ICI (reference DDP, main_pretrain.py:389-391)")
    p.add_argument("--sync_save", action="store_true",
                   help="write checkpoints synchronously instead of from the "
                        "background writer (the default snapshots the state "
                        "on device and overlaps the save's device-to-host "
                        "transfer with training; ckpt/async_writer.py)")
    p.add_argument("--sync_metrics", action="store_true",
                   help="read each dispatch's metrics synchronously instead "
                        "of one dispatch behind (the default pipeline keeps "
                        "the device queue full through the remote-dispatch "
                        "round-trip; utils/pipeline.py)")
    p.add_argument("--batch_floor", type=int, default=None,
                   help="compile-shape floor: tile batches smaller than this "
                        "with exact copies inside the jit (numerically "
                        "transparent, train.finetune.floor_reps). Default: "
                        "128 on TPU (the axon compiler SIGABRTs at batch "
                        "<= 64), 0 elsewhere. 0 disables")
    return p


def resolve_batch_floor(args, logger=None) -> int:
    """--batch_floor, or the platform default (128 on TPU, 0 elsewhere)."""
    floor = getattr(args, "batch_floor", None)
    if floor is None:
        floor = 128 if jax.default_backend() == "tpu" else 0
    if floor and logger is not None:
        logger.info(f"batch floor {floor}: batches below it are tiled inside "
                    "the jit (exact replication; train.finetune.floor_reps)")
    return floor


def setup_mesh(args, batch: int, logger=None):
    """Data-parallel mesh + batch sharding for the training CLIs.

    Calls ``init_distributed()`` (no-op single-process), builds the 1-D
    ``data`` mesh, and validates the global batch divides the device count.
    Returns ``(mesh, batch_sharding)``.
    """
    from gm3d_tpu.parallel import batch_sharding, make_mesh
    from gm3d_tpu.parallel.multihost import init_distributed

    init_distributed()
    mesh = make_mesh(args.num_devices)
    n_dev = int(mesh.devices.size)
    if batch % n_dev:
        raise ValueError(
            f"global batch {batch} not divisible by {n_dev} devices; "
            "adjust --batch_size or --num_devices"
        )
    if logger and n_dev > 1:
        logger.info(f"data-parallel over {n_dev} devices ({mesh.devices.ravel()[0].platform})")
    # register the mesh for the fused-attention shard_map route (a 1-device
    # mesh registers too — it behaves as the plain single-device kernel call)
    from gm3d_tpu.models.blocks import set_fused_attention_mesh

    set_fused_attention_mesh(mesh if n_dev > 1 else None)
    return mesh, batch_sharding(mesh)


def enable_compile_cache():
    """Persistent XLA compile cache — first compiles over a TPU tunnel can
    take minutes; every CLI enables this."""
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/gm3d_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def load_config(args):
    enable_compile_cache()
    cfg = cfg_from_yaml_file(args.config)
    if args.epochs is not None:
        cfg["max_epoch"] = args.epochs
    if args.batch_size is not None:
        cfg["total_bs"] = args.batch_size
    os.makedirs(args.output_dir, exist_ok=True)
    return cfg


def compute_dtype(args):
    return jnp.bfloat16 if args.bf16 else jnp.float32


def make_loaders(cfg, args, labelled_for_svm: bool = True):
    """(train_loader, svm_train_loader, svm_test_loader) — SVM loaders yield
    (points, label), train loader yields bare points (ShapeNet contract)."""
    bs = cfg["total_bs"]
    npoints = cfg.get("npoints", 1024)
    if args.synthetic:
        train_ds = SyntheticClouds(args.synthetic_samples, npoints, seed=1)
        svm_tr = SyntheticClouds(max(args.synthetic_samples // 2, 64), npoints,
                                 num_classes=10, seed=2, labelled=True)
        svm_te = SyntheticClouds(max(args.synthetic_samples // 4, 64), npoints,
                                 num_classes=10, seed=3, labelled=True)
    else:
        train_ds = build_dataset_from_cfg(cfg["dataset"]["train"])
        svm_tr = build_dataset_from_cfg(cfg["dataset"]["extra_train_svm"])
        svm_te = build_dataset_from_cfg(cfg["dataset"]["extra_test_svm"])
    if getattr(args, "native_loader", False) and not args.synthetic:
        from gm3d_tpu.native import NativeCloudLoader, native_available

        if native_available() and hasattr(train_ds, "file_list"):
            paths = [
                os.path.join(train_ds.pc_path, f) for _, _, f in train_ds.file_list
            ]
            native = NativeCloudLoader(paths, npoints, bs,
                                       num_workers=args.num_workers, seed=args.seed)
            svm_train = _labelled(DataLoader(svm_tr, bs * 2, shuffle=False, drop_last=False))
            svm_test = _labelled(DataLoader(svm_te, bs * 2, shuffle=False, drop_last=False))
            return native, svm_train, svm_test
    train_loader = _points_only(
        DataLoader(train_ds, bs, seed=args.seed,
                   num_workers=getattr(args, "num_workers", 0))
    )
    # reference doubles the SVM loader batch (main_pretrain.py:262-263)
    svm_train = _labelled(DataLoader(svm_tr, bs * 2, shuffle=False, drop_last=False))
    svm_test = _labelled(DataLoader(svm_te, bs * 2, shuffle=False, drop_last=False))
    return train_loader, svm_train, svm_test


class _points_only:
    def __init__(self, loader):
        self.loader = loader

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield batch[0] if isinstance(batch, tuple) else batch

    def __getattr__(self, name):  # state()/load_state()/epoch passthrough
        return getattr(self.loader, name)


class _labelled:
    def __init__(self, loader):
        self.loader = loader

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        for batch in self.loader:
            yield batch  # (points, labels)

    def __getattr__(self, name):
        return getattr(self.loader, name)


def make_cls_loaders(cfg, args) -> Tuple:
    bs = cfg["total_bs"]
    npoints = cfg.get("npoints", 1024)
    if args.synthetic:
        ncls = cfg["model"].get("cls_dim", 40)
        train_ds = SyntheticClouds(args.synthetic_samples, npoints,
                                   num_classes=ncls, seed=1, labelled=True)
        val_ds = SyntheticClouds(max(args.synthetic_samples // 4, 64), npoints,
                                 num_classes=ncls, seed=2, labelled=True)
    else:
        train_ds = build_dataset_from_cfg(cfg["dataset"]["train"])
        val_ds = build_dataset_from_cfg(cfg["dataset"]["val"])
    workers = getattr(args, "num_workers", 0)
    return (
        _labelled(DataLoader(train_ds, bs, seed=args.seed, num_workers=workers)),
        _labelled(DataLoader(val_ds, bs, shuffle=False, drop_last=False,
                             num_workers=workers)),
    )
