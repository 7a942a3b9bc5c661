"""ShapeNetPart segmentation fine-tune (reference
``main_finetune_segmentation.py``): per-point 50-part CE, category-restricted
argmax eval, instance/class mIoU.

  python -m gm3d_tpu.cli.finetune_seg --config configs/pointmae/seg_shapenetpart.yaml \
      --synthetic --epochs 2 ...
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ckpt import save_checkpoint
from gm3d_tpu.cli.common import base_parser, compute_dtype, load_config, resolve_batch_floor
from gm3d_tpu.config import build_model_from_cfg
from gm3d_tpu.data.datasets import SEG_CLASSES, DataLoader, build_dataset_from_cfg
from gm3d_tpu.train.optim import build_finetune_optimizer
from gm3d_tpu.train.schedules import cosine_warmup_schedule
from gm3d_tpu.train.segmentation import (
    make_seg_eval_step,
    make_seg_multi_step,
    make_seg_train_step,
    run_seg_val,
)
from gm3d_tpu.train.state import create_train_state
from gm3d_tpu.utils import JsonlLogger, MetricLogger, get_logger
from gm3d_tpu.utils.debug import check_finite_loss
from gm3d_tpu.utils.pipeline import DeferredMetrics
from gm3d_tpu.utils.preempt import PreemptionGuard

CLS_NAMES = sorted(SEG_CLASSES)


class SyntheticParts:
    """Synthetic part-seg data: octant of the unit sphere -> part id within
    the category's part list."""

    def __init__(self, num_samples=64, npoints=256, seed=0):
        self.num_samples = num_samples
        self.npoints = npoints
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        cls = idx % len(CLS_NAMES)
        parts = SEG_CLASSES[CLS_NAMES[cls]]
        pts = rng.standard_normal((self.npoints, 3)).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True).max()
        region = (pts[:, 0] > 0).astype(np.int64) + 2 * (pts[:, 1] > 0).astype(np.int64)
        seg = np.asarray(parts)[region % len(parts)]
        return CLS_NAMES[cls], "synthetic", (pts, cls, seg)


def parse_args():
    p = base_parser("part segmentation fine-tune")
    p.add_argument("--pretrained", default=None,
                   help="pretrain ckpt dir (orbax) or .pth")
    p.add_argument("--torch_ckpt", action="store_true", help="--pretrained is a torch .pth")
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="scan-fuse K train steps into one device dispatch "
                        "(see cli/finetune.py); a trailing partial group is "
                        "flushed as single steps. Set 1 to debug")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args)
    logger = get_logger("gm3d.seg", os.path.join(args.output_dir, "seg.log"))
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"))
    from gm3d_tpu.utils.logging import ScalarWriter

    # reference TB surface (engine_finetune_segmentation.py:173-174 'loss'/
    # 'lr'; the val writer's Metric/ACC is the classification copy — the real
    # seg metric is mIoU, tagged accordingly)
    tb = ScalarWriter(os.path.join(args.output_dir, "tfboard"))
    # SIGTERM (spot/preemptible VMs) -> checkpoint at the next step boundary
    guard = PreemptionGuard(logger).install()
    dtype = compute_dtype(args)

    model = build_model_from_cfg(cfg["model"], dtype=dtype)
    npoints = cfg.get("npoints", 2048)
    bs = cfg["total_bs"]
    from gm3d_tpu.cli.common import setup_mesh

    mesh, bshard = setup_mesh(args, bs, logger)
    if args.synthetic:
        train_ds = SyntheticParts(args.synthetic_samples, npoints, seed=1)
        val_ds = SyntheticParts(max(args.synthetic_samples // 4, 32), npoints, seed=2)
    else:
        train_ds = build_dataset_from_cfg(cfg["dataset"]["train"])
        val_ds = build_dataset_from_cfg(cfg["dataset"]["val"])
    # worker threads overlap the per-item load (txt->npy cached) with device
    # compute, like the other CLIs
    workers = getattr(args, "num_workers", 0)
    train_loader = None
    if getattr(args, "native_loader", False) and not args.synthetic:
        from gm3d_tpu.native import NativeLabelledCloudLoader, native_available

        if (native_available() and hasattr(train_ds, "_load_raw")
                and not getattr(train_ds, "use_normals", False)):
            # C++ threaded loader over the per-item .npy caches (N,7 layout):
            # materialise any missing caches once, then read binary forever
            paths, labels = [], []
            for name, path in train_ds.files:
                if not os.path.exists(path + ".npy"):
                    train_ds._load_raw(path)  # writes the cache atomically
                paths.append(path + ".npy")
                labels.append(train_ds.cls_ids[name])
            missing = [p for p in paths if not os.path.exists(p)]
            if missing:
                # read-only dataset dir: the cache write silently no-ops and
                # the C++ loader would skip every item -> zero train steps.
                # Fall back to the Python thread loader instead.
                logger.warning(
                    f"native loader disabled: {len(missing)} .npy caches could "
                    "not be written (read-only dataset dir?)")
            else:
                train_loader = NativeLabelledCloudLoader(
                    paths, labels, npoints, bs, num_workers=max(workers, 1),
                    seed=args.seed, with_seg=True)
                logger.info(f"native C++ loader over {len(paths)} cached items")
    if train_loader is None:
        train_loader = DataLoader(train_ds, bs, seed=args.seed, num_workers=workers)
    val_loader = DataLoader(val_ds, bs, shuffle=False, drop_last=False,
                            num_workers=workers)

    pts0, cls0, _ = next(iter(val_loader))
    variables = model.init(jax.random.key(args.seed), jnp.asarray(pts0[:2]), jnp.asarray(cls0[:2]))
    if args.pretrained:
        # seg model holds blocks at the module root -> flatten "blocks"
        from gm3d_tpu.ckpt.transfer import load_pretrained_into

        params, batch_stats, _ = load_pretrained_into(
            variables["params"], variables.get("batch_stats"), args.pretrained,
            torch_ckpt=args.torch_ckpt, logger=logger, flatten=("blocks",),
        )
        variables = dict(variables)
        variables["params"] = params
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
    epochs = cfg["max_epoch"]
    steps_per_epoch = max(len(train_loader), 1)
    # the published seg row came from the EXTERNAL Point-MAE segmentation
    # script (log Namespace: learning_rate=2e-4, warmup_epoch=10, epoch=300,
    # batch 16 — log_files/segmentation.txt:2): plain AdamW at the config lr
    # with cosine warmup, NO layer decay (layer decay is an HPM-main device;
    # the external script never had it). grad_norm_clip from the config.
    sched = cosine_warmup_schedule(cfg["optimizer"]["kwargs"]["lr"], 1e-6, 10, epochs,
                                   steps_per_epoch)
    tx = build_finetune_optimizer(variables["params"], sched,
                                  cfg["optimizer"]["kwargs"].get("weight_decay", 0.05),
                                  layer_decay=None,
                                  grad_clip=cfg.get("grad_norm_clip"))
    state = create_train_state(variables, tx)
    floor = resolve_batch_floor(args, logger)
    step_fn = make_seg_train_step(model, tx, batch_floor=floor)
    k_dispatch = args.steps_per_dispatch
    use_multi = k_dispatch > 1
    multi_fn = make_seg_multi_step(step_fn) if use_multi else None
    eval_step = make_seg_eval_step(model, batch_floor=floor)

    from gm3d_tpu.data.prefetch import device_prefetch
    from gm3d_tpu.parallel import replicate_tree

    state = replicate_tree(mesh, state)

    rng = jax.random.key(args.seed)
    best = {"instance_miou": 0.0, "class_miou": 0.0}
    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    start_epoch = 0
    if args.resume:
        from gm3d_tpu.ckpt import load_best_metrics, restore_checkpoint

        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = replicate_tree(mesh, restored)
            start_epoch = int(restored.step) // steps_per_epoch
            # restore best-so-far so a worse post-resume epoch can't
            # overwrite ckpt/best (same rationale as cli/finetune.py)
            bm = load_best_metrics(ckpt_dir)
            best = {"instance_miou": float(bm.get("instance_miou", 0.0)),
                    "class_miou": float(bm.get("class_miou", 0.0))}
            logger.info(f"resumed from step {int(restored.step)} (epoch "
                        f"{start_epoch}, best inst mIoU "
                        f"{best['instance_miou']*100:.2f})")
            # mid-epoch saves (--save_steps) leave a loader-position sidecar
            # naming the exact next batch (see cli/pretrain.py)
            from gm3d_tpu.ckpt import load_loader_state

            loader_token = load_loader_state(ckpt_dir)
            if loader_token:
                start_epoch = int(loader_token.get("epoch", start_epoch))
            if hasattr(train_loader, "load_state"):
                train_loader.load_state(
                    loader_token or {"epoch": start_epoch, "batch": 0})
    from gm3d_tpu.ckpt import AsyncCheckpointWriter, save_loader_state

    # saves snapshot the state on device and stream to disk from a background
    # thread, overlapping the slow D2H with training (ckpt/async_writer.py)
    writer = AsyncCheckpointWriter(enabled=not args.sync_save)
    last_saved_step = int(state.step)
    # host-side mirror of state.step (exact: one increment per dispatched
    # step) — reading the device scalar each iteration for --save_steps
    # would block on the in-flight dispatch (see cli/pretrain.py)
    host_step = last_saved_step
    try:
        for epoch in range(start_epoch, epochs):
            meter = MetricLogger()
            t0 = time.time()
            pending = []
            prefetcher = device_prefetch(train_loader, sharding=bshard)

            def maybe_save_steps():
                nonlocal last_saved_step
                if not args.save_steps:
                    return
                if host_step - last_saved_step < args.save_steps:
                    return
                # deferred NaN checks run BEFORE the rolling save so a corrupted
                # state never overwrites the last good checkpoint (cli/pretrain.py)
                dm.flush()
                step, token = host_step, (prefetcher.state()
                                          or {"epoch": epoch, "batch": 0})
                writer.submit(state, lambda s: (save_checkpoint(ckpt_dir, s, step),
                                                save_loader_state(ckpt_dir, token)))
                last_saved_step = step

            def preempt_save():
                # consistent here: in multi-dispatch mode this runs only right
                # after a full scanned group, so every yielded batch is trained.
                # Synchronous (the process exits next); drain the writer first.
                # Flush the metrics pipeline so deferred NaN checks run before
                # the state is persisted.
                dm.flush()
                writer.wait()
                save_checkpoint(ckpt_dir, state, int(state.step))
                save_loader_state(ckpt_dir,
                                  prefetcher.state() or {"epoch": epoch, "batch": 0})

            def drain_metrics(payload, k):
                # host read (blocks on that dispatch); every scanned step feeds
                # the meters so epoch averages cover all steps
                host = {k2: np.asarray(v) for k2, v in payload.items()}
                if k > 1:
                    for j in range(k):
                        meter.update(**{k2: float(v[j]) for k2, v in host.items()})
                    loss_val = float(np.sum(host["loss"]))
                else:
                    meter.update(**{k2: float(v) for k2, v in host.items()})
                    loss_val = float(host["loss"])
                # NaN-loss hard exit (engine semantics, engine_pretrain...:232-234)
                # — one dispatch late under the pipeline (utils/pipeline.py)
                check_finite_loss(loss_val, logger)

            # metrics are read one dispatch behind so the device queue never
            # drains on the tunnel round-trip (utils/pipeline.py)
            dm = DeferredMetrics(drain_metrics,
                                 depth=0 if args.sync_metrics else 1)

            for pts, cls_label, seg in prefetcher:
                rng, key = jax.random.split(rng)
                if use_multi:
                    pending.append((pts, cls_label, seg, key))
                    if len(pending) < k_dispatch:
                        continue
                    stacks = [jnp.stack(col) for col in zip(*pending)]
                    pending = []
                    state, mstack = multi_fn(state, *stacks)
                    host_step += k_dispatch
                    dm.push(mstack, k_dispatch)
                else:
                    state, metrics = step_fn(state, pts, cls_label, seg, key)
                    host_step += 1
                    dm.push(metrics, 1)
                maybe_save_steps()
                guard.exit_if_triggered(preempt_save)
            # flush a partial multi-dispatch group as single steps
            for pts, cls_label, seg, key in pending:
                state, metrics = step_fn(state, pts, cls_label, seg, key)
                host_step += 1
                dm.push(metrics, 1)
            # drain the pipeline: meters must be complete before the epoch stats
            dm.flush()

            def preempt_save_epoch_end():
                # all steps trained; skip the mIoU pass, resume at epoch+1
                writer.wait()
                save_checkpoint(ckpt_dir, state, int(state.step))
                save_loader_state(ckpt_dir, {"epoch": epoch + 1, "batch": 0})

            guard.exit_if_triggered(preempt_save_epoch_end)
            stats = meter.global_avgs()
            stats.update(epoch=epoch, time=round(time.time() - t0, 2))

            if (epoch + 1) % args.val_freq == 0 or epoch == epochs - 1:
                miou = run_seg_val(eval_step, state.variables(), val_loader,
                                   SEG_CLASSES, CLS_NAMES,
                                   depth=0 if args.sync_metrics else 4)
                stats["instance_miou"] = miou["instance_miou"] * 100
                stats["class_miou"] = miou["class_miou"] * 100
                if miou["instance_miou"] > best["instance_miou"]:
                    best = {k: miou[k] for k in ("instance_miou", "class_miou")}
                    from gm3d_tpu.ckpt import save_best_metrics

                    # default-arg binding: the writer thread may read these after
                    # the loop rebinds them (late-binding closure hazard)
                    writer.submit(state, lambda s, step=int(state.step),
                                  im=miou["instance_miou"], mb=dict(best): (
                        save_checkpoint(os.path.join(ckpt_dir, "best"), s, step,
                                        metrics={"instance_miou": im},
                                        max_to_keep=1),
                        save_best_metrics(ckpt_dir, mb)))
            # rolling last-epoch save (ckpt-last.pth parity) with the loader
            # sidecar in lockstep (see cli/pretrain.py)
            step, token = int(state.step), {"epoch": epoch + 1, "batch": 0}
            writer.submit(state, lambda s, step=step, token=token: (
                save_checkpoint(ckpt_dir, s, step),
                save_loader_state(ckpt_dir, token)))
            last_saved_step = step
            logger.info(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5g}" for k, v in stats.items() if isinstance(v, (int, float))))
            jsonl.write(stats)
            tb.add_scalar("loss", stats.get("loss", 0.0), epoch)
            tb.add_scalar("lr", float(sched(max(host_step - 1, 0))), epoch)
            if "instance_miou" in stats:
                tb.add_scalar("Metric/mIoU_I", stats["instance_miou"], epoch)
                tb.add_scalar("Metric/mIoU_C", stats["class_miou"], epoch)
            tb.flush()
    finally:
        # drain on ANY exit from the loop (injected test crash, NaN sys.exit,
        # real bug): the in-flight save is always of a NaN-checked state
        # (maybe_save_steps flushes the metrics pipeline before submitting),
        # so committing it is safe; without this the last save races process
        # exit (and a daemon writer killed mid-orbax-save at interpreter
        # shutdown aborts the process)
        writer.wait()
        # exception paths must not leak the installed SIGTERM handler into
        # the next in-process run (uninstall is idempotent)
        guard.uninstall()
    logger.info(f"best inst mIoU {best['instance_miou']*100:.2f} / "
                f"class mIoU {best['class_miou']*100:.2f}")
    return best


if __name__ == "__main__":
    main()
