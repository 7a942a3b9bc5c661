"""Classification fine-tune (reference ``main_finetune.py``): loads a
pretrain checkpoint (orbax or torch .pth with prefix surgery), layer-wise LR
decay, per-epoch accuracy validation, optional voting eval at the end.

  python -m gm3d_tpu.cli.finetune --config configs/pointmae/finetune_modelnet.yaml \
      --pretrained /path/to/ckpt [--torch_ckpt] [--vote] --synthetic ...
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ckpt import save_best_metrics, save_checkpoint
from gm3d_tpu.ckpt.transfer import load_pretrained_into
from gm3d_tpu.cli.common import (
    base_parser,
    compute_dtype,
    load_config,
    make_cls_loaders,
    resolve_batch_floor,
)
from gm3d_tpu.config import build_model_from_cfg
from gm3d_tpu.eval.metrics import accuracy
from gm3d_tpu.train.finetune import (
    make_eval_step,
    make_finetune_multi_step,
    make_finetune_train_step,
    make_vote_eval_step,
)
from gm3d_tpu.train.optim import build_finetune_optimizer
from gm3d_tpu.train.schedules import cosine_warmup_schedule
from gm3d_tpu.train.state import create_train_state
from gm3d_tpu.utils import JsonlLogger, MetricLogger, get_logger
from gm3d_tpu.utils.debug import check_finite_loss
from gm3d_tpu.utils.pipeline import DeferredMetrics
from gm3d_tpu.utils.preempt import PreemptionGuard


def parse_args():
    p = base_parser("classification fine-tune")
    p.add_argument("--pretrained", default=None, help="pretrain ckpt dir (orbax) or .pth")
    p.add_argument("--torch_ckpt", action="store_true", help="--pretrained is a torch .pth")
    p.add_argument("--vote", action="store_true", help="run 10x voting eval at the end")
    p.add_argument("--recipe", choices=["auto", "hpm", "legacy"], default="auto",
                   help="optimizer stack: 'legacy' = runner_finetune recipe "
                        "(config lr verbatim, per-epoch timm CosLR, clip to "
                        "grad_norm_clip, no layer decay — produced the MN40 "
                        "93.55); 'hpm' = main_finetune recipe (blr*bs/256 lr, "
                        "per-iteration cosine warmup 5, layer decay 0.75, no "
                        "clip — produced the 3 ScanObjectNN rows); 'auto' "
                        "picks by model family + dataset (docs/DESIGN.md §14)")
    p.add_argument("--blr", type=float, default=5e-4,
                   help="hpm recipe base lr: lr = blr * eff_bs / 256 "
                        "(main_finetune.py:345-346; published ScanObjectNN "
                        "logs peak at exactly this scaling)")
    p.add_argument("--eff_bs", type=int, default=None,
                   help="hpm recipe: effective batch size for the lr scaling "
                        "(batch_size*accum_iter*world_size in the reference). "
                        "Default: the PUBLISHED run's value for ScanObjectNN "
                        "splits (40/64/80, pinned by the logs' warmup-peak "
                        "train_lr), else total_bs*accum_iter")
    p.add_argument("--accum_iter", type=int, default=1,
                   help="gradient accumulation (reference --accum_iter; hpm "
                        "recipe accumulates the MEAN as engine_finetune.py:150, "
                        "legacy recipe the SUM as runner_finetune.py:150-160)")
    p.add_argument("--abs_lr", type=float, default=None,
                   help="hpm recipe: absolute lr override (--lr in the "
                        "reference; bypasses the blr scaling)")
    p.add_argument("--warmup_epochs", type=float, default=None,
                   help="warmup epochs; default 5 for hpm "
                        "(main_finetune.py:101), config initial_epochs for "
                        "legacy")
    p.add_argument("--clip_grad", type=float, default=None,
                   help="hpm recipe grad clip (reference --clip_grad default "
                        "None = no clipping)")
    p.add_argument("--layer_decay", type=float, default=0.75,
                   help="hpm recipe layer-wise lr decay (reference-effective "
                        "id mapping, see train/optim.py)")
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="scan-fuse K train steps into one device dispatch "
                        "(amortises dispatch latency; the finetune step is "
                        "small so the relative win exceeds pretrain's +22%%). "
                        "A trailing partial group is flushed as single steps. "
                        "Set 1 to debug step-by-step")
    p.add_argument("--smoothing", type=float, default=None,
                   help="label smoothing override. Default: the reference's "
                        "EFFECTIVE criterion — plain CE for the hpm recipe "
                        "(the LabelSmoothing branch in main_finetune.py:369-"
                        "376 is inside a dead triple-quoted block; the active "
                        "line :377 is torch.nn.CrossEntropyLoss()), and the "
                        "config's model.smooth for the legacy recipe (the "
                        "M2AE-family get_loss_acc knob, e.g. few-shot 0.3)")
    return p.parse_args()


def resolve_recipe(args, cfg) -> str:
    """Pick the finetune stack whose EFFECTIVE recipe produced the published
    number for this config (provenance pinned from the reference logs,
    docs/DESIGN.md §14):

      - ModelNet40 (93.55 / vote 94.16) and few-shot ran the LEGACY runner
        stack (``log_files/modelnet40.log``: legacy logger, ``config.
        optimizer.kwargs.lr : 0.0005`` + CosLR; experiment dir name
        ``...lr_5e_4...__93_55__``).
      - The 3 ScanObjectNN rows ran the HPM ``main_finetune.py`` stack: the
        published logs' peak ``train_lr`` equals blr*bs/256 exactly
        (obj_bg 7.81e-5 = 5e-4*40/256; obj_only 1.25e-4; hardest 1.56e-4)
        with the 5-epoch warmup peak — not the config's 5e-4.
      - Point_M2AE published finetunes ALL ran the HPM stack — including
        ModelNet40: every ``Point-M2AE_SA3D/log_files/*.txt`` is an
        MAE-style json log whose warmup ramp is exactly blr*eff_bs/256 over
        5 epochs into a 500-epoch cosine (modelnet40.txt peak 1.5625e-4).
        Only few-shot (legacy-format ``fewshot-Point-M2AE.yaml``) stays on
        the legacy runner.
    """
    if args.recipe != "auto":
        return args.recipe
    name = cfg["dataset"]["train"].get("_base_", {}).get("NAME", "")
    if cfg["model"]["NAME"].startswith("Point_M2AE"):
        # exact "ModelNet": ModelNetFewShot must stay legacy
        if name.startswith("ScanObjectNN") or name == "ModelNet":
            return "hpm"
        return "legacy"
    return "hpm" if name.startswith("ScanObjectNN") else "legacy"


def published_eff_bs(cfg) -> int | None:
    """Effective batch size of the PUBLISHED hpm-recipe runs, pinned by the
    logs' warmup-peak ``train_lr`` (= blr*eff_bs/256 at blr 5e-4, warmup 5)
    — and DIFFERENT per model family:

      Point-MAE (``Point-MAE_SA3D/log_files``):
      - obj_bg   peak 7.8125e-5 -> eff_bs 40
      - obj_only peak 1.25e-4   -> eff_bs 64
      - hardest  peak 1.5625e-4 -> eff_bs 80

      Point-M2AE (``Point-M2AE_SA3D/log_files``):
      - obj_bg     peak 7.8125e-5 -> eff_bs 40
      - obj_only   peak 1.5625e-4 -> eff_bs 80
      - hardest    peak 7.8125e-5 -> eff_bs 40
      - modelnet40 peak 1.5625e-4 -> eff_bs 80

    The reference CONFIGS all say ``total_bs: 64`` — but the HPM main's lr
    comes from ``args.batch_size*accum_iter*world_size``, not the config, and
    only PMAE-obj_only's run matches 64. Returns None when no published
    hpm-recipe row pins this config."""
    train = cfg["dataset"]["train"].get("_base_", {})
    name, root = train.get("NAME", ""), str(train.get("ROOT", ""))
    if cfg["model"]["NAME"].startswith("Point_M2AE"):
        if name == "ScanObjectNN_hardest":
            return 40
        if name == "ScanObjectNN":
            return 80 if "nobg" in root else 40
        if name == "ModelNet":
            return 80
        return None
    if name == "ScanObjectNN_hardest":
        return 80
    if name == "ScanObjectNN":
        return 64 if "nobg" in root else 40
    return None


def evaluate(loader, eval_step, variables, put=jnp.asarray):
    # device futures are held until after the LAST batch is enqueued: the
    # device streams through the whole eval set back-to-back instead of
    # idling one dispatch round-trip per batch (same rationale as the
    # training-loop metrics pipeline, utils/pipeline.py)
    logits_all, labels_all = [], []
    for pts, labels in loader:
        logits_all.append(eval_step(variables, put(pts)))
        labels_all.append(np.asarray(labels))
    return accuracy(np.concatenate([np.asarray(l) for l in logits_all]),
                    np.concatenate(labels_all)) * 100.0


def resolve_smoothing(override, recipe: str, cfg) -> float:
    """Effective label smoothing per stack: plain CE for hpm (the reference's
    LabelSmoothing branch is dead code — ``main_finetune.py:369-376`` is a
    triple-quoted string; the active ``:377`` is ``torch.nn.
    CrossEntropyLoss()``, and the published hpm logs' ~5e-4 train_loss floors
    rule smoothing out); the config's ``model.smooth`` for legacy (the
    M2AE-family ``get_loss_acc`` knob — Point-MAE's is plain CE and its
    configs set no smooth)."""
    if override is not None:
        return override
    if recipe == "hpm":
        return 0.0
    return cfg["model"].get("smooth", 0.0)


def vote_gate(acc: float, better: bool) -> bool:
    """In-training vote trigger (tools/runner_finetune.py:211-212): vote
    validation only once plain accuracy clears the reference's hardcoded
    MN40 thresholds — acc > 92.1 always, or a new best above 91."""
    return acc > 92.1 or (better and acc > 91)


def evaluate_vote(loader, vote_step, variables, key, put=jnp.asarray):
    """One 10-vote pass over the loader (tools/runner_finetune.py
    validate_vote / test_vote inner loop). ``put`` places each batch on
    device (the evaluate CLI passes its mesh-sharding placement)."""
    logits_all, labels_all = [], []
    for pts, labels in loader:
        key, k2 = jax.random.split(key)
        # deferred host read — see evaluate()
        logits_all.append(vote_step(variables, put(pts), k2))
        labels_all.append(np.asarray(labels))
    return accuracy(np.concatenate([np.asarray(l) for l in logits_all]),
                    np.concatenate(labels_all)) * 100.0


def main():
    args = parse_args()
    cfg = load_config(args)
    logger = get_logger("gm3d.finetune", os.path.join(args.output_dir, "finetune.log"))
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"))
    from gm3d_tpu.utils.logging import ScalarWriter

    # reference TB surface: engine train scalars 'loss'/'lr'
    # (engine_finetune.py:177-178, per-epoch granularity here) and the val
    # writer's 'Metric/ACC' (main_finetune.py:538)
    tb = ScalarWriter(os.path.join(args.output_dir, "tfboard"))
    # SIGTERM (spot/preemptible VMs) -> checkpoint at the next step boundary
    guard = PreemptionGuard(logger).install()
    dtype = compute_dtype(args)

    model = build_model_from_cfg(cfg["model"], dtype=dtype)
    npoints = cfg.get("npoints", 1024)
    epochs = cfg["max_epoch"]
    from gm3d_tpu.cli.common import setup_mesh

    mesh, bshard = setup_mesh(args, cfg["total_bs"], logger)
    train_loader, val_loader = make_cls_loaders(cfg, args)
    steps_per_epoch = max(len(train_loader), 1)

    pts0, _ = next(iter(val_loader))
    variables = model.init(jax.random.key(args.seed), jnp.asarray(pts0[:2, :npoints]))
    params, batch_stats = variables["params"], variables.get("batch_stats")

    if args.pretrained:
        params, batch_stats, _ = load_pretrained_into(
            params, batch_stats, args.pretrained, torch_ckpt=args.torch_ckpt, logger=logger
        )

    recipe = resolve_recipe(args, cfg)
    if recipe == "hpm" and args.epochs is None:
        # the HPM main never reads config max_epoch — epochs come only from
        # --epochs (default 500, main_finetune.py:72), and every published
        # hpm log ran the full 500-epoch cosine (configs say 300, unused)
        epochs = 500
        logger.info("recipe hpm: --epochs not given, using the reference "
                    "main's default 500 (config max_epoch is never read by "
                    "the HPM stack)")
    wd = cfg["optimizer"]["kwargs"]["weight_decay"]
    # under accumulation the optimizer (and its schedule) ticks once per
    # UPDATE, not per micro-batch (same axis fix as cli/pretrain.py:152-158)
    updates_per_epoch = max(steps_per_epoch // args.accum_iter, 1)
    if recipe == "hpm":
        # main_finetune.py: lr = blr * eff_bs / 256, per-iteration cosine
        # with 5-epoch warmup, layer decay 0.75, no clip, torch-default betas
        from gm3d_tpu.train.schedules import effective_lr

        eff_bs = args.eff_bs if args.eff_bs is not None else published_eff_bs(cfg)
        if eff_bs is None:
            eff_bs = cfg["total_bs"] * args.accum_iter
        elif eff_bs != cfg["total_bs"] * args.accum_iter:
            logger.info(
                f"hpm lr uses the PUBLISHED run's effective bs {eff_bs} "
                f"(log-pinned, see published_eff_bs) while the actual batch "
                f"stays total_bs={cfg['total_bs']}; pass --eff_bs to override")
        lr = args.abs_lr if args.abs_lr is not None else effective_lr(
            args.blr, eff_bs, 1)
        warmup = args.warmup_epochs if args.warmup_epochs is not None else 5
        sched = cosine_warmup_schedule(lr, 1e-6, warmup, epochs, updates_per_epoch)
        tx = build_finetune_optimizer(
            params, sched, wd, layer_decay=args.layer_decay,
            grad_clip=args.clip_grad, accum_steps=args.accum_iter,
        )
        logger.info(f"recipe hpm: lr {lr:.3g} (blr {args.blr}, eff_bs {eff_bs}), "
                    f"warmup {warmup}, layer_decay {args.layer_decay}, "
                    f"clip {args.clip_grad}, accum {args.accum_iter}")
    else:
        # tools/runner_finetune.py: config lr verbatim, per-epoch timm CosLR
        # with step lag, token-free wd mask, clip to grad_norm_clip, NO
        # layer decay. Cosine horizon = scheduler.kwargs.epochs (the value
        # tools/builder.py:67-76 reads), NOT the possibly-CLI-overridden
        # max_epoch — same convention as cli/pretrain.py's legacy branch.
        from gm3d_tpu.train.optim import build_legacy_adamw
        from gm3d_tpu.train.schedules import legacy_cosine_epoch_schedule

        lr = cfg["optimizer"]["kwargs"]["lr"]
        warmup = (args.warmup_epochs if args.warmup_epochs is not None
                  else cfg["scheduler"]["kwargs"]["initial_epochs"])
        # legacy configs always carry a scheduler block (initial_epochs was
        # just indexed above); only the `epochs` key is optional
        horizon = cfg["scheduler"]["kwargs"].get("epochs", epochs)
        sched = legacy_cosine_epoch_schedule(lr, horizon, warmup, updates_per_epoch)
        tx = build_legacy_adamw(sched, wd, accum_steps=args.accum_iter,
                                grad_clip=cfg.get("grad_norm_clip"))
        logger.info(f"recipe legacy: lr {lr:.3g}, warmup {warmup}, horizon "
                    f"{horizon}, clip {cfg.get('grad_norm_clip')}, "
                    f"accum {args.accum_iter}")
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    state = create_train_state(variables, tx)

    smoothing = resolve_smoothing(args.smoothing, recipe, cfg)
    if smoothing:
        logger.info(f"label smoothing {smoothing}")
    floor = resolve_batch_floor(args, logger)
    step_fn = make_finetune_train_step(model, tx, npoints, smoothing,
                                       batch_floor=floor)
    k_dispatch = args.steps_per_dispatch
    use_multi = k_dispatch > 1
    multi_fn = make_finetune_multi_step(step_fn) if use_multi else None
    eval_step = make_eval_step(model, npoints, batch_floor=floor)

    from gm3d_tpu.data.prefetch import device_prefetch
    from gm3d_tpu.parallel import replicate_tree

    state = replicate_tree(mesh, state)

    rng = jax.random.key(args.seed)
    best, best_vote, vote_step = 0.0, 0.0, None
    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    start_epoch = 0
    if args.resume:
        from gm3d_tpu.ckpt import load_best_metrics, restore_checkpoint

        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = replicate_tree(mesh, restored)
            start_epoch = int(restored.step) // steps_per_epoch
            # restore best-so-far so a worse post-resume epoch can't
            # overwrite ckpt/best (legacy runner restores best_metrics,
            # tools/builder.py:109-115)
            bm = load_best_metrics(ckpt_dir)
            best = float(bm.get("best", 0.0))
            best_vote = float(bm.get("best_vote", 0.0))
            logger.info(f"resumed from step {int(restored.step)} (epoch "
                        f"{start_epoch}, best {best:.2f}, best_vote "
                        f"{best_vote:.2f})")
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
                    # sum is non-finite iff any step's loss is (NaN/inf propagate)
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

            for pts, labels in prefetcher:
                rng, key = jax.random.split(rng)
                if use_multi:
                    pending.append((pts, labels, key))
                    if len(pending) < k_dispatch:
                        continue
                    stack = jnp.stack([p for p, _, _ in pending])
                    lstack = jnp.stack([l for _, l, _ in pending])
                    keys = jnp.stack([k for _, _, k in pending])
                    pending = []
                    state, mstack = multi_fn(state, stack, lstack, keys)
                    host_step += k_dispatch
                    dm.push(mstack, k_dispatch)
                else:
                    state, metrics = step_fn(state, pts, labels, key)
                    host_step += 1
                    dm.push(metrics, 1)
                maybe_save_steps()
                guard.exit_if_triggered(preempt_save)
            # flush a partial multi-dispatch group as single steps
            for pts, labels, key in pending:
                state, metrics = step_fn(state, pts, labels, key)
                host_step += 1
                dm.push(metrics, 1)
            # drain the pipeline: meters must be complete before the epoch stats
            dm.flush()

            def preempt_save_epoch_end():
                # all steps trained; skip the validation pass, resume at epoch+1
                writer.wait()
                save_checkpoint(ckpt_dir, state, int(state.step))
                save_loader_state(ckpt_dir, {"epoch": epoch + 1, "batch": 0})

            guard.exit_if_triggered(preempt_save_epoch_end)
            stats = meter.global_avgs()
            stats.update(epoch=epoch, time=round(time.time() - t0, 2))
            if (epoch + 1) % args.val_freq == 0 or epoch == epochs - 1:
                acc = evaluate(val_loader, eval_step, state.variables())
                stats["val_acc"] = acc
                better = acc > best
                if better:
                    best = acc
                    # default-arg binding: the writer thread may read these after
                    # the loop rebinds them (late-binding closure hazard)
                    writer.submit(state, lambda s, step=int(state.step), a=acc,
                                  mb={"best": best, "best_vote": best_vote}: (
                        save_checkpoint(os.path.join(ckpt_dir, "best"), s, step,
                                        metrics={"acc": a}, max_to_keep=1),
                        save_best_metrics(ckpt_dir, mb)))
                # in-training gated vote validation (tools/runner_finetune.py:
                # 211-218), tracking a separate ckpt-best_vote
                if args.vote and vote_gate(acc, better):
                    if vote_step is None:
                        vote_step = make_vote_eval_step(model, npoints,
                                                        batch_floor=floor)
                    rng, key = jax.random.split(rng)
                    vacc = evaluate_vote(val_loader, vote_step, state.variables(), key)
                    stats["val_vote_acc"] = vacc
                    logger.info(f"[Validation_vote] EPOCH: {epoch}  acc_vote = {vacc:.4f}")
                    if vacc > best_vote:
                        best_vote = vacc
                        writer.submit(state, lambda s, step=int(state.step),
                                      va=vacc, mb={"best": best,
                                                   "best_vote": best_vote}: (
                            save_checkpoint(os.path.join(ckpt_dir, "best_vote"), s,
                                            step, metrics={"acc_vote": va},
                                            max_to_keep=1),
                            save_best_metrics(ckpt_dir, mb)))
            # rolling last-epoch save (ckpt-last.pth parity, tools/builder.py:128-137)
            # with the loader sidecar in lockstep (see cli/pretrain.py)
            step, token = int(state.step), {"epoch": epoch + 1, "batch": 0}
            writer.submit(state, lambda s, step=step, token=token: (
                save_checkpoint(ckpt_dir, s, step),
                save_loader_state(ckpt_dir, token)))
            last_saved_step = step
            logger.info(f"epoch {epoch}: " + " ".join(
                f"{k}={v:.5g}" for k, v in stats.items() if isinstance(v, (int, float))))
            jsonl.write(stats)
            tb.add_scalar("loss", stats.get("loss", 0.0), epoch)
            # max_lr of the epoch = schedule at its last optimizer UPDATE
            # (the schedule axis under --accum_iter; host-side, pure fn, no
            # device read)
            tb.add_scalar("lr", float(sched(
                max(host_step // max(args.accum_iter, 1) - 1, 0))), epoch)
            if "val_acc" in stats:
                tb.add_scalar("Metric/ACC", stats["val_acc"], epoch)
            if "val_vote_acc" in stats:
                tb.add_scalar("Metric/ACC_vote", stats["val_vote_acc"], epoch)
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

    if args.vote:
        if vote_step is None:
            vote_step = make_vote_eval_step(model, npoints, batch_floor=floor)
        rng, key = jax.random.split(rng)
        vote_acc = evaluate_vote(val_loader, vote_step, state.variables(), key)
        logger.info(f"[TEST_VOTE] acc = {vote_acc:.4f}")
        jsonl.write({"vote_acc": vote_acc})
        if best_vote:
            logger.info(f"best in-training vote acc {best_vote:.2f} "
                        f"(ckpt/best_vote)")
    guard.uninstall()
    logger.info(f"best val acc {best:.2f}")
    return best


if __name__ == "__main__":
    main()
