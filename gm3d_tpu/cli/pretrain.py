"""GM3D / Point-MAE / Point-M2AE pretraining (reference ``main_pretrain.py`` +
legacy ``tools/runner_pretrain.py`` + M2AE pretrain in one entry).

Examples:
  # GM3D (geometric masking + distillation), synthetic smoke:
  python -m gm3d_tpu.cli.pretrain --config configs/pointmae/config.yaml \
      --synthetic --epochs 2 --batch_size 32 --output_dir /tmp/run

  # teacher pretraining (legacy Point-MAE path):
  python -m gm3d_tpu.cli.pretrain --config configs/pointmae/config_m.yaml \
      --model_family pointmae ...

  # Point-M2AE:
  python -m gm3d_tpu.cli.pretrain --config configs/m2ae/config_Point_M2AE.yaml \
      --model_family m2ae ...
"""

from __future__ import annotations

import argparse
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ckpt import restore_checkpoint, save_checkpoint
from gm3d_tpu.ckpt.torch_import import POINT_MAE_MAP, import_torch_checkpoint, load_torch_file
from gm3d_tpu.cli.common import (
    base_parser,
    compute_dtype,
    load_config,
    make_loaders,
    resolve_batch_floor,
)
from gm3d_tpu.config import build_model_from_cfg
from gm3d_tpu.eval.svm import svm_probe
from gm3d_tpu.models import GM3DStudent, PointMAE
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.pretrain import (
    make_gm3d_train_step,
    make_m2ae_gm3d_train_step,
    make_m2ae_train_step,
    make_pointmae_train_step,
)
from gm3d_tpu.train.schedules import (
    cosine_warmup_schedule,
    effective_lr,
    ema_decay_schedule,
    loss_weights,
)
from gm3d_tpu.train.state import create_train_state
from gm3d_tpu.masking import keep_ratio_schedule
from gm3d_tpu.utils import JsonlLogger, MetricLogger, get_logger
from gm3d_tpu.utils.debug import check_finite_loss
from gm3d_tpu.utils.pipeline import DeferredMetrics
from gm3d_tpu.utils.preempt import PreemptionGuard


def parse_args():
    p = base_parser("GM3D pretraining")
    p.add_argument("--model_family", choices=["gm3d", "pointmae", "m2ae", "m2ae_gm3d"],
                   default="gm3d")
    p.add_argument("--mode", choices=["feature", "usual"], default="feature")
    p.add_argument("--mask_ratio", type=float, default=0.6)
    p.add_argument("--dino_path", default=None,
                   help="teacher .pth (reference pretrain_PMAE.pth) — random teacher if absent")
    p.add_argument("--teacher_ckpt", default=None,
                   help="orbax ckpt dir from an in-framework teacher pretrain "
                        "(--model_family pointmae run)")
    p.add_argument("--teacher_config", default=None,
                   help="teacher YAML (defaults to config_m.yaml beside --config)")
    p.add_argument("--learn_feature_loss", choices=["dino", "ema", "clip", "none"],
                   default="dino",
                   help="dino = frozen Point-MAE teacher distillation (default); "
                        "ema = EMA feature targets; clip = frozen CLIP vision "
                        "tower over depth renders (--clip_path); "
                        "none = Chamfer-only (usual mode)")
    p.add_argument("--clip_path", default=None,
                   help="CLIP .pt/.pth checkpoint for --learn_feature_loss clip "
                        "(reference --clip_path); small random tower if absent")
    p.add_argument("--no_learning_loss", action="store_true")
    p.add_argument("--relative", action="store_true", default=True)
    p.add_argument("--shared_learnable_tokens", action="store_true")
    p.add_argument("--student_variant", choices=["svm", "legacy"], default="svm",
                   help="'legacy' = the OLDER student variant "
                        "(models_mae_learn_loss.py:30-846, the model "
                        "main_pretrain_multi_gpu.py/engine_pretrain.py drive): "
                        "shared encoder/decoder pos embed, single shared mask "
                        "token, Chamfer-only loss, uncapped (e+1)/E*0.5 keep "
                        "ramp. Trajectory-pinned by "
                        "test_trajectory_parity.py[multi_gpu]")
    p.add_argument("--after_200_epoch", action="store_true")
    p.add_argument("--after_epoch", type=int, default=15)
    p.add_argument("--loss_multiply_by", type=float, nargs=2, default=[13.889, 1000.0])
    p.add_argument("--blr", type=float, default=1e-3)
    p.add_argument("--warmup_epochs", type=int, default=40)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--accum_iter", type=int, default=1)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="scan this many train steps inside one device dispatch "
                        "(amortises controller latency; gm3d/m2ae_gm3d families). "
                        "Default 8 matches bench.py — per-step dispatch costs "
                        "measurable throughput under a remote controller. All "
                        "K steps' metrics feed the meters; a partial trailing "
                        "group is flushed as single steps. Set 1 to debug "
                        "step-by-step")
    p.add_argument("--classification", action="store_true",
                   help="train a supervised Classifier probe alongside (reference --classification)")
    p.add_argument("--sync_probe", action="store_true",
                   help="run the per-epoch SVM probe synchronously. The "
                        "default overlaps the probe (host-bound sklearn fit) "
                        "with the next epoch's training against a device-side "
                        "state snapshot; the epoch's log line is emitted when "
                        "its probe finishes. Multi-process runs are always "
                        "synchronous (the feature gather is a collective)")
    p.add_argument("--sync_bn", default=True, action=argparse.BooleanOptionalAction,
                   help="synced BatchNorm stats across data-parallel shards "
                        "(reference --sync_bn, tools/runner_pretrain.py:88-91). "
                        "Always on here: jit/GSPMD computes global-batch "
                        "statistics by construction; per-replica BN is a DDP "
                        "artifact this framework does not reproduce")
    p.add_argument("--save_interval", type=int, default=100,
                   help="periodic epoch snapshots under <ckpt>/epochs "
                        "(reference saves every 100 epochs); 0 disables")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace (TensorBoard/Perfetto) "
                        "of the first --profile_steps DISPATCHES (each holds "
                        "--steps_per_dispatch train steps)")
    p.add_argument("--profile_steps", type=int, default=5)
    p.add_argument("--shared_opt", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="one optimizer over all params (reference default); "
                        "--no-shared_opt = separated recon / loss-pred "
                        "optimizers (train_one_epoch_seperated)")
    p.add_argument("--quantize_ema", action="store_true",
                   help="opt-in perf lever, PARITY-BREAKING: run the "
                        "grad-free EMA forward's matmuls as dynamic-int8 "
                        "w8a8 (serve/quantize.py). Only the mask ranking "
                        "sees the noise; numbers in docs/BENCHMARKS.md")
    return p.parse_args()


def build_teacher(args, cfg, dtype):
    from gm3d_tpu.config import cfg_from_yaml_file

    tc_path = args.teacher_config or os.path.join(os.path.dirname(args.config), "config_m.yaml")
    tcfg = cfg_from_yaml_file(tc_path) if os.path.exists(tc_path) else cfg
    teacher = build_model_from_cfg(tcfg["model"], dtype=dtype)
    return teacher


def main():
    args = parse_args()
    cfg = load_config(args)
    logger = get_logger("gm3d", os.path.join(args.output_dir, "pretrain.log"))
    jsonl = JsonlLogger(os.path.join(args.output_dir, "log.txt"))
    from gm3d_tpu.utils.logging import ScalarWriter

    tb = ScalarWriter(os.path.join(args.output_dir, "tfboard"))
    # preemptible/spot TPU VMs deliver SIGTERM with a grace window; the
    # guard checkpoints at the next step boundary and exits 0 (utils/preempt)
    guard = PreemptionGuard(logger).install()
    dtype = compute_dtype(args)

    epochs = cfg["max_epoch"]
    batch = cfg["total_bs"]
    from gm3d_tpu.cli.common import setup_mesh

    mesh, bshard = setup_mesh(args, batch, logger)
    if not args.sync_bn:
        logger.warning(
            "--no-sync_bn ignored: BatchNorm reductions under jit/GSPMD are "
            "global-batch by construction (see tests/test_parallel.py "
            "TestSyncBatchNorm); per-shard BN stats do not exist here")
    train_loader, svm_train, svm_test = make_loaders(cfg, args)
    steps_per_epoch = max(len(train_loader), 1)

    rng = jax.random.key(args.seed)
    example = jnp.asarray(next(iter(train_loader)))

    lr = effective_lr(args.blr, batch, args.accum_iter)
    # under gradient accumulation the optimizer count ticks once per UPDATE
    # (optax.MultiSteps), not per micro-step, so the schedule's epoch axis is
    # updates_per_epoch — matching the reference's per-iteration adjust at
    # data_iter_step % accum == 0 (engine...:79-80: epoch_frac advances by
    # accum_iter micro-steps per update)
    updates_per_epoch = max(steps_per_epoch // args.accum_iter, 1)
    sched = cosine_warmup_schedule(lr, args.min_lr, args.warmup_epochs, epochs,
                                   updates_per_epoch)
    wd = cfg["optimizer"]["kwargs"]["weight_decay"]
    # HPM-style engines clip grads to global-norm 5 on every step — the
    # NativeScaler DEFAULT clip_grad=5. (util/misc.py:256), never overridden
    # by the pretrain mains. The legacy teacher path (tools/runner_pretrain.py
    # :138-151) uses plain backward with NO clip. The gm3d family replaces
    # this tx below with the shared/separated builders.
    grad_clip = 5.0 if args.model_family == "m2ae_gm3d" else None
    tx = build_adamw(sched, wd, grad_clip=grad_clip, accum_steps=args.accum_iter)

    # ---- build model family
    legacy_variant = getattr(args, "student_variant", "svm") == "legacy"
    if legacy_variant and args.model_family != "gm3d":
        # the legacy semantics (shared decoder pos embed, frozen
        # mask_token_loss_pred, uncapped keep-ratio ramp) only exist for the
        # gm3d student — silently switching the shared epoch loop's ramp for
        # other families would corrupt their recipes
        raise SystemExit(
            f"--student_variant legacy is only defined for --model_family "
            f"gm3d (got {args.model_family!r})")
    if args.model_family == "gm3d":
        if legacy_variant:
            # the multi-GPU main's defaults: Chamfer-only engine, one shared
            # mask token for both decoders (main_pretrain_multi_gpu.py:166-413)
            if args.learn_feature_loss != "none":
                logger.info("--student_variant legacy forces --learn_feature_loss none")
                args.learn_feature_loss = "none"
            args.shared_learnable_tokens = True
        mode = args.mode if args.learn_feature_loss == "dino" else (
            "usual" if args.learn_feature_loss == "none" else args.mode
        )
        student = GM3DStudent(mode=mode, shared_pos_embed=legacy_variant, dtype=dtype)
        from gm3d_tpu.masking import gm3d_num_mask

        num_mask = gm3d_num_mask(student.num_group, args.mask_ratio)
        mask0 = jnp.zeros((2, student.num_group), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(1), example[:2], mask0, num_mask)
        teacher = None
        tvars = None
        if args.learn_feature_loss == "dino":
            teacher = build_teacher(args, cfg, dtype)
            if args.dino_path:
                sd = load_torch_file(args.dino_path)
                imported = import_torch_checkpoint(sd, POINT_MAE_MAP)
                unmatched = imported.pop("_unmatched")
                logger.info(f"teacher import: {len(unmatched)} unmatched keys")
                if unmatched:
                    from gm3d_tpu.ckpt.transfer import group_paths

                    for line in group_paths(list(unmatched)):
                        logger.warning(f"  unmatched torch key: {line}")
                tvars = imported
            elif args.teacher_ckpt:
                from gm3d_tpu.ckpt import restore_raw

                raw = restore_raw(args.teacher_ckpt)
                if raw is None:
                    raise FileNotFoundError(f"no teacher ckpt at {args.teacher_ckpt}")
                tvars = {"params": raw["params"]}
                if raw.get("batch_stats") is not None:
                    tvars["batch_stats"] = raw["batch_stats"]
                logger.info(f"teacher loaded from orbax step {int(raw['step'])}")
            else:
                tvars = teacher.init(jax.random.key(2), example[:2], mask0, num_mask)
                logger.warning("no teacher weights given: teacher is randomly initialised")
        elif args.learn_feature_loss == "clip":
            from gm3d_tpu.models.clip import CLIPVisionTower, render_depth_views

            if args.clip_path:
                from gm3d_tpu.ckpt.torch_import import import_clip_visual

                clip_cfg, tvars = import_clip_visual(load_torch_file(args.clip_path))
                if clip_cfg["output_dim"] != student.trans_dim:
                    raise ValueError(
                        f"CLIP output_dim {clip_cfg['output_dim']} != student "
                        f"trans_dim {student.trans_dim}; pick a checkpoint whose "
                        "projection matches (or retrain the projection)")
                teacher = CLIPVisionTower(**clip_cfg, dtype=dtype)
                logger.info(f"CLIP teacher loaded: {clip_cfg}")
            else:
                teacher = CLIPVisionTower(output_dim=student.trans_dim, dtype=dtype)
                imgs0 = render_depth_views(example[:2], teacher.input_resolution)
                tvars = teacher.init(jax.random.key(2), imgs0)
                logger.warning("no --clip_path: CLIP teacher is randomly initialised")
        if not args.shared_opt:
            from gm3d_tpu.train.optim import build_gm3d_separated_optimizer

            tx = build_gm3d_separated_optimizer(
                svars["params"], sched, wd,
                accum_steps=args.accum_iter,
                # the reference never schedules the loss-pred optimizer
                # (engine...:376): constant base lr
                loss_pred_learning_rate=lr,
            )
            logger.info("separated recon / loss-pred optimizers (--no-shared_opt)")
        else:
            from gm3d_tpu.train.optim import build_gm3d_shared_optimizer

            if mode == "feature":
                frozen = ("coord_head",)
            elif legacy_variant:
                # the older torch model HAS no mask_token_loss_pred; ours
                # must neither train nor weight-decay it
                frozen = ("mask_token_loss_pred",)
            else:
                frozen = ()
            tx = build_gm3d_shared_optimizer(
                svars["params"], sched, wd, accum_steps=args.accum_iter,
                frozen_modules=frozen,
            )
        state = create_train_state(svars, tx, with_ema=True)
        step_fn = make_gm3d_train_step(
            student, teacher, tx, args.mask_ratio, args.shared_learnable_tokens,
            args.relative, distill_mode=args.learn_feature_loss,
            shared_opt=args.shared_opt, accum_steps=args.accum_iter,
            quantize_ema=args.quantize_ema,
        )
        feat_model = student
    elif args.model_family == "pointmae":
        # legacy-runner training recipe (how the published teacher was made):
        # config lr verbatim (no MAE blr*batch/256 scaling), timm per-EPOCH
        # cosine with the one-epoch step lag, torch-default betas, token-free
        # weight decay, no grad clip (tools/builder.py:37-90 +
        # runner_pretrain.py:138-180)
        from gm3d_tpu.train.optim import build_legacy_adamw
        from gm3d_tpu.train.schedules import legacy_cosine_epoch_schedule

        legacy_lr = cfg["optimizer"]["kwargs"].get("lr", lr)
        sched = legacy_cosine_epoch_schedule(
            legacy_lr,
            cfg.get("scheduler", {}).get("kwargs", {}).get("epochs", epochs),
            cfg.get("scheduler", {}).get("kwargs", {}).get("initial_epochs", 10),
            updates_per_epoch,  # optimizer count ticks per UPDATE (accum)
        )
        tx = build_legacy_adamw(sched, wd, accum_steps=args.accum_iter)
        model = build_model_from_cfg(cfg["model"], dtype=dtype)
        mr = cfg["model"]["transformer_config"]["mask_ratio"]
        num_mask = int(model.num_group * mr) or int(model.num_group * 0.6)
        mask0 = jnp.zeros((2, model.num_group), bool).at[:, :num_mask].set(True)
        variables = model.init(jax.random.key(1), example[:2], mask0, num_mask)
        state = create_train_state(variables, tx)
        step_fn = make_pointmae_train_step(
            model, tx, mr or 0.6,
            cfg["model"]["transformer_config"].get("mask_type", "rand"),
            cfg["model"].get("loss", "cdl2"),
        )
        feat_model = model
        tvars = None
    else:  # m2ae / m2ae_gm3d
        model = build_model_from_cfg(cfg["model"], dtype=dtype)
        vis0 = jnp.ones((2, model.num_groups[-1]), bool)
        variables = model.init(jax.random.key(1), example[:2], vis0)
        with_ema = args.model_family == "m2ae_gm3d"
        state = create_train_state(variables, tx, with_ema=with_ema)
        if with_ema:
            step_fn = make_m2ae_gm3d_train_step(
                model, tx, cfg["model"].get("mask_ratio", 0.8), args.relative
            )
        else:
            step_fn = make_m2ae_train_step(model, tx, cfg["model"].get("mask_ratio", 0.8))
        feat_model = model
        tvars = None

    # optional supervised probe (reference --classification)
    probe_state = probe_step = None
    if args.classification:
        from gm3d_tpu.models import Classifier
        from gm3d_tpu.train.pretrain import make_probe_step

        feats0 = feat_model.apply(state.variables(), example[:2],
                                  method=feat_model.encode_features)
        classifier = Classifier(cls_dim=40, dtype=dtype)
        cvars = classifier.init(
            {"params": jax.random.key(5), "dropout": jax.random.key(6)},
            feats0, deterministic=False,
        )
        probe_tx = build_adamw(1e-3)
        probe_state = create_train_state(cvars, probe_tx)
        probe_step = make_probe_step(feat_model, classifier, probe_tx)

    ckpt_dir = os.path.join(args.output_dir, "ckpt")
    resumed_best = 0.0
    if args.resume:
        restored = restore_checkpoint(ckpt_dir, state)
        if restored is not None:
            state = restored
            # restore best-so-far SVM acc so a worse post-resume epoch can't
            # overwrite ckpt/best. Deliberate deviation: the reference RESETS
            # best_metrics after load (main_pretrain.py:456 Acc_Metric(0.)) —
            # an accident that silently destroys the best checkpoint; the
            # legacy finetune runner restores it (tools/builder.py:109-115)
            from gm3d_tpu.ckpt import load_best_metrics

            resumed_best = float(load_best_metrics(ckpt_dir).get("best", 0.0))
            logger.info(f"resumed from step {int(state.step)} "
                        f"(best svm {resumed_best:.4f})")

    # ---- data parallel: replicate state/teacher on the mesh, shard batches
    # (the jitted step sees batch-sharded inputs and replicated params; XLA
    # inserts the grad psum over ICI — reference DDP, tools/builder.py:17-23)
    from gm3d_tpu.parallel import replicate_tree

    state = replicate_tree(mesh, state)
    if tvars is not None:
        tvars = replicate_tree(mesh, tvars)

    k_dispatch = args.steps_per_dispatch
    if args.classification and k_dispatch > 1:
        # the supervised probe trains once per LOOP iteration; scanning K
        # train steps per dispatch would starve it to 1/K of its updates
        # (reference trains it every iteration, engine...:120-137)
        logger.info("--classification forces --steps_per_dispatch 1")
        k_dispatch = 1
    use_multi = k_dispatch > 1
    multi_fn = None
    if use_multi:
        from gm3d_tpu.train.pretrain import make_multi_step

        multi_fn = make_multi_step(
            step_fn,
            has_teacher=args.model_family == "gm3d",
            # legacy Point-MAE / plain M2AE steps are (state, pts, rng)
            has_scalars=args.model_family in ("gm3d", "m2ae_gm3d"),
        )

    best_acc = resumed_best
    prof_remaining = args.profile_steps if args.profile_dir else 0
    if prof_remaining:
        jax.profiler.start_trace(args.profile_dir)
    start_epoch = int(state.step) // steps_per_epoch
    loader_token = {}
    if args.resume:
        # mid-epoch saves (--save_steps) leave a loader-position sidecar; it
        # names the exact next batch, superseding the derived epoch boundary
        from gm3d_tpu.ckpt import load_loader_state

        loader_token = load_loader_state(ckpt_dir)
        if loader_token:
            start_epoch = int(loader_token.get("epoch", start_epoch))
    if hasattr(train_loader, "load_state"):
        # continue the deterministic shuffle sequence on resume (the epoch-e
        # order is a pure function of (seed, e) — see data.datasets.DataLoader)
        train_loader.load_state(loader_token or {"epoch": start_epoch, "batch": 0})
    from gm3d_tpu.ckpt import (AsyncCheckpointWriter, device_snapshot,
                               save_best_metrics, save_loader_state)

    # saves snapshot the state on device and stream to disk from a background
    # thread, overlapping the slow D2H with training (ckpt/async_writer.py)
    writer = AsyncCheckpointWriter(enabled=not args.sync_save)

    def emit_epoch(stats):
        """The epoch's log line, JSONL record, and TensorBoard scalars
        (reference tags, engine_pretrain...:306-315) — emitted exactly once
        per epoch, possibly one epoch late when its SVM probe ran async."""
        ep = stats["epoch"]
        logger.info(f"epoch {ep}: " + " ".join(
            f"{k}={v:.5g}" for k, v in stats.items()
            if isinstance(v, (int, float))))
        jsonl.write(stats)
        tb.add_scalar("train_loss", stats.get("loss", 0.0), ep)
        tb.add_scalar("train_loss_MSE", stats.get("loss_mse", 0.0), ep)
        tb.add_scalar("train_loss_Chfr", stats.get("loss_chfr", 0.0), ep)
        tb.add_scalar("train_loss_learn", stats.get("loss_learn", 0.0), ep)
        tb.add_scalar("lr", stats.get("lr", 0.0), ep)
        tb.add_scalar("grad_norm", stats.get("grad_norm", 0.0), ep)
        if "val_svm_acc" in stats:
            tb.add_scalar("Metric/ACC", stats["val_svm_acc"], ep)
        tb.flush()

    def record_probe(stats, acc, step, statelike):
        """Fold a finished probe into its epoch's stats; track ckpt/best
        (mirrors *_temp_best.pth, main_pretrain.py:591-611)."""
        nonlocal best_acc
        stats["val_svm_acc"] = acc
        if acc > best_acc:
            best_acc = acc
            writer.submit(statelike, lambda s, step=step, a=acc,
                          mb={"best": acc}: (
                save_checkpoint(os.path.join(ckpt_dir, "best"), s, step,
                                metrics={"svm_acc": a}, max_to_keep=1),
                save_best_metrics(ckpt_dir, mb)))

    # The SVM probe is host-bound (sklearn fit over the extracted features:
    # comparable to a whole training epoch on real datasets, and val_freq
    # defaults to 1). Run it from a background thread against a device-side
    # state snapshot so it overlaps the NEXT epoch's training; the epoch's
    # log line is emitted when its probe finishes (at most one epoch later,
    # always before the next line — ordering is preserved). Multi-process
    # runs stay synchronous: the probe's feature gather is a collective, and
    # collectives issued from two threads can interleave differently across
    # processes (deadlock).
    # --classification forces sync probes too: the per-step classification
    # batches and the probe's feature extraction would otherwise iterate the
    # SAME svm_train DataLoader from two threads, racing its epoch counter
    # and the per-item subsample RNG
    probe_async = (jax.process_count() == 1 and not args.sync_probe
                   and probe_step is None)
    pending_probe = None  # {"thread", "holder", "stats", "step", "snap"}

    def start_probe(stats, step):
        nonlocal pending_probe
        snap = device_snapshot(state)
        holder = {}

        def run():
            try:
                # the reference validates the STUDENT, not the EMA
                # (main_pretrain.py validate(model, ...) at :497-498)
                holder["acc"] = svm_probe(
                    feat_model, snap.variables(), svm_train, svm_test,
                    npoints=cfg.get("npoints", 1024),
                    batch_floor=resolve_batch_floor(args))
            except BaseException as e:  # noqa: BLE001 — re-raised on finish
                holder["err"] = e

        t = threading.Thread(target=run, name="gm3d-svm-probe", daemon=True)
        t.start()
        pending_probe = {"thread": t, "holder": holder, "stats": stats,
                         "step": step, "snap": snap}

    def finish_pending_probe():
        nonlocal pending_probe
        if pending_probe is None:
            return
        p, pending_probe = pending_probe, None
        p["thread"].join()
        if "err" in p["holder"]:
            raise RuntimeError("SVM probe failed") from p["holder"]["err"]
        record_probe(p["stats"], p["holder"]["acc"], p["step"], p["snap"])
        emit_epoch(p["stats"])

    last_saved_step = int(state.step)
    # host-side mirror of state.step (one increment per dispatched train
    # step, which is exact): reading the device scalar every iteration for
    # the --save_steps cadence would block on the in-flight dispatch and
    # defeat the metrics pipeline
    host_step = last_saved_step
    try:
        for epoch in range(start_epoch, epochs):
            meter = MetricLogger()
            t0 = time.time()
            ema_decay = ema_decay_schedule(epoch)
            # usual-mode student uses the capped min(..., 0.5) ramp
            # (models_mae_learn_loss_Classifier_SVM.py generate_mask); the
            # legacy variant uses the uncapped slope-0.5 ramp
            capped_ramp = args.after_200_epoch or (
                args.learn_feature_loss == "none" and not legacy_variant)
            kr = keep_ratio_schedule(epoch, epochs, capped_ramp,
                                     legacy=legacy_variant)
            if args.learn_feature_loss == "none":
                # usual-mode engine: FIXED mix 13.889*MSE + 1*CD from epoch 0
                # (engine_pretrain.py:149-153, `if epoch < -1` dead branch)
                w_mse, w_cd = 13.889, 1.0
            else:
                w_mse, w_cd = loss_weights(epoch, args.after_epoch, args.loss_multiply_by)
            scalars = {
                "keep_ratio": jnp.asarray(kr, jnp.float32),
                "ema_decay": jnp.asarray(ema_decay, jnp.float32),
                "w_mse": jnp.asarray(w_mse, jnp.float32),
                "w_cd": jnp.asarray(w_cd, jnp.float32),
            }
            probe_iter = iter(svm_train) if probe_step is not None else None
            pending_pmetrics = None
            pending = []
            from gm3d_tpu.data.prefetch import device_prefetch

            prefetcher = device_prefetch(train_loader, sharding=bshard)

            def maybe_save_steps():
                # mid-epoch rolling save + the loader position of the NEXT batch
                # (prefetcher.state(): the token as of the last yielded batch, so
                # resume replays nothing — data/prefetch.py)
                nonlocal last_saved_step
                if not args.save_steps:
                    return
                if host_step - last_saved_step < args.save_steps:
                    return
                # run the deferred NaN checks BEFORE persisting: the rolling save
                # must never overwrite the last good checkpoint with a state whose
                # loss was never verified (the pipeline defers checks one dispatch;
                # the save's device snapshot blocks on the in-flight dispatch
                # anyway, so this flush costs nothing extra)
                dm.flush()
                step, token = host_step, (prefetcher.state()
                                          or {"epoch": epoch, "batch": 0})
                writer.submit(state, lambda s: (save_checkpoint(ckpt_dir, s, step),
                                                save_loader_state(ckpt_dir, token)))
                last_saved_step = step

            def preempt_save():
                # (state, loader position) are consistent here: in multi-dispatch
                # mode this runs only right after a full scanned group (pending
                # empty), so every yielded batch has been trained on.
                # Synchronous: the process exits right after; drain the writer
                # first so two orbax managers never race on ckpt_dir. Flush the
                # metrics pipeline so the deferred NaN checks run before the
                # state is persisted.
                # The PREVIOUS epoch's async probe may still be in flight — its
                # epoch row only emits when the probe joins, and a mid-epoch
                # resume never re-runs that probe, so dropping it here would
                # lose the completed epoch's JSONL row forever (observed in the
                # round-5 soak: SIGTERM in epoch 9 silently ate epoch 8's row).
                # Join + record + emit it first; a probe failure must not block
                # the preemption checkpoint.
                try:
                    finish_pending_probe()
                except Exception:
                    logger.warning("pending probe failed during preemption; "
                                   "its epoch row is dropped")
                dm.flush()
                writer.wait()
                save_checkpoint(ckpt_dir, state, int(state.step))
                save_loader_state(ckpt_dir,
                                  prefetcher.state() or {"epoch": epoch, "batch": 0})

            def drain_metrics(payload, k):
                # the host read: blocks until that dispatch completes. Feed EVERY
                # scanned step to the meters so epoch averages cover all steps.
                host = {kk: np.asarray(v) for kk, v in payload.items()}
                if k > 1:
                    for j in range(k):
                        meter.update(**{kk: float(v[j]) for kk, v in host.items()})
                    # sum is non-finite iff any step's loss is (NaN/inf propagate)
                    loss_val = float(np.sum(host["loss"]))
                else:
                    meter.update(**{kk: float(v) for kk, v in host.items()})
                    loss_val = float(host["loss"])
                # NaN-loss hard exit (engine_pretrain_Classifier_SVM.py:232-234);
                # one dispatch late under the pipeline (utils/pipeline.py)
                check_finite_loss(loss_val, logger)

            # metrics are read one dispatch behind so the device queue never
            # drains on the tunnel round-trip (utils/pipeline.py)
            dm = DeferredMetrics(drain_metrics,
                                 depth=0 if args.sync_metrics else 1)

            for it, pts in enumerate(prefetcher):
                rng, key = jax.random.split(rng)
                if use_multi:
                    pending.append((pts, key))
                    if len(pending) < k_dispatch:
                        continue
                    stack = jnp.stack([p for p, _ in pending])
                    keys = jnp.stack([k for _, k in pending])
                    pending = []
                    if args.model_family == "gm3d":
                        state, mstack = multi_fn(state, tvars, stack, keys, scalars)
                    else:
                        state, mstack = multi_fn(state, None, stack, keys, scalars)
                    host_step += k_dispatch
                    dm.push(mstack, k_dispatch)
                else:
                    if args.model_family == "gm3d":
                        state, metrics = step_fn(state, tvars, pts, key, scalars)
                    elif args.model_family == "m2ae_gm3d":
                        state, metrics = step_fn(state, pts, key, scalars)
                    else:
                        state, metrics = step_fn(state, pts, key)
                    host_step += 1
                    dm.push(metrics, 1)
                maybe_save_steps()
                guard.exit_if_triggered(preempt_save)
                if prof_remaining:
                    prof_remaining -= 1
                    if prof_remaining == 0:
                        # force the in-flight dispatch to completion so its device
                        # activity lands in the trace (the pipeline defers reads)
                        dm.flush()
                        jax.profiler.stop_trace()
                        logger.info(f"profiler trace written to {args.profile_dir}")
                if probe_step is not None:
                    try:
                        cls_pts, cls_labels = next(probe_iter)
                    except StopIteration:
                        probe_iter = iter(svm_train)
                        cls_pts, cls_labels = next(probe_iter)
                    rng, key = jax.random.split(rng)
                    probe_state, pmetrics = probe_step(
                        probe_state, state.variables(), jnp.asarray(cls_pts),
                        jnp.asarray(cls_labels), key)
                    # read one step behind, like the train metrics: a
                    # synchronous float() here would block on the in-flight
                    # dispatch and defeat the DeferredMetrics pipeline
                    if pending_pmetrics is not None:
                        meter.update(**{k: float(v)
                                        for k, v in pending_pmetrics.items()})
                    pending_pmetrics = pmetrics
            # flush a partial multi-dispatch group as single steps
            for pts, key in pending:
                if args.model_family == "gm3d":
                    state, metrics = step_fn(state, tvars, pts, key, scalars)
                elif args.model_family == "m2ae_gm3d":
                    state, metrics = step_fn(state, pts, key, scalars)
                else:
                    state, metrics = step_fn(state, pts, key)
                host_step += 1
                dm.push(metrics, 1)
            # drain the pipeline: meters must be complete before the epoch stats
            dm.flush()
            if pending_pmetrics is not None:
                meter.update(**{k: float(v)
                                for k, v in pending_pmetrics.items()})
                pending_pmetrics = None

            def preempt_save_epoch_end():
                # every step of this epoch is trained; a signal here skips the
                # (potentially minutes-long) SVM probe and resumes at epoch+1.
                # As in preempt_save: emit the PREVIOUS epoch's pending row
                # first (this epoch's own row is recomputable — resume replays
                # nothing but re-probes at its next epoch end).
                try:
                    finish_pending_probe()
                except Exception:
                    logger.warning("pending probe failed during preemption; "
                                   "its epoch row is dropped")
                writer.wait()
                save_checkpoint(ckpt_dir, state, int(state.step))
                save_loader_state(ckpt_dir, {"epoch": epoch + 1, "batch": 0})

            guard.exit_if_triggered(preempt_save_epoch_end)
            stats = meter.global_avgs()
            epoch_time = time.time() - t0
            # meter coverage: equals steps_per_epoch regardless of
            # --steps_per_dispatch (every scanned step feeds the meters); fewer
            # only on a mid-epoch resume (--save_steps), where throughput must
            # count the steps actually run
            n_steps = meter.meters["loss"].count if "loss" in meter.meters else 0
            stats.update(epoch=epoch, time=round(epoch_time, 2),
                         # the schedule's axis is optimizer UPDATES
                         lr=float(sched(int(state.step) // args.accum_iter)),
                         steps=n_steps,
                         clouds_per_sec=round(n_steps * batch / max(epoch_time, 1e-9), 1))

            # the previous epoch's probe (if any) finishes first: its log line
            # precedes this epoch's, and best_acc must be current before this
            # epoch's probe compares against it
            finish_pending_probe()
            if (epoch + 1) % args.val_freq == 0 or epoch == epochs - 1:
                if probe_async:
                    start_probe(stats, int(state.step))
                else:
                    acc = svm_probe(feat_model, state.variables(), svm_train,
                                    svm_test, npoints=cfg.get("npoints", 1024),
                                    # ragged last probe batches tile to the TPU
                                    # compile-shape floor (exact; floor_reps)
                                    batch_floor=resolve_batch_floor(args))
                    record_probe(stats, acc, int(state.step), state)
            # rolling last-epoch save (*_temp_last.pth parity — crash resume
            # continues from the last completed epoch, not the last best);
            # the loader sidecar stays in lockstep: a resume after a COMPLETED
            # epoch must not replay from a stale mid-epoch token
            step, token = int(state.step), {"epoch": epoch + 1, "batch": 0}
            writer.submit(state, lambda s, step=step, token=token: (
                save_checkpoint(ckpt_dir, s, step),
                save_loader_state(ckpt_dir, token)))
            last_saved_step = step
            if args.save_interval and (epoch + 1) % args.save_interval == 0:
                # periodic snapshots every N epochs ({model}_{epoch:04d}.pth parity)
                writer.submit(state, lambda s, step=step: save_checkpoint(
                    os.path.join(ckpt_dir, "epochs"), s, step, max_to_keep=1000))
            if pending_probe is None:
                # async-probe epochs emit when their probe finishes
                emit_epoch(stats)
    finally:
        # drain on ANY exit from the loop (injected test crash, NaN sys.exit,
        # real bug): the in-flight save is always of a NaN-checked state
        # (maybe_save_steps flushes the metrics pipeline before submitting),
        # so committing it is safe; without this the last save races process
        # exit (and a daemon writer killed mid-orbax-save at interpreter
        # shutdown aborts the process)
        writer.wait()
        # same for the async SVM probe: a daemon thread still running jit
        # dispatches at interpreter shutdown SIGABRTs. On the normal path the
        # join is a no-op (finish_pending_probe below re-joins and records);
        # on error/preemption paths the probe's result is deliberately
        # dropped (resume recomputes it)
        if pending_probe is not None:
            pending_probe["thread"].join()
        # exception paths must not leak the installed SIGTERM handler into
        # the next in-process run (uninstall is idempotent)
        guard.uninstall()

    finish_pending_probe()  # the last epoch's probe and log line
    # the probe may have submitted a best-checkpoint save AFTER the loop's
    # finally drained the writer; wait again or the daemon save thread dies
    # inside orbax at interpreter shutdown (SIGABRT after a clean run)
    writer.wait()
    if prof_remaining:  # run ended before --profile_steps steps
        jax.profiler.stop_trace()
    from gm3d_tpu.ckpt.checkpoint import latest_step

    if latest_step(ckpt_dir) != int(state.step):  # 0-epoch runs (resume at end)
        save_checkpoint(ckpt_dir, state, int(state.step))
    guard.uninstall()
    logger.info(f"done; best svm acc {best_acc:.4f}")
    return best_acc


if __name__ == "__main__":
    main()
