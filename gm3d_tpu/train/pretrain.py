"""Pretrain steps, each compiled as ONE jit graph — EMA forward, mask
generation, student forward/backward, teacher distillation and EMA update all
stay on device (SURVEY.md §7.1), unlike the reference's host-synchronising
loop (``engine_pretrain_Classifier_SVM.py:40-332``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gm3d_tpu.data.transforms import scale_and_translate
from gm3d_tpu.masking import block_mask, geometric_mask, gm3d_num_mask, random_mask
from gm3d_tpu.models.gm3d import GM3DStudent
from gm3d_tpu.models.pointmae import PointMAE, take_groups
from gm3d_tpu.train import losses
from gm3d_tpu.train.state import TrainState, ema_update


def _global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)


def make_pointmae_train_step(
    model: PointMAE,
    tx: optax.GradientTransformation,
    mask_ratio: float = 0.6,
    mask_type: str = "rand",
    loss_type: str = "cdl2",
    augment: bool = True,
):
    """Legacy Point-MAE pretrain step (SURVEY.md §3.4) — how the distillation
    teacher's weights are produced (``tools/runner_pretrain.py:58-207``)."""
    # Point_MAE's OWN random mask uses int(G * ratio) (models/Point_MAE.py:308)
    # — unlike GM3D's generate_mask (see masking.gm3d_num_mask)
    num_mask = int(model.num_group * mask_ratio)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, pts: jax.Array, rng: jax.Array):
        r_aug, r_mask, r_drop, r_dp = jax.random.split(rng, 4)
        samples = scale_and_translate(r_aug, pts) if augment else pts
        batch = samples.shape[0]
        if mask_type == "rand":
            mask = random_mask(r_mask, batch, model.num_group, num_mask)
        else:
            # block mask needs centers: group once outside the grad path
            from gm3d_tpu.ops.group import group_points

            centers = group_points(samples, model.num_group, model.group_size).center
            mask = block_mask(r_mask, centers, num_mask)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outs, updates = model.apply(
                variables,
                samples,
                mask,
                num_mask,
                deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_dp},
                mutable=["batch_stats"],
            )
            loss = losses.pointmae_reconstruction_loss(outs["rebuild"], outs["gt"], loss_type)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, new_updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        metrics = {"loss": loss, "grad_norm": _global_norm(grads)}
        return new_state, metrics

    return step


def gm3d_forward_distill(
    student: GM3DStudent,
    teacher: PointMAE,
    student_vars: dict,
    teacher_vars: dict,
    samples: jax.Array,
    mask: jax.Array,
    num_mask: int,
    shared_learnable_tokens: bool,
    rngs: Optional[dict],
    mutable: bool,
    grouped=None,
    detach_loss_pred: bool = False,
    teacher_tokens=None,
    fused_teacher_attention: bool = False,
):
    """Student forward + frozen-teacher complete-to-partial replay.

    Mirrors ``engine_pretrain_Classifier_SVM.py:118-164`` +
    ``forward_features_dino_decoder`` (``:669-687``):
      teacher encodes the FULL cloud; its decoder replays (a) its own
      features at all centers -> point_target and (b) the student's predicted
      masked features at the masked centers -> point_reconstructed (no-grad).

    ``fused_teacher_attention`` routes the teacher's (entirely grad-free)
    attention through the fused Pallas kernel — TPU train-step fast path
    (``models/blocks.py:fused_attention_scope``).
    """
    if mutable:
        outs, updates = student.apply(
            student_vars,
            samples,
            mask,
            num_mask,
            shared_learnable_tokens,
            deterministic=False,
            rngs=rngs,
            mutable=["batch_stats"],
            grouped=grouped,
            detach_loss_pred_branch=detach_loss_pred,
        )
    else:
        outs = student.apply(
            student_vars, samples, mask, num_mask, shared_learnable_tokens,
            deterministic=True, grouped=grouped,
            detach_loss_pred_branch=detach_loss_pred,
        )
        updates = {}

    # frozen teacher: full-cloud features + decoder replay (all no-grad w.r.t.
    # teacher; the student-feature branch is explicitly stop-gradiented to
    # match the reference's torch.no_grad() around the whole distill block)
    teacher_grouped = grouped if (
        teacher.num_group == student.num_group and teacher.group_size == student.group_size
    ) else None
    from gm3d_tpu.models.blocks import fused_attention_scope

    with fused_attention_scope(fused_teacher_attention):
        teacher_feats = teacher.apply(
            teacher_vars, samples, method=teacher.encode_features, grouped=teacher_grouped,
            tokens=teacher_tokens if teacher_grouped is not None else None,
        )  # (B, G, D)
        centers = outs["center"]
        point_target = teacher.apply(
            teacher_vars, teacher_feats, centers, method=teacher.decode_replay
        )  # (B, G, S, 3)

        pred_masked = outs["pix_pred"][:, -num_mask:] if num_mask else outs["pix_pred"]
        centers_masked = take_groups(centers, outs["mask_idx"])
        point_reco = teacher.apply(
            teacher_vars,
            jax.lax.stop_gradient(pred_masked),
            centers_masked,
            method=teacher.decode_replay,
        )  # (B, M, S, 3)

    return outs, updates, teacher_feats, point_target, point_reco, pred_masked


def make_gm3d_train_step(
    student: GM3DStudent,
    teacher: Optional[PointMAE],
    tx: optax.GradientTransformation,
    mask_ratio: float = 0.6,
    shared_learnable_tokens: bool = False,
    relative: bool = True,
    augment: bool = True,
    distill_mode: str = "dino",
    shared_opt: bool = True,
    use_fused_embed: Optional[bool] = None,
    accum_steps: int = 1,
    trim_ema: bool = True,
    remat_student: bool = False,
    quantize_ema: bool = False,
    use_fused_attention: bool = True,
):
    """The GM3D core path (SURVEY.md §3.1) as one jit:

      1. augment            (device, vectorised)
      2. EMA fwd, unmasked  -> per-group predicted loss
      3. geometric mask     (top keep_ratio by predicted loss + random fill)
      4. student fwd        (visible tokens only)
      5. teacher distill    (feature MSE + per-group Chamfer matrix)
      6. learning loss      (relative pairwise BCE on masked slots)
      7. AdamW update + EMA update

    ``scalars`` carries the epoch-dependent knobs (ema_decay, keep_ratio,
    w_mse, w_cd) as traced values so no recompilation happens across epochs.

    ``distill_mode``: 'dino' = frozen Point-MAE teacher (reference default
    ``--learn_feature_loss dino``); 'ema' = feature targets from the EMA's
    unmasked features (``engine_pretrain_Classifier_SVM.py:148-149``), no
    teacher replay; 'none' = usual-mode Chamfer only.

    ``quantize_ema`` (opt-in, PARITY-BREAKING): runs the grad-free EMA
    forward's Dense matmuls as dynamic-int8 w8a8 (``serve/quantize.py``) —
    the EMA pass only produces ``loss_pred`` for mask *ranking*, so int8
    noise can at most flip near-tied group orderings; gradients and the
    distillation targets are untouched (refuse under ``distill_mode='ema'``,
    where EMA features ARE the targets). Off by default because it perturbs
    the reference trajectory; numbers in docs/BENCHMARKS.md.
    """
    num_mask = gm3d_num_mask(student.num_group, mask_ratio)
    use_distill = teacher is not None and distill_mode == "dino"
    # separated engine ("MLP IN Model" forward_loss call, engine...:441-469):
    # feature MSE vs teacher + Chamfer(student's OWN coords, gt neighborhood)
    # inside the grad path; the teacher decoder replay is not used there
    use_sep_distill = use_distill and not shared_opt
    if use_sep_distill and student.mode != "feature":
        # usual-mode pix_pred is 3*S coordinates; the separated loss needs
        # decoder FEATURES for the teacher MSE. The reference has no working
        # semantics for this combo either (its usual model's forward_loss is
        # 3-arg; the 5-arg separated call would TypeError).
        raise ValueError(
            "--no-shared_opt with distill_mode='dino' requires mode='feature' "
            "(the separated loss consumes decoder features; use "
            "distill_mode='none' for usual mode)")
    use_ema_feats = distill_mode == "ema"
    use_clip = distill_mode == "clip"
    if use_clip:
        assert teacher is not None and hasattr(teacher, "output_dim"), (
            "distill_mode='clip' needs a CLIPVisionTower teacher")
        assert teacher.output_dim == student.trans_dim, (
            f"CLIP output_dim {teacher.output_dim} must match student "
            f"trans_dim {student.trans_dim} for the feature MSE")
    # --shared_opt False: stop-gradient the loss-pred branch at the encoder
    # boundary so one backward reproduces the two-optimizer split (pair this
    # step with build_gm3d_separated_optimizer)
    detach_lp = not shared_opt
    # fused Pallas patch embed for the two GRAD-FREE passes (EMA forward and
    # teacher encode): measured 6.5 ms vs 7.8 ms XLA per call at the pretrain
    # shape (B=256, 64x32) — auto-on for TPU, interpreted (tests) elsewhere
    if use_fused_embed is None:
        use_fused_embed = jax.default_backend() == "tpu"
    fused_interpret = jax.default_backend() != "tpu"
    if quantize_ema and distill_mode == "ema":
        raise ValueError(
            "quantize_ema is not allowed with distill_mode='ema': the EMA "
            "features are the distillation targets there, so quantization "
            "noise would enter the loss, not just the mask ranking")
    if quantize_ema:
        from gm3d_tpu.serve.quantize import quantized_dense as _ema_ctx
    else:
        import contextlib

        _ema_ctx = contextlib.nullcontext

    # donate the train state: params/opt/EMA buffers are updated in place,
    # halving their HBM traffic per step
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        state: TrainState,
        teacher_params: Any,
        pts: jax.Array,
        rng: jax.Array,
        scalars: Dict[str, jax.Array],
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        r_aug, r_mask, r_drop, r_dp = jax.random.split(rng, 4)
        samples = scale_and_translate(r_aug, pts) if augment else pts
        batch = samples.shape[0]

        # ---- ONE deterministic grouping, shared by EMA / student / teacher
        # (the reference recomputes identical FPS+KNN three times per step)
        from gm3d_tpu.ops.group import group_points

        grouped = group_points(samples, student.num_group, student.group_size)

        ema_tokens = teacher_tokens = None
        if use_fused_embed:
            from gm3d_tpu.ops.patch_embed import fused_patch_embed, params_from_variables

            ema_tokens = fused_patch_embed(
                grouped.neighborhood,
                params_from_variables(state.ema_variables(), ("MAE_encoder", "encoder")),
                interpret=fused_interpret,
            )
            if use_distill:
                teacher_tokens = fused_patch_embed(
                    grouped.neighborhood,
                    params_from_variables(teacher_params, ("MAE_encoder", "encoder")),
                    interpret=fused_interpret,
                )

        # ---- EMA forward on the unmasked cloud (eval mode, no grad).
        # loss_pred_only: the EMA pass exists to feed generate_mask (and, in
        # 'ema' mode, the encoder feature targets) — its recon decoder +
        # coord head are dead compute, skipped explicitly
        # fused Pallas attention for the grad-free passes (EMA forward +
        # frozen teacher): measured 1.22x vs XLA at these shapes on the real
        # chip (docs/BENCHMARKS.md "Fused attention"); the route only engages
        # on the TPU backend (models/blocks.py:_fused_available), so CPU
        # parity tests always take the XLA path
        from gm3d_tpu.models.blocks import fused_attention_scope

        zeros_mask = jnp.zeros((batch, student.num_group), bool)
        # trace-time contexts: int8 EMA matmuls when quantize_ema; fused attn
        with _ema_ctx(), fused_attention_scope(use_fused_attention):
            outs_ema = student.apply(
                state.ema_variables(),
                samples,
                zeros_mask,
                0,
                shared_learnable_tokens,
                deterministic=True,
                grouped=grouped,
                tokens=ema_tokens,
                loss_pred_only=trim_ema,
            )
        # ---- geometric-complexity mask from EMA loss prediction
        mask = geometric_mask(
            r_mask, outs_ema["loss_pred"], num_mask, scalars["keep_ratio"]
        )
        if use_clip:
            # frozen CLIP tower over on-device depth renders of the full
            # cloud; one target token per group center (models/clip.py)
            from gm3d_tpu.models.clip import clip_group_targets

            clip_targets = clip_group_targets(
                teacher, teacher_params, samples, grouped.center
            )

        def loss_fn(params):
            student_vars = {"params": params}
            if state.batch_stats is not None:
                student_vars["batch_stats"] = state.batch_stats
            rngs = {"dropout": r_drop, "droppath": r_dp}
            if use_distill and shared_opt:
                outs, updates, teacher_feats, point_target, point_reco, pred_masked = (
                    gm3d_forward_distill(
                        student,
                        teacher,
                        student_vars,
                        teacher_params,
                        samples,
                        mask,
                        num_mask,
                        shared_learnable_tokens,
                        rngs,
                        mutable=True,
                        grouped=grouped,
                        detach_loss_pred=detach_lp,
                        teacher_tokens=teacher_tokens,
                        fused_teacher_attention=use_fused_attention,
                    )
                )
                loss_outs = losses.gm3d_feature_loss(
                    pred_masked,
                    jax.lax.stop_gradient(teacher_feats),
                    outs["mask_idx"],
                    jax.lax.stop_gradient(point_target),
                    point_reco,
                )
            elif use_sep_distill:
                outs, updates = student.apply(
                    student_vars,
                    samples,
                    mask,
                    num_mask,
                    shared_learnable_tokens,
                    deterministic=False,
                    rngs=rngs,
                    mutable=["batch_stats"],
                    grouped=grouped,
                    detach_loss_pred_branch=True,
                )
                teacher_grouped = grouped if (
                    teacher.num_group == student.num_group
                    and teacher.group_size == student.group_size
                ) else None
                with fused_attention_scope(use_fused_attention):
                    teacher_feats = teacher.apply(
                        teacher_params, samples, method=teacher.encode_features,
                        grouped=teacher_grouped,
                        tokens=teacher_tokens if teacher_grouped is not None else None,
                    )
                loss_outs = losses.gm3d_separated_loss(
                    outs["pix_pred"][:, -num_mask:],
                    jax.lax.stop_gradient(teacher_feats),
                    outs["mask_idx"],
                    outs["rebuild_points"][:, -num_mask:],
                    outs["neighborhood"],
                )
            else:
                outs, updates = student.apply(
                    student_vars,
                    samples,
                    mask,
                    num_mask,
                    shared_learnable_tokens,
                    deterministic=False,
                    rngs=rngs,
                    mutable=["batch_stats"],
                    grouped=grouped,
                    detach_loss_pred_branch=detach_lp,
                )
                if use_ema_feats or use_clip:
                    # feature targets from the EMA's unmasked pass (ema) or
                    # the frozen CLIP tower (clip): normalized feature MSE at
                    # masked slots, no point-space replay
                    pred_masked = outs["pix_pred"][:, -num_mask:]
                    if use_clip:
                        target = take_groups(clip_targets, outs["mask_idx"])
                    else:
                        target = take_groups(
                            jax.lax.stop_gradient(outs_ema["features"]), outs["mask_idx"]
                        )
                    pn = pred_masked.astype(jnp.float32)
                    pn = pn / jnp.maximum(jnp.linalg.norm(pn, axis=-1, keepdims=True), 1e-12)
                    tn = target.astype(jnp.float32)
                    tn = tn / jnp.maximum(jnp.linalg.norm(tn, axis=-1, keepdims=True), 1e-12)
                    mse = jnp.sum((pn - tn) ** 2, axis=-1)
                    loss_outs = {
                        "MSE_mean": jnp.mean(mse),
                        "Chamfer_mean": jnp.zeros(()),
                        "matrix": mse,
                    }
                else:
                    rebuild_masked = outs["rebuild_points"][:, -num_mask:]
                    loss_outs = losses.gm3d_usual_loss(
                        rebuild_masked, outs["neighborhood"], outs["mask_idx"]
                    )

            loss = (
                scalars["w_mse"] * loss_outs["MSE_mean"]
                + scalars["w_cd"] * loss_outs["Chamfer_mean"]
            )
            loss_pred_masked = outs["loss_pred"][:, -num_mask:]
            matrix = jax.lax.stop_gradient(loss_outs["matrix"])
            if relative:
                loss_learn = losses.relative_learning_loss(loss_pred_masked, matrix)
            else:
                loss_learn = losses.mse_learning_loss(loss_pred_masked, matrix)
            total = loss + loss_learn
            aux = {
                "loss": loss,
                "loss_mse": loss_outs["MSE_mean"],
                "loss_chfr": loss_outs["Chamfer_mean"],
                "loss_learn": loss_learn,
                "updates": updates,
            }
            return total, aux

        # remat_student: recompute the student forward during the backward
        # (trades FLOPs for activation memory; a perf-round experiment lever)
        loss_fn_ = jax.checkpoint(loss_fn) if remat_student else loss_fn
        # fused attention for the STUDENT forward+backward too: the
        # custom-VJP Pallas kernel measured 1.13x (f32) / 1.19x (bf16) vs
        # XLA fwd+bwd at these shapes (docs/BENCHMARKS.md); scope active
        # while loss_fn traces under value_and_grad
        with fused_attention_scope(use_fused_attention):
            (total, aux), grads = jax.value_and_grad(loss_fn_, has_aux=True)(state.params)
        new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, new_updates)
        # EMA updates only on optimizer-update steps when accumulating
        # (engine...:262-266: model_ema.update inside the accum_iter gate)
        decay = scalars["ema_decay"]
        if accum_steps > 1:
            is_update = ((state.step + 1) % accum_steps) == 0
            decay = jnp.where(is_update, decay, 1.0)
        new_batch_stats = aux["updates"].get("batch_stats", state.batch_stats)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, decay),
            ema_batch_stats=ema_update(state.ema_batch_stats, new_batch_stats, decay),
        )
        metrics = {
            "loss": total,
            "loss_recon": aux["loss"],
            "loss_mse": aux["loss_mse"],
            "loss_chfr": aux["loss_chfr"],
            "loss_learn": aux["loss_learn"],
            "grad_norm": _global_norm(grads),
        }
        return new_state, metrics

    return step


def _m2ae_losses(model, outs):
    """Masked-fine-group Chamfer + per-coarse-group loss matrix."""
    from gm3d_tpu.ops.chamfer import chamfer_group

    per_fine = chamfer_group(
        outs["rebuild"].astype(jnp.float32), outs["gt"].astype(jnp.float32)
    )  # (B, G0)
    w = (~outs["fine_vis"]).astype(jnp.float32)
    loss = jnp.sum(per_fine * w) / jnp.maximum(jnp.sum(w), 1.0)
    # aggregate masked-fine losses onto their nearest coarse group
    coarse_groups = model.num_groups[-1]
    one_hot = jax.nn.one_hot(outs["fine_to_coarse"], coarse_groups)  # (B, G0, Gc)
    num = jnp.einsum("bg,bgc->bc", per_fine * w, one_hot)
    den = jnp.maximum(jnp.einsum("bg,bgc->bc", w, one_hot), 1.0)
    matrix = num / den  # (B, Gc) per-coarse-group mean masked loss
    return loss, matrix


def make_m2ae_train_step(
    model,
    tx: optax.GradientTransformation,
    mask_ratio: float = 0.8,
    loss_type: str = "cdl2",
    augment: bool = True,
):
    """Point-M2AE pretrain step: random coarse mask, hierarchical
    reconstruction, Chamfer on masked finest-scale groups."""
    coarse_groups = model.num_groups[-1]
    num_mask = int(coarse_groups * mask_ratio)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, pts: jax.Array, rng: jax.Array):
        r_aug, r_mask, r_drop, r_dp = jax.random.split(rng, 4)
        samples = scale_and_translate(r_aug, pts) if augment else pts
        batch = samples.shape[0]
        masked = random_mask(r_mask, batch, coarse_groups, num_mask)
        coarse_vis = ~masked
        # hierarchy outside the grad trace (geometry only; saves the
        # duplicate centers pass inside __call__ on older code paths)
        from gm3d_tpu.models.m2ae import build_hierarchy

        hier = build_hierarchy(samples, model.num_groups, model.group_sizes)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outs, updates = model.apply(
                variables,
                samples,
                coarse_vis,
                deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_dp},
                mutable=["batch_stats"],
                hierarchy=hier,
            )
            loss, _ = _m2ae_losses(model, outs)
            return loss, updates

        # NOT fused-attention routed: unmeasured here, and the finetune A/B
        # showed the kernel can LOSE inside full train steps (BENCHMARKS.md)
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, new_updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "grad_norm": _global_norm(grads)}

    return step


def make_probe_step(feat_model, classifier, tx: optax.GradientTransformation):
    """Optional supervised Classifier probe trained during pretraining
    (``--classification``, ``engine_pretrain_Classifier_SVM.py:120-137``):
    encoder features are extracted in eval mode and stop-gradiented — the
    probe has its own optimizer and never influences the student."""
    from gm3d_tpu.train import losses as _losses

    @jax.jit
    def step(probe_state: TrainState, feat_vars, pts, labels, rng):
        feats = jax.lax.stop_gradient(
            feat_model.apply(feat_vars, pts, method=feat_model.encode_features)
        )

        def loss_fn(params):
            variables = {"params": params}
            if probe_state.batch_stats is not None:
                variables["batch_stats"] = probe_state.batch_stats
            logits, updates = classifier.apply(
                variables,
                feats,
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            loss, acc = _losses.classification_loss(logits, labels)
            return loss, (acc, updates)

        (loss, (acc, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            probe_state.params
        )
        new_updates, opt_state = tx.update(grads, probe_state.opt_state, probe_state.params)
        params = optax.apply_updates(probe_state.params, new_updates)
        new_state = probe_state.replace(
            step=probe_state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", probe_state.batch_stats),
            opt_state=opt_state,
        )
        return new_state, {"loss_cls": loss, "acc_cls": acc}

    return step


def make_multi_step(step_fn, has_teacher: bool = True, has_scalars: bool = True):
    """Scan ``k`` train steps inside ONE dispatch.

    Amortises host->device dispatch latency (the dominant cost under a remote
    controller / tunnel, and non-trivial even locally): the per-step batches
    are stacked on the leading axis and ``lax.scan`` chains the state on
    device. Metrics are returned per step.

    ``has_teacher``/``has_scalars`` select the wrapped step's arity:
    GM3D ``(state, tvars, pts, rng, scalars)``, M2AE+GM3D
    ``(state, pts, rng, scalars)``, legacy Point-MAE / plain M2AE
    ``(state, pts, rng)``.

    Usage:
        multi = make_multi_step(step_fn)
        state, metrics = multi(state, teacher_vars, stacked_pts (K,B,N,3),
                               rngs (K,), scalars)
    """
    inner = getattr(step_fn, "__wrapped__", step_fn)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(state, teacher_vars, pts_stack, rngs, scalars):
        def body(carry, xs):
            pts, rng = xs
            if has_teacher:
                new_state, metrics = inner(carry, teacher_vars, pts, rng, scalars)
            elif has_scalars:
                new_state, metrics = inner(carry, pts, rng, scalars)
            else:
                new_state, metrics = inner(carry, pts, rng)
            return new_state, metrics

        return jax.lax.scan(body, state, (pts_stack, rngs))

    return multi


def make_m2ae_gm3d_train_step(
    model,
    tx: optax.GradientTransformation,
    mask_ratio: float = 0.8,
    relative: bool = True,
    augment: bool = True,
    use_fused_attention: bool = False,
):
    """Point-M2AE + GM3D: geometric-complexity coarse-mask selection driven by
    an EMA loss predictor, plus the relative learning loss — the hierarchical
    analog of the Point-MAE GM3D path (SURVEY.md §7.2 step 8: mask generated
    at the coarsest scale, propagated coarse->fine).

    ``use_fused_attention`` routes the UNMASKED attention sites (the decoder
    stages; the encoder's local-radius mask declines the kernel) through the
    Pallas kernel. Default OFF until a same-session end-to-end A/B on this
    surface measures a win (scripts/perf_levers_m2ae.py `fused_decoder`;
    routing is strictly A/B-driven — docs/BENCHMARKS.md)."""
    coarse_groups = model.num_groups[-1]
    # GM3D generate_mask count convention (L - int(L*(1-r)), see gm3d_num_mask)
    # — this is the GM3D masking applied at the coarse scale
    num_mask = gm3d_num_mask(coarse_groups, mask_ratio)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(
        state: TrainState,
        pts: jax.Array,
        rng: jax.Array,
        scalars: Dict[str, jax.Array],
    ):
        r_aug, r_mask, r_drop, r_dp = jax.random.split(rng, 4)
        samples = scale_and_translate(r_aug, pts) if augment else pts
        batch = samples.shape[0]

        # ONE hierarchy per step, shared by the EMA and student passes
        # (deterministic FPS/KNN — numerically identical to per-pass
        # recomputation; measured ~54 ms/step of serial VPU work at the
        # reference shapes, previously executed ~3x — round-5 profile)
        from gm3d_tpu.models.m2ae import build_hierarchy

        hier = build_hierarchy(samples, model.num_groups, model.group_sizes)

        from gm3d_tpu.models.blocks import fused_attention_scope

        # EMA forward, fully visible -> per-coarse-group predicted loss
        all_vis = jnp.ones((batch, coarse_groups), bool)
        with fused_attention_scope(use_fused_attention):
            outs_ema = model.apply(state.ema_variables(), samples, all_vis,
                                   deterministic=True, hierarchy=hier)
        masked = geometric_mask(
            r_mask, outs_ema["loss_pred"], num_mask, scalars["keep_ratio"]
        )
        coarse_vis = ~masked

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outs, updates = model.apply(
                variables,
                samples,
                coarse_vis,
                deterministic=False,
                rngs={"dropout": r_drop, "droppath": r_dp},
                mutable=["batch_stats"],
                hierarchy=hier,
            )
            loss, matrix = _m2ae_losses(model, outs)
            matrix = jax.lax.stop_gradient(matrix)
            # learning loss on masked coarse slots (gathered to static M)
            order = jnp.argsort(coarse_vis.astype(jnp.int32), axis=-1, stable=True)
            mask_idx = order[:, :num_mask]  # masked (False=0) sort first
            lp = jnp.take_along_axis(outs["loss_pred"], mask_idx, axis=1)
            mt = jnp.take_along_axis(matrix, mask_idx, axis=1)
            if relative:
                loss_learn = losses.relative_learning_loss(lp, mt)
            else:
                loss_learn = losses.mse_learning_loss(lp, mt)
            return loss + loss_learn, (loss, loss_learn, updates)

        with fused_attention_scope(use_fused_attention):
            (total, (loss, loss_learn, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        new_updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, new_updates)
        decay = scalars["ema_decay"]
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=updates.get("batch_stats", state.batch_stats),
            opt_state=opt_state,
            ema_params=ema_update(state.ema_params, params, decay),
            ema_batch_stats=ema_update(
                state.ema_batch_stats, updates.get("batch_stats", state.batch_stats), decay
            ),
        )
        metrics = {
            "loss": total,
            "loss_chfr": loss,
            "loss_learn": loss_learn,
            "grad_norm": _global_norm(grads),
        }
        return new_state, metrics

    return step
