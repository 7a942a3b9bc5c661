"""Optimizer builders: AdamW with timm-style weight-decay masking and
layer-wise LR decay for fine-tuning."""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax


def _decay_mask(params: Any) -> Any:
    """timm ``add_weight_decay``: no decay for 1-d params (biases, norms)
    (``main_pretrain.py:396-398``)."""
    return jax.tree.map(lambda p: p.ndim > 1, params)


def build_adamw(
    learning_rate,
    weight_decay: float = 0.05,
    betas=(0.9, 0.95),
    grad_clip: float | None = None,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW(betas=(0.9, 0.95), wd on >=2-d params only) as in
    ``main_pretrain.py:398``; optional global-norm clip (finetune configs set
    ``grad_norm_clip: 10``) and gradient accumulation (``--accum_iter`` /
    ``step_per_update``, SURVEY.md §2.4)."""
    tx = optax.adamw(
        learning_rate,
        b1=betas[0],
        b2=betas[1],
        weight_decay=weight_decay,
        mask=_decay_mask,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def _legacy_decay_mask(params: Any) -> Any:
    """The legacy runners' ``add_weight_decay`` (``tools/builder.py:40-54``):
    no decay for 1-d params, ``.bias``, or ANY param whose name contains
    ``token`` (mask_token / cls_token) — an extra rule timm's version lacks."""

    def keep(kp, p):
        leaf = "/".join(str(getattr(k, "key", k)) for k in kp)
        return p.ndim > 1 and "token" not in leaf

    return jax.tree_util.tree_map_with_path(keep, params)


def build_legacy_adamw(
    learning_rate,
    weight_decay: float = 0.05,
    accum_steps: int = 1,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    """Legacy-runner AdamW (``tools/builder.py:55-56``
    ``optim.AdamW(param_groups, **kwargs)``): TORCH-DEFAULT betas
    (0.9, 0.999) — not the HPM mains' (0.9, 0.95) — the token-aware decay
    mask, and by default NO grad clipping (plain ``loss.backward()``,
    ``tools/runner_pretrain.py:138-151``). This is the optimizer that
    produced the published teacher weights. The legacy FINETUNE runner adds
    an explicit clip to the config's ``grad_norm_clip``
    (``tools/runner_finetune.py:157-158``) — pass ``grad_clip`` for that.

    Accumulation SUMS micro-batch gradients: the legacy runners call plain
    ``loss.backward()`` per micro-batch with NO loss division and step on the
    accumulated grad (``runner_pretrain.py:138-151``, ``runner_finetune.py
    :150-160``) — unlike the HPM engines, which divide the loss by
    ``accum_iter`` (mean). ``optax.MultiSteps`` averages, so the mean is
    scaled back to the sum before the clip (the finetune runner clips the
    SUMMED grad at the update boundary) and the Adam step."""
    tx = optax.adamw(
        learning_rate, b1=0.9, b2=0.999, weight_decay=weight_decay,
        mask=_legacy_decay_mask,
    )
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accum_steps > 1:
        tx = optax.MultiSteps(
            optax.chain(optax.scale(float(accum_steps)), tx),
            every_k_schedule=accum_steps,
        )
    return tx


def build_gm3d_shared_optimizer(
    params: Any,
    learning_rate,
    weight_decay: float = 0.05,
    betas=(0.9, 0.95),
    grad_clip: float | None = 5.0,
    accum_steps: int = 1,
    frozen_modules: tuple = ("coord_head",),
) -> optax.GradientTransformation:
    """Shared-optimizer GM3D pretrain (``main_pretrain.py:394-398`` AdamW +
    the engine's NativeScaler clip_grad=5 default, ``util/misc.py:256``).

    ``frozen_modules``: in FEATURE mode the coordinate head's output
    (``point_pred``) is never consumed by the shared engine's loss, so its
    grads are ``None`` in torch — and torch AdamW SKIPS None-grad params
    entirely, including decoupled weight decay. optax applies wd to zero-grad
    params, so the coord head must be explicitly frozen to match (trajectory
    parity pinned this). Pass ``()`` for usual mode, where the coord head IS
    the reconstruction path."""
    tx = build_adamw(learning_rate, weight_decay, betas, grad_clip=grad_clip)
    if frozen_modules:

        def label(kp, _):
            top = str(getattr(kp[0], "key", kp[0]))
            return "frozen" if top in frozen_modules else "train"

        labels = jax.tree_util.tree_map_with_path(label, params)
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, labels
        )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


# --shared_opt False param split (main_pretrain.py:414-440): the recon
# optimizer owns encoder + recon decoder + coordinate head; the loss-pred
# optimizer owns the loss-pred decoder + feature head (increase_dim_2).
# decoder_pos_embed and both mask tokens sit in NEITHER param group in the
# reference, so they receive no updates — reproduced via the "frozen" label.
GM3D_RECON_MODULES = ("MAE_encoder", "MAE_decoder", "coord_head")
GM3D_LOSS_PRED_MODULES = ("MAE_decoder_loss_pred", "head_fc1", "head_bn", "head_fc2")


def gm3d_separated_labels(params: Any) -> Any:
    """Top-level-module labels for the separated-optimizer split."""

    def label(kp, _):
        top = str(getattr(kp[0], "key", kp[0]))
        if top in GM3D_RECON_MODULES:
            return "recon"
        if top in GM3D_LOSS_PRED_MODULES:
            return "loss_pred"
        return "frozen"

    return jax.tree_util.tree_map_with_path(label, params)


def build_gm3d_separated_optimizer(
    params: Any,
    learning_rate,
    weight_decay: float = 0.05,
    betas=(0.9, 0.95),
    accum_steps: int = 1,
    grad_clip: float | None = 5.0,
    loss_pred_learning_rate=None,
) -> optax.GradientTransformation:
    """Two AdamW states over disjoint param subsets (``--shared_opt False``,
    ``engine_pretrain_Classifier_SVM.py:335-642``).

    ``loss_pred_learning_rate``: the separated engine applies the cosine
    schedule ONLY to the recon optimizer (``adjust_learning_rate(optimizer,
    ...)`` at ``engine...:376``; ``optimizer_loss_pred`` is never touched), so
    the loss-pred branch trains at CONSTANT ``args.lr``. Pass the constant
    base lr here to reproduce that; defaults to ``learning_rate`` (same
    schedule on both) if omitted.

    Combined with ``detach_loss_pred_branch`` in the student forward, one
    backward pass yields exactly the separated semantics: the recon loss
    updates only the recon subset (the learning loss can't reach the encoder
    through the stop_gradient) and the learning loss updates only the
    loss-pred subset.

    Grad clipping: the engine's explicit ``clip_grad_norm_(..., 1.0)`` runs
    BEFORE backward on zeroed grads — an effective no-op (``engine...:546-548``
    + zero_grad at ``:571-574``) — but ``NativeScalerWithGradNormCount``
    defaults ``clip_grad=5.`` (``util/misc.py:256``) and each loss_scaler call
    clips ITS subset's gradients to global-norm 5 before stepping; reproduced
    per-label here."""
    lp_lr = loss_pred_learning_rate if loss_pred_learning_rate is not None else learning_rate
    tx = optax.multi_transform(
        {
            "recon": build_adamw(learning_rate, weight_decay, betas, grad_clip=grad_clip),
            "loss_pred": build_adamw(lp_lr, weight_decay, betas, grad_clip=grad_clip),
            "frozen": optax.set_to_zero(),
        },
        gm3d_separated_labels(params),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


import re as _re


def layerwise_lr_decay_scales(
    params: Any, decay: float = 0.75, num_layers: int = 12
) -> Any:
    """Per-parameter LR scales (``util/lr_decay.py:14-61`` ``param_groups_lrd``).

    Reproduces the reference's EFFECTIVE assignment, not BEiT's intent:
    ``get_layer_id_for_vit`` (``util/lr_decay.py:64-76``) matches image-ViT
    parameter names, and on ``PointTransformer``
    (``models/Point_MAE.py:444-543``) only the exact name ``cls_token`` and
    the ``blocks.`` prefix ever match:

      - ``cls_token``           -> layer 0   (scale ``decay**num_layers``,
        0.75^12 = 0.0317 — near-frozen)
      - ``blocks.blocks.i.*``   -> layer i+1 (scale ``decay**(num_layers-i-1)``;
        the LAST block, i=11, trains at full lr)
      - EVERYTHING else — the mini-PointNet patch embed (``encoder.*``), the
        ``pos_embed.*`` MLP, ``cls_pos``, ``norm_p``, ``cls_head_finetune.*``
        — falls to the ``else`` branch -> layer ``num_layers`` (scale 1.0).
        The BEiT spellings ('pos_embed' exact, 'patch_embed.' prefix) never
        occur in this model, so the whole stem trains at FULL lr.

    ``num_layers`` is HARDCODED to 12 in the reference regardless of the
    model's actual depth (``util/lr_decay.py:23``); the default here mirrors
    that so shallow test models get the same scales the reference would.

    Hierarchical M2AE trees (``stage{s}/block{i}``) have no reference
    counterpart (the M2AE finetune configs specify plain AdamW with no layer
    decay — see ``build_finetune_optimizer``); when layer decay is requested
    for them anyway we assign cumulative block indices across stages with the
    stem at layer 0 and the head at 1.0 (BEiT intent), since the reference's
    name-mismatch accident is meaningless for a model it never saw.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    paths = [path_str(kp) for kp, _ in flat]

    # cumulative block offset per hierarchical stage (stage0 first)
    stage_blocks = {}
    for p in paths:
        m = _re.search(r"stage(\d+)/block(\d+)", p)
        if m:
            s, i = int(m.group(1)), int(m.group(2))
            stage_blocks[s] = max(stage_blocks.get(s, 0), i + 1)

    if stage_blocks:  # hierarchical (M2AE): BEiT-intent progressive scheme
        stage_offset = {}
        acc = 0
        for s in sorted(stage_blocks):
            stage_offset[s] = acc
            acc += stage_blocks[s]
        n_layers = acc + 1

        def layer_id(path: str) -> int:
            m = _re.search(r"stage(\d+)/block(\d+)", path)
            if m:
                return stage_offset[int(m.group(1))] + int(m.group(2)) + 1
            stem = ("encoder/", "cls_token", "cls_pos", "pos_embed", "patch_embed", "merge")
            if any(s in path for s in stem):
                return 0
            return n_layers

    else:  # flat (PointTransformer): reference-effective mapping
        n_layers = num_layers

        def layer_id(path: str) -> int:
            if path == "cls_token":
                return 0
            if "blocks/block" in path:
                i = int(path.split("blocks/block")[1].split("/")[0])
                return min(i + 1, n_layers)
            return n_layers

    scales = {p: decay ** (n_layers - layer_id(p)) for p in paths}

    def to_scale(kp, _):
        return scales[path_str(kp)]

    return jax.tree_util.tree_map_with_path(to_scale, params)


def scale_by_tree(scales: Any) -> optax.GradientTransformation:
    """Multiply updates by a static per-parameter scale tree (applied after
    the main optimizer, i.e. scales the LR per layer)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_finetune_optimizer(
    params: Any,
    learning_rate: Callable,
    weight_decay: float = 0.05,
    layer_decay: float | None = 0.75,
    grad_clip: float | None = None,
    betas=(0.9, 0.999),
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """HPM-main finetune optimizer (``main_finetune.py:359-366``): AdamW over
    ``param_groups_lrd`` layer-decay groups.

    Betas are the TORCH DEFAULT (0.9, 0.999) — unlike the pretrain main,
    ``main_finetune.py:366`` passes no betas. ``grad_clip`` defaults to None
    (``--clip_grad`` default None, ``main_finetune.py:85``); pass the config's
    ``grad_norm_clip`` to get the legacy-runner behaviour instead
    (docs/DESIGN.md §13). ``layer_decay=None`` disables the per-layer scales
    (the M2AE finetune configs and the legacy runner use plain AdamW). Note
    the flat-model layer-id mapping uses the reference's HARDCODED
    ``num_layers=12`` (``util/lr_decay.py:23``), never the model's depth.

    ``accum_steps``: HPM accumulation is a MEAN (``engine_finetune.py:150``
    divides the loss by ``accum_iter`` before each backward), which is exactly
    ``optax.MultiSteps``' semantics; the wrap is outermost so the layer-decay
    scale tree applies to the accumulated update.

    torch applies the per-group lr (``lr * lr_scale``) to BOTH the Adam step
    and the decoupled weight decay, so the scale tree multiplies the combined
    optax update after ``adamw`` — equivalent math.
    """
    tx = build_adamw(learning_rate, weight_decay, betas, grad_clip=grad_clip)
    if layer_decay is not None and layer_decay != 1.0:
        scales = layerwise_lr_decay_scales(params, layer_decay)
        tx = optax.chain(tx, scale_by_tree(scales))
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx
