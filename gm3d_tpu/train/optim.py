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


import re as _re


def layerwise_lr_decay_scales(
    params: Any, depth: int = 12, decay: float = 0.75
) -> Any:
    """Per-parameter LR scales for fine-tuning (``util/lr_decay.py:14-61``).

    Layer id: patch embed / tokens / pos embeds -> 0; encoder block i -> i+1;
    everything else (norm, head) -> depth+1. scale = decay**(depth+1-layer).

    Handles both flat encoders (``blocks/block{i}``, PointTransformer) and the
    hierarchical M2AE encoder (``stage{s}/block{i}``) by assigning cumulative
    block indices across stages.
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
    stage_offset = {}
    acc = 0
    for s in sorted(stage_blocks):
        stage_offset[s] = acc
        acc += stage_blocks[s]
    total_blocks = acc if acc else depth
    num_layers = max(total_blocks, 1) + 1

    def layer_id(path: str) -> int:
        m = _re.search(r"stage(\d+)/block(\d+)", path)
        if m:
            return stage_offset[int(m.group(1))] + int(m.group(2)) + 1
        if "blocks/block" in path:
            i = int(path.split("blocks/block")[1].split("/")[0])
            return i + 1
        stem = ("encoder/", "cls_token", "cls_pos", "pos_embed", "patch_embed", "merge")
        if any(s in path for s in stem):
            return 0
        return num_layers

    scales = {p: decay ** (num_layers - layer_id(p)) for p in paths}

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
    depth: int = 12,
    layer_decay: float = 0.75,
    grad_clip: float | None = 10.0,
) -> optax.GradientTransformation:
    """AdamW + layer-wise LR decay (``main_finetune.py:359-366``)."""
    scales = layerwise_lr_decay_scales(params, depth, layer_decay)
    tx = optax.chain(
        build_adamw(learning_rate, weight_decay, grad_clip=grad_clip),
        scale_by_tree(scales),
    )
    return tx
