"""LR / EMA / loss-weight schedules matching the reference semantics."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xp(step):
    """numpy for host scalars, jnp under trace — the CLIs also evaluate the
    schedule host-side (the per-epoch TensorBoard ``lr`` scalar); a jnp
    evaluation there would dispatch device kernels through the tunnel and
    block on a forced host read (CLAUDE.md: don't add host round-trips)."""
    return jnp if isinstance(step, jax.Array) else np


def cosine_warmup_schedule(
    base_lr: float,
    min_lr: float,
    warmup_epochs: float,
    total_epochs: float,
    steps_per_epoch: int,
):
    """Per-iteration linear warmup + half-cycle cosine decay
    (``util/lr_sched.py:11-23`` — called with fractional epoch
    ``data_iter_step / len(loader) + epoch``)."""

    def schedule(step):
        xp = _xp(step)
        epoch = step / steps_per_epoch
        warm = base_lr * epoch / max(warmup_epochs, 1e-8)
        denom = max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + xp.cos(xp.pi * (epoch - warmup_epochs) / denom)
        )
        return xp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def legacy_cosine_epoch_schedule(
    base_lr: float,
    total_epochs: float,
    warmup_epochs: float,
    steps_per_epoch: int,
    lr_min: float = 1e-6,
    warmup_lr_init: float = 1e-6,
):
    """The LEGACY runners' schedule (``tools/builder.py:67-76`` timm
    ``CosineLRScheduler(t_in_epochs=True, warmup_prefix=False, lr_min=1e-6,
    warmup_lr_init=1e-6)`` stepped once per epoch,
    ``tools/runner_pretrain.py:176-180``): lr is CONSTANT within an epoch,
    warmup is linear from ``warmup_lr_init``, the cosine phase is evaluated
    at the RAW epoch (timm's warmup_prefix=False does not subtract warmup),
    and — because ``scheduler.step(epoch)`` runs at the END of epoch ``e`` —
    every epoch trains at the PREVIOUS epoch's value (epoch 0 at the
    constructor's warmup init). Reproduced as ``t = max(epoch - 1, 0)``.
    This is how the published teacher (``pretrain_PMAE.pth``) was trained."""

    def schedule(step):
        xp = _xp(step)
        epoch = xp.floor(step / steps_per_epoch)
        t = xp.maximum(epoch - 1.0, 0.0)
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * t / max(
            warmup_epochs, 1e-8
        )
        cos = lr_min + (base_lr - lr_min) * 0.5 * (
            1.0 + xp.cos(xp.pi * t / total_epochs)
        )
        return xp.where(t < warmup_epochs, warm, cos)

    return schedule


def effective_lr(blr: float, batch_size: int, accum_iter: int = 1, world_size: int = 1) -> float:
    """MAE lr scaling: lr = blr * eff_batch / 256 (``main_pretrain.py:381``)."""
    return blr * batch_size * accum_iter * world_size / 256.0


def ema_decay_schedule(epoch: float) -> float:
    """EMA decay ramp 0.999 -> 0.9999 over the first 100 epochs
    (``engine_pretrain_Classifier_SVM.py:62-65``)."""
    if epoch < 100:
        return 0.999 + epoch / 100.0 * (0.9999 - 0.999)
    return 0.9999


def loss_weights(epoch: float, after_epoch: int, multipliers=(13.889, 1000.0)):
    """Loss-mix switch: (1, 1) before ``after_epoch`` (default 15), then the
    configured multipliers (``engine_pretrain_Classifier_SVM.py:191-196``;
    defaults ``--loss_multiply_by [13.889, 1000]``)."""
    if epoch < after_epoch:
        return 1.0, 1.0
    return float(multipliers[0]), float(multipliers[1])
