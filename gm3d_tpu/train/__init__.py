"""Training: jit-compiled steps, schedules, optimizer builders, train state."""

from gm3d_tpu.train.state import TrainState, create_train_state, ema_update
from gm3d_tpu.train.schedules import (
    cosine_warmup_schedule,
    ema_decay_schedule,
    loss_weights,
    effective_lr,
)
from gm3d_tpu.train.optim import build_adamw, layerwise_lr_decay_scales, scale_by_tree
from gm3d_tpu.train import losses

__all__ = [
    "TrainState",
    "create_train_state",
    "ema_update",
    "cosine_warmup_schedule",
    "ema_decay_schedule",
    "loss_weights",
    "effective_lr",
    "build_adamw",
    "layerwise_lr_decay_scales",
    "scale_by_tree",
    "losses",
]
