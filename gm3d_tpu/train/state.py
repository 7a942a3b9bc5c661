"""Train state: params + opt state + EMA in one pytree (SURVEY.md §7.3)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any = None
    ema_batch_stats: Any = None

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v

    def ema_variables(self):
        v = {"params": self.ema_params}
        if self.ema_batch_stats is not None:
            v["batch_stats"] = self.ema_batch_stats
        return v


def create_train_state(
    variables: dict, tx: optax.GradientTransformation, with_ema: bool = False
) -> TrainState:
    # copy params/stats: train steps donate the state, which would otherwise
    # delete the caller's `variables` buffers on first step
    params = jax.tree.map(jnp.copy, variables["params"])
    batch_stats = variables.get("batch_stats")
    if batch_stats is not None:
        batch_stats = jax.tree.map(jnp.copy, batch_stats)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if with_ema else None,
        ema_batch_stats=(
            jax.tree.map(jnp.copy, batch_stats) if (with_ema and batch_stats is not None) else None
        ),
    )


def ema_update(ema_tree: Any, new_tree: Any, decay: jax.Array) -> Any:
    """timm ModelEma rule: ema = decay * ema + (1 - decay) * new
    (``engine_pretrain_Classifier_SVM.py:265-266``; decay ramped per epoch)."""
    if ema_tree is None:
        return None
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema_tree, new_tree
    )
