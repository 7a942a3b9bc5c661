"""Mask generators (True = masked / removed, matching the reference)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rank(x: jax.Array) -> jax.Array:
    """Per-row ascending rank of each element (0 = smallest)."""
    return jnp.argsort(jnp.argsort(x, axis=-1), axis=-1)


def random_mask(rng: jax.Array, batch: int, num_groups: int, num_mask: int) -> jax.Array:
    """Uniform random mask with exactly ``num_mask`` True per row
    (``models/Point_MAE.py:297-320`` ``_mask_center_rand``)."""
    scores = jax.random.uniform(rng, (batch, num_groups))
    return _rank(scores) < num_mask


def block_mask(rng: jax.Array, centers: jax.Array, num_mask: int) -> jax.Array:
    """Contiguous block mask: mask the ``num_mask`` nearest groups to one
    random seed center (``models/Point_MAE.py:268-295`` ``_mask_center_block``)."""
    batch, num_groups, _ = centers.shape
    seed = jax.random.randint(rng, (batch,), 0, num_groups)
    seed_pt = jnp.take_along_axis(centers, seed[:, None, None], axis=1)  # (B,1,3)
    dist = jnp.sum((centers - seed_pt) ** 2, axis=-1)  # (B,G)
    return _rank(dist) < num_mask


def gm3d_num_mask(num_groups: int, mask_ratio: float) -> int:
    """Masked-slot count of the GM3D ``generate_mask``
    (``...feature_besed.py:1065``): ``L - int(L * (1 - mask_ratio))``.

    NOT ``int(L * mask_ratio)``: at the default ratio 0.6 with L=64 the
    reference masks 64 - int(25.6) = 39 groups, not 38.  (The teacher's own
    random mask, ``models/Point_MAE.py:308``, DOES use ``int(L * ratio)`` —
    the two conventions differ whenever ``L * ratio`` is non-integral.)
    """
    return num_groups - int(num_groups * (1.0 - mask_ratio))


def keep_ratio_schedule(epoch: float, total_epochs: int, after_200_epoch: bool = False,
                        legacy: bool = False) -> float:
    """Fraction of the masked slots chosen by predicted loss, ramped over
    training (``...feature_besed.py:1073-1082``). ``legacy`` selects the OLDER
    student variant's uncapped slope-0.5 ramp
    (``models_mae_learn_loss.py:756``: ``(epoch+1)/total_epoch * 0.5``)."""
    if legacy:
        return float(epoch + 1) / total_epochs * 0.5
    if after_200_epoch:
        return min(float(epoch + 1) / (total_epochs / 2) * 0.5, 0.5)
    return float(epoch + 1) / total_epochs * 0.8


def geometric_mask(
    rng: jax.Array,
    loss_pred: jax.Array,
    num_mask: int,
    keep_ratio: jax.Array,
) -> jax.Array:
    """Geometric-complexity mask selection (``...feature_besed.py:1062-1109``).

    Of the ``num_mask`` masked slots, the ``floor(num_mask * keep_ratio)``
    groups with the HIGHEST predicted loss are masked deterministically; the
    remainder are drawn uniformly from the other groups. ``keep_ratio`` may be
    a traced scalar (epoch-dependent) — all shapes stay static.

    loss_pred: (B, G) per-group predicted loss (EMA model, unmasked pass).
    Returns (B, G) bool, True = masked.
    """
    _, num_groups = loss_pred.shape
    len_loss = jnp.floor(num_mask * keep_ratio).astype(jnp.int32)
    loss_rank = _rank(loss_pred.astype(jnp.float32))  # ascending
    by_loss = loss_rank >= (num_groups - len_loss)
    noise = jax.random.uniform(rng, loss_pred.shape)
    # top-loss groups get an infinitely large key so they are always masked;
    # the rest compete by uniform noise for the remaining slots.
    key = jnp.where(by_loss, 2.0 + loss_rank.astype(jnp.float32), noise)
    return _rank(-key) < num_mask
