"""Chamfer distance with per-point granularity.

Replaces the reference's ``extensions/chamfer_dist`` CUDA build. The reference
uses it with two call conventions (SURVEY.md §2.3):

  - scalar loss: ``Point_MAE.forward`` (``models/Point_MAE.py:426``) treats the
    result as a single reconstruction loss;
  - per-group matrix: the GM3D student reshapes per-point distances to
    ``(N, PP, n)`` and means over points to get a per-group loss matrix
    (``models_mae_learn_loss_Classifier_SVM_feature_besed.py:988-997``).

We therefore expose per-point nearest-neighbour distances and reduce outside.
Patch sizes here are tiny (<= 32 points), so the batched 32x32 distance
matrices fuse into a handful of VPU ops under XLA; the cross term uses the MXU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(..., n, 3) x (..., m, 3) -> (..., n, m) squared distances (fp32)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    cross = jnp.einsum("...nc,...mc->...nm", a, b)
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    d = a2 - 2.0 * cross + b2
    return jnp.maximum(d, 0.0)


def chamfer_per_point(a: jax.Array, b: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-point squared nearest-neighbour distances.

    a: (..., n, 3), b: (..., m, 3) ->
    (dist_a (..., n), dist_b (..., m)): for each point the squared distance
    to its nearest neighbour in the other set.
    """
    d = _pairwise_sqdist(a, b)
    return jnp.min(d, axis=-1), jnp.min(d, axis=-2)


def chamfer_l2(a: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar Chamfer-L2 (mean of squared NN distances, both directions).

    Matches ``ChamferDistanceL2`` as used for the teacher loss (cdl2,
    ``cfgs/config.yaml`` model.loss).
    """
    da, db = chamfer_per_point(a, b)
    return jnp.mean(da) + jnp.mean(db)


def chamfer_l1(a: jax.Array, b: jax.Array) -> jax.Array:
    """Scalar Chamfer-L1 (mean of euclidean NN distances, both directions)."""
    da, db = chamfer_per_point(a, b)
    eps = 1e-12
    return jnp.mean(jnp.sqrt(da + eps)) + jnp.mean(jnp.sqrt(db + eps))


def chamfer_group(a: jax.Array, b: jax.Array, squared: bool = True) -> jax.Array:
    """Per-group Chamfer: mean per-point NN distance within each leading index.

    a, b: (..., n, 3) / (..., m, 3) -> (...,) — used for the GM3D loss matrix
    (per-masked-group Chamfer, reference ``...feature_besed.py:988-997``).
    """
    da, db = chamfer_per_point(a, b)
    if not squared:
        eps = 1e-12
        da = jnp.sqrt(da + eps)
        db = jnp.sqrt(db + eps)
    return jnp.mean(da, axis=-1) + jnp.mean(db, axis=-1)
