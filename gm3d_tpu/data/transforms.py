"""On-device point-cloud augmentations.

Vectorised equivalents of ``datasets/data_transforms.py`` in the reference
(which loops per sample in Python on CUDA tensors — a host sync the TPU
pipeline avoids by running these inside the jitted train step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_and_translate(
    rng: jax.Array,
    pts: jax.Array,
    scale_low: float = 2.0 / 3.0,
    scale_high: float = 3.0 / 2.0,
    translate_range: float = 0.2,
) -> jax.Array:
    """Per-sample anisotropic scale + translate
    (``data_transforms.py:6-21`` ``PointcloudScaleAndTranslate`` — the only
    augmentation active in pretraining and fine-tune)."""
    batch = pts.shape[0]
    r_scale, r_shift = jax.random.split(rng)
    scale = jax.random.uniform(r_scale, (batch, 1, 3), minval=scale_low, maxval=scale_high)
    shift = jax.random.uniform(
        r_shift, (batch, 1, 3), minval=-translate_range, maxval=translate_range
    )
    return pts * scale + shift


def scale(
    rng: jax.Array, pts: jax.Array, scale_low: float = 2.0 / 3.0, scale_high: float = 3.0 / 2.0
) -> jax.Array:
    """Per-sample anisotropic scale only (``data_transforms.py:50-62``
    ``PointcloudScale`` — inactive in reference training, capability parity)."""
    batch = pts.shape[0]
    s = jax.random.uniform(rng, (batch, 1, 3), minval=scale_low, maxval=scale_high)
    return pts * s


def translate(rng: jax.Array, pts: jax.Array, translate_range: float = 0.2) -> jax.Array:
    """Per-sample translate only (``data_transforms.py:64-75``
    ``PointcloudTranslate``)."""
    batch = pts.shape[0]
    t = jax.random.uniform(rng, (batch, 1, 3), minval=-translate_range, maxval=translate_range)
    return pts + t


def random_horizontal_flip(
    rng: jax.Array, pts: jax.Array, upright_axis: int = 2, p_apply: float = 0.95
) -> jax.Array:
    """Mirror each non-upright axis about its per-sample max with prob 0.5,
    gated by a 0.95 per-sample apply prob (``data_transforms.py:96-118``
    ``RandomHorizontalFlip``)."""
    batch = pts.shape[0]
    r_apply, r_flip = jax.random.split(rng)
    apply = jax.random.uniform(r_apply, (batch, 1, 1)) < p_apply
    flip = jax.random.uniform(r_flip, (batch, 1, 3)) < 0.5
    axis_sel = jnp.arange(3) != upright_axis  # (3,)
    do_flip = apply & flip & axis_sel[None, None, :]
    coord_max = jnp.max(pts, axis=1, keepdims=True)  # (B, 1, 3)
    return jnp.where(do_flip, coord_max - pts, pts)


def rotate_z(rng: jax.Array, pts: jax.Array) -> jax.Array:
    """Random rotation about the up axis (``data_transforms.py`` Rotate)."""
    batch = pts.shape[0]
    theta = jax.random.uniform(rng, (batch,), maxval=2.0 * jnp.pi)
    c, s = jnp.cos(theta), jnp.sin(theta)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    rot = jnp.stack(
        [c, -s, zeros, s, c, zeros, zeros, zeros, ones], axis=-1
    ).reshape(batch, 3, 3)
    return jnp.einsum("bnc,bcd->bnd", pts, rot)


def jitter(rng: jax.Array, pts: jax.Array, std: float = 0.01, clip: float = 0.05) -> jax.Array:
    """Gaussian jitter, clipped (``data_transforms.py`` Jitter)."""
    noise = jnp.clip(std * jax.random.normal(rng, pts.shape), -clip, clip)
    return pts + noise


def random_dropout(rng: jax.Array, pts: jax.Array, max_dropout: float = 0.875) -> jax.Array:
    """Random point dropout: dropped points are replaced by the first point
    (``data_transforms.py`` RandomDropout semantics — keeps shapes static)."""
    batch, num_points, _ = pts.shape
    r_ratio, r_mask = jax.random.split(rng)
    ratio = jax.random.uniform(r_ratio, (batch, 1)) * max_dropout
    drop = jax.random.uniform(r_mask, (batch, num_points)) < ratio
    first = pts[:, :1, :]
    return jnp.where(drop[..., None], first, pts)


def separate_point_cloud(
    rng: jax.Array, pts: jax.Array, num_crop: int
) -> tuple[jax.Array, jax.Array]:
    """Crop generator (``utils/miscc.py:131-184`` seprate_point_cloud):
    pick a random view direction per sample, remove the ``num_crop`` points
    nearest to it, return (remaining-as-input, cropped). Static shapes: the
    input keeps N - num_crop points.
    """
    batch, num_points, _ = pts.shape
    direction = jax.random.normal(rng, (batch, 1, 3))
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    dist = jnp.sum((pts - direction) ** 2, axis=-1)  # (B, N)
    order = jnp.argsort(dist, axis=-1)
    crop_idx = order[:, :num_crop]
    keep_idx = order[:, num_crop:]
    crop = jnp.take_along_axis(pts, crop_idx[..., None], axis=1)
    keep = jnp.take_along_axis(pts, keep_idx[..., None], axis=1)
    return keep, crop


def unit_sphere_normalize(pts: jax.Array) -> jax.Array:
    """Center at centroid, scale to unit sphere
    (``datasets/ShapeNet55Dataset.py:44-50`` pc_norm)."""
    centroid = jnp.mean(pts, axis=-2, keepdims=True)
    pts = pts - centroid
    scale = jnp.max(jnp.sqrt(jnp.sum(pts**2, axis=-1)), axis=-1)
    # degenerate (all-identical) clouds: leave centered, don't divide by 0
    scale = jnp.where(scale > 0, scale, 1.0)
    return pts / scale[..., None, None]
