"""CLIP vision tower — the ``--learn_feature_loss clip`` distillation teacher.

Faithful flax re-implementation of the reference's CLIP ``VisionTransformer``
(``models_clip.py:213-246``, built by ``build_model`` ``:406`` and used as
``model_teacher = model_clip.visual`` in ``main_pretrain.py:311-317``), with
the engine's feature extractor semantics (``forward_features_clip``,
``engine_pretrain_Classifier_SVM.py:711-735``): ln_post over ALL tokens,
projection applied, cls token dropped -> (B, grid^2, output_dim).

Deliberate scope decision (documented in docs/DESIGN.md): the reference flag
is non-functional for point clouds — ``forward_features_clip`` is fed the
(B, G, S, 3) neighborhood tensor, which cannot enter ``conv1`` (a 2-D image
conv); the clip branch also unpacks a single tensor into three variables at
``engine...:441``. We make the capability real: point clouds are rendered to
3-channel orthographic depth images on device and each FPS group's feature
target is the patch token its center projects into.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import Dtype


def quick_gelu(x):
    """CLIP's QuickGELU (``models_clip.py:173-175``)."""
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` equivalent: fused in-proj (qkv, with
    bias) + out-proj."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        batch, seq, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(batch, seq, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * head_dim**-0.5
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(batch, seq, self.width)
        return nn.Dense(self.width, dtype=self.dtype, name="out")(out)


class CLIPBlock(nn.Module):
    """``ResidualAttentionBlock`` (``models_clip.py:178-199``): pre-norm attn
    + pre-norm MLP with QuickGELU."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + CLIPAttention(self.width, self.heads, dtype=self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x


class CLIPVisionTower(nn.Module):
    """CLIP ViT vision tower (``models_clip.py:213-246``)."""

    input_resolution: int = 32
    patch_size: int = 4
    width: int = 256
    layers: int = 6
    heads: int = 8
    output_dim: int = 384
    dtype: Dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.input_resolution // self.patch_size

    def setup(self):
        scale = self.width**-0.5
        self.conv1 = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )
        self.class_embedding = self.param(
            "class_embedding", nn.initializers.normal(scale), (self.width,)
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(scale),
            (self.grid**2 + 1, self.width),
        )
        self.ln_pre = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")
        self.blocks = [
            CLIPBlock(self.width, self.heads, dtype=self.dtype, name=f"block{i}")
            for i in range(self.layers)
        ]
        self.ln_post = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")
        self.proj = self.param(
            "proj", nn.initializers.normal(scale), (self.width, self.output_dim)
        )

    def _tokens(self, images):
        # images: (B, R, R, 3) channel-last
        x = self.conv1(images.astype(self.dtype))  # (B, grid, grid, width)
        batch = x.shape[0]
        x = x.reshape(batch, -1, self.width)
        cls = jnp.broadcast_to(
            self.class_embedding.astype(x.dtype), (batch, 1, self.width)
        )
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.positional_embedding.astype(x.dtype)
        x = self.ln_pre(x)
        for blk in self.blocks:
            x = blk(x)
        return x

    def __call__(self, images):
        """Standard CLIP forward: pooled cls embedding (B, output_dim)."""
        x = self._tokens(images)
        x = self.ln_post(x[:, 0, :])
        return x @ self.proj.astype(x.dtype)

    def features(self, images):
        """``forward_features_clip`` semantics: ln_post over ALL tokens,
        projected, cls dropped -> (B, grid^2, output_dim)."""
        x = self._tokens(images)
        x = self.ln_post(x)
        x = x @ self.proj.astype(x.dtype)
        return x[:, 1:, :]


def render_depth_views(pts: jax.Array, resolution: int) -> jax.Array:
    """On-device orthographic depth rasterisation: one channel per axis view.

    pts: (B, N, 3), roughly unit-sphere normalised. Returns (B, R, R, 3)
    where channel c is the max-depth splat of the view along axis c.
    """
    batch, num_points, _ = pts.shape
    coords = jnp.clip((pts + 1.0) * 0.5, 0.0, 1.0)  # [0, 1]^3
    bidx = jnp.broadcast_to(jnp.arange(batch)[:, None], (batch, num_points))
    channels = []
    for u, v, d in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
        xi = jnp.clip((coords[..., u] * (resolution - 1)).astype(jnp.int32), 0, resolution - 1)
        yi = jnp.clip((coords[..., v] * (resolution - 1)).astype(jnp.int32), 0, resolution - 1)
        depth = 1.0 - coords[..., d]  # nearer to the camera = brighter
        img = jnp.zeros((batch, resolution, resolution), pts.dtype)
        channels.append(img.at[bidx, yi, xi].max(depth))
    return jnp.stack(channels, axis=-1)


def clip_group_targets(tower: CLIPVisionTower, variables, pts, centers):
    """Per-group feature targets from the frozen CLIP tower.

    Renders the full cloud, extracts (B, grid^2, D) patch tokens and assigns
    each group the token of the patch its center falls into (first view's
    image plane). Returns (B, G, output_dim), stop-gradiented.
    """
    grid = tower.grid
    images = render_depth_views(pts, tower.input_resolution)
    tokens = tower.apply(variables, images, method=tower.features)
    cxy = jnp.clip((centers[..., :2] + 1.0) * 0.5, 0.0, 1.0 - 1e-6)
    xi = (cxy[..., 0] * grid).astype(jnp.int32)
    yi = (cxy[..., 1] * grid).astype(jnp.int32)
    patch = yi * grid + xi  # (B, G)
    targets = jnp.take_along_axis(tokens, patch[..., None], axis=1)
    return jax.lax.stop_gradient(targets)
