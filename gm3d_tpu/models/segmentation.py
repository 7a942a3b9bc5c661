"""ShapeNetPart segmentation model.

The reference's segmentation transformer lives OUTSIDE its repo (imported via
``importlib.import_module("pt")`` from upstream Point-MAE's ``segmentation/``
folder, ``main_finetune_segmentation.py:298-305`` — see SURVEY.md §2.1); this
module rebuilds the capability from the public Point-MAE segmentation design:
pretrained 12-block encoder with multi-depth feature taps, inverse-distance
feature propagation from group centers to all points, and a per-point head
over 50 part labels conditioned on the 16-way object class.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import Block, Dtype, PatchEncoder, PosEmbedMLP, TorchBatchNorm, _dpr
from gm3d_tpu.models.m2ae import M2AEEncoder
from gm3d_tpu.ops.group import group_points
from gm3d_tpu.ops.knn import knn_indices


def propagate_features(
    points: jax.Array, centers: jax.Array, center_feats: jax.Array, k: int = 3
) -> jax.Array:
    """PointNet++ feature propagation: inverse-distance-weighted interpolation
    of center features onto every point. (B,N,3),(B,G,3),(B,G,C) -> (B,N,C)."""
    dist, idx = knn_indices(centers, points, k, return_dist=True)  # (B, N, k)
    w = 1.0 / jnp.maximum(dist, 1e-10)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    batch, num_points, _ = idx.shape
    gathered = jnp.take_along_axis(
        center_feats, idx.reshape(batch, -1, 1), axis=1
    ).reshape(batch, num_points, k, -1)
    return jnp.sum(gathered * w[..., None], axis=2)


class PointMAESeg(nn.Module):
    """Part-segmentation model (registry name ``PointTransformerSeg``)."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    group_size: int = 32
    num_group: int = 128
    encoder_dims: int = 384
    drop_path_rate: float = 0.1
    num_classes: int = 16  # object categories
    num_parts: int = 50  # part labels
    feature_blocks: Sequence[int] = (3, 7, 11)  # encoder taps
    dropout_rate: float = 0.5  # head dropout; exposed for deterministic harnesses
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = PatchEncoder(self.encoder_dims, dtype=self.dtype)
        self.pos_embed = PosEmbedMLP(self.trans_dim, dtype=self.dtype)
        rates = _dpr(self.drop_path_rate, self.depth)
        self.blocks = [
            Block(self.trans_dim, self.num_heads, drop_path_rate=rates[i],
                  dtype=self.dtype, name=f"block{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        tap_dim = self.trans_dim * len(self.feature_blocks)
        self.label_embed = nn.Dense(64, dtype=self.dtype)
        self.prop_proj = nn.Dense(512, dtype=self.dtype)
        self.head_fc1 = nn.Dense(512, dtype=self.dtype)
        self.head_bn1 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_fc2 = nn.Dense(256, dtype=self.dtype)
        self.head_bn2 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_out = nn.Dense(self.num_parts, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        del tap_dim

    def __call__(self, pts, cls_label, deterministic: bool = True):
        """pts: (B, N, 3); cls_label: (B,) int object category.
        Returns per-point part logits (B, N, num_parts)."""
        grouped = group_points(pts, self.num_group, self.group_size)
        tokens = self.encoder(grouped.neighborhood, deterministic)
        pos = self.pos_embed(grouped.center)
        taps = []
        x = tokens
        for i, blk in enumerate(self.blocks):
            x = blk(x + pos, deterministic)
            if i in self.feature_blocks:
                taps.append(x)
        center_feats = jnp.concatenate(taps, axis=-1)  # (B, G, 3*D)

        global_feat = jnp.concatenate(
            [jnp.max(center_feats, axis=1), jnp.mean(center_feats, axis=1)], axis=-1
        )  # (B, 6*D)
        propagated = propagate_features(pts, grouped.center, center_feats)  # (B, N, 3*D)
        propagated = self.prop_proj(propagated)

        cls_onehot = jax.nn.one_hot(cls_label, self.num_classes, dtype=self.dtype)
        cls_emb = self.label_embed(cls_onehot)  # (B, 64)

        num_points = pts.shape[1]
        per_point = jnp.concatenate(
            [
                propagated,
                jnp.broadcast_to(global_feat[:, None], (pts.shape[0], num_points, global_feat.shape[-1])),
                jnp.broadcast_to(cls_emb[:, None], (pts.shape[0], num_points, cls_emb.shape[-1])),
                pts.astype(self.dtype),
            ],
            axis=-1,
        )
        h = self.head_fc1(per_point)
        h = self.head_bn1(h, use_running_average=deterministic)
        h = nn.relu(h)
        h = self.dropout(h, deterministic=deterministic)
        h = self.head_fc2(h)
        h = self.head_bn2(h, use_running_average=deterministic)
        h = nn.relu(h)
        return self.head_out(h)


class PointM2AESeg(nn.Module):
    """Part segmentation on the Point-M2AE hierarchical encoder (registry
    name ``Point_M2AE_SEG``).

    The reference publishes Point-M2AE+GM3D ShapeNetPart numbers
    (``README.md:79``, mIoU_C 84.91 / mIoU_I 86.52) but — like its seg model
    for the Point-MAE family — ships neither config nor code for it
    (``Point-M2AE_SA3D/`` holds only classifier configs and logs). Rebuilt
    from the public Point-M2AE segmentation protocol: the unmasked 3-scale
    encoder, per-scale inverse-distance feature propagation back onto every
    point (PointNet++ FP), multi-scale pooled global features, and the same
    class-conditioned per-point head as :class:`PointMAESeg`.

    Same ``(pts, cls_label)`` signature / ``num_parts`` contract as
    :class:`PointMAESeg`, so the seg engine, evaluate probe, export, and
    serving paths all apply unchanged. The pretrain checkpoint's ``encoder``
    subtree lines up leaf-for-leaf (both models name it ``encoder``), so
    ``ckpt.transfer.overlay_pretrained`` needs no surgery.
    """

    num_groups: Sequence[int] = (512, 256, 64)
    group_sizes: Sequence[int] = (16, 8, 8)
    encoder_depths: Sequence[int] = (5, 5, 5)
    encoder_dims: Sequence[int] = (96, 192, 384)
    local_radius: Sequence[float] = (0.32, 0.64, 1.28)
    num_heads: int = 6
    drop_path_rate: float = 0.1
    num_classes: int = 16  # object categories
    num_parts: int = 50  # part labels
    dropout_rate: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = M2AEEncoder(
            self.num_groups,
            self.group_sizes,
            self.encoder_depths,
            self.encoder_dims,
            self.local_radius,
            self.num_heads,
            self.drop_path_rate,
            dtype=self.dtype,
        )
        # one norm per scale before pooling/propagation (the classifier head
        # does the same; models/m2ae.py:369-374)
        self.scale_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{s}")
            for s in range(len(self.num_groups))
        ]
        self.label_embed = nn.Dense(64, dtype=self.dtype)
        self.prop_proj = nn.Dense(512, dtype=self.dtype)
        self.head_fc1 = nn.Dense(512, dtype=self.dtype)
        self.head_bn1 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_fc2 = nn.Dense(256, dtype=self.dtype)
        self.head_bn2 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_out = nn.Dense(self.num_parts, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, pts, cls_label, deterministic: bool = True):
        """pts: (B, N, 3); cls_label: (B,) int object category.
        Returns per-point part logits (B, N, num_parts)."""
        tokens_all, centers, _ = self.encoder(pts, None, deterministic)

        # per-scale FP onto every point + multi-scale global pooling
        propagated, pooled = [], []
        for s, tokens in enumerate(tokens_all):
            x = self.scale_norms[s](tokens)
            propagated.append(propagate_features(pts, centers[s], x))
            pooled.extend([jnp.max(x, axis=1), jnp.mean(x, axis=1)])
        per_point = self.prop_proj(jnp.concatenate(propagated, axis=-1))
        global_feat = jnp.concatenate(pooled, axis=-1)

        cls_onehot = jax.nn.one_hot(cls_label, self.num_classes, dtype=self.dtype)
        cls_emb = self.label_embed(cls_onehot)  # (B, 64)

        batch, num_points = pts.shape[0], pts.shape[1]
        h = jnp.concatenate(
            [
                per_point,
                jnp.broadcast_to(global_feat[:, None], (batch, num_points, global_feat.shape[-1])),
                jnp.broadcast_to(cls_emb[:, None], (batch, num_points, cls_emb.shape[-1])),
                pts.astype(self.dtype),
            ],
            axis=-1,
        )
        h = self.head_fc1(h)
        h = self.head_bn1(h, use_running_average=deterministic)
        h = nn.relu(h)
        h = self.dropout(h, deterministic=deterministic)
        h = self.head_fc2(h)
        h = self.head_bn2(h, use_running_average=deterministic)
        h = nn.relu(h)
        return self.head_out(h)
