"""Point-MAE: masked-autoencoder pretraining backbone (teacher + legacy model).

TPU-native re-design of ``models/Point_MAE.py:221-441`` in
/root/reference/Point-MAE_SA3D. Differences from the reference that are
deliberate TPU-first choices (behaviour preserved):

  - mask GENERATION lives outside the model (gm3d_tpu.masking) so the whole
    train step stays inside one jit without host round-trips; the model
    always receives a boolean mask plus the static masked count;
  - visible/masked token extraction uses a stable argsort of the mask, which
    reproduces torch boolean indexing's original-order semantics with fully
    static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import (
    Dtype,
    PatchEncoder,
    PosEmbedMLP,
    TransformerDecoder,
    TransformerEncoder,
)
from gm3d_tpu.ops.group import Grouped, group_points


def mask_split_indices(mask: jax.Array, num_mask: int) -> Tuple[jax.Array, jax.Array]:
    """Visible / masked group indices, each in original group order.

    mask: (B, G) bool with exactly ``num_mask`` True per row.
    Reproduces ``tokens[~mask].reshape(B, -1, C)`` semantics statically.
    """
    num_groups = mask.shape[-1]
    order = jnp.argsort(mask.astype(jnp.int32), axis=-1, stable=True)
    return order[:, : num_groups - num_mask], order[:, num_groups - num_mask :]


def take_groups(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along the group axis: (B, G, ...) x (B, K) -> (B, K, ...)."""
    expand = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, expand, axis=1)


class MaskTransformer(nn.Module):
    """Patch embed + ViT encoder over VISIBLE groups only
    (``models/Point_MAE.py:221-343``; GM3D twin ``...feature_besed.py:1329-1371``)."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    drop_path_rate: float = 0.1
    encoder_dims: int = 384
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = PatchEncoder(self.encoder_dims, dtype=self.dtype)
        self.pos_embed = PosEmbedMLP(self.trans_dim, dtype=self.dtype)
        self.blocks = TransformerEncoder(
            self.trans_dim, self.depth, self.num_heads, self.drop_path_rate, dtype=self.dtype
        )
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

    def __call__(self, neighborhood, center, mask, num_mask: int, deterministic: bool = True,
                 tokens=None):
        """``tokens`` (B, G, C) optionally bypasses the patch embed — the
        train step feeds the fused Pallas patch-embed output here for the
        grad-free EMA / teacher passes (``ops/patch_embed.py``)."""
        if tokens is None:
            tokens = self.encoder(neighborhood, deterministic)  # (B, G, C)
        if num_mask:
            vis_idx, _ = mask_split_indices(mask, num_mask)
            tokens = take_groups(tokens, vis_idx)
            center = take_groups(center, vis_idx)
        pos = self.pos_embed(center)
        x_vis = self.blocks(tokens, pos, deterministic)
        return self.norm(x_vis)


class PointMAE(nn.Module):
    """Point-MAE pretrain model (registry name ``Point_MAE``).

    Used both as the legacy pretrain path (scalar Chamfer loss, SURVEY §3.4)
    and — with ``mask`` all-False — as the frozen complete-to-partial
    distillation teacher (``config_m.yaml`` mask_ratio 0).
    """

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    group_size: int = 32
    num_group: int = 64
    drop_path_rate: float = 0.1
    encoder_dims: int = 384
    dtype: Dtype = jnp.float32

    def setup(self):
        self.MAE_encoder = MaskTransformer(
            self.trans_dim,
            self.depth,
            self.num_heads,
            self.drop_path_rate,
            self.encoder_dims,
            dtype=self.dtype,
        )
        self.decoder_pos_embed = PosEmbedMLP(self.trans_dim, dtype=self.dtype)
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02), (1, 1, self.trans_dim)
        )
        self.MAE_decoder = TransformerDecoder(
            self.trans_dim,
            self.decoder_depth,
            self.decoder_num_heads,
            self.drop_path_rate,
            dtype=self.dtype,
        )
        # prediction head: Conv1d(trans_dim -> 3*group_size, k=1) == Dense
        self.increase_dim = nn.Dense(3 * self.group_size, dtype=self.dtype)

    def group(self, pts) -> Grouped:
        return group_points(pts, self.num_group, self.group_size)

    def encode(self, pts, mask, num_mask: int, deterministic: bool = True):
        grouped = self.group(pts)
        x_vis = self.MAE_encoder(
            grouped.neighborhood, grouped.center, mask, num_mask, deterministic
        )
        return x_vis, grouped

    def encode_features(self, pts, deterministic: bool = True, grouped=None, tokens=None):
        """noaug encoder-only forward over all groups (SVM feature path,
        ``main_pretrain.py:656``)."""
        batch = pts.shape[0]
        mask = jnp.zeros((batch, self.num_group), bool)
        if grouped is None:
            grouped = self.group(pts)
        return self.MAE_encoder(
            grouped.neighborhood, grouped.center, mask, 0, deterministic, tokens=tokens
        )

    def __call__(self, pts, mask, num_mask: int, deterministic: bool = True):
        """Masked reconstruction forward (``models/Point_MAE.py:400-441``).

        Returns dict with rebuilt and ground-truth masked patches; the
        Chamfer loss is applied by the train step (cdl1/cdl2 per config).
        """
        x_vis, grouped = self.encode(pts, mask, num_mask, deterministic)
        batch = pts.shape[0]
        vis_idx, mask_idx = mask_split_indices(mask, num_mask)
        pos_vis = self.decoder_pos_embed(take_groups(grouped.center, vis_idx))
        if num_mask:
            pos_mask = self.decoder_pos_embed(take_groups(grouped.center, mask_idx))
            mask_tokens = jnp.broadcast_to(
                self.mask_token.astype(self.dtype), (batch, num_mask, self.trans_dim)
            )
            x_full = jnp.concatenate([x_vis, mask_tokens], axis=1)
            pos_full = jnp.concatenate([pos_vis, pos_mask], axis=1)
            x_rec = self.MAE_decoder(
                x_full, pos_full, return_tokens=num_mask, deterministic=deterministic
            )
            rebuild = self.increase_dim(x_rec).reshape(batch, num_mask, self.group_size, 3)
            gt = take_groups(grouped.neighborhood, mask_idx)
        else:
            # mask_ratio = 0 (teacher, config_m.yaml): decode and rebuild ALL
            # groups — the complete-to-partial replay path uses every token.
            x_rec = self.MAE_decoder(
                x_vis, pos_vis, return_tokens=0, deterministic=deterministic
            )
            rebuild = self.increase_dim(x_rec).reshape(
                batch, self.num_group, self.group_size, 3
            )
            gt = grouped.neighborhood
        return {
            "rebuild": rebuild,
            "gt": gt,
            "center": grouped.center,
            "mask_idx": mask_idx,
            "vis_idx": vis_idx,
            "x_vis": x_vis,
        }

    def decode_replay(self, tokens, centers_sel, deterministic: bool = True):
        """Run the decoder + head on an arbitrary token sequence.

        Complete-to-partial distillation replay
        (``engine_pretrain_Classifier_SVM.py:669-687``): used with (a) the
        teacher's own full-cloud features and (b) the student's predicted
        features, each positioned at their group centers. Returns per-token
        rebuilt patches (B, T, S, 3).
        """
        pos = self.decoder_pos_embed(centers_sel)
        x_rec = self.MAE_decoder(tokens, pos, return_tokens=0, deterministic=deterministic)
        batch, seq = x_rec.shape[0], x_rec.shape[1]
        return self.increase_dim(x_rec).reshape(batch, seq, self.group_size, 3)
