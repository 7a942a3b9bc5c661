"""Point-M2AE: hierarchical multi-scale masked autoencoder.

The reference ships NO code for this family — only config specs
(``Point-M2AE_SA3D/cfgs/config_Point_M2AE.yaml:57-104``) and result logs; the
model is reconstructed from that spec + the public Point-M2AE paper
(Zhang et al., NeurIPS 2022). Spec honoured:

  - 3-scale encoder: num_groups [512, 256, 64], group_sizes [16, 8, 8],
    encoder_depths [5, 5, 5], encoder_dims [96, 192, 384],
    local_radius [0.32, 0.64, 1.28], mask_ratio 0.8;
  - 2-stage decoder: decoder_dims [384, 192], decoder_depths [1, 1],
    decoder_up_blocks [1, 1];
  - masks are generated at the COARSEST scale and back-projected to finer
    scales (a fine token is visible iff its nearest coarse center is
    visible), so visible regions are consistent across the hierarchy.

TPU-first re-design: visible counts after back-projection vary per sample,
so instead of the reference-family's ragged boolean indexing we keep the FULL
static-shape token set at every scale and enforce masking through attention:
visible tokens may only attend to visible tokens within the local radius;
masked-token features are replaced by a learned placeholder at each scale
input and excluded from cross-scale pooling. This keeps every shape static
for XLA while leaking no masked-region information into visible features.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import Dtype, PatchEncoder, PosEmbedMLP, TorchBatchNorm, TransformerEncoder
from gm3d_tpu.ops.fps import fps_gather, fps_indices
from gm3d_tpu.ops.knn import knn_indices


def _local_attn_mask(centers: jax.Array, radius: float) -> jax.Array:
    """(B, G, 3) -> (B, G, G) bool: True where ||ci - cj|| < radius."""
    d2 = jnp.sum((centers[:, :, None, :] - centers[:, None, :, :]) ** 2, axis=-1)
    return d2 < radius * radius


def build_hierarchy(pts, num_groups, group_sizes):
    """FPS center pyramid + per-scale KNN membership (geometry only — no
    params, deterministic).

    Returns (centers, member_idx), coarse order: centers[s] (B, G_s, 3);
    member_idx[s] (B, G_s, k_s) indices into the previous level (raw points
    for s=0).

    Exposed as a free function so the train step can compute the hierarchy
    ONCE per step and share it across the EMA forward, mask propagation and
    the student forward — the round-5 profile measured the FPS/KNN pyramid
    at ~54 ms/step (bs 128 x 2048), previously executed ~3x per step
    (docs/BENCHMARKS.md round-5 M2AE section).
    """
    centers, member_idx = [], []
    prev = pts
    for g, k in zip(num_groups, group_sizes):
        c = fps_gather(prev, fps_indices(prev, g))
        centers.append(c)
        member_idx.append(knn_indices(prev, c, k))
        prev = c
    return centers, member_idx


class TokenMerge(nn.Module):
    """Cross-scale token pooling: each new center aggregates its k nearest
    previous-scale tokens (masked members excluded) and projects to the new
    width."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_tokens, member_idx, member_valid):
        # prev_tokens: (B, Gp, C); member_idx: (B, G, k); member_valid: (B, G, k)
        batch, num_groups, k = member_idx.shape
        feats = jnp.take_along_axis(
            prev_tokens, member_idx.reshape(batch, -1, 1), axis=1
        ).reshape(batch, num_groups, k, -1)
        neg = jnp.asarray(-1e9, feats.dtype)
        pooled_max = jnp.max(jnp.where(member_valid[..., None], feats, neg), axis=2)
        # groups with zero valid members (fully masked) -> zeros
        any_valid = jnp.any(member_valid, axis=-1, keepdims=True)
        pooled_max = jnp.where(any_valid, pooled_max, 0.0)
        denom = jnp.maximum(jnp.sum(member_valid, axis=-1, keepdims=True), 1)
        pooled_mean = jnp.sum(jnp.where(member_valid[..., None], feats, 0.0), axis=2) / denom
        x = jnp.concatenate([pooled_max, pooled_mean], axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(x)


class M2AEEncoder(nn.Module):
    """Hierarchical encoder shared by pretrain and fine-tune heads."""

    num_groups: Sequence[int] = (512, 256, 64)
    group_sizes: Sequence[int] = (16, 8, 8)
    encoder_depths: Sequence[int] = (5, 5, 5)
    encoder_dims: Sequence[int] = (96, 192, 384)
    local_radius: Sequence[float] = (0.32, 0.64, 1.28)
    num_heads: int = 6
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        num_scales = len(self.num_groups)
        self.patch_embed = PatchEncoder(self.encoder_dims[0], dtype=self.dtype)
        self.merges = [
            TokenMerge(self.encoder_dims[s], dtype=self.dtype, name=f"merge{s}")
            for s in range(1, num_scales)
        ]
        self.pos_embeds = [
            PosEmbedMLP(self.encoder_dims[s], dtype=self.dtype, name=f"pos{s}")
            for s in range(num_scales)
        ]
        self.stages = [
            TransformerEncoder(
                self.encoder_dims[s],
                self.encoder_depths[s],
                self.num_heads,
                self.drop_path_rate,
                dtype=self.dtype,
                name=f"stage{s}",
            )
            for s in range(num_scales)
        ]
        self.mask_feats = [
            self.param(f"mask_feat{s}", nn.initializers.zeros, (1, 1, self.encoder_dims[s]))
            for s in range(num_scales)
        ]

    def hierarchy(self, pts):
        """See :func:`build_hierarchy` (kept as a method for callers bound to
        the module API)."""
        return build_hierarchy(pts, self.num_groups, self.group_sizes)

    def __call__(self, pts, vis_masks=None, deterministic: bool = True,
                 hierarchy=None):
        """Encode all scales. ``vis_masks``: list of (B, G_s) bool (True =
        visible) or None for the unmasked (fine-tune / feature) path.
        ``hierarchy``: optional precomputed ``build_hierarchy(pts, ...)``
        result (numerically identical — FPS/KNN are deterministic — but
        avoids re-running the serial FPS pyramid).

        Returns (tokens_per_scale, centers, member_idx).
        """
        centers, member_idx = hierarchy if hierarchy is not None else self.hierarchy(pts)
        num_scales = len(self.num_groups)
        tokens_all = []
        tokens = None
        for s in range(num_scales):
            if s == 0:
                neigh = jnp.take_along_axis(
                    pts, member_idx[0].reshape(pts.shape[0], -1, 1), axis=1
                ).reshape(pts.shape[0], self.num_groups[0], self.group_sizes[0], 3)
                neigh = neigh - centers[0][:, :, None, :]
                tokens = self.patch_embed(neigh, deterministic)
            else:
                if vis_masks is not None:
                    member_valid = jnp.take_along_axis(
                        vis_masks[s - 1], member_idx[s].reshape(pts.shape[0], -1), axis=1
                    ).reshape(member_idx[s].shape)
                else:
                    member_valid = jnp.ones(member_idx[s].shape, bool)
                tokens = self.merges[s - 1](tokens, member_idx[s], member_valid)

            pos = self.pos_embeds[s](centers[s])
            local = _local_attn_mask(centers[s], self.local_radius[s])
            if vis_masks is not None:
                vis = vis_masks[s]
                tokens = jnp.where(
                    vis[..., None], tokens, self.mask_feats[s].astype(tokens.dtype)
                )
                allow = local & vis[:, None, :] & vis[:, :, None]
                eye = jnp.eye(tokens.shape[1], dtype=bool)[None]
                attn_mask = allow | eye
            else:
                attn_mask = local
            tokens = self.stages[s](tokens, pos, deterministic, attn_mask)
            tokens_all.append(tokens)
        return tokens_all, centers, member_idx


def nearest_coarse_maps(centers: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
    """For each finer scale s, the index of the nearest COARSEST-scale center
    of every scale-s center: (B, G_s) int32, one entry per non-last scale.
    Shared by mask back-projection, the decoder's coarse->mid upsample and
    the fine->coarse loss aggregation (computed once per forward)."""
    coarse_centers = centers[-1]
    return tuple(
        knn_indices(coarse_centers, centers[s], 1)[..., 0]
        for s in range(len(centers) - 1)
    )


def propagate_masks(
    coarse_vis: jax.Array, centers: Sequence[jax.Array], nearest=None
) -> Tuple[jax.Array, ...]:
    """Back-project a coarsest-scale visibility mask to all finer scales.

    coarse_vis: (B, G_last) bool, True = visible. A finer token is visible
    iff its nearest coarsest-scale center is visible. ``nearest``: optional
    precomputed :func:`nearest_coarse_maps` result.
    """
    if nearest is None:
        nearest = nearest_coarse_maps(centers)
    vis_masks = [None] * len(centers)
    vis_masks[-1] = coarse_vis
    for s in range(len(centers) - 1):
        vis_masks[s] = jnp.take_along_axis(coarse_vis, nearest[s], axis=1)
    return tuple(vis_masks)


class PointM2AE(nn.Module):
    """Point-M2AE pretrain model (registry name ``Point_M2AE``)."""

    num_groups: Sequence[int] = (512, 256, 64)
    group_sizes: Sequence[int] = (16, 8, 8)
    encoder_depths: Sequence[int] = (5, 5, 5)
    encoder_dims: Sequence[int] = (96, 192, 384)
    local_radius: Sequence[float] = (0.32, 0.64, 1.28)
    decoder_depths: Sequence[int] = (1, 1)
    decoder_dims: Sequence[int] = (384, 192)
    decoder_up_blocks: Sequence[int] = (1, 1)
    mask_ratio: float = 0.8
    num_heads: int = 6
    drop_path_rate: float = 0.1
    # SVM/probe feature protocol: "all" pools every scale (mean+max per scale,
    # concatenated — consistent with the fine-tune heads, which pool every
    # scale), "last" pools only the coarsest tokens. Configurable because the
    # reference ships no M2AE code to pin the published 93.15 SVM protocol
    # against (docs/DESIGN.md §8).
    svm_scales: str = "all"
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
        # decoder stage 0 runs at the coarsest scale, stage i upsamples to
        # scale -(i+2); skip projections fuse the encoder features there.
        self.dec_pos = [
            PosEmbedMLP(self.decoder_dims[i], dtype=self.dtype, name=f"dec_pos{i}")
            for i in range(len(self.decoder_dims))
        ]
        self.dec_stages = [
            TransformerEncoder(
                self.decoder_dims[i],
                self.decoder_depths[i],
                self.num_heads,
                self.drop_path_rate,
                dtype=self.dtype,
                name=f"dec_stage{i}",
            )
            for i in range(len(self.decoder_dims))
        ]
        self.dec_proj = [
            nn.Dense(self.decoder_dims[i], dtype=self.dtype, name=f"dec_proj{i}")
            for i in range(len(self.decoder_dims))
        ]
        # decoder_up_blocks[i] transformer blocks run right after the i-th
        # upsample (config ``decoder_up_blocks`` [1, 1],
        # ``config_Point_M2AE.yaml:57-104``): up_stage i refines tokens at the
        # newly-entered scale before that scale's main dec_stage; the LAST
        # entry refines at the finest scale just before the reconstruction
        # head (which previously had no blocks at all).
        up_dims = list(self.decoder_dims[1:]) + [self.decoder_dims[-1]]
        self.dec_up_stages = [
            TransformerEncoder(
                up_dims[i],
                self.decoder_up_blocks[i],
                self.num_heads,
                self.drop_path_rate,
                dtype=self.dtype,
                name=f"dec_up{i}",
            )
            for i in range(len(self.decoder_up_blocks))
        ]
        self.mask_token = self.param(
            "mask_token", nn.initializers.truncated_normal(0.02), (1, 1, self.decoder_dims[0])
        )
        # reconstruct finest-scale patches: group_sizes[0] points per token
        self.rec_head = nn.Dense(3 * self.group_sizes[0], dtype=self.dtype)
        # GM3D loss-prediction head at the coarsest scale (mirrors the GM3D
        # student's feature head, ...feature_besed.py:912-918): enables
        # geometric-complexity mask selection for the M2AE family.
        self.lp_fc1 = nn.Dense(1024, dtype=self.dtype)
        self.lp_bn = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.lp_fc2 = nn.Dense(self.decoder_dims[0], dtype=self.dtype)

    def encode_features(self, pts, deterministic: bool = True):
        """Unmasked coarsest-scale token sequence (B, G_last, C_last) — the
        token-level feature surface (supervised Classifier probe, serving
        featurizer artifacts). The SVM probe uses :meth:`pooled_features`."""
        tokens_all, _, _ = self.encoder(pts, None, deterministic)
        return tokens_all[-1]

    def pooled_features(self, pts, deterministic: bool = True):
        """Family-specific SVM-probe pooling (``svm_scales``): per-scale
        ``mean(1) + max(1)`` (the reference pooling, ``main_pretrain.py:713``)
        concatenated across all scales, or the coarsest scale only.

        Returns (B, sum_s C_s) for "all", (B, C_last) for "last".
        """
        tokens_all, _, _ = self.encoder(pts, None, deterministic)
        if self.svm_scales == "last":
            tokens_all = tokens_all[-1:]
        parts = [jnp.mean(t, axis=1) + jnp.max(t, axis=1) for t in tokens_all]
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, pts, coarse_vis, deterministic: bool = True,
                 hierarchy=None):
        """Masked hierarchical reconstruction.

        coarse_vis: (B, G_last) bool visibility at the coarsest scale (True =
        visible), generated outside (random or GM3D geometric selection).
        ``hierarchy``: optional precomputed :func:`build_hierarchy` result —
        the train step shares ONE hierarchy across the EMA and student
        passes (numerically identical; FPS/KNN are deterministic).

        Returns dict with per-finest-group rebuilt patches, ground truth and
        the finest-scale visibility (loss is Chamfer on masked fine groups).
        """
        if hierarchy is None:
            hierarchy = self.encoder.hierarchy(pts)
        centers = hierarchy[0]
        # nearest-coarsest maps, computed ONCE: mask back-projection, the
        # decoder's first upsample and the fine->coarse loss aggregation all
        # consume them
        nearest_coarse = nearest_coarse_maps(centers)
        vis_masks = propagate_masks(coarse_vis, centers, nearest_coarse)
        tokens_all, centers, member_idx = self.encoder(
            pts, vis_masks, deterministic, hierarchy=hierarchy)

        # ---- decoder stage 0: coarsest scale, mask tokens at masked slots
        x = self.dec_proj[0](tokens_all[-1])
        mask_tok = self.mask_token.astype(x.dtype)
        x = jnp.where(vis_masks[-1][..., None], x, mask_tok)
        pos = self.dec_pos[0](centers[-1])
        x = self.dec_stages[0](x, pos, deterministic)

        # ---- GM3D per-coarse-group loss prediction
        lp = self.lp_fc1(x)
        lp = self.lp_bn(lp, use_running_average=deterministic)
        lp = nn.leaky_relu(lp, negative_slope=0.2)
        lp = self.lp_fc2(lp)
        loss_pred = jnp.mean(lp.astype(jnp.float32), axis=-1)  # (B, G_last)

        # ---- upsample stages: coarse -> fine via nearest-coarse gather + skip
        scale = len(centers) - 1
        for i in range(1, len(self.decoder_dims)):
            scale -= 1
            if scale + 1 == len(centers) - 1:
                nearest = nearest_coarse[scale]
            else:
                nearest = knn_indices(centers[scale + 1], centers[scale], 1)[..., 0]
            up = jnp.take_along_axis(x, nearest[..., None], axis=1)
            skip = jnp.where(
                vis_masks[scale][..., None],
                tokens_all[scale],
                self.encoder.mask_feats[scale].astype(x.dtype),
            )
            x = self.dec_proj[i](jnp.concatenate([up, skip], axis=-1))
            pos = self.dec_pos[i](centers[scale])
            x = self.dec_up_stages[i - 1](x, pos, deterministic)
            x = self.dec_stages[i](x, pos, deterministic)

        # ---- final upsample to the finest scale and reconstruct patches
        while scale > 0:
            scale -= 1
            nearest = knn_indices(centers[scale + 1], centers[scale], 1)[..., 0]
            x = jnp.take_along_axis(x, nearest[..., None], axis=1)
        # last up-blocks refine at the finest scale before the rec head
        fine_pos = self.dec_pos[-1](centers[0])
        x = self.dec_up_stages[-1](x, fine_pos, deterministic)

        batch = pts.shape[0]
        rebuild = self.rec_head(x).reshape(batch, self.num_groups[0], self.group_sizes[0], 3)
        neigh = jnp.take_along_axis(
            pts, member_idx[0].reshape(batch, -1, 1), axis=1
        ).reshape(batch, self.num_groups[0], self.group_sizes[0], 3)
        gt = neigh - centers[0][:, :, None, :]
        # nearest coarsest center of each finest group (for aggregating the
        # fine reconstruction losses into the per-coarse-group loss matrix)
        fine_to_coarse = nearest_coarse[0] if nearest_coarse else jnp.broadcast_to(
            jnp.arange(self.num_groups[0])[None], (pts.shape[0], self.num_groups[0]))
        return {
            "rebuild": rebuild,
            "gt": gt,
            "fine_vis": vis_masks[0],
            "coarse_vis": coarse_vis,
            "centers": centers,
            "loss_pred": loss_pred,
            "fine_to_coarse": fine_to_coarse,
        }


class PointM2AEClassifier(nn.Module):
    """Fine-tune heads ``Point_M2AE_ModelNet40`` / ``Point_M2AE_ScanObjectNN``
    (specs ``finetune_modelnet_PointM2AE.yaml:60-100`` and
    ``config_finetune_scan_hardest_PointM2AE.yaml:58-95``): unmasked
    hierarchical encoder, multi-scale pooled features -> MLP head."""

    cls_dim: int = 40
    num_groups: Sequence[int] = (512, 256, 64)
    group_sizes: Sequence[int] = (16, 8, 8)
    encoder_depths: Sequence[int] = (5, 5, 5)
    encoder_dims: Sequence[int] = (96, 192, 384)
    local_radius: Sequence[float] = (0.32, 0.64, 1.28)
    num_heads: int = 6
    drop_path_rate: float = 0.1
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
        # one norm per scale: the head pools EVERY scale (public Point-M2AE
        # concatenates multi-scale mean+max features, not just the coarsest)
        self.scale_norms = [
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{s}")
            for s in range(len(self.num_groups))
        ]
        self.head_fc1 = nn.Dense(256, dtype=self.dtype)
        self.head_bn1 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_fc2 = nn.Dense(256, dtype=self.dtype)
        self.head_bn2 = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_out = nn.Dense(self.cls_dim, dtype=self.dtype)
        self.dropout = nn.Dropout(0.5)

    def __call__(self, pts, deterministic: bool = True):
        tokens_all, _, _ = self.encoder(pts, None, deterministic)
        parts = []
        for s, tokens in enumerate(tokens_all):
            x = self.scale_norms[s](tokens)
            parts.extend([jnp.mean(x, axis=1), jnp.max(x, axis=1)])
        pooled = jnp.concatenate(parts, axis=-1)
        h = self.head_fc1(pooled)
        h = self.head_bn1(h, use_running_average=deterministic)
        h = nn.relu(h)
        h = self.dropout(h, deterministic=deterministic)
        h = self.head_fc2(h)
        h = self.head_bn2(h, use_running_average=deterministic)
        h = nn.relu(h)
        h = self.dropout(h, deterministic=deterministic)
        return self.head_out(h)
