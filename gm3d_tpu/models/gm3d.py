"""GM3D student: masked autoencoder with dual decoders + per-group loss predictor.

TPU-native re-design of the active ``MaskedAutoencoderViT``
(``models_mae_learn_loss_Classifier_SVM_feature_besed.py:849-1151`` — feature
mode, the default ``--mode feature``; and the ``_Classifier_SVM.py`` twin for
``--mode usual``). Reference behaviours preserved:

  - 12-layer MaskTransformer encoder over visible groups;
  - reconstruction decoder (depth 4) and loss-prediction decoder (depth 12 in
    feature mode — "MODIFIED_2", ``:890-898`` — or 4 in usual mode), each fed
    ``[x_vis, mask_tokens]`` with per-group-center pos embeds, norming and
    returning the FULL sequence (``:1287-1293``);
  - separate learnable mask tokens for the two decoders (``:902-903``),
    optionally shared (``--shared_learnable_tokens``);
  - heads: feature head Conv1d 384->1024(BN,LeakyReLU)->384 (``:912-918``),
    coordinate head Conv1d 384->3*group_size (``:920-927``);
  - ``loss_pred`` = feature-head output meaned over channels (``:1053``);
  - ``pix_pred`` = decoder features (feature mode, ``:1049``) or rebuilt
    coordinates (usual mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import Dtype, PosEmbedMLP, TorchBatchNorm, TransformerDecoder
from gm3d_tpu.models.pointmae import MaskTransformer, mask_split_indices, take_groups
from gm3d_tpu.ops.group import group_points


class GM3DStudent(nn.Module):
    """GM3D student MAE (factory name ``mae_vit_base_patch16_dec512d8b`` in the
    reference CLI — hyperparameters were hard-coded in the class,
    ``...feature_besed.py:864-874``, and shadow the YAML; encoded here as
    config defaults)."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    group_size: int = 32
    num_group: int = 64
    drop_path_rate: float = 0.1
    encoder_dims: int = 384
    mode: str = "feature"  # 'feature' | 'usual'
    # The OLDER student variant (``models_mae_learn_loss.py:30-846``, the
    # model ``main_pretrain_multi_gpu.py``/``engine_pretrain.py`` drive) has
    # NO separate decoder pos-embed MLP: the encoder's ``pos_embed`` is
    # reused for the decoder positions (``:655-656`` uses ``self.pos_embed``
    # on both vis and mask centers), so decoder gradients flow into the
    # shared MLP. Together with ``shared_learnable_tokens`` (that variant
    # also has no ``mask_token_loss_pred``, ``:657`` feeds the loss-pred
    # decoder ``x_full.clone()``) and ``mode='usual'`` this reproduces the
    # older variant exactly — trajectory-pinned in
    # ``tests/test_trajectory_parity.py::...[multi_gpu]``.
    shared_pos_embed: bool = False
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
        self.MAE_decoder = TransformerDecoder(
            self.trans_dim,
            self.decoder_depth,
            self.decoder_num_heads,
            self.drop_path_rate,
            dtype=self.dtype,
        )
        loss_pred_depth = self.depth if self.mode == "feature" else self.decoder_depth
        self.MAE_decoder_loss_pred = TransformerDecoder(
            self.trans_dim,
            loss_pred_depth,
            self.decoder_num_heads,
            self.drop_path_rate,
            dtype=self.dtype,
        )
        self.decoder_pos_embed = PosEmbedMLP(self.trans_dim, dtype=self.dtype)
        init = nn.initializers.zeros
        self.mask_token = self.param("mask_token", init, (1, 1, self.trans_dim))
        self.mask_token_loss_pred = self.param(
            "mask_token_loss_pred", init, (1, 1, self.trans_dim)
        )
        # feature head: Conv1d(384->1024) BN LeakyReLU(0.2) Conv1d(1024->384)
        self.head_fc1 = nn.Dense(1024, dtype=self.dtype)
        self.head_bn = TorchBatchNorm(momentum=0.9, dtype=self.dtype)
        self.head_fc2 = nn.Dense(self.trans_dim, dtype=self.dtype)
        # coordinate head: Conv1d(384 -> 3*group_size)
        self.coord_head = nn.Dense(3 * self.group_size, dtype=self.dtype)

    def _feature_head(self, x, deterministic: bool):
        h = self.head_fc1(x)
        h = self.head_bn(h, use_running_average=deterministic)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return self.head_fc2(h)

    def group(self, pts):
        return group_points(pts, self.num_group, self.group_size)

    def encode_features(self, pts, deterministic: bool = True):
        """noaug encoder-only forward over all groups (SVM features,
        ``...feature_besed.py:1017-1018``)."""
        batch = pts.shape[0]
        mask = jnp.zeros((batch, self.num_group), bool)
        grouped = self.group(pts)
        return self.MAE_encoder(grouped.neighborhood, grouped.center, mask, 0, deterministic)

    def __call__(
        self,
        pts,
        mask,
        num_mask: int,
        shared_learnable_tokens: bool = False,
        deterministic: bool = True,
        grouped=None,
        detach_loss_pred_branch: bool = False,
        tokens=None,
        loss_pred_only: bool = False,
    ):
        """Full student forward (``...feature_besed.py:1007-1059``).

        With ``num_mask == 0`` this is the EMA's unmasked pass: no mask tokens
        are appended, and ``loss_pred`` covers all groups in original order —
        exactly what ``generate_mask`` consumes.
        ``grouped`` lets the train step share ONE FPS/KNN grouping across the
        EMA, student and teacher passes (they all see the same cloud).
        ``loss_pred_only=True`` skips the reconstruction decoder and the
        coordinate head entirely (``pix_pred``/``rebuild_points`` = None): the
        EMA's unmasked pass only feeds ``generate_mask`` with ``loss_pred``
        (``engine_pretrain_Classifier_SVM.py:108-116``), so their compute is
        dead there — skipped explicitly rather than trusting XLA DCE.
        ``detach_loss_pred_branch`` stop-gradients the encoder features before
        the loss-prediction decoder — the separated-optimizer semantics
        (``--shared_opt False``): the reference's recon optimizer steps before
        ``loss_learn.backward()`` and both are zeroed afterwards, so the
        learning loss never updates the encoder
        (``engine_pretrain_Classifier_SVM.py:546-574``,
        ``main_pretrain.py:414-440``).
        Returns a dict mirroring the reference ``out`` keys.
        """
        batch = pts.shape[0]
        if grouped is None:
            grouped = self.group(pts)
        x_vis = self.MAE_encoder(
            grouped.neighborhood, grouped.center, mask, num_mask, deterministic,
            tokens=tokens,
        )

        vis_idx, mask_idx = mask_split_indices(mask, num_mask)
        x_vis_lp = jax.lax.stop_gradient(x_vis) if detach_loss_pred_branch else x_vis
        dec_pos = (self.MAE_encoder.pos_embed if self.shared_pos_embed
                   else self.decoder_pos_embed)
        pos_vis = dec_pos(take_groups(grouped.center, vis_idx))
        if num_mask:
            pos_mask = dec_pos(take_groups(grouped.center, mask_idx))
            pos_full = jnp.concatenate([pos_vis, pos_mask], axis=1)
            mask_tok = jnp.broadcast_to(
                self.mask_token.astype(self.dtype), (batch, num_mask, self.trans_dim)
            )
            x_full = jnp.concatenate([x_vis, mask_tok], axis=1)
            if shared_learnable_tokens:
                x_loss = jnp.concatenate([x_vis_lp, mask_tok], axis=1)
            else:
                mask_tok_lp = jnp.broadcast_to(
                    self.mask_token_loss_pred.astype(self.dtype),
                    (batch, num_mask, self.trans_dim),
                )
                x_loss = jnp.concatenate([x_vis_lp, mask_tok_lp], axis=1)
        else:
            x_full = x_vis
            x_loss = x_vis_lp
            pos_full = pos_vis

        # reconstruction decoder: full normed sequence; pix_pred = features
        if loss_pred_only:
            x_rec = rebuild_points = pix_pred = None
        else:
            x_rec = self.MAE_decoder(
                x_full, pos_full, return_tokens=0, deterministic=deterministic
            )
            rebuild_points = self.coord_head(x_rec)  # (B, L, 3*S)
            pix_pred = x_rec if self.mode == "feature" else rebuild_points

        # loss-prediction decoder + feature head, meaned over channels
        x_lp = self.MAE_decoder_loss_pred(
            x_loss, pos_full, return_tokens=0, deterministic=deterministic
        )
        loss_pred_f = self._feature_head(x_lp, deterministic)
        loss_pred = jnp.mean(loss_pred_f.astype(jnp.float32), axis=-1)  # (B, L)

        return {
            "pix_pred": pix_pred,
            "rebuild_points": rebuild_points,
            "mask": mask,
            "mask_num": num_mask,
            "features": x_vis,
            "loss_pred": loss_pred,
            "neighborhood": grouped.neighborhood,
            "neighborhood_org": grouped.neighborhood_org,
            "center": grouped.center,
            "vis_idx": vis_idx,
            "mask_idx": mask_idx,
        }
