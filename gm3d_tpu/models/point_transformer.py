"""PointTransformer fine-tune classifier + pretrain-time Classifier probe.

Re-designs ``models/Point_MAE.py:444-579`` (registry name
``PointTransformer``) and the probe ``Classifier`` (``:585-629``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gm3d_tpu.models.blocks import Dtype, PatchEncoder, PosEmbedMLP, TorchBatchNorm, TransformerEncoder
from gm3d_tpu.ops.group import group_points


class ClsHead(nn.Module):
    """Linear-BN-ReLU-Dropout x2 -> logits (``models/Point_MAE.py:485-495``).

    ``dropout`` defaults to the reference's hardcoded 0.5; exposed so
    deterministic harnesses (trajectory parity) can zero it."""

    cls_dim: int
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(2):
            x = nn.Dense(256, dtype=self.dtype, name=f"fc{i + 1}")(x)
            x = TorchBatchNorm(
                use_running_average=deterministic, momentum=0.9, dtype=self.dtype, name=f"bn{i + 1}"
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.cls_dim, dtype=self.dtype, name="fc3")(x)


class PointTransformer(nn.Module):
    """Classification fine-tune model: FPS+KNN group -> patch embed -> cls
    token + 12-layer encoder -> concat[cls, max-pool] -> MLP head
    (``models/Point_MAE.py:559-579``)."""

    trans_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    cls_dim: int = 40
    group_size: int = 32
    num_group: int = 64
    encoder_dims: int = 384
    drop_path_rate: float = 0.1
    dropout: float = 0.5
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = PatchEncoder(self.encoder_dims, dtype=self.dtype)
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.trans_dim)
        )
        self.cls_pos = self.param(
            "cls_pos", nn.initializers.truncated_normal(0.02), (1, 1, self.trans_dim)
        )
        self.pos_embed = PosEmbedMLP(self.trans_dim, dtype=self.dtype)
        self.blocks = TransformerEncoder(
            self.trans_dim, self.depth, self.num_heads, self.drop_path_rate, dtype=self.dtype
        )
        self.norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.cls_head_finetune = ClsHead(self.cls_dim, dropout=self.dropout, dtype=self.dtype)

    def features(self, pts, deterministic: bool = True):
        """Token sequence [cls, groups...] after the encoder stack."""
        grouped = group_points(pts, self.num_group, self.group_size)
        tokens = self.encoder(grouped.neighborhood, deterministic)
        batch = tokens.shape[0]
        cls_tok = jnp.broadcast_to(
            self.cls_token.astype(self.dtype), (batch, 1, self.trans_dim)
        )
        cls_pos = jnp.broadcast_to(self.cls_pos.astype(self.dtype), (batch, 1, self.trans_dim))
        pos = jnp.concatenate([cls_pos, self.pos_embed(grouped.center)], axis=1)
        x = jnp.concatenate([cls_tok, tokens], axis=1)
        x = self.blocks(x, pos, deterministic)
        return self.norm(x)

    def __call__(self, pts, deterministic: bool = True):
        x = self.features(pts, deterministic)
        concat_f = jnp.concatenate([x[:, 0], jnp.max(x[:, 1:], axis=1)], axis=-1)
        return self.cls_head_finetune(concat_f, deterministic)


class Classifier(nn.Module):
    """Pretrain-time supervised probe on encoder features
    (``models/Point_MAE.py:585-629``): LN -> mean+max pool -> MLP(384->256->256->40)."""

    cls_dim: int = 40
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(feats)
        pooled = jnp.mean(x, axis=1) + jnp.max(x, axis=1)
        return ClsHead(self.cls_dim, dtype=self.dtype, name="head")(pooled, deterministic)
