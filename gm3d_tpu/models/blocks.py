"""Transformer building blocks and the mini-PointNet patch embed.

Semantics follow the reference exactly (cited per class), re-expressed as
flax modules with a configurable compute dtype so activations run in bf16 on
the MXU while parameters stay fp32.

Key reference behaviours preserved:
  - positional embedding is added at the input of EVERY block
    (``models/Point_MAE.py:162-165``), not once at the stem;
  - pre-norm blocks with stochastic depth ramped linearly over depth;
  - the patch embed is a two-stage mini-PointNet with a global max-pool
    concat (``models/Point_MAE.py:16-47``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

# reference init: trunc_normal(std=0.02) for Linear/Conv weights, zero bias
# (``models/Point_MAE.py:255-266`` _init_weights)
KINIT = nn.initializers.truncated_normal(0.02)


def _dense(features, dtype, name=None, use_bias=True):
    return nn.Dense(features, dtype=dtype, name=name, use_bias=use_bias, kernel_init=KINIT)


import contextlib

# Trace-time replica factor for the batch-floor path (train/finetune.py):
# when a small batch is tiled K times to satisfy the TPU compile-shape floor,
# every BN site sees K identical copies of each sample. The biased batch
# mean/var are unchanged by exact replication, but torch's Bessel correction
# must use the TRUE sample count n, not K*n, for running_var to match the
# untiled run exactly. Set via ``bn_replica_tiling`` around ``model.apply``
# INSIDE the traced step body (re-entered on every retrace, so it is a
# static, deterministic trace-time constant — never a runtime global).
_BN_REPLICAS: int = 1


@contextlib.contextmanager
def bn_replica_tiling(replicas: int):
    """Mark that batch inputs are tiled ``replicas``× (batch-floor padding);
    TorchBatchNorm divides its Bessel sample count accordingly."""
    global _BN_REPLICAS
    prev = _BN_REPLICAS
    _BN_REPLICAS = int(replicas)
    try:
        yield
    finally:
        _BN_REPLICAS = prev


class TorchBatchNorm(nn.Module):
    """BatchNorm with ``torch.nn.BatchNorm1d`` running-stat semantics.

    torch normalises with the BIASED batch variance but stores the
    UNBIASED (Bessel-corrected, x n/(n-1)) variance in ``running_var``;
    flax ``nn.BatchNorm`` stores the biased variance. The difference is
    n/(n-1) on every eval-time variance — negligible for the patch-embed BNs
    (n = B*G*S) but 1-3% at head batch sizes, which shifts eval logits.
    Collection layout matches flax BN ({scale, bias} params, {mean, var}
    batch_stats) so checkpoints and the torch import/export maps are
    unchanged. Stats are computed in fp32 regardless of compute dtype
    (torch autocast runs BN in fp32 too).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            # two-pass variance, like torch: E[x^2]-E[x]^2 loses ~1e-4
            # relative precision to fp32 cancellation when |mean| >> std
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = x.size // feat // max(_BN_REPLICAS, 1)
                bessel = n / max(n - 1, 1)
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var * bessel
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


def drop_path(
    x: jax.Array, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Stochastic depth: drop the residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    """Transformer MLP, 4x expansion (``models/Point_MAE.py:82-98``)."""

    dim: int
    hidden_dim: int
    dtype: Dtype = jnp.float32
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = _dense(self.hidden_dim, self.dtype, "fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = _dense(self.dim, self.dtype, "fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


# Trace-time switch for the fused-attention Pallas route (round 4,
# ops/fused_attention.py — 1.22-1.23x fwd / 1.13-1.19x fwd+bwd vs XLA at
# the GM3D shapes; custom VJP, so differentiated applies are served too).
# Enabled ONLY where the same-session end-to-end A/B measured a win — the
# GM3D pretrain step; the finetune step and serving forward measured SLOWER
# fused and stay on XLA (docs/BENCHMARKS.md "where it does NOT pay"). Same
# trace-time global pattern as ``bn_replica_tiling``.
_FUSED_ATTENTION: bool = False

# The mesh the fused route partitions over when more than one device is
# visible lives in the shared registry (parallel/context.py, set once by
# the CLIs via cli/common.py:setup_mesh). With a mesh, Attention wraps the
# proven single-device kernel in ``jax.shard_map`` over the mesh's data
# axis: each device runs the kernel on its batch shard, and shard_map's
# transpose psums the replicated-weight cotangents — the partitioning
# validated by tests/test_parallel.py::TestFusedAttentionShardMap on the
# virtual CPU mesh (interpret-mode pallas; Mosaic codegen itself is proven
# single-chip).


def _compute_mesh():
    from gm3d_tpu.parallel.context import get_compute_mesh

    return get_compute_mesh()


def set_fused_attention_mesh(mesh) -> None:
    """Register the data mesh the Pallas routes shard over (None clears; a
    1-device mesh is equivalent to no mesh). Alias of
    ``parallel.context.set_compute_mesh`` — the exact-KNN kernel reads the
    same registry."""
    from gm3d_tpu.parallel.context import set_compute_mesh

    set_compute_mesh(mesh)


@contextlib.contextmanager
def fused_attention_scope(enabled: bool = True):
    """Route mask-free attention through the fused Pallas kernel (with its
    custom-VJP backward) inside this scope. Backend gated —
    see :func:`_fused_available`; enable only on A/B-measured surfaces."""
    global _FUSED_ATTENTION
    prev = _FUSED_ATTENTION
    _FUSED_ATTENTION = bool(enabled)
    try:
        yield
    finally:
        _FUSED_ATTENTION = prev


def _fused_available() -> bool:
    """Patchable in tests. Real condition: TPU backend, and — when more than
    one device is visible — a registered mesh for the shard_map route (the
    partitioning is validated on the virtual CPU mesh; an unregistered
    multi-device context would leave the pallas_call's GSPMD partitioning to
    XLA, which is unvalidated, so the route yields to XLA there).
    ``GM3D_DISABLE_FUSED_ATTENTION=1`` is the operational kill-switch (and
    the same-session A/B lever for benchmarks)."""
    import os

    return (jax.default_backend() == "tpu"
            and (jax.device_count() == 1 or _compute_mesh() is not None)
            and not os.environ.get("GM3D_DISABLE_FUSED_ATTENTION"))


def _fused_block_batch(batch: int, seq: int, dtype=None):
    """Largest clouds-per-grid-step that divides the batch and keeps the
    folded score matrix in VMEM; None disables the route.

    Cap bt*seq at 512 (bf16): the BACKWARD kernel holds ~6 (n, n) fp32
    arrays on the VMEM stack (s/e/a/da/ds + the block-diagonal mask), so
    n = 1024 needs ~24 MB > the 16 MB scoped limit — the Mosaic compile
    OOMs (hit at the M2AE decoder shapes, 512 tokens x 192; round-5 lever
    sweep). n = 512 is the proven GM3D bf16 configuration (bt=8 x 64
    tokens) — and it sits RIGHT AT the ceiling: with fp32 operand blocks
    the same configuration allocates 16.18 MB and OOMs (caught by the
    round-5 soak run, which exercises the CLI's default fp32 dtype), so
    fp32 halves the cap to 256 (bt=4 at the GM3D shapes)."""
    cap = 256 if dtype == jnp.float32 else 512
    for bt in (8, 4, 2, 1):
        if batch % bt == 0 and bt * seq <= cap:
            return bt
    return None


class _DenseParams(nn.Module):
    """Parameter-only twin of ``nn.Dense``: declares the SAME {kernel, bias}
    tree at the same scope path, so the fused-attention route can read the
    weights without emitting the unfused matmul. Inits are identical to
    ``_dense`` (trunc-normal 0.02 kernel, zero bias), so a model initialised
    through either route has the same parameters."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", KINIT, (in_features, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class Attention(nn.Module):
    """Multi-head self-attention (``models/Point_MAE.py:101-125``).

    qkv has no bias (reference default qkv_bias=False).
    """

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, attn_mask=None):
        batch, seq, _ = x.shape
        # per-shard gating: with a registered multi-device mesh the kernel
        # runs on each device's batch shard, so the block size is chosen
        # from the LOCAL batch
        mesh = _compute_mesh()
        n_shards = 1 if mesh is None else max(int(mesh.devices.size), 1)
        local_batch = batch // n_shards if batch % n_shards == 0 else None
        bt = (_fused_block_batch(local_batch, seq, self.dtype)
              if local_batch else None)
        # the fused kernel applies no attention/proj dropout: take the route
        # only when dropout is inert (deterministic, or — as in every shipped
        # config — the rates are 0). The trainable wrapper carries a Pallas
        # backward kernel, so differentiated applies (student fwd+bwd) are
        # served too, not just the grad-free EMA/teacher passes.
        dropout_inert = deterministic or (
            self.attn_drop == 0.0 and self.proj_drop == 0.0)
        if (_FUSED_ATTENTION and attn_mask is None and dropout_inert
                and bt is not None and self.dim % self.num_heads == 0
                and _fused_available()):
            from gm3d_tpu.ops.fused_attention import fused_attention_trainable

            wqkv, bqkv = _DenseParams(self.dim * 3, self.qkv_bias, name="qkv")(self.dim)
            wproj, bproj = _DenseParams(self.dim, True, name="proj")(self.dim)
            if bqkv is None:
                bqkv = jnp.zeros((3 * self.dim,), wqkv.dtype)
            # cast weights to the compute dtype first, matching nn.Dense's
            # bf16 weight rounding; the kernel accumulates in fp32 either way
            operands = (x, wqkv.astype(self.dtype), bqkv.astype(self.dtype),
                        wproj.astype(self.dtype), bproj.astype(self.dtype))
            if n_shards == 1:
                return fused_attention_trainable(*operands, self.num_heads, bt)
            # shard_map over the data axis: batch-sharded x, replicated
            # weights (their cotangents are psum-ed by shard_map's
            # transpose). check_vma off: the custom-VJP kernel is not
            # vma-annotated.
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            heads = self.num_heads

            def _sharded(xs, wq, bq, wp, bp):
                return fused_attention_trainable(xs, wq, bq, wp, bp, heads, bt)

            return jax.shard_map(
                _sharded, mesh=mesh,
                in_specs=(P(axis), P(), P(), P(), P()),
                out_specs=P(axis), check_vma=False,
            )(*operands)
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        qkv = _dense(self.dim * 3, self.dtype, "qkv", use_bias=self.qkv_bias)(x)
        qkv = qkv.reshape(batch, seq, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = attn.astype(jnp.float32)
        if attn_mask is not None:
            # attn_mask: (B, N, N) bool — True where attention is allowed
            attn = jnp.where(attn_mask[:, None, :, :], attn, -1e9)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(batch, seq, self.dim)
        out = _dense(self.dim, self.dtype, "proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm ViT block with DropPath (``models/Point_MAE.py:128-146``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True, attn_mask=None):
        rng = None
        if not deterministic and self.drop_path_rate > 0.0:
            rng = self.make_rng("droppath")
            rng_a, rng_m = jax.random.split(rng)
        else:
            rng_a = rng_m = None
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, dtype=self.dtype, qkv_bias=self.qkv_bias, name="attn")(
            h, deterministic, attn_mask
        )
        x = x + drop_path(h, self.drop_path_rate, deterministic, rng_a)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        h = Mlp(self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            h, deterministic
        )
        x = x + drop_path(h, self.drop_path_rate, deterministic, rng_m)
        return x


def _dpr(drop_path_rate: float, depth: int) -> Sequence[float]:
    """Linear stochastic-depth ramp, matching torch.linspace(0, rate, depth)."""
    if depth == 1:
        return [0.0]
    return [drop_path_rate * i / (depth - 1) for i in range(depth)]


class TransformerEncoder(nn.Module):
    """Stack of blocks; pos is added at EVERY block input
    (``models/Point_MAE.py:149-165``)."""

    dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True, attn_mask=None):
        for i, rate in enumerate(_dpr(self.drop_path_rate, self.depth)):
            x = Block(
                self.dim, self.num_heads, drop_path_rate=rate, dtype=self.dtype, name=f"block{i}"
            )(x + pos, deterministic, attn_mask)
        return x


class TransformerDecoder(nn.Module):
    """Decoder stack + final LayerNorm.

    ``return_all=True`` matches the GM3D student decoders which norm and
    return the FULL sequence (``...feature_besed.py:1287-1293``); the teacher
    decoder returns only the last ``return_tokens`` mask tokens
    (``models/Point_MAE.py:212-217``).
    """

    dim: int
    depth: int
    num_heads: int
    drop_path_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, return_tokens: int = 0, deterministic: bool = True):
        for i, rate in enumerate(_dpr(self.drop_path_rate, self.depth)):
            x = Block(
                self.dim, self.num_heads, drop_path_rate=rate, dtype=self.dtype, name=f"block{i}"
            )(x + pos, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        if return_tokens:
            x = x[:, -return_tokens:]
        return x


class PatchEncoder(nn.Module):
    """Mini-PointNet patch embed (``models/Point_MAE.py:16-47``).

    Per group: Dense(3->128) BN ReLU Dense(128->256); global max; concat;
    Dense(512->512) BN ReLU Dense(512->out); max over points.
    Conv1d(k=1) == per-point Dense. BatchNorm stats reduce over batch, group
    and point axes (same as torch BN1d over (B*G, C, n)).
    """

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, point_groups, deterministic: bool = True):
        # point_groups: (B, G, S, 3)
        x = point_groups.astype(self.dtype)
        x = _dense(128, self.dtype, "conv1")(x)
        x = TorchBatchNorm(
            use_running_average=deterministic, momentum=0.9, dtype=self.dtype, name="bn1"
        )(x)
        x = nn.relu(x)
        x = _dense(256, self.dtype, "conv2")(x)  # (B, G, S, 256)
        g = jnp.max(x, axis=-2, keepdims=True)  # (B, G, 1, 256)
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)  # (B, G, S, 512)
        x = _dense(512, self.dtype, "conv3")(x)
        x = TorchBatchNorm(
            use_running_average=deterministic, momentum=0.9, dtype=self.dtype, name="bn2"
        )(x)
        x = nn.relu(x)
        x = _dense(self.out_dim, self.dtype, "conv4")(x)
        return jnp.max(x, axis=-2)  # (B, G, out_dim)


class PosEmbedMLP(nn.Module):
    """Positional embedding on 3D centers: Linear-GELU-Linear
    (``models/Point_MAE.py:238-242``)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, centers):
        x = _dense(128, self.dtype, "fc1")(centers.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        return _dense(self.dim, self.dtype, "fc2")(x)
