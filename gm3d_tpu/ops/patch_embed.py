"""Fused mini-PointNet patch embedding — Pallas TPU kernel (eval mode).

The patch embed (``models/Point_MAE.py:16-47``) is the largest single FLOP
block of the GM3D step (~2 GFLOP/cloud/call) and its inter-matmul activations
((B, G, S, 256/512) — ~0.5 GB each at batch 256) round-trip through HBM under
XLA. This kernel runs the whole pipeline per batch row entirely in VMEM:

    X(G*S, 3pad) @ W1 -> BN1(affine) -> ReLU -> @ W2 -> per-group max ->
    concat -> @ W3 -> BN2(affine) -> ReLU -> @ W4 -> per-group max -> (G, C)

Points live on sublanes (G*S = 2048 rows) and features on lanes, so every
matmul is an MXU-shaped (2048 x C_in) @ (C_in x C_out) contraction and the
per-group maxes reduce over sublane blocks.

Eval-mode only (BatchNorm folded to affine from running stats): used for the
frozen teacher and EMA forward passes, which need no parameter gradients.
The training path keeps XLA's autodiff-friendly composition.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PatchEmbedParams(NamedTuple):
    w1: jax.Array  # (3, 128)
    b1: jax.Array  # (128,)
    bn1_scale: jax.Array  # (128,) folded gamma/sqrt(var+eps)
    bn1_shift: jax.Array  # (128,) folded beta - mean*scale
    w2: jax.Array  # (128, 256)
    b2: jax.Array  # (256,)
    w3: jax.Array  # (512, 512)
    b3: jax.Array  # (512,)
    bn2_scale: jax.Array  # (512,)
    bn2_shift: jax.Array  # (512,)
    w4: jax.Array  # (512, C_out)
    b4: jax.Array  # (C_out,)


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """BatchNorm running stats -> affine (scale, shift)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def params_from_variables(variables: dict, prefix=("encoder",)) -> PatchEmbedParams:
    """Extract folded kernel params from a flax PatchEncoder's variables."""
    p = variables["params"]
    bs = variables["batch_stats"]
    for k in prefix:
        p = p[k]
        bs = bs[k]
    s1, t1 = fold_bn(p["bn1"]["scale"], p["bn1"]["bias"], bs["bn1"]["mean"], bs["bn1"]["var"])
    s2, t2 = fold_bn(p["bn2"]["scale"], p["bn2"]["bias"], bs["bn2"]["mean"], bs["bn2"]["var"])
    return PatchEmbedParams(
        p["conv1"]["kernel"], p["conv1"]["bias"], s1, t1,
        p["conv2"]["kernel"], p["conv2"]["bias"],
        p["conv3"]["kernel"], p["conv3"]["bias"], s2, t2,
        p["conv4"]["kernel"], p["conv4"]["bias"],
    )


def _kernel(
    x_ref,  # (1, GS, 128) — coords in lanes 0..2, rest zero
    w1_ref,  # (128, 128) — rows 0..2 hold W1, rest zero
    a1_ref,  # (8, 128): row0=b1, row1=bn1_scale, row2=bn1_shift
    w2_ref,  # (128, 256)
    w3_ref,  # (512, 512)
    a3_ref,  # (8, 512): row0=b3, row1=bn2_scale, row2=bn2_shift
    w4_ref,  # (512, C_out)
    b4_ref,  # (8, C_out): row0=b4
    out_ref,  # (1, G, C_out)
    *,
    num_groups: int,
    group_size: int,
):
    gs = x_ref.shape[1]
    x = x_ref[0, :, :]  # (GS, 128)

    # conv1 (+BN1 affine, ReLU) — zero-padded K keeps the MXU shape clean
    h1 = jax.lax.dot_general(
        x, w1_ref[:, :], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (GS, 128)
    h1 = h1 + a1_ref[0:1, :]
    h1 = jnp.maximum(h1 * a1_ref[1:2, :] + a1_ref[2:3, :], 0.0)

    # conv2
    h2 = jax.lax.dot_general(
        h1, w2_ref[:, :], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (GS, 256)

    # per-group max over sublane blocks + broadcast concat -> (GS, 512)
    h2g = h2.reshape(num_groups, group_size, 256)
    gmax = jnp.max(h2g, axis=1, keepdims=True)  # (G, 1, 256)
    gmax = jnp.broadcast_to(gmax, h2g.shape).reshape(gs, 256)
    hc = jnp.concatenate([gmax, h2], axis=1)  # (GS, 512)

    # conv3 (+BN2 affine, ReLU)
    h3 = jax.lax.dot_general(
        hc, w3_ref[:, :], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (GS, 512)
    h3 = h3 + a3_ref[0:1, :]
    h3 = jnp.maximum(h3 * a3_ref[1:2, :] + a3_ref[2:3, :], 0.0)

    # conv4 + final per-group max
    h4 = jax.lax.dot_general(
        h3, w4_ref[:, :], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (GS, C_out)
    h4 = h4 + b4_ref[0:1, :]
    out_ref[0, :, :] = jnp.max(
        h4.reshape(num_groups, group_size, h4.shape[-1]), axis=1
    )


def fused_patch_embed(
    neighborhood: jax.Array, params: PatchEmbedParams, *, interpret: bool = False
) -> jax.Array:
    """(B, G, S, 3) center-normalised patches -> (B, G, C_out) tokens.

    Matches ``PatchEncoder`` in eval mode (running BN stats) to fp32 accuracy.
    """
    batch, num_groups, group_size, _ = neighborhood.shape
    gs = num_groups * group_size
    out_dim = params.w4.shape[-1]

    # coords into the first 3 of 128 lanes
    x = jnp.zeros((batch, gs, 128), jnp.float32)
    x = x.at[:, :, :3].set(neighborhood.astype(jnp.float32).reshape(batch, gs, 3))

    def pack_rows(*rows, width):
        buf = jnp.zeros((8, width), jnp.float32)
        for i, r in enumerate(rows):
            buf = buf.at[i, :].set(r.astype(jnp.float32))
        return buf

    w1 = jnp.zeros((128, 128), jnp.float32).at[:3, :].set(params.w1.astype(jnp.float32))
    a1 = pack_rows(params.b1, params.bn1_scale, params.bn1_shift, width=128)
    a3 = pack_rows(params.b3, params.bn2_scale, params.bn2_shift, width=512)
    b4 = pack_rows(params.b4, width=out_dim)

    kernel = functools.partial(_kernel, num_groups=num_groups, group_size=group_size)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, gs, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((128, 128)),
            full((8, 128)),
            full((128, 256)),
            full((512, 512)),
            full((8, 512)),
            full((512, out_dim)),
            full((8, out_dim)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_groups, out_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_groups, out_dim), jnp.float32),
        interpret=interpret,
    )(x, w1, a1, params.w2.astype(jnp.float32), params.w3.astype(jnp.float32), a3,
      params.w4.astype(jnp.float32), b4)
    return out
