"""Fused multi-head self-attention Pallas kernel — a TIMEBOXED experiment.

The reference computes attention as unfused torch ops
(``models/Point_MAE.py:113-125``); in the rebuild XLA already fuses the
elementwise tail of each matmul. The round-3 perf analysis concluded
kernel-level fusion of the attention block was "not worth it" from phase
shares alone; this module converts that judgment into a measurement
(round-4 verdict item #5): qkv projection + scores + softmax + output
projection in ONE Pallas kernel, batched over clouds inside each grid step
(grid steps serialise on a TPU core — batch work must live inside the step,
CLAUDE.md).

Kernel design (Mosaic-friendly, learned the hard way): a first draft kept
per-head 4-D tensors and died in ``infer-vector-layout: unsupported shape
cast`` (``(512,1152) -> (8,64,18,64)``). This version keeps EVERY operand
2-D: the block's clouds are folded into one ``(bt*L, D)`` matrix, per-head
projections are separate ``(H, D, hd)`` operands indexed on the leading
axis, and cross-cloud attention is suppressed with a block-diagonal mask on
the folded ``(bt*L, bt*L)`` score matrix. The fold costs ~6% extra FLOPs on
the (small) score/attend matmuls but keeps full 128-lane MXU tiles
throughout; per-head outputs fold into the output projection
(``y += (attn @ v_h) @ Wproj[h]``) so no lane-dim concat is needed.

Shapes are the GM3D hot path: L = 64 tokens, D = 384, 6 heads x 64.
Numbers (real chip): docs/BENCHMARKS.md "Fused attention experiment";
``scripts/bench_fused_attention.py`` reproduces them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                 wp_ref, bp_ref, o_ref, *, heads: int, length: int):
    bt, _, dim = x_ref.shape
    hd = dim // heads
    scale = hd ** -0.5
    n = bt * length
    x2 = x_ref[:].astype(jnp.float32).reshape(n, dim)

    # block-diagonal validity: token i may attend j iff same cloud
    rb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // length
    cb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // length
    neg = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

    y = jnp.broadcast_to(bp_ref[:].astype(jnp.float32)[None, :], (n, dim))
    for h in range(heads):
        q = jnp.dot(x2, wq_ref[h].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        q = q + bq_ref[h].astype(jnp.float32)[None, :]
        k = jnp.dot(x2, wk_ref[h].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        k = k + bk_ref[h].astype(jnp.float32)[None, :]
        v = jnp.dot(x2, wv_ref[h].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        v = v + bv_ref[h].astype(jnp.float32)[None, :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + neg
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(attn, v, preferred_element_type=jnp.float32)
        y = y + jnp.dot(o, wp_ref[h].astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    o_ref[:] = y.reshape(bt, length, dim).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "block_batch", "interpret"))
def fused_attention(x, wqkv, bqkv, wproj, bproj, heads: int = 6,
                    block_batch: int = 8, interpret: bool = False):
    """y = proj(softmax(q k^T / sqrt(hd)) v) with qkv = x @ wqkv + bqkv.

    x: (B, L, D); wqkv: (D, 3D) with output columns laid out (3, H, hd)
    (i.e. ``wqkv.reshape(D, 3, H, hd)``); wproj: (D, D). Batched over
    ``block_batch`` clouds per grid step.
    """
    batch, length, dim = x.shape
    assert batch % block_batch == 0, (batch, block_batch)
    hd = dim // heads
    w4 = wqkv.reshape(dim, 3, heads, hd)
    wq = jnp.transpose(w4[:, 0], (1, 0, 2))   # (H, D, hd)
    wk = jnp.transpose(w4[:, 1], (1, 0, 2))
    wv = jnp.transpose(w4[:, 2], (1, 0, 2))
    b4 = bqkv.reshape(3, heads, hd)
    wp = wproj.reshape(heads, hd, dim)        # rows h*hd:(h+1)*hd per head

    grid = (batch // block_batch,)
    head_spec = pl.BlockSpec((heads, dim, hd), lambda i: (0, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, length=length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_batch, length, dim), lambda i: (i, 0, 0)),
            head_spec, head_spec,
            pl.BlockSpec((heads, dim, hd), lambda i: (0, 0, 0)),
            pl.BlockSpec((heads, hd), lambda i: (0, 0)),
            pl.BlockSpec((heads, hd), lambda i: (0, 0)),
            pl.BlockSpec((heads, hd), lambda i: (0, 0)),
            pl.BlockSpec((heads, hd, dim), lambda i: (0, 0, 0)),
            pl.BlockSpec((dim,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block_batch, length, dim), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((batch, length, dim), x.dtype),
        interpret=interpret,
    )(x, wq, wk, wv, b4[0], b4[1], b4[2], wp, bproj)


def reference_attention(x, wqkv, bqkv, wproj, bproj, heads: int = 6):
    """The XLA-fused baseline — identical math, identical weight layout."""
    batch, length, dim = x.shape
    hd = dim // heads
    qkv = (jnp.einsum("bld,de->ble", x.astype(jnp.float32),
                      wqkv.astype(jnp.float32))
           + bqkv.astype(jnp.float32)).reshape(batch, length, 3, heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, L, H, hd)
    scores = jnp.einsum("blhd,bmhd->bhlm", q, k) * (hd ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1)
    y = jnp.einsum("bhlm,bmhd->blhd", attn, v).reshape(batch, length, dim)
    y = jnp.einsum("bld,de->ble", y, wproj.astype(jnp.float32))
    return (y + bproj.astype(jnp.float32)).astype(x.dtype)
