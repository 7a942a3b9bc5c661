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
    wq, wk, wv, b4, wp = _split_weights(wqkv, bqkv, wproj, heads)

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


def _attn_bwd_kernel(x_ref, dy_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                     bv_ref, wp_ref,
                     dx_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref,
                     dbv_ref, dwp_ref, dbp_ref, *, heads: int, length: int):
    """Backward of :func:`_attn_kernel` — flash-style recompute from ``x``
    (no big residuals), same folded block-diagonal formulation. Weight grads
    accumulate IN FP32 across the sequential grid steps via revisited output
    blocks (constant index maps); ``dx`` is block-local."""
    bt, _, dim = x_ref.shape
    hd = dim // heads
    scale = hd ** -0.5
    n = bt * length

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
                    dwp_ref, dbp_ref):
            ref[...] = jnp.zeros_like(ref)

    x2 = x_ref[:].astype(jnp.float32).reshape(n, dim)
    dy2 = dy_ref[:].astype(jnp.float32).reshape(n, dim)
    rb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // length
    cb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // length
    neg = jnp.where(rb == cb, 0.0, -1e9).astype(jnp.float32)

    dbp_ref[...] += jnp.sum(dy2, axis=0)
    dx = jnp.zeros((n, dim), jnp.float32)
    contract_rows = (((0,), (0,)), ((), ()))   # a^T b for (n, p) x (n, q)
    contract_last = (((1,), (1,)), ((), ()))   # a b^T for (n, p) x (m, p)
    for h in range(heads):
        wqh = wq_ref[h].astype(jnp.float32)
        wkh = wk_ref[h].astype(jnp.float32)
        wvh = wv_ref[h].astype(jnp.float32)
        q = jnp.dot(x2, wqh, preferred_element_type=jnp.float32) \
            + bq_ref[h].astype(jnp.float32)[None, :]
        k = jnp.dot(x2, wkh, preferred_element_type=jnp.float32) \
            + bk_ref[h].astype(jnp.float32)[None, :]
        v = jnp.dot(x2, wvh, preferred_element_type=jnp.float32) \
            + bv_ref[h].astype(jnp.float32)[None, :]
        s = jax.lax.dot_general(q, k, dimension_numbers=contract_last,
                                preferred_element_type=jnp.float32) * scale + neg
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = e / jnp.sum(e, axis=-1, keepdims=True)

        # dY -> per-head decoder side
        do = jax.lax.dot_general(dy2, wp_ref[h].astype(jnp.float32),
                                 dimension_numbers=contract_last,
                                 preferred_element_type=jnp.float32)  # (n, hd)
        oh = jnp.dot(a, v, preferred_element_type=jnp.float32)
        dwp_ref[h] += jax.lax.dot_general(oh, dy2, dimension_numbers=contract_rows,
                                          preferred_element_type=jnp.float32)
        da = jax.lax.dot_general(do, v, dimension_numbers=contract_last,
                                 preferred_element_type=jnp.float32)  # (n, n)
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True)) * scale
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q, dimension_numbers=contract_rows,
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(a, do, dimension_numbers=contract_rows,
                                 preferred_element_type=jnp.float32)

        dwq_ref[h] += jax.lax.dot_general(x2, dq, dimension_numbers=contract_rows,
                                          preferred_element_type=jnp.float32)
        dwk_ref[h] += jax.lax.dot_general(x2, dk, dimension_numbers=contract_rows,
                                          preferred_element_type=jnp.float32)
        dwv_ref[h] += jax.lax.dot_general(x2, dv, dimension_numbers=contract_rows,
                                          preferred_element_type=jnp.float32)
        dbq_ref[h] += jnp.sum(dq, axis=0)
        dbk_ref[h] += jnp.sum(dk, axis=0)
        dbv_ref[h] += jnp.sum(dv, axis=0)

        dx = dx + jax.lax.dot_general(dq, wqh, dimension_numbers=contract_last,
                                      preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dk, wkh, dimension_numbers=contract_last,
                                      preferred_element_type=jnp.float32)
        dx = dx + jax.lax.dot_general(dv, wvh, dimension_numbers=contract_last,
                                      preferred_element_type=jnp.float32)
    dx_ref[:] = dx.reshape(bt, length, dim).astype(dx_ref.dtype)


def _split_weights(wqkv, bqkv, wproj, heads: int):
    dim = wqkv.shape[0]
    hd = dim // heads
    w4 = wqkv.reshape(dim, 3, heads, hd)
    wq = jnp.transpose(w4[:, 0], (1, 0, 2))
    wk = jnp.transpose(w4[:, 1], (1, 0, 2))
    wv = jnp.transpose(w4[:, 2], (1, 0, 2))
    b4 = bqkv.reshape(3, heads, hd)
    wp = wproj.reshape(heads, hd, dim)
    return wq, wk, wv, b4, wp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention_trainable(x, wqkv, bqkv, wproj, bproj, heads: int = 6,
                              block_batch: int = 8, interpret: bool = False):
    """:func:`fused_attention` with a custom VJP (a Pallas backward kernel),
    so the fused route also serves DIFFERENTIATED applies — the student
    forward+backward, not just the grad-free EMA/teacher passes."""
    return fused_attention(x, wqkv, bqkv, wproj, bproj, heads, block_batch,
                           interpret)


def _fat_fwd(x, wqkv, bqkv, wproj, bproj, heads, block_batch, interpret):
    y = fused_attention(x, wqkv, bqkv, wproj, bproj, heads, block_batch,
                        interpret)
    return y, (x, wqkv, bqkv, wproj)


def _fat_bwd(heads, block_batch, interpret, res, dy):
    x, wqkv, bqkv, wproj = res
    batch, length, dim = x.shape
    hd = dim // heads
    wq, wk, wv, b4, wp = _split_weights(wqkv, bqkv, wproj, heads)
    grid = (batch // block_batch,)

    def const3(i):
        return (0, 0, 0)

    head_mat = pl.BlockSpec((heads, dim, hd), const3)
    head_vec = pl.BlockSpec((heads, hd), lambda i: (0, 0))
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, heads=heads, length=length),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_batch, length, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((block_batch, length, dim), lambda i: (i, 0, 0)),
            head_mat, head_mat, head_mat,
            head_vec, head_vec, head_vec,
            pl.BlockSpec((heads, hd, dim), const3),
        ],
        out_specs=[
            pl.BlockSpec((block_batch, length, dim), lambda i: (i, 0, 0)),
            head_mat, head_mat, head_mat,
            head_vec, head_vec, head_vec,
            pl.BlockSpec((heads, hd, dim), const3),
            pl.BlockSpec((dim,), lambda i: (0,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, length, dim), x.dtype),
            jax.ShapeDtypeStruct((heads, dim, hd), f32),
            jax.ShapeDtypeStruct((heads, dim, hd), f32),
            jax.ShapeDtypeStruct((heads, dim, hd), f32),
            jax.ShapeDtypeStruct((heads, hd), f32),
            jax.ShapeDtypeStruct((heads, hd), f32),
            jax.ShapeDtypeStruct((heads, hd), f32),
            jax.ShapeDtypeStruct((heads, hd, dim), f32),
            jax.ShapeDtypeStruct((dim,), f32),
        ],
        interpret=interpret,
    )(x, dy, wq, wk, wv, b4[0], b4[1], b4[2], wp)
    dx, dwq, dwk, dwv, dbq, dbk, dbv, dwp, dbp = outs
    # reassemble into the qkv-packed layouts (inverse of _split_weights)
    dw4 = jnp.stack([dwq, dwk, dwv])                  # (3, H, D, hd)
    dwqkv = jnp.transpose(dw4, (2, 0, 1, 3)).reshape(dim, 3 * dim)
    dbqkv = jnp.stack([dbq, dbk, dbv]).reshape(3 * dim)
    dwproj = dwp.reshape(dim, dim)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbp.astype(bqkv.dtype))


fused_attention_trainable.defvjp(_fat_fwd, _fat_bwd)


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
