"""Exact k-nearest-neighbour search on TPU.

Replaces the reference's ``KNN_CUDA`` (``KNN(k, transpose_mode=True)(ref, query)``
at ``models/Point_MAE.py:55,68`` in /root/reference/Point-MAE_SA3D).

For the cloud sizes this framework handles (N <= 8192 reference points,
G <= 512 queries) a brute-force distance matrix is a single batched matmul
(the cross term rides the MXU) followed by a k-smallest selection.

Two routes:

  - XLA: ``lax.approx_min_k`` with ``recall_target=1.0`` — EXACT via the
    TPU PartialReduce op. Measured 10.1 ms vs 11.8 ms for ``top_k`` at the
    GM3D shape (round 1) and the best XLA-expressible option at the M2AE
    scale-0 shape (round-5 5-way A/B, docs/BENCHMARKS.md).
  - Pallas (TPU default, round 5): distance + selection fused IN VMEM per
    query tile — the (B, G, N) distance matrix never exists in HBM, and the
    k-smallest extraction runs as k in-register min/mask iterations instead
    of the PartialReduce's generic machinery. Exact, ascending, first-index
    tie order. ``GM3D_DISABLE_PALLAS_KNN=1`` falls back to XLA.
"""

from __future__ import annotations

import contextlib
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128

# When True, knn_indices uses the portable XLA formulation even on a TPU
# backend. Needed by cross-platform AOT export (serve/export.py): a Mosaic
# custom call cannot lower for non-TPU platforms (same pattern as
# ops.fps.portable_fps).
_FORCE_PORTABLE = False


@contextlib.contextmanager
def portable_knn():
    """Trace-scope override: route ``knn_indices`` to the portable XLA
    implementation regardless of backend (for multi-platform ``jax.export``)."""
    global _FORCE_PORTABLE
    prev = _FORCE_PORTABLE
    _FORCE_PORTABLE = True
    try:
        yield
    finally:
        _FORCE_PORTABLE = prev


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def knn_indices_xla(ref: jax.Array, query: jax.Array, k: int,
                    return_dist: bool = False):
    """XLA route: brute-force distances + ``approx_min_k`` (exact)."""
    ref = ref.astype(jnp.float32)
    query = query.astype(jnp.float32)
    # ||q - r||^2 = ||q||^2 - 2 q.r + ||r||^2 ; the q.r term is an MXU matmul.
    cross = jnp.einsum("bgc,bnc->bgn", query, ref)
    q2 = jnp.sum(query * query, axis=-1)[..., None]  # (B, G, 1)
    r2 = jnp.sum(ref * ref, axis=-1)[:, None, :]  # (B, 1, N)
    dist = q2 - 2.0 * cross + r2  # (B, G, N)
    kdist, idx = jax.lax.approx_min_k(dist, k, recall_target=1.0)
    idx = idx.astype(jnp.int32)
    if return_dist:
        return kdist, idx
    return idx


def _knn_kernel(q_ref, r_ref, oi_ref, od_ref, *, k: int, num_ref: int):
    """One query tile: distances to ALL reference points in VMEM, then k
    sequential (min, first-index, mask) extractions — ascending order,
    first-index on ties. Every operand stays 2-D (Mosaic rule, CLAUDE.md):
    q (gt, 8-padded-xyz), r (8, N), d (gt, N)."""
    gt = q_ref.shape[1]
    npad = r_ref.shape[2]
    kpad = oi_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)            # (gt, 8)  xyz in lanes 0..2
    r = r_ref[0].astype(jnp.float32)            # (8, npad) xyz in sublanes 0..2
    cross = jnp.dot(q, r, preferred_element_type=jnp.float32)   # (gt, npad)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)                  # (gt, 1)
    r2 = jnp.sum(r * r, axis=0, keepdims=True)                  # (1, npad)
    d = q2 - 2.0 * cross + r2
    lane = jax.lax.broadcasted_iota(jnp.int32, (gt, npad), 1)
    d = jnp.where(lane < num_ref, d, jnp.inf)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (gt, kpad), 1)

    def body(i, carry):
        d, oi, od = carry
        m = jnp.min(d, axis=1, keepdims=True)                   # (gt, 1)
        hit = d == m
        idx = jnp.min(jnp.where(hit, lane, npad), axis=1, keepdims=True)
        oi = jnp.where(out_lane == i, idx, oi)
        od = jnp.where(out_lane == i, m, od)
        d = jnp.where(lane == idx, jnp.inf, d)
        return d, oi, od

    oi0 = jnp.zeros((gt, kpad), jnp.int32)
    od0 = jnp.zeros((gt, kpad), jnp.float32)
    _, oi, od = jax.lax.fori_loop(0, k, body, (d, oi0, od0))
    oi_ref[0] = oi
    od_ref[0] = od


def _query_tile(num_q_pad: int, npad: int) -> int:
    """Largest query tile keeping the (gt, npad) distance matrix (plus its
    like-shaped temporaries) comfortably inside VMEM (~2 MB for d)."""
    for gt in (512, 256, 128, 64, 32, 16, 8):
        if num_q_pad % gt == 0 and gt * npad * 4 <= 2 * 1024 * 1024:
            return gt
    return 8


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_indices_pallas(ref: jax.Array, query: jax.Array, k: int,
                       *, interpret: bool = False):
    """(idx, dist) of the k nearest reference points per query — Pallas
    route. ref (B, N, 3), query (B, G, 3) -> idx (B, G, k) int32 ascending,
    dist (B, G, k) fp32."""
    batch, num_ref, _ = ref.shape
    _, num_q, _ = query.shape
    npad = _round_up(num_ref, _LANE)
    num_q_pad = _round_up(num_q, 8)
    kpad = _round_up(k, _LANE)
    gt = _query_tile(num_q_pad, npad)

    q = jnp.zeros((batch, num_q_pad, 8), jnp.float32)
    q = q.at[:, :num_q, :3].set(query.astype(jnp.float32))
    r = jnp.zeros((batch, 8, npad), jnp.float32)
    r = r.at[:, :3, :num_ref].set(
        jnp.swapaxes(ref.astype(jnp.float32), 1, 2))

    grid = (batch, num_q_pad // gt)
    oi, od = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, num_ref=num_ref),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, gt, 8), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, 8, npad), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, gt, kpad), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, gt, kpad), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, num_q_pad, kpad), jnp.int32),
            jax.ShapeDtypeStruct((batch, num_q_pad, kpad), jnp.float32),
        ],
        interpret=interpret,
    )(q, r)
    return oi[:, :num_q, :k], od[:, :num_q, :k]


def _pallas_route(num_ref: int, k: int) -> bool:
    """Take the Pallas kernel on TPU for qualifying shapes.

    Round-5 A/Bs (docs/BENCHMARKS.md): isolation 3.48x vs approx_min_k at
    the M2AE scale-0 shape (N=2048, G=512, k=16 — 47.1 -> 13.5 ms);
    END-TO-END M2AE step +13.6% (474.9 -> 539.3 clouds/s) with all shapes
    routed, +14.4% (543.3) routing only N >= 1024 — the small-N KNNs are
    marginally better on XLA in-graph, so the default threshold
    (``GM3D_PALLAS_KNN_MIN_REF``) is 1024. ``GM3D_DISABLE_PALLAS_KNN=1``
    is the kill-switch + A/B lever."""
    min_ref = int(os.environ.get("GM3D_PALLAS_KNN_MIN_REF", "1024"))
    return (jax.default_backend() == "tpu"
            and not _FORCE_PORTABLE
            and not os.environ.get("GM3D_DISABLE_PALLAS_KNN")
            and num_ref >= min_ref  # tiny clouds: XLA is fine and Mosaic-safe
            and k <= _LANE)


def knn_indices(ref: jax.Array, query: jax.Array, k: int, return_dist: bool = False):
    """k nearest neighbours of each query point among the reference points.

    ref:   (B, N, 3) reference cloud
    query: (B, G, 3) query points
    Returns idx (B, G, k) int32 — and squared distances (B, G, k) if
    ``return_dist`` (the reference's KNN returns (dist, idx) with the same
    ordering: ascending distance).
    """
    if _pallas_route(ref.shape[1], k):
        from gm3d_tpu.parallel.context import get_compute_mesh

        mesh = get_compute_mesh()
        n = int(mesh.devices.size) if mesh is not None else 1
        if n <= 1:
            if jax.device_count() == 1:
                idx, kdist = knn_indices_pallas(ref, query, k)
                if return_dist:
                    return kdist, idx
                return idx
            # multi-device context with no registered mesh: the pallas_call's
            # GSPMD partitioning is unvalidated here — yield to XLA (same
            # conservatism as blocks._fused_available)
        elif ref.shape[0] % n == 0:
            # shard_map over the data axis: each device runs the proven
            # single-chip kernel on its batch shard (partitioning validated
            # on the virtual CPU mesh, tests/test_parallel.py::TestPallasKNNShardMap)
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            idx, kdist = jax.shard_map(
                lambda r, q: knn_indices_pallas(r, q, k),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=(P(axis), P(axis)), check_vma=False,
            )(ref, query)
            if return_dist:
                return kdist, idx
            return idx
    out = knn_indices_xla(ref, query, k, return_dist)
    return out
