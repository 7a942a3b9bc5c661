"""Exact k-nearest-neighbour search on TPU.

Replaces the reference's ``KNN_CUDA`` (``KNN(k, transpose_mode=True)(ref, query)``
at ``models/Point_MAE.py:55,68`` in /root/reference/Point-MAE_SA3D).

For the cloud sizes this framework handles (N <= 8192 reference points,
G <= 512 queries) a brute-force distance matrix is a single batched matmul
(the cross term rides the MXU) followed by a k-smallest selection — already
near speed-of-light; no spatial index is needed. Selection uses
``lax.approx_min_k`` with ``recall_target=1.0``: EXACT results via the TPU
PartialReduce op, measured 10.1 ms vs 11.8 ms for ``top_k`` at the pretrain
shape (B=256, 64x1024 -> 32) with identical index sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_indices(ref: jax.Array, query: jax.Array, k: int, return_dist: bool = False):
    """k nearest neighbours of each query point among the reference points.

    ref:   (B, N, 3) reference cloud
    query: (B, G, 3) query points
    Returns idx (B, G, k) int32 — and squared distances (B, G, k) if
    ``return_dist`` (the reference's KNN returns (dist, idx) with the same
    ordering: ascending distance).
    """
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
