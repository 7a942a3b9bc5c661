"""Earth Mover's Distance between equal-size point sets.

Capability-parity replacement for the reference's ``extensions/emd`` CUDA
auction kernel (never actually imported in the reference Python — see
SURVEY.md §2.3 — but part of its install surface, ``README.md:33-35``).

We use entropy-regularised optimal transport (Sinkhorn iterations): fully
vectorised, fixed iteration count, static shapes — ideal for XLA. With a
small ``epsilon`` and enough iterations this converges to the exact EMD for
the 32..2048-point sets used in point-cloud reconstruction losses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gm3d_tpu.ops.chamfer import _pairwise_sqdist


def emd_loss(
    a: jax.Array,
    b: jax.Array,
    epsilon: float = 0.005,
    iters: int = 50,
) -> jax.Array:
    """Approximate EMD (mean matched squared distance) per leading batch index.

    a, b: (..., n, 3) with equal cardinality and uniform weights.
    Returns (...,) transport cost.
    """
    cost = _pairwise_sqdist(a, b)  # (..., n, n)
    n = cost.shape[-1]
    log_mu = jnp.full(cost.shape[:-1], -jnp.log(n), jnp.float32)  # (..., n)
    log_nu = jnp.full(cost.shape[:-2] + (n,), -jnp.log(n), jnp.float32)

    # Normalise cost scale so epsilon behaves consistently across inputs.
    scale = jnp.maximum(jnp.max(cost, axis=(-2, -1), keepdims=True), 1e-9)
    logk = -cost / (scale * epsilon)

    def body(_, fg):
        f, g = fg
        # f_i = log mu_i - logsumexp_j (logK_ij + g_j)
        f = log_mu - jax.nn.logsumexp(logk + g[..., None, :], axis=-1)
        g = log_nu - jax.nn.logsumexp(logk + f[..., :, None], axis=-2)
        return f, g

    f0 = jnp.zeros_like(log_mu)
    g0 = jnp.zeros_like(log_nu)
    f, g = jax.lax.fori_loop(0, iters, body, (f0, g0))
    log_pi = logk + f[..., :, None] + g[..., None, :]
    pi = jnp.exp(log_pi)
    # pi carries total mass 1, so sum(pi * cost) is the mean matched distance.
    return jnp.sum(pi * cost, axis=(-2, -1))
