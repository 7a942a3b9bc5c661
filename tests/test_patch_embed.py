"""Fused Pallas patch-embed kernel vs the flax PatchEncoder (eval mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.models.blocks import PatchEncoder
from gm3d_tpu.ops.patch_embed import fused_patch_embed, params_from_variables


def test_matches_flax_eval_mode():
    rng = np.random.default_rng(0)
    B, G, S, C = 2, 16, 8, 48
    neigh = jnp.asarray(rng.standard_normal((B, G, S, 3)).astype(np.float32))
    enc = PatchEncoder(C)
    variables = enc.init(jax.random.key(0), neigh, False)
    # put nontrivial running stats in place
    bs = jax.tree.map(lambda x: x, variables["batch_stats"])
    bs["bn1"]["mean"] = jnp.asarray(rng.standard_normal(128).astype(np.float32) * 0.1)
    bs["bn1"]["var"] = jnp.asarray(rng.random(128).astype(np.float32) + 0.5)
    bs["bn2"]["mean"] = jnp.asarray(rng.standard_normal(512).astype(np.float32) * 0.1)
    bs["bn2"]["var"] = jnp.asarray(rng.random(512).astype(np.float32) + 0.5)
    variables = {"params": variables["params"], "batch_stats": bs}

    want = enc.apply(variables, neigh, True)  # deterministic / running stats
    params = params_from_variables({"params": {"e": variables["params"]},
                                    "batch_stats": {"e": variables["batch_stats"]}},
                                   prefix=("e",))
    got = fused_patch_embed(neigh, params, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_full_size_shapes():
    rng = np.random.default_rng(1)
    B, G, S, C = 2, 64, 32, 384
    neigh = jnp.asarray(rng.standard_normal((B, G, S, 3)).astype(np.float32))
    enc = PatchEncoder(C)
    variables = enc.init(jax.random.key(0), neigh, False)
    params = params_from_variables({"params": {"e": variables["params"]},
                                    "batch_stats": {"e": variables["batch_stats"]}},
                                   prefix=("e",))
    out = fused_patch_embed(neigh, params, interpret=True)
    assert out.shape == (B, G, C)
    want = enc.apply(variables, neigh, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=2e-4)
