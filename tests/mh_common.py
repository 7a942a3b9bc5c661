"""Shared training routines for the multi-host tests: identical code runs in
the single-process 8-device pytest process and in each of the 2 gloo workers,
so the loss trajectories / BN statistics / probe features are directly
comparable.

Round 4 extends the original pretrain routine with the other training
families (finetune incl. BatchNorm running-stat agreement, segmentation) and
the real SVM-probe feature-extraction path feeding the cross-process gather
(``utils/dist_utils.py:50-54`` / ``main_pretrain.py:685-689`` equivalent) —
previously only pretrain ran across a real process boundary."""

from __future__ import annotations


def run_training(steps: int = 3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gm3d_tpu.masking.masks import random_mask
    from gm3d_tpu.models.pointmae import PointMAE
    from gm3d_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from gm3d_tpu.train.losses import pointmae_reconstruction_loss
    from gm3d_tpu.train.state import create_train_state

    B, N = 16, 64
    model = PointMAE(
        trans_dim=64, depth=2, num_heads=2, decoder_depth=1, decoder_num_heads=2,
        group_size=8, num_group=8, encoder_dims=64,
    )
    num_mask = 4

    mesh = make_mesh()
    rng = np.random.RandomState(0)
    pts_host = rng.randn(B, N, 3).astype(np.float32)
    mask_host = np.asarray(random_mask(jax.random.PRNGKey(5), B, 8, num_mask))

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts_host), jnp.asarray(mask_host), num_mask
    )
    tx = optax.adamw(1e-3)
    state = replicate_tree(mesh, create_train_state(variables, tx))

    @jax.jit
    def step_fn(state, pts, mask):
        def loss_fn(params):
            outs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, mask, num_mask, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(0), "droppath": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            loss = pointmae_reconstruction_loss(outs["rebuild"], outs["gt"])
            return loss, updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=bs,
                             opt_state=opt_state, step=state.step + 1), loss

    # feed batches through the CLIs' actual input path: sharded device
    # prefetch (multi-process aware via parallel.mesh._put)
    from gm3d_tpu.data.prefetch import device_prefetch
    from gm3d_tpu.parallel.mesh import batch_sharding

    mask_dev = shard_batch(mesh, mask_host)
    losses = []
    loader = [pts_host] * steps
    for batch in device_prefetch(loader, sharding=batch_sharding(mesh)):
        state, loss = step_fn(state, batch, mask_dev)
        losses.append(float(jax.device_get(loss)))
    return losses
