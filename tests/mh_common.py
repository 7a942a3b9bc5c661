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


def _bn_digest(batch_stats):
    """Flattened {leaf_path: [sum, sum_of_abs]} of the BN running stats — a
    compact, order-independent agreement check across processes. ``sum_of_abs``
    is the magnitude scale for the tolerance: near-zero sums cancel
    catastrophically, so a bare relative comparison on ``sum`` is meaningless
    for them."""
    import jax
    import numpy as np

    out = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            p = f"{prefix}/{k}"
            if isinstance(v, dict):
                walk(v, p)
            else:
                a = np.asarray(jax.device_get(v), np.float64)
                out[p] = [float(a.sum()), float(np.abs(a).sum())]

    walk(batch_stats, "bn")
    return out


def run_finetune(steps: int = 3):
    """Sharded PointTransformer finetune steps through the REAL
    ``make_finetune_train_step`` (CE + BatchNorm head). Returns
    ``(losses, bn_digest)`` — the digest pins SyncBN-by-construction across a
    real process boundary (reference ``--sync_bn``,
    ``tools/runner_pretrain.py:88-91``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gm3d_tpu.models import PointTransformer
    from gm3d_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from gm3d_tpu.train.finetune import make_finetune_train_step
    from gm3d_tpu.train.state import create_train_state

    B, N = 16, 256
    model = PointTransformer(cls_dim=4, trans_dim=48, depth=2, num_heads=2,
                             group_size=8, num_group=8, encoder_dims=48,
                             drop_path_rate=0.0)
    mesh = make_mesh()
    rng = np.random.RandomState(1)
    pts_host = rng.randn(B, N, 3).astype(np.float32)
    labels_host = (np.arange(B) % 4).astype(np.int64)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts_host[:2]))
    tx = optax.adamw(1e-3)
    state = replicate_tree(mesh, create_train_state(variables, tx))
    # npoints=1024 with 256-pt inputs: no fps/subsample branch triggers, the
    # step still runs its real augment-off/CE/BN path
    step = make_finetune_train_step(model, tx, npoints=1024, augment=False)

    pts = shard_batch(mesh, pts_host)
    labels = shard_batch(mesh, labels_host)
    losses = []
    for i in range(steps):
        state, metrics = step(state, pts, labels, jax.random.PRNGKey(100 + i))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, _bn_digest(state.batch_stats)


def run_seg(steps: int = 2):
    """Sharded part-segmentation steps through the REAL
    ``make_seg_train_step`` (category-conditioned per-point CE)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gm3d_tpu.config import build_model_from_cfg
    from gm3d_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from gm3d_tpu.train.segmentation import make_seg_train_step
    from gm3d_tpu.train.state import create_train_state

    B, N = 8, 64
    model = build_model_from_cfg({
        "NAME": "PointTransformerSeg", "trans_dim": 32, "depth": 2,
        "num_heads": 2, "group_size": 8, "num_group": 16, "encoder_dims": 32,
        "drop_path_rate": 0.0, "num_classes": 4, "cls_dim": 10,
        "feature_blocks": [0, 1],
    })
    mesh = make_mesh()
    rng = np.random.RandomState(2)
    pts_host = rng.randn(B, N, 3).astype(np.float32)
    cls_host = (np.arange(B) % 4).astype(np.int32)
    seg_host = rng.randint(0, 10, (B, N)).astype(np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts_host[:2]),
                           jnp.asarray(cls_host[:2]))
    tx = optax.adamw(1e-3)
    state = replicate_tree(mesh, create_train_state(variables, tx))
    step = make_seg_train_step(model, tx, augment=False)

    pts = shard_batch(mesh, pts_host)
    cls = shard_batch(mesh, cls_host)
    seg = shard_batch(mesh, seg_host)
    losses = []
    for i in range(steps):
        state, metrics = step(state, pts, cls, seg, jax.random.PRNGKey(200 + i))
        losses.append(float(jax.device_get(metrics["loss"])))
    return losses, _bn_digest(state.batch_stats)


def probe_features(rows=None):
    """The REAL SVM-probe feature path (``eval.svm.make_feature_fn`` pooled
    features) over a deterministic labelled set; ``rows`` restricts to this
    process's shard of the global set. Returns (features, labels) as numpy."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax  # noqa: F401

    from gm3d_tpu.eval.svm import make_feature_fn
    from gm3d_tpu.models.pointmae import PointMAE

    total, n = 8, 64
    model = PointMAE(trans_dim=64, depth=2, num_heads=2, decoder_depth=1,
                     decoder_num_heads=2, group_size=8, num_group=8,
                     encoder_dims=64, drop_path_rate=0.0)
    rng = np.random.RandomState(3)
    pts = rng.randn(total, n, 3).astype(np.float32)
    labels = (np.arange(total) % 2).astype(np.int64)
    mask0 = jnp.zeros((2, 8), bool)
    variables = model.init(jax.random.PRNGKey(7), jnp.asarray(pts[:2]), mask0, 0)
    if rows is not None:
        pts, labels = pts[rows], labels[rows]
    feature_fn = make_feature_fn(model, npoints=n)
    feats = np.asarray(jax.device_get(feature_fn(variables, jnp.asarray(pts))),
                       np.float32)
    return feats, labels
