"""Batch-floor (compile-shape floor) transparency tests.

The axon TPU compiler SIGABRTs on the transformer graphs at batch <= 64
(CLAUDE.md), which blocks the reference's small-batch recipes: few-shot
episodes are way*shot = 50 clouds (``cfgs/fewshot.yaml``), the ScanObjectNN
finetune config uses bs=32, and ragged trailing eval batches can be any
size. ``train.finetune.floor_reps`` tiles such batches with exact copies
inside the jit; these tests pin that the tiling is numerically transparent —
training trajectories, eval logits, vote logits, and (via the
``bn_replica_tiling`` Bessel hook) BatchNorm running stats all match the
untiled run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models.point_transformer import PointTransformer
from gm3d_tpu.train import finetune as ft
from gm3d_tpu.train.optim import build_legacy_adamw
from gm3d_tpu.train.state import create_train_state

B, N, CLS = 4, 1024, 5
FLOOR = 8  # reps = 2


def _small_model(**kw):
    return PointTransformer(
        trans_dim=48, depth=2, num_heads=2, cls_dim=CLS, group_size=8,
        num_group=16, encoder_dims=48,
        drop_path_rate=kw.pop("drop_path_rate", 0.0),
        dropout=kw.pop("dropout", 0.0), **kw,
    )


def _data(seed=0, batch=B):
    rng = np.random.RandomState(seed)
    pts = rng.randn(batch, N, 3).astype(np.float32)
    labels = rng.randint(0, CLS, size=batch).astype(np.int64)
    return jnp.asarray(pts), jnp.asarray(labels)


def test_floor_reps():
    assert ft.floor_reps(50, 128) == 3
    assert ft.floor_reps(32, 128) == 4
    assert ft.floor_reps(64, 128) == 2
    assert ft.floor_reps(128, 128) == 1
    assert ft.floor_reps(200, 128) == 1
    assert ft.floor_reps(4, 0) == 1  # disabled


def test_train_step_floor_transparent():
    """3 deterministic train steps: floored == unfloored (params, BN running
    stats incl. the Bessel correction, opt metrics) to fp32 reduction noise.

    SGD at a tiny lr, not Adam, on purpose. The tiled batch reduces in a
    different order, which leaves ~3e-5 relative fp32 reassociation noise on
    the gradients (BN-backward is cancellation-heavy). Under Adam, elements
    with near-zero gradients then step +-lr with a ROUNDING-DETERMINED sign
    (the effect documented by the reference-trajectory harness, CLAUDE.md);
    at training-scale lr the random-init conv gradients (~70) make the
    trajectory chaotic enough to amplify the noise 10x/step either way. A
    perturbation-theory-safe lr keeps the 3-step diff at noise scale, so the
    assertion pins step transparency — loss, gradients, and BN running stats
    (the bn_replica_tiling Bessel hook) — not optimizer chaos."""
    import optax

    model = _small_model()
    pts, labels = _data()
    variables = model.init(jax.random.key(0), pts)

    def run(floor):
        tx = optax.sgd(1e-6)
        state = create_train_state(variables, tx)
        step = ft.make_finetune_train_step(
            model, tx, npoints=N, smoothing=0.0, augment=False,
            batch_floor=floor,
        )
        rng = jax.random.key(1)
        metrics = None
        for i in range(3):
            rng, key = jax.random.split(rng)
            p, l = _data(seed=i + 1)
            state, metrics = step(state, p, l, key)
        return state, metrics

    s0, m0 = run(0)
    s1, m1 = run(FLOOR)
    # param diff bound: 3 steps x lr 1e-6 x grad-noise ~2e-3 abs -> ~1e-8
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    # running stats pin the bn_replica_tiling Bessel hook: without it the
    # head-BN running_var would be off by (n/(n-1))/((2n)/(2n-1)) ~ 14% at n=4
    for a, b in zip(jax.tree.leaves(s0.batch_stats), jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m0["acc"]) == pytest.approx(float(m1["acc"]), abs=1e-6)


def test_eval_step_floor_transparent():
    model = _small_model()
    pts, _ = _data()
    variables = model.init(jax.random.key(0), pts)
    logits0 = ft.make_eval_step(model, npoints=N)(variables, pts)
    logits1 = ft.make_eval_step(model, npoints=N, batch_floor=FLOOR)(variables, pts)
    assert logits1.shape == (B, CLS)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1),
                               rtol=1e-5, atol=1e-6)


def test_vote_eval_step_floor_transparent():
    """Vote subsample/augment draw on the UNTILED batch, so the floored vote
    is exact, not just statistically equivalent."""
    model = _small_model()
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(B, 1200, 3).astype(np.float32))
    variables = model.init(jax.random.key(0), pts[:, :N])
    key = jax.random.key(7)
    v0 = ft.make_vote_eval_step(model, npoints=N, times=3)(variables, pts, key)
    v1 = ft.make_vote_eval_step(model, npoints=N, times=3, batch_floor=FLOOR)(
        variables, pts, key)
    assert v1.shape == (B, CLS)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-5, atol=1e-6)


def test_seg_step_floor_transparent():
    """Seg train + eval steps under the floor (SGD for the same reason as the
    classification trajectory test)."""
    import optax

    from gm3d_tpu.models.segmentation import PointMAESeg
    from gm3d_tpu.train import segmentation as seg

    model = PointMAESeg(trans_dim=48, depth=2, num_heads=2, group_size=8,
                        num_group=16, encoder_dims=48, drop_path_rate=0.0,
                        dropout_rate=0.0, feature_blocks=(0, 1), num_parts=10)
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.randn(B, 256, 3).astype(np.float32))
    cls_label = jnp.asarray(rng.randint(0, 16, size=B))
    seg_label = jnp.asarray(rng.randint(0, 10, size=(B, 256)))
    variables = model.init(jax.random.key(0), pts, cls_label)

    def run(floor):
        tx = optax.sgd(1e-6)  # perturbation-safe lr, see the test above
        state = create_train_state(variables, tx)
        step = seg.make_seg_train_step(model, tx, augment=False, batch_floor=floor)
        state, metrics = step(state, pts, cls_label, seg_label, jax.random.key(3))
        return state, metrics

    s0, m0 = run(0)
    s1, m1 = run(FLOOR)
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    assert float(m0["acc"]) == pytest.approx(float(m1["acc"]), abs=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree.leaves(s0.batch_stats), jax.tree.leaves(s1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    logits0 = seg.make_seg_eval_step(model)(variables, pts, cls_label)
    logits1 = seg.make_seg_eval_step(model, batch_floor=FLOOR)(variables, pts, cls_label)
    assert logits1.shape == logits0.shape
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1),
                               rtol=1e-5, atol=1e-6)


def test_feature_fn_floor_transparent():
    """SVM/kNN/linprob featurizer under the floor (ragged last probe batch):
    deterministic encoder forward, tiled + sliced back — exact."""
    from gm3d_tpu.eval.svm import make_feature_fn
    from gm3d_tpu.models.gm3d import GM3DStudent

    model = GM3DStudent(trans_dim=48, depth=2, num_heads=2, decoder_depth=1,
                        decoder_num_heads=2, group_size=8, num_group=16,
                        drop_path_rate=0.0, encoder_dims=48)
    rng = np.random.RandomState(11)
    pts = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
    num_mask = 10
    mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
    variables = model.init(jax.random.key(0), pts, mask0, num_mask)
    f0 = make_feature_fn(model, N)(variables, pts)
    f1 = make_feature_fn(model, N, FLOOR)(variables, pts)
    assert f1.shape == f0.shape
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), rtol=1e-5, atol=1e-6)


def test_train_step_floor_with_stochastic_regularizers():
    """With dropout/droppath active the floored step averages over per-copy
    mask draws (same expectation, not bitwise) — it must still run and stay
    finite, and big batches must be untouched (reps == 1 path)."""
    model = _small_model(dropout=0.5, drop_path_rate=0.1)
    pts, labels = _data()
    variables = model.init(jax.random.key(0), pts)
    tx = build_legacy_adamw(1e-3, 0.05)
    state = create_train_state(variables, tx)
    step = ft.make_finetune_train_step(
        model, tx, npoints=N, smoothing=0.0, augment=True, batch_floor=FLOOR)
    state, metrics = step(state, pts, labels, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    # floor <= batch: identical builder path must not tile
    big_pts, big_labels = _data(seed=9, batch=FLOOR)
    step_big = ft.make_finetune_train_step(
        model, tx, npoints=N, smoothing=0.0, augment=True, batch_floor=FLOOR)
    state2 = create_train_state(model.init(jax.random.key(1), big_pts), tx)
    state2, m2 = step_big(state2, big_pts, big_labels, jax.random.key(3))
    assert np.isfinite(float(m2["loss"]))
