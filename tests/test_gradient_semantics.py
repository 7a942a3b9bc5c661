"""Gradient-flow parity tests.

The reference computes the complete-to-partial Chamfer branch inside
torch.no_grad() (``engine_pretrain_Classifier_SVM.py:140-147``) — the Chamfer
term (weighted x1000!) must contribute NO gradient to the student; only the
feature MSE and the learning loss do. Getting this wrong trains a different
model (docs/DESIGN.md §3)."""

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.models import GM3DStudent, PointMAE
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.pretrain import make_gm3d_train_step
from gm3d_tpu.train.state import create_train_state

SMALL = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1, decoder_num_heads=2,
             group_size=8, num_group=16, encoder_dims=48)
B, N = 4, 128


def build(seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)
    student = GM3DStudent(**SMALL)
    teacher = PointMAE(**SMALL)
    num_mask = 10
    mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
    svars = student.init(jax.random.key(0), pts, mask0, num_mask)
    tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
    tx = build_adamw(1e-3)
    return student, teacher, svars, tvars, tx, pts


def test_chamfer_branch_carries_no_gradient():
    student, teacher, svars, tvars, tx, pts = build()
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16)

    def run(w_cd):
        state = create_train_state(svars, tx, with_ema=True)
        scalars = {
            "keep_ratio": jnp.asarray(0.5),
            "ema_decay": jnp.asarray(0.999),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(w_cd),
        }
        new_state, metrics = step(state, tvars, pts, jax.random.key(3), scalars)
        return new_state, metrics

    s_zero, m_zero = run(0.0)
    s_huge, m_huge = run(1e6)
    # loss VALUES differ wildly...
    assert abs(float(m_huge["loss"]) - float(m_zero["loss"])) > 1.0
    # ...but the parameter update is identical: chamfer is stop-gradiented
    p0 = np.asarray(jax.tree.leaves(s_zero.params)[0])
    p1 = np.asarray(jax.tree.leaves(s_huge.params)[0])
    np.testing.assert_allclose(p0, p1, atol=1e-7)


def test_mse_branch_does_carry_gradient():
    student, teacher, svars, tvars, tx, pts = build(1)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16)

    def run(w_mse):
        state = create_train_state(svars, tx, with_ema=True)
        scalars = {
            "keep_ratio": jnp.asarray(0.5),
            "ema_decay": jnp.asarray(0.999),
            "w_mse": jnp.asarray(w_mse),
            "w_cd": jnp.asarray(0.0),
        }
        return step(state, tvars, pts, jax.random.key(3), scalars)[0]

    s_lo = run(0.0)
    s_hi = run(100.0)
    p0 = np.asarray(jax.tree.leaves(s_lo.params)[0])
    p1 = np.asarray(jax.tree.leaves(s_hi.params)[0])
    assert np.abs(p0 - p1).max() > 1e-6


def test_teacher_receives_no_update():
    """The teacher is frozen: its variables pass through the step untouched
    (they are inputs, not state) — verify the step's output state contains no
    teacher entries and teacher vars are unchanged by reference semantics."""
    student, teacher, svars, tvars, tx, pts = build(2)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16)
    before = np.asarray(jax.tree.leaves(tvars["params"])[0]).copy()
    state = create_train_state(svars, tx, with_ema=True)
    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(1.0),
        "w_cd": jnp.asarray(1.0),
    }
    step(state, tvars, pts, jax.random.key(0), scalars)
    np.testing.assert_array_equal(before, np.asarray(jax.tree.leaves(tvars["params"])[0]))


def test_knn_probe_and_multihost_gather():
    from gm3d_tpu.eval.knn import knn_classifier
    from gm3d_tpu.parallel import gather_features

    rng = np.random.default_rng(0)
    f_tr = np.concatenate([rng.normal(0, .2, (40, 8)), rng.normal(2, .2, (40, 8))]).astype(np.float32)
    l_tr = np.array([0] * 40 + [1] * 40)
    f_te = np.concatenate([rng.normal(0, .2, (10, 8)), rng.normal(2, .2, (10, 8))]).astype(np.float32)
    l_te = np.array([0] * 10 + [1] * 10)
    assert knn_classifier(f_tr, l_tr, f_te, l_te, k=5) == 1.0
    # single-process gather is the identity
    g_f, g_l = gather_features(f_tr, l_tr)
    np.testing.assert_array_equal(g_f, f_tr)
    np.testing.assert_array_equal(g_l, l_tr)


def test_step_is_deterministic_given_seed():
    """Same state + same rng key -> bitwise-identical updates (reproducible
    training, unlike the reference's host-numpy mask shuffles)."""
    student, teacher, svars, tvars, tx, pts = build(3)
    step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16)
    scalars = {
        "keep_ratio": jnp.asarray(0.5),
        "ema_decay": jnp.asarray(0.999),
        "w_mse": jnp.asarray(1.0),
        "w_cd": jnp.asarray(1.0),
    }
    s1, m1 = step(create_train_state(svars, tx, with_ema=True), tvars, pts,
                  jax.random.key(42), scalars)
    s2, m2 = step(create_train_state(svars, tx, with_ema=True), tvars, pts,
                  jax.random.key(42), scalars)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(s1.params)[0]), np.asarray(jax.tree.leaves(s2.params)[0])
    )
    assert float(m1["loss"]) == float(m2["loss"])


def test_m2ae_pretrain_to_classifier_overlay():
    """M2AE pretrain encoder weights transfer into the classifier by
    name+shape overlay (the finetune surgery)."""
    from gm3d_tpu.models import PointM2AE, PointM2AEClassifier

    kw = dict(num_groups=(32, 16, 8), group_sizes=(8, 4, 4), encoder_depths=(1, 1, 1),
              encoder_dims=(24, 48, 96), local_radius=(0.32, 0.64, 1.28), num_heads=2)
    pre = PointM2AE(decoder_dims=(96, 48), decoder_depths=(1, 1), **kw)
    cls = PointM2AEClassifier(cls_dim=5, **kw)
    pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 3)).astype(np.float32))
    vis = jnp.ones((2, 8), bool)
    pvars = pre.init(jax.random.key(0), pts, vis)
    cvars = cls.init(jax.random.key(1), pts)

    def overlay(dst, src):
        n = 0
        for k, v in src.items():
            if isinstance(v, dict):
                if isinstance(dst.get(k), dict):
                    n += overlay(dst[k], v)
            elif k in dst and np.asarray(dst[k]).shape == np.asarray(v).shape:
                dst[k] = v
                n += 1
        return n

    cparams = jax.tree.map(lambda x: x, cvars["params"])
    transferred = overlay(cparams, pvars["params"])
    assert transferred > 20  # encoder weights moved
    enc_leaf = cparams["encoder"]["stage0"]["block0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(enc_leaf),
        np.asarray(pvars["params"]["encoder"]["stage0"]["block0"]["attn"]["qkv"]["kernel"]),
    )


class TestSeparatedOptimizer:
    """--shared_opt False (reference train_one_epoch_seperated,
    engine_pretrain_Classifier_SVM.py:335-642 + main_pretrain.py:414-440):
    recon optimizer owns encoder/decoder/coord head, loss-pred optimizer owns
    the loss-pred decoder/feature head, everything else is frozen, and the
    learning loss never updates the encoder."""

    def test_labels_partition(self):
        from gm3d_tpu.train.optim import gm3d_separated_labels

        student, _, svars, _, _, _ = build()
        labels = gm3d_separated_labels(svars["params"])
        tops = {k: set(jax.tree.leaves(v)) for k, v in labels.items()}
        assert tops["MAE_encoder"] == {"recon"}
        assert tops["MAE_decoder"] == {"recon"}
        assert tops["coord_head"] == {"recon"}
        assert tops["MAE_decoder_loss_pred"] == {"loss_pred"}
        assert tops["head_fc1"] == tops["head_fc2"] == {"loss_pred"}
        assert tops["decoder_pos_embed"] == {"frozen"}
        assert tops["mask_token"] == tops["mask_token_loss_pred"] == {"frozen"}

    def test_learning_loss_never_reaches_encoder(self):
        """grad of loss_pred w.r.t. encoder params is zero with the detached
        branch, nonzero without."""
        student, _, svars, _, _, pts = build()
        num_mask = 10
        mask = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)

        def lp_sum(params, detach):
            out = student.apply({"params": params, "batch_stats": svars["batch_stats"]},
                                pts, mask, num_mask,
                                detach_loss_pred_branch=detach)
            return jnp.sum(out["loss_pred"] ** 2)

        g_detached = jax.grad(lambda p: lp_sum(p, True))(svars["params"])
        g_attached = jax.grad(lambda p: lp_sum(p, False))(svars["params"])
        enc_detached = np.max(np.abs(np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(g_detached["MAE_encoder"])])))
        enc_attached = np.max(np.abs(np.concatenate(
            [np.ravel(x) for x in jax.tree.leaves(g_attached["MAE_encoder"])])))
        assert enc_detached == 0.0
        assert enc_attached > 0.0
        # loss-pred decoder grads are identical in both modes
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(g_detached["MAE_decoder_loss_pred"])[0]),
            np.asarray(jax.tree.leaves(g_attached["MAE_decoder_loss_pred"])[0]),
            rtol=1e-6)

    def test_separated_step_updates_disjoint_subsets(self):
        from gm3d_tpu.train.optim import build_gm3d_separated_optimizer

        student, teacher, svars, tvars, _, pts = build()
        tx = build_gm3d_separated_optimizer(svars["params"], 1e-3)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16,
                                    shared_opt=False)
        state = create_train_state(svars, tx, with_ema=True)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999),
                   "w_mse": jnp.asarray(1.0), "w_cd": jnp.asarray(1.0)}
        new_state, metrics = step(state, tvars, pts, jax.random.key(3), scalars)

        def delta(tree_a, tree_b):
            return max(float(jnp.max(jnp.abs(a - b)))
                       for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)))

        p0, p1 = svars["params"], new_state.params
        # frozen in the separated path (in neither reference param group)
        assert delta(p0["decoder_pos_embed"], p1["decoder_pos_embed"]) == 0.0
        assert delta(p0["mask_token"], p1["mask_token"]) == 0.0
        assert delta(p0["mask_token_loss_pred"], p1["mask_token_loss_pred"]) == 0.0
        # both optimizers actually step their own subsets
        assert delta(p0["MAE_encoder"], p1["MAE_encoder"]) > 0.0
        assert delta(p0["MAE_decoder"], p1["MAE_decoder"]) > 0.0
        assert delta(p0["MAE_decoder_loss_pred"], p1["MAE_decoder_loss_pred"]) > 0.0
        assert delta(p0["head_fc1"], p1["head_fc1"]) > 0.0
        assert float(metrics["loss"]) == float(metrics["loss"])  # finite
