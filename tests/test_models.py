"""Shape/dtype golden tests for each model forward (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models import (
    GM3DStudent,
    PointMAE,
    PointM2AE,
    PointM2AEClassifier,
    PointTransformer,
    Classifier,
)

B, N, G, S, D = 2, 256, 64, 32, 384


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, N, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1).max(axis=-1, keepdims=True)[..., None]
    return jnp.asarray(x)


def random_mask(num_mask, key=0):
    rng = np.random.default_rng(key)
    mask = np.zeros((B, G), bool)
    for i in range(B):
        mask[i, rng.choice(G, num_mask, replace=False)] = True
    return jnp.asarray(mask)


class TestPointMAE:
    @pytest.fixture(scope="class")
    def model_vars(self, pts):
        model = PointMAE()
        mask = random_mask(38)
        variables = model.init(jax.random.key(0), pts, mask, 38)
        return model, variables

    def test_pretrain_forward_shapes(self, pts, model_vars):
        model, variables = model_vars
        mask = random_mask(38)
        out = model.apply(variables, pts, mask, 38)
        assert out["rebuild"].shape == (B, 38, S, 3)
        assert out["gt"].shape == (B, 38, S, 3)
        assert out["x_vis"].shape == (B, G - 38, D)

    def test_encode_features(self, pts, model_vars):
        model, variables = model_vars
        feats = model.apply(variables, pts, method=model.encode_features)
        assert feats.shape == (B, G, D)

    def test_decode_replay(self, pts, model_vars):
        model, variables = model_vars
        tokens = jnp.ones((B, 10, D))
        centers = jnp.zeros((B, 10, 3))
        out = model.apply(variables, tokens, centers, method=model.decode_replay)
        assert out.shape == (B, 10, S, 3)

    def test_mask_order_matches_boolean_indexing(self, pts, model_vars):
        from gm3d_tpu.models.pointmae import mask_split_indices

        mask = random_mask(38, key=7)
        vis_idx, mask_idx = mask_split_indices(mask, 38)
        m = np.asarray(mask)
        for b in range(B):
            np.testing.assert_array_equal(np.asarray(vis_idx)[b], np.where(~m[b])[0])
            np.testing.assert_array_equal(np.asarray(mask_idx)[b], np.where(m[b])[0])


class TestGM3DStudent:
    @pytest.fixture(scope="class")
    def model_vars(self, pts):
        model = GM3DStudent()
        mask = random_mask(38)
        variables = model.init(jax.random.key(0), pts, mask, 38)
        return model, variables

    def test_masked_forward(self, pts, model_vars):
        model, variables = model_vars
        mask = random_mask(38)
        out = model.apply(variables, pts, mask, 38)
        assert out["pix_pred"].shape == (B, G, D)  # full sequence, feature mode
        assert out["loss_pred"].shape == (B, G)
        assert out["features"].shape == (B, G - 38, D)
        assert out["neighborhood"].shape == (B, G, S, 3)
        assert out["rebuild_points"].shape == (B, G, 3 * S)

    def test_ema_unmasked_forward(self, pts, model_vars):
        model, variables = model_vars
        mask = jnp.zeros((B, G), bool)
        out = model.apply(variables, pts, mask, 0)
        assert out["loss_pred"].shape == (B, G)
        assert out["features"].shape == (B, G, D)
        # unmasked pass: vis order is the original group order
        np.testing.assert_array_equal(
            np.asarray(out["vis_idx"]), np.tile(np.arange(G), (B, 1))
        )

    def test_shared_learnable_tokens(self, pts, model_vars):
        model, variables = model_vars
        mask = random_mask(38)
        out = model.apply(variables, pts, mask, 38, shared_learnable_tokens=True)
        assert out["loss_pred"].shape == (B, G)

    def test_train_mode_runs(self, pts, model_vars):
        model, variables = model_vars
        mask = random_mask(38)
        out, updates = model.apply(
            variables,
            pts,
            mask,
            38,
            deterministic=False,
            rngs={"dropout": jax.random.key(1), "droppath": jax.random.key(2)},
            mutable=["batch_stats"],
        )
        assert "batch_stats" in updates


class TestPointTransformer:
    def test_logits(self, pts):
        model = PointTransformer(cls_dim=40)
        variables = model.init(jax.random.key(0), pts)
        logits = model.apply(variables, pts)
        assert logits.shape == (B, 40)

    def test_probe_classifier(self):
        feats = jnp.ones((B, G, D))
        model = Classifier(cls_dim=40)
        variables = model.init(jax.random.key(0), feats)
        out = model.apply(variables, feats)
        assert out.shape == (B, 40)


class TestPointM2AE:
    # shrunken hierarchy for test speed
    kw = dict(
        num_groups=(64, 32, 16),
        group_sizes=(8, 4, 4),
        encoder_depths=(1, 1, 1),
        encoder_dims=(24, 48, 96),
        local_radius=(0.32, 0.64, 1.28),
        decoder_dims=(96, 48),
        decoder_depths=(1, 1),
    )

    def test_pretrain_forward(self, pts):
        model = PointM2AE(**self.kw)
        coarse_vis = random_mask(3, key=1)[:, :16] == False  # noqa: E712 — (B,16) bool
        variables = model.init(jax.random.key(0), pts, coarse_vis)
        out = model.apply(variables, pts, coarse_vis)
        assert out["rebuild"].shape == (B, 64, 8, 3)
        assert out["gt"].shape == (B, 64, 8, 3)
        assert out["fine_vis"].shape == (B, 64)

    def test_mask_propagation_consistency(self, pts):
        from gm3d_tpu.models.m2ae import propagate_masks
        from gm3d_tpu.ops.fps import fps_gather, fps_indices

        c0 = fps_gather(pts, fps_indices(pts, 64))
        c1 = fps_gather(c0, fps_indices(c0, 32))
        c2 = fps_gather(c1, fps_indices(c1, 16))
        coarse = jnp.asarray(np.random.default_rng(2).random((B, 16)) > 0.8)
        vis = propagate_masks(coarse, [c0, c1, c2])
        assert vis[0].shape == (B, 64) and vis[1].shape == (B, 32)
        np.testing.assert_array_equal(np.asarray(vis[2]), np.asarray(coarse))

    def test_classifier(self, pts):
        model = PointM2AEClassifier(cls_dim=15, **{k: v for k, v in self.kw.items() if not k.startswith("decoder")})
        variables = model.init(jax.random.key(0), pts)
        logits = model.apply(variables, pts)
        assert logits.shape == (B, 15)

    def test_classifier_pools_all_scales(self, pts):
        """Public Point-M2AE concatenates multi-scale mean+max features; the
        head input must be 2 * sum(encoder_dims), not 2 * dims[-1]."""
        model = PointM2AEClassifier(cls_dim=15, **{k: v for k, v in self.kw.items() if not k.startswith("decoder")})
        variables = model.init(jax.random.key(0), pts)
        fc1_in = variables["params"]["head_fc1"]["kernel"].shape[0]
        assert fc1_in == 2 * sum(self.kw["encoder_dims"])

    def test_decoder_up_blocks_consumed(self, pts):
        """decoder_up_blocks must create real decoder params (round-1 dead
        knob) and change the forward when varied."""
        coarse_vis = random_mask(3, key=1)[:, :16] == False  # noqa: E712

        m1 = PointM2AE(**self.kw, decoder_up_blocks=(1, 1))
        v1 = m1.init(jax.random.key(0), pts, coarse_vis)
        assert "dec_up0" in v1["params"] and "dec_up1" in v1["params"]
        # depth-2 up stage has one more block than depth-1
        m2 = PointM2AE(**self.kw, decoder_up_blocks=(2, 1))
        v2 = m2.init(jax.random.key(0), pts, coarse_vis)
        assert "block1" in v2["params"]["dec_up0"]
        assert "block1" not in v1["params"]["dec_up0"]

    def test_seg_forward(self, pts):
        """Per-point part logits from the hierarchical encoder; the head input
        concatenates per-scale propagated features, multi-scale global
        pooling, the class embedding, and raw coords."""
        from gm3d_tpu.models import PointM2AESeg

        enc_kw = {k: v for k, v in self.kw.items() if not k.startswith("decoder")}
        model = PointM2AESeg(**enc_kw)
        cls = jnp.asarray([0, 5], jnp.int32)
        variables = model.init(jax.random.key(0), pts, cls)
        logits = model.apply(variables, pts, cls, deterministic=True)
        assert logits.shape == (B, N, 50)
        assert np.isfinite(np.asarray(logits)).all()
        # global pooling covers every scale (mean+max per scale)
        prop_in = variables["params"]["prop_proj"]["kernel"].shape[0]
        assert prop_in == sum(self.kw["encoder_dims"])

    def test_seg_transfer_from_pretrain(self, pts):
        """The M2AE pretrain checkpoint's ``encoder`` subtree overlays onto
        the seg model with no surgery (both trees root it at ``encoder``)."""
        from gm3d_tpu.ckpt.transfer import overlay_pretrained
        from gm3d_tpu.models import PointM2AESeg

        enc_kw = {k: v for k, v in self.kw.items() if not k.startswith("decoder")}
        seg = PointM2AESeg(**enc_kw)
        cls = jnp.zeros((B,), jnp.int32)
        sv = seg.init(jax.random.key(0), pts, cls)
        pre = PointM2AE(**self.kw)
        coarse_vis = random_mask(3, key=1)[:, :16] == False  # noqa: E712
        pv = pre.init(jax.random.key(1), pts, coarse_vis)
        params, _, n = overlay_pretrained(
            sv["params"], sv.get("batch_stats"), pv["params"], pv.get("batch_stats")
        )
        enc_leaves = len(jax.tree.leaves(pv["params"]["encoder"]))
        assert n >= enc_leaves  # every encoder leaf transferred
        np.testing.assert_array_equal(
            np.asarray(params["encoder"]["stage0"]["block0"]["attn"]["qkv"]["kernel"]),
            np.asarray(pv["params"]["encoder"]["stage0"]["block0"]["attn"]["qkv"]["kernel"]),
        )
