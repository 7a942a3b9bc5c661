"""Loss-formula oracle tests: the GM3D losses recomputed in raw numpy from
the reference's formulas (``...feature_besed.py:976-1140``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.train.losses import (
    classification_loss,
    gm3d_feature_loss,
    mse_learning_loss,
    relative_learning_loss,
)


class TestRelativeLearningLoss:
    def numpy_reference(self, pred, target):
        # reference forward_learning_loss, relative=True (:1120-1130)
        pos = (target[:, :, None] > target[:, None, :]).astype(np.float64)
        neg = (target[:, :, None] < target[:, None, :]).astype(np.float64)
        diff = pred[:, :, None] - pred[:, None, :]
        sig = 1 / (1 + np.exp(-diff))
        loss = -pos * np.log(sig + 1e-6) - neg * np.log(1 - sig + 1e-6)
        return loss.sum() / (pos + neg).sum()

    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pred = rng.standard_normal((3, 10)).astype(np.float32)
        target = rng.standard_normal((3, 10)).astype(np.float32)
        got = float(relative_learning_loss(jnp.asarray(pred), jnp.asarray(target)))
        want = self.numpy_reference(pred.astype(np.float64), target.astype(np.float64))
        assert got == pytest.approx(want, rel=1e-4)

    def test_perfect_ordering_low_loss(self):
        target = np.arange(8.0)[None].astype(np.float32)
        pred_good = target * 10.0
        pred_bad = -pred_good
        good = float(relative_learning_loss(jnp.asarray(pred_good), jnp.asarray(target)))
        bad = float(relative_learning_loss(jnp.asarray(pred_bad), jnp.asarray(target)))
        assert good < 0.01
        assert bad > 5.0


class TestMseLearningLoss:
    def test_normalised_target(self):
        rng = np.random.default_rng(1)
        target = rng.standard_normal((2, 16)).astype(np.float32) * 5 + 3
        mean = target.mean(1, keepdims=True)
        # torch.Tensor.var (the reference, ...feature_besed.py:1135) is UNBIASED
        var = target.var(1, keepdims=True, ddof=1)
        normed = (target - mean) / np.sqrt(var + 1e-6)
        got = float(mse_learning_loss(jnp.asarray(normed), jnp.asarray(target)))
        assert got == pytest.approx(0.0, abs=1e-5)


class TestFeatureLoss:
    def test_matches_numpy(self):
        rng = np.random.default_rng(2)
        B, G, M, S, D = 2, 8, 3, 4, 16
        pred = rng.standard_normal((B, M, D)).astype(np.float32)
        teacher = rng.standard_normal((B, G, D)).astype(np.float32)
        mask_idx = np.stack([rng.choice(G, M, replace=False) for _ in range(B)]).astype(np.int32)
        mask_idx.sort(axis=1)
        pt = rng.standard_normal((B, G, S, 3)).astype(np.float32)
        pr = rng.standard_normal((B, M, S, 3)).astype(np.float32)
        out = gm3d_feature_loss(
            jnp.asarray(pred), jnp.asarray(teacher), jnp.asarray(mask_idx),
            jnp.asarray(pt), jnp.asarray(pr),
        )
        # numpy: normalized-MSE part (:983-985)
        tsel = np.take_along_axis(teacher, mask_idx[..., None], 1)
        pn = pred / np.linalg.norm(pred, axis=-1, keepdims=True)
        tn = tsel / np.linalg.norm(tsel, axis=-1, keepdims=True)
        mse = ((pn - tn) ** 2).sum(-1)
        assert float(out["MSE_mean"]) == pytest.approx(float(mse.mean()), rel=1e-4)
        # chamfer part: symmetric per-group mean of per-point squared NN dists
        ptsel = np.take_along_axis(pt, mask_idx[..., None, None], 1)
        cd = np.zeros((B, M))
        for b in range(B):
            for m in range(M):
                d = ((pr[b, m][:, None] - ptsel[b, m][None]) ** 2).sum(-1)
                cd[b, m] = d.min(1).mean() + d.min(0).mean()
        assert float(out["Chamfer_mean"]) == pytest.approx(float(cd.mean()), rel=1e-3)
        np.testing.assert_allclose(np.asarray(out["matrix"]), mse + cd, rtol=1e-3)


class TestClassificationLoss:
    def test_smoothing(self):
        logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
        labels = jnp.asarray([0, 1])
        l0, acc = classification_loss(logits, labels, 0.0)
        l_sm, _ = classification_loss(logits, labels, 0.3)
        assert float(acc) == 100.0
        assert float(l_sm) > float(l0)


class TestSeparatePointCloud:
    def test_crop_shapes(self):
        import jax

        from gm3d_tpu.data.transforms import separate_point_cloud

        pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100, 3)).astype(np.float32))
        keep, crop = separate_point_cloud(jax.random.key(0), pts, 30)
        assert keep.shape == (2, 70, 3)
        assert crop.shape == (2, 30, 3)


class TestTorchExport:
    def test_roundtrip(self):
        import jax

        from gm3d_tpu.ckpt.torch_import import (
            POINT_TRANSFORMER_MAP,
            export_torch_checkpoint,
            import_torch_checkpoint,
        )
        from gm3d_tpu.models import PointTransformer

        model = PointTransformer(trans_dim=48, depth=2, num_heads=2, cls_dim=5,
                                 group_size=8, num_group=16, encoder_dims=48)
        variables = model.init(jax.random.key(0), jnp.zeros((2, 64, 3)))
        sd = export_torch_checkpoint(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            POINT_TRANSFORMER_MAP,
        )
        back = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        assert back["_unmatched"] == []
        leaf_a = variables["params"]["blocks"]["block0"]["attn"]["qkv"]["kernel"]
        leaf_b = back["params"]["blocks"]["block0"]["attn"]["qkv"]["kernel"]
        np.testing.assert_allclose(np.asarray(leaf_a), leaf_b, rtol=1e-6)


class TestLinearProbe:
    def test_separable_features(self):
        from gm3d_tpu.eval.linear_probe import linear_probe

        rng = np.random.default_rng(0)
        f_tr = np.concatenate([rng.normal(0, .2, (60, 16)), rng.normal(2, .2, (60, 16))]).astype(np.float32)
        l_tr = np.array([0] * 60 + [1] * 60)
        f_te = np.concatenate([rng.normal(0, .2, (20, 16)), rng.normal(2, .2, (20, 16))]).astype(np.float32)
        l_te = np.array([0] * 20 + [1] * 20)
        # 120 samples -> 1 step/epoch; give LARS enough steps to converge
        acc = linear_probe(f_tr, l_tr, f_te, l_te, epochs=500)
        assert acc > 0.95


class TestLayerDecay:
    def test_flat_encoder_scales(self):
        import jax

        from gm3d_tpu.models import PointTransformer
        from gm3d_tpu.train.optim import layerwise_lr_decay_scales

        model = PointTransformer(trans_dim=48, depth=2, num_heads=2, cls_dim=5,
                                 group_size=8, num_group=16, encoder_dims=48)
        variables = model.init(jax.random.key(0), jnp.zeros((2, 64, 3)))
        scales = layerwise_lr_decay_scales(variables["params"], decay=0.75)
        # Reference-EFFECTIVE mapping (util/lr_decay.py:64-76 matches image-ViT
        # names): head, patch embed, pos_embed, cls_pos all fall to the else
        # branch -> full lr; only exact 'cls_token' gets layer 0; num_layers
        # is hardcoded 12 regardless of the model's depth.
        assert scales["cls_head_finetune"]["fc3"]["kernel"] == pytest.approx(1.0)
        assert scales["encoder"]["conv1"]["kernel"] == pytest.approx(1.0)
        assert scales["pos_embed"]["fc1"]["kernel"] == pytest.approx(1.0)
        assert scales["cls_pos"] == pytest.approx(1.0)
        assert scales["cls_token"] == pytest.approx(0.75 ** 12)
        b0 = scales["blocks"]["block0"]["attn"]["qkv"]["kernel"]
        b1 = scales["blocks"]["block1"]["attn"]["qkv"]["kernel"]
        assert b0 == pytest.approx(0.75 ** 11)
        assert b1 == pytest.approx(0.75 ** 10)

    def test_m2ae_hierarchical_scales_progressive(self):
        import jax

        from gm3d_tpu.models import PointM2AEClassifier
        from gm3d_tpu.train.optim import layerwise_lr_decay_scales

        model = PointM2AEClassifier(
            cls_dim=5, num_groups=(32, 16, 8), group_sizes=(8, 4, 4),
            encoder_depths=(2, 2, 2), encoder_dims=(24, 48, 96),
            local_radius=(0.32, 0.64, 1.28), num_heads=2)
        variables = model.init(jax.random.key(0), jnp.zeros((2, 64, 3)))
        scales = layerwise_lr_decay_scales(variables["params"], decay=0.75)
        enc = scales["encoder"]
        s0b0 = enc["stage0"]["block0"]["attn"]["qkv"]["kernel"]
        s0b1 = enc["stage0"]["block1"]["attn"]["qkv"]["kernel"]
        s2b1 = enc["stage2"]["block1"]["attn"]["qkv"]["kernel"]
        assert s0b0 < s0b1 < s2b1 <= 1.0
        # 6 blocks total -> deepest block scale = decay^1
        assert s2b1 == pytest.approx(0.75)
        assert scales["head_out"]["kernel"] == pytest.approx(1.0)


class TestFinetuneRecipe:
    """Recipe provenance resolution (docs/DESIGN.md §14): the published
    numbers came from TWO different finetune stacks — ModelNet/few-shot from
    the legacy runner (config lr verbatim), ScanObjectNN from the HPM main
    (blr*bs/256, layer decay) — and M2AE configs specify plain AdamW."""

    def _resolve(self, config, recipe="auto"):
        from types import SimpleNamespace

        from gm3d_tpu.cli.finetune import resolve_recipe
        from gm3d_tpu.config import cfg_from_yaml_file

        cfg = cfg_from_yaml_file(config)
        return resolve_recipe(SimpleNamespace(recipe=recipe), cfg)

    def test_modelnet_uses_legacy_stack(self):
        assert self._resolve("configs/pointmae/finetune_modelnet.yaml") == "legacy"

    def test_scanobjectnn_uses_hpm_stack(self):
        for split in ("hardest", "objbg", "objonly"):
            assert self._resolve(
                f"configs/pointmae/config_finetune_scan_{split}.yaml") == "hpm"

    def test_m2ae_scanobjectnn_is_hpm(self):
        # superseded round-3: the M2AE logs are MAE-json with blr ramps —
        # the M2AE published finetunes ran the HPM stack (DESIGN.md §14)
        assert self._resolve(
            "configs/m2ae/config_finetune_scan_hardest_PointM2AE.yaml") == "hpm"

    def test_explicit_override_wins(self):
        assert self._resolve(
            "configs/pointmae/finetune_modelnet.yaml", recipe="hpm") == "hpm"

    def test_hpm_effective_lr_matches_published_logs(self):
        """The ScanObjectNN logs peak at exactly blr*bs/256
        (obj_bg max train_lr 7.812e-5 at bs 40; hardest 1.562e-4 at bs 80)."""
        from gm3d_tpu.train.schedules import effective_lr

        assert effective_lr(5e-4, 40) == pytest.approx(7.8125e-5)
        assert effective_lr(5e-4, 80) == pytest.approx(1.5625e-4)

    def test_published_eff_bs_per_split(self):
        """The published hpm runs' effective bs (log-pinned per FAMILY:
        PMAE 40/64/80, M2AE 40/80/40 + modelnet 80) differs from every
        config's total_bs 64 — the lr scaling must use the log value, keyed
        on model NAME + dataset NAME + the nobg ROOT (DESIGN.md §14)."""
        from gm3d_tpu.cli.finetune import published_eff_bs
        from gm3d_tpu.config import cfg_from_yaml_file

        expected = {"objbg": 40, "objonly": 64, "hardest": 80}
        for split, bs in expected.items():
            cfg = cfg_from_yaml_file(
                f"configs/pointmae/config_finetune_scan_{split}.yaml")
            assert published_eff_bs(cfg) == bs, split
        assert published_eff_bs(
            cfg_from_yaml_file("configs/pointmae/finetune_modelnet.yaml")) is None

        m2ae_expected = {"objbg": 40, "objonly": 80, "hardest": 40}
        for split, bs in m2ae_expected.items():
            cfg = cfg_from_yaml_file(
                f"configs/m2ae/config_finetune_scan_{split}_PointM2AE.yaml")
            assert published_eff_bs(cfg) == bs, f"m2ae {split}"
        assert published_eff_bs(cfg_from_yaml_file(
            "configs/m2ae/finetune_modelnet_PointM2AE.yaml")) == 80

    def test_resolve_smoothing_hpm_is_plain_ce(self):
        """The reference HPM criterion is PLAIN CrossEntropyLoss — the
        LabelSmoothing branch is inside a dead triple-quoted block
        (main_finetune.py:369-377) and the published hpm logs' ~5e-4
        train_loss floors rule smoothing out. Legacy honors the config's
        model.smooth (M2AE few-shot 0.3); explicit --smoothing wins."""
        from gm3d_tpu.cli.finetune import resolve_smoothing
        from gm3d_tpu.config import cfg_from_yaml_file

        scan = cfg_from_yaml_file("configs/pointmae/config_finetune_scan_hardest.yaml")
        assert resolve_smoothing(None, "hpm", scan) == 0.0

        fewshot = cfg_from_yaml_file("configs/m2ae/fewshot-Point-M2AE.yaml")
        assert resolve_smoothing(None, "legacy", fewshot) == pytest.approx(0.3)

        mn40 = cfg_from_yaml_file("configs/pointmae/finetune_modelnet.yaml")
        assert resolve_smoothing(None, "legacy", mn40) == 0.0  # PMAE plain CE
        assert resolve_smoothing(0.2, "hpm", scan) == pytest.approx(0.2)

    def test_best_metrics_sidecar_roundtrip(self, tmp_path):
        """Resume restores best/best_vote so a worse post-resume epoch can't
        overwrite ckpt/best (tools/builder.py:109-115 restores best_metrics;
        without it the best checkpoint is silently destroyed)."""
        from gm3d_tpu.ckpt import load_best_metrics, save_best_metrics

        d = str(tmp_path / "ckpt")
        assert load_best_metrics(d) == {}  # fresh run: no sidecar
        save_best_metrics(d, {"best": 93.1, "best_vote": 94.0})
        restored = load_best_metrics(d)
        assert restored["best"] == pytest.approx(93.1)
        assert restored["best_vote"] == pytest.approx(94.0)
        save_best_metrics(d, {"best": 93.5, "best_vote": 94.0})
        assert load_best_metrics(d)["best"] == pytest.approx(93.5)

    def test_vote_gate_thresholds(self):
        """In-training vote trigger matches tools/runner_finetune.py:211-212:
        acc > 92.1 unconditionally, or a new best above 91."""
        from gm3d_tpu.cli.finetune import vote_gate

        assert vote_gate(92.2, better=False)
        assert vote_gate(91.5, better=True)
        assert not vote_gate(91.5, better=False)
        assert not vote_gate(91.0, better=True)
        assert not vote_gate(50.0, better=True)

    def test_resolve_recipe_provenance(self):
        """M2AE finetunes (incl. ModelNet40) ran the HPM stack — every
        Point-M2AE_SA3D log is MAE-json with a blr warmup ramp; PMAE ModelNet
        ran the legacy runner (modelnet40.log). Few-shot configs are
        legacy-format for both families."""
        import argparse

        from gm3d_tpu.cli.finetune import resolve_recipe
        from gm3d_tpu.config import cfg_from_yaml_file

        auto = argparse.Namespace(recipe="auto")
        cases = {
            "configs/pointmae/finetune_modelnet.yaml": "legacy",
            "configs/pointmae/config_finetune_scan_hardest.yaml": "hpm",
            "configs/m2ae/finetune_modelnet_PointM2AE.yaml": "hpm",
            "configs/m2ae/config_finetune_scan_hardest_PointM2AE.yaml": "hpm",
            "configs/m2ae/fewshot-Point-M2AE.yaml": "legacy",
        }
        for path, want in cases.items():
            assert resolve_recipe(auto, cfg_from_yaml_file(path)) == want, path
        forced = argparse.Namespace(recipe="legacy")
        assert resolve_recipe(
            forced, cfg_from_yaml_file(
                "configs/m2ae/finetune_modelnet_PointM2AE.yaml")) == "legacy"
