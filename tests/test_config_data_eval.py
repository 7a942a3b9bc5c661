"""Config system, dataset plumbing, and eval metric tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.config import MODELS, cfg_from_yaml_file, build_model_from_cfg
from gm3d_tpu.data.datasets import DataLoader, SyntheticClouds, pc_normalize
from gm3d_tpu.eval.metrics import accuracy, part_miou
from gm3d_tpu.eval.svm import evaluate_svm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestConfig:
    def test_pretrain_config_loads(self):
        cfg = cfg_from_yaml_file(os.path.join(REPO, "configs/pointmae/config.yaml"))
        assert cfg.model.NAME == "Point_MAE"
        assert cfg.model.transformer_config.mask_ratio == 0.6
        assert cfg.total_bs == 256
        assert cfg.gm3d.loss_multiply_by == [13.889, 1000.0]

    def test_teacher_config_mask_zero(self):
        cfg = cfg_from_yaml_file(os.path.join(REPO, "configs/pointmae/config_m.yaml"))
        assert cfg.model.transformer_config.mask_ratio == 0.0

    def test_all_configs_build_models(self):
        names = [
            "configs/pointmae/config.yaml",
            "configs/pointmae/config_m.yaml",
            "configs/pointmae/finetune_modelnet.yaml",
            "configs/pointmae/config_finetune_scan_hardest.yaml",
            "configs/pointmae/config_finetune_scan_objbg.yaml",
            "configs/pointmae/config_finetune_scan_objonly.yaml",
            "configs/pointmae/fewshot.yaml",
            "configs/m2ae/config_Point_M2AE.yaml",
            "configs/m2ae/finetune_modelnet_PointM2AE.yaml",
            "configs/m2ae/config_finetune_scan_hardest_PointM2AE.yaml",
            "configs/m2ae/fewshot-Point-M2AE.yaml",
        ]
        for name in names:
            cfg = cfg_from_yaml_file(os.path.join(REPO, name))
            model = build_model_from_cfg(cfg.model)
            assert model is not None, name

    def test_scan_hardest_matches_reference_shape(self):
        cfg = cfg_from_yaml_file(
            os.path.join(REPO, "configs/pointmae/config_finetune_scan_hardest.yaml")
        )
        assert cfg.model.num_group == 128
        assert cfg.npoints == 2048
        assert cfg.model.cls_dim == 15

    def test_base_merge(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("a: 1\nb:\n  c: 2\n")
        child = tmp_path / "child.yaml"
        child.write_text(f"_base_: {base}\nb:\n  d: 3\n")
        cfg = cfg_from_yaml_file(str(child))
        assert cfg._base_.a == 1
        assert cfg.b.d == 3


class TestData:
    def test_synthetic_loader_bare_points(self):
        ds = SyntheticClouds(num_samples=20, npoints=64)
        dl = DataLoader(ds, batch_size=8)
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0].shape == (8, 64, 3)

    def test_synthetic_loader_labelled(self):
        ds = SyntheticClouds(num_samples=20, npoints=64, labelled=True)
        dl = DataLoader(ds, batch_size=8)
        pts, labels = next(iter(dl))
        assert pts.shape == (8, 64, 3)
        assert labels.shape == (8,)

    def test_pc_normalize_unit_sphere(self):
        rng = np.random.default_rng(0)
        pc = pc_normalize(rng.standard_normal((100, 3)) * 5 + 3)
        assert np.linalg.norm(pc, axis=1).max() == pytest.approx(1.0, rel=1e-5)
        np.testing.assert_allclose(pc.mean(0), 0, atol=1e-6)

    def test_loader_epoch_reshuffles(self):
        # the epoch counter advances when an epoch COMPLETES (required for
        # mid-epoch resume, see DataLoader.state()), so consecutive full
        # epochs see different shuffles
        ds = SyntheticClouds(num_samples=16, npoints=32)
        dl = DataLoader(ds, batch_size=16)
        (b1,) = list(dl)  # epoch 0
        (b2,) = list(dl)  # epoch 1
        assert (b1 != b2).any()


class TestEval:
    def test_svm_separable(self):
        rng = np.random.default_rng(0)
        f_tr = np.concatenate([rng.normal(0, 0.1, (50, 8)), rng.normal(1, 0.1, (50, 8))])
        l_tr = np.array([0] * 50 + [1] * 50)
        f_te = np.concatenate([rng.normal(0, 0.1, (20, 8)), rng.normal(1, 0.1, (20, 8))])
        l_te = np.array([0] * 20 + [1] * 20)
        assert evaluate_svm(f_tr, l_tr, f_te, l_te) == 1.0

    def test_svm_probe_on_synthetic(self):
        from gm3d_tpu.eval.svm import svm_probe
        from gm3d_tpu.models import PointMAE

        model = PointMAE(trans_dim=48, depth=1, num_heads=2, decoder_depth=1,
                         decoder_num_heads=2, group_size=8, num_group=16, encoder_dims=48)
        pts0 = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
        mask0 = jnp.zeros((2, 16), bool)
        variables = model.init(jax.random.key(0), pts0, mask0, 0)

        def loader(seed):
            ds = SyntheticClouds(num_samples=40, npoints=64, num_classes=4, seed=seed, labelled=True)
            return DataLoader(ds, batch_size=8, shuffle=False)

        acc = svm_probe(model, variables, loader(0), loader(1), npoints=64)
        # untrained features on 4 well-separated synthetic classes still
        # linearly separate far above chance
        assert acc > 0.5

    def test_accuracy(self):
        logits = np.eye(4)
        labels = np.array([0, 1, 2, 0])
        assert accuracy(logits, labels) == 0.75

    def test_part_miou_perfect(self):
        seg_classes = {"A": [0, 1], "B": [2, 3]}
        names = ["A", "B"]
        target = np.array([[0, 0, 1, 1], [2, 3, 3, 2]])
        out = part_miou(target, target, np.array([0, 1]), seg_classes, names)
        assert out["instance_miou"] == 1.0
        assert out["class_miou"] == 1.0

    def test_part_miou_half(self):
        seg_classes = {"A": [0, 1]}
        names = ["A"]
        pred = np.array([[0, 0, 0, 0]])
        target = np.array([[0, 0, 1, 1]])
        out = part_miou(pred, target, np.array([0]), seg_classes, names)
        # part0 IoU = 2/4, part1 IoU = 0 -> shape mIoU 0.25
        assert out["instance_miou"] == pytest.approx(0.25)
