"""End-to-end pretrain CLI over the native C++ loader, including resume.

The native path was previously only unit-tested; this drives the REAL wiring:
``cli/common.py::make_loaders`` builds a :class:`NativeCloudLoader` from the
ShapeNet file list when ``--native_loader`` is set, and
``cli/pretrain.py`` restores the loader epoch on ``--resume`` via the
``load_state`` contract the native loader now implements (without it a
resumed run silently replays epoch-0 shuffle order)."""

import os

import numpy as np
import pytest
import yaml

from cli_harness import run_cli

pytestmark = pytest.mark.skipif(
    not __import__("gm3d_tpu.native", fromlist=["native_available"]).native_available(),
    reason="native loader unavailable (no compiler)")


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("native_e2e")
    # ShapeNet-55 layout: train.txt + {taxonomy}-{model}.npy clouds
    sn_data = d / "ShapeNet-55"
    sn_pc = d / "shapenet_pc"
    sn_data.mkdir()
    sn_pc.mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(8):
        name = f"0{i}234567-cafef00d{i}.npy"
        np.save(sn_pc / name, rng.standard_normal((200, 3)).astype(np.float32))
        names.append(name)
    (sn_data / "train.txt").write_text("\n".join(names))
    (sn_data / "test.txt").write_text("\n".join(names[:2]))
    # ModelNet layout for the SVM extra loaders
    mn = d / "modelnet"
    mn.mkdir()
    cats = ["airplane", "bed"]
    (mn / "modelnet40_shape_names.txt").write_text("\n".join(cats))
    train_ids, test_ids = [], []
    for cat in cats:
        (mn / cat).mkdir()
        for j in range(3):
            sid = f"{cat}_{j:04d}"
            np.savetxt(mn / cat / f"{sid}.txt",
                       rng.standard_normal((150, 6)).astype(np.float32),
                       delimiter=",")
            (train_ids if j < 2 else test_ids).append(sid)
    (mn / "modelnet40_train.txt").write_text("\n".join(train_ids))
    (mn / "modelnet40_test.txt").write_text("\n".join(test_ids))
    return d


@pytest.fixture(scope="module")
def tiny_cfg(data_root):
    def ds(name, **kw):
        base = {"NAME": name, **kw}
        return {"_base_": base, "others": {"subset": kw.pop("subset", "train")}}

    sn = {"NAME": "ShapeNet", "DATA_PATH": str(data_root / "ShapeNet-55"),
          "PC_PATH": str(data_root / "shapenet_pc"), "N_POINTS": 200}
    mn = {"NAME": "ModelNet", "DATA_PATH": str(data_root / "modelnet"),
          "N_POINTS": 128, "NUM_CATEGORY": 40, "USE_NORMALS": False}
    cfg = {
        "optimizer": {"type": "AdamW", "kwargs": {"lr": 1e-3, "weight_decay": 0.05}},
        "scheduler": {"type": "CosLR", "kwargs": {"epochs": 3, "initial_epochs": 1}},
        "dataset": {
            "train": {"_base_": dict(sn), "others": {"subset": "train", "npoints": 64}},
            "val": {"_base_": dict(sn), "others": {"subset": "test", "npoints": 64}},
            "extra_train_svm": {"_base_": dict(mn), "others": {"subset": "train", "npoints": 64}},
            "extra_test_svm": {"_base_": dict(mn), "others": {"subset": "test", "npoints": 64}},
        },
        "model": {
            "NAME": "Point_MAE", "group_size": 8, "num_group": 16, "loss": "cdl2",
            "transformer_config": {
                "mask_ratio": 0.6, "mask_type": "rand", "trans_dim": 32,
                "encoder_dims": 32, "depth": 2, "drop_path_rate": 0.0,
                "num_heads": 2, "decoder_depth": 1, "decoder_num_heads": 2,
            },
        },
        "npoints": 64, "total_bs": 8, "step_per_update": 1, "max_epoch": 3,
    }
    path = data_root / "tiny_native.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_pretrain_native_loader_end_to_end_with_resume(tiny_cfg, data_root,
                                                       monkeypatch):
    out = str(data_root / "run")
    argv = ["pt", "--config", tiny_cfg, "--model_family", "pointmae",
            "--native_loader", "--batch_size", "8", "--num_workers", "1",
            "--steps_per_dispatch", "1", "--output_dir", out]
    run_cli("gm3d_tpu.cli.pretrain", argv + ["--epochs", "1"])
    assert os.path.isdir(os.path.join(out, "ckpt"))

    # resume: the CLI must restore the NATIVE loader's epoch so the shuffle
    # sequence continues where an uninterrupted run would be
    from gm3d_tpu.native import native_loader as nl

    calls = []
    orig = nl._EpochControl.load_state

    def spy(self, state):
        calls.append(dict(state))
        return orig(self, state)

    monkeypatch.setattr(nl._EpochControl, "load_state", spy)
    run_cli("gm3d_tpu.cli.pretrain", argv + ["--epochs", "2", "--resume"])
    assert calls and calls[0]["epoch"] == 1, calls
