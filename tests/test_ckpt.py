"""Checkpoint schema + torch-importer tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.ckpt import (
    import_torch_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from gm3d_tpu.ckpt.torch_import import POINT_MAE_MAP, POINT_TRANSFORMER_MAP
from gm3d_tpu.models import GM3DStudent, PointMAE, PointTransformer
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.state import create_train_state


def tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(tree_paths(v, p))
        else:
            out[p] = np.asarray(v).shape
    return out


class TestOrbax:
    def test_save_restore_roundtrip(self, tmp_path):
        model = PointMAE(trans_dim=48, depth=1, num_heads=2, decoder_depth=1,
                         decoder_num_heads=2, group_size=8, num_group=16, encoder_dims=48)
        pts = jnp.zeros((2, 64, 3))
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(0), pts, mask, 9)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx, with_ema=True)
        ckpt_dir = str(tmp_path / "ckpt")
        save_checkpoint(ckpt_dir, state, step=7)
        restored = restore_checkpoint(ckpt_dir, state)
        assert restored is not None
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_restore_missing_returns_none(self, tmp_path):
        assert restore_checkpoint(str(tmp_path / "nope"), None) is None


def make_torch_state_dict(depth=2, dim=48, heads=2, cls_dim=5):
    """Fabricate a reference-shaped PointTransformer state dict."""
    torch = pytest.importorskip("torch")
    sd = {}

    def lin(name, din, dout):
        sd[f"{name}.weight"] = torch.randn(dout, din)
        sd[f"{name}.bias"] = torch.randn(dout)

    def conv(name, din, dout):
        sd[f"{name}.weight"] = torch.randn(dout, din, 1)
        sd[f"{name}.bias"] = torch.randn(dout)

    def bn(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)
        sd[f"{name}.running_mean"] = torch.zeros(d)
        sd[f"{name}.running_var"] = torch.ones(d)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    def ln(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)

    conv("encoder.first_conv.0", 3, 128)
    bn("encoder.first_conv.1", 128)
    conv("encoder.first_conv.3", 128, 256)
    conv("encoder.second_conv.0", 512, 512)
    bn("encoder.second_conv.1", 512)
    conv("encoder.second_conv.3", 512, dim)
    sd["cls_token"] = torch.zeros(1, 1, dim)
    sd["cls_pos"] = torch.randn(1, 1, dim)
    lin("pos_embed.0", 3, 128)
    lin("pos_embed.2", 128, dim)
    for i in range(depth):
        ln(f"blocks.blocks.{i}.norm1", dim)
        ln(f"blocks.blocks.{i}.norm2", dim)
        lin(f"blocks.blocks.{i}.attn.qkv", dim, dim * 3)
        sd.pop(f"blocks.blocks.{i}.attn.qkv.bias")  # qkv_bias=False
        lin(f"blocks.blocks.{i}.attn.proj", dim, dim)
        lin(f"blocks.blocks.{i}.mlp.fc1", dim, dim * 4)
        lin(f"blocks.blocks.{i}.mlp.fc2", dim * 4, dim)
    ln("norm_p", dim)
    lin("cls_head_finetune.0", dim * 2, 256)
    bn("cls_head_finetune.1", 256)
    lin("cls_head_finetune.4", 256, 256)
    bn("cls_head_finetune.5", 256)
    lin("cls_head_finetune.8", 256, cls_dim)
    return sd


class TestTorchImport:
    def test_point_transformer_import_matches_flax_tree(self):
        model = PointTransformer(trans_dim=48, depth=2, num_heads=2, cls_dim=5,
                                 group_size=8, num_group=16, encoder_dims=48)
        pts = jnp.zeros((2, 64, 3))
        flax_vars = model.init(jax.random.key(0), pts)
        sd = make_torch_state_dict()
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        assert imported["_unmatched"] == []
        got = tree_paths(imported["params"])
        want = tree_paths(jax.tree.map(np.asarray, flax_vars["params"]))
        assert got == want
        got_bs = tree_paths(imported["batch_stats"])
        want_bs = tree_paths(jax.tree.map(np.asarray, flax_vars["batch_stats"]))
        assert got_bs == want_bs

    def test_imported_weights_run_forward(self):
        model = PointTransformer(trans_dim=48, depth=2, num_heads=2, cls_dim=5,
                                 group_size=8, num_group=16, encoder_dims=48)
        sd = make_torch_state_dict()
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        imported.pop("_unmatched")
        pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
        logits = model.apply(
            {"params": imported["params"], "batch_stats": imported["batch_stats"]}, pts
        )
        assert logits.shape == (2, 5)
        assert np.isfinite(np.asarray(logits)).all()

    def test_ddp_prefix_stripped(self):
        sd = {("module." + k): v for k, v in make_torch_state_dict().items()}
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        assert imported["_unmatched"] == []

    def test_linear_weight_transposed(self):
        torch = pytest.importorskip("torch")
        w = torch.arange(6.0).reshape(2, 3)  # (out, in)
        sd = {"pos_embed.0.weight": w, "pos_embed.0.bias": torch.zeros(2)}
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        np.testing.assert_array_equal(
            imported["params"]["pos_embed"]["fc1"]["kernel"], w.numpy().T
        )


def make_torch_pointmae_state_dict(depth=2, dec_depth=1, dim=48, S=8):
    """Reference Point_MAE pretrain ckpt layout (models/Point_MAE.py:346-398),
    wrapped as {'base_model': ...} like tools/builder.py saves."""
    torch = pytest.importorskip("torch")
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = torch.randn(dout, din) * 0.02
        if bias:
            sd[f"{name}.bias"] = torch.zeros(dout)

    def conv(name, din, dout):
        sd[f"{name}.weight"] = torch.randn(dout, din, 1) * 0.02
        sd[f"{name}.bias"] = torch.zeros(dout)

    def bn(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)
        sd[f"{name}.running_mean"] = torch.zeros(d)
        sd[f"{name}.running_var"] = torch.ones(d)
        sd[f"{name}.num_batches_tracked"] = torch.tensor(0)

    def ln(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)

    def blocks(prefix, n):
        for i in range(n):
            ln(f"{prefix}.{i}.norm1", dim)
            ln(f"{prefix}.{i}.norm2", dim)
            lin(f"{prefix}.{i}.attn.qkv", dim, dim * 3, bias=False)
            lin(f"{prefix}.{i}.attn.proj", dim, dim)
            lin(f"{prefix}.{i}.mlp.fc1", dim, dim * 4)
            lin(f"{prefix}.{i}.mlp.fc2", dim * 4, dim)

    conv("MAE_encoder.encoder.first_conv.0", 3, 128)
    bn("MAE_encoder.encoder.first_conv.1", 128)
    conv("MAE_encoder.encoder.first_conv.3", 128, 256)
    conv("MAE_encoder.encoder.second_conv.0", 512, 512)
    bn("MAE_encoder.encoder.second_conv.1", 512)
    conv("MAE_encoder.encoder.second_conv.3", 512, dim)
    lin("MAE_encoder.pos_embed.0", 3, 128)
    lin("MAE_encoder.pos_embed.2", 128, dim)
    blocks("MAE_encoder.blocks.blocks", depth)
    ln("MAE_encoder.norm", dim)
    sd["mask_token"] = torch.zeros(1, 1, dim)
    lin("decoder_pos_embed.0", 3, 128)
    lin("decoder_pos_embed.2", 128, dim)
    blocks("MAE_decoder.blocks", dec_depth)
    ln("MAE_decoder.norm", dim)
    conv("increase_dim.0", dim, 3 * S)
    return {"base_model": sd}


class TestPointMAETeacherImport:
    def test_full_layout_imports_and_runs(self):
        from gm3d_tpu.ckpt.torch_import import POINT_MAE_MAP

        ckpt = make_torch_pointmae_state_dict()
        imported = import_torch_checkpoint(ckpt["base_model"], POINT_MAE_MAP)
        unmatched = imported.pop("_unmatched")
        assert unmatched == [], unmatched

        teacher = PointMAE(trans_dim=48, depth=2, num_heads=2, decoder_depth=1,
                           decoder_num_heads=2, group_size=8, num_group=16,
                           encoder_dims=48)
        pts = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 3)).astype(np.float32))
        # structure matches a fresh init
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        fresh = teacher.init(jax.random.key(0), pts, mask, 9)
        assert tree_paths(imported["params"]) == tree_paths(
            jax.tree.map(np.asarray, fresh["params"]))
        # teacher replay paths run on the imported weights
        feats = teacher.apply(imported, pts, method=teacher.encode_features)
        rebuilt = teacher.apply(imported, feats, jnp.zeros((2, 16, 3)),
                                method=teacher.decode_replay)
        assert rebuilt.shape == (2, 16, 8, 3)
        assert np.isfinite(np.asarray(rebuilt)).all()


class TestPretrainFinetuneTransfer:
    """Round-1 VERDICT bug: the orbax pretrain->finetune overlay transferred
    ZERO leaves because the pretrain tree nests the encoder under
    MAE_encoder/ while PointTransformer holds it at root. These tests pin the
    re-rooted overlay (reference surgery: main_finetune.py:297-324)."""

    dims = dict(trans_dim=48, depth=2, num_heads=2, group_size=8, num_group=16,
                encoder_dims=48)

    def _pretrain_state(self, tmp_path):
        from gm3d_tpu.models import GM3DStudent

        model = GM3DStudent(decoder_depth=1, decoder_num_heads=2, **self.dims)
        pts = jnp.zeros((2, 64, 3))
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(1), pts, mask, 9)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx, with_ema=True)
        ckpt_dir = str(tmp_path / "pre")
        save_checkpoint(ckpt_dir, state, step=1)
        return ckpt_dir, variables

    def test_orbax_transfer_nonzero_and_exact(self, tmp_path):
        from gm3d_tpu.ckpt import load_pretrained_into

        ckpt_dir, pre_vars = self._pretrain_state(tmp_path)
        ft_model = PointTransformer(cls_dim=5, **self.dims)
        pts = jnp.zeros((2, 64, 3))
        ft_vars = ft_model.init(jax.random.key(2), pts)
        params, batch_stats, n = load_pretrained_into(
            ft_vars["params"], ft_vars.get("batch_stats"), ckpt_dir)
        assert n > 0
        # every encoder leaf must equal the pretrain encoder's (not random)
        pre_enc = tree_paths(pre_vars["params"]["MAE_encoder"])
        got_enc = tree_paths({k: params[k] for k in ("encoder", "pos_embed", "blocks", "norm")})
        assert set(pre_enc) == set(got_enc)
        np.testing.assert_allclose(
            np.asarray(params["blocks"]["block0"]["attn"]["qkv"]["kernel"]),
            np.asarray(pre_vars["params"]["MAE_encoder"]["blocks"]["block0"]["attn"]["qkv"]["kernel"]),
        )
        # and the overlaid model must produce different logits than random init
        v2 = {"params": params}
        if batch_stats is not None:
            v2["batch_stats"] = batch_stats
        pts_r = jax.random.normal(jax.random.key(3), (2, 64, 3))
        logits_pre = ft_model.apply(v2, pts_r)
        logits_rand = ft_model.apply(ft_vars, pts_r)
        assert not np.allclose(np.asarray(logits_pre), np.asarray(logits_rand))

    def test_zero_transfer_raises(self, tmp_path):
        from gm3d_tpu.ckpt import load_pretrained_into

        ckpt_dir, _ = self._pretrain_state(tmp_path)
        # a tree with entirely different names must fail loudly
        bogus = {"something": {"kernel": jnp.zeros((3, 3))}}
        with pytest.raises(ValueError, match="0 parameters"):
            load_pretrained_into(bogus, None, ckpt_dir)

    def test_seg_transfer_flattens_blocks(self, tmp_path):
        from gm3d_tpu.ckpt import load_pretrained_into
        from gm3d_tpu.models.segmentation import PointMAESeg

        ckpt_dir, pre_vars = self._pretrain_state(tmp_path)
        seg = PointMAESeg(trans_dim=48, depth=2, num_heads=2, group_size=8,
                          num_group=16, encoder_dims=48, feature_blocks=(0, 1))
        pts = jnp.zeros((2, 64, 3))
        cls = jnp.zeros((2,), jnp.int32)
        seg_vars = seg.init(jax.random.key(4), pts, cls)
        params, _, n = load_pretrained_into(
            seg_vars["params"], seg_vars.get("batch_stats"), ckpt_dir,
            flatten=("blocks",))
        assert n > 0
        np.testing.assert_allclose(
            np.asarray(params["block0"]["attn"]["qkv"]["kernel"]),
            np.asarray(pre_vars["params"]["MAE_encoder"]["blocks"]["block0"]["attn"]["qkv"]["kernel"]),
        )


class TestTransferReport:
    """Named checkpoint-surgery reports (reference ``utils/checkpoint.py:16-132``
    grouped missing/unexpected key lists, used by
    ``models/Point_MAE.py:528-538``): a partial overlay after a layout drift
    must NAME the drifted keys — a bare count passes the ``n>0`` check and
    surfaces only as a mysterious accuracy gap."""

    def test_drifted_layout_names_keys(self):
        from gm3d_tpu.ckpt.transfer import TransferReport, overlay_pretrained

        dst = {
            "encoder": {"conv1": {"kernel": jnp.zeros((3, 8))},
                        "conv2": {"kernel": jnp.zeros((8, 16))}},
            "blocks": {f"block{i}": {"attn": {"kernel": jnp.zeros((4, 4))}}
                       for i in range(3)},
            "head": {"kernel": jnp.zeros((16, 5))},
        }
        src = {
            "encoder": {"conv1": {"kernel": jnp.ones((3, 8))},
                        "conv2": {"kernel": jnp.ones((8, 32))}},  # drifted width
            # blocks renamed away entirely (layout drift) -> all missing
            "layers": {f"layer{i}": {"attn": {"kernel": jnp.ones((4, 4))}}
                       for i in range(3)},
            "legacy_head": {"kernel": jnp.ones((16, 5))},  # renamed away
        }
        rep = TransferReport()
        _, _, n = overlay_pretrained(dst, None, src, strip_mae_encoder=False,
                                     report=rep)
        assert n == 1  # only conv1 lands; conv2 drifted, blocks/head missing
        assert rep.matched_fraction < 1.0
        assert [p for p, *_ in rep.shape_mismatch] == ["params/encoder/conv2/kernel"]
        assert "params/head/kernel" in rep.missing
        assert "params/encoder/conv2/kernel" in rep.missing  # mismatch stays fresh
        assert "params/legacy_head/kernel" in rep.unexpected
        text = "\n".join(rep.lines())
        assert "params/blocks/block*/attn/kernel x3" in text  # digit-grouped missing
        assert "params/layers/layer*/attn/kernel x3" in text  # grouped unexpected
        assert "ckpt(8, 32) vs model(8, 16)" in text
        assert "legacy_head" in text

    def test_subtree_only_in_src_is_unexpected(self):
        from gm3d_tpu.ckpt.transfer import TransferReport, overlay_pretrained

        dst = {"a": {"w": jnp.zeros((2,))}}
        src = {"a": {"w": jnp.ones((2,))},
               "decoder": {"block0": {"w": jnp.ones((2,))},
                           "block1": {"w": jnp.ones((2,))}}}
        rep = TransferReport()
        _, _, n = overlay_pretrained(dst, None, src, strip_mae_encoder=False,
                                     report=rep)
        assert n == 1 and rep.matched_fraction == 1.0
        assert sorted(rep.unexpected) == [
            "params/decoder/block0/w", "params/decoder/block1/w"]

    def test_finetune_load_logs_named_report(self, tmp_path, caplog):
        """The real pretrain->finetune path must WARN with the fresh-head key
        names (detectron2-style), while still emitting the established
        'transfer: N leaves' line the CLIs and e2e tests assert on."""
        import logging

        from gm3d_tpu.ckpt import load_pretrained_into

        dims = dict(trans_dim=48, depth=2, num_heads=2, group_size=8,
                    num_group=16, encoder_dims=48)
        model = GM3DStudent(decoder_depth=1, decoder_num_heads=2, **dims)
        pts = jnp.zeros((2, 64, 3))
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(1), pts, mask, 9)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx, with_ema=True)
        ckpt_dir = str(tmp_path / "pre")
        save_checkpoint(ckpt_dir, state, step=1)

        ft = PointTransformer(cls_dim=5, **dims)
        ft_vars = ft.init(jax.random.key(2), pts)
        logger = logging.getLogger("test.transfer.report")
        with caplog.at_level(logging.INFO, logger=logger.name):
            load_pretrained_into(ft_vars["params"], ft_vars.get("batch_stats"),
                                 ckpt_dir, logger=logger)
        text = "\n".join(r.getMessage() for r in caplog.records)
        assert "leaves overlaid from" in text  # established contract line
        assert "missing (left at fresh init" in text
        assert "cls_head_finetune" in text  # fresh head NAMED
        warns = [r for r in caplog.records if r.levelno == logging.WARNING]
        assert warns, "partial overlay must warn, not info"


class TestSharedOptimizerCheckpoint:
    """The default pretrain optimizer is now optax.multi_transform (frozen
    coord head) — its masked opt-state (MaskedNode leaves) must survive the
    orbax round-trip for --resume."""

    def test_multi_transform_state_round_trip(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from gm3d_tpu.ckpt import restore_checkpoint, save_checkpoint
        from gm3d_tpu.models import GM3DStudent
        from gm3d_tpu.train.optim import build_gm3d_shared_optimizer
        from gm3d_tpu.train.state import create_train_state

        small = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1,
                     decoder_num_heads=2, group_size=8, num_group=16,
                     encoder_dims=48)
        s = GM3DStudent(**small)
        pts = jnp.zeros((2, 64, 3))
        m0 = jnp.zeros((2, 16), bool).at[:, :10].set(True)
        sv = s.init(jax.random.key(0), pts, m0, 10)
        tx = build_gm3d_shared_optimizer(sv["params"], 1e-3)
        state = create_train_state(sv, tx, with_ema=True)
        # advance the optimizer once so moments are non-trivial
        import optax

        grads = jax.tree.map(jnp.ones_like, state.params)
        up, opt_state = tx.update(grads, state.opt_state, state.params)
        state = state.replace(params=optax.apply_updates(state.params, up),
                              opt_state=opt_state,
                              step=state.step + 1)

        save_checkpoint(str(tmp_path / "ck"), state, 1)
        template = create_train_state(sv, tx, with_ema=True)
        restored = restore_checkpoint(str(tmp_path / "ck"), template)
        assert restored is not None and int(restored.step) == 1
        flat_a = jax.tree_util.tree_leaves(state.opt_state)
        flat_b = jax.tree_util.tree_leaves(restored.opt_state)
        assert len(flat_a) == len(flat_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
