"""CLIP distillation teacher (--learn_feature_loss clip): tower semantics,
depth rendering, torch importer, and the gm3d clip train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models.clip import (
    CLIPVisionTower,
    clip_group_targets,
    render_depth_views,
)

TOWER = dict(input_resolution=16, patch_size=4, width=32, layers=2, heads=2,
             output_dim=48)


def make_tower():
    tower = CLIPVisionTower(**TOWER)
    imgs = jnp.zeros((2, 16, 16, 3))
    return tower, tower.init(jax.random.key(0), imgs)


class TestTower:
    def test_forward_and_features_shapes(self):
        tower, v = make_tower()
        imgs = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
        pooled = tower.apply(v, imgs)
        assert pooled.shape == (2, 48)
        feats = tower.apply(v, imgs, method=tower.features)
        # forward_features_clip: all tokens ln_post-ed + projected, cls dropped
        assert feats.shape == (2, 16, 48)  # grid=4 -> 16 patch tokens

    def test_render_depth_views(self):
        pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 256, 3)).astype(np.float32))
        imgs = render_depth_views(pts, 16)
        assert imgs.shape == (2, 16, 16, 3)
        assert float(jnp.max(imgs)) <= 1.0 and float(jnp.min(imgs)) >= 0.0
        # a single point at a known location splats into the right pixel
        one = jnp.zeros((1, 1, 3)).at[0, 0].set(jnp.asarray([1.0, 1.0, -1.0]))
        img = render_depth_views(one, 16)
        assert float(img[0, 15, 15, 0]) == 1.0  # view (x,y): depth 1 - z_norm

    def test_group_targets_shape_and_nograd(self):
        tower, v = make_tower()
        pts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 256, 3)).astype(np.float32))
        centers = pts[:, :8]
        targets = clip_group_targets(tower, v, pts, centers)
        assert targets.shape == (2, 8, 48)

        def f(params):
            t = clip_group_targets(tower, {"params": params}, pts, centers)
            return jnp.sum(t**2)

        grads = jax.grad(f)(v["params"])
        assert max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads)) == 0.0


class TestClipImporter:
    def fabricate_clip_sd(self):
        torch = pytest.importorskip("torch")
        width, patch, grid, layers, out = 32, 4, 4, 2, 48
        sd = {"visual.conv1.weight": torch.randn(width, 3, patch, patch),
              "visual.class_embedding": torch.randn(width),
              "visual.positional_embedding": torch.randn(grid * grid + 1, width),
              "visual.proj": torch.randn(width, out),
              "visual.ln_pre.weight": torch.randn(width),
              "visual.ln_pre.bias": torch.randn(width),
              "visual.ln_post.weight": torch.randn(width),
              "visual.ln_post.bias": torch.randn(width)}
        for i in range(layers):
            p = f"visual.transformer.resblocks.{i}."
            sd[p + "ln_1.weight"] = torch.randn(width)
            sd[p + "ln_1.bias"] = torch.randn(width)
            sd[p + "ln_2.weight"] = torch.randn(width)
            sd[p + "ln_2.bias"] = torch.randn(width)
            sd[p + "attn.in_proj_weight"] = torch.randn(3 * width, width)
            sd[p + "attn.in_proj_bias"] = torch.randn(3 * width)
            sd[p + "attn.out_proj.weight"] = torch.randn(width, width)
            sd[p + "attn.out_proj.bias"] = torch.randn(width)
            sd[p + "mlp.c_fc.weight"] = torch.randn(4 * width, width)
            sd[p + "mlp.c_fc.bias"] = torch.randn(4 * width)
            sd[p + "mlp.c_proj.weight"] = torch.randn(width, 4 * width)
            sd[p + "mlp.c_proj.bias"] = torch.randn(4 * width // 4)
        return sd

    def test_import_infers_config_and_runs(self):
        from gm3d_tpu.ckpt.torch_import import import_clip_visual

        sd = self.fabricate_clip_sd()
        cfg, variables = import_clip_visual(sd)
        assert cfg == dict(input_resolution=16, patch_size=4, width=32,
                           layers=2, heads=0, output_dim=48) or cfg["width"] == 32
        # heads = width // 64 == 0 for toy width; build with explicit heads
        cfg["heads"] = max(cfg["heads"], 2)
        tower = CLIPVisionTower(**cfg)
        imgs = jax.random.uniform(jax.random.key(2), (2, 16, 16, 3))
        feats = tower.apply(variables, imgs, method=tower.features)
        assert feats.shape == (2, 16, 48)

    def test_imported_matches_torch_oracle(self):
        """Flax tower == torch CLIP visual forward on the same weights."""
        torch = pytest.importorskip("torch")
        from gm3d_tpu.ckpt.torch_import import import_clip_visual

        sd = self.fabricate_clip_sd()
        cfg, variables = import_clip_visual(sd)
        cfg["heads"] = 2
        tower = CLIPVisionTower(**cfg)
        imgs = np.random.default_rng(3).uniform(size=(2, 16, 16, 3)).astype(np.float32)
        feats = np.asarray(tower.apply(variables, jnp.asarray(imgs), method=tower.features))

        # torch oracle of forward_features_clip (engine...:711-735)
        x = torch.from_numpy(imgs).permute(0, 3, 1, 2)
        w = {k[len("visual."):]: v for k, v in sd.items()}
        x = torch.nn.functional.conv2d(x, w["conv1.weight"], stride=4)
        x = x.reshape(2, 32, -1).permute(0, 2, 1)
        x = torch.cat([w["class_embedding"].expand(2, 1, 32), x], dim=1)
        x = x + w["positional_embedding"]
        x = torch.nn.functional.layer_norm(x, (32,), w["ln_pre.weight"], w["ln_pre.bias"])
        for i in range(2):
            p = f"transformer.resblocks.{i}."
            h = torch.nn.functional.layer_norm(x, (32,), w[p + "ln_1.weight"], w[p + "ln_1.bias"])
            qkv = h @ w[p + "attn.in_proj_weight"].T + w[p + "attn.in_proj_bias"]
            q, k, v = qkv.chunk(3, dim=-1)
            B, L, C = q.shape
            H, D = 2, 16
            q = q.reshape(B, L, H, D).permute(0, 2, 1, 3)
            k = k.reshape(B, L, H, D).permute(0, 2, 1, 3)
            v = v.reshape(B, L, H, D).permute(0, 2, 1, 3)
            a = torch.softmax(q @ k.transpose(-1, -2) * D**-0.5, dim=-1)
            h = (a @ v).permute(0, 2, 1, 3).reshape(B, L, C)
            h = h @ w[p + "attn.out_proj.weight"].T + w[p + "attn.out_proj.bias"]
            x = x + h
            h = torch.nn.functional.layer_norm(x, (32,), w[p + "ln_2.weight"], w[p + "ln_2.bias"])
            h = h @ w[p + "mlp.c_fc.weight"].T + w[p + "mlp.c_fc.bias"]
            h = h * torch.sigmoid(1.702 * h)
            h = h @ w[p + "mlp.c_proj.weight"].T + w[p + "mlp.c_proj.bias"]
            x = x + h
        x = torch.nn.functional.layer_norm(x, (32,), w["ln_post.weight"], w["ln_post.bias"])
        x = x @ w["proj"]
        oracle = x[:, 1:, :].numpy()
        np.testing.assert_allclose(feats, oracle, atol=2e-4, rtol=2e-4)


class TestClipTrainStep:
    def test_clip_step_runs_and_loss_decreases(self):
        from gm3d_tpu.models import GM3DStudent
        from gm3d_tpu.train.optim import build_adamw
        from gm3d_tpu.train.pretrain import make_gm3d_train_step
        from gm3d_tpu.train.state import create_train_state

        SMALL = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1,
                     decoder_num_heads=2, group_size=8, num_group=16, encoder_dims=48)
        student = GM3DStudent(**SMALL)
        tower, tvars = make_tower()
        pts = jnp.asarray(
            np.random.default_rng(0).standard_normal((4, 128, 3)).astype(np.float32) * 0.5)
        num_mask = 10
        mask0 = jnp.zeros((4, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        step = make_gm3d_train_step(student, tower, tx, mask_ratio=10 / 16,
                                    distill_mode="clip")
        state = create_train_state(svars, tx, with_ema=True)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999),
                   "w_mse": jnp.asarray(1.0), "w_cd": jnp.asarray(1.0)}
        losses = []
        for i in range(8):
            state, metrics = step(state, tvars, pts, jax.random.key(i), scalars)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_clip_dim_mismatch_rejected(self):
        from gm3d_tpu.models import GM3DStudent
        from gm3d_tpu.train.optim import build_adamw
        from gm3d_tpu.train.pretrain import make_gm3d_train_step

        student = GM3DStudent(trans_dim=48, depth=1, num_heads=2, decoder_depth=1,
                              decoder_num_heads=2, group_size=8, num_group=16,
                              encoder_dims=48)
        tower = CLIPVisionTower(**{**TOWER, "output_dim": 64})
        with pytest.raises(AssertionError, match="must match"):
            make_gm3d_train_step(student, tower, build_adamw(1e-3),
                                 mask_ratio=10 / 16, distill_mode="clip")
