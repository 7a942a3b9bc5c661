"""Numerical parity against a freshly-written torch oracle.

Builds a standard pre-norm ViT block / mini-PointNet in torch (the public
architecture the reference uses), loads OUR weights into it via the torch
exporter, and compares outputs — validating the attention math, the patch
embed, and the checkpoint mapping end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from gm3d_tpu.models.blocks import Block, PatchEncoder  # noqa: E402

DIM, HEADS = 48, 2


class TorchBlock(nn.Module):
    """Oracle: standard pre-norm ViT block (qkv bias off, no drops)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.proj = nn.Linear(dim, dim)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(b, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (c // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        h = (attn @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.proj(h)
        h = self.norm2(x)
        h = self.fc2(torch.nn.functional.gelu(self.fc1(h)))
        return x + h


def to_torch(t):
    return torch.from_numpy(np.asarray(t, np.float32))


class TestBlockParity:
    def test_flax_block_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 10, DIM)).astype(np.float32)

        block = Block(DIM, HEADS)
        variables = block.init(jax.random.key(0), jnp.asarray(x))
        p = variables["params"]

        tb = TorchBlock(DIM, HEADS)
        with torch.no_grad():
            tb.norm1.weight.copy_(to_torch(p["norm1"]["scale"]))
            tb.norm1.bias.copy_(to_torch(p["norm1"]["bias"]))
            tb.norm2.weight.copy_(to_torch(p["norm2"]["scale"]))
            tb.norm2.bias.copy_(to_torch(p["norm2"]["bias"]))
            tb.qkv.weight.copy_(to_torch(p["attn"]["qkv"]["kernel"]).T)
            tb.proj.weight.copy_(to_torch(p["attn"]["proj"]["kernel"]).T)
            tb.proj.bias.copy_(to_torch(p["attn"]["proj"]["bias"]))
            tb.fc1.weight.copy_(to_torch(p["mlp"]["fc1"]["kernel"]).T)
            tb.fc1.bias.copy_(to_torch(p["mlp"]["fc1"]["bias"]))
            tb.fc2.weight.copy_(to_torch(p["mlp"]["fc2"]["kernel"]).T)
            tb.fc2.bias.copy_(to_torch(p["mlp"]["fc2"]["bias"]))
            want = tb(torch.from_numpy(x)).numpy()

        got = np.asarray(block.apply(variables, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TorchPatchEncoder(nn.Module):
    """Oracle: the mini-PointNet as public Point-MAE describes it."""

    def __init__(self, out_dim):
        super().__init__()
        self.first_conv = nn.Sequential(
            nn.Conv1d(3, 128, 1), nn.BatchNorm1d(128), nn.ReLU(), nn.Conv1d(128, 256, 1)
        )
        self.second_conv = nn.Sequential(
            nn.Conv1d(512, 512, 1), nn.BatchNorm1d(512), nn.ReLU(), nn.Conv1d(512, out_dim, 1)
        )

    def forward(self, pg):
        bs, g, n, _ = pg.shape
        pg = pg.reshape(bs * g, n, 3)
        f = self.first_conv(pg.transpose(2, 1))
        fg = torch.max(f, dim=2, keepdim=True)[0]
        f = torch.cat([fg.expand(-1, -1, n), f], dim=1)
        f = self.second_conv(f)
        return torch.max(f, dim=2)[0].reshape(bs, g, -1)


class TestPatchEncoderParity:
    def test_eval_mode_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((2, 6, 8, 3)).astype(np.float32)
        out_dim = 48

        enc = PatchEncoder(out_dim)
        variables = enc.init(jax.random.key(0), jnp.asarray(x), False)
        p, bs = variables["params"], variables["batch_stats"]

        te = TorchPatchEncoder(out_dim).eval()
        with torch.no_grad():
            te.first_conv[0].weight.copy_(to_torch(p["conv1"]["kernel"]).T[:, :, None])
            te.first_conv[0].bias.copy_(to_torch(p["conv1"]["bias"]))
            te.first_conv[1].weight.copy_(to_torch(p["bn1"]["scale"]))
            te.first_conv[1].bias.copy_(to_torch(p["bn1"]["bias"]))
            te.first_conv[1].running_mean.copy_(to_torch(bs["bn1"]["mean"]))
            te.first_conv[1].running_var.copy_(to_torch(bs["bn1"]["var"]))
            te.first_conv[3].weight.copy_(to_torch(p["conv2"]["kernel"]).T[:, :, None])
            te.first_conv[3].bias.copy_(to_torch(p["conv2"]["bias"]))
            te.second_conv[0].weight.copy_(to_torch(p["conv3"]["kernel"]).T[:, :, None])
            te.second_conv[0].bias.copy_(to_torch(p["conv3"]["bias"]))
            te.second_conv[1].weight.copy_(to_torch(p["bn2"]["scale"]))
            te.second_conv[1].bias.copy_(to_torch(p["bn2"]["bias"]))
            te.second_conv[1].running_mean.copy_(to_torch(bs["bn2"]["mean"]))
            te.second_conv[1].running_var.copy_(to_torch(bs["bn2"]["var"]))
            te.second_conv[3].weight.copy_(to_torch(p["conv4"]["kernel"]).T[:, :, None])
            te.second_conv[3].bias.copy_(to_torch(p["conv4"]["bias"]))
            want = te(torch.from_numpy(x)).numpy()

        got = np.asarray(enc.apply(variables, jnp.asarray(x), True))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestTorchBatchNorm:
    def test_train_mode_matches_torch_incl_bessel(self):
        """TorchBatchNorm == torch.nn.BatchNorm1d in train mode: normalised
        output (biased batch var) AND running stats (UNBIASED var — torch's
        Bessel correction, which flax nn.BatchNorm omits). At n=4 the factor
        is 4/3: a 33% running_var error if the correction is missing."""
        import torch

        from gm3d_tpu.models.blocks import TorchBatchNorm

        x = np.random.RandomState(0).randn(4, 32).astype(np.float32)
        m = TorchBatchNorm(use_running_average=False, momentum=0.9)
        v = m.init(jax.random.key(0), jnp.asarray(x))
        tb = torch.nn.BatchNorm1d(32, momentum=0.1)  # torch: new = (1-m)*old + m*batch
        tb.train()

        state = v
        for step in range(3):
            xs = np.random.RandomState(step).randn(4, 32).astype(np.float32)
            y, upd = m.apply(state, jnp.asarray(xs), mutable=["batch_stats"])
            state = {"params": v["params"], "batch_stats": upd["batch_stats"]}
            yt = tb(torch.from_numpy(xs))
            np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(), atol=3e-5)
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["var"]), tb.running_var.numpy(), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(state["batch_stats"]["mean"]), tb.running_mean.numpy(), rtol=1e-5, atol=1e-7
        )

    def test_eval_mode_uses_running_stats(self):
        from gm3d_tpu.models.blocks import TorchBatchNorm

        x = np.random.RandomState(1).randn(4, 8).astype(np.float32)
        m = TorchBatchNorm(use_running_average=True)
        v = m.init(jax.random.key(0), jnp.asarray(x))
        y = m.apply(v, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)  # mean 0 var 1 init
