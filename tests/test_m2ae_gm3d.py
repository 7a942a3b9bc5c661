"""Point-M2AE + GM3D geometric masking tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.models import PointM2AE
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.pretrain import make_m2ae_gm3d_train_step
from gm3d_tpu.train.state import create_train_state

KW = dict(
    num_groups=(32, 16, 8),
    group_sizes=(8, 4, 4),
    encoder_depths=(1, 1, 1),
    encoder_dims=(24, 48, 96),
    local_radius=(0.32, 0.64, 1.28),
    decoder_dims=(96, 48),
    decoder_depths=(1, 1),
    num_heads=2,
)
B, N = 4, 128


def clouds(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)


class TestM2AEGM3D:
    def test_loss_pred_in_outputs(self):
        model = PointM2AE(**KW)
        pts = clouds()
        vis = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model.init(jax.random.key(0), pts, vis)
        out = model.apply(variables, pts, vis)
        assert out["loss_pred"].shape == (B, 8)
        assert out["fine_to_coarse"].shape == (B, 32)

    def test_gm3d_step_loss_decreases(self):
        model = PointM2AE(**KW)
        pts = clouds(1)
        vis0 = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model.init(jax.random.key(0), pts, vis0)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx, with_ema=True)
        step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=0.75)
        scalars = {
            "keep_ratio": jnp.asarray(0.5),
            "ema_decay": jnp.asarray(0.99),
        }
        first = None
        for i in range(8):
            state, metrics = step(state, pts, jax.random.key(i), scalars)
            assert np.isfinite(float(metrics["loss"]))
            if first is None:
                first = float(metrics["loss_chfr"])
        assert float(metrics["loss_chfr"]) < first
        assert "loss_learn" in metrics
