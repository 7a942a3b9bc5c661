"""Multi-device data-parallel tests over the virtual 8-device CPU mesh
(SURVEY.md §4e): the sharded step must run, and produce the same numbers as
the single-device step (XLA psum == implicit DDP all-reduce)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models import GM3DStudent, PointMAE
from gm3d_tpu.parallel import make_mesh, replicate_tree, shard_batch
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.pretrain import make_gm3d_train_step, make_pointmae_train_step
from gm3d_tpu.train.state import create_train_state

SMALL = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1, decoder_num_heads=2,
             group_size=8, num_group=16, encoder_dims=48)
B, N = 16, 128


def clouds(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32) * 0.5)


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_batch_sharded_across_devices(self):
        mesh = make_mesh()
        batch = shard_batch(mesh, clouds())
        assert len(batch.sharding.device_set) == 8


class TestShardedTraining:
    def test_pointmae_sharded_matches_single(self):
        model = PointMAE(**SMALL)
        pts = clouds()
        mask0 = jnp.zeros((B, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(0), pts, mask0, 9)
        tx = build_adamw(1e-3)
        step = make_pointmae_train_step(model, tx, mask_ratio=0.6)

        s_single = create_train_state(variables, tx)
        s_single, m_single = step(s_single, pts, jax.random.key(1))

        mesh = make_mesh()
        s_shard = replicate_tree(mesh, create_train_state(variables, tx))
        pts_shard = shard_batch(mesh, pts)
        s_shard, m_shard = step(s_shard, pts_shard, jax.random.key(1))

        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-4
        )
        p1 = jax.tree.leaves(s_single.params)[0]
        p2 = jax.tree.leaves(s_shard.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)

    def test_gm3d_sharded_full_step(self):
        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = clouds(1)
        mask0 = jnp.zeros((B, 16), bool).at[:, :9].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, 9)
        tvars = teacher.init(jax.random.key(1), pts, mask0, 9)
        tx = build_adamw(1e-3)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)

        mesh = make_mesh()
        state = replicate_tree(mesh, create_train_state(svars, tx, with_ema=True))
        tvars = replicate_tree(mesh, tvars)
        scalars = replicate_tree(mesh, {
            "keep_ratio": jnp.asarray(0.5),
            "ema_decay": jnp.asarray(0.999),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(1.0),
        })
        state, metrics = step(state, tvars, shard_batch(mesh, pts), jax.random.key(2), scalars)
        assert np.isfinite(float(metrics["loss"]))
        # params stay replicated after the update
        leaf = jax.tree.leaves(state.params)[0]
        assert len(leaf.sharding.device_set) == 8

    def test_scaling_batch_shards_evenly(self):
        # 4-device submesh with batch 16 -> 4 per device
        mesh = make_mesh(4)
        batch = shard_batch(mesh, clouds())
        shard_shapes = {s.data.shape for s in batch.addressable_shards}
        assert shard_shapes == {(4, N, 3)}
