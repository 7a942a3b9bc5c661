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

    def test_m2ae_gm3d_sharded_matches_single(self):
        """The M2AE+GM3D overlay step (hierarchical masking + EMA loss-pred
        feedback) under the mesh == single-device numbers — same guarantee
        the flat GM3D step has (implicit DDP via GSPMD psum)."""
        from gm3d_tpu.models import PointM2AE
        from gm3d_tpu.train.pretrain import make_m2ae_gm3d_train_step

        model = PointM2AE(
            num_groups=(32, 16, 8), group_sizes=(8, 4, 4),
            encoder_depths=(1, 1, 1), encoder_dims=(24, 48, 96),
            local_radius=(0.32, 0.64, 1.28), decoder_dims=(96, 48),
            decoder_depths=(1, 1), num_heads=2,
        )
        pts = clouds(5)
        vis0 = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model.init(jax.random.key(0), pts, vis0)
        tx = build_adamw(1e-3)
        step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=0.75)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.99)}

        s1 = create_train_state(variables, tx, with_ema=True)
        new1, m1 = step(s1, pts, jax.random.key(3), scalars)

        mesh = make_mesh()
        s8 = replicate_tree(mesh, create_train_state(variables, tx, with_ema=True))
        new8, m8 = step(s8, shard_batch(mesh, pts), jax.random.key(3), scalars)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)
        p1 = jax.tree.leaves(new1.params)[0]
        p8 = jax.tree.leaves(new8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
        assert len(p8.sharding.device_set) == 8

    def test_finetune_sharded_matches_single(self):
        """Downstream classification step (PointTransformer with BatchNorm,
        in-jit FPS+subsample+augment) under the mesh == single-device —
        including the BN RUNNING stats (SyncBN-by-construction on the path
        that produces 5 of the 13 BASELINE rows)."""
        from gm3d_tpu.models import PointTransformer
        from gm3d_tpu.train.finetune import make_finetune_train_step
        from gm3d_tpu.train.optim import build_finetune_optimizer

        model = PointTransformer(cls_dim=5, trans_dim=48, depth=2, num_heads=2,
                                 group_size=8, num_group=16, encoder_dims=48)
        rng = np.random.default_rng(7)
        pts = jnp.asarray(rng.standard_normal((B, 1400, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, B))
        variables = model.init(jax.random.key(0), pts[:, :1024])
        tx = build_finetune_optimizer(variables["params"], 1e-3)
        step = make_finetune_train_step(model, tx, npoints=1024)

        s1 = create_train_state(variables, tx)
        s1, m1 = step(s1, pts, labels, jax.random.key(2))

        mesh = make_mesh()
        s8 = replicate_tree(mesh, create_train_state(variables, tx))
        s8, m8 = step(s8, shard_batch(mesh, pts), shard_batch(mesh, labels),
                      jax.random.key(2))
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
        p1 = jax.tree.leaves(s1.params)[0]
        p8 = jax.tree.leaves(s8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)
        bs1 = np.asarray(jax.tree.leaves(s1.batch_stats)[0])
        bs8 = np.asarray(jax.tree.leaves(s8.batch_stats)[0])
        np.testing.assert_allclose(bs8, bs1, atol=1e-5)

    def test_multi_step_scan_sharded_matches_single(self):
        """The CLIs' actual hot path: K scan-fused steps over a mesh-sharded
        batch STACK (cli/finetune.py jnp.stack's per-batch sharded arrays —
        the stack must keep the batch dim sharded, spec (None, 'data'), and
        match single-device sequential numerics)."""
        from gm3d_tpu.models import PointTransformer
        from gm3d_tpu.train.finetune import (
            make_finetune_multi_step,
            make_finetune_train_step,
        )
        from gm3d_tpu.train.optim import build_finetune_optimizer

        model = PointTransformer(cls_dim=5, trans_dim=48, depth=2, num_heads=2,
                                 group_size=8, num_group=16, encoder_dims=48)
        rng = np.random.default_rng(11)
        pts = [jnp.asarray(rng.standard_normal((B, 1400, 3)).astype(np.float32))
               for _ in range(2)]
        labels = [jnp.asarray(rng.integers(0, 5, B)) for _ in range(2)]
        keys = jax.random.split(jax.random.key(6), 2)
        variables = model.init(jax.random.key(0), pts[0][:, :1024])
        tx = build_finetune_optimizer(variables["params"], 1e-3)
        step = make_finetune_train_step(model, tx, npoints=1024)
        multi = make_finetune_multi_step(step)

        s1 = create_train_state(variables, tx)
        losses = []
        for k in range(2):
            s1, m = step(s1, pts[k], labels[k], keys[k])
            losses.append(float(m["loss"]))

        mesh = make_mesh()
        stack = jnp.stack([shard_batch(mesh, p) for p in pts])
        lstack = jnp.stack([shard_batch(mesh, l) for l in labels])
        # the stack must NOT silently gather: batch dim stays on the mesh
        assert len(stack.sharding.device_set) == 8
        s8 = replicate_tree(mesh, create_train_state(variables, tx))
        s8, m8 = multi(s8, stack, lstack, keys)
        np.testing.assert_allclose(np.asarray(m8["loss"]), np.asarray(losses),
                                   rtol=1e-4)
        p1 = np.asarray(jax.tree.leaves(s1.params)[0])
        p8 = np.asarray(jax.tree.leaves(s8.params)[0])
        np.testing.assert_allclose(p8, p1, atol=1e-5)

    def test_scaling_batch_shards_evenly(self):
        # 4-device submesh with batch 16 -> 4 per device
        mesh = make_mesh(4)
        batch = shard_batch(mesh, clouds())
        shard_shapes = {s.data.shape for s in batch.addressable_shards}
        assert shard_shapes == {(4, N, 3)}


class TestCliMeshWiring:
    """CLI data-parallel plumbing (round-1 gap: helpers existed but no entry
    point created a mesh or sharded a batch)."""

    def _args(self, num_devices=None):
        import argparse

        return argparse.Namespace(num_devices=num_devices)

    def test_setup_mesh_all_devices(self):
        from gm3d_tpu.cli.common import setup_mesh

        mesh, bshard = setup_mesh(self._args(), batch=16)
        assert mesh.devices.size == 8
        x = jax.device_put(clouds(), bshard)
        assert len(x.sharding.device_set) == 8

    def test_setup_mesh_rejects_indivisible_batch(self):
        from gm3d_tpu.cli.common import setup_mesh

        with pytest.raises(ValueError, match="not divisible"):
            setup_mesh(self._args(), batch=12)

    def test_prefetch_shards_labelled_tuples(self):
        """finetune feeds (points, labels) tuples through device_prefetch —
        both leaves must land batch-sharded on the mesh."""
        from gm3d_tpu.cli.common import setup_mesh
        from gm3d_tpu.data.prefetch import device_prefetch

        mesh, bshard = setup_mesh(self._args(), batch=16)
        batches = [(np.zeros((16, 32, 3), np.float32), np.zeros((16,), np.int64))]
        out = list(device_prefetch(batches, sharding=bshard))
        assert len(out) == 1
        pts, labels = out[0]
        assert len(pts.sharding.device_set) == 8
        assert len(labels.sharding.device_set) == 8

    def test_sharded_step_with_replicated_state_matches_single(self):
        """The exact CLI recipe: replicate_tree(state) + sharded batch into
        the unmodified jitted gm3d step == single-device numbers."""
        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = clouds(7)
        num_mask = 10
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=10 / 16)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999),
                   "w_mse": jnp.asarray(1.0), "w_cd": jnp.asarray(1.0)}

        state1 = create_train_state(svars, tx, with_ema=True)
        _, m_single = step(state1, tvars, pts, jax.random.key(3), scalars)

        mesh = make_mesh()
        state8 = replicate_tree(mesh, create_train_state(svars, tx, with_ema=True))
        tvars8 = replicate_tree(mesh, tvars)
        new8, m_shard = step(state8, tvars8, shard_batch(mesh, pts), jax.random.key(3), scalars)
        np.testing.assert_allclose(float(m_shard["loss"]), float(m_single["loss"]), rtol=1e-5)
        np.testing.assert_allclose(float(m_shard["grad_norm"]), float(m_single["grad_norm"]),
                                   rtol=1e-4)
        # updated params stay replicated for the next step
        leaf = jax.tree.leaves(new8.params)[0]
        assert len(leaf.sharding.device_set) == 8


class TestSyncBatchNorm:
    def test_sharded_bn_stats_equal_full_batch_stats(self):
        """--sync_bn parity (tools/runner_pretrain.py:88-91): under jit+GSPMD
        a batch-axis reduction is GLOBAL, so BatchNorm running stats on the
        sharded step equal the full-batch single-device stats — SyncBN is the
        inherent (and only) semantics here, no shard_map needed."""
        model = PointMAE(**SMALL)
        pts = clouds(11)
        num_mask = 10
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        variables = model.init(jax.random.key(0), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        step = make_pointmae_train_step(model, tx, 10 / 16, augment=False)

        s1 = create_train_state(variables, tx)
        s1, _ = step(s1, pts, jax.random.key(3))
        mesh = make_mesh()
        s8 = replicate_tree(mesh, create_train_state(variables, tx))
        s8, _ = step(s8, shard_batch(mesh, pts), jax.random.key(3))

        for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(s8.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFusedAttentionShardMap:
    """Round-5 (verdict r4 #2): the fused-attention Pallas kernel under
    ``shard_map`` over the data axis — each device runs the proven
    single-device kernel on its batch shard (interpret-mode pallas on the
    CPU mesh validates the partitioning/transpose logic; Mosaic codegen is
    hardware-proven single-chip). Sharded numerics must equal the XLA
    reference forward AND backward, including the psum of replicated-weight
    cotangents inserted by shard_map's transpose."""

    def _operands(self, B=16, L=16, D=96, seed=0):
        rng = np.random.default_rng(seed)
        return [
            jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.05),
        ]

    def test_sharded_kernel_matches_reference_fwd_and_grads(self):
        from jax.sharding import PartitionSpec as P

        from gm3d_tpu.ops.fused_attention import (
            fused_attention_trainable, reference_attention)

        mesh = make_mesh()
        axis = mesh.axis_names[0]
        H = 6
        args = self._operands()
        cot = jnp.asarray(
            np.random.default_rng(9).standard_normal(args[0].shape).astype(np.float32))

        def fused(*a):
            return jax.shard_map(
                lambda xs, wq, bq, wp, bp: fused_attention_trainable(
                    xs, wq, bq, wp, bp, H, 2, True),
                mesh=mesh, in_specs=(P(axis), P(), P(), P(), P()),
                out_specs=P(axis), check_vma=False,
            )(*a)

        y = fused(*args)
        ref = reference_attention(*args, H)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)

        g_fused = jax.grad(
            lambda *a: jnp.sum(fused(*a) * cot), argnums=tuple(range(5)))(*args)
        g_ref = jax.grad(
            lambda *a: jnp.sum(reference_attention(*a, H) * cot),
            argnums=tuple(range(5)))(*args)
        for gf, gr in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                       rtol=2e-4, atol=2e-4)

    def test_attention_module_sharded_route_matches_unfused(self, monkeypatch):
        """The in-model route with a registered mesh: same params, same
        output, same param-gradients as the unfused XLA path — and the
        local block size is chosen from the per-shard batch."""
        import functools

        import gm3d_tpu.models.blocks as blocks
        import gm3d_tpu.ops.fused_attention as fa
        from gm3d_tpu.models.blocks import (
            Attention, fused_attention_scope, set_fused_attention_mesh)

        attn = Attention(dim=96, num_heads=6)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((16, 16, 96)).astype(np.float32))
        variables = attn.init(jax.random.key(0), x)

        def loss(v, x):
            return jnp.sum(attn.apply(v, x) ** 2)

        base = attn.apply(variables, x)
        g_base = jax.grad(loss)(variables, x)

        monkeypatch.setattr(blocks, "_fused_available", lambda: True)
        monkeypatch.setattr(fa, "fused_attention_trainable",
                            functools.partial(fa.fused_attention_trainable,
                                              interpret=True))
        mesh = make_mesh()
        set_fused_attention_mesh(mesh)
        try:
            with fused_attention_scope():
                fused = attn.apply(variables, shard_batch(mesh, x))
                g_fused = jax.grad(loss)(replicate_tree(mesh, variables),
                                         shard_batch(mesh, x))
        finally:
            set_fused_attention_mesh(None)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)
        for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_base)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_gm3d_sharded_step_fused_matches_single_device_fused(self, monkeypatch):
        """The FULL GM3D train step with the fused route engaged under the
        8-device mesh must reproduce the single-device fused step (params
        after one update) — the end-to-end guarantee that lifting the
        single-device gate does not change training numerics on a pod."""
        import functools

        import gm3d_tpu.models.blocks as blocks
        import gm3d_tpu.ops.fused_attention as fa
        from gm3d_tpu.models.blocks import set_fused_attention_mesh

        monkeypatch.setattr(blocks, "_fused_available", lambda: True)
        monkeypatch.setattr(fa, "fused_attention_trainable",
                            functools.partial(fa.fused_attention_trainable,
                                              interpret=True))

        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = clouds(3)
        num_mask = 10
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
        # SGD(1.0): the post-step param delta IS the gradient, so the param
        # comparison below compares gradients directly. (Adam at step 1 maps
        # grads to ~sign(grad): near-zero-grad elements flip sign under the
        # kernel's different fp summation order and show O(lr) diffs that
        # say nothing about correctness — round-3 trajectory learning.)
        import optax

        tx = optax.sgd(1.0)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999),
                   "w_mse": jnp.asarray(1.0), "w_cd": jnp.asarray(1.0)}
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)

        s1 = create_train_state(svars, tx, with_ema=True)
        s1, m1 = step(s1, tvars, pts, jax.random.key(2), scalars)

        mesh = make_mesh()
        set_fused_attention_mesh(mesh)
        try:
            s8 = replicate_tree(mesh, create_train_state(svars, tx, with_ema=True))
            s8, m8 = step(s8, replicate_tree(mesh, tvars), shard_batch(mesh, pts),
                          jax.random.key(2), replicate_tree(mesh, scalars))
        finally:
            set_fused_attention_mesh(None)
        np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-4)
        np.testing.assert_allclose(float(m8["grad_norm"]), float(m1["grad_norm"]),
                                   rtol=1e-3)
        for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


class TestPallasKNNShardMap:
    """Round-5: the exact-KNN Pallas kernel under shard_map over the data
    axis (ops/knn.py::knn_indices multi-device route) — sharded interpret-
    mode results must equal the XLA route's neighbor sets and the numpy
    brute-force distances, so lifting it onto a pod cannot change geometry."""

    def test_sharded_knn_matches_xla_sets(self, monkeypatch):
        import functools

        import gm3d_tpu.ops.knn as knn_mod
        from gm3d_tpu.parallel.context import set_compute_mesh

        monkeypatch.setattr(knn_mod.jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            knn_mod, "knn_indices_pallas",
            functools.partial(knn_mod.knn_indices_pallas, interpret=True))
        monkeypatch.setenv("GM3D_PALLAS_KNN_MIN_REF", "129")

        Bk, Nr, G, k = 16, 256, 64, 8
        rng = np.random.default_rng(4)
        ref = jnp.asarray(rng.standard_normal((Bk, Nr, 3)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((Bk, G, 3)).astype(np.float32))

        mesh = make_mesh()
        set_compute_mesh(mesh)
        try:
            kdist, idx = knn_mod.knn_indices(
                shard_batch(mesh, ref), shard_batch(mesh, q), k,
                return_dist=True)
        finally:
            set_compute_mesh(None)
        idx_x = knn_mod.knn_indices_xla(ref, q, k)
        ip, ix = np.asarray(idx), np.asarray(idx_x)
        for b in range(Bk):
            for g in range(G):
                assert set(ip[b, g]) == set(ix[b, g])
        dist_full = ((np.asarray(q)[:, :, None, :]
                      - np.asarray(ref)[:, None, :, :]) ** 2).sum(-1)
        np_d = np.sort(dist_full, axis=-1)[..., :k]
        np.testing.assert_allclose(np.asarray(kdist), np_d, atol=1e-4)

    def test_ragged_batch_falls_back_to_xla(self, monkeypatch):
        """A batch that does not divide the mesh must silently take the XLA
        route (eval loaders end ragged), never a shard_map error."""
        import gm3d_tpu.ops.knn as knn_mod
        from gm3d_tpu.parallel.context import set_compute_mesh

        monkeypatch.setattr(knn_mod.jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("GM3D_PALLAS_KNN_MIN_REF", "129")
        rng = np.random.default_rng(5)
        ref = jnp.asarray(rng.standard_normal((3, 256, 3)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((3, 16, 3)).astype(np.float32))
        set_compute_mesh(make_mesh())
        try:
            idx = knn_mod.knn_indices(ref, q, 4)  # 3 % 8 != 0 -> XLA
        finally:
            set_compute_mesh(None)
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx), -1),
            np.sort(np.asarray(knn_mod.knn_indices_xla(ref, q, 4)), -1))
