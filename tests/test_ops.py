"""Kernel-vs-numpy-oracle tests for the geometry ops (SURVEY.md §4a).

The FPS oracle mirrors the numpy FPS the reference itself ships at
``datasets/ModelNetDataset.py:25-46`` (adapted to the CUDA seeding rule:
first selected point is index 0).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gm3d_tpu.ops import (
    fps,
    fps_indices,
    knn_indices,
    group_points,
    chamfer_per_point,
    chamfer_l1,
    chamfer_l2,
    chamfer_group,
    emd_loss,
)
from gm3d_tpu.ops.fps import fps_indices_jax, fps_indices_pallas


def numpy_fps_indices(xyz: np.ndarray, n: int) -> np.ndarray:
    """Oracle FPS, one cloud: (N, 3) -> (n,) indices. Seeded at index 0."""
    num = xyz.shape[0]
    idxs = np.zeros(n, dtype=np.int64)
    dist = np.full(num, np.inf)
    last = 0
    for i in range(1, n):
        d = np.sum((xyz - xyz[last]) ** 2, axis=-1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        idxs[i] = last
    return idxs


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    return rng.standard_normal((4, 256, 3)).astype(np.float32)


class TestFPS:
    def test_jax_matches_numpy_oracle(self, clouds):
        got = np.asarray(fps_indices_jax(jnp.asarray(clouds), 32))
        want = np.stack([numpy_fps_indices(c, 32) for c in clouds])
        np.testing.assert_array_equal(got, want)

    def test_pallas_interpret_matches_oracle(self, clouds):
        got = np.asarray(fps_indices_pallas(jnp.asarray(clouds), 32, interpret=True))
        want = np.stack([numpy_fps_indices(c, 32) for c in clouds])
        np.testing.assert_array_equal(got, want)

    def test_fps_gather_shape(self, clouds):
        out = fps(jnp.asarray(clouds), 64)
        assert out.shape == (4, 64, 3)
        # first sampled point is point 0 (CUDA seeding rule)
        np.testing.assert_allclose(np.asarray(out[:, 0]), clouds[:, 0])

    def test_jittable(self, clouds):
        f = jax.jit(lambda x: fps_indices(x, 16))
        out = f(jnp.asarray(clouds))
        assert out.shape == (4, 16)

    def test_non_multiple_of_128(self):
        rng = np.random.default_rng(3)
        pts = rng.standard_normal((2, 200, 3)).astype(np.float32)
        got = np.asarray(fps_indices_pallas(jnp.asarray(pts), 24, interpret=True))
        want = np.stack([numpy_fps_indices(c, 24) for c in pts])
        np.testing.assert_array_equal(got, want)

    def test_tiny_clouds_avoid_pallas_on_tpu(self, monkeypatch):
        """N <= 128 (one padded lane tile) must take the XLA loop even on a
        TPU backend: the real v5e Mosaic toolchain fails to legalize the
        batched kernel's per-row argmax at a single lane tile (probed
        2026-08: n<=128 fails, n>=200 compiles). Simulated by making the
        Pallas branch explode if taken."""
        import importlib

        fps_mod = importlib.import_module("gm3d_tpu.ops.fps")
        rng = np.random.default_rng(4)

        def boom(*a, **k):
            raise AssertionError("Pallas FPS reached for a tiny cloud")

        monkeypatch.setattr(fps_mod, "fps_indices_pallas_batched", boom)
        monkeypatch.setattr(fps_mod.jax, "default_backend", lambda: "tpu")
        tiny = rng.standard_normal((2, 64, 3)).astype(np.float32)
        with jax.disable_jit():
            got = np.asarray(fps_mod.fps_indices(jnp.asarray(tiny), 16))
        want = np.stack([numpy_fps_indices(c, 16) for c in tiny])
        np.testing.assert_array_equal(got, want)
        # above one lane tile the kernel branch IS taken
        big = rng.standard_normal((2, 200, 3)).astype(np.float32)
        with pytest.raises(AssertionError, match="Pallas FPS"):
            with jax.disable_jit():
                fps_mod.fps_indices(jnp.asarray(big), 16)


class TestKNN:
    def test_matches_numpy(self, clouds):
        q = clouds[:, :16]
        idx = np.asarray(knn_indices(jnp.asarray(clouds), jnp.asarray(q), 8))
        for b in range(clouds.shape[0]):
            d = np.sum((q[b][:, None] - clouds[b][None]) ** 2, axis=-1)
            want = np.argsort(d, axis=-1, kind="stable")[:, :8]
            got_d = np.take_along_axis(d, idx[b], axis=-1)
            want_d = np.take_along_axis(d, want, axis=-1)
            np.testing.assert_allclose(got_d, want_d, atol=1e-4)

    def test_returns_sorted_distances(self, clouds):
        dist, idx = knn_indices(jnp.asarray(clouds), jnp.asarray(clouds[:, :8]), 4, return_dist=True)
        d = np.asarray(dist)
        assert np.all(np.diff(d, axis=-1) >= -1e-6)
        # nearest neighbour of a reference point is itself
        np.testing.assert_array_equal(np.asarray(idx)[:, :, 0], np.arange(8)[None].repeat(4, 0))


class TestGroup:
    def test_shapes_and_normalisation(self, clouds):
        g = group_points(jnp.asarray(clouds), num_group=16, group_size=8)
        assert g.neighborhood.shape == (4, 16, 8, 3)
        assert g.center.shape == (4, 16, 3)
        assert g.neighborhood_org.shape == (4, 16, 8, 3)
        np.testing.assert_allclose(
            np.asarray(g.neighborhood_org - g.center[:, :, None]),
            np.asarray(g.neighborhood),
            atol=1e-6,
        )
        # nearest member of each group is its center
        np.testing.assert_allclose(
            np.asarray(g.neighborhood_org[:, :, 0]), np.asarray(g.center), atol=1e-6
        )


class TestChamfer:
    def test_per_point_matches_numpy(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((5, 32, 3)).astype(np.float32)
        b = rng.standard_normal((5, 24, 3)).astype(np.float32)
        da, db = chamfer_per_point(jnp.asarray(a), jnp.asarray(b))
        d = np.sum((a[:, :, None] - b[:, None]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(da), d.min(-1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(db), d.min(-2), atol=1e-4)

    def test_identical_clouds_zero(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.standard_normal((3, 16, 3)).astype(np.float32))
        # quadratic-expansion distance leaves ~1e-6 float residue on the diagonal
        assert float(chamfer_l2(a, a)) < 1e-5
        assert float(chamfer_l1(a, a)) < 1e-2

    def test_group_reduction(self):
        rng = np.random.default_rng(4)
        a = rng.standard_normal((2, 6, 16, 3)).astype(np.float32)
        b = rng.standard_normal((2, 6, 16, 3)).astype(np.float32)
        per_group = chamfer_group(jnp.asarray(a), jnp.asarray(b))
        assert per_group.shape == (2, 6)
        # scalar L2 on flattened pairs equals mean of group values
        flat = np.mean(
            [float(chamfer_l2(jnp.asarray(a[i, j]), jnp.asarray(b[i, j]))) for i in range(2) for j in range(6)]
        )
        np.testing.assert_allclose(float(per_group.mean()), flat, rtol=1e-5)


class TestEMD:
    def test_identity_is_zero(self):
        rng = np.random.default_rng(5)
        a = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
        # entropic regularisation leaves a small positive bias at identity
        assert float(emd_loss(a, a).max()) < 5e-2

    def test_translation_cost(self):
        rng = np.random.default_rng(6)
        a = rng.standard_normal((1, 32, 3)).astype(np.float32)
        b = a + np.array([1.0, 0.0, 0.0], np.float32)
        got = float(emd_loss(jnp.asarray(a), jnp.asarray(b))[0])
        # optimal transport of a pure translation costs ~ ||t||^2 = 1
        assert 0.7 < got < 1.4

    def test_emd_upper_bounds_chamfer(self):
        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.standard_normal((3, 32, 3)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((3, 32, 3)).astype(np.float32))
        emd = np.asarray(emd_loss(a, b))
        cd = np.asarray(chamfer_group(a, b)) / 2.0
        assert np.all(emd > cd * 0.5)


class TestBatchedPallasFPS:
    def test_matches_oracle_multiple_tiles(self):
        from gm3d_tpu.ops.fps import fps_indices_pallas_batched

        rng = np.random.default_rng(11)
        pts = rng.standard_normal((10, 200, 3)).astype(np.float32)
        got = np.asarray(
            fps_indices_pallas_batched(jnp.asarray(pts), 24, batch_tile=4, interpret=True)
        )
        want = np.stack([numpy_fps_indices(c, 24) for c in pts])
        np.testing.assert_array_equal(got, want)

    def test_large_n_samples(self):
        from gm3d_tpu.ops.fps import fps_indices_pallas_batched

        rng = np.random.default_rng(12)
        pts = rng.standard_normal((2, 512, 3)).astype(np.float32)
        got = np.asarray(
            fps_indices_pallas_batched(jnp.asarray(pts), 300, batch_tile=2, interpret=True)
        )
        want = np.stack([numpy_fps_indices(c, 300) for c in pts])
        np.testing.assert_array_equal(got, want)


class TestEmdAuction:
    """Auction EMD (the reference extension's algorithm, ops/emd.py)."""

    def test_matches_hungarian_within_n_eps(self):
        from scipy.optimize import linear_sum_assignment

        from gm3d_tpu.ops.emd import emd_auction

        rng = np.random.default_rng(11)
        n, eps = 16, 0.002
        a = rng.standard_normal((4, n, 3)).astype(np.float32)
        b = rng.standard_normal((4, n, 3)).astype(np.float32)
        got = np.asarray(emd_auction(jnp.asarray(a), jnp.asarray(b), eps=eps))
        for i in range(4):
            cost = ((a[i][:, None] - b[i][None]) ** 2).sum(-1)
            r, c = linear_sum_assignment(cost)
            exact = cost[r, c].mean()
            # eps is relative to max(cost) (ops/emd.py); a valid one-to-one
            # assignment can never beat the optimum
            assert exact <= got[i] + 1e-6, "auction beat the optimum?!"
            bound = n * eps * cost.max()
            assert got[i] <= exact + bound + 1e-6, (got[i], exact, bound)

    def test_identity_matching_is_zero(self):
        from gm3d_tpu.ops.emd import emd_auction

        rng = np.random.default_rng(13)
        a = rng.standard_normal((2, 32, 3)).astype(np.float32)
        perm = rng.permutation(32)
        b = a[:, perm]
        got = np.asarray(emd_auction(jnp.asarray(a), jnp.asarray(b), eps=1e-4))
        # permuted-identity max cost scale ~ tens; relative eps keeps the
        # bound tight
        assert got.max() < 0.05

    def test_jittable(self):
        from gm3d_tpu.ops.emd import emd_auction

        f = jax.jit(lambda a, b: emd_auction(a, b))
        rng = np.random.default_rng(17)
        a = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
        out = np.asarray(f(a, b))
        assert out.shape == (2,) and np.isfinite(out).all()


class TestFusedAttention:
    """Fused attention Pallas kernel (ops/fused_attention.py, the round-4
    timeboxed experiment): interpret-mode output must match the XLA baseline
    bit-for-bit at the GM3D shapes — identical math, identical weight layout."""

    def test_matches_reference_math(self):
        from gm3d_tpu.ops.fused_attention import fused_attention, reference_attention

        rng = np.random.default_rng(0)
        B, L, D, H = 16, 64, 384, 6
        x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
        wqkv = jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.05)
        bqkv = jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32) * 0.05)
        wproj = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.05)
        bproj = jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.05)
        ref = reference_attention(x, wqkv, bqkv, wproj, bproj, H)
        got = fused_attention(x, wqkv, bqkv, wproj, bproj, H, block_batch=8,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_attention_module_fused_route_matches_unfused(self, monkeypatch):
        """The in-model fused route (blocks.Attention under
        fused_attention_scope) must read the SAME params nn.Dense created and
        reproduce the unfused output — pinning the (3, H, hd) weight-layout
        contract between the module and the kernel."""
        import functools

        import gm3d_tpu.models.blocks as blocks
        import gm3d_tpu.ops.fused_attention as fa
        from gm3d_tpu.models.blocks import Attention, fused_attention_scope

        attn = Attention(dim=96, num_heads=6)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 16, 96)).astype(np.float32))
        variables = attn.init(jax.random.key(0), x)
        base = attn.apply(variables, x)

        monkeypatch.setattr(blocks, "_fused_available", lambda: True)
        monkeypatch.setattr(fa, "fused_attention_trainable",
                            functools.partial(fa.fused_attention_trainable,
                                              interpret=True))
        with fused_attention_scope():
            fused = attn.apply(variables, x)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                   rtol=2e-5, atol=2e-5)
        # scope off -> bitwise the unfused path
        with fused_attention_scope(False):
            off = attn.apply(variables, x)
        np.testing.assert_array_equal(np.asarray(off), np.asarray(base))
        # an attn_mask must force the XLA path even inside the scope (the
        # kernel has no mask support): M2AE local-radius attention is safe
        mask = jnp.ones((8, 16, 16), bool)
        with fused_attention_scope():
            masked = attn.apply(variables, x, attn_mask=mask)
        np.testing.assert_allclose(np.asarray(masked), np.asarray(base),
                                   rtol=1e-6)

    def test_trainable_vjp_matches_reference_grads(self):
        """The custom-VJP backward kernel must reproduce jax.grad of the XLA
        math for EVERY input (x, packed qkv weights/bias, proj weights/bias)
        to fp32 precision — this is what lets the fused route serve the
        differentiated student forward+backward."""
        from gm3d_tpu.ops.fused_attention import (
            fused_attention_trainable, reference_attention)

        rng = np.random.default_rng(3)
        B, L, D, H = 8, 16, 96, 6
        args = [
            jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)),
            jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((3 * D,)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.05),
            jnp.asarray(rng.standard_normal((D,)).astype(np.float32) * 0.05),
        ]
        cot = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))

        def loss_fused(*a):
            return jnp.sum(fused_attention_trainable(
                *a, heads=H, block_batch=4, interpret=True) * cot)

        def loss_ref(*a):
            return jnp.sum(reference_attention(*a, heads=H) * cot)

        g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
        for name, a, b in zip(("dx", "dwqkv", "dbqkv", "dwproj", "dbp"), g_f, g_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"{name} diverged from reference autodiff")

    def test_attention_module_fused_route_grads_match(self, monkeypatch):
        """Gradients THROUGH the in-model fused route (via _DenseParams'
        shared param tree) must equal the unfused module's gradients."""
        import functools

        import gm3d_tpu.models.blocks as blocks
        import gm3d_tpu.ops.fused_attention as fa
        from gm3d_tpu.models.blocks import Attention, fused_attention_scope

        attn = Attention(dim=96, num_heads=6)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((8, 16, 96)).astype(np.float32))
        variables = attn.init(jax.random.key(0), x)
        cot = jnp.asarray(rng.standard_normal((8, 16, 96)).astype(np.float32))

        def loss(params, fused):
            if fused:
                with fused_attention_scope():
                    y = attn.apply({"params": params}, x)
            else:
                y = attn.apply({"params": params}, x)
            return jnp.sum(y * cot)

        g_base = jax.grad(loss)(variables["params"], False)
        monkeypatch.setattr(blocks, "_fused_available", lambda: True)
        monkeypatch.setattr(fa, "fused_attention_trainable",
                            functools.partial(fa.fused_attention_trainable,
                                              interpret=True))
        g_fused = jax.grad(loss)(variables["params"], True)
        flat_b = jax.tree_util.tree_leaves_with_path(g_base)
        flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fused))
        assert len(flat_b) == len(flat_f) == 3  # qkv kernel, proj kernel+bias
        for path, leaf in flat_b:
            np.testing.assert_allclose(
                np.asarray(flat_f[path]), np.asarray(leaf), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch at {path}")


class TestFusedBlockBatch:
    def test_block_cap_keeps_backward_kernel_in_vmem(self):
        """bt*seq <= 512: the backward kernel holds ~6 (bt*seq)^2 fp32
        arrays on the VMEM stack — bt*seq = 1024 is a hard Mosaic
        compile OOM (23 MB > 16 MB scoped limit, hit at the M2AE decoder
        shapes in the round-5 lever sweep). The GM3D hot configuration
        (8 clouds x 64 tokens = 512) must survive the cap."""
        from gm3d_tpu.models.blocks import _fused_block_batch

        assert _fused_block_batch(256, 64) == 8    # GM3D hot path (bf16)
        assert _fused_block_batch(128, 64) == 8
        assert _fused_block_batch(128, 512) == 1   # M2AE finest decoder scale
        assert _fused_block_batch(128, 256) == 2
        assert _fused_block_batch(128, 600) is None  # no bt fits the cap
        # fp32 operand blocks double: bt=8 x 64 allocates 16.18 MB and OOMs
        # (caught by the round-5 soak at the CLI's default dtype) — the fp32
        # cap is 256
        assert _fused_block_batch(256, 64, jnp.float32) == 4
        assert _fused_block_batch(128, 256, jnp.float32) == 1
        assert _fused_block_batch(256, 64, jnp.bfloat16) == 8
        for batch, seq in ((256, 64), (128, 512), (128, 256), (50, 16)):
            bt = _fused_block_batch(batch, seq)
            if bt is not None:
                assert batch % bt == 0 and bt * seq <= 512


class TestPallasKNN:
    """Round-5 Pallas exact-KNN kernel (ops/knn.py): in-VMEM distance +
    k-extraction must match the XLA approx_min_k route and a numpy brute
    force — exact sets, ascending distances — at every shipped shape."""

    @pytest.mark.parametrize("shape", [
        (2, 2048, 512, 16),  # M2AE scale 0
        (2, 512, 256, 8),    # M2AE scale 1
        (2, 256, 64, 8),     # M2AE scale 2
        (2, 1024, 64, 32),   # GM3D grouping
        (2, 300, 100, 7),    # ragged/padded
        (2, 64, 512, 1),     # nearest-coarse back-projection (1-NN)
    ])
    def test_matches_numpy_and_xla(self, shape):
        from gm3d_tpu.ops.knn import knn_indices_pallas, knn_indices_xla

        B, N, G, k = shape
        rng = np.random.default_rng(hash(shape) % 2**31)
        ref = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
        q = jnp.asarray(rng.standard_normal((B, G, 3)).astype(np.float32))
        idx_p, d_p = knn_indices_pallas(ref, q, k, interpret=True)
        idx_x = knn_indices_xla(ref, q, k)
        dp, ip, ix = np.asarray(d_p), np.asarray(idx_p), np.asarray(idx_x)
        for b in range(B):
            for g in range(G):
                assert set(ip[b, g]) == set(ix[b, g])
        assert (np.diff(dp, axis=-1) >= -1e-6).all(), "not ascending"
        dist_full = ((np.asarray(q)[:, :, None, :]
                      - np.asarray(ref)[:, None, :, :]) ** 2).sum(-1)
        np_d = np.sort(dist_full, axis=-1)[..., :k]
        np.testing.assert_allclose(dp, np_d, atol=1e-4)

    def test_route_gating(self, monkeypatch):
        from gm3d_tpu.ops import knn as knn_mod

        # CPU backend -> XLA route regardless
        assert not knn_mod._pallas_route(2048, 16)
        monkeypatch.setattr(knn_mod.jax, "default_backend", lambda: "tpu")
        assert knn_mod._pallas_route(2048, 16)
        assert knn_mod._pallas_route(1024, 32)       # GM3D grouping
        assert not knn_mod._pallas_route(512, 8)     # below the measured
        assert not knn_mod._pallas_route(64, 16)     # threshold: XLA wins
        assert not knn_mod._pallas_route(2048, 256)  # k > lane tile
        monkeypatch.setenv("GM3D_PALLAS_KNN_MIN_REF", "129")
        assert knn_mod._pallas_route(512, 8)         # threshold is a lever
        monkeypatch.setenv("GM3D_DISABLE_PALLAS_KNN", "1")
        assert not knn_mod._pallas_route(2048, 16)   # kill switch
        monkeypatch.delenv("GM3D_DISABLE_PALLAS_KNN")
        from gm3d_tpu.ops.knn import portable_knn

        with portable_knn():                          # export scope
            assert not knn_mod._pallas_route(2048, 16)
