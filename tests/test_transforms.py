"""Augmentation semantics (reference ``datasets/data_transforms.py``) and
SVM-probe jit hygiene."""

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.data import transforms as T


def _pts(batch=4, n=128, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal((batch, n, 3)).astype(np.float32))


class TestNewTransforms:
    def test_scale_range_and_per_sample(self):
        pts = _pts()
        out = T.scale(jax.random.key(0), pts)
        ratio = np.asarray(out / pts)  # (B, N, 3), constant over N per (b, axis)
        per_axis = ratio[:, 0, :]
        assert np.allclose(ratio, per_axis[:, None, :], atol=1e-5)
        assert (per_axis >= 2.0 / 3.0 - 1e-6).all() and (per_axis <= 1.5 + 1e-6).all()
        # anisotropic + per-sample: axes and samples differ
        assert np.std(per_axis) > 0

    def test_translate_range_and_per_sample(self):
        pts = _pts()
        out = T.translate(jax.random.key(1), pts)
        delta = np.asarray(out - pts)
        per_axis = delta[:, 0, :]
        assert np.allclose(delta, per_axis[:, None, :], atol=1e-6)
        assert (np.abs(per_axis) <= 0.2 + 1e-6).all()

    def test_horizontal_flip_preserves_upright_axis(self):
        pts = _pts()
        out = T.random_horizontal_flip(jax.random.key(2), pts, upright_axis=2)
        np.testing.assert_allclose(np.asarray(out[..., 2]), np.asarray(pts[..., 2]))

    def test_horizontal_flip_mirrors_about_max(self):
        pts = _pts(batch=64)
        out = np.asarray(T.random_horizontal_flip(jax.random.key(3), pts))
        pts_np = np.asarray(pts)
        for axis in (0, 1):
            flipped = ~np.isclose(out[:, 0, axis], pts_np[:, 0, axis])
            assert flipped.any() and (~flipped).any()  # both branches hit at B=64
            cmax = pts_np[flipped, :, axis].max(axis=1)
            np.testing.assert_allclose(
                out[flipped, :, axis], cmax[:, None] - pts_np[flipped, :, axis], atol=1e-5
            )

    def test_flip_is_jittable(self):
        f = jax.jit(T.random_horizontal_flip)
        out = f(jax.random.key(4), _pts())
        assert out.shape == (4, 128, 3)


class TestSvmProbeHygiene:
    def test_feature_fn_memoized_across_probes(self):
        """svm_probe must reuse ONE jitted feature fn per (model, npoints) —
        round-1 re-jit-per-validation bug (eval/svm.py)."""
        from gm3d_tpu.eval.svm import make_feature_fn
        from gm3d_tpu.models import PointMAE

        m = PointMAE(trans_dim=48, depth=1, num_heads=2, decoder_depth=1,
                     decoder_num_heads=2, group_size=8, num_group=16, encoder_dims=48)
        f1 = make_feature_fn(m, 64)
        assert make_feature_fn(m, 64) is f1
        assert make_feature_fn(m, 128) is not f1

        pts = jnp.zeros((2, 64, 3))
        mask = jnp.zeros((2, 16), bool).at[:, :9].set(True)
        v = m.init(jax.random.key(0), pts, mask, 9)
        f1(v, pts)
        n0 = f1._cache_size()
        make_feature_fn(m, 64)(v, pts)  # second probe, same shapes
        assert f1._cache_size() == n0
