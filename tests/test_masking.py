"""Mask-selection statistical tests (SURVEY.md §4c)."""

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.masking import block_mask, geometric_mask, keep_ratio_schedule, random_mask

B, G = 8, 64


class TestRandomMask:
    def test_exact_count(self):
        mask = random_mask(jax.random.key(0), B, G, 38)
        assert mask.shape == (B, G)
        np.testing.assert_array_equal(np.asarray(mask.sum(-1)), 38)

    def test_uniform_coverage(self):
        keys = jax.random.split(jax.random.key(1), 200)
        counts = np.zeros(G)
        for k in keys:
            counts += np.asarray(random_mask(k, 1, G, 32))[0]
        # each position masked ~ 50% of the time
        assert abs(counts.mean() - 100) < 1e-6
        assert counts.std() < 25


class TestBlockMask:
    def test_contiguity(self):
        rng = np.random.default_rng(0)
        centers = jnp.asarray(rng.standard_normal((B, G, 3)).astype(np.float32))
        mask = block_mask(jax.random.key(0), centers, 38)
        np.testing.assert_array_equal(np.asarray(mask.sum(-1)), 38)
        # masked set is a metric ball: max masked distance to the closest
        # masked point's neighbourhood should be below min unmasked distance
        # to the seed — verify via seed = masked point with min max-dist
        c = np.asarray(centers)
        m = np.asarray(mask)
        for b in range(B):
            dm = ((c[b][:, None] - c[b][None]) ** 2).sum(-1)
            # find a masked point s.t. all masked are its 38 nearest
            found = False
            for s in range(G):
                order = np.argsort(dm[s], kind="stable")[:38]
                if m[b][order].all():
                    found = True
                    break
            assert found


class TestGeometricMask:
    def test_pure_random_when_ratio_zero(self):
        loss_pred = jnp.asarray(np.random.default_rng(0).random((B, G)).astype(np.float32))
        mask = geometric_mask(jax.random.key(0), loss_pred, 38, jnp.asarray(0.0))
        np.testing.assert_array_equal(np.asarray(mask.sum(-1)), 38)

    def test_topk_always_masked(self):
        rng = np.random.default_rng(1)
        loss_pred = jnp.asarray(rng.random((B, G)).astype(np.float32))
        keep_ratio = 0.5
        num_mask = 38
        len_loss = int(num_mask * keep_ratio)  # 19
        mask = np.asarray(geometric_mask(jax.random.key(2), loss_pred, num_mask, jnp.asarray(keep_ratio)))
        lp = np.asarray(loss_pred)
        for b in range(B):
            top = np.argsort(lp[b])[-len_loss:]
            assert mask[b][top].all(), "top predicted-loss groups must be masked"
            assert mask[b].sum() == num_mask

    def test_random_fill_varies_with_key(self):
        loss_pred = jnp.asarray(np.random.default_rng(3).random((B, G)).astype(np.float32))
        m1 = np.asarray(geometric_mask(jax.random.key(1), loss_pred, 38, jnp.asarray(0.4)))
        m2 = np.asarray(geometric_mask(jax.random.key(2), loss_pred, 38, jnp.asarray(0.4)))
        assert (m1 != m2).any()

    def test_jit_no_recompile_across_keep_ratio(self):
        loss_pred = jnp.asarray(np.random.default_rng(4).random((B, G)).astype(np.float32))
        f = jax.jit(lambda r, kr: geometric_mask(r, loss_pred, 38, kr))
        f(jax.random.key(0), jnp.asarray(0.1))
        n0 = f._cache_size()
        f(jax.random.key(0), jnp.asarray(0.5))
        assert f._cache_size() == n0


class TestKeepRatioSchedule:
    def test_default_ramp(self):
        # (epoch+1)/E * 0.8 (reference default branch)
        assert abs(keep_ratio_schedule(0, 300) - 0.8 / 300) < 1e-9
        assert abs(keep_ratio_schedule(299, 300) - 0.8) < 1e-9

    def test_after_200_branch(self):
        # min((ep+1)/(E/2)*0.5, 0.5)
        assert abs(keep_ratio_schedule(74, 300, True) - 0.25) < 1e-9
        assert keep_ratio_schedule(250, 300, True) == 0.5


class TestGm3dNumMask:
    """GM3D mask count is ``L - int(L*(1-r))`` (``...feature_besed.py:1065``),
    which differs from the teacher's ``int(L*r)`` whenever L*r is fractional —
    at the DEFAULT pretrain ratio 0.6 with L=64 the reference masks 39, not 38."""

    def test_matches_reference_formula(self):
        from gm3d_tpu.masking import gm3d_num_mask

        for G in (64, 128, 256):
            for r in (0.5, 0.6, 0.75, 0.8):
                assert gm3d_num_mask(G, r) == G - int(G * (1 - r))
        assert gm3d_num_mask(64, 0.6) == 39      # teacher int(64*0.6) would be 38
        assert gm3d_num_mask(64, 0.75) == 48     # agrees when divisible

    def test_train_step_uses_gm3d_convention(self):
        """The flagship train step must mask 39 of 64 at ratio 0.6."""
        import inspect

        from gm3d_tpu.train import pretrain as P

        src = inspect.getsource(P.make_gm3d_train_step)
        assert "gm3d_num_mask" in src
