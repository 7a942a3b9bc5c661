"""Step-level numerical parity against the ACTUAL reference torch code.

These tests import the reference sources from ``/root/reference/Point-MAE_SA3D``
(``models_mae_learn_loss_Classifier_SVM_feature_besed.py`` — the GM3D student —
and ``models/Point_MAE.py`` — the frozen teacher), run them on CPU with the
faithful shims from ``reference_shims.py`` in place of the CUDA extensions,
transplant IDENTICAL weights via ``ckpt.torch_import.export_torch_checkpoint``,
and assert the rebuild matches the reference forward features, ``forward_loss``
(MSE + per-group Chamfer matrix), ``forward_learning_loss`` and the guided part
of ``generate_mask`` to float32 precision.

This is the strongest parity evidence obtainable without the benchmark
datasets: it converts "the rebuild looks equivalent" into "the rebuild computes
the same numbers as the reference code itself".
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_shims  # noqa: E402

from gm3d_tpu.ckpt.torch_import import (  # noqa: E402
    GM3D_STUDENT_MAP,
    POINT_MAE_MAP,
    export_torch_checkpoint,
)
from gm3d_tpu.masking.masks import geometric_mask, keep_ratio_schedule  # noqa: E402
from gm3d_tpu.models.gm3d import GM3DStudent  # noqa: E402
from gm3d_tpu.models.pointmae import PointMAE, take_groups  # noqa: E402
from gm3d_tpu.ops.group import group_points  # noqa: E402
from gm3d_tpu.train import losses  # noqa: E402

B, N, G, S, M, D = 2, 1024, 64, 32, 48, 384


def _randomize(tree, prefix=""):
    """Give every leaf a deterministic non-trivial value (path-seeded) so a
    mis-mapped weight cannot hide behind identical default inits."""
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out[k] = _randomize(v, path)
            continue
        rng = np.random.RandomState(zlib.crc32(path.encode()) % (2**31))
        shape = np.shape(v)
        if k == "var":
            val = rng.uniform(0.5, 1.5, shape)
        elif k == "mean":
            val = rng.normal(0.0, 0.1, shape)
        elif k == "scale":
            val = 1.0 + rng.normal(0.0, 0.1, shape)
        else:
            val = rng.normal(0.0, 0.02, shape)
        out[k] = jnp.asarray(val, jnp.float32)
    return out


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    pts = rng.randn(B, N, 3).astype(np.float32)
    mask = np.zeros((B, G), bool)
    for i in range(B):
        mask[i, rng.choice(G, M, replace=False)] = True
    return pts, mask


@pytest.fixture(scope="module")
def student_pair():
    """(reference torch student, our model, our variables) with identical weights."""
    ref_mod = reference_shims.load_student_module()
    model = GM3DStudent(mode="feature")
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    mask0 = jnp.zeros((B, G), bool).at[:, :M].set(True)
    variables = model.init(jax.random.PRNGKey(0), pts0, mask0, M)
    variables = jax.tree_util.tree_map(lambda x: x, variables)  # unfreeze copy
    variables = {k: _randomize(v, k) for k, v in variables.items()}

    sd = export_torch_checkpoint(variables, GM3D_STUDENT_MAP)
    torch.manual_seed(0)
    ref_model = ref_mod.MaskedAutoencoderViT().eval()
    result = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # norm_p on the student root is dead code (defined :900, never used in
    # forward); everything else must transfer.
    assert set(result.missing_keys) <= {"norm_p.weight", "norm_p.bias"}, result.missing_keys
    assert result.unexpected_keys == [], result.unexpected_keys
    return ref_model, model, variables


@pytest.fixture(scope="module")
def teacher_pair():
    """(reference torch Point_MAE teacher, our PointMAE, our variables)."""
    teacher_mod = reference_shims.load_teacher_module()
    model = PointMAE()
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    mask0 = jnp.zeros((B, G), bool)
    variables = model.init(jax.random.PRNGKey(1), pts0, mask0, 0)
    variables = {k: _randomize(v, "t/" + k) for k, v in variables.items()}

    sd = export_torch_checkpoint(variables, POINT_MAE_MAP)
    torch.manual_seed(0)
    ref_teacher = teacher_mod.Point_MAE(reference_shims.make_teacher_config()).eval()
    result = ref_teacher.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert result.missing_keys == [], result.missing_keys
    assert result.unexpected_keys == [], result.unexpected_keys
    return ref_teacher, model, variables


def _mask_idx(mask):
    """Masked group indices per row, original order (== torch bool indexing)."""
    return np.stack([np.nonzero(row)[0] for row in mask])


def test_grouping_matches_reference(student_pair, data):
    """FPS + KNN grouping (``...feature_besed.py:1222-1260`` Group.forward)."""
    ref_model, _, _ = student_pair
    pts, _ = data
    with torch.no_grad():
        neigh_t, center_t, neigh_org_t = ref_model.group_divider(torch.from_numpy(pts))
    ours = group_points(jnp.asarray(pts), G, S)
    np.testing.assert_allclose(np.asarray(ours.center), center_t.numpy(), atol=1e-6)
    # KNN membership must agree; within-group order is irrelevant downstream
    # (max-pooled mini-PointNet, Chamfer) so compare as sorted sets per group.
    ref_sets = np.sort(neigh_org_t.numpy().reshape(B, G, S, 3), axis=2)
    our_sets = np.sort(np.asarray(ours.neighborhood_org), axis=2)
    np.testing.assert_allclose(our_sets, ref_sets, atol=1e-6)


def test_noaug_features_match_reference(student_pair, data):
    """Encoder-only SVM-feature path (``...feature_besed.py:1017-1018``)."""
    ref_model, model, variables = student_pair
    pts, _ = data
    zeros = torch.zeros(B, G, dtype=torch.bool)
    with torch.no_grad():
        x_vis_t = ref_model(torch.from_numpy(pts), zeros, noaug=True)
    x_vis = model.apply(variables, jnp.asarray(pts), method="encode_features")
    np.testing.assert_allclose(np.asarray(x_vis), x_vis_t.numpy(), atol=2e-4)


@pytest.mark.parametrize("shared_tokens", [False, True])
def test_forward_matches_reference(student_pair, data, shared_tokens):
    """Full masked forward (``...feature_besed.py:1007-1059``): decoder
    features (pix_pred), visible features, per-group loss_pred."""
    ref_model, model, variables = student_pair
    pts, mask = data
    with torch.no_grad():
        outs_t = ref_model(
            torch.from_numpy(pts),
            torch.from_numpy(mask),
            shared_learnable_tokens=shared_tokens,
        )
    outs = model.apply(
        variables,
        jnp.asarray(pts),
        jnp.asarray(mask),
        M,
        shared_learnable_tokens=shared_tokens,
    )
    assert int(outs_t["mask_num"]) == M
    np.testing.assert_allclose(
        np.asarray(outs["features"]), outs_t["features"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["pix_pred"]), outs_t["pix_pred"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["loss_pred"]), outs_t["loss_pred"].numpy(), atol=2e-4
    )


def test_forward_loss_matches_reference(student_pair, data):
    """``forward_loss`` (``...feature_besed.py:976-1003``): normalized-feature
    MSE + per-masked-group Chamfer, summed into the loss matrix."""
    ref_model, _, _ = student_pair
    _, mask = data
    rng = np.random.RandomState(11)
    pred = rng.randn(B, M, D).astype(np.float32)
    target = rng.randn(B, G, D).astype(np.float32)
    point_target = rng.randn(B, G, S, 3).astype(np.float32)
    point_reco = rng.randn(B, M, S, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model.forward_loss(
            torch.from_numpy(pred),
            torch.from_numpy(target),
            torch.from_numpy(mask),
            torch.from_numpy(point_target),
            torch.from_numpy(point_reco),
        )
    ours = losses.gm3d_feature_loss(
        jnp.asarray(pred),
        jnp.asarray(target),
        jnp.asarray(_mask_idx(mask)),
        jnp.asarray(point_target),
        jnp.asarray(point_reco),
    )
    np.testing.assert_allclose(
        float(ours["MSE_mean"]), float(ref_out["MSE_mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(ours["Chamfer_mean"]), float(ref_out["Chamfer_mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["matrix"]), ref_out["matrix"].numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("relative", [True, False])
def test_forward_learning_loss_matches_reference(student_pair, data, relative):
    """``forward_learning_loss`` (``...feature_besed.py:1111-1140``), both the
    pairwise-ranking BCE (relative, the CLI default) and the per-row
    normalized MSE (note: torch ``.var`` is the UNBIASED estimator)."""
    ref_model, _, _ = student_pair
    _, mask = data
    rng = np.random.RandomState(13)
    loss_pred = rng.randn(B, M).astype(np.float32)
    loss_target = np.abs(rng.randn(B, M)).astype(np.float32)
    with torch.no_grad():
        ref_loss = ref_model.forward_learning_loss(
            torch.from_numpy(loss_pred),
            torch.from_numpy(mask),
            torch.from_numpy(loss_target),
            relative=relative,
        )
    fn = losses.relative_learning_loss if relative else losses.mse_learning_loss
    ours = fn(jnp.asarray(loss_pred), jnp.asarray(loss_target))
    np.testing.assert_allclose(float(ours), float(ref_loss), rtol=1e-5)


def test_generate_mask_guided_part_matches_reference(student_pair):
    """``generate_mask`` (``...feature_besed.py:1062-1109``): the top
    ``len_loss`` highest-predicted-loss groups are ALWAYS masked, the rest of
    the 75% mask is random. RNG streams differ (torch/numpy vs JAX), so assert
    the deterministic contract on both sides: mask size and the guaranteed
    top-loss subset."""
    ref_model, _, _ = student_pair
    epoch, total = 99, 200
    keep_ratio = keep_ratio_schedule(epoch, total)
    assert keep_ratio == pytest.approx((epoch + 1) / total * 0.8)

    rng = np.random.RandomState(17)
    loss_pred = rng.randn(B, G).astype(np.float32)
    len_keep = int(G * (1 - 0.75))
    len_loss = int((G - len_keep) * keep_ratio)
    top_loss = np.argsort(loss_pred, axis=1)[:, -len_loss:]

    torch.manual_seed(0)
    np.random.seed(0)
    with torch.no_grad():
        ref_mask = ref_model.generate_mask(
            torch.from_numpy(loss_pred), mask_ratio=0.75, guide=True,
            epoch=epoch, total_epoch=total,
        ).numpy().astype(bool)
    our_mask = np.asarray(
        geometric_mask(jax.random.PRNGKey(3), jnp.asarray(loss_pred), G - len_keep,
                       jnp.float32(keep_ratio))
    )
    for m in (ref_mask, our_mask):
        assert m.sum(axis=1).tolist() == [G - len_keep] * B
        for i in range(B):
            assert m[i, top_loss[i]].all(), "top predicted-loss groups must be masked"


def test_teacher_replay_matches_reference(teacher_pair, data):
    """Complete-to-partial teacher replay
    (``engine_pretrain_Classifier_SVM.py:669-687`` forward_features_dino_decoder):
    (a) teacher features on the full cloud, (b) teacher-decoded patches from
    its own features, (c) teacher-decoded patches from arbitrary (student)
    features at the masked centers."""
    ref_teacher, model, variables = teacher_pair
    pts, mask = data
    rng = np.random.RandomState(19)
    feats = rng.randn(B, M, D).astype(np.float32)
    mask_t = torch.from_numpy(mask)

    with torch.no_grad():
        pts_t = torch.from_numpy(pts)
        neigh_t, center_t = ref_teacher.group_divider(pts_t)
        x_vis_t, mask0 = ref_teacher.MAE_encoder(neigh_t, center_t, noaug=False)
        assert not mask0.any(), "teacher is built with mask_ratio=0"
        Bv, Nv, C = x_vis_t.shape
        # (a)+(b): decode the teacher's own full-cloud features
        pos_vis = ref_teacher.decoder_pos_embed(center_t[~mask0]).reshape(Bv, -1, C)
        x_rec_t = ref_teacher.MAE_decoder(x_vis_t, pos_vis, Nv)
        rebuild_org_t = ref_teacher.increase_dim(
            x_rec_t.transpose(1, 2)
        ).transpose(1, 2)
        # (c): decode student-predicted features at the real-mask centers
        pos_mask = ref_teacher.decoder_pos_embed(center_t[mask_t]).reshape(Bv, -1, C)
        x_rec2_t = ref_teacher.MAE_decoder(torch.from_numpy(feats), pos_mask, Nv)
        rebuild_reco_t = ref_teacher.increase_dim(
            x_rec2_t.transpose(1, 2)
        ).transpose(1, 2)

    grouped = group_points(jnp.asarray(pts), G, S)
    x_vis = model.apply(
        variables, jnp.asarray(pts), grouped=grouped, method="encode_features"
    )
    rebuild_org = model.apply(
        variables, x_vis, grouped.center, method="decode_replay"
    )
    centers_sel = take_groups(grouped.center, jnp.asarray(_mask_idx(mask)))
    rebuild_reco = model.apply(
        variables, jnp.asarray(feats), centers_sel, method="decode_replay"
    )

    np.testing.assert_allclose(np.asarray(x_vis), x_vis_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(rebuild_org).reshape(B, G, -1), rebuild_org_t.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(rebuild_reco).reshape(B, M, -1), rebuild_reco_t.numpy(), atol=2e-4
    )


@pytest.fixture(scope="module")
def usual_pair():
    """(reference usual-mode torch student, our model, our variables)
    (``models_mae_learn_loss_Classifier_SVM.py:849-...``: coordinate
    pix_pred, depth-4 loss-pred decoder, Chamfer-only matrix)."""
    ref_mod = reference_shims.load_usual_student_module()
    model = GM3DStudent(mode="usual")
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    mask0 = jnp.zeros((B, G), bool).at[:, :M].set(True)
    variables = model.init(jax.random.PRNGKey(2), pts0, mask0, M)
    variables = {k: _randomize(v, "u/" + k) for k, v in variables.items()}

    sd = export_torch_checkpoint(variables, GM3D_STUDENT_MAP)
    torch.manual_seed(0)
    ref_model = ref_mod.MaskedAutoencoderViT().eval()
    result = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert set(result.missing_keys) <= {"norm_p.weight", "norm_p.bias"}, result.missing_keys
    assert result.unexpected_keys == [], result.unexpected_keys
    return ref_model, model, variables


def test_usual_mode_forward_matches_reference(usual_pair, data):
    """Usual-mode forward: pix_pred are rebuilt COORDINATES over the full
    sequence (``..._Classifier_SVM.py:665,676``), loss_pred as in feature
    mode (depth-4 decoder)."""
    ref_model, model, variables = usual_pair
    pts, mask = data
    with torch.no_grad():
        outs_t = ref_model(torch.from_numpy(pts), torch.from_numpy(mask))
    outs = model.apply(variables, jnp.asarray(pts), jnp.asarray(mask), M)
    np.testing.assert_allclose(
        np.asarray(outs["pix_pred"]), outs_t["pix_pred"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(outs["loss_pred"]), outs_t["loss_pred"].numpy(), atol=2e-4
    )


def test_usual_mode_forward_loss_matches_reference(usual_pair, data):
    """Usual-mode ``forward_loss`` (``..._Classifier_SVM.py:967-982``):
    per-group Chamfer only, MSE zeroed."""
    ref_model, _, _ = usual_pair
    _, mask = data
    rng = np.random.RandomState(23)
    pred = rng.randn(B, M, S * 3).astype(np.float32)  # rebuilt coords, masked slots
    target = rng.randn(B, G, S, 3).astype(np.float32)  # neighborhood (gt patches)
    with torch.no_grad():
        ref_out = ref_model.forward_loss(
            torch.from_numpy(pred.reshape(B, M, S, 3)),
            torch.from_numpy(target),
            torch.from_numpy(mask),
        )
    ours = losses.gm3d_usual_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(_mask_idx(mask))
    )
    assert float(ours["MSE_mean"]) == 0.0 and float(ref_out["MSE_mean"]) == 0.0
    np.testing.assert_allclose(
        float(ours["Chamfer_mean"]), float(ref_out["Chamfer_mean"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["matrix"]), ref_out["matrix"].numpy(), rtol=1e-4, atol=1e-6
    )


def test_gradient_parity_full_gm3d_loss(student_pair, teacher_pair, data):
    """GRADIENT parity on the full GM3D objective: the reference's
    ``backward()`` through student forward + no-grad teacher replay +
    forward_loss + forward_learning_loss (engine composition,
    ``engine_pretrain_Classifier_SVM.py:140-240``: total = w_mse*MSE +
    w_cd*Chamfer + loss_learn, matrix detached) must equal ``jax.grad`` of
    the rebuild's loss, leaf by leaf, after mapping torch grads through the
    SAME layout table the weights use. Catches stop-gradient and
    train/eval-semantics bugs forward parity can't."""
    ref_student, model, svars = student_pair
    ref_teacher, tmodel, tvars = teacher_pair
    pts, mask = data
    from gm3d_tpu.ckpt.torch_import import import_torch_checkpoint
    from gm3d_tpu.train.pretrain import gm3d_forward_distill

    # ---- torch side (eval mode: BN running stats, droppath off — matched
    # by deterministic=True on the jax side; grads still flow)
    ref_student.zero_grad(set_to_none=True)
    pts_t, mask_t = torch.from_numpy(pts), torch.from_numpy(mask)
    outs_t = ref_student(pts_t, mask_t)
    Mn = int(outs_t["mask_num"])
    with torch.no_grad():  # forward_features_Decoder runs under no_grad
        x_vis_t, m0 = ref_teacher.MAE_encoder(
            outs_t["neighborhood"], outs_t["center"], noaug=False
        )
        Bv, Nv, C = x_vis_t.shape
        pos_vis = ref_teacher.decoder_pos_embed(outs_t["center"][~m0]).reshape(Bv, -1, C)
        point_target_t = ref_teacher.increase_dim(
            ref_teacher.MAE_decoder(x_vis_t, pos_vis, Nv).transpose(1, 2)
        ).transpose(1, 2)
        pos_mask = ref_teacher.decoder_pos_embed(outs_t["center"][mask_t]).reshape(Bv, -1, C)
        point_reco_t = ref_teacher.increase_dim(
            ref_teacher.MAE_decoder(
                outs_t["pix_pred"][:, -Mn:], pos_mask, Nv
            ).transpose(1, 2)
        ).transpose(1, 2)
    loss_outs_t = ref_student.forward_loss(
        outs_t["pix_pred"][:, -Mn:],
        x_vis_t.detach(),
        mask_t,
        point_target_t.reshape(B, G, S, 3),
        point_reco_t.reshape(B, Mn, S, 3),
    )
    loss_t = loss_outs_t["MSE_mean"] + loss_outs_t["Chamfer_mean"]
    loss_learn_t = ref_student.forward_learning_loss(
        outs_t["loss_pred"][:, -Mn:], mask_t, loss_outs_t["matrix"].detach(),
        relative=True,
    )
    (loss_t + loss_learn_t).backward()
    torch_grads = {
        name: p.grad for name, p in ref_student.named_parameters() if p.grad is not None
    }
    mapped = import_torch_checkpoint(torch_grads, GM3D_STUDENT_MAP)
    mapped.pop("_unmatched", None)
    ref_grads = mapped["params"]

    # ---- jax side: same objective via the train-step helper (eval mode)
    def loss_fn(params):
        student_vars = {"params": params, "batch_stats": svars["batch_stats"]}
        outs, _, teacher_feats, point_target, point_reco, pred_masked = (
            gm3d_forward_distill(
                model, tmodel, student_vars, tvars, jnp.asarray(pts),
                jnp.asarray(mask), M, False, None, mutable=False,
            )
        )
        lo = losses.gm3d_feature_loss(
            pred_masked,
            jax.lax.stop_gradient(teacher_feats),
            outs["mask_idx"],
            jax.lax.stop_gradient(point_target),
            point_reco,
        )
        loss = lo["MSE_mean"] + lo["Chamfer_mean"]
        loss_learn = losses.relative_learning_loss(
            outs["loss_pred"][:, -M:], jax.lax.stop_gradient(lo["matrix"])
        )
        return loss + loss_learn

    our_grads = jax.grad(loss_fn)(svars["params"])

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = np.asarray(v, np.float64)
        return out

    ref_flat = flatten(ref_grads)
    our_flat = flatten(our_grads)
    # the reference tree also has grads for its dead root norm_p (weight
    # decay-free, grad 0) — those don't map; every mapped leaf must exist here
    assert len(ref_flat) > 150, sorted(ref_flat)[:5]
    compared = 0
    for path, g_ref in ref_flat.items():
        assert path in our_flat, f"reference grad leaf {path} missing in rebuild"
        g_our = our_flat[path]
        # per-leaf absolute tolerance scaled by the leaf's own magnitude:
        # leaves whose gradient is analytically ~0 (e.g. the feature-head
        # bias, which cancels in the pairwise ranking loss) compare at 1e-6
        tol = 1e-6 + 1e-3 * float(np.abs(g_ref).max())
        np.testing.assert_allclose(
            g_our, g_ref, atol=tol, err_msg=f"gradient mismatch at {path}"
        )
        compared += 1
    assert compared == len(ref_flat)


@pytest.mark.parametrize("epoch,total,mask_ratio", [
    (0, 200, 0.75),    # len_loss == 0 -> pure-random branch (:1086-1089)
    (7, 200, 0.75),
    (99, 200, 0.6),
    (150, 200, 0.75),
])
def test_generate_mask_contract_sweep(student_pair, epoch, total, mask_ratio):
    """The deterministic contract of ``generate_mask`` across the keep_ratio
    ramp, including the pure-random branch when ``len_loss <= 0``."""
    ref_model, _, _ = student_pair
    keep_ratio = keep_ratio_schedule(epoch, total)
    rng = np.random.RandomState(29 + epoch)
    loss_pred = rng.randn(B, G).astype(np.float32)
    len_keep = int(G * (1 - mask_ratio))
    num_mask = G - len_keep
    len_loss = int(num_mask * keep_ratio)

    torch.manual_seed(epoch)
    np.random.seed(epoch)
    with torch.no_grad():
        ref_mask = ref_model.generate_mask(
            torch.from_numpy(loss_pred), mask_ratio=mask_ratio, guide=True,
            epoch=epoch, total_epoch=total,
        ).numpy().astype(bool)
    our_mask = np.asarray(
        geometric_mask(jax.random.PRNGKey(31 + epoch), jnp.asarray(loss_pred),
                       num_mask, jnp.float32(keep_ratio))
    )
    top_loss = np.argsort(loss_pred, axis=1)[:, G - len_loss:]
    for m in (ref_mask, our_mask):
        assert m.sum(axis=1).tolist() == [num_mask] * B
        if len_loss > 0:
            for i in range(B):
                assert m[i, top_loss[i]].all()
