"""Finetune-path parity against the ACTUAL reference torch code
(round-2 VERDICT item 3): ``PointTransformer`` (``models/Point_MAE.py:444-579``)
produces 5 of the 13 BASELINE.md rows (MN40 finetune/vote, 3x ScanObjectNN) and
was previously covered only by hand-written oracles.

Covers, against the reference sources under the shims:
  - full classifier forward (FPS+KNN group -> patch embed -> cls token ->
    12 blocks -> [cls, max-pool] -> 3-layer BN head),
  - ``get_loss_acc`` (CE + accuracy*100),
  - leaf-by-leaf GRADIENTS of the CE objective (eval-mode semantics, matching
    tests/test_reference_parity.py's gradient methodology),
  - ``load_model_from_ckpt`` prefix surgery (``module.`` / ``MAE_encoder.``
    strips, strict=False) against ``ckpt.transfer.load_pretrained_into`` on
    the SAME .pth: both sides must end with identical encoder weights,
  - the pretrain-time ``Classifier`` probe (``:585-629``),
  - the ``point_all`` oversampling table (``engine_finetune.py:117-134``).
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shims  # noqa: E402

from gm3d_tpu.ckpt.torch_import import (  # noqa: E402
    GM3D_STUDENT_MAP,
    POINT_TRANSFORMER_MAP,
    export_torch_checkpoint,
    import_torch_checkpoint,
)
from gm3d_tpu.models.gm3d import GM3DStudent  # noqa: E402
from gm3d_tpu.models.point_transformer import Classifier, PointTransformer  # noqa: E402
from gm3d_tpu.train import losses  # noqa: E402

B, N, G, S, D, CLS = 2, 1024, 64, 32, 384, 40


def _randomize(tree, prefix=""):
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


def _pt_config():
    from easydict import EasyDict  # the shim

    return EasyDict(
        trans_dim=D, depth=12, drop_path_rate=0.1, cls_dim=CLS, num_heads=6,
        group_size=S, num_group=G, encoder_dims=D,
    )


@pytest.fixture(scope="module")
def pt_pair():
    """(reference torch PointTransformer, our model, our variables)."""
    teacher_mod = reference_shims.load_teacher_module()
    model = PointTransformer(cls_dim=CLS)
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), pts0)
    variables = {k: _randomize(v, "pt/" + k) for k, v in variables.items()}

    sd = export_torch_checkpoint(variables, POINT_TRANSFORMER_MAP)
    torch.manual_seed(0)
    ref = teacher_mod.PointTransformer(_pt_config()).eval()
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert res.missing_keys == [], res.missing_keys
    assert res.unexpected_keys == [], res.unexpected_keys
    return ref, model, variables


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.RandomState(3)
    pts = rng.randn(B, N, 3).astype(np.float32)
    labels = rng.randint(0, CLS, size=B)
    return pts, labels


def test_forward_matches_reference(pt_pair, cloud):
    """Assembled classifier forward (``models/Point_MAE.py:559-579``)."""
    ref, model, variables = pt_pair
    pts, _ = cloud
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(pts))
    logits = model.apply(variables, jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(logits), logits_t.numpy(), atol=3e-4)


def test_get_loss_acc_matches_reference(pt_pair, cloud):
    """CE + accuracy*100 (``models/Point_MAE.py:505-509``)."""
    ref, model, variables = pt_pair
    pts, labels = cloud
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(pts))
        loss_t, acc_t = ref.get_loss_acc(logits_t, torch.from_numpy(labels))
    logits = model.apply(variables, jnp.asarray(pts))
    loss, acc = losses.classification_loss(logits, jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)
    np.testing.assert_allclose(float(acc), float(acc_t), rtol=1e-6)


def test_gradients_match_reference(pt_pair, cloud):
    """backward() of the CE objective == jax.grad, leaf by leaf, mapped
    through the same layout table as the weights (engine_finetune.py:141-153
    semantics, deterministic/eval mode)."""
    ref, model, variables = pt_pair
    pts, labels = cloud

    ref.zero_grad(set_to_none=True)
    logits_t = ref(torch.from_numpy(pts))
    loss_t, _ = ref.get_loss_acc(logits_t, torch.from_numpy(labels))
    loss_t.backward()
    torch_grads = {n: p.grad for n, p in ref.named_parameters() if p.grad is not None}
    mapped = import_torch_checkpoint(torch_grads, POINT_TRANSFORMER_MAP)
    mapped.pop("_unmatched", None)
    ref_grads = mapped["params"]

    def loss_fn(params):
        vars_ = {"params": params, "batch_stats": variables["batch_stats"]}
        logits = model.apply(vars_, jnp.asarray(pts), deterministic=True)
        loss, _ = losses.classification_loss(logits, jnp.asarray(labels))
        return loss

    our_grads = jax.grad(loss_fn)(variables["params"])

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = np.asarray(v, np.float64)
        return out

    ref_flat, our_flat = flatten(ref_grads), flatten(our_grads)
    assert len(ref_flat) > 100
    for path, g_ref in ref_flat.items():
        assert path in our_flat, f"reference grad leaf {path} missing"
        tol = 1e-6 + 1e-3 * float(np.abs(g_ref).max())
        np.testing.assert_allclose(
            our_flat[path], g_ref, atol=tol, err_msg=f"grad mismatch at {path}"
        )


def test_load_model_from_ckpt_surgery_matches(pt_pair, tmp_path):
    """The finetune handoff: a GM3D pretrain checkpoint saved torch-style
    ({'base_model': {'module.MAE_encoder....': ...}}) loaded by the
    reference's ``load_model_from_ckpt`` (``models/Point_MAE.py:511-543``)
    and by our ``load_pretrained_into`` must produce IDENTICAL encoder
    weights in the classifier — and leave the head/cls params untouched."""
    from gm3d_tpu.ckpt.transfer import load_pretrained_into

    ref, model, variables = pt_pair

    # a GM3D student checkpoint with distinctive weights
    student = GM3DStudent(mode="feature")
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    mask0 = jnp.zeros((B, G), bool).at[:, :39].set(True)
    svars = student.init(jax.random.PRNGKey(9), pts0, mask0, 39)
    svars = {k: _randomize(v, "ck/" + k) for k, v in svars.items()}
    sd = export_torch_checkpoint(svars, GM3D_STUDENT_MAP)
    path = str(tmp_path / "pretrain.pth")
    torch.save(
        {"base_model": {"module." + k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}},
        path,
    )

    # ---- reference side: fresh torch classifier, run the surgery
    teacher_mod = reference_shims.load_teacher_module()
    # latent reference bug: utils/checkpoint.py commented out
    # ``from termcolor import colored`` (:14) but still calls it, so
    # load_model_from_ckpt NameErrors whenever keys are missing (always, for
    # a finetune handoff) — identity shim to let the surgery run
    import sys

    ckpt_utils = sys.modules.get("utils.checkpoint")
    if ckpt_utils is not None and not hasattr(ckpt_utils, "colored"):
        ckpt_utils.colored = lambda s, *a, **k: s
    torch.manual_seed(1)
    ref_ft = teacher_mod.PointTransformer(_pt_config()).eval()
    before_cls = ref_ft.cls_head_finetune[0].weight.detach().clone()
    ref_ft.load_model_from_ckpt(path)
    # encoder weights must now equal the checkpoint's MAE_encoder weights
    assert torch.equal(
        ref_ft.encoder.first_conv[0].weight,
        torch.from_numpy(np.ascontiguousarray(sd["MAE_encoder.encoder.first_conv.0.weight"])),
    )
    # head untouched (missing from the pretrain ckpt, strict=False)
    assert torch.equal(ref_ft.cls_head_finetune[0].weight, before_cls)

    # ---- our side: same .pth through load_pretrained_into
    init = model.init(jax.random.PRNGKey(11), pts0)
    params, batch_stats, count = load_pretrained_into(
        jax.tree_util.tree_map(lambda x: x, init["params"]),
        init.get("batch_stats"),
        path,
        torch_ckpt=True,
    )
    assert count > 100, f"only {count} leaves transferred"

    # identical post-surgery encoder trees: export our classifier params and
    # compare against the torch classifier's state dict, leaf by leaf
    ours_sd = export_torch_checkpoint(
        {"params": params, "batch_stats": batch_stats}, POINT_TRANSFORMER_MAP
    )
    ref_sd = {k: v.detach().numpy() for k, v in ref_ft.state_dict().items()}
    compared = 0
    for k, v in ours_sd.items():
        if k.startswith(("cls_head_finetune", "cls_token", "cls_pos")):
            continue  # freshly initialised on both sides, seeds differ
        assert k in ref_sd, k
        np.testing.assert_allclose(v, ref_sd[k], atol=1e-6,
                                   err_msg=f"surgery mismatch at {k}")
        compared += 1
    assert compared > 100


def test_classifier_probe_matches_reference(cloud):
    """Pretrain-time Classifier probe (``models/Point_MAE.py:585-629``):
    LN -> mean+max pool (SUMMED) -> 3-layer BN head."""
    teacher_mod = reference_shims.load_teacher_module()
    model = Classifier(cls_dim=CLS)
    rng = np.random.RandomState(5)
    feats = rng.randn(B, G, D).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(feats))
    variables = {k: _randomize(v, "cls/" + k) for k, v in variables.items()}

    table = {
        "norm": ("norm", "ln"),
        "cls_head_finetune.0": ("head/fc1", "linear"),
        "cls_head_finetune.1": ("head/bn1", "bn"),
        "cls_head_finetune.4": ("head/fc2", "linear"),
        "cls_head_finetune.5": ("head/bn2", "bn"),
        "cls_head_finetune.8": ("head/fc3", "linear"),
    }
    sd = export_torch_checkpoint(variables, table)
    torch.manual_seed(0)
    ref = teacher_mod.Classifier().eval()
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert res.missing_keys == [], res.missing_keys
    assert res.unexpected_keys == [], res.unexpected_keys
    with torch.no_grad():
        logits_t = ref(torch.from_numpy(feats))
    logits = model.apply(variables, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(logits), logits_t.numpy(), atol=2e-4)


def test_point_all_table_matches_engine():
    """``engine_finetune.py:117-134``: 1024->1200, 2048->2400, 4096->4800,
    8192->8192."""
    from gm3d_tpu.train.finetune import point_all_for

    assert point_all_for(1024) == 1200
    assert point_all_for(2048) == 2400
    assert point_all_for(4096) == 4800
    assert point_all_for(8192) == 8192
    with pytest.raises(ValueError):
        point_all_for(512)


def test_layer_decay_scales_match_reference(pt_pair):
    """``layerwise_lr_decay_scales`` must equal the reference's EFFECTIVE
    per-parameter ``lr_scale`` from ``param_groups_lrd``
    (``util/lr_decay.py:14-61``) on the real ``PointTransformer``.

    ``get_layer_id_for_vit`` (``util/lr_decay.py:64-76``) matches image-ViT
    names, so on this model only exact ``cls_token`` (layer 0) and the
    ``blocks.`` prefix (layer i+1) ever match; the whole stem — mini-PointNet
    ``encoder.*``, ``pos_embed.*`` MLP, ``cls_pos`` — plus ``norm_p`` and the
    head fall to the else branch (layer 12, FULL lr). The scales are derived
    from the reference code at test time, then compared leaf-by-leaf through
    the export mapping, so a misreading of the reference fails here."""
    ref, model, variables = pt_pair
    lrd = reference_shims.load_lrd_module()
    from gm3d_tpu.train.optim import layerwise_lr_decay_scales

    decay, num_layers = 0.6, 12  # uncommon decay so coincidences can't pass
    scales = layerwise_lr_decay_scales(variables["params"], decay=decay)

    # push a scale-filled tree through the torch export mapping: every torch
    # parameter must come out uniformly filled with OUR scale for it
    filled = jax.tree.map(
        lambda p, s: jnp.full(jnp.shape(p), s, jnp.float32),
        variables["params"], scales,
    )
    sd = export_torch_checkpoint({"params": filled}, POINT_TRANSFORMER_MAP)

    checked = 0
    for name, param in ref.named_parameters():
        lid = lrd.get_layer_id_for_vit(name, num_layers)
        want = decay ** (num_layers - lid)
        got = np.unique(np.asarray(sd[name]))
        assert got.size == 1, f"{name}: non-uniform scale {got}"
        assert got[0] == pytest.approx(want, rel=1e-6), (
            f"{name}: ours {got[0]} vs reference lr_scale {want} (layer {lid})"
        )
        checked += 1
    assert checked == sum(1 for _ in ref.named_parameters())

    # spot-check the quirk itself: stem at FULL lr, cls_token near-frozen
    assert sd["encoder.first_conv.0.weight"].flat[0] == pytest.approx(1.0)
    assert sd["pos_embed.0.weight"].flat[0] == pytest.approx(1.0)
    assert sd["cls_pos"].flat[0] == pytest.approx(1.0)
    assert sd["cls_token"].flat[0] == pytest.approx(decay**12)
    assert sd["blocks.blocks.11.attn.qkv.weight"].flat[0] == pytest.approx(1.0)

    # weight-decay mask equivalence: the reference's named no-decay list is
    # inert (a list CONTAINING a set, main_finetune.py:359-362 — `name in`
    # never matches), so decay applies exactly to ndim>1 params. Ours too.
    from gm3d_tpu.train.optim import _decay_mask

    mask = _decay_mask(variables["params"])
    filled_m = jax.tree.map(
        lambda p, m: jnp.full(jnp.shape(p), 1.0 if m else 0.0, jnp.float32),
        variables["params"], mask,
    )
    sd_m = export_torch_checkpoint({"params": filled_m}, POINT_TRANSFORMER_MAP)
    for name, param in ref.named_parameters():
        want = 0.0 if param.ndim == 1 else 1.0
        got = np.unique(np.asarray(sd_m[name]))
        assert got.size == 1 and got[0] == want, f"{name}: wd mask mismatch"
