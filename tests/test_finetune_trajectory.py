"""Multi-step finetune TRAJECTORY parity against the ACTUAL reference
finetune stack (round-2 VERDICT item 3, deepened): ``engine_finetune.py``'s
``train_one_epoch`` + ``param_groups_lrd`` layer-decay AdamW
(``main_finetune.py:359-366``) + per-iteration ``adjust_learning_rate``
(``util/lr_sched.py:11-23``) — the recipe that produced the 3 ScanObjectNN
BASELINE rows.

``test_finetune_parity.py`` proves one forward/gradient matches; this proves
N optimizer steps STAY matched: the reference-EFFECTIVE layer-id mapping
(stem at FULL lr, exact ``cls_token`` near-frozen — the image-ViT name
mismatch, see ``layerwise_lr_decay_scales``), torch-DEFAULT AdamW betas
(0.9, 0.999), NO grad clipping (``--clip_grad`` default None), the warmup →
cosine boundary, and BatchNorm running stats incl. torch's Bessel correction
(``TorchBatchNorm``).

Determinism controls (both sides): the engine's ``train_transforms`` is
monkeypatched to identity and ours runs ``augment=False``; the shared
``np.random.choice`` subsample after FPS (``engine_finetune.py:133``) is
pinned to ``arange`` on the torch side and ``subsample`` is patched to
first-npoints on ours (FPS order parity carries the rest); DropPath and the
head Dropout are zeroed (cross-framework RNG streams can't match);
everything else — FPS -> KNN grouping, train-mode BN batch stats, CE — runs
exactly as in training.
"""

from __future__ import annotations

import zlib
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shims  # noqa: E402

from gm3d_tpu.ckpt.torch_import import (  # noqa: E402
    POINT_TRANSFORMER_MAP,
    export_torch_checkpoint,
    import_torch_checkpoint,
)
from gm3d_tpu.models.point_transformer import PointTransformer  # noqa: E402
from gm3d_tpu.train.optim import build_finetune_optimizer  # noqa: E402
from gm3d_tpu.train.schedules import cosine_warmup_schedule  # noqa: E402
from gm3d_tpu.train.state import create_train_state  # noqa: E402

pytestmark = pytest.mark.slow

B, N, NPOINTS, CLS = 4, 1400, 1024, 8
EPOCHS, SPE = 4, 3
LR, MIN_LR, WARMUP_EPOCHS = 1e-3, 0.0, 1.0
WD, LAYER_DECAY = 0.05, 0.75


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


def _make_data(seed):
    rng = np.random.RandomState(seed)
    batches = [
        [rng.randn(B, N, 3).astype(np.float32) for _ in range(SPE)]
        for _ in range(EPOCHS)
    ]
    labels = [
        [rng.randint(0, CLS, size=B).astype(np.int64) for _ in range(SPE)]
        for _ in range(EPOCHS)
    ]
    return batches, labels


def _build_models():
    teacher_mod = reference_shims.load_teacher_module()
    from easydict import EasyDict  # the shim

    model = PointTransformer(cls_dim=CLS, drop_path_rate=0.0, dropout=0.0)
    pts0 = jnp.zeros((B, NPOINTS, 3), jnp.float32)
    svars = model.init(jax.random.PRNGKey(0), pts0)
    svars = {k: _randomize(v, "fttraj/" + k) for k, v in svars.items()}

    cfg = EasyDict(
        trans_dim=384, depth=12, drop_path_rate=0.0, cls_dim=CLS, num_heads=6,
        group_size=32, num_group=64, encoder_dims=384,
    )
    torch.manual_seed(0)
    ref = teacher_mod.PointTransformer(cfg)
    sd = export_torch_checkpoint(svars, POINT_TRANSFORMER_MAP)
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert res.missing_keys == [], res.missing_keys
    assert res.unexpected_keys == [], res.unexpected_keys
    ref.train()
    # cross-framework RNG can't match: zero the head dropout (hardcoded 0.5,
    # models/Point_MAE.py:488-492); drop_path_rate is 0.0 via the config
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    return ref, model, svars


def _run_reference(ref, batches, labels):
    engine = reference_shims.load_finetune_engine_module()
    lrd = reference_shims.load_lrd_module()
    import util.misc as misc  # reference module (loaded via engine import)

    engine.train_transforms = lambda x: x  # determinism: augment off
    # pin the shared post-FPS subsample (engine_finetune.py:133) to identity
    engine.np = SimpleNamespace(
        random=SimpleNamespace(choice=lambda n, k, replace: np.arange(k))
    )

    # main_finetune.py:359-366: layer-decay groups (inert no_weight_decay
    # list-of-set included verbatim), AdamW with TORCH-DEFAULT betas
    param_groups = lrd.param_groups_lrd(
        ref, WD, no_weight_decay_list=[{"pos_embed", "cls_token"}],
        layer_decay=LAYER_DECAY,
    )
    optimizer = torch.optim.AdamW(param_groups, lr=LR)
    loss_scaler = misc.NativeScalerWithGradNormCount()
    criterion = torch.nn.CrossEntropyLoss()  # main_finetune.py:377 (plain CE)

    step_losses = []
    orig_call = type(loss_scaler).__call__

    def recording_call(self, loss, optimizer, **kw):
        step_losses.append(float(loss))
        return orig_call(self, loss, optimizer, **kw)

    loss_scaler.__class__ = type(
        "RecScaler", (type(loss_scaler),), {"__call__": recording_call}
    )

    args = SimpleNamespace(
        accum_iter=1, epochs=EPOCHS, lr=LR, min_lr=MIN_LR,
        warmup_epochs=WARMUP_EPOCHS, clip_grad=None,
    )
    stats, snaps = [], []
    for epoch in range(EPOCHS):
        loader = [
            (0, 0, (torch.from_numpy(b), torch.from_numpy(l)))
            for b, l in zip(batches[epoch], labels[epoch])
        ]
        st = engine.train_one_epoch(
            ref, criterion, loader, optimizer, "cpu", epoch, loss_scaler,
            max_norm=None, mixup_fn=None, log_writer=None, args=args,
            npoints=NPOINTS,
        )
        stats.append(st)
        sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
        tree = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP)
        tree.pop("_unmatched", None)
        snaps.append(tree)
    return stats, step_losses, snaps


def _run_ours(model, svars, batches, labels):
    from gm3d_tpu.train import finetune as ft

    sched = cosine_warmup_schedule(LR, MIN_LR, WARMUP_EPOCHS, EPOCHS, SPE)
    tx = build_finetune_optimizer(
        svars["params"], sched, WD, layer_decay=LAYER_DECAY,
        grad_clip=None,
    )
    state = create_train_state(svars, tx)
    orig_subsample = ft.subsample
    # deterministic twin of the pinned engine subsample: first npoints of the
    # FPS-ordered point_all
    ft.subsample = lambda rng, pts, n: pts[:, :n]
    try:
        step = ft.make_finetune_train_step(
            model, tx, npoints=NPOINTS, smoothing=0.0, augment=False
        )
        losses, snaps = [], []
        rng = jax.random.PRNGKey(0)
        for epoch in range(EPOCHS):
            for it in range(SPE):
                rng, key = jax.random.split(rng)
                state, metrics = step(
                    state,
                    jnp.asarray(batches[epoch][it]),
                    jnp.asarray(labels[epoch][it]),
                    key,
                )
                losses.append(float(metrics["loss"]))
            snaps.append({
                "params": jax.tree.map(np.asarray, state.params),
                "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
            })
    finally:
        ft.subsample = orig_subsample
    return losses, snaps


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v, np.float64)
    return out


def _assert_trees_close(ours, ref, what, rtol, rtol_vec=None, min_leaves=50):
    """Per-leaf Frobenius-relative comparison (same methodology as
    test_trajectory_parity: max-element metrics are meaningless under Adam)."""
    ref_flat = _flatten(ref)
    our_flat = _flatten(ours)
    assert len(ref_flat) > min_leaves, sorted(ref_flat)[:5]
    bad = []
    for path, r in ref_flat.items():
        assert path in our_flat, f"{what}: leaf {path} missing in rebuild"
        o = our_flat[path]
        tol = rtol if r.ndim > 1 else (rtol_vec if rtol_vec is not None else rtol)
        rel = float(np.linalg.norm(o - r)) / max(float(np.linalg.norm(r)), 1e-3)
        if rel > tol:
            bad.append((round(rel, 5), path))
    bad.sort(reverse=True)
    assert not bad, f"{what}: {len(bad)} leaves over tolerance: {bad[:8]}"


def test_finetune_trajectory_matches_reference():
    """12 optimizer steps (4 epochs x 3) through the REAL reference finetune
    engine + layer-decay optimizer vs our jit step + build_finetune_optimizer.

    Tiers (measured: steps 0-2 match at 2e-7..5e-6; from step 3 the system is
    in the chaotic-drift regime — train-mode BN at B=4 amplifies parameter
    noise into activations, and the leaves that diverge fastest are the
    analytically-ZERO-gradient random-walkers: every bias feeding a
    BatchNorm, and the final LayerNorm bias, are loss-invariant (BN removes
    per-feature constant shifts) so Adam random-walks them at +-lr with
    rounding-determined sign on BOTH sides — same mechanism the pretrain
    harness documents):
      - steps 0-2: per-step CE losses at 1e-5 relative (a wrong lr_scale
        mapping / betas / clip / schedule shows up HERE — exact semantics);
      - steps 3-5 (across the warmup->cosine boundary at epoch 1): 5e-2
        drift bound (measured max 2.1e-2);
      - epoch-mean losses: 1e-2 at epoch 0, 0.1 drift bound after;
      - param + BN trees at 2 epochs / at the end: Frobenius per leaf with
        ~2x margin over measured (kern 0.038/0.065, vec 0.124/0.165,
        head-BN running mean 0.107/0.433 — the running mean integrates the
        random-walking upstream biases).
    """
    ref, model, svars = _build_models()
    batches, labels = _make_data(11)

    stats, t_steps, t_snaps = _run_reference(ref, batches, labels)
    losses, o_snaps = _run_ours(model, svars, batches, labels)

    assert len(t_steps) == len(losses) == EPOCHS * SPE
    for i, (o, t) in enumerate(zip(losses, t_steps)):
        tol = 1e-5 if i < 3 else (5e-2 if i < 6 else None)
        if tol is not None:
            np.testing.assert_allclose(o, t, rtol=tol,
                                       err_msg=f"step {i} loss diverged")
    for epoch in range(EPOCHS):
        lo = losses[epoch * SPE:(epoch + 1) * SPE]
        np.testing.assert_allclose(
            np.mean(lo), stats[epoch]["loss"], rtol=1e-2 if epoch == 0 else 0.1,
            err_msg=f"epoch {epoch} mean loss diverged",
        )

    def check(epoch_idx, kern, vec, bn):
        t, o = t_snaps[epoch_idx], o_snaps[epoch_idx]
        _assert_trees_close({"p": o["params"]}, {"p": t["params"]},
                            f"params @epoch{epoch_idx}", kern, vec)
        _assert_trees_close({"b": o["batch_stats"]}, {"b": t["batch_stats"]},
                            f"batch stats @epoch{epoch_idx}", bn, bn,
                            min_leaves=5)

    check(1, kern=0.08, vec=0.25, bn=0.25)           # 6 steps
    check(EPOCHS - 1, kern=0.15, vec=0.35, bn=0.9)   # 12 steps: drift bound
