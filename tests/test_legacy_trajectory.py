"""Legacy teacher-pretrain TRAJECTORY parity vs the reference recipe.

The published teacher ``pretrain_PMAE.pth`` — the frozen distillation input
to every GM3D pretrain, i.e. the root of every BASELINE.md row — was produced
by ``tools/runner_pretrain.py``'s loop: the real torch ``Point_MAE``
forward/backward, ``builder.build_opti_sche``'s AdamW over the token-aware
weight-decay groups (``tools/builder.py:40-56``), a per-epoch timm
``CosineLRScheduler`` stepped at epoch END (one-epoch lag,
``runner_pretrain.py:176-180``), and plain ``loss.backward()`` with
step-per-update accumulation by SUM and NO grad clip (``:138-151``).

``test_trajectory_parity`` covers the HPM engines (GM3D student); this covers
the LEGACY stack end to end. The runner's loop is inline in ``run_net`` and
needs datasets + CUDA, so the loop LINES are replicated here with citations —
but the model (the real torch ``Point_MAE`` under the CUDA-dep shims), torch
autograd, and torch AdamW with the reference's exact param-group rule are the
real thing. Our side is driven exactly as ``cli/pretrain.py --model_family
pointmae`` wires it: ``make_pointmae_train_step`` + ``build_legacy_adamw`` +
``legacy_cosine_epoch_schedule``.

Determinism controls (same policy as test_trajectory_parity):
  - augmentation off both sides (``train_transforms`` never runs; our step is
    built with ``augment=False``),
  - DropPath zeroed (reference hardcodes 0.1; cross-framework RNG can't match),
  - the encoder's per-row numpy shuffle mask (``models/Point_MAE.py:296-320``)
    replaced by the SAME fixed 38-of-64 mask on both sides (torch: instance
    override of ``_mask_center_rand``; ours: ``random_mask`` monkeypatch).
    The random-mask CONTRACT itself is parity-tested in test_masking.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import reference_shims  # noqa: E402
from test_trajectory_parity import (  # noqa: E402
    _assert_trees_close,
    _randomize,
    _torch_state_to_tree,
    _zero_droppath,
)

from gm3d_tpu.ckpt.torch_import import (  # noqa: E402
    POINT_MAE_MAP,
    export_torch_checkpoint,
)
from gm3d_tpu.models.pointmae import PointMAE  # noqa: E402
from gm3d_tpu.train.optim import build_legacy_adamw  # noqa: E402
from gm3d_tpu.train.pretrain import make_pointmae_train_step  # noqa: E402
from gm3d_tpu.train.schedules import legacy_cosine_epoch_schedule  # noqa: E402
from gm3d_tpu.train.state import create_train_state  # noqa: E402

pytestmark = pytest.mark.slow

B, N, G, S = 2, 1024, 64, 32
MASK_RATIO = 0.6
# Point_MAE's OWN rule int(G * ratio) = 38 (models/Point_MAE.py:308) — NOT
# GM3D generate_mask's L - int(L*(1-r)) = 39 (the round-3 parity bug)
NUM_MASK = int(G * MASK_RATIO)
EPOCHS = 4
LR = 1e-3  # config.yaml optimizer.kwargs.lr
WD = 0.05  # config.yaml optimizer.kwargs.weight_decay
WARMUP_EPOCHS = 1  # scaled-down config.scheduler.kwargs.initial_epochs
MIN_LR = 1e-6  # timm lr_min AND warmup_lr_init (tools/builder.py:70-74)


def _timm_epoch_lr(t: int) -> float:
    """timm CosineLRScheduler value at epoch t (t_in_epochs=True,
    warmup_prefix=False — the cosine phase runs over the RAW epoch), the
    scheduler `tools/builder.py:68-76` constructs. timm itself is not
    installed in this image, so the two-branch formula is evaluated inline;
    its semantics (incl. the construction-time warmup_lr_init assignment and
    the end-of-epoch one-step lag) are unit-pinned in
    test_train.py::TestLegacySchedule."""
    if t < WARMUP_EPOCHS:
        return MIN_LR + (LR - MIN_LR) * t / WARMUP_EPOCHS
    return MIN_LR + (LR - MIN_LR) * 0.5 * (1.0 + math.cos(math.pi * t / EPOCHS))


def _fixed_mask() -> np.ndarray:
    rng = np.random.RandomState(5)
    mask = np.zeros((B, G), bool)
    for i in range(B):
        mask[i, rng.permutation(G)[:NUM_MASK]] = True
    return mask


def _make_batches(seed, steps_per_epoch):
    rng = np.random.RandomState(seed)
    return [
        [rng.randn(B, N, 3).astype(np.float32) for _ in range(steps_per_epoch)]
        for _ in range(EPOCHS)
    ]


def _build_models(mask_np):
    teacher_mod = reference_shims.load_teacher_module()
    model = PointMAE(drop_path_rate=0.0)
    pts0 = jnp.zeros((B, N, 3), jnp.float32)
    mask0 = jnp.asarray(mask_np)
    variables = model.init(jax.random.PRNGKey(0), pts0, mask0, NUM_MASK)
    variables = {k: _randomize(v, "legacy/" + k) for k, v in variables.items()}

    torch.manual_seed(0)
    ref = teacher_mod.Point_MAE(
        reference_shims.make_teacher_config(mask_ratio=MASK_RATIO)
    ).train()
    sd = export_torch_checkpoint(variables, POINT_MAE_MAP)
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert res.missing_keys == [] and res.unexpected_keys == []
    _zero_droppath(ref)
    # deterministic mask: instance attribute shadows the bound method; the
    # encoder calls self._mask_center_rand(center, noaug=noaug)
    # (models/Point_MAE.py:323-326)
    mask_t = torch.from_numpy(mask_np)
    ref.MAE_encoder._mask_center_rand = (
        lambda center, noaug=False: mask_t.clone()
    )
    return ref, model, variables


def _ref_add_weight_decay(model, weight_decay):
    """``tools/builder.py:40-54`` verbatim rule: no decay for 1-d params,
    ``.bias``, or any name containing ``token``."""
    decay, no_decay = [], []
    for name, param in model.named_parameters():
        if not param.requires_grad:
            continue
        if len(param.shape) == 1 or name.endswith(".bias") or "token" in name:
            no_decay.append(param)
        else:
            decay.append(param)
    return [
        {"params": no_decay, "weight_decay": 0.0},
        {"params": decay, "weight_decay": weight_decay},
    ]


def _run_reference(ref, batches, step_per_update):
    """The runner loop lines, replicated with citations."""
    # build_opti_sche: AdamW(param_groups, **kwargs) — torch-default betas
    # (tools/builder.py:55-56); timm scheduler assigns warmup_lr_init at
    # construction, so epoch 0 trains at MIN_LR
    optimizer = torch.optim.AdamW(_ref_add_weight_decay(ref, WD), lr=LR)
    for g in optimizer.param_groups:
        g["lr"] = MIN_LR

    losses, snaps = [], []
    ref.zero_grad()  # runner_pretrain.py:105
    num_iter = 0
    for epoch in range(EPOCHS):
        for b in batches[epoch]:
            num_iter += 1  # :122
            loss = ref(torch.from_numpy(b))  # :138
            try:
                loss.backward()  # :140 (no loss division — accum by SUM)
            except RuntimeError:
                # :141-145 — the extension returns PER-POINT distances
                # (SURVEY §2.3); mean(d1+d2) is the scalar the runner trains on
                loss = loss.mean()
                loss.backward()
            losses.append(float(loss))
            if num_iter == step_per_update:  # :147-151
                num_iter = 0
                optimizer.step()
                ref.zero_grad()
        # scheduler.step(epoch) at epoch END (:176-180) -> one-epoch lag
        new_lr = _timm_epoch_lr(epoch)
        for g in optimizer.param_groups:
            g["lr"] = new_lr
        snaps.append(_torch_state_to_tree(ref, POINT_MAE_MAP))
    return losses, snaps


def _run_ours(model, variables, batches, mask_np, step_per_update,
              monkeypatch):
    steps_per_epoch = len(batches[0])
    # MultiSteps ticks the inner count once per UPDATE
    sched = legacy_cosine_epoch_schedule(
        LR, EPOCHS, WARMUP_EPOCHS, max(steps_per_epoch // step_per_update, 1)
    )
    tx = build_legacy_adamw(sched, WD, accum_steps=step_per_update)
    state = create_train_state(variables, tx, with_ema=False)

    import gm3d_tpu.train.pretrain as pretrain_mod

    mask_j = jnp.asarray(mask_np)
    monkeypatch.setattr(
        pretrain_mod, "random_mask", lambda rng, b, g, m: mask_j
    )
    step = make_pointmae_train_step(
        model, tx, MASK_RATIO, mask_type="rand", loss_type="cdl2",
        augment=False,
    )
    losses, snaps = [], []
    rng = jax.random.PRNGKey(11)
    for epoch in range(EPOCHS):
        for b in batches[epoch]:
            rng, key = jax.random.split(rng)
            state, metrics = step(state, jnp.asarray(b), key)
            losses.append(float(metrics["loss"]))
        snaps.append({
            "params": jax.tree.map(np.asarray, state.params),
            "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
        })
    return losses, snaps


@pytest.mark.parametrize("step_per_update,steps_per_epoch",
                         [(1, 3), (2, 4)],
                         ids=["per_step", "accum2"])
def test_legacy_teacher_trajectory_matches_reference(
    step_per_update, steps_per_epoch, monkeypatch
):
    """12-16 micro-steps (4 epochs) of the legacy teacher recipe: real torch
    Point_MAE + reference-rule AdamW groups vs our one-jit legacy step.

    Assertion tiers (same policy as test_trajectory_parity, but this loss has
    no x1000 feedback amplifier, so drift is milder): first 3 micro-step
    losses at 1e-5 (bit-level semantics — a wrong beta / decay mask / lr lag /
    accum rule shows up here), steps 3-6 at 1e-2, epoch-1 trees tight,
    final trees bounded."""
    mask_np = _fixed_mask()
    ref, model, variables = _build_models(mask_np)
    batches = _make_batches(13, steps_per_epoch)

    t_losses, t_snaps = _run_reference(ref, batches, step_per_update)
    o_losses, o_snaps = _run_ours(
        model, variables, batches, mask_np, step_per_update, monkeypatch
    )

    assert len(t_losses) == len(o_losses) == EPOCHS * steps_per_epoch
    for i, (o, t) in enumerate(zip(o_losses, t_losses)):
        tol = 1e-5 if i < 3 else (1e-2 if i < 7 else 0.1)
        np.testing.assert_allclose(
            o, t, rtol=tol, err_msg=f"micro-step {i} loss diverged"
        )

    # epoch-1 (2 epochs in): semantics-tight; final epoch: drift bound
    _assert_trees_close(
        {"p": o_snaps[1]["params"]}, {"p": t_snaps[1]["params"]},
        "teacher params @epoch1", 0.05, 0.15,
    )
    _assert_trees_close(
        {"b": o_snaps[1]["batch_stats"]}, {"b": t_snaps[1]["batch_stats"]},
        "teacher batch stats @epoch1", 0.05, 0.05, min_leaves=3,
    )
    _assert_trees_close(
        {"p": o_snaps[-1]["params"]}, {"p": t_snaps[-1]["params"]},
        "teacher params final", 0.15, 0.25,
    )
