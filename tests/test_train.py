"""End-to-end short-run training tests on synthetic clouds (SURVEY.md §4d):
each train step must run under jit and decrease its loss."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gm3d_tpu.models import GM3DStudent, PointMAE, PointM2AE, PointTransformer
from gm3d_tpu.train.optim import build_adamw, build_finetune_optimizer
from gm3d_tpu.train.pretrain import (
    make_gm3d_train_step,
    make_m2ae_train_step,
    make_pointmae_train_step,
)
from gm3d_tpu.train.finetune import make_finetune_train_step, make_eval_step, make_vote_eval_step
from gm3d_tpu.train.schedules import (
    cosine_warmup_schedule,
    ema_decay_schedule,
    loss_weights,
)
from gm3d_tpu.train.state import create_train_state

B, N = 4, 128
SMALL = dict(trans_dim=48, depth=2, num_heads=2, decoder_depth=1, decoder_num_heads=2,
             group_size=8, num_group=16, encoder_dims=48)


def synthetic_clouds(batch=B, n=N, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.standard_normal((batch, n, 3)).astype(np.float32)
    pts /= np.abs(pts).max()
    return jnp.asarray(pts)


class TestSchedules:
    def test_lr_warmup_and_decay(self):
        sched = cosine_warmup_schedule(1e-3, 0.0, 10, 300, 100)
        assert float(sched(0)) == 0.0
        assert abs(float(sched(10 * 100)) - 1e-3) < 1e-9
        assert float(sched(300 * 100)) < 1e-9
        assert float(sched(5 * 100)) == pytest.approx(5e-4)

    def test_host_eval_stays_on_host(self):
        """The CLIs evaluate the schedule host-side for the per-epoch TB lr
        scalar: a Python-int step must produce a host scalar (no device
        dispatch through the tunnel) that matches the traced value."""
        from gm3d_tpu.train.schedules import legacy_cosine_epoch_schedule

        for sched in (cosine_warmup_schedule(1e-3, 1e-6, 10, 300, 100),
                      legacy_cosine_epoch_schedule(1e-3, 300, 10, 100)):
            for step in (0, 555, 29_999):
                host = sched(step)
                assert not isinstance(host, jax.Array), type(host)
                traced = jax.jit(sched)(jnp.asarray(step))
                # abs term: deep in the cosine tail fp32 rounds 1+cos(~pi)
                # to 0 where the host fp64 value keeps ~1e-12
                assert float(host) == pytest.approx(float(traced),
                                                    rel=1e-5, abs=1e-8)

    def test_ema_ramp(self):
        assert ema_decay_schedule(0) == 0.999
        assert ema_decay_schedule(50) == pytest.approx(0.99945)
        assert ema_decay_schedule(150) == 0.9999

    def test_loss_weight_switch(self):
        assert loss_weights(10, 15) == (1.0, 1.0)
        assert loss_weights(20, 15) == (13.889, 1000.0)


class TestPointMAEStep:
    def test_loss_decreases(self):
        model = PointMAE(**SMALL)
        pts = synthetic_clouds()
        mask0 = jnp.zeros((B, model.num_group), bool).at[:, : int(16 * 0.6)].set(True)
        variables = model.init(jax.random.key(0), pts, mask0, int(16 * 0.6))
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx)
        step = make_pointmae_train_step(model, tx, mask_ratio=0.6)
        first = None
        for i in range(12):
            state, metrics = step(state, pts, jax.random.key(i))
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

    def test_block_mask_variant(self):
        model = PointMAE(**SMALL)
        pts = synthetic_clouds()
        mask0 = jnp.zeros((B, 16), bool).at[:, :9].set(True)
        variables = model.init(jax.random.key(0), pts, mask0, 9)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx)
        step = make_pointmae_train_step(model, tx, mask_ratio=0.6, mask_type="block")
        state, metrics = step(state, pts, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))


class TestGM3DStep:
    @pytest.fixture(scope="class")
    def setup(self):
        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = synthetic_clouds()
        num_mask = int(16 * 0.6)
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        state = create_train_state(svars, tx, with_ema=True)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)
        return student, teacher, state, step, tvars, pts

    def test_metrics_and_loss_decrease(self, setup):
        _, _, state, step, tvars, pts = setup
        state = jax.tree.map(jnp.copy, state)  # step donates its input
        scalars = {
            "keep_ratio": jnp.asarray(0.5),
            "ema_decay": jnp.asarray(0.999),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(1.0),
        }
        history = []
        for i in range(12):
            state, metrics = step(state, tvars, pts, jax.random.key(i), scalars)
            assert np.isfinite(float(metrics["loss"]))
            history.append(float(metrics["loss_mse"]))
        # loss is noisy step-to-step (mask resampled per step): compare the
        # mean of the last quarter against the first quarter
        assert np.mean(history[-3:]) < np.mean(history[:3])
        for k in ("loss", "loss_mse", "loss_chfr", "loss_learn", "grad_norm"):
            assert k in metrics

    def test_ema_params_track_student(self, setup):
        _, _, state, step, tvars, pts = setup
        scalars = {
            "keep_ratio": jnp.asarray(0.2),
            "ema_decay": jnp.asarray(0.5),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(1.0),
        }
        # the step donates its input state: snapshot before stepping
        p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
        state = jax.tree.map(jnp.copy, state)
        s1, _ = step(state, tvars, pts, jax.random.key(0), scalars)
        # EMA moved toward new params
        p = np.asarray(jax.tree.leaves(s1.params)[0])
        e = np.asarray(jax.tree.leaves(s1.ema_params)[0])
        expect = 0.5 * p0 + 0.5 * p
        np.testing.assert_allclose(e, expect, atol=1e-5)

    def test_usual_mode_no_teacher(self):
        student = GM3DStudent(mode="usual", **SMALL)
        pts = synthetic_clouds()
        num_mask = 9
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        state = create_train_state(svars, tx, with_ema=True)
        step = make_gm3d_train_step(student, None, tx, mask_ratio=0.6)
        scalars = {
            "keep_ratio": jnp.asarray(0.3),
            "ema_decay": jnp.asarray(0.999),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(1.0),
        }
        state, metrics = step(state, None, pts, jax.random.key(0), scalars)
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["loss_mse"]) == 0.0


class TestM2AEStep:
    def test_loss_decreases(self):
        model = PointM2AE(
            num_groups=(32, 16, 8),
            group_sizes=(8, 4, 4),
            encoder_depths=(1, 1, 1),
            encoder_dims=(24, 48, 96),
            local_radius=(0.32, 0.64, 1.28),
            decoder_dims=(96, 48),
            decoder_depths=(1, 1),
            num_heads=2,
        )
        pts = synthetic_clouds()
        vis0 = jnp.ones((B, 8), bool).at[:, :6].set(False)
        variables = model.init(jax.random.key(0), pts, vis0)
        tx = build_adamw(1e-3)
        state = create_train_state(variables, tx)
        step = make_m2ae_train_step(model, tx, mask_ratio=0.75)
        first = None
        for i in range(10):
            state, metrics = step(state, pts, jax.random.key(i))
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first


class TestFinetune:
    def test_train_eval_vote(self):
        model = PointTransformer(cls_dim=5, trans_dim=48, depth=2, num_heads=2,
                                 group_size=8, num_group=16, encoder_dims=48)
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.standard_normal((B, 1400, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 5, B))
        variables = model.init(jax.random.key(0), pts[:, :1024])
        tx = build_finetune_optimizer(variables["params"], 1e-3)
        state = create_train_state(variables, tx)
        step = make_finetune_train_step(model, tx, npoints=1024)
        first = None
        for i in range(8):
            state, metrics = step(state, pts, labels, jax.random.key(i))
            if first is None:
                first = float(metrics["loss"])
        assert float(metrics["loss"]) < first

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        ev = make_eval_step(model, npoints=1024)
        logits = ev(variables, pts)
        assert logits.shape == (B, 5)
        vote = make_vote_eval_step(model, npoints=1024, times=3)
        vlogits = vote(variables, pts, jax.random.key(9))
        assert vlogits.shape == (B, 5)


class TestMultiStep:
    def test_scan_equals_sequential_singles(self):
        from gm3d_tpu.train.pretrain import make_gm3d_train_step, make_multi_step

        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = synthetic_clouds()
        num_mask = int(16 * 0.6)
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        svars = student.init(jax.random.key(0), pts, mask0, num_mask)
        tvars = teacher.init(jax.random.key(1), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6)
        multi = make_multi_step(step)
        scalars = {
            "keep_ratio": jnp.asarray(0.4),
            "ema_decay": jnp.asarray(0.99),
            "w_mse": jnp.asarray(1.0),
            "w_cd": jnp.asarray(1.0),
        }
        stack = jnp.stack([synthetic_clouds(seed=s) for s in range(3)])
        keys = jax.random.split(jax.random.key(7), 3)

        s_seq = create_train_state(svars, tx, with_ema=True)
        losses_seq = []
        for k in range(3):
            s_seq, m = step(s_seq, tvars, stack[k], keys[k], scalars)
            losses_seq.append(float(m["loss"]))

        s_multi = create_train_state(svars, tx, with_ema=True)
        s_multi, mstack = multi(s_multi, tvars, stack, keys, scalars)
        np.testing.assert_allclose(
            np.asarray(mstack["loss"]), np.asarray(losses_seq), rtol=2e-4
        )
        p_seq = np.asarray(jax.tree.leaves(s_seq.params)[0])
        p_multi = np.asarray(jax.tree.leaves(s_multi.params)[0])
        np.testing.assert_allclose(p_multi, p_seq, atol=1e-5)


class TestLegacyMultiStep:
    def test_pointmae_scan_equals_sequential_singles(self):
        """3-arg (state, pts, rng) steps — the legacy Point-MAE teacher path
        — through make_multi_step(has_teacher=False, has_scalars=False)."""
        from gm3d_tpu.train.pretrain import make_multi_step, make_pointmae_train_step

        model = PointMAE(**SMALL)
        pts = synthetic_clouds()
        num_mask = int(16 * 0.6)
        mask0 = jnp.zeros((B, 16), bool).at[:, :num_mask].set(True)
        variables = model.init(jax.random.key(0), pts, mask0, num_mask)
        tx = build_adamw(1e-3)
        step = make_pointmae_train_step(model, tx, mask_ratio=0.6)
        multi = make_multi_step(step, has_teacher=False, has_scalars=False)
        stack = jnp.stack([synthetic_clouds(seed=s) for s in range(3)])
        keys = jax.random.split(jax.random.key(5), 3)

        s_seq = create_train_state(variables, tx)
        losses_seq = []
        for k in range(3):
            s_seq, m = step(s_seq, stack[k], keys[k])
            losses_seq.append(float(m["loss"]))

        s_multi = create_train_state(variables, tx)
        s_multi, mstack = multi(s_multi, None, stack, keys, None)
        np.testing.assert_allclose(
            np.asarray(mstack["loss"]), np.asarray(losses_seq), rtol=2e-4
        )
        p_seq = np.asarray(jax.tree.leaves(s_seq.params)[0])
        p_multi = np.asarray(jax.tree.leaves(s_multi.params)[0])
        np.testing.assert_allclose(p_multi, p_seq, atol=1e-5)


class TestFinetuneMultiStep:
    def test_scan_equals_sequential_singles(self):
        from gm3d_tpu.train.finetune import (
            make_finetune_multi_step,
            make_finetune_train_step,
        )

        model = PointTransformer(cls_dim=5, trans_dim=48, depth=2, num_heads=2,
                                 group_size=8, num_group=16, encoder_dims=48)
        rng = np.random.default_rng(3)
        stack = jnp.asarray(rng.standard_normal((3, B, 1400, 3)).astype(np.float32))
        lstack = jnp.asarray(rng.integers(0, 5, (3, B)))
        variables = model.init(jax.random.key(0), stack[0][:, :1024])
        tx = build_finetune_optimizer(variables["params"], 1e-3)
        step = make_finetune_train_step(model, tx, npoints=1024)
        multi = make_finetune_multi_step(step)
        keys = jax.random.split(jax.random.key(7), 3)

        s_seq = create_train_state(variables, tx)
        losses_seq = []
        for k in range(3):
            s_seq, m = step(s_seq, stack[k], lstack[k], keys[k])
            losses_seq.append(float(m["loss"]))

        s_multi = create_train_state(variables, tx)
        s_multi, mstack = multi(s_multi, stack, lstack, keys)
        np.testing.assert_allclose(
            np.asarray(mstack["loss"]), np.asarray(losses_seq), rtol=2e-4
        )
        p_seq = np.asarray(jax.tree.leaves(s_seq.params)[0])
        p_multi = np.asarray(jax.tree.leaves(s_multi.params)[0])
        np.testing.assert_allclose(p_multi, p_seq, atol=1e-5)
        bs_seq = np.asarray(jax.tree.leaves(s_seq.batch_stats)[0])
        bs_multi = np.asarray(jax.tree.leaves(s_multi.batch_stats)[0])
        np.testing.assert_allclose(bs_multi, bs_seq, atol=1e-5)


class TestFusedEmbedStep:
    def test_fused_embed_matches_unfused(self):
        """The fused Pallas patch embed (grad-free EMA/teacher passes) must
        reproduce the XLA step: same mask decisions, same losses to fp32
        rounding (BN folded to affine == running-stats BN in eval mode)."""
        student = GM3DStudent(**SMALL)
        teacher = PointMAE(**SMALL)
        pts = synthetic_clouds(seed=11)
        num_mask = int(SMALL["num_group"] * 0.6)
        mask0 = jnp.zeros((2, SMALL["num_group"]), bool).at[:, :num_mask].set(True)
        import optax

        tx = optax.adamw(1e-4)
        tvars = teacher.init(jax.random.key(1), pts[:2], mask0, num_mask)
        scalars = {"keep_ratio": jnp.asarray(0.5), "ema_decay": jnp.asarray(0.999),
                   "w_mse": jnp.asarray(1.0), "w_cd": jnp.asarray(1.0)}

        def run(use_fused):
            svars = student.init(jax.random.key(0), pts[:2], mask0, num_mask)
            state = create_train_state(svars, tx, with_ema=True)
            step = make_gm3d_train_step(student, teacher, tx, mask_ratio=0.6,
                                        use_fused_embed=use_fused)
            state, metrics = step(state, tvars, pts, jax.random.key(7), scalars)
            return {k: float(v) for k, v in metrics.items()}

        ref = run(False)
        fused = run(True)
        assert fused["loss"] == pytest.approx(ref["loss"], rel=2e-4)
        assert fused["loss_mse"] == pytest.approx(ref["loss_mse"], rel=2e-4)
        assert fused["loss_chfr"] == pytest.approx(ref["loss_chfr"], rel=2e-4, abs=1e-6)


class TestLegacySchedule:
    """Legacy-runner LR schedule + optimizer rules (tools/builder.py:37-90 +
    runner_pretrain.py:176-180) — the recipe that produced the teacher."""

    def test_legacy_accum_sums_microbatch_grads(self):
        """The legacy runners accumulate by SUM: plain ``loss.backward()``
        per micro-batch with no loss division (``runner_pretrain.py:138-151``)
        and clip the SUMMED grad at the update boundary
        (``runner_finetune.py:157-158``). Pin ``build_legacy_adamw(accum>1)``
        against an explicit clip(sum)->AdamW oracle; plain MultiSteps (mean)
        diverges once the clip fires on some updates only."""
        import optax

        from gm3d_tpu.train.optim import _legacy_decay_mask, build_legacy_adamw

        lr, wd, clip, k = 0.01, 0.05, 1.0, 2
        params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
        rng = np.random.default_rng(3)
        # update 1: big micro-grads (summed norm >> clip); update 2: tiny
        # (summed norm < clip) — the clip must fire on the SUM of update 1
        # only, which distinguishes sum from mean semantics under Adam
        micro = [
            jax.tree.map(jnp.asarray, {
                "w": rng.standard_normal((4, 4)).astype(np.float32) * s,
                "bias": rng.standard_normal(4).astype(np.float32) * s,
            })
            for s in (2.0, 2.0, 0.01, 0.01)
        ]

        tx = build_legacy_adamw(lr, wd, accum_steps=k, grad_clip=clip)
        st = tx.init(params)
        p = params
        for g in micro:
            upd, st = tx.update(g, st, p)
            p = optax.apply_updates(p, upd)

        oracle = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=wd,
                        mask=_legacy_decay_mask),
        )
        ost = oracle.init(params)
        po = params
        for i in range(0, len(micro), k):
            gsum = jax.tree.map(
                lambda *gs: sum(gs), *micro[i:i + k])
            upd, ost = oracle.update(gsum, ost, po)
            po = optax.apply_updates(po, upd)

        chex.assert_trees_all_close(p, po, atol=1e-7)

    def test_epoch_constant_with_one_epoch_lag(self):
        from gm3d_tpu.train.schedules import legacy_cosine_epoch_schedule

        spe = 10
        sched = legacy_cosine_epoch_schedule(1e-3, 300, 10, spe)
        # epoch 0 trains at the constructor's warmup init (1e-6)
        assert float(sched(0)) == pytest.approx(1e-6)
        assert float(sched(spe - 1)) == pytest.approx(1e-6)
        # epoch 1 trains at timm t=0 (still warmup init), epoch 2 at t=1
        assert float(sched(spe)) == pytest.approx(1e-6)
        t1 = 1e-6 + (1e-3 - 1e-6) * 1 / 10
        assert float(sched(2 * spe)) == pytest.approx(t1, rel=1e-6)
        # constant within an epoch
        assert float(sched(2 * spe)) == float(sched(3 * spe - 1))
        # cosine phase at raw epoch (warmup_prefix=False): epoch 51 -> t=50
        import math

        t50 = 1e-6 + (1e-3 - 1e-6) * 0.5 * (1 + math.cos(math.pi * 50 / 300))
        assert float(sched(51 * spe)) == pytest.approx(t50, rel=1e-6)

    def test_token_params_not_decayed(self):
        import jax
        import jax.numpy as jnp

        from gm3d_tpu.train.optim import _legacy_decay_mask

        params = {
            "mask_token": jnp.zeros((1, 1, 8)),
            "blocks": {"block0": {"attn": {"qkv": {"kernel": jnp.zeros((8, 24)),
                                                   "bias": jnp.zeros((24,))}}}},
        }
        mask = _legacy_decay_mask(params)
        assert mask["mask_token"] is False          # 'token' in name -> no wd
        assert mask["blocks"]["block0"]["attn"]["qkv"]["kernel"] is True
        assert mask["blocks"]["block0"]["attn"]["qkv"]["bias"] is False

    def test_legacy_adamw_matches_torch_defaults(self):
        """betas (0.9, 0.999) — torch AdamW defaults, NOT the HPM (0.9, 0.95)."""
        import numpy as np
        import torch

        import jax.numpy as jnp
        import optax

        from gm3d_tpu.train.optim import build_legacy_adamw

        w0 = np.random.RandomState(0).randn(4, 4).astype(np.float32)
        g = np.random.RandomState(1).randn(4, 4).astype(np.float32)

        p_t = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt_t = torch.optim.AdamW([{"params": [p_t], "weight_decay": 0.05}], lr=1e-3)
        for _ in range(3):
            opt_t.zero_grad()
            p_t.grad = torch.from_numpy(g.copy())
            opt_t.step()

        tx = build_legacy_adamw(1e-3, 0.05)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for _ in range(3):
            up, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = optax.apply_updates(params, up)
        np.testing.assert_allclose(np.asarray(params["w"]), p_t.detach().numpy(),
                                   atol=1e-6)


class TestAccumScheduleAxis:
    """optax.MultiSteps ticks the inner optimizer count once per UPDATE, so
    schedules must be built over updates_per_epoch, not micro-steps (the
    reference's per-iteration adjust advances epoch_frac by accum_iter
    micro-steps per update, engine...:79-80)."""

    def test_lr_progression_under_accumulation(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        import optax

        from gm3d_tpu.train.optim import build_adamw

        lrs = [1e-3, 2e-3, 4e-3, 8e-3]
        sched = lambda count: jnp.asarray(lrs)[jnp.minimum(count, 3)]
        tx = build_adamw(sched, weight_decay=0.0, accum_steps=2)
        params = {"w": jnp.zeros((4,))}
        state = tx.init(params)
        g = {"w": jnp.ones((4,))}
        deltas = []
        for i in range(6):  # 6 micro-steps = 3 updates
            up, state = tx.update(g, state, params)
            new = optax.apply_updates(params, up)
            deltas.append(float(jnp.abs(new["w"] - params["w"]).max()))
            params = new
        # updates land on odd micro-steps; each uses the NEXT schedule count
        # (adamw with constant grads steps ~lr per element)
        assert deltas[0] == 0.0 and deltas[2] == 0.0 and deltas[4] == 0.0
        np.testing.assert_allclose(deltas[1], lrs[0], rtol=1e-4)
        np.testing.assert_allclose(deltas[3], lrs[1], rtol=1e-4)
        np.testing.assert_allclose(deltas[5], lrs[2], rtol=1e-4)
