"""Frozen-feature probe parity against the ACTUAL reference code
(``main_knn.py`` / ``main_linprob.py`` / ``util/lars.py`` run under the CPU
shims) — not re-written oracles:

- the DINO weighted kNN classifier must match ``main_knn.knn_classifier``
  exactly (same top-1 on the same features, including the call-site
  normalize-then-dot protocol, ``main_knn.py:340-364``);
- the linear-probe trajectory must match the reference-EFFECTIVE head:
  ``BatchNorm1d(affine=False, eps=1e-6) -> Linear`` trained with plain SGD
  momentum 0.9 (the LARS line is commented out, ``main_linprob.py:253-259``)
  under the ``util/lr_sched.adjust_learning_rate`` half-cosine;
- the kept LARS alternative must match ``util/lars.py`` step-for-step.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import reference_shims  # noqa: E402


def _features(seed, n_tr=80, n_te=600, dim=24, classes=5):
    """Clustered random features so accuracies are non-degenerate. n_te >= 500
    because the reference kNN hardcodes num_chunks=500 (main_knn.py:157)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1.5, (classes, dim))
    l_tr = rng.integers(0, classes, n_tr)
    l_te = rng.integers(0, classes, n_te)
    f_tr = centers[l_tr] + rng.normal(0, 1.0, (n_tr, dim))
    f_te = centers[l_te] + rng.normal(0, 1.0, (n_te, dim))
    return (f_tr.astype(np.float32), l_tr.astype(np.int64),
            f_te.astype(np.float32), l_te.astype(np.int64))


class TestKNNParity:
    @pytest.mark.parametrize("k", [10, 20])
    def test_top1_matches_reference(self, k):
        from gm3d_tpu.eval.knn import knn_classifier

        main_knn = reference_shims._import_from_reference("main_knn")
        f_tr, l_tr, f_te, l_te = _features(0)

        # reference call-site protocol: L2-normalize features first
        # (main_knn.py:340-343), then knn_classifier(train.T dot products)
        tr = torch.nn.functional.normalize(torch.from_numpy(f_tr), dim=1, p=2)
        te = torch.nn.functional.normalize(torch.from_numpy(f_te), dim=1, p=2)
        ref_top1, _ = main_knn.knn_classifier(
            tr, torch.from_numpy(l_tr), te, torch.from_numpy(l_te),
            k, 0.07, num_classes=5)

        ours = knn_classifier(f_tr, l_tr, f_te, l_te, k=k, temperature=0.07)
        assert ours * 100.0 == pytest.approx(ref_top1, abs=1e-4)


class TestLARSParity:
    def test_trajectory_matches_util_lars(self):
        """Our lars() vs the reference LARS optimizer on identical grads:
        wd + trust ratio only on ndim>1 params, lr outside the momentum
        buffer — 8 steps with a CHANGING lr (the case optax.lars gets
        wrong, which is why the custom transform exists)."""
        import jax
        import jax.numpy as jnp

        from gm3d_tpu.eval.linear_probe import lars

        util_lars = reference_shims._import_from_reference("util.lars")
        rng = np.random.default_rng(1)
        w0 = rng.standard_normal((6, 4)).astype(np.float32)
        b0 = rng.standard_normal(4).astype(np.float32)
        grads = [(rng.standard_normal((6, 4)).astype(np.float32),
                  rng.standard_normal(4).astype(np.float32))
                 for _ in range(8)]
        lrs = [0.1 * (i + 1) / 8 for i in range(8)]  # warmup-like ramp
        wd, mom, eta = 0.05, 0.9, 0.001

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
        opt = util_lars.LARS([tw, tb], lr=0.0, weight_decay=wd,
                             momentum=mom, trust_coefficient=eta)
        for (gw, gb), lr in zip(grads, lrs):
            for g in opt.param_groups:
                g["lr"] = lr
            tw.grad = torch.from_numpy(gw.copy())
            tb.grad = torch.from_numpy(gb.copy())
            opt.step()

        params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
        tx = lars(lambda c: jnp.asarray(lrs)[c], weight_decay=wd,
                  momentum=mom, eta=eta)
        st = tx.init(params)
        for gw, gb in grads:
            upd, st = tx.update({"w": jnp.asarray(gw), "b": jnp.asarray(gb)},
                                st, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)

        np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)


class TestLinprobParity:
    def test_trajectory_matches_reference_head(self):
        """Our linear_probe vs the reference-effective torch head — REAL
        torch BatchNorm1d(affine=False, eps=1e-6) + Linear, plain torch SGD
        momentum 0.9 wd 0 (main_linprob.py:254-259), the reference's own
        util/lr_sched.adjust_learning_rate on the fractional-epoch axis —
        same init, same batch order, matching per-epoch test accuracy and
        final head weights."""
        import jax
        import jax.numpy as jnp

        from gm3d_tpu.eval.linear_probe import linprob_lr

        lr_sched = reference_shims._import_from_reference("util.lr_sched")
        f_tr, l_tr, f_te, l_te = _features(2, n_tr=96, n_te=500, dim=12)
        dim, classes = 12, 5
        epochs, batch, blr, warmup = 12, 32, 0.1, 2
        steps_per_epoch = 96 // batch
        peak = blr * batch / 256.0

        # shared init + shared batch order
        rng = np.random.default_rng(0)
        w0 = (0.01 * np.clip(rng.standard_normal((dim, classes)), -2, 2)
              ).astype(np.float32)
        b0 = rng.uniform(-1 / np.sqrt(dim), 1 / np.sqrt(dim),
                         classes).astype(np.float32)
        orders = [np.random.default_rng(100 + e).permutation(96)
                  for e in range(epochs)]

        # --- torch side: the reference-effective head -------------------
        bn = torch.nn.BatchNorm1d(dim, affine=False, eps=1e-6)
        lin = torch.nn.Linear(dim, classes)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(w0.T))
            lin.bias.copy_(torch.from_numpy(b0))
        head = torch.nn.Sequential(bn, lin)
        opt = torch.optim.SGD(lin.parameters(), lr=0.0, momentum=0.9,
                              weight_decay=0)
        crit = torch.nn.CrossEntropyLoss()

        class A:  # args namespace for adjust_learning_rate
            lr, min_lr = peak, 0.0
            warmup_epochs, epochs_ = warmup, epochs
        A.epochs = epochs

        ref_accs = []
        for e in range(epochs):
            head.train()
            for s in range(steps_per_epoch):
                lr_sched.adjust_learning_rate(opt, s / steps_per_epoch + e, A)
                idx = orders[e][s * batch:(s + 1) * batch]
                opt.zero_grad()
                out = head(torch.from_numpy(f_tr[idx]))
                crit(out, torch.from_numpy(l_tr[idx])).backward()
                opt.step()
            head.eval()
            with torch.no_grad():
                pred = head(torch.from_numpy(f_te)).argmax(-1).numpy()
            ref_accs.append(float((pred == l_te).mean()))

        # --- ours: same math via the module's own building blocks -------
        import optax

        from gm3d_tpu.eval import linear_probe as lp

        params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
        tx = optax.trace(decay=0.9)
        st = tx.init(params)
        bn_run = {"mean": jnp.zeros(dim), "var": jnp.ones(dim)}

        @jax.jit
        def step(params, st, bn_run, x, y, lr):
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            xn = (x - mean) / jnp.sqrt(var + 1e-6)
            n = x.shape[0]
            new_run = {
                "mean": 0.9 * bn_run["mean"] + 0.1 * mean,
                "var": 0.9 * bn_run["var"] + 0.1 * var * n / (n - 1),
            }

            def loss_fn(p):
                logits = xn @ p["w"] + p["b"]
                return jnp.mean(optax.softmax_cross_entropy(
                    logits, jax.nn.one_hot(y, classes)))

            grads = jax.grad(loss_fn)(params)
            traced, st2 = tx.update(grads, st, params)
            return (optax.apply_updates(
                params, jax.tree.map(lambda v: -lr * v, traced)), st2, new_run)

        our_accs = []
        for e in range(epochs):
            for s in range(steps_per_epoch):
                lr = linprob_lr(s / steps_per_epoch + e, peak, warmup, epochs)
                idx = orders[e][s * batch:(s + 1) * batch]
                params, st, bn_run = step(
                    params, st, bn_run, jnp.asarray(f_tr[idx]),
                    jnp.asarray(l_tr[idx]), lr)
            xn = (jnp.asarray(f_te) - bn_run["mean"]) / jnp.sqrt(bn_run["var"] + 1e-6)
            pred = np.asarray(xn @ params["w"] + params["b"]).argmax(-1)
            our_accs.append(float((pred == l_te).mean()))

        # the schedule itself must agree exactly
        for it in [0.0, 0.5, warmup, warmup + 0.25, epochs - 1.0]:
            assert linprob_lr(it, peak, warmup, epochs) == pytest.approx(
                lr_sched.adjust_learning_rate(opt, it, A), abs=1e-12)

        np.testing.assert_allclose(np.asarray(params["w"]),
                                   lin.weight.detach().numpy().T,
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(params["b"]),
                                   lin.bias.detach().numpy(),
                                   rtol=2e-4, atol=1e-6)
        assert our_accs == ref_accs

    def test_linear_probe_learns(self):
        """End-to-end: the public linear_probe (reference-effective recipe)
        separates clustered features."""
        from gm3d_tpu.eval.linear_probe import linear_probe

        f_tr, l_tr, f_te, l_te = _features(3, n_tr=200, n_te=500, dim=16)
        acc = linear_probe(f_tr, l_tr, f_te, l_te, epochs=30, batch_size=64)
        assert acc > 0.8
