"""Linear probing on frozen pooled encoder features (reference
``main_linprob.py``, re-targeted from its image-domain leftovers to
point-cloud features).

Reference-EFFECTIVE recipe (what the shipped main actually runs):

- head = ``BatchNorm1d(affine=False, eps=1e-6)`` -> ``Linear``
  (``main_linprob.py:222-223``), head weight trunc-normal std 0.01
  (``:219``), everything else frozen;
- optimizer = plain ``SGD(momentum=0.9, weight_decay=0)`` on the head —
  the LARS line is COMMENTED OUT (``main_linprob.py:253-259``);
- lr = ``blr * eff_batch / 256`` (blr default 0.1, ``:241``), per-iteration
  half-cycle cosine with ``warmup_epochs=10``, ``min_lr=0``, ``epochs=90``
  (``util/lr_sched.py:11-23`` via ``engine_finetune.train_one_epoch``);
- CrossEntropy, best epoch accuracy kept (``:292-295``).

``lars`` below reproduces the commented-out MoCo-v3 alternative
(``util/lars.py:15-44``) exactly — weight decay and the trust ratio apply
only to ndim>1 params, and the lr scales the momentum BUFFER (``p -= lr*mu``
with ``mu = m*mu + dp``), unlike ``optax.lars`` which scales before the
trace — kept because the reference keeps it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax


def lars(
    learning_rate, weight_decay: float = 0.0, momentum: float = 0.9, eta: float = 0.001
) -> optax.GradientTransformation:
    """MoCo-v3 LARS exactly as ``util/lars.py``: for ndim>1 params
    ``dp = g + wd*p`` scaled by ``eta*|p|/|dp|`` (1 where either norm is 0);
    1D params take the raw gradient; then ``mu = momentum*mu + dp`` and the
    update is ``-lr * mu`` (lr OUTSIDE the momentum accumulation)."""

    def init(params):
        return {"mu": jax.tree.map(jnp.zeros_like, params),
                "count": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        if params is None:
            raise ValueError("lars requires params")
        lr = learning_rate(state["count"]) if callable(learning_rate) else learning_rate

        def adapt(g, p):
            if p.ndim <= 1:  # "not normalization gamma/beta or bias"
                return g
            dp = g + weight_decay * p
            pn = jnp.linalg.norm(p)
            un = jnp.linalg.norm(dp)
            q = jnp.where(pn > 0.0, jnp.where(un > 0.0, eta * pn / un, 1.0), 1.0)
            return dp * q

        dp = jax.tree.map(adapt, grads, params)
        mu = jax.tree.map(lambda m, d: momentum * m + d, state["mu"], dp)
        updates = jax.tree.map(lambda m: -lr * m, mu)
        return updates, {"mu": mu, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def linprob_lr(it: float, peak_lr: float, warmup_epochs: float, epochs: float,
               min_lr: float = 0.0) -> float:
    """``util/lr_sched.py:11-23`` on a fractional-epoch axis."""
    if it < warmup_epochs:
        return peak_lr * it / warmup_epochs
    return min_lr + (peak_lr - min_lr) * 0.5 * (
        1.0 + np.cos(np.pi * (it - warmup_epochs) / (epochs - warmup_epochs)))


def linear_probe(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    num_classes: int | None = None,
    epochs: int = 90,
    batch_size: int = 256,
    base_lr: float = 0.1,  # --blr default, main_linprob.py:56
    warmup_epochs: int = 10,
    seed: int = 0,
) -> float:
    """Reference-effective linear probe: BN(affine=False, eps=1e-6) feature
    normalizer + linear head, SGD momentum 0.9 (wd 0), per-iteration
    half-cosine from ``blr * batch/256``. Returns the BEST epoch's test
    accuracy (``main_linprob.py:294-295`` ``max_accuracy``)."""
    if num_classes is None:
        num_classes = int(train_labels.max()) + 1
    dim = train_features.shape[1]
    num_train = train_features.shape[0]
    batch_size = min(batch_size, num_train)
    steps_per_epoch = max(num_train // batch_size, 1)
    peak_lr = base_lr * batch_size / 256.0

    # torch BatchNorm1d defaults: momentum 0.1 running-stat EMA, biased
    # batch variance in the normalizer, unbiased in the running stats
    bn_momentum, bn_eps = 0.1, 1e-6

    key_w, key_b = jax.random.split(jax.random.key(seed))
    params = {
        # trunc_normal_(std=0.01) head init (main_linprob.py:219)
        "w": 0.01 * jax.random.truncated_normal(
            key_w, -2.0, 2.0, (dim, num_classes), jnp.float32),
        # torch Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        "b": jax.random.uniform(
            key_b, (num_classes,), jnp.float32,
            -1.0 / np.sqrt(dim), 1.0 / np.sqrt(dim)),
    }
    # torch SGD(momentum): v = m*v + g; p -= lr*v — lr applied AFTER the
    # momentum buffer, so trace() here and fold the per-iteration lr in below
    tx = optax.trace(decay=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, bn_run, x, y, lr):
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)  # biased, as torch uses in the normalizer
        xn = (x - mean) / jnp.sqrt(var + bn_eps)
        n = x.shape[0]
        var_unbiased = var * n / max(n - 1, 1)
        new_run = {
            "mean": (1 - bn_momentum) * bn_run["mean"] + bn_momentum * mean,
            "var": (1 - bn_momentum) * bn_run["var"] + bn_momentum * var_unbiased,
        }

        def loss_fn(p):
            logits = xn @ p["w"] + p["b"]
            one_hot = jax.nn.one_hot(y, num_classes)
            return jnp.mean(optax.softmax_cross_entropy(logits, one_hot))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        traced, new_opt = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda v: -lr * v, traced)
        return optax.apply_updates(params, updates), new_opt, new_run, loss

    @jax.jit
    def predict(params, bn_run, x):
        xn = (x - bn_run["mean"]) / jnp.sqrt(bn_run["var"] + bn_eps)
        return xn @ params["w"] + params["b"]

    xs = jnp.asarray(train_features, jnp.float32)
    ys = jnp.asarray(train_labels)
    xs_te = jnp.asarray(test_features, jnp.float32)
    bn_run = {"mean": jnp.zeros((dim,), jnp.float32),
              "var": jnp.ones((dim,), jnp.float32)}
    rng = np.random.default_rng(seed)
    best = 0.0
    for epoch in range(epochs):
        order = rng.permutation(num_train)
        for s in range(steps_per_epoch):
            frac_epoch = s / steps_per_epoch + epoch
            lr = linprob_lr(frac_epoch, peak_lr, warmup_epochs, epochs)
            idx = order[s * batch_size : (s + 1) * batch_size]
            params, opt_state, bn_run, _ = step(
                params, opt_state, bn_run, xs[idx], ys[idx], lr)
        logits = np.asarray(predict(params, bn_run, xs_te))
        best = max(best, float((logits.argmax(-1) == test_labels).mean()))
    return best
