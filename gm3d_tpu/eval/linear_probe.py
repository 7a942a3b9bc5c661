"""Linear probing with LARS (reference ``main_linprob.py`` + ``util/lars.py``,
re-targeted from its image-domain leftovers to point-cloud features): train a
single linear layer on frozen pooled encoder features."""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
import optax


def lars(
    learning_rate, weight_decay: float = 0.0, momentum: float = 0.9, eta: float = 0.001
) -> optax.GradientTransformation:
    """LARS (layer-wise adaptive rate scaling), as in ``util/lars.py`` — optax
    provides the building blocks."""
    return optax.lars(
        learning_rate,
        weight_decay=weight_decay,
        momentum=momentum,
        trust_coefficient=eta,
    )


def linear_probe(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    num_classes: int | None = None,
    epochs: int = 90,
    batch_size: int = 256,
    base_lr: float = 6.4,  # MAE linprob: blr 0.1 * eff_batch 16384 / 256
    seed: int = 0,
) -> float:
    """Fit logits = W.pooled_features with LARS + cosine schedule; returns
    test accuracy. Features are the same pooled vectors the SVM probe uses."""
    if num_classes is None:
        num_classes = int(train_labels.max()) + 1
    dim = train_features.shape[1]
    num_train = train_features.shape[0]
    batch_size = min(batch_size, num_train)
    steps_per_epoch = max(num_train // batch_size, 1)

    sched = optax.cosine_decay_schedule(base_lr, epochs * steps_per_epoch)
    tx = lars(sched)
    # LARS trust ratio is |w|/|g|: zero-init weights would freeze at 0
    key = jax.random.key(seed)
    params = {
        "w": jax.random.normal(key, (dim, num_classes), jnp.float32) * 0.01,
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            one_hot = jax.nn.one_hot(y, num_classes)
            return jnp.mean(optax.softmax_cross_entropy(logits, one_hot))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    xs = jnp.asarray(train_features, jnp.float32)
    ys = jnp.asarray(train_labels)
    rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        order = rng.permutation(num_train)
        for s in range(steps_per_epoch):
            idx = order[s * batch_size : (s + 1) * batch_size]
            params, opt_state, _ = step(params, opt_state, xs[idx], ys[idx])

    logits = np.asarray(jnp.asarray(test_features, jnp.float32) @ params["w"] + params["b"])
    return float((logits.argmax(-1) == test_labels).mean())
