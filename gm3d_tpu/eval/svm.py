"""Linear-SVM probe — the pretrain quality gate (SURVEY.md §3.2).

Feature extraction is jitted on device (FPS to npoints + encoder-only
forward); the SVC fit stays on host, matching the reference exactly:
``SVC(C=0.01, kernel='linear')`` on (mean + max)-pooled features
(``main_pretrain.py:710-717``).
"""

from __future__ import annotations

import functools
from typing import Callable, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gm3d_tpu.ops.fps import fps


@functools.lru_cache(maxsize=8)
def make_feature_fn(model, npoints: int = 1024, batch_floor: int = 0) -> Callable:
    """Jitted noaug probe forward: points -> (B, D) POOLED features.

    Pooling is the reference ``feature.mean(1) + feature.max(1)``
    (``main_pretrain.py:713-715``) unless the model defines a family-specific
    ``pooled_features`` method (Point-M2AE pools per scale and concatenates —
    its scales have different widths, so a single token array can't express
    the protocol; docs/DESIGN.md §8).

    Memoized on (model, npoints, batch_floor) — flax modules are frozen
    dataclasses, so repeated probes (every validation epoch) reuse ONE jitted
    fn instead of re-tracing a fresh closure each call (first compiles cost
    20–500 s on the tunneled TPU, CLAUDE.md). ``batch_floor`` tiles batches
    below the TPU compile-shape floor — e.g. a ragged last probe batch —
    with exact copies and slices the features back (deterministic forward,
    so exact; train.finetune.floor_reps)."""
    from gm3d_tpu.train.finetune import floor_reps

    pooled = getattr(model, "pooled_features", None)

    @jax.jit
    def feature_fn(variables, pts):
        x = fps(pts, npoints) if pts.shape[1] > npoints else pts
        reps = floor_reps(x.shape[0], batch_floor)
        if reps > 1:
            x = jnp.tile(x, (reps, 1, 1))
        if pooled is not None:
            feats = model.apply(variables, x, method=pooled)
        else:
            tok = model.apply(variables, x, method=model.encode_features)
            feats = jnp.mean(tok, axis=1) + jnp.max(tok, axis=1)
        return feats[: pts.shape[0]]

    return feature_fn


def extract_features(
    feature_fn: Callable, variables, loader: Iterable
) -> Tuple[np.ndarray, np.ndarray]:
    """Run the pooled feature fn over a labelled loader.

    Host reads are deferred until every batch is enqueued, so the device
    streams the whole probe set without idling one dispatch round-trip per
    batch (pooled features are (B, D) — tiny to hold on device)."""
    feats, labels = [], []
    for pts, lbl in loader:
        feats.append(feature_fn(variables, jnp.asarray(pts)))
        labels.append(np.asarray(lbl))
    return (np.concatenate([np.asarray(f, np.float32) for f in feats]),
            np.concatenate(labels))


def evaluate_svm(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
) -> float:
    """``main_pretrain.py:710-717`` (features are already pooled here)."""
    from sklearn.svm import SVC

    clf = SVC(C=0.01, kernel="linear")
    clf.fit(train_features, train_labels)
    pred = clf.predict(test_features)
    return float((test_labels == pred).sum() / pred.shape[0])


def svm_probe(model, variables, train_loader, test_loader, npoints: int = 1024,
              batch_floor: int = 0) -> float:
    """Full probe: extract train/test features, fit, return accuracy."""
    feature_fn = make_feature_fn(model, npoints, batch_floor)
    tr_f, tr_l = extract_features(feature_fn, variables, train_loader)
    te_f, te_l = extract_features(feature_fn, variables, test_loader)
    return evaluate_svm(tr_f, tr_l, te_f, te_l)
