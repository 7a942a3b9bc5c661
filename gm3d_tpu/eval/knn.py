"""DINO-style weighted-kNN classifier on extracted features (reference
``main_knn.py:154-198`` knn_classifier — kept as an alternative probe to the
linear SVM; operates on the same pooled encoder features)."""

from __future__ import annotations

import numpy as np


def knn_classifier(
    train_features: np.ndarray,
    train_labels: np.ndarray,
    test_features: np.ndarray,
    test_labels: np.ndarray,
    k: int = 20,
    temperature: float = 0.07,
    num_classes: int | None = None,
) -> float:
    """Cosine-similarity weighted vote over the k nearest training features."""
    if num_classes is None:
        num_classes = int(train_labels.max()) + 1

    def normalize(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    tr = normalize(train_features.astype(np.float64))
    te = normalize(test_features.astype(np.float64))
    sim = te @ tr.T  # (Nte, Ntr)
    idx = np.argsort(-sim, axis=1)[:, :k]
    topk_sim = np.take_along_axis(sim, idx, axis=1)
    topk_labels = train_labels[idx]  # (Nte, k)
    weights = np.exp(topk_sim / temperature)
    votes = np.zeros((te.shape[0], num_classes))
    for c in range(num_classes):
        votes[:, c] = np.sum(weights * (topk_labels == c), axis=1)
    pred = votes.argmax(1)
    return float((pred == test_labels).mean())
