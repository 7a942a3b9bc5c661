"""Serving-side batcher over an exported artifact.

The exported module has a STATIC batch (TPU rule: static shapes on the MXU
path). :class:`ServingModel` maps arbitrary request sizes onto it:

  - a single cloud ``(N, 3)`` is promoted to a batch of one
  - ``B <= batch``: zero-pad to ``batch``, slice the outputs back
  - ``B > batch``: chunk into ceil(B / batch) calls

Padding clouds are all-zeros; their outputs are discarded, never returned.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from gm3d_tpu.serve.export import load_artifact


def check_points(points: np.ndarray, npoints: int):
    """Validate and batch-promote request points.

    Returns ``(points (B, npoints, 3) float32, was_single)``; raises
    ``ValueError`` on any shape-contract violation. Shared by
    :class:`ServingModel` and the :class:`~gm3d_tpu.serve.batcher.DynamicBatcher`
    (which must validate on the REQUEST thread, before enqueueing)."""
    points = np.asarray(points, dtype=np.float32)
    single = points.ndim == 2
    if single:
        points = points[None]
    if points.ndim != 3 or points.shape[2] != 3:
        raise ValueError(f"expected (B, N, 3) points, got {points.shape}")
    if points.shape[1] != npoints:
        raise ValueError(
            f"expected {npoints} points per cloud (the exported "
            f"input size), got {points.shape[1]}")
    return points, single


class ServingModel:
    """Loads a ``.gm3dx`` artifact and serves numpy in / numpy out."""

    def __init__(self, path: str):
        self._fn, self.manifest = load_artifact(path)
        self.batch, self.npoints, _ = self.manifest["input_shape"]

    @property
    def info(self) -> Dict[str, Any]:
        return dict(self.manifest)

    def predict(self, points: np.ndarray) -> np.ndarray:
        """points (B, N, 3) or (N, 3) -> outputs (B, ...) / (...)."""
        points, single = check_points(points, self.npoints)
        b = points.shape[0]
        outs = []
        for start in range(0, b, self.batch):
            chunk = points[start:start + self.batch]
            if chunk.shape[0] < self.batch:
                pad = np.zeros((self.batch - chunk.shape[0],) + chunk.shape[1:],
                               np.float32)
                chunk = np.concatenate([chunk, pad], axis=0)
            outs.append(self._fn(chunk))
        out = np.concatenate(outs, axis=0)[:b]
        return out[0] if single else out
