"""Serving-side batcher over an exported artifact.

The exported module has a STATIC batch (TPU rule: static shapes on the MXU
path). :class:`ServingModel` maps arbitrary request sizes onto it:

  - a single cloud ``(N, 3)`` is promoted to a batch of one
  - ``B <= batch``: zero-pad to ``batch``, slice the outputs back
  - ``B > batch``: chunk into ceil(B / batch) calls

Padding clouds are all-zeros; their outputs are discarded, never returned.

Multi-chip fan-out: with ``devices=[...]`` the chunks of a large request are
round-robined across local chips and dispatched asynchronously (the host
read happens only after every chunk is in flight), so a host that owns N
chips serves from one process instead of N artifact replicas. Each chunk is
still the single-device exported program — this is request-level data
parallelism, the right shape for inference (no cross-chip collectives).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Optional, Sequence

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
    if points.shape[0] == 0:
        raise ValueError("empty request batch (B=0)")
    if points.shape[1] != npoints:
        raise ValueError(
            f"expected {npoints} points per cloud (the exported "
            f"input size), got {points.shape[1]}")
    return points, single


def check_labels(cls_label, b: int, single: bool, dtype,
                 num_classes: "int | None" = None) -> np.ndarray:
    """Validate per-cloud labels against a request of ``b`` clouds.

    A scalar label is promoted alongside a single-cloud request; otherwise
    the shape must be ``(b,)``. With ``num_classes`` the values must lie in
    ``[0, num_classes)`` — an out-of-range index would one-hot to all-zeros
    inside the model (silently wrong logits) and a negative one would pick
    the WRONG category's part table in the server's category-restricted
    argmax (Python indexing wraps). Raises ``ValueError`` on any violation
    (same request-thread contract as :func:`check_points`)."""
    lab = np.asarray(cls_label)
    if single and lab.ndim == 0:
        lab = lab[None]
    if lab.shape != (b,):
        raise ValueError(
            f"expected cls_label of shape ({b},) matching the request "
            f"batch, got {lab.shape}")
    if not np.issubdtype(lab.dtype, np.number):
        raise ValueError(f"cls_label must be numeric, got dtype {lab.dtype}")
    if lab.size and not (np.all(np.isfinite(lab)) and np.all(lab == np.floor(lab))):
        # fractional labels would silently truncate in the int cast below and
        # NaN compares False against both range bounds — reject both up front
        raise ValueError("cls_label values must be finite integers")
    if num_classes is not None and lab.size:
        lo, hi = lab.min(), lab.max()
        if lo < 0 or hi >= num_classes:
            raise ValueError(
                f"cls_label values must be in [0, {num_classes}) — the "
                f"artifact's object-category count — got range [{lo}, {hi}]")
    return lab.astype(dtype, copy=False)


class ServingModel:
    """Loads a ``.gm3dx`` artifact and serves numpy in / numpy out.

    ``devices``: optional sequence of local ``jax.Device`` to fan chunks out
    over (round-robin, async dispatch). ``None`` (default) keeps the
    single-device synchronous path."""

    def __init__(self, path: str, devices: Optional[Sequence] = None):
        self._fn, self.manifest = load_artifact(path)
        self.batch, self.npoints, _ = self.manifest["input_shape"]
        self.devices = list(devices) if devices else None
        self._in_dtype = np.dtype(self.manifest["input_dtype"])
        # at most one extra per-cloud input is supported (the seg model's
        # cls_label); save_artifact guarantees it leads with the batch dim
        extra = self.manifest.get("extra_inputs", [])
        if len(extra) > 1:
            raise ValueError(
                f"artifact has {len(extra)} extra inputs; ServingModel "
                "supports at most one (per-cloud cls_label)")
        self._label_dtype = np.dtype(extra[0]["dtype"]) if extra else None
        # category count for label range-validation (seg exports carry the
        # category list in the manifest; absent -> range unchecked)
        names = self.manifest.get("cls_names")
        self._num_categories = len(names) if names else None
        # persistent round-robin cursor: per-CALL indexing would pin every
        # small request (and every batcher-coalesced batch, which is always
        # one chunk) to devices[0]. itertools.count.__next__ is a single
        # C-level op — safe from concurrent request threads.
        self._rr = itertools.count()

    @property
    def needs_labels(self) -> bool:
        """True for artifacts with a per-cloud label input (segmentation)."""
        return self._label_dtype is not None

    @property
    def info(self) -> Dict[str, Any]:
        info = dict(self.manifest)
        if self.devices:
            info["serving_devices"] = len(self.devices)
        return info

    def predict(self, points: np.ndarray, cls_label=None) -> np.ndarray:
        """points (B, N, 3) or (N, 3) -> outputs (B, ...) / (...).

        Segmentation artifacts additionally take ``cls_label`` — the
        per-cloud object category, ``(B,)`` int (scalar with a single
        cloud); it pads/chunks in lockstep with the points."""
        points, single = check_points(points, self.npoints)
        b = points.shape[0]
        if self.needs_labels:
            if cls_label is None:
                raise ValueError(
                    "this artifact requires cls_label (per-cloud object "
                    "category) alongside the points")
            labels = check_labels(cls_label, b, single, self._label_dtype,
                                  self._num_categories)
        elif cls_label is not None:
            raise ValueError("this artifact takes no cls_label input")
        pending = []  # (result or jit future, valid rows)
        for start in range(0, b, self.batch):
            chunk = points[start:start + self.batch]
            n = chunk.shape[0]
            if n < self.batch:
                pad = np.zeros((self.batch - n,) + chunk.shape[1:],
                               np.float32)
                chunk = np.concatenate([chunk, pad], axis=0)
            extra = ()
            if self.needs_labels:
                lab = labels[start:start + self.batch]
                if n < self.batch:
                    lab = np.concatenate(
                        [lab, np.zeros(self.batch - n, self._label_dtype)])
                extra = (lab,)
            if self.devices:
                import jax

                dev = self.devices[next(self._rr) % len(self.devices)]
                args = [jax.device_put(
                    chunk.astype(self._in_dtype, copy=False), dev)]
                args += [jax.device_put(x, dev) for x in extra]
                # async: jit returns a future; all chunks go in flight
                # before any host read below
                pending.append((self._fn.device_call(*args), n))
            else:
                pending.append((self._fn(chunk, *extra), n))
        out = np.concatenate([np.asarray(o)[:n] for o, n in pending], axis=0)
        return out[0] if single else out
