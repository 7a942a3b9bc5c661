"""Pretrain -> finetune weight transfer.

The reference loads a pretrain checkpoint into ``PointTransformer`` with
strict=False after stripping the ``MAE_encoder.`` / ``base_model.`` /
``module.`` key prefixes (``main_finetune.py:297-324``,
``models/Point_MAE.py:511-543``).  In the flax tree world that surgery is a
*re-rooting*: a GM3D/PointMAE pretrain checkpoint nests the encoder under
``params["MAE_encoder"]`` (submodules ``encoder``, ``pos_embed``, ``blocks``,
``norm``) while ``PointTransformer`` holds the same submodules at the tree
root.  Without re-rooting the top-level key sets are disjoint and a naive
shape-matched overlay transfers ZERO leaves — finetune silently trains from
random init (round-1 bug).

``overlay_pretrained`` re-roots, overlays name+shape-matched leaves, and
returns the transferred-leaf count so callers can assert/log a nonzero
transfer.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_tree(x) -> bool:
    return isinstance(x, dict) or hasattr(x, "items")


def group_paths(paths: List[str]) -> List[str]:
    """Collapse numbered siblings into one line (detectron2-style grouped key
    reports, reference ``utils/checkpoint.py:16-132``): paths differing only
    in digit runs render as ``blocks/block*/attn/qkv/kernel x12``."""
    groups: dict = {}
    for p in paths:
        groups.setdefault(re.sub(r"\d+", "*", p), []).append(p)
    lines = []
    for tmpl in sorted(groups):
        ps = groups[tmpl]
        lines.append(ps[0] if len(ps) == 1 else f"{tmpl} x{len(ps)}")
    return lines


class TransferReport:
    """Per-key record of a checkpoint-surgery overlay.

    The reference prints grouped missing/unexpected key reports on every
    strict=False load (``utils/checkpoint.py:16-132``, used by
    ``models/Point_MAE.py:528-538``); a bare transferred-leaf COUNT lets a
    partial overlay after a layout drift pass silently and surface only as a
    mysterious accuracy gap (round-3 verdict #3). Fields:

    - ``matched``: destination leaf paths that received a source value;
    - ``missing``: destination leaves NOT covered by the source (stay at
      their fresh init — fine for heads, suspicious for encoder leaves);
    - ``unexpected``: source leaves with no destination counterpart (in the
      post-surgery key space, i.e. after re-rooting/flattening);
    - ``shape_mismatch``: name-matched leaves skipped for differing shapes;
    - ``torch_unmatched``: raw torch keys the import map didn't recognize.
    """

    def __init__(self):
        self.matched: List[str] = []
        self.missing: List[str] = []
        self.unexpected: List[str] = []
        self.shape_mismatch: List[Tuple[str, tuple, tuple]] = []
        self.torch_unmatched: List[str] = []

    @property
    def matched_fraction(self) -> float:
        total = len(self.matched) + len(self.missing)
        return len(self.matched) / total if total else 0.0

    def lines(self) -> List[str]:
        out = [
            f"transfer: {len(self.matched)} leaves overlaid "
            f"({self.matched_fraction:.0%} of the destination tree)"
        ]
        if self.missing:
            out.append(f"  missing (left at fresh init, {len(self.missing)}):")
            out += [f"    {line}" for line in group_paths(self.missing)]
        if self.unexpected:
            out.append(f"  unexpected in checkpoint ({len(self.unexpected)}):")
            out += [f"    {line}" for line in group_paths(self.unexpected)]
        if self.shape_mismatch:
            out.append(f"  shape mismatches (skipped, {len(self.shape_mismatch)}):")
            out += [
                f"    {p}: ckpt{tuple(s)} vs model{tuple(d)}"
                for p, s, d in self.shape_mismatch
            ]
        if self.torch_unmatched:
            out.append(
                f"  torch keys unrecognized by the import map "
                f"({len(self.torch_unmatched)}):"
            )
            out += [f"    {line}" for line in group_paths(self.torch_unmatched)]
        return out

    def log(self, logger) -> None:
        """Grouped report; WARNING when the overlay was partial or skipped
        shape-mismatched leaves, INFO otherwise."""
        if logger is None:
            return
        partial = self.matched_fraction < 1.0 or self.shape_mismatch
        emit = logger.warning if partial else logger.info
        for line in self.lines():
            emit(line)


def strip_mae_encoder_tree(src: dict) -> dict:
    """Re-root ``src["MAE_encoder"]`` at the top level (tree equivalent of the
    ``MAE_encoder.`` prefix strip, ``main_finetune.py:312-313``).

    Encoder subkeys win over any same-named root keys, matching the torch
    dict-comprehension order where the stripped key overwrites.
    """
    if not _is_tree(src) or "MAE_encoder" not in src:
        return dict(src) if _is_tree(src) else src
    out = {k: v for k, v in src.items() if k != "MAE_encoder"}
    enc = src["MAE_encoder"]
    if _is_tree(enc):
        out.update(enc)
    return out


def flatten_subtrees(src: dict, keys) -> dict:
    """Promote the children of the named subtrees to the parent level —
    e.g. ``blocks/block{i}`` -> ``block{i}`` for the segmentation model,
    which holds its blocks at the module root (``models/segmentation.py``)."""
    out = {k: v for k, v in src.items() if k not in keys}
    for key in keys:
        sub = src.get(key)
        if _is_tree(sub):
            out.update(sub)
    return out


def _leaf_paths(tree: dict, prefix: str = "") -> List[str]:
    out = []
    for k, v in tree.items():
        p = f"{prefix}{k}"
        out.extend(_leaf_paths(v, p + "/")) if _is_tree(v) else out.append(p)
    return out


def _overlay(dst: dict, src: dict, report: Optional[TransferReport] = None,
             prefix: str = "") -> int:
    """Copy name+shape-matched leaves of ``src`` onto ``dst`` in place
    (strict=False semantics); returns the number of leaves transferred and
    records per-key outcomes on ``report`` when given."""
    n = 0
    for k, v in src.items():
        path = f"{prefix}{k}"
        if _is_tree(v):
            if isinstance(dst.get(k), dict):
                n += _overlay(dst[k], v, report, path + "/")
            elif report is not None:
                report.unexpected.extend(_leaf_paths(v, path + "/"))
        elif k in dst and not _is_tree(dst[k]):
            d = dst[k]
            if np.shape(d) == np.shape(v):
                dst[k] = jnp.asarray(v, dtype=np.asarray(d).dtype)
                if report is not None:
                    report.matched.append(path)
                n += 1
            elif report is not None:
                report.shape_mismatch.append((path, np.shape(v), np.shape(d)))
        elif report is not None:
            report.unexpected.append(path)
    return n


def overlay_pretrained(
    params: Any,
    batch_stats: Optional[Any],
    src_params: Any,
    src_batch_stats: Optional[Any] = None,
    strip_mae_encoder: bool = True,
    flatten=(),
    report: Optional[TransferReport] = None,
) -> Tuple[Any, Optional[Any], int]:
    """Overlay pretrain weights onto a fresh finetune tree.

    Returns ``(params, batch_stats, n_transferred)`` — new trees (inputs are
    not mutated).  Callers MUST check ``n_transferred > 0``: a zero count
    means the checkpoint layout didn't line up and finetune would start from
    random init.  Pass a :class:`TransferReport` to collect the per-key
    missing/unexpected/shape-mismatch record (named surgery report).
    """

    def prep(src):
        src = strip_mae_encoder_tree(src) if strip_mae_encoder else src
        return flatten_subtrees(src, flatten) if flatten else src

    params = jax.tree.map(lambda x: x, params)  # rebuild containers: safe to mutate
    n = _overlay(params, prep(src_params), report, "params/")
    if batch_stats is not None and src_batch_stats is not None:
        batch_stats = jax.tree.map(lambda x: x, batch_stats)
        n += _overlay(batch_stats, prep(src_batch_stats), report, "batch_stats/")
    if report is not None:
        matched = set(report.matched)
        dst_paths = _leaf_paths(params, "params/")
        if batch_stats is not None:
            dst_paths += _leaf_paths(batch_stats, "batch_stats/")
        report.missing = [p for p in dst_paths if p not in matched]
    return params, batch_stats, n


def load_pretrained_into(
    params: Any,
    batch_stats: Optional[Any],
    pretrained: str,
    torch_ckpt: bool = False,
    logger=None,
    flatten=(),
) -> Tuple[Any, Optional[Any], int]:
    """One-stop pretrain->finetune load used by finetune/fewshot/seg CLIs.

    ``pretrained`` is an orbax ckpt dir (in-framework pretrain) or a torch
    ``.pth`` (published reference checkpoint) when ``torch_ckpt``.
    """
    report = TransferReport()
    if torch_ckpt:
        from gm3d_tpu.ckpt.torch_import import (
            POINT_TRANSFORMER_MAP,
            import_torch_checkpoint,
            load_torch_file,
        )

        sd = load_torch_file(pretrained)
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP, strip_mae_encoder=True)
        report.torch_unmatched = list(imported.pop("_unmatched"))
        params, batch_stats, n = overlay_pretrained(
            params, batch_stats, imported.get("params", {}),
            imported.get("batch_stats"), strip_mae_encoder=True, flatten=flatten,
            report=report,
        )
    else:
        from gm3d_tpu.ckpt.checkpoint import restore_raw

        raw = restore_raw(pretrained)
        if raw is None:
            raise FileNotFoundError(f"no checkpoint found under {pretrained}")
        params, batch_stats, n = overlay_pretrained(
            params, batch_stats, raw.get("params", {}), raw.get("batch_stats"),
            strip_mae_encoder=True, flatten=flatten, report=report,
        )
    if n == 0:
        raise ValueError(
            f"pretrained checkpoint {pretrained!r} transferred 0 parameters — "
            "layout mismatch (expected MAE_encoder/* or root-level encoder keys)"
        )
    if logger:
        logger.info(f"pretrain->finetune transfer: {n} leaves overlaid from {pretrained}")
        report.log(logger)
    return params, batch_stats, n
