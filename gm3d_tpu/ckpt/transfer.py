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

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _is_tree(x) -> bool:
    return isinstance(x, dict) or hasattr(x, "items")


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


def _overlay(dst: dict, src: dict) -> int:
    """Copy name+shape-matched leaves of ``src`` onto ``dst`` in place
    (strict=False semantics); returns the number of leaves transferred."""
    n = 0
    for k, v in src.items():
        if _is_tree(v):
            if isinstance(dst.get(k), dict):
                n += _overlay(dst[k], v)
        elif k in dst and not _is_tree(dst[k]):
            d = dst[k]
            if np.shape(d) == np.shape(v):
                dst[k] = jnp.asarray(v, dtype=np.asarray(d).dtype)
                n += 1
    return n


def overlay_pretrained(
    params: Any,
    batch_stats: Optional[Any],
    src_params: Any,
    src_batch_stats: Optional[Any] = None,
    strip_mae_encoder: bool = True,
    flatten=(),
) -> Tuple[Any, Optional[Any], int]:
    """Overlay pretrain weights onto a fresh finetune tree.

    Returns ``(params, batch_stats, n_transferred)`` — new trees (inputs are
    not mutated).  Callers MUST check ``n_transferred > 0``: a zero count
    means the checkpoint layout didn't line up and finetune would start from
    random init.
    """

    def prep(src):
        src = strip_mae_encoder_tree(src) if strip_mae_encoder else src
        return flatten_subtrees(src, flatten) if flatten else src

    params = jax.tree.map(lambda x: x, params)  # rebuild containers: safe to mutate
    n = _overlay(params, prep(src_params))
    if batch_stats is not None and src_batch_stats is not None:
        batch_stats = jax.tree.map(lambda x: x, batch_stats)
        n += _overlay(batch_stats, prep(src_batch_stats))
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
    if torch_ckpt:
        from gm3d_tpu.ckpt.torch_import import (
            POINT_TRANSFORMER_MAP,
            import_torch_checkpoint,
            load_torch_file,
        )

        sd = load_torch_file(pretrained)
        imported = import_torch_checkpoint(sd, POINT_TRANSFORMER_MAP, strip_mae_encoder=True)
        unmatched = imported.pop("_unmatched")
        if logger:
            logger.info(f"torch import: {len(unmatched)} unmatched keys (strict=False)")
        params, batch_stats, n = overlay_pretrained(
            params, batch_stats, imported.get("params", {}),
            imported.get("batch_stats"), strip_mae_encoder=True, flatten=flatten,
        )
    else:
        from gm3d_tpu.ckpt.checkpoint import restore_raw

        raw = restore_raw(pretrained)
        if raw is None:
            raise FileNotFoundError(f"no checkpoint found under {pretrained}")
        params, batch_stats, n = overlay_pretrained(
            params, batch_stats, raw.get("params", {}), raw.get("batch_stats"),
            strip_mae_encoder=True, flatten=flatten,
        )
    if n == 0:
        raise ValueError(
            f"pretrained checkpoint {pretrained!r} transferred 0 parameters — "
            "layout mismatch (expected MAE_encoder/* or root-level encoder keys)"
        )
    if logger:
        logger.info(f"pretrain->finetune transfer: {n} leaves overlaid from {pretrained}")
    return params, batch_stats, n
