"""Rank-aware logging + JSON-lines epoch records.

Reference: ``utils/logger.py:29-127`` (named loggers, rank-0-only file
handler) and the per-epoch JSON-lines files (``main_pretrain.py:613-626``)
whose format matches the published ``log_files/``.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def get_logger(name: str = "gm3d", log_file: Optional[str] = None,
               level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if getattr(logger, "_gm3d_configured", False):
        return logger
    rank = _process_index()
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file and rank == 0:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    # non-main processes only surface errors (reference behaviour)
    logger.setLevel(level if rank == 0 else logging.ERROR)
    logger._gm3d_configured = True  # type: ignore[attr-defined]
    return logger


def print_log(msg: str, logger: Optional[logging.Logger | str] = None,
              level: int = logging.INFO) -> None:
    if logger is None:
        if _process_index() == 0:
            print(msg)
    elif isinstance(logger, str):
        get_logger(logger).log(level, msg)
    else:
        logger.log(level, msg)


class ScalarWriter:
    """TensorBoard scalar writer (reference SummaryWriter usage,
    ``main_pretrain.py:272,281-286``); silently no-ops if tensorboard is
    unavailable or on non-main processes."""

    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir and _process_index() == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir)
            except Exception:
                self._writer = None

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()


class JsonlLogger:
    """Per-epoch JSON-lines stats file ({model}_{exp}_log.txt format)."""

    def __init__(self, path: str):
        self.path = path
        self.enabled = _process_index() == 0
        if self.enabled:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def write(self, record: dict) -> None:
        if not self.enabled:
            return
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
