"""Numerical-safety tooling (SURVEY.md §5.2/§5.3): the closest reference
analog is a commented-out ``set_detect_anomaly`` + NaN-loss hard exit
(``engine_pretrain_Classifier_SVM.py:232-234``). Off by default."""

from __future__ import annotations

import math
import sys

import jax


def enable_debug_nans(enable: bool = True) -> None:
    """jax-level NaN detection (the set_detect_anomaly equivalent)."""
    jax.config.update("jax_debug_nans", enable)


def check_finite_loss(loss_value: float, logger=None, exit_on_nan: bool = True) -> bool:
    """Reference behaviour: non-finite loss aborts the run
    (``engine_pretrain_Classifier_SVM.py:217-219,232-234``)."""
    if math.isfinite(loss_value):
        return True
    msg = f"Loss is {loss_value}, stopping"
    if logger is not None:
        logger.error(msg)
    else:
        print(msg, file=sys.stderr)
    if exit_on_nan:
        sys.exit(1)
    return False
