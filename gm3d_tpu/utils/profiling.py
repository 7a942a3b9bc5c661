"""Tracing / profiling (SURVEY.md §5.1): the reference has timing meters only;
here we add jax.profiler trace capture with the same meter semantics on top."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax profiler trace (viewable in TensorBoard / Perfetto) for
    the enclosed steps; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with device sync, mirroring the reference's
    iter/data-time meters (``util/misc.py:122-166``)."""

    def __init__(self):
        self.iter_times = []
        self.data_times = []
        self._t0 = time.perf_counter()

    def data_ready(self):
        self.data_times.append(time.perf_counter() - self._t0)

    def step_done(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        self.iter_times.append(now - self._t0)
        self._t0 = now

    def summary(self) -> dict:
        import numpy as np

        return {
            "iter_time_avg": float(np.mean(self.iter_times)) if self.iter_times else 0.0,
            "data_time_avg": float(np.mean(self.data_times)) if self.data_times else 0.0,
            "steps": len(self.iter_times),
        }
