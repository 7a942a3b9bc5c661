"""One-dispatch-deep metrics pipeline: keep the device queue full.

Reading a dispatch's metrics to host (``np.asarray``) blocks until that
dispatch completes; through the remote-TPU tunnel the dispatch round-trip
alone is ~36 ms (docs/BENCHMARKS.md "dispatch overhead"). A training loop
that reads metrics BEFORE enqueuing the next dispatch therefore idles the
device for that read plus the next group's stacking, every dispatch.
:class:`DeferredMetrics` holds the previous dispatch's device-resident
metrics and drains them only AFTER the next dispatch is enqueued (jax
dispatch is async), so the device always has queued work.

Semantics, relative to the synchronous loop:
  - meter coverage is unchanged — every step's metrics are drained, in order;
  - the NaN hard exit (``utils.debug.check_finite_loss``) lags by exactly one
    dispatch: it still hard-exits, after at most one extra dispatch of
    compute (the reference syncs per step via ``loss.item()``,
    ``engine_pretrain_Classifier_SVM.py:217``, which a remote accelerator
    cannot afford);
  - checkpoint / preemption saves read the live train state, which blocks
    until the in-flight dispatch completes, so saved state and loader
    position stay mutually consistent. The training CLIs additionally
    ``flush()`` the pipeline before every save (rolling ``--save_steps``
    and preemption): the deferred NaN checks must run BEFORE a state is
    persisted, or a NaN-corrupted state could overwrite the last good
    rolling checkpoint. The flush is free there — the save's device
    snapshot synchronizes on the in-flight dispatch anyway.

``depth=0`` degrades to the synchronous behavior (the ``--sync_metrics``
escape hatch, for debugging and A/B measurement).
"""

from __future__ import annotations

from typing import Callable


class DeferredMetrics:
    """Queue device-metric payloads; drain FIFO once more than ``depth`` are
    pending. ``drain`` receives the pushed item(s) verbatim and is where the
    host read happens."""

    def __init__(self, drain: Callable, depth: int = 1):
        self._drain = drain
        self._depth = max(0, int(depth))
        self._q: list = []

    def push(self, *item) -> None:
        self._q.append(item)
        while len(self._q) > self._depth:
            self._drain(*self._q.pop(0))

    def flush(self) -> None:
        """Drain everything (epoch end — meters must be complete before the
        epoch stats are computed)."""
        while self._q:
            self._drain(*self._q.pop(0))
