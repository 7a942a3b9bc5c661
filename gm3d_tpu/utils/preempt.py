"""Preemption-safe training: SIGTERM -> checkpoint at the next step boundary
-> clean exit.

Production TPU context this exists for: preemptible/spot TPU VMs and managed
schedulers (GKE node drains, maintenance events) deliver SIGTERM with a short
grace window before the VM disappears. The reference has no equivalent — its
only failure handling is the NaN hard exit plus restart-based resume
(SURVEY.md §5.3: `engine_pretrain_Classifier_SVM.py:232-234`,
`main_pretrain.py:444-453`) — so a preempted reference run loses everything
since the last epoch-boundary save.

Here the signal handler only sets a flag; the training loops poll it at step
boundaries (never inside a device dispatch, so in-flight work completes),
write the rolling checkpoint plus the loader-position sidecar (the same
machinery as ``--save_steps``), and exit 0. ``--resume`` then continues from
the exact next batch. Exit code 0 distinguishes a graceful preemption stop
from the NaN hard exit (1) for orchestrators that restart on any exit.
"""

from __future__ import annotations

import signal


class PreemptionGuard:
    """Install with :meth:`install`; poll via :meth:`exit_if_triggered` at
    points where (state, loader position) are mutually consistent."""

    def __init__(self, logger=None, signums=(signal.SIGTERM,)):
        self._logger = logger
        self._signums = signums
        self._prev = {}
        self.triggered = False

    def install(self) -> "PreemptionGuard":
        for s in self._signums:
            try:
                self._prev[s] = signal.signal(s, self._on_signal)
            except ValueError:
                # signal.signal only works in the main thread (in-process
                # test harnesses may drive main() from elsewhere): degrade to
                # a no-op guard rather than refusing to train
                pass
        return self

    def uninstall(self) -> None:
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except ValueError:
                pass
        self._prev = {}

    def _on_signal(self, signum, frame):
        # CPython runs handlers between bytecodes on the main thread, so
        # logging here is safe (logging's RLock is reentrant for the owner)
        self.triggered = True
        if self._logger is not None:
            self._logger.warning(
                f"received signal {signum}: will checkpoint at the next step "
                "boundary and exit (rerun with --resume to continue)")

    def exit_if_triggered(self, save_fn) -> None:
        """If a signal arrived, run ``save_fn()`` (checkpoint + loader
        sidecar), restore handlers, and exit 0."""
        if not self.triggered:
            return
        save_fn()
        if self._logger is not None:
            self._logger.warning(
                "preempted: checkpoint + loader position saved; "
                "rerun with --resume to continue from the next batch")
        self.uninstall()
        raise SystemExit(0)
