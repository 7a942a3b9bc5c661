"""Host->device prefetching: overlap the next batch's transfer with the
current step's compute (SURVEY.md §7.2 step 9 — "overlap host IO ... so the
TPU never stalls on host preprocessing")."""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


class device_prefetch:
    """Yield device-resident batches while the next transfers are in flight.

    ``jax.device_put`` is async: enqueuing the next batch's copy before
    yielding the current one overlaps PCIe/ICI transfer with the running
    step. ``sharding`` places batches directly on a mesh.

    Checkpointing: pre-pulling ``size`` batches advances the wrapped
    DataLoader's own ``state()`` ahead of what the consumer has actually
    trained on — saving THAT token mid-epoch would silently skip up to
    ``size`` batches on resume. :meth:`state` returns the resume token as of
    the last batch this prefetcher yielded (captured at pull time), which is
    the correct one. Epoch-boundary saves (what the CLIs do) are identical
    either way.
    """

    def __init__(self, loader: Iterable, size: int = 2, sharding=None):
        self.loader = loader
        self.size = size
        self.sharding = sharding
        self._yielded_state = self._loader_state()

    def _loader_state(self) -> Optional[dict]:
        get = getattr(self.loader, "state", None)
        return get() if callable(get) else None

    def state(self) -> Optional[dict]:
        """Resume token for the NEXT batch after the last one yielded."""
        return self._yielded_state

    def _put(self, batch):
        if self.sharding is not None:
            from gm3d_tpu.parallel.mesh import _put  # multi-process aware

            return jax.tree.map(
                lambda x: _put(np.asarray(x), self.sharding), batch)
        return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x)), batch)

    def __iter__(self) -> Iterator:
        queue = []
        it = iter(self.loader)
        try:
            for _ in range(self.size):
                queue.append((self._put(next(it)), self._loader_state()))
        except StopIteration:
            pass
        while queue:
            out, state_after = queue.pop(0)
            try:
                queue.append((self._put(next(it)), self._loader_state()))
            except StopIteration:
                pass
            self._yielded_state = state_after
            yield out
