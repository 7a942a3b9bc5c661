"""Multi-host (multi-slice) support.

Replaces the reference's NCCL rendezvous (``util/misc.py:215-247`` reading
RANK/WORLD_SIZE/SLURM/OMPI env): single-controller JAX initialises once per
host and collectives compile over ICI within a slice / DCN across slices.
The host-side SVM fit needs globally gathered features — that is the ONLY
explicit collective in the framework (mirroring ``dist_utils.gather_tensor``
at ``main_pretrain.py:685-689``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX. No-op for single-process runs; with args
    absent, jax auto-detects cluster environments (GKE/SLURM)."""
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialised or single-process auto-detect
        pass


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def gather_features(features: np.ndarray, labels: np.ndarray):
    """All-gather eval features/labels across hosts for the host-side SVM fit
    (``dist_utils.gather_tensor`` equivalent). Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return features, labels
    from jax.experimental import multihost_utils

    gathered_f = multihost_utils.process_allgather(features)
    gathered_l = multihost_utils.process_allgather(labels)
    return (
        np.asarray(gathered_f).reshape(-1, features.shape[-1]),
        np.asarray(gathered_l).reshape(-1),
    )
