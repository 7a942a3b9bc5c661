"""Device mesh + sharding helpers (data parallel over ICI).

Replaces the reference's DDP/NCCL stack (``util/misc.py:215-247``,
``utils/dist_utils.py:9-54``): with a 1-D ``data`` mesh and sharded batches,
XLA inserts the gradient psum over ICI automatically — no explicit
collectives in user code (SURVEY.md §2.4).
"""

from gm3d_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from gm3d_tpu.parallel.multihost import init_distributed, is_main_process, gather_features

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "init_distributed",
    "is_main_process",
    "gather_features",
]
