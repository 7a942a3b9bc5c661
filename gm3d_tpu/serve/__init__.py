"""AOT export + serving (production deployment surface).

The reference has no deployment story: its checkpoints are only consumable
by the full training codebase (``models/Point_MAE.py`` plus the
``tools/runner_finetune.py`` test paths). The rebuild adds one: the jitted
eval forward is AOT-lowered with ``jax.export`` to a self-contained
StableHLO artifact (weights baked in as constants) that loads and runs
WITHOUT any model code, on every platform it was lowered for (cpu / tpu).

Surfaces:
  - :mod:`gm3d_tpu.serve.export`  — artifact format, export/load
  - :mod:`gm3d_tpu.serve.runner`  — :class:`ServingModel` (pad/chunk batching)
  - :mod:`gm3d_tpu.serve.batcher` — :class:`DynamicBatcher` (coalesce
    concurrent requests into shared device calls)
  - :mod:`gm3d_tpu.serve.server`  — stdlib HTTP micro-server
  - CLIs: ``gm3d_tpu.cli.export_model``, ``gm3d_tpu.cli.serve``
"""

from gm3d_tpu.serve.export import (  # noqa: F401
    build_classifier_fn,
    build_feature_fn,
    build_seg_fn,
    export_forward,
    load_artifact,
    save_artifact,
)
from gm3d_tpu.serve.batcher import DynamicBatcher  # noqa: F401
from gm3d_tpu.serve.runner import ServingModel  # noqa: F401
