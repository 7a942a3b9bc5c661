"""Checkpointing: one orbax schema + a PyTorch-checkpoint importer.

Replaces the reference's two coexisting .pth formats (SURVEY.md §5.4) with a
single schema {params, batch_stats, opt_state, ema_*, step, best_metric};
the importer maps published reference checkpoints (teacher ``pretrain_PMAE.pth``
and fine-tune ckpts) 1:1 onto the flax trees.
"""

from gm3d_tpu.ckpt.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_raw,
    latest_step,
    save_best_metrics,
    load_best_metrics,
    save_loader_state,
    load_loader_state,
)
from gm3d_tpu.ckpt.async_writer import AsyncCheckpointWriter, device_snapshot
from gm3d_tpu.ckpt.torch_import import (
    export_torch_checkpoint,
    import_torch_checkpoint,
    torch_key_to_flax,
)
from gm3d_tpu.ckpt.transfer import load_pretrained_into, overlay_pretrained

__all__ = [
    "AsyncCheckpointWriter",
    "device_snapshot",
    "save_checkpoint",
    "restore_checkpoint",
    "restore_raw",
    "latest_step",
    "save_best_metrics",
    "load_best_metrics",
    "save_loader_state",
    "load_loader_state",
    "export_torch_checkpoint",
    "import_torch_checkpoint",
    "torch_key_to_flax",
    "load_pretrained_into",
    "overlay_pretrained",
]
