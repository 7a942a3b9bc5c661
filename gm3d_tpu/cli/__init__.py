"""CLI entry points mirroring the reference mains:

  python -m gm3d_tpu.cli.pretrain      (main_pretrain.py — GM3D / Point-MAE / M2AE)
  python -m gm3d_tpu.cli.finetune      (main_finetune.py — cls, + vote eval)
  python -m gm3d_tpu.cli.finetune_seg  (main_finetune_segmentation.py)
  python -m gm3d_tpu.cli.fewshot       (few-shot harness, 10-fold aggregate)
  python -m gm3d_tpu.cli.evaluate      (test-only eval incl. vote)

All accept ``--synthetic`` to run on generated clouds when benchmark data is
not on disk (smoke/bring-up); with real data paths in the configs the
pipelines match the reference's benchmarks.
"""
