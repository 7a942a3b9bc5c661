"""gm3d_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of GM3D (GeoMask3D).

Self-supervised point-cloud pre-training with geometrically informed mask
selection (Point-MAE / Point-M2AE backbones), rebuilt TPU-first:

- ``gm3d_tpu.ops``     — geometry kernels (FPS, KNN, grouping, Chamfer, EMD)
  replacing the reference's pointnet2_ops / KNN_CUDA / chamfer CUDA extensions.
- ``gm3d_tpu.models``  — flax models: Point-MAE teacher, GM3D student with
  dual decoders + loss predictor, PointTransformer classifier, Point-M2AE.
- ``gm3d_tpu.masking`` — random / block / geometric-complexity mask selection.
- ``gm3d_tpu.train``   — jit-compiled train steps (pretrain, GM3D, finetune),
  LR schedules, EMA.
- ``gm3d_tpu.data``    — dataset pipelines (ShapeNet55, ModelNet40,
  ScanObjectNN, few-shot, ShapeNetPart).
- ``gm3d_tpu.eval``    — SVM probe, accuracy, vote eval, part-seg mIoU.
- ``gm3d_tpu.parallel``— mesh / sharding helpers (data-parallel over ICI).
- ``gm3d_tpu.ckpt``    — orbax checkpointing + torch checkpoint importer.
"""

__version__ = "0.1.0"
