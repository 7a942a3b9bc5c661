"""Model zoo: Point-MAE family, GM3D student, PointTransformer, Point-M2AE.

All modules are flax.linen; compute dtype is configurable (bf16 on TPU),
parameters are fp32. Registry names mirror the reference's MODELS registry
(``models/build.py`` in /root/reference/Point-MAE_SA3D).
"""

from gm3d_tpu.models.blocks import (
    Mlp,
    Attention,
    Block,
    TransformerEncoder,
    TransformerDecoder,
    PatchEncoder,
    PosEmbedMLP,
)
from gm3d_tpu.models.pointmae import MaskTransformer, PointMAE
from gm3d_tpu.models.gm3d import GM3DStudent
from gm3d_tpu.models.point_transformer import PointTransformer, Classifier
from gm3d_tpu.models.m2ae import PointM2AE, PointM2AEClassifier
from gm3d_tpu.models.segmentation import PointM2AESeg, PointMAESeg, propagate_features

__all__ = [
    "Mlp",
    "Attention",
    "Block",
    "TransformerEncoder",
    "TransformerDecoder",
    "PatchEncoder",
    "PosEmbedMLP",
    "MaskTransformer",
    "PointMAE",
    "GM3DStudent",
    "PointTransformer",
    "Classifier",
    "PointM2AE",
    "PointM2AEClassifier",
    "PointMAESeg",
    "PointM2AESeg",
    "propagate_features",
]
