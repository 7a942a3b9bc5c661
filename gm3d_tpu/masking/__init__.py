"""Mask selection: random, block, and GM3D geometric-complexity masks.

All generators are fully vectorised device code with static output shapes —
the reference's per-row numpy loop in ``generate_mask``
(``models_mae_learn_loss_Classifier_SVM_feature_besed.py:1091-1099``) is a
host round-trip per step that a TPU pipeline cannot afford (SURVEY.md §7.1).
"""

from gm3d_tpu.masking.masks import (
    random_mask,
    block_mask,
    geometric_mask,
    gm3d_num_mask,
    keep_ratio_schedule,
)

__all__ = [
    "random_mask",
    "block_mask",
    "geometric_mask",
    "gm3d_num_mask",
    "keep_ratio_schedule",
]
