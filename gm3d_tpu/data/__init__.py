"""Data pipelines: dataset readers + on-device augmentations.

Host side does IO + normalisation only; FPS/grouping/augment run on device
inside the jitted step so the TPU never stalls on host preprocessing
(SURVEY.md §7.1).
"""

from gm3d_tpu.data.transforms import (
    scale_and_translate,
    rotate_z,
    jitter,
    random_dropout,
    unit_sphere_normalize,
)

__all__ = [
    "scale_and_translate",
    "rotate_z",
    "jitter",
    "random_dropout",
    "unit_sphere_normalize",
]
