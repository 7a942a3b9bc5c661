"""Infra utilities: rank-aware logging, windowed meters, JSON-lines epoch logs."""

from gm3d_tpu.utils.logging import get_logger, print_log, JsonlLogger
from gm3d_tpu.utils.meters import SmoothedValue, MetricLogger, AverageMeter

__all__ = [
    "get_logger",
    "print_log",
    "JsonlLogger",
    "SmoothedValue",
    "MetricLogger",
    "AverageMeter",
]
