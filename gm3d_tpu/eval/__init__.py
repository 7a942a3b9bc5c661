"""Evaluation: linear-SVM probe, classification accuracy, voting, part mIoU."""

from gm3d_tpu.eval.svm import extract_features, evaluate_svm, svm_probe
from gm3d_tpu.eval.metrics import accuracy, part_miou

__all__ = ["extract_features", "evaluate_svm", "svm_probe", "accuracy", "part_miou"]
