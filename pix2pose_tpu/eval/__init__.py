"""Evaluation drivers (BOP RGB and RGB-D) and pose-error metrics."""

from pix2pose_tpu.eval.bop_eval import BopEvaluator  # noqa: F401
