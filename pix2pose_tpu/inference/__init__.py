"""Batched two-stage inference engine and detector adapters."""

from pix2pose_tpu.inference.engine import (  # noqa: F401
    PoseEstimate,
    Pix2PoseEstimator,
)
