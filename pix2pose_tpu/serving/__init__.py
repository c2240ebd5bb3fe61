"""Streaming serving layer (the reference's ROS node, L7)."""

from pix2pose_tpu.serving.service import PoseService, ServingConfig  # noqa: F401
from pix2pose_tpu.serving.server import (BatchingFrontend,  # noqa: F401
                                         PoseClient, PoseServer)
