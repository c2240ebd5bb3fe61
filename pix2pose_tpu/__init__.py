"""pix2pose_tpu — a TPU-native 6D object pose estimation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Pix2Pose
reference system (ICCV'19 + BOP'20 updates): per-object encoder-decoder
networks regress pixel-wise normalized 3D model coordinates plus a per-pixel
error estimate; poses are recovered with on-device PnP-RANSAC and optionally
refined with depth-based ICP.

Design principles (vs. the reference, which is TF1/Keras + OpenCV + OpenGL +
PyCUDA, one crop at a time):

- Everything on the hot path is a shape-static, batched tensor program under
  ``jax.jit``: crop extraction, the two-stage network pass, PnP-RANSAC over
  all candidates, ICP over all hypotheses.
- Rendering (training-pair synthesis and ICP depth) is a JAX triangle
  rasterizer instead of GLSL/CUDA kernels.
- Scale-out is a ``jax.sharding.Mesh``: batch-sharded GAN training steps and
  crop-sharded inference over ICI, replacing the reference's one-GPU-per-job
  shell scripting.
"""

__version__ = "0.1.0"

from pix2pose_tpu.config import (  # noqa: F401
    EstimatorConfig,
    EvalConfig,
    TrainConfig,
    load_eval_config,
)


def __getattr__(name):
    """Lazy top-level exports (keep `import pix2pose_tpu` light)."""
    if name == "Pix2PoseEstimator":
        from pix2pose_tpu.inference.engine import Pix2PoseEstimator
        return Pix2PoseEstimator
    if name == "BopEvaluator":
        from pix2pose_tpu.eval.bop_eval import BopEvaluator
        return BopEvaluator
    if name == "BopDataset":
        from pix2pose_tpu.data.bop import BopDataset
        return BopDataset
    if name == "build_generator":
        from pix2pose_tpu.models import build_generator
        return build_generator
    raise AttributeError(name)
