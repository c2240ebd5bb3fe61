"""JaxDetector adapter plumbing: resize/pad, decode thresholding, mask
assembly, Detection record format."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.inference.jax_detector import JaxDetector
from pix2pose_tpu.models.detector import CenterNetDetector


def test_adapter_emits_valid_detections():
    model = CenterNetDetector(num_classes=2, head_dim=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    det = JaxDetector(model, v, class_to_obj_id=[7, 9], score_th=0.0,
                      top_k=8, input_size=256)
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    out = det.detect(0, 0, rgb)
    assert len(out) <= 8
    for d in out:
        assert d.obj_id in (7, 9)
        assert d.bbox.shape == (4,)
        assert 0 <= d.bbox[0] <= d.bbox[2] < 480
        assert 0 <= d.bbox[1] <= d.bbox[3] < 640
        assert d.mask is None or d.mask.shape == (480, 640)
        assert 0.0 <= d.score <= 1.0


def test_adapter_score_threshold_filters():
    model = CenterNetDetector(num_classes=1, head_dim=32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    det = JaxDetector(model, v, class_to_obj_id=[1], score_th=0.9999,
                      top_k=8, input_size=256)
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    assert det.detect(0, 0, rgb) == []
