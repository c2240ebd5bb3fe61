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


def test_rle_roundtrip():
    from pix2pose_tpu.tools.run_detector import encode_rle
    from pix2pose_tpu.inference.detector import PrecomputedDetector
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = rng.rand(37, 53) > rng.uniform(0.2, 0.8)
        rle = encode_rle(m)
        back = PrecomputedDetector._decode_rle(rle)
        np.testing.assert_array_equal(back, m)
    # all-false and all-true edge cases
    for m in (np.zeros((8, 8), bool), np.ones((8, 8), bool)):
        np.testing.assert_array_equal(
            PrecomputedDetector._decode_rle(encode_rle(m)), m)


def test_export_and_replay_detections(tmp_path):
    from pix2pose_tpu.tools.run_detector import export_detections
    from pix2pose_tpu.inference.detector import (Detection,
                                                 PrecomputedDetector)

    class FakeDs:
        def load_rgb(self, s, i):
            return np.zeros((48, 64, 3), np.uint8)

    class FakeDet:
        def detect(self, s, i, rgb):
            m = np.zeros((48, 64), bool)
            m[10:20, 30:40] = True
            return [Detection(bbox=np.array([10, 30, 19, 39]), obj_id=2,
                              score=0.7, mask=m)]

    out = str(tmp_path / "det.json")
    n = export_detections(FakeDet(), FakeDs(), [(0, 0, [2], [1])], out)
    assert n == 1
    pre = PrecomputedDetector(out)
    dets = pre.detect(0, 0, None)
    assert len(dets) == 1
    d = dets[0]
    assert d.obj_id == 2 and abs(d.score - 0.7) < 1e-9
    np.testing.assert_array_equal(d.bbox, [10, 30, 19, 39])
    assert d.mask[15, 35] and not d.mask[0, 0]
