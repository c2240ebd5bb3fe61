"""Serving layer: frame processing, overlays, ros_config.json parsing."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.serving import PoseService, ServingConfig
from pix2pose_tpu.serving.viz import bbox_corners, draw_pose_box
from pix2pose_tpu.inference.detector import Detection
from synthetic import CAM_K, OracleGenerator, pose_with_euler, xyz_scene
from test_rasterizer import cube_mesh


class StaticDetector:
    def __init__(self, dets):
        self.dets = dets

    def detect(self, scene_id, im_id, rgb):
        return self.dets


@pytest.fixture(scope="module")
def service():
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    verts, _ = cube_mesh(40.0)
    cfg = ServingConfig(cam_K=np.asarray(CAM_K), outlier_th=(0.1, 0.2, 0.3),
                        inlier_th=0.1)
    obj_param = np.array([40, 40, 40, 0, 0, 0], np.float32)
    R, t = pose_with_euler()
    rgb, _, hit = xyz_scene(R, t)
    vu = np.where(hit)
    det = Detection(bbox=np.array([vu[0].min(), vu[1].min(), vu[0].max(),
                                   vu[1].max()], np.int32),
                    obj_id=1, score=0.9, mask=hit)
    svc = PoseService(cfg, StaticDetector([det]), model, {1: params},
                      {1: obj_param}, {1: bbox_corners(verts)})
    return svc, rgb, R, t


def test_process_frame(service):
    svc, rgb, R, t = service
    res = svc.process(rgb)
    assert len(res.poses) == 1
    p = res.poses[0]
    assert p.obj_id == 1
    assert np.linalg.norm(p.t - t) < 0.02 * t[2]
    assert p.score > 0.1
    # overlays actually drew something
    assert (res.pose_image != rgb).any()
    assert (res.detection_image != rgb).any()
    assert res.latency_s > 0


def test_process_empty_frame(service):
    svc, rgb, R, t = service
    blank = np.full_like(rgb, 128)
    res = svc.process(blank)
    assert res.poses == []


def test_serving_config_parses_reference_schema(tmp_path):
    raw = {"backbone": "resnet50", "inlier_th": 0.15,
           "outlier_th": [0.1, 0.2], "n_objs": 2, "obj_labels": [1, 2],
           "target_obj_name": [2], "icp": 1, "model_scale": 0.001,
           "cam_K": list(np.asarray(CAM_K).reshape(-1).astype(float)),
           "im_height": 480, "im_width": 640,
           "rgb_topic": "/x/rgb", "depth_topic": "/x/depth"}
    p = tmp_path / "ros_config.json"
    p.write_text(json.dumps(raw))
    cfg = ServingConfig.load(str(p))
    assert cfg.backbone == "resnet50"
    assert cfg.icp is True
    assert cfg.cam_K.shape == (3, 3)
    assert cfg.target_obj_name == (2,)
    assert cfg.rgb_topic == "/x/rgb"


def test_draw_pose_box_bounds():
    img = np.zeros((100, 120, 3), np.uint8)
    corners = bbox_corners(np.array([[-20, -20, -20], [20, 20, 20]],
                                    np.float64))
    R, t = pose_with_euler(tz=400.0)
    out = draw_pose_box(img, corners, R, t, np.asarray(CAM_K) * 0.2)
    assert out.shape == img.shape
    assert (out > 0).any()
