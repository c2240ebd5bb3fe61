"""RGB-D evaluator with ICP on the synthetic cube dataset: refined poses
must beat (or match) the RGB-only poses against GT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.config import EvalConfig
from pix2pose_tpu.data import BopDataset
from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
from pix2pose_tpu.eval.icp_refine import make_icp_refiner
from pix2pose_tpu.inference import Pix2PoseEstimator
from pix2pose_tpu.inference.detector import GtDetector
from pix2pose_tpu.ops import geometry
from bop_fixture import build_cube_dataset
from synthetic import CAM_K, OracleGenerator, pose_with_euler
from test_rasterizer import cube_mesh


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def test_icp_refiner_improves_perturbed_pose():
    verts, faces = cube_mesh(40.0)
    R, t = pose_with_euler()
    # render GT depth (meters)
    from pix2pose_tpu.ops import rasterizer
    depth_mm, mask = rasterizer.render_depth(verts, faces, R, t, CAM_K,
                                             480, 640)
    depth = np.asarray(depth_mm) / 1000.0
    tgt_pts = geometry.backproject(jnp.asarray(depth), CAM_K)
    tgt_n = geometry.normals_from_depth(jnp.asarray(depth), CAM_K,
                                        refine=True)
    union = np.asarray(mask)

    # perturb the pose
    from scipy.spatial.transform import Rotation
    dR = Rotation.from_euler("xyz", [0.05, -0.04, 0.06]).as_matrix()
    R0 = (dR @ R).astype(np.float32)
    t0 = t + np.array([8.0, -6.0, 15.0], np.float32)

    refine = make_icp_refiner(verts / 1000.0, faces, 480, 640)
    out = refine(jnp.asarray(R0), jnp.asarray(t0), CAM_K,
                 jnp.asarray(union), jnp.asarray(depth), tgt_pts, tgt_n,
                 jax.random.PRNGKey(0))
    assert bool(out.ok)
    err0 = rot_err_deg(R0, R)
    err1 = rot_err_deg(np.asarray(out.R), R)
    assert err1 < err0 * 0.5, (err0, err1)
    t_err0 = np.linalg.norm(t0 - t)
    t_err1 = np.linalg.norm(np.asarray(out.t_mm) - t)
    assert t_err1 < t_err0 * 0.5, (t_err0, t_err1)
    assert float(out.ratio) > 0.7
    assert float(out.score) > 0


def test_icp_refiner_translation_sanity_reset():
    verts, faces = cube_mesh(40.0)
    R, t = pose_with_euler()
    from pix2pose_tpu.ops import rasterizer
    depth_mm, mask = rasterizer.render_depth(verts, faces, R, t, CAM_K,
                                             480, 640)
    depth = np.asarray(depth_mm) / 1000.0
    tgt_pts = geometry.backproject(jnp.asarray(depth), CAM_K)
    tgt_n = geometry.normals_from_depth(jnp.asarray(depth), CAM_K,
                                        refine=True)
    refine = make_icp_refiner(verts / 1000.0, faces, 480, 640)
    # absurd depth triggers reset to the target centroid (icp3d:61-62)
    t_bad = np.array([0.0, 0.0, 9999.0], np.float32)
    out = refine(jnp.asarray(R), jnp.asarray(t_bad), CAM_K,
                 jnp.asarray(np.asarray(mask)), jnp.asarray(depth),
                 tgt_pts, tgt_n, jax.random.PRNGKey(1))
    # after reset + centroid alignment + ICP the depth must be plausible
    assert 300.0 < float(out.t_mm[2]) < 1200.0


@pytest.fixture(scope="module")
def icp_pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bop_icp"))
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=2)
    ds = BopDataset(root, "cubes", train=False)
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    obj_param = np.array([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], np.float32)
    verts, faces = cube_mesh(40.0)
    ev = BopEvaluatorICP(ds, cfg, est, {1: params}, {1: obj_param},
                         {1: (verts, faces)}, GtDetector(ds, jitter=4),
                         max_det=2)
    return root, entries, ev


def test_rgbd_eval_end_to_end(icp_pipeline):
    root, entries, ev = icp_pipeline
    results = ev.run(out_dir=root)
    assert len(results) >= len(entries)
    gt = {(s, i): (R, t) for s, i, R, t in entries}
    for r in results:
        R_gt, t_gt = gt[(r["scene_id"], r["im_id"])]
        assert rot_err_deg(r["R"], R_gt) < 5.0
        # ICP-refined translation should be accurate to a few mm
        assert np.linalg.norm(r["t"] - t_gt) < 15.0


class _RelabeledDetector:
    """Wraps GtDetector but reports a non-target obj_id — round 0 must skip
    it, round 1 must recover the missing object from the unused ROI
    (reference icp3d:394-433)."""

    def __init__(self, ds, wrong_id=77):
        self.inner = GtDetector(ds)
        self.wrong_id = wrong_id

    def detect(self, scene_id, im_id, rgb):
        dets = self.inner.detect(scene_id, im_id, rgb)
        for d in dets:
            d.obj_id = self.wrong_id
        return dets


def test_round2_recovers_missing_object(icp_pipeline):
    root, entries, ev = icp_pipeline
    import copy
    ev2 = BopEvaluatorICP(ev.ds, ev.cfg, ev.est, ev.params_by_obj,
                          ev.obj_params, {1: cube_mesh(40.0)},
                          _RelabeledDetector(ev.ds), max_det=2)
    results = ev2.run(target_list=[(0, 0, [1], [1])])
    assert len(results) >= 1
    assert results[0]["obj_id"] == 1  # recovered despite wrong detector id
    gt = {(s, i): (R, t) for s, i, R, t in entries}
    R_gt, t_gt = gt[(0, 0)]
    assert rot_err_deg(results[0]["R"], R_gt) < 5.0


class _DuplicatingDetector:
    def __init__(self, ds):
        self.inner = GtDetector(ds)

    def detect(self, scene_id, im_id, rgb):
        dets = self.inner.detect(scene_id, im_id, rgb)
        return dets + [copy.deepcopy(d) for d in dets]


import copy


def test_batched_path_matches_serial(icp_pipeline):
    """The O(1)-launches-per-round path must reproduce the per-hypothesis
    serial loop (reference semantics): same accepted rows, same objects,
    poses within RANSAC-draw tolerance."""
    root, entries, ev = icp_pipeline
    assert ev.batched  # default
    # fresh same-seed detectors: GtDetector jitter draws are stateful
    ev_batch = BopEvaluatorICP(ev.ds, ev.cfg, ev.est, ev.params_by_obj,
                               ev.obj_params, {1: cube_mesh(40.0)},
                               GtDetector(ev.ds, jitter=4, seed=3),
                               max_det=2, batched=True)
    ev_serial = BopEvaluatorICP(ev.ds, ev.cfg, ev.est, ev.params_by_obj,
                                ev.obj_params, {1: cube_mesh(40.0)},
                                GtDetector(ev.ds, jitter=4, seed=3),
                                max_det=2, batched=False)
    assert not ev_serial.batched
    tl = [(0, 0, [1], [1]), (0, 1, [1], [1])]
    rows_b = ev_batch.run(target_list=tl)
    rows_s = ev_serial.run(target_list=tl)
    assert len(rows_b) == len(rows_s)
    for rb, rs in zip(rows_b, rows_s):
        assert (rb["scene_id"], rb["im_id"], rb["obj_id"]) == \
            (rs["scene_id"], rs["im_id"], rs["obj_id"])
        assert rot_err_deg(rb["R"], rs["R"]) < 2.0
        assert np.linalg.norm(rb["t"] - rs["t"]) < 10.0
        assert abs(rb["score"] - rs["score"]) < 0.05


def test_occupancy_gating_skips_duplicate_detections(icp_pipeline):
    root, entries, ev = icp_pipeline
    ev2 = BopEvaluatorICP(ev.ds, ev.cfg, ev.est, ev.params_by_obj,
                          ev.obj_params, {1: cube_mesh(40.0)},
                          _DuplicatingDetector(ev.ds), max_det=2)
    rows = ev2._process_image(
        ev.ds.load_rgb(0, 0),
        ev.ds.load_depth(0, 0, 1.0),
        ev.ds.scene_camera(0)[0]["cam_K"], 0, 0, [1], [1],
        __import__("jax").random.PRNGKey(0))
    # the duplicate ROI is occupancy-gated in round 0 and its round-1
    # retest is blocked because the instance count is already filled
    assert len(rows) == 1
