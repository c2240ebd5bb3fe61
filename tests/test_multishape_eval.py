"""Occluded multi-object ViVo scenes (3 shapes incl. a discretely-symmetric
prism) through BOTH evaluators — end-to-end beyond the single cube.

Exercises: per-object norm factors, detection of partially-occluded
instances from visib masks, score_type-2 ViVo ranking, the MSSD/MSPD
symmetry pools in scoring (prism carries a 180-deg z symmetry in
models_info), and the batched RGB-D/ICP path on real multi-hypothesis
images (reference multi-instance behavior: ``5_evaluation_bop_basic.py:
289-349``, ``5_evaluation_bop_icp3d.py:392-507``)."""

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
from bop_fixture import (SHAPE_BANDS, build_multishape_dataset,
                         multishape_objects)
from synthetic import BandOracleGenerator, band_oracle_params


def rot_err_deg(Ra, Rb, sym_pool=None):
    pools = [np.eye(3)] if sym_pool is None else sym_pool
    errs = []
    for S in pools:
        c = (np.trace(Ra.T @ (Rb @ S)) - 1) / 2
        errs.append(np.degrees(np.arccos(np.clip(c, -1, 1))))
    return min(errs)


@pytest.fixture(scope="module")
def shapes_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shapes"))
    entries = build_multishape_dataset(root, n_scenes=1, ims_per_scene=2)
    ds = BopDataset(root, "shapes", train=False)
    model = BandOracleGenerator()
    objs = multishape_objects()
    params_by_obj = {o: band_oracle_params(*SHAPE_BANDS[o]) for o in objs}
    obj_params = {
        o: np.concatenate([objs[o][2], np.zeros(3)]).astype(np.float32)
        for o in objs}
    return root, entries, ds, model, params_by_obj, obj_params


def test_scenes_are_occluded_and_symmetric_object_present(shapes_ds):
    root, entries, ds, *_ = shapes_ds
    # prism carries the discrete symmetry in models_info
    info = ds.model_info(2)
    assert "symmetries_discrete" in info
    pool = ds.symmetry_pool(2)
    assert pool.shape[0] >= 2  # identity + z180
    # cylinder carries the CONTINUOUS symmetry; scoring densifies it
    info4 = ds.model_info(4)
    assert info4["symmetries_continuous"][0]["axis"] == [0, 0, 1]
    sym_R, _ = ds.symmetry_transforms(4)
    assert sym_R.shape[0] >= 36
    # at least one image has intersecting instance bboxes (occlusion setup)
    det = GtDetector(ds)
    overlapping = 0
    for s, i, _ in entries:
        dets = det.detect(s, i, ds.load_rgb(s, i))
        assert len(dets) == 4  # every instance visible enough to detect
        for a in range(len(dets)):
            for b in range(a + 1, len(dets)):
                b1, b2 = dets[a].bbox, dets[b].bbox
                if (b1[0] < b2[2] and b2[0] < b1[2]
                        and b1[1] < b2[3] and b2[1] < b1[3]):
                    overlapping += 1
    assert overlapping >= 1


def test_rgb_vivo_multiobject(shapes_ds):
    root, entries, ds, model, params_by_obj, obj_params = shapes_ds
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    ev = BopEvaluator(ds, cfg, est, params_by_obj, obj_params,
                      GtDetector(ds, jitter=3), max_det=4)
    results = ev.run(out_dir=root)
    assert {r["obj_id"] for r in results} == {1, 2, 3, 4}
    scores = evaluate_bop(results, ds, metrics=("mssd", "mspd"))
    assert scores["AR_mssd"] > 0.85, scores
    assert scores["AR_mspd"] > 0.85, scores


def test_rgbd_icp_multiobject_batched(shapes_ds):
    root, entries, ds, model, params_by_obj, obj_params = shapes_ds
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    objs = multishape_objects()
    meshes = {o: (objs[o][0], objs[o][1]) for o in objs}
    ev = BopEvaluatorICP(ds, cfg, est, params_by_obj, obj_params, meshes,
                         GtDetector(ds, jitter=3), max_det=4, batched=True)
    assert ev.batched
    results = ev.run(out_dir=root)
    assert {r["obj_id"] for r in results} == {1, 2, 3, 4}
    gt = {(s, i): per for s, i, per in entries}
    # densified pools: the cylinder's ICP pose may drift in azimuth
    # (continuous symmetry = point-to-plane null space), which is
    # geometrically meaningless — score rotation modulo the symmetry
    pools = {o: np.asarray(ds.symmetry_transforms(o)[0]) for o in objs}
    for r in results:
        R_gt, t_gt = gt[(r["scene_id"], r["im_id"])][r["obj_id"]]
        assert rot_err_deg(r["R"], R_gt, pools[r["obj_id"]]) < 6.0, r
        assert np.linalg.norm(r["t"] - t_gt) < 20.0, r
