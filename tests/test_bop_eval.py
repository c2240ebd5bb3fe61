"""Full evaluation pipeline on the synthetic cube BOP dataset: detector ->
batched engine -> scoring -> BOP CSV (the reference flow of
5_evaluation_bop_basic.py, minus the external Mask-RCNN)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.config import EvalConfig
from pix2pose_tpu.data import BopDataset, load_bop_results
from pix2pose_tpu.eval import BopEvaluator
from pix2pose_tpu.inference import Pix2PoseEstimator
from pix2pose_tpu.inference.detector import GtDetector
from bop_fixture import build_cube_dataset
from synthetic import OracleGenerator


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bop"))
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=3)
    ds = BopDataset(root, "cubes", train=False)
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    obj_param = np.array([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], np.float32)
    ev = BopEvaluator(ds, cfg, est, {1: params}, {1: obj_param},
                      GtDetector(ds, jitter=6), max_det=4)
    return root, entries, ds, ev


def test_eval_produces_accurate_csv(pipeline):
    root, entries, ds, ev = pipeline
    out_dir = os.path.join(root, "out")
    results = ev.run(out_dir=out_dir)
    assert len(results) == len(entries)
    csv_path = os.path.join(out_dir, "pix2pose-tpu_cubes-test.csv")
    assert os.path.exists(csv_path)
    back = load_bop_results(csv_path)
    assert len(back) == len(results)

    gt = {(s, i): (R, t) for s, i, R, t in entries}
    for r in back:
        R_gt, t_gt = gt[(r["scene_id"], r["im_id"])]
        assert rot_err_deg(r["R"], R_gt) < 2.0, (r["scene_id"], r["im_id"])
        assert np.linalg.norm(r["t"] - t_gt) < 0.02 * t_gt[2]
        assert 0.0 < r["score"] <= 1.0


def test_eval_score_type1_uses_detector_score(pipeline):
    root, entries, ds, ev = pipeline
    import dataclasses
    ev1 = BopEvaluator(ds, dataclasses.replace(ev.cfg, score_type=1),
                       ev.est, ev.params_by_obj, ev.obj_params,
                       GtDetector(ds), max_det=4)
    results = ev1.run()
    assert len(results) == len(entries)
    # all scores equal detector score -> normalized to 1.0
    assert all(abs(r["score"] - 1.0) < 1e-6 for r in results)


def test_eval_skips_untargeted_objects(pipeline):
    root, entries, ds, ev = pipeline
    # target list with a non-existent object id: no results
    tl = [(0, 0, [99], [1])]
    results = ev.run(target_list=tl)
    assert results == []


def test_image_chunked_drive_matches_serial(pipeline):
    """run(image_chunk=B) must reproduce the per-image drive exactly:
    the chunked path replays the serial candidate-capping/key plan, so
    poses, scores, ordering and the CSV (minus the wall-clock column)
    all match."""
    root, entries, ds, ev = pipeline
    # fresh detectors with the same seed: identical jitter sequences
    det_a = GtDetector(ds, jitter=6, seed=3)
    det_b = GtDetector(ds, jitter=6, seed=3)
    ev_a = BopEvaluator(ds, ev.cfg, ev.est, ev.params_by_obj,
                        ev.obj_params, det_a, max_det=4)
    ev_b = BopEvaluator(ds, ev.cfg, ev.est, ev.params_by_obj,
                        ev.obj_params, det_b, max_det=4,
                        method_name="pix2pose-tpu-chunked")
    out_a = os.path.join(root, "out_serial")
    out_b = os.path.join(root, "out_chunked")
    res_a = ev_a.run(out_dir=out_a, key=jax.random.PRNGKey(5))
    res_b = ev_b.run(out_dir=out_b, key=jax.random.PRNGKey(5),
                     image_chunk=2)  # 3 images -> one padded chunk
    assert len(res_a) == len(res_b) > 0
    for a, b in zip(res_a, res_b):
        assert (a["scene_id"], a["im_id"], a["obj_id"]) == \
            (b["scene_id"], b["im_id"], b["obj_id"])
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-5)
        np.testing.assert_allclose(a["R"], b["R"], atol=1e-5)
        np.testing.assert_allclose(a["t"], b["t"], atol=1e-2)  # mm

    # CSVs identical apart from the time column
    def rows_no_time(path):
        with open(path) as f:
            lines = f.read().strip().splitlines()
        out = []
        for ln in lines[1:]:
            parts = ln.split(",")
            del parts[-1]
            out.append(",".join(parts))
        return out

    a_csv = rows_no_time(os.path.join(out_a, "pix2pose-tpu_cubes-test.csv"))
    b_csv = rows_no_time(os.path.join(
        out_b, "pix2pose-tpu-chunked_cubes-test.csv"))
    assert a_csv == b_csv
