"""BOP metrics: analytic sanity (zero error at GT, symmetry invariance,
threshold behavior) and AR harness on the cube dataset."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pix2pose_tpu.data import BopDataset
from pix2pose_tpu.eval import metrics
from bop_fixture import build_cube_dataset
from synthetic import CAM_K, pose_with_euler
from test_rasterizer import cube_mesh


@pytest.fixture(scope="module")
def cube():
    verts, faces = cube_mesh(40.0)
    return jnp.asarray(verts), verts, faces


def test_add_zero_at_gt(cube):
    pts, _, _ = cube
    R, t = pose_with_euler()
    assert float(metrics.add_metric(pts, R, t, R, t)) < 1e-4
    assert float(metrics.adi_metric(pts, R, t, R, t)) < 1e-4


def test_add_translation_offset(cube):
    pts, _, _ = cube
    R, t = pose_with_euler()
    t2 = t + np.array([3.0, 0.0, 0.0], np.float32)
    assert float(metrics.add_metric(pts, R, t2, R, t)) == pytest.approx(
        3.0, rel=1e-4)


def test_mssd_symmetry_invariance(cube):
    pts, _, _ = cube
    R, t = pose_with_euler()
    rot180 = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    pool = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), rot180]))
    # estimate equals GT composed with the symmetry -> error ~0
    R_est = (R @ rot180).astype(np.float32)
    err = float(metrics.mssd_metric(pts, pool, R_est, t, R, t))
    assert err < 1e-3
    # without the symmetry in the pool the error is large
    pool1 = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    err1 = float(metrics.mssd_metric(pts, pool1, R_est, t, R, t))
    assert err1 > 50.0


def test_mssd_symmetry_with_translation(cube):
    """Symmetries whose 4x4 carries a translation (some T-LESS/HB/YCB-V
    objects) must use the full (R_s, t_s): estimate == GT ∘ (S_R, S_t)
    scores ~0 only when the t_s is applied."""
    pts, _, _ = cube
    R, t = pose_with_euler()
    rot180 = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
    s_t = np.array([6.0, -4.0, 2.0], np.float32)
    # estimate pose = GT pose composed with the full symmetry transform:
    # x -> R (S_R x + S_t) + t  ==  (R S_R) x + (R S_t + t)
    R_est = (R @ rot180).astype(np.float32)
    t_est = (R @ s_t + t).astype(np.float32)
    pool_rt = (jnp.asarray(np.stack([np.eye(3, dtype=np.float32), rot180])),
               jnp.asarray(np.stack([np.zeros(3, np.float32), s_t])))
    err = float(metrics.mssd_metric(pts, pool_rt, R_est, t_est, R, t))
    assert err < 1e-3
    # rotation-only pool misses by ~|s_t|
    pool_r = jnp.asarray(np.stack([np.eye(3, dtype=np.float32), rot180]))
    err_r = float(metrics.mssd_metric(pts, pool_r, R_est, t_est, R, t))
    assert err_r > 5.0
    err_p = float(metrics.mspd_metric(pts, pool_rt, CAM_K, R_est, t_est,
                                      R, t))
    assert err_p < 0.1


def test_symmetry_transforms_continuous_offset(tmp_path):
    """Continuous symmetries densify with t = offset - R @ offset."""
    import json
    import os
    root = str(tmp_path)
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=1)
    minfo_path = os.path.join(root, "cubes", "models", "models_info.json")
    with open(minfo_path) as f:
        minfo = json.load(f)
    minfo["1"]["symmetries_continuous"] = [
        {"axis": [0, 0, 1], "offset": [5.0, 0.0, 0.0]}]
    with open(minfo_path, "w") as f:
        json.dump(minfo, f)
    ds = BopDataset(root, "cubes", train=False)
    sym_R, sym_t = ds.symmetry_transforms(1, n_continuous=8)
    assert sym_R.shape[0] == 1 + 7  # identity + 7 non-trivial steps
    off = np.array([5.0, 0.0, 0.0])
    for R, t in zip(sym_R[1:], sym_t[1:]):
        np.testing.assert_allclose(t, off - R @ off, atol=1e-5)
        # a point on the axis through the offset is a fixed point
        np.testing.assert_allclose(R @ off + t, off, atol=1e-5)


def test_mspd_projection_units(cube):
    pts, _, _ = cube
    R, t = pose_with_euler()
    pool = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    # shift by one pixel worth of translation at depth z: du = fx*dx/z
    dx = float(t[2]) / float(CAM_K[0, 0])
    t2 = t + np.array([dx, 0, 0], np.float32)
    err = float(metrics.mspd_metric(pts, pool, CAM_K, R, t2, R, t))
    # max over vertices sees the NEAREST vertex: fx*dx/z_min in (1, ~1.2)
    assert 1.0 <= err < 1.2


def test_vsd_zero_at_gt_and_positive_offset(cube):
    _, verts, faces = cube
    R, t = pose_with_euler()
    vsd = metrics.make_vsd(verts, faces, 240, 320)
    K = np.asarray(CAM_K) / 2.0
    K[2, 2] = 1.0
    taus = jnp.asarray([5.0, 20.0], jnp.float32)
    depth0 = jnp.zeros((240, 320), jnp.float32)
    e0, ovf0 = vsd(R, t, R, t, K, depth0, taus)
    e0 = np.asarray(e0)
    assert int(ovf0) == 0
    assert (e0 < 0.02).all()
    t2 = t + np.array([0.0, 0.0, 15.0], np.float32)
    e1 = np.asarray(vsd(R, t2, R, t, K, depth0, taus)[0])
    assert e1[0] > 0.5  # 15mm misfit >> 5mm tau
    assert e1[1] < 0.5  # 20mm tau forgives the 15mm offset mostly


def test_ar_harness_on_cube_dataset(tmp_path):
    root = str(tmp_path)
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=2)
    ds = BopDataset(root, "cubes", train=False)
    perfect = [{"scene_id": s, "im_id": i, "obj_id": 1, "score": 1.0,
                "R": R, "t": t} for s, i, R, t in entries]
    out = metrics.evaluate_bop(perfect, ds)
    assert out["AR"] > 0.97, out
    # heavily wrong poses -> low AR
    bad = [dict(r, R=np.eye(3, dtype=np.float32),
                t=r["t"] + np.array([200, 200, 400], np.float32))
           for r in perfect]
    out_bad = metrics.evaluate_bop(bad, ds)
    assert out_bad["AR"] < 0.2, out_bad
    # ADD recall
    assert metrics.add_recall(perfect, ds) == 1.0
    assert metrics.add_recall(bad, ds) == 0.0


def test_greedy_match_count_threshold_dependence():
    """Exactly bop_toolkit's per-threshold greedy matching: when the
    higher-scored estimate fails its best GT at a tight threshold, the GT
    stays available for a later estimate."""
    E = np.array([[10.0, 40.0],
                  [5.0, 60.0]])
    # theta = 7: est 0 matches nothing (10 >= 7), est 1 takes gt 0
    assert metrics._greedy_match_count(E, 7.0) == 1
    # theta = 15: est 0 takes gt 0 (10), est 1's best free err 60 fails
    assert metrics._greedy_match_count(E, 15.0) == 1
    # theta = 100: both match
    assert metrics._greedy_match_count(E, 100.0) == 2
    # strict inequality like bop_toolkit (error < th)
    assert metrics._greedy_match_count(E, 10.0) == 1


def test_evaluate_bop_per_threshold_rematching(tmp_path):
    """Hand-built duplicate-instance image where threshold-independent
    matching (the old approximation) provably diverges from bop_toolkit:
    the exact protocol recovers one pose at EVERY theta (AR_mssd = 0.5),
    the approximation lost the tightest theta (0.45)."""
    import json as _json

    from pix2pose_tpu.data.bop import BopDataset

    root = str(tmp_path)
    build_cube_dataset(root, n_scenes=1, ims_per_scene=1)
    ds_dir = os.path.join(root, "cubes")
    # second GT instance: same R, +200mm in x
    gt_path = os.path.join(ds_dir, "test", "000000", "scene_gt.json")
    gt = _json.load(open(gt_path))
    R = np.asarray(gt["0"][0]["cam_R_m2c"], np.float32).reshape(3, 3)
    t1 = np.asarray(gt["0"][0]["cam_t_m2c"], np.float32)
    t2 = t1 + np.array([200.0, 0.0, 0.0], np.float32)
    gt["0"].append({"obj_id": 1, "cam_R_m2c": R.reshape(-1).tolist(),
                    "cam_t_m2c": t2.tolist()})
    _json.dump(gt, open(gt_path, "w"))

    ds = BopDataset(root, "cubes", train=False)
    diam = float(ds.model_info(1)["diameter"])  # ~138.6
    th1 = 0.05 * diam  # tightest theta ~6.9mm
    # e1 (top score): 10mm off g1 — above th1, below every other theta
    # e2: 5mm off g1 — below th1, but g1 is only free for it at th1
    assert 5.0 < th1 < 10.0
    results = [
        {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.9,
         "R": R, "t": t1 + np.array([10.0, 0, 0], np.float32)},
        {"scene_id": 0, "im_id": 0, "obj_id": 1, "score": 0.8,
         "R": R, "t": t1 + np.array([5.0, 0, 0], np.float32)},
    ]
    out = metrics.evaluate_bop(
        results, ds, target_list=[(0, 0, [1], [2])], metrics=("mssd",))
    assert abs(out["AR_mssd"] - 0.5) < 1e-6
    assert abs(out["per_object"][1]["mssd"] - 0.5) < 1e-6
