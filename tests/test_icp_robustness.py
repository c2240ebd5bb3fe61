"""ICP convergence-envelope harness (VERDICT r2 weak #3).

``cv2.ppf_match_3d_ICP`` is absent from this cv2 build, so the refiner is
validated against ANALYTIC ground truth: known rigid perturbations x
noise x outliers x partial overlap (semantics target: the reference's
tol=0.005 / rejectionScale=2.5 / numLevels=2 call,
``5_evaluation_bop_icp3d.py:88-89``). The asserted envelopes are the
measured basins (docs/ICP.md) with margin — a regression in any regime
fails here. This harness caught two real solver bugs on first run:
camera-origin rotation parameterization (ill-conditioned 6x6 -> km-scale
divergence at 10-deg perturbations) and a dropped omega x t term in the
incremental update.
"""

import numpy as np
import pytest

from pix2pose_tpu.eval.icp_refine import make_icp_refiner
from pix2pose_tpu.tools.icp_robustness import (IM_H, IM_W, prism_mesh,
                                               run_case)


@pytest.fixture(scope="module")
def refiner_and_mesh():
    verts, faces = prism_mesh()
    return verts, faces, make_icp_refiner(verts / 1000.0, faces, IM_H,
                                          IM_W)


def _med_final(verts, faces, refiner, case, seeds=3):
    return float(np.median([
        run_case(verts, faces, *case, seed=s, refiner=refiner)
        ["add_final"] for s in range(seeds)]))


def test_clean_small_perturbations_converge(refiner_and_mesh):
    verts, faces, ref = refiner_and_mesh
    # 5 deg / 10 mm and 10 deg / 20 mm on clean depth: well inside the
    # basin (measured medians 0.07 / 0.10 mm, round 4 re-render rounds)
    assert _med_final(verts, faces, ref, (5.0, 10.0, 0.0, 0.0, 1.0)) < 1.0
    assert _med_final(verts, faces, ref, (10.0, 20.0, 0.0, 0.0, 1.0)) < 1.0


def test_noise_tolerance(refiner_and_mesh):
    verts, faces, ref = refiner_and_mesh
    # gaussian depth noise: 2 mm sigma -> sub-mm; 5 mm -> ~1 mm
    # (measured 0.38 / 1.10)
    assert _med_final(verts, faces, ref, (10.0, 20.0, 2.0, 0.0, 1.0)) < 2.0
    assert _med_final(verts, faces, ref, (10.0, 20.0, 5.0, 0.0, 1.0)) < 4.0


def test_outliers_and_partial_overlap(refiner_and_mesh):
    verts, faces, ref = refiner_and_mesh
    # 10% gross depth outliers inside the mask (0.3-1.2 m junk): despeckle
    # + robust rejection recover sub-mm (measured median 0.45)
    assert _med_final(verts, faces, ref,
                      (10.0, 20.0, 0.0, 0.1, 1.0)) < 3.0
    # 30% outliers: round 3 DIVERGED here (21 mm init -> 80 mm final);
    # must now end well below init (measured median 0.62)
    assert _med_final(verts, faces, ref,
                      (10.0, 20.0, 0.0, 0.3, 1.0)) < 5.0
    # 60% overlap + noise + outliers (measured 0.43)
    assert _med_final(verts, faces, ref,
                      (10.0, 20.0, 2.0, 0.1, 0.6)) < 5.0


def test_moderate_basin(refiner_and_mesh):
    verts, faces, ref = refiner_and_mesh
    # 15 deg / 40 mm: round 3 stalled at ~11 mm; re-render rounds bring
    # the median sub-mm (measured 0.46; one seed in 3 may still stall)
    assert _med_final(verts, faces, ref, (15.0, 40.0, 0.0, 0.0, 1.0)) < 5.0


def test_despeckle_np_jax_parity():
    import numpy as np

    from pix2pose_tpu.ops import geometry

    rng = np.random.RandomState(0)
    d = rng.uniform(0.4, 0.6, (40, 50)).astype(np.float32)
    d[rng.rand(40, 50) < 0.2] = 0.0            # holes
    out = rng.rand(40, 50) < 0.1               # speckle
    d = np.where(out, rng.uniform(0.3, 1.2, d.shape).astype(np.float32), d)
    a = np.asarray(geometry.despeckle_depth(d))
    b = geometry.despeckle_depth_np(d)
    np.testing.assert_allclose(a, b, atol=0, rtol=0)


def test_no_catastrophic_divergence_outside_basin(refiner_and_mesh):
    """Beyond the basin (45 deg) convergence is not expected — cv2's ICP
    would not converge either — but the trust-region step must prevent
    the pre-fix failure mode (error exploding to km scale)."""
    verts, faces, ref = refiner_and_mesh
    for seed in range(3):
        r = run_case(verts, faces, 45.0, 80.0, 0.0, 0.0, 1.0, seed=seed,
                     refiner=ref)
        assert r["add_final"] < 50.0 * r["add_init"], r


def test_ar_sensitivity_to_icp_quality(tmp_path):
    """A/B on the multishape eval with a systematically miscalibrated
    generator (coord_rot_deg=10 -> RGB poses ~10 deg off, with occasional
    catastrophic PnP failures where the clipped-coordinate plane wins the
    consensus): the RGB-D/ICP evaluator must recover a sub-mm MEDIAN pose
    where the RGB evaluator cannot — quantifying how much accuracy the
    ICP stage contributes when initial poses are wrong. Notes from
    designs that DON'T discriminate: a perfect oracle (RGB already
    sub-mm, A/B is noise — 0.58 vs 0.61 mm), a depth-scale bias (the
    evaluator's depth prealignment wipes it before ICP runs), and an
    icp_iters=1-vs-30 A/B (prealignment + ONE point-to-plane GN step
    already lands in-basin poses at ~0.6 mm median). Medians, not means:
    which detections PnP fails on is RANSAC seed chaos, and those land
    outside any ICP basin for every refiner."""
    import jax

    from bop_fixture import (SHAPE_BANDS, build_multishape_dataset,
                             multishape_objects)
    from synthetic import BandOracleGenerator, band_oracle_params
    from pix2pose_tpu.config import EvalConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval.bop_eval import BopEvaluator
    from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector

    root = str(tmp_path)
    entries = build_multishape_dataset(root, n_scenes=1, ims_per_scene=2)
    ds = BopDataset(root, "shapes", train=False)
    model = BandOracleGenerator(coord_rot_deg=10.0)
    objs = multishape_objects()
    params_by_obj = {o: band_oracle_params(*SHAPE_BANDS[o]) for o in objs}
    obj_params = {
        o: np.concatenate([objs[o][2], np.zeros(3)]).astype(np.float32)
        for o in objs}
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    meshes = {o: (objs[o][0], objs[o][1]) for o in objs}
    gt = {(s, i): per for s, i, per in entries}

    # symmetry-aware ADD (ADD-S over the densified pool): the cylinder's
    # ICP pose may drift in azimuth along its continuous symmetry —
    # geometrically meaningless, so score modulo the symmetry
    pools = {o: np.asarray(ds.symmetry_transforms(o)[0]) for o in objs}

    def median_add(evaluator):
        results = evaluator.run(key=jax.random.PRNGKey(3))
        errs = []
        for r in results:
            R_gt, t_gt = gt[(r["scene_id"], r["im_id"])][r["obj_id"]]
            pts = objs[r["obj_id"]][0]
            a = pts @ np.asarray(r["R"]).T + np.asarray(r["t"])
            errs.append(min(
                np.mean(np.linalg.norm(
                    a - (pts @ (R_gt @ S).T + t_gt), axis=1))
                for S in pools[r["obj_id"]]))
        assert errs, "eval produced no results"
        return float(np.median(errs))

    add_rgb = median_add(BopEvaluator(
        ds, cfg, Pix2PoseEstimator(model, cfg.estimator(0)), params_by_obj,
        obj_params, GtDetector(ds, jitter=3), max_det=4))
    add_icp = median_add(BopEvaluatorICP(
        ds, cfg, Pix2PoseEstimator(model, cfg.estimator(0)), params_by_obj,
        obj_params, meshes, GtDetector(ds, jitter=3), max_det=4,
        batched=True))
    # ICP must recover most of the injected bias (measured: ~18 mm -> ~0.6)
    assert add_icp < 0.3 * add_rgb, (add_icp, add_rgb)
    assert add_icp < 2.0, add_icp
    assert add_rgb > 3.0, add_rgb  # the bias really was injected
