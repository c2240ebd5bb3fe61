"""RGB-D/ICP evaluator: batched vs serial hypothesis processing.

Builds an occluded 3-object synthetic test set, then runs the SAME
evaluation twice:

- serial: one engine launch + one ICP launch PER hypothesis (the
  reference's per-ROI loop, ``5_evaluation_bop_icp3d.py:58-94``)
- batched: per round, ONE object-vmapped engine launch over every
  (ROI, candidate) pair + ONE hypothesis-batched ICP refine launch

and reports per-image wall time for both plus result agreement.

    python examples/rgbd_icp_batched.py --images 6
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import jax


def run_eval(ev, target_list):
    t0 = time.perf_counter()
    rows = ev.run(target_list=target_list)
    return rows, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=6)
    args = ap.parse_args()

    from bop_fixture import (SHAPE_BANDS, build_multishape_dataset,
                             multishape_objects)
    from pix2pose_tpu.config import EvalConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector
    from synthetic import BandOracleGenerator, band_oracle_params

    root = tempfile.mkdtemp(prefix="icp_batch_demo_")
    print(f"dataset root: {root}")
    entries = build_multishape_dataset(root, n_scenes=1,
                                       ims_per_scene=args.images)
    ds = BopDataset(root, "shapes", train=False)
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     outlier_th=(0.1, 0.2, 0.3), inlier_th=0.1)
    model = BandOracleGenerator()
    objs = multishape_objects()
    params_by_obj = {o: band_oracle_params(*SHAPE_BANDS[o]) for o in objs}
    obj_params = {
        o: np.concatenate([objs[o][2], np.zeros(3)]).astype(np.float32)
        for o in objs}
    meshes = {o: (objs[o][0], objs[o][1]) for o in objs}
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    tl = [(s, i, sorted(per), [1] * len(per)) for s, i, per in entries]

    results = {}
    times = {}
    for mode, batched in (("batched", True), ("serial", False)):
        ev = BopEvaluatorICP(ds, cfg, est, params_by_obj, obj_params,
                             meshes, GtDetector(ds, jitter=3, seed=5),
                             max_det=4, batched=batched)
        # warm-up over the full list: covers every shape bucket the timed
        # pass will hit (remote compiles are 20s+ each on this tunnel)
        run_eval(ev, tl)
        rows, dt = run_eval(ev, tl)
        results[mode] = rows
        times[mode] = dt
        print(f"{mode:8s}: {len(rows)} results, "
              f"{dt / len(tl) * 1000:.0f} ms/image")

    # agreement
    k = lambda r: (r["scene_id"], r["im_id"], r["obj_id"])
    rb = {k(r): r for r in results["batched"]}
    rs = {k(r): r for r in results["serial"]}
    common = set(rb) & set(rs)
    t_diff = [np.linalg.norm(rb[c]["t"] - rs[c]["t"]) for c in common]
    print(f"agreement: {len(common)}/{max(len(rb), len(rs))} rows, "
          f"max |t_batched - t_serial| = {max(t_diff):.2f} mm")
    print(f"speedup: {times['serial'] / times['batched']:.2f}x "
          f"(serial {times['serial']:.2f}s / batched "
          f"{times['batched']:.2f}s over {len(tl)} images)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
