"""Evaluator drive-mode benchmark: per-(image, object) launches vs the
image-chunked drive (``BopEvaluator.run(image_chunk=B)``).

Real BOP target lists are 1-10k images; the reference evaluates them one
image at a time (``5_evaluation_bop_basic.py:262-349``), which on TPU
leaves the chip idle between small launches AND pays the axon relay's
degraded per-launch mode (every image fetches its poses). The chunked
drive batches B images' detections of one object into a single
``estimate_batch`` program; scores/poses/CSVs are bit-identical to the
serial plan (tests/test_bop_eval.py::test_image_chunked_drive_matches_
serial), so wall-clock per image is the only thing that changes.

    python tools/bench_eval.py [--images 32] [--chunk 8]

Method: build the synthetic cube dataset (tests/bop_fixture.py), oracle
generator + jittered-GT detector (no training — the engine program and
host loop are identical to a trained run), run each drive mode TWICE in
the same process and report the second run's wall-clock (first run pays
compile; both modes share one process so relay mode is identical).
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from bop_fixture import build_cube_dataset
    from pix2pose_tpu.config import EvalConfig
    from pix2pose_tpu.data import BopDataset
    from pix2pose_tpu.eval import BopEvaluator
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.detector import GtDetector
    from synthetic import OracleGenerator

    root = args.root or tempfile.mkdtemp(prefix="bench_eval_")
    build_cube_dataset(root, n_scenes=1, ims_per_scene=args.images)
    ds = BopDataset(root, "cubes", train=False)
    cfg = EvalConfig(dataset_dir=root, score_type=2, task_type=2,
                     cand_factor=1.0, outlier_th=(0.1, 0.2, 0.3),
                     inlier_th=0.1)
    model = OracleGenerator()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 128, 128, 3)))
    est = Pix2PoseEstimator(model, cfg.estimator(0))
    obj_param = np.array([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], np.float32)

    def make_ev():
        return BopEvaluator(ds, cfg, est, {1: params}, {1: obj_param},
                            GtDetector(ds, jitter=6, seed=1), max_det=4)

    timings = {}
    n_rows = {}
    for mode, kw in (("serial", {}), ("chunked",
                                      {"image_chunk": args.chunk})):
        ev = make_ev()
        for rep in range(2):  # rep 0 pays compile
            t0 = time.time()
            res = ev.run(key=jax.random.PRNGKey(5), **kw)
            dt = time.time() - t0
        timings[mode] = dt
        n_rows[mode] = len(res)

    assert n_rows["serial"] == n_rows["chunked"], n_rows
    per_im = {m: timings[m] / args.images * 1000 for m in timings}
    out = {
        "metric": f"BOP eval wall-clock ms/image ({args.images} images, "
                  f"1 object, oracle generator, warm)",
        "value": round(per_im["chunked"], 1), "unit": "ms/image",
        "serial_ms_per_image": round(per_im["serial"], 1),
        "chunk": args.chunk,
        "speedup": round(per_im["serial"] / per_im["chunked"], 2),
        "results": n_rows["serial"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
