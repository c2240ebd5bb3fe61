"""Benchmark: detection crops/sec/chip through the full AE + PnP-RANSAC
two-stage inference engine (BASELINE.json primary metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation: the reference runs one crop at a time through TF1
``predict`` plus host-side skimage resizes and OpenCV PnP
(``recognition.py:70-224``); published BOP'20 timings for Pix2Pose are
~0.2-0.8 s/image at ~5 detections -> ~10-25 crops/sec on its GPU. We use
20 crops/sec as the reference point for vs_baseline (no official number is
checked in; see BASELINE.md).

Measured configuration: bf16 conv compute (fp32 params/PnP), 8 images x 16
padded detections x 3 outlier thresholds per program launch.
"""

import json
import sys
import time

import numpy as np


REFERENCE_CROPS_PER_SEC = 20.0


def _median_rate(run_once, crops_per_iter, windows=7, iters=10):
    import jax

    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        out = None
        for i in range(iters):
            out = run_once(w * iters + i)
        jax.block_until_ready(out)
        rates.append(crops_per_iter * iters / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def main_multi_object():
    """Variant: ALL objects of an image in one launch via estimate_objects
    (stacked per-object params + object-vmap; the reference loops one graph
    per object, ``5_evaluation_bop_basic.py:206-225``). Run with
    ``python bench.py --multi-object``."""
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import EstimatorConfig
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.inference.engine import stack_object_params
    from pix2pose_tpu.models import build_generator

    n_obj, im_h, im_w, n_det = 8, 480, 640, 4
    cam_k = jnp.asarray(
        [[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]],
        jnp.float32)
    model = build_generator("paper", dtype=jnp.bfloat16)
    params = [model.init(jax.random.PRNGKey(o), jnp.zeros((1, 128, 128, 3)))
              for o in range(n_obj)]
    stacked = stack_object_params(params)
    est = Pix2PoseEstimator(
        model, EstimatorConfig(outlier_th=(0.15, 0.25, 0.35)))

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 255, (im_h, im_w, 3)).astype(np.uint8)
    bboxes = np.zeros((n_obj, n_det, 4), np.int32)
    for o in range(n_obj):
        for i in range(n_det):
            v0, u0 = rng.randint(0, im_h - 140), rng.randint(0, im_w - 140)
            bboxes[o, i] = [v0, u0, v0 + rng.randint(60, 130),
                            u0 + rng.randint(60, 130)]
    det_valid = np.ones((n_obj, n_det), bool)
    obj_params = jnp.tile(
        jnp.asarray([40., 40., 40., 0., 0., 0.], jnp.float32)[None],
        (n_obj, 1))
    key = jax.random.PRNGKey(0)

    def run(i):
        keys = jax.random.split(jax.random.fold_in(key, i), n_obj)
        return est.estimate_objects(stacked, rgb, bboxes, det_valid,
                                    cam_k, obj_params, keys).R

    jax.block_until_ready(run(0))  # compile
    rate = _median_rate(run, n_obj * n_det)
    print(json.dumps({
        "metric": "crops/sec, all-objects-one-launch "
                  "(8 objects x 4 det, object-vmap)",
        "value": round(rate, 2), "unit": "crops/s",
        "vs_baseline": round(rate / REFERENCE_CROPS_PER_SEC, 2),
        "device": str(jax.devices()[0])}))


def main():
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import EstimatorConfig
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.models import build_generator

    n_img, im_h, im_w, n_det = 8, 480, 640, 16
    cam_k = jnp.tile(jnp.asarray(
        [[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]],
        jnp.float32)[None], (n_img, 1, 1))
    obj_param = jnp.asarray([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], jnp.float32)

    # bf16 conv compute (params fp32); PnP stays fp32. bf16's 8-bit
    # mantissa matches the uint8 coordinate-color quantization of the
    # training targets, so decode precision is not the bottleneck.
    model = build_generator("paper", dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    est = Pix2PoseEstimator(
        model, EstimatorConfig(outlier_th=(0.15, 0.25, 0.35)))

    rng = np.random.RandomState(0)
    rgbs = rng.randint(0, 255, (n_img, im_h, im_w, 3)).astype(np.uint8)
    bboxes = np.zeros((n_img, n_det, 4), np.int32)
    for b in range(n_img):
        for i in range(n_det):
            v0 = rng.randint(0, im_h - 140)
            u0 = rng.randint(0, im_w - 140)
            bboxes[b, i] = [v0, u0, v0 + rng.randint(60, 130),
                            u0 + rng.randint(60, 130)]
    det_valid = np.ones((n_img, n_det), bool)
    key = jax.random.PRNGKey(0)

    # warm-up / compile
    out = est.estimate_batch(params, rgbs, bboxes, det_valid, cam_k,
                             obj_param, jax.random.split(key, n_img))
    jax.block_until_ready(out.R)

    # Several independent timing windows; report the MEDIAN window. The
    # axon tunnel's per-launch overhead is bimodal run to run (see
    # CLAUDE.md), so a single window under- or over-states steady-state
    # throughput by up to ~1.7x. Median-of-windows is what we claim.
    windows, iters = 7, 10
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            out = est.estimate_batch(
                params, rgbs, bboxes, det_valid, cam_k, obj_param,
                jax.random.split(jax.random.fold_in(key, w * iters + i),
                                 n_img))
        jax.block_until_ready(out.R)
        rates.append(n_img * n_det * iters / (time.perf_counter() - t0))
    rates.sort()
    crops_per_sec = rates[len(rates) // 2]
    per_image_ms = n_det / crops_per_sec * 1000.0
    result = {
        "metric": "detection crops/sec/chip (AE+PnP-RANSAC, two-stage)",
        "value": round(crops_per_sec, 2),
        "unit": "crops/s",
        "vs_baseline": round(crops_per_sec / REFERENCE_CROPS_PER_SEC, 2),
        "p50_image_ms_16det": round(per_image_ms, 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


def main_trials(n_trials: int = 3):
    """Run the measurement in ``n_trials`` FRESH subprocesses and report
    the median trial's JSON. The axon relay pins a whole process into
    either a fast or a degraded launch path (CLAUDE.md pathology 1), so
    within-process window medians cannot undo a bad process draw —
    process-level median can. Prints ONE JSON line (the median trial,
    plus the per-trial values for transparency)."""
    import os
    import subprocess

    vals = []
    for i in range(n_trials):
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--worker"], capture_output=True, text=True,
                           timeout=900)
        line = None
        for ln in (p.stdout or "").splitlines():
            ln = ln.strip()
            if ln.startswith("{"):
                line = ln
        if line is None:
            print(f"trial {i} produced no result (rc={p.returncode}): "
                  f"{(p.stderr or '')[-300:]}", file=sys.stderr)
            continue
        vals.append(json.loads(line))
    if not vals:
        raise SystemExit("all bench trials failed")
    vals.sort(key=lambda r: r["value"])
    result = vals[len(vals) // 2]
    result["trial_values"] = [r["value"] for r in vals]
    print(json.dumps(result))


if __name__ == "__main__":
    if "--multi-object" in sys.argv[1:]:
        main_multi_object()
    elif "--worker" in sys.argv[1:]:
        main()
    else:
        main_trials()
