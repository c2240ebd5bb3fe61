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

Timing methodology — COMPLETION-VERIFIED (round-3 rework). Through the
axon relay ``jax.block_until_ready`` returns before execution completes,
so dispatch-then-block windows measure queueing, not compute (round-2
bench published a number ~5.9x the chip's bf16 peak that way). Here every
timed window is provably executed:

  - inputs are device-resident (one ``device_put`` before timing),
  - launches are CHAINED: launch i+1's RANSAC key derives from a scalar
    reduced from launch i's outputs, so the final carry transitively
    depends on every launch in the window,
  - each window ends with a 4-byte host read of the carry, proving the
    window's launches all executed,
  - the program's analytic FLOPs (XLA ``cost_analysis``) convert the rate
    to an implied MFU; any result over the chip's peak is refused.

The first host read of a process flips the relay into its degraded launch
mode (CLAUDE.md pathology 1) and the flip is performed BEFORE timing, so
the published number is a lower bound on device capability but is real,
completion-verified throughput. Trials run in fresh subprocesses (the
relay pins a process into a fast or slow mode at random).

Measured configuration: bf16 conv compute (fp32 params/PnP), 8 images x 16
padded detections x 3 outlier thresholds per program launch, default
estimator config (confidence-ordered PROSAC sampling, 32 hypotheses —
validated equal-or-better than the reference's 100 uniform samples; see
EstimatorConfig.prosac and tools/bench_ablate.py's reference-100 mode).
"""

import json
import sys
import time

import numpy as np


REFERENCE_CROPS_PER_SEC = 20.0


def _bench_chained(step_fn, step_args, crops_per_launch, windows=4,
                   k_per_window=8):
    from pix2pose_tpu.utils.benchtime import bench_chained

    r = bench_chained(step_fn, step_args, crops_per_launch,
                      windows=windows, k_per_window=k_per_window)
    r["crops_per_s"] = r.pop("units_per_s")
    return r


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
    rgb = jax.device_put(
        rng.randint(0, 255, (im_h, im_w, 3)).astype(np.uint8))
    bboxes = np.zeros((n_obj, n_det, 4), np.int32)
    for o in range(n_obj):
        for i in range(n_det):
            v0, u0 = rng.randint(0, im_h - 140), rng.randint(0, im_w - 140)
            bboxes[o, i] = [v0, u0, v0 + rng.randint(60, 130),
                            u0 + rng.randint(60, 130)]
    bboxes = jax.device_put(bboxes)
    det_valid = jax.device_put(np.ones((n_obj, n_det), bool))
    obj_params = jnp.tile(
        jnp.asarray([40., 40., 40., 0., 0., 0.], jnp.float32)[None],
        (n_obj, 1))
    th = jnp.tile(jnp.asarray(est.cfg.outlier_th)[None], (n_obj, 1))

    def step(stacked, rgb, bboxes, det_valid, cam_k, obj_params, th,
             carry, salt):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(7), carry + salt), n_obj)
        out = jax.vmap(
            lambda p, bb, dv, op, k, t: est._estimate(
                p, rgb, bb, dv, cam_k, op, k, outlier_th=t),
            in_axes=(0, 0, 0, 0, 0, 0))(stacked, bboxes, det_valid,
                                         obj_params, keys, th)
        return (jnp.abs(jnp.sum(out.t)).astype(jnp.int32) + salt) % 1000003

    r = _bench_chained(
        step, (stacked, rgb, bboxes, det_valid, cam_k, obj_params, th),
        n_obj * n_det)
    print(json.dumps({
        "metric": "crops/sec, all-objects-one-launch "
                  "(8 objects x 4 det, object-vmap, completion-verified)",
        "value": round(r["crops_per_s"], 2), "unit": "crops/s",
        "vs_baseline": round(r["crops_per_s"] / REFERENCE_CROPS_PER_SEC, 2),
        "launch_ms": round(r["launch_ms"], 2),
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
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
    rgbs = jax.device_put(
        rng.randint(0, 255, (n_img, im_h, im_w, 3)).astype(np.uint8))
    bboxes = np.zeros((n_img, n_det, 4), np.int32)
    for b in range(n_img):
        for i in range(n_det):
            v0 = rng.randint(0, im_h - 140)
            u0 = rng.randint(0, im_w - 140)
            bboxes[b, i] = [v0, u0, v0 + rng.randint(60, 130),
                            u0 + rng.randint(60, 130)]
    bboxes = jax.device_put(bboxes)
    det_valid = jax.device_put(np.ones((n_img, n_det), bool))

    def step(params, rgbs, bboxes, det_valid, cam_k, obj_param, carry,
             salt):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(7), carry + salt), n_img)
        out = jax.vmap(est._estimate,
                       in_axes=(None, 0, 0, 0, 0, None, 0))(
            params, rgbs, bboxes, det_valid, cam_k, obj_param, keys)
        return (jnp.abs(jnp.sum(out.t)).astype(jnp.int32) + salt) % 1000003

    r = _bench_chained(
        step, (params, rgbs, bboxes, det_valid, cam_k, obj_param),
        n_img * n_det)
    per_image_ms = n_det / r["crops_per_s"] * 1000.0
    result = {
        "metric": "detection crops/sec/chip (AE+PnP-RANSAC two-stage, "
                  "completion-verified chained launches)",
        "value": round(r["crops_per_s"], 2),
        "unit": "crops/s",
        "vs_baseline": round(r["crops_per_s"] / REFERENCE_CROPS_PER_SEC, 2),
        "p50_image_ms_16det": round(per_image_ms, 2),
        "launch_ms": round(r["launch_ms"], 2),
        "flops_per_launch": r["flops_per_launch"],
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
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
                           timeout=1800)
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
