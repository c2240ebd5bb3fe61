"""Probe the axon relay's timing semantics for the engine program.

Round-2 verdict: ``jax.block_until_ready`` through the axon relay returns
before execution completes (probe-confirmed: it is a no-op — a warmup
"block" returns in 0.0s before the remote compile has even run), so
dispatch-then-block windows measure queueing, not compute. This probe
measures completion-VERIFIED throughput:

  - inputs are device-resident (one ``device_put``, no per-launch upload)
  - launches are CHAINED: launch i+1's RANSAC key derives from a scalar
    reduced from launch i's output (plus the host loop index, so no two
    launches have identical inputs), making the final carry transitively
    depend on every launch
  - every timed window ends with a 4-byte scalar read of the carry,
    proving the window's launches all executed

The first read of the process flips the relay into its degraded mode
(CLAUDE.md pathology 1), so the measured rate is a LOWER bound on device
capability — but it is real, completion-verified throughput as observable
through this transport.

Usage:  python tools/bench_probe.py [n_img] [k_per_window] [windows]
Prints one JSON line per window plus a summary line.
"""

import json
import sys
import time

import numpy as np


def main(n_img: int, k_per_window: int, windows: int) -> None:
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import EstimatorConfig
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.models import build_generator

    im_h, im_w, n_det = 480, 640, 16
    cam_k = jnp.tile(jnp.asarray(
        [[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]],
        jnp.float32)[None], (n_img, 1, 1))
    obj_param = jnp.asarray([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], jnp.float32)
    model = build_generator("paper", dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    est = Pix2PoseEstimator(
        model, EstimatorConfig(outlier_th=(0.15, 0.25, 0.35)))

    # flip the relay's read path EARLY, before any real launch is in
    # flight: a first read that races an in-flight launch can stall for
    # many minutes (measured 1600s); a read of a fresh device_put value
    # flips the process into the (stable) degraded mode cheaply
    t_f0 = time.perf_counter()
    _ = np.asarray(jax.device_put(np.zeros((1,), np.float32)))
    t_flip = time.perf_counter() - t_f0
    print(f"early-read flip {t_flip:.2f}s", file=sys.stderr, flush=True)

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

    # device-resident inputs: no per-launch host->device payload
    rgbs_d = jax.device_put(rgbs)
    bboxes_d = jax.device_put(bboxes)
    det_valid_d = jax.device_put(det_valid)

    def chained(params, rgbs, bboxes, det_valid, cam_ks, obj_param, carry,
                salt):
        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(7), carry + salt), n_img)
        out = est._run_batch(params, rgbs, bboxes, det_valid, cam_ks,
                             obj_param, keys)
        nxt = (jnp.abs(jnp.sum(out.t)).astype(jnp.int32) + salt) % 1000003
        return nxt

    step = jax.jit(chained)

    # AOT compile so the remote-compile cost is visible and excluded
    t_c0 = time.perf_counter()
    lowered = step.lower(params, rgbs_d, bboxes_d, det_valid_d, cam_k,
                         obj_param, jnp.int32(0), jnp.int32(0))
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t_c0
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", -1.0))
    print(f"AOT compile {t_compile:.1f}s flops/launch {flops:.3e}",
          file=sys.stderr, flush=True)

    # warmup + first read: proves execution works, flips degraded mode
    t_w0 = time.perf_counter()
    carry = compiled(params, rgbs_d, bboxes_d, det_valid_d, cam_k,
                     obj_param, jnp.int32(0), jnp.int32(1))
    _ = int(np.asarray(carry))
    t_warm = time.perf_counter() - t_w0
    print(f"warmup launch+read {t_warm:.2f}s", file=sys.stderr, flush=True)

    crops = n_img * n_det
    salt = 2
    rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(k_per_window):
            salt += 1
            carry = compiled(params, rgbs_d, bboxes_d, det_valid_d, cam_k,
                             obj_param, carry, jnp.int32(salt))
        val = int(np.asarray(carry))  # completion-proving 4-byte read
        dt = time.perf_counter() - t0
        rate = crops * k_per_window / dt
        rates.append(rate)
        print(json.dumps({"window": w, "carry": val,
                          "window_s": round(dt, 4),
                          "crops_per_s": round(rate, 2)}), flush=True)
    rates.sort()
    med = rates[len(rates) // 2]
    peak = 197e12  # v5e bf16
    print(json.dumps({
        "n_img": n_img, "k": k_per_window, "windows": windows,
        "compile_s": round(t_compile, 1),
        "warmup_s": round(t_warm, 2),
        "median_crops_per_s": round(med, 2),
        "launch_ms": round(crops / med * 1000.0, 2),
        "flops_per_launch": flops,
        "implied_mfu_pct": round(
            med / crops * flops / peak * 100.0, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    main(n_img, k, w)
