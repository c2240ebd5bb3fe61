"""Engine cost-attribution ablations (completion-verified, TPU).

    python tools/bench_ablate.py full        # control (bench.py config)
    python tools/bench_ablate.py pnp-stub    # PnP replaced by a cheap fake
    python tools/bench_ablate.py gn-half     # consensus GN iters -> 4
                                             # (= the default since the
                                             # 2026-08-18 A/B flip)
    python tools/bench_ablate.py gn-8        # consensus GN iters -> 8
                                             # (pre-flip default)
    python tools/bench_ablate.py hyp-half    # RANSAC hypotheses 100 -> 50
    python tools/bench_ablate.py polish-off  # no per-hypothesis GN polish
    python tools/bench_ablate.py ss4         # selection-scoring stride 4
                                             # (= the default since the
                                             # 2026-08-18 A/B flip)
    python tools/bench_ablate.py ss-auto     # selection stride -> solver
                                             # auto (2 at >=1024 points;
                                             # pre-flip default)
    python tools/bench_ablate.py sample-stub # no Gumbel/argsort sampling
    python tools/bench_ablate.py nrs-8       # rotation power-iters 20->8
    python tools/bench_ablate.py stage2-one  # 1 outlier threshold (not 3)
    python tools/bench_ablate.py prosac-32   # confidence-ordered sampling
                                             # + 32 hypotheses (= the
                                             # default config since the
                                             # round-3 flip)
    python tools/bench_ablate.py reference-100  # uniform 100-hypothesis
                                             # sampling (reference
                                             # semantics; pre-flip
                                             # default)

Each mode times the SAME 8-image x 16-detection engine launch as
bench.py with the chained-carry methodology (utils/benchtime.py). Run
each mode in a fresh process on an idle chip and compare launch_ms —
the difference attributes cost to the ablated stage. Accuracy impact of
solver ablations must be judged separately (tests/test_pnp_cv2_parity
sweeps + a cube e2e A/B; see ops/pnp.py's consensus-chain warning).

Ablations monkeypatch ``pix2pose_tpu.ops.pnp`` BEFORE the engine traces,
which is measurement-only tooling — the library itself is untouched.
"""

import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def _patched_batch(**overrides):
    from pix2pose_tpu.ops import pnp as pnp_ops

    orig = pnp_ops.pnp_ransac_batch

    def run(obj_pts, img_pts, valid, K, keys, quality=None, **kw):
        return orig(obj_pts, img_pts, valid, K, keys, quality,
                    **{**kw, **overrides})

    return run


def apply_mode(mode: str):
    import jax.numpy as jnp

    from pix2pose_tpu.ops import pnp as pnp_ops

    if mode == "full":
        return
    if mode == "pnp-stub":
        def stub(obj_pts, img_pts, valid, K, key):
            # touch every input so nothing upstream is dead-code-eliminated
            s = (jnp.sum(obj_pts) + jnp.sum(img_pts)
                 + jnp.sum(valid) + jnp.sum(K) + jnp.sum(key)) * 1e-20
            eye = jnp.eye(3, dtype=jnp.float32) + s
            return pnp_ops.PnPResult(
                R=eye, t=jnp.full((3,), 500.0) + s,
                n_inliers=jnp.sum(valid).astype(jnp.int32),
                inlier_mask=valid, ok=jnp.sum(valid) >= 6)

        import jax

        def stub_batch(obj_pts, img_pts, valid, K, keys, quality=None,
                       **kw):
            return jax.vmap(stub, in_axes=(0, 0, 0, None, 0),
                            out_axes=0)(obj_pts, img_pts, valid, K, keys)

        pnp_ops.pnp_ransac_batch = stub_batch
    elif mode == "gn-half":
        pnp_ops.pnp_ransac_batch = _patched_batch(refine_iters=4)
    elif mode == "gn-0":
        # consensus GN chain off (refit DLT + 1 tighten iter remain) —
        # attribution only, NOT an accuracy-valid config
        pnp_ops.pnp_ransac_batch = _patched_batch(refine_iters=0)
    elif mode == "hyp-8":
        pnp_ops.pnp_ransac_batch = _patched_batch(iters=8)
    elif mode == "hyp-16":
        pnp_ops.pnp_ransac_batch = _patched_batch(iters=16)
    elif mode == "polish-1":
        pnp_ops.pnp_ransac_batch = _patched_batch(hyp_polish_iters=1)
    elif mode == "ss8":
        pnp_ops.pnp_ransac_batch = _patched_batch(select_stride=8)
    elif mode == "gn-8":
        pnp_ops.pnp_ransac_batch = _patched_batch(refine_iters=8)
    elif mode == "ss-auto":
        pnp_ops.pnp_ransac_batch = _patched_batch(select_stride=None)
    elif mode == "hyp-half":
        pnp_ops.pnp_ransac_batch = _patched_batch(iters=50)
    elif mode == "polish-off":
        pnp_ops.pnp_ransac_batch = _patched_batch(hyp_polish_iters=0)
    elif mode == "ss4":
        pnp_ops.pnp_ransac_batch = _patched_batch(select_stride=4)
    elif mode == "sample-stub":
        # no Gumbel/argsort: contiguous index blocks at random offsets
        # (accuracy-meaningless; isolates the permutation-sampling cost)
        import jax

        def cheap(key, valid, n_hyp, k=6, quality=None, quality_pow=2.0):
            n = valid.shape[0]
            off = jax.random.randint(key, (n_hyp, 1), 0, n)
            return (off + jnp.arange(k, dtype=jnp.int32)[None, :]) % n

        pnp_ops._sample_minimal_sets = cheap
    elif mode == "nrs-8":
        # nearest_rotation_scale power iterations 20 -> 8
        from pix2pose_tpu.ops import smallmat

        orig = smallmat.nearest_rotation_scale
        smallmat.nearest_rotation_scale = (
            lambda M, iters=8: orig(M, iters=iters))
    elif mode not in ("stage2-one", "prosac-32", "reference-100",
                      "pst4", "pst2") \
            and not mode.startswith("compact-"):
        raise SystemExit(f"unknown mode {mode}")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    apply_mode(mode)

    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.config import EstimatorConfig
    from pix2pose_tpu.inference import Pix2PoseEstimator
    from pix2pose_tpu.models import build_generator
    from pix2pose_tpu.utils.benchtime import bench_chained

    n_img, im_h, im_w, n_det = 8, 480, 640, 16
    th = (0.2,) if mode == "stage2-one" else (0.15, 0.25, 0.35)
    extra = {}
    if mode == "prosac-32":
        extra = {"prosac": True, "ransac_iters": 32}
    elif mode == "reference-100":
        extra = {"prosac": False, "ransac_iters": 100}
    elif mode.startswith("compact-"):
        # correspondence compaction cap (config knob, not a pnp patch)
        extra = {"max_pnp_points": int(mode.split("-")[1])}
    cam_k = jnp.tile(jnp.asarray(
        [[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]],
        jnp.float32)[None], (n_img, 1, 1))
    obj_param = jnp.asarray([40.0, 40.0, 40.0, 0.0, 0.0, 0.0], jnp.float32)
    model = build_generator("paper", dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # pst4/pst2 pin the grid stride; other modes use the config default
    pnp_stride = {"pst4": 4, "pst2": 2}.get(mode)
    est = Pix2PoseEstimator(model, EstimatorConfig(outlier_th=th,
                                                   **extra),
                            pnp_stride=pnp_stride)

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

    r = bench_chained(
        step, (params, rgbs, bboxes, det_valid, cam_k, obj_param),
        n_img * n_det)
    print(json.dumps({
        "mode": mode, "launch_ms": round(r["launch_ms"], 2),
        "crops_per_s": round(r["units_per_s"], 2),
        "implied_mfu_pct": (round(r["implied_mfu_pct"], 2)
                            if r["implied_mfu_pct"] is not None else None),
        "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
