"""PnP solver corruption sweep — the solver-level accuracy gate.

Every PnP knob change must hold this sweep AND a paired-seed cube e2e
(`pix2pose_tpu/tools/ab_e2e.py`) before shipping; the `gn_refine_iters=4`
trap (cube e2e passed, sweep degraded 3x at 1 px/25% — docs/PARITY.md
"PnP solver knobs") is why both gates exist. This tool makes the
historically ad-hoc sweep reproducible.

Simulates the ENGINE's correspondence regime (reference semantics being
matched: ``recognition.py:195-224``): a 4096-slot stride-2 grid with
~half the slots valid, subpixel noise on inlier pixels, a fraction of
valid slots replaced by uniform-garbage outliers, and a PROSAC quality
channel that ranks inliers above outliers only noisily. Reports median /
p90 rotation (deg) and translation (mm) error over seeds, one JSON line
per (noise_px, outlier_frac) cell.

Usage:
  python tools/pnp_sweep.py                      # default engine config
  python tools/pnp_sweep.py --max-pnp-points 2048
  python tools/pnp_sweep.py --iters 16 --seeds 64
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

N_SLOTS = 4096
VALID_FRAC = 0.5


def make_case(seed, noise_px, outlier_frac, n=N_SLOTS,
              valid_frac=VALID_FRAC):
    """One synthetic engine-like correspondence set. Returns
    (obj_pts, img_pts, valid, quality, R_gt, t_gt, K)."""
    rng = np.random.RandomState(seed)
    K = np.array([[572.4, 0.0, 325.3], [0.0, 573.6, 242.0],
                  [0.0, 0.0, 1.0]], np.float32)
    # random pose in the working volume
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=rng).as_matrix().astype(np.float32)
    t = np.array([rng.uniform(-60, 60), rng.uniform(-60, 60),
                  rng.uniform(450, 800)], np.float32)
    # object points on a 60 mm cube surface (grid-like, as decoded XYZ is)
    face = rng.randint(0, 3, n)
    sgn = rng.choice([-1.0, 1.0], n)
    obj = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    obj[np.arange(n), face] = 30.0 * sgn
    cam = obj @ R.T + t
    uv = cam @ K.T
    img = (uv[:, :2] / uv[:, 2:3]).astype(np.float32)
    img += rng.normal(0.0, noise_px, img.shape).astype(np.float32)
    valid = rng.rand(n) < valid_frac
    # outliers: replace image point with uniform in-frame garbage
    out = valid & (rng.rand(n) < outlier_frac)
    img[out] = np.stack([rng.uniform(0, 640, out.sum()),
                         rng.uniform(0, 480, out.sum())],
                        axis=1).astype(np.float32)
    # PROSAC quality: inliers rank higher, but noisily (AUC ~0.85)
    quality = np.where(out, rng.normal(-1.0, 0.7, n),
                       rng.normal(0.0, 0.7, n)).astype(np.float32)
    return obj, img, valid, quality, R, t.astype(np.float32), K


def run_cell(noise_px, outlier_frac, seeds, solver_kwargs, max_pnp_points,
             prosac=True, n_slots=N_SLOTS, valid_frac=VALID_FRAC):
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.ops import pnp as pnp_ops

    cases = [make_case(s, noise_px, outlier_frac, n=n_slots,
                       valid_frac=valid_frac) for s in range(seeds)]
    obj = jnp.asarray(np.stack([c[0] for c in cases]))
    img = jnp.asarray(np.stack([c[1] for c in cases]))
    val = jnp.asarray(np.stack([c[2] for c in cases]))
    qua = jnp.asarray(np.stack([c[3] for c in cases])) if prosac else None
    K = jnp.asarray(cases[0][6])
    keys = jax.random.split(jax.random.PRNGKey(1234), seeds)

    if max_pnp_points:
        comp = jax.vmap(lambda o, im, v, q: pnp_ops.compact_correspondences(
            o, im, v, max_pnp_points, q),
            in_axes=(0, 0, 0, None if qua is None else 0))
        obj, img, val, qua, _, _ = comp(obj, img, val, qua)

    fn = jax.jit(lambda o, im, v, k: pnp_ops.pnp_ransac_batch(
        o, im, v, K, k, qua, **solver_kwargs))
    res = jax.device_get(fn(obj, img, val, keys))

    rot, terr = [], []
    for i, (_, _, _, _, Rg, tg, _) in enumerate(cases):
        cosang = (np.trace(res.R[i] @ Rg.T) - 1.0) / 2.0
        rot.append(np.degrees(np.arccos(np.clip(cosang, -1.0, 1.0))))
        terr.append(float(np.linalg.norm(res.t[i] - tg)))
    rot, terr = np.asarray(rot), np.asarray(terr)
    return {"noise_px": noise_px, "outlier_frac": outlier_frac,
            "rot_med_deg": round(float(np.median(rot)), 3),
            "rot_p90_deg": round(float(np.percentile(rot, 90)), 3),
            "t_med_mm": round(float(np.median(terr)), 3),
            "t_p90_mm": round(float(np.percentile(terr, 90)), 3),
            "n_ok": int(np.sum(res.ok))}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=48)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--refine-iters", type=int, default=8)
    ap.add_argument("--polish", type=int, default=3)
    ap.add_argument("--select-stride", type=int, default=4)
    ap.add_argument("--max-pnp-points", type=int, default=0)
    ap.add_argument("--no-prosac", action="store_true")
    ap.add_argument("--n-slots", type=int, default=N_SLOTS)
    ap.add_argument("--valid-frac", type=float, default=VALID_FRAC)
    ap.add_argument("--cells", default="0.5:0,1:0.25,1:0.5,2:0.25,2:0.5",
                    help="comma list of noise_px:outlier_frac")
    args = ap.parse_args(argv)

    kw = dict(iters=args.iters, refine_iters=args.refine_iters,
              hyp_polish_iters=args.polish,
              select_stride=args.select_stride)
    cfg = {"config": {**kw, "max_pnp_points": args.max_pnp_points or None,
                      "prosac": not args.no_prosac, "seeds": args.seeds,
                      "n_slots": args.n_slots,
                      "valid_frac": args.valid_frac}}
    print(json.dumps(cfg), flush=True)
    for cell in args.cells.split(","):
        npx, ofr = cell.split(":")
        r = run_cell(float(npx), float(ofr), args.seeds, kw,
                     args.max_pnp_points, prosac=not args.no_prosac,
                     n_slots=args.n_slots, valid_frac=args.valid_frac)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    main()
