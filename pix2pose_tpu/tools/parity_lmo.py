"""Real-dataset parity runner: reference weights -> TPU eval -> AR diff.

The reference's headline result is its BOP'20 AR table
(``/root/reference/README.md:33-34``; BASELINE.md north star: LM-O /
T-Less RGB AR within 0.5 pt). This tool executes that comparison the
moment real data is present — it is deliberately *gated*: it probes for a
mounted BOP dataset and reference-trained Keras weights, prints exactly
what is missing if anything is, and otherwise runs

  Keras HDF5 import (``utils/hdf5_import``) -> RGB evaluator
  (``eval/bop_eval``, reference ``5_evaluation_bop_basic.py`` semantics)
  -> in-repo BOP'19 AR (``eval/metrics``) -> diff vs BASELINE.md.

With ``--icp`` the same weights/targets/detections also run through the
RGB-D/ICP evaluator (``eval/bop_eval_icp``, reference
``5_evaluation_bop_icp3d.py``) and diff against the w/-ICP table
(``/root/reference/README.md:33``) — one command, both baseline tables.

Expected layout (BOP default + the reference release's weight layout):

  <bop_root>/<dataset>/{models, models_xyz/norm_factor.json, test/,
                        test_targets_bop19.json}
  weights: <ds>/pix2pose_weights/<obj:02d>/inference*.hdf5 in the dataset
           tree, or pass --weights pointing at a directory that contains
           <obj:02d>/inference*.hdf5 (or <dataset>/<obj:02d>/...).

Detections: pass --detections (PrecomputedDetector JSON, e.g. converted
BOP'20 Mask-RCNN dumps — the reference's actual detection source) for a
faithful run; without it the GT detector is used and the AR is an
optimistic upper bound (detection is then perfect).

CLI: python -m pix2pose_tpu.tools.parity_lmo --bop-root /data/bop \
         [--dataset lmo] [--detections det.json] [--max-images N]
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence

# BOP'20 AR, RGB only (/root/reference/README.md:34 via BASELINE.md)
BASELINE_RGB_AR = {"lmo": 0.363, "tless": 0.344, "tudl": 0.420,
                   "icbin": 0.226, "itodd": 0.134, "hb": 0.446,
                   "ycbv": 0.457}
# BOP'20 AR, RGB + depth ICP (/root/reference/README.md:33)
BASELINE_ICP_AR = {"lmo": 0.588, "tless": 0.512, "tudl": 0.820,
                   "icbin": 0.390, "itodd": 0.351, "hb": 0.695,
                   "ycbv": 0.780}
REFERENCE_CFG = "/root/reference/cfg/cfg_bop2020_rgb.json"
REFERENCE_CFG_ICP = "/root/reference/cfg/cfg_bop2020.json"


def find_bop_dataset(bop_root: str | None, dataset: str):
    """Probe candidate roots for a complete-enough BOP dataset dir."""
    roots = ([bop_root] if bop_root else
             ["/data/bop", "/root/bop", "/mnt/bop",
              os.path.expanduser("~/bop")])
    needed = ["models_xyz/norm_factor.json", "test_targets_bop19.json"]
    for root in roots:
        if not root:
            continue
        d = os.path.join(root, dataset)
        if not os.path.isdir(d):
            continue
        missing = [n for n in needed
                   if not os.path.exists(os.path.join(d, n))]
        if missing:
            return root, missing
        return root, []
    return None, [f"no '{dataset}' dataset under any of: "
                  + ", ".join(str(r) for r in roots)]


def resolve_weight_dir(ds_dir: str, weights_root: str | None,
                       dataset: str, obj_id: int) -> str | None:
    """First existing per-object weight dir among the known layouts."""
    cands = [os.path.join(ds_dir, "pix2pose_weights", f"{obj_id:02d}")]
    if weights_root:
        cands += [os.path.join(weights_root, f"{obj_id:02d}"),
                  os.path.join(weights_root, dataset, f"{obj_id:02d}"),
                  os.path.join(weights_root, dataset, "pix2pose_weights",
                               f"{obj_id:02d}")]
    for c in cands:
        if not os.path.isdir(c):
            continue
        has = (os.path.isdir(os.path.join(c, "inference"))
               or any(fn.startswith("inference")
                      and fn.endswith(".hdf5")
                      for fn in os.listdir(c)))
        if has:
            return c
    return None


def run_parity(bop_root: str, dataset: str, weights_root=None,
               detections=None, cfg_path=None, max_images=None,
               out_dir="/tmp/parity_out", with_icp: bool = False) -> dict:
    """RGB-evaluator parity run; with ``with_icp`` also the RGB-D/ICP
    evaluator (reference ``5_evaluation_bop_icp3d.py`` → its w/-ICP table
    row, ``README.md:33``) over the same targets/weights/detections, so
    one command reproduces BOTH baseline tables."""
    from pix2pose_tpu.config import EvalConfig, load_eval_config
    from pix2pose_tpu.data.bop import BopDataset, get_target_list
    from pix2pose_tpu.data.ply import load_ply
    from pix2pose_tpu.eval.bop_eval import BopEvaluator
    from pix2pose_tpu.eval.bop_eval_icp import BopEvaluatorICP
    from pix2pose_tpu.eval.metrics import evaluate_bop
    from pix2pose_tpu.inference.detector import (GtDetector,
                                                 PrecomputedDetector)
    from pix2pose_tpu.inference.engine import estimators_for_objects
    from pix2pose_tpu.models import build_generator
    from pix2pose_tpu.ops.color import obj_param_from_norm_factor
    from pix2pose_tpu.utils import checkpoint as ckpt_util

    if cfg_path is None:
        default = REFERENCE_CFG_ICP if with_icp else REFERENCE_CFG
        if os.path.exists(default):
            cfg_path = default
    cfg = (load_eval_config(cfg_path) if cfg_path else EvalConfig(
        backbone="resnet50", score_type=2, task_type=2, cand_factor=2.0,
        inlier_th=0.15))
    cfg = dataclasses.replace(cfg, dataset_dir=bop_root,
                              path_to_output=out_dir)

    ds = BopDataset(bop_root, dataset, train=False)
    with open(os.path.join(ds.dir, "models_xyz",
                           cfg.norm_factor_fn)) as f:
        norm = json.load(f)

    model = build_generator(cfg.backbone)
    est = estimators_for_objects(model, cfg, ds.model_ids)
    params_by_obj, obj_params, missing_w = {}, {}, []
    for obj_id in ds.model_ids:
        wdir = resolve_weight_dir(ds.dir, weights_root, dataset, obj_id)
        v = (ckpt_util.load_inference_params(wdir, model)
             if wdir else None)
        if v is None:
            missing_w.append(obj_id)
            continue
        params_by_obj[obj_id] = v
        obj_params[obj_id] = obj_param_from_norm_factor(norm[str(obj_id)])
    if not params_by_obj:
        raise SystemExit(f"no reference weights found for any of "
                         f"{ds.model_ids}; mount them or pass --weights")
    if missing_w:
        print(f"WARNING: no weights for objects {missing_w} — "
              f"parity AR only covers {sorted(params_by_obj)}")

    detector = (PrecomputedDetector(detections) if detections
                else GtDetector(ds))
    if not detections:
        print("WARNING: GT detector in use (no --detections): AR is an "
              "upper bound w.r.t. the reference's Mask-RCNN pipeline")

    targets = get_target_list(
        os.path.join(ds.dir, cfg.test_target + ".json"))
    if max_images:
        images = sorted({(s, i) for s, i, _, _ in targets})[:max_images]
        keep = set(images)
        targets = [t for t in targets if (t[0], t[1]) in keep]

    ev = BopEvaluator(ds, cfg, est, params_by_obj, obj_params, detector)
    ev.warmup()
    results = ev.run(target_list=targets, out_dir=out_dir)
    scores = evaluate_bop(results, ds, target_list=targets)

    base = BASELINE_RGB_AR.get(dataset)
    report = {"dataset": dataset, "n_results": len(results),
              "AR": scores["AR"], "AR_vsd": scores["AR_vsd"],
              "AR_mssd": scores["AR_mssd"], "AR_mspd": scores["AR_mspd"],
              "baseline_rgb": base,
              "diff": (scores["AR"] - base) if base is not None else None,
              "subset": bool(max_images) or bool(missing_w),
              "gt_detector": not detections}

    if with_icp:
        has_depth = any(
            os.path.isdir(os.path.join(ds.split_dir(), f"{s:06d}",
                                       "depth"))
            for s in ds.scene_ids())
        if not has_depth:
            report["icp"] = "skipped: no depth/ images in the test split"
        else:
            meshes = {}
            for obj_id in params_by_obj:
                mesh = load_ply(ds.model_ply_path(obj_id))
                meshes[obj_id] = (mesh["pts"], mesh["faces"])
            ev_icp = BopEvaluatorICP(ds, cfg, est, params_by_obj,
                                     obj_params, meshes, detector)
            results_icp = ev_icp.run(target_list=targets,
                                     out_dir=os.path.join(out_dir, "icp"))
            scores_icp = evaluate_bop(results_icp, ds,
                                      target_list=targets)
            base_icp = BASELINE_ICP_AR.get(dataset)
            report.update({
                "AR_icp": scores_icp["AR"],
                "AR_icp_vsd": scores_icp["AR_vsd"],
                "AR_icp_mssd": scores_icp["AR_mssd"],
                "AR_icp_mspd": scores_icp["AR_mspd"],
                "baseline_icp": base_icp,
                "diff_icp": (scores_icp["AR"] - base_icp)
                if base_icp is not None else None,
                "icp_render_overflow": int(ev_icp.render_overflow)})
    return report


def main(argv: Sequence[str] | None = None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--bop-root", default=None)
    p.add_argument("--dataset", default="lmo")
    p.add_argument("--weights", default=None,
                   help="root of reference per-object hdf5 weights")
    p.add_argument("--detections", default=None,
                   help="PrecomputedDetector JSON (BOP'20 det dumps)")
    p.add_argument("--cfg", default=None,
                   help=f"eval cfg (default {REFERENCE_CFG}, or "
                        f"{REFERENCE_CFG_ICP} with --icp, if present)")
    p.add_argument("--icp", action="store_true",
                   help="also run the RGB-D/ICP evaluator and diff vs the "
                        "reference's w/-ICP table (README.md:33)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    root, missing = find_bop_dataset(args.bop_root, args.dataset)
    if missing:
        print(f"parity run gated OFF — data not available: {missing}")
        print("mount the BOP dataset (and reference weights) and rerun; "
              "see module docstring for the expected layout")
        raise SystemExit(2)

    report = run_parity(root, args.dataset, weights_root=args.weights,
                        detections=args.detections, cfg_path=args.cfg,
                        max_images=args.max_images, with_icp=args.icp)
    print(json.dumps(report, indent=1))

    def verdict(ar, base, label):
        ok = abs(ar - base) <= 0.005 or ar > base
        tag = ("PARITY" if ok else "BELOW BASELINE")
        if report["subset"] or report["gt_detector"]:
            tag += " (non-comparable setup: subset or GT detector)"
        print(f"AR {ar:.4f} vs reference {label} {base:.3f} -> {tag}")

    if report["diff"] is not None:
        verdict(report["AR"], report["baseline_rgb"], "RGB")
    if report.get("diff_icp") is not None:
        verdict(report["AR_icp"], report["baseline_icp"], "RGB-D/ICP")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
