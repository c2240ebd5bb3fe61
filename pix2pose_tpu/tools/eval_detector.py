"""Detector-quality harness: COCO-style mAP for the trained in-repo
detectors (CenterNet default; ``--head retinanet`` for the anchor head).

The reference never measures its detectors — it ships externally-trained
Mask-RCNN/RetinaNet checkpoints with hand-tuned thresholds
(``tools/mask_rcnn_util.py:39-65``) and trusts them. Here detection is an
in-repo trained component, so this tool closes the loop:

  synthetic mode (default): synthesize held-out scenes from the same
      train_xyz patch pools (disjoint RNG stream from training), run the
      batched on-device composition -> forward -> decode program, report
      per-class AP, mAP@0.5/0.75, COCO mAP, and a tuned score threshold.

  --split test: run the :class:`JaxDetector` over the BOP test targets and
      score against GT visible-mask boxes (scene_gt + mask_visib) — the
      real-data mAP the reference's detection dumps would be scored with.

CLI: python -m pix2pose_tpu.tools.eval_detector <cfg.json> <dataset>
         [--n-images 64] [--split synthetic|test] [--tune] [--json out]
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from pix2pose_tpu.eval.detection_metrics import (evaluate_detections,
                                                 tune_score_threshold)


def gt_boxes_from_masks(dataset, scene_id: int, im_id: int) -> dict:
    """Visible-region GT boxes for one image from scene_gt + mask_visib.

    Class index = rank of obj_id in ``dataset.model_ids`` (the
    JaxDetector/DetectorStore convention)."""
    cls_of = {obj_id: i for i, obj_id in enumerate(dataset.model_ids)}
    gt = dataset.scene_gt(scene_id).get(str(im_id), [])
    boxes, classes = [], []
    from PIL import Image

    for gt_id, rec in enumerate(gt):
        obj_id = int(rec["obj_id"])
        if obj_id not in cls_of:
            continue
        mpath = dataset.mask_path(scene_id, im_id, gt_id, visib=True)
        if not os.path.isfile(mpath):
            continue
        m = np.asarray(Image.open(mpath)) > 0
        ys, xs = np.nonzero(m)
        if ys.size < 8:
            continue
        boxes.append([ys.min(), xs.min(), ys.max() + 1, xs.max() + 1])
        classes.append(cls_of[obj_id])
    return {"bbox": np.asarray(boxes, np.float64).reshape(-1, 4),
            "cls": np.asarray(classes, np.int64)}


def evaluate_on_test_split(detector, dataset, target_list,
                           iou_ths=(0.5, 0.75)) -> dict:
    """mAP of any Detector-protocol object over BOP test images."""
    cls_of = {obj_id: i for i, obj_id in enumerate(dataset.model_ids)}
    images = sorted({(s, i) for s, i, _, _ in target_list})
    preds, gts = [], []
    for scene_id, im_id in images:
        rgb = dataset.load_rgb(scene_id, im_id)
        dets = detector.detect(scene_id, im_id, rgb)
        preds.append({
            "bbox": np.asarray([d.bbox for d in dets],
                               np.float64).reshape(-1, 4),
            "score": np.asarray([d.score for d in dets], np.float64),
            "cls": np.asarray([cls_of.get(d.obj_id, -1) for d in dets],
                              np.int64)})
        gts.append(gt_boxes_from_masks(dataset, scene_id, im_id))
    res = evaluate_detections(preds, gts, iou_ths=iou_ths)
    res["_preds"] = preds
    res["_gts"] = gts
    return res


def _fmt(res: dict, model_ids=None) -> str:
    lines = [f"mAP@0.50 = {res['mAP50']:.4f}",
             f"mAP@0.75 = {res['mAP75']:.4f}",
             f"mAP@[.5:.95] = {res['mAP']:.4f}"]
    for c, aps in sorted(res["per_class"].items()):
        if res["n_gt"].get(c, 0) == 0:
            continue
        name = (f"obj {model_ids[c]}" if model_ids is not None
                else f"class {c}")
        lines.append(f"  {name}: AP50={aps[0.5]:.4f} AP75={aps[0.75]:.4f}"
                     f" (n_gt={res['n_gt'][c]})")
    return "\n".join(lines)


def main(argv: Sequence[str] | None = None):
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("--split", choices=["synthetic", "test"],
                   default="synthetic")
    p.add_argument("--head", choices=["centernet", "retinanet"],
                   default="centernet")
    p.add_argument("--n-images", type=int, default=64)
    p.add_argument("--score-th", type=float, default=0.3,
                   help="JaxDetector threshold for --split test")
    p.add_argument("--tune", action="store_true",
                   help="also sweep the score threshold for best F1@0.5")
    p.add_argument("--json", default=None)
    args = p.parse_args(argv)

    import jax

    from pix2pose_tpu.config import load_eval_config
    from pix2pose_tpu.data.bop import BopDataset, get_target_list
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.utils import checkpoint as ckpt_util

    cfg = load_eval_config(args.cfg)
    ds = BopDataset(cfg.dataset_dir, args.dataset,
                    train=(args.split == "synthetic"))
    det_vars = ckpt_util.load_inference_params(
        os.path.join(ds.dir, "weight_detection", args.head))
    if det_vars is None:
        raise SystemExit(
            f"no trained detector (weight_detection/{args.head})")
    if args.head == "retinanet":
        from pix2pose_tpu.models.retinanet import RetinaNetDetector
        model = RetinaNetDetector(num_classes=len(ds.model_ids))
    else:
        model = CenterNetDetector(num_classes=len(ds.model_ids))

    if args.split == "synthetic":
        from pix2pose_tpu.eval.detection_metrics import \
            collect_synthetic_detections
        from pix2pose_tpu.training.data import PatchStore
        from pix2pose_tpu.training.detector_data import DetectorStore

        stores = {}
        for obj_id in ds.model_ids:
            d = os.path.join(ds.dir, "train_xyz", f"{obj_id:02d}")
            if os.path.isdir(d):
                stores[obj_id] = PatchStore.load(d, None)
        if not stores:
            raise SystemExit("no train_xyz patches for synthetic eval")
        backs = stores[next(iter(stores))].backs
        store = DetectorStore.from_patch_stores(stores, backs)
        decode_fn = None
        if args.head == "retinanet":
            import jax.numpy as jnp
            from pix2pose_tpu.models.retinanet import (anchor_boxes,
                                                       decode_retinanet)
            anchors = jnp.asarray(anchor_boxes(512))
            decode_fn = lambda out: decode_retinanet(out, anchors)
        preds, gts = collect_synthetic_detections(
            model, det_vars, store, args.n_images,
            jax.random.PRNGKey(777),  # disjoint from training streams
            decode_fn=decode_fn)
        res = evaluate_detections(preds, gts)
    else:
        if args.head == "retinanet":
            from pix2pose_tpu.inference.jax_detector import \
                RetinaNetAdapter
            detector = RetinaNetAdapter(model, det_vars, ds.model_ids,
                                        score_th=args.score_th)
        else:
            from pix2pose_tpu.inference.jax_detector import JaxDetector
            detector = JaxDetector(model, det_vars, ds.model_ids,
                                   score_th=args.score_th)
        targets = get_target_list(
            os.path.join(ds.dir, cfg.test_target + ".json"))
        res = evaluate_on_test_split(detector, ds, targets)
        preds, gts = res.pop("_preds"), res.pop("_gts")

    print(_fmt(res, ds.model_ids))
    if args.tune:
        tuned = tune_score_threshold(preds, gts)
        print(f"tuned score threshold: {tuned['best_th']:.2f} "
              f"(F1@0.5 = {tuned['best_f1']:.4f})")
        res["tuned"] = {"best_th": tuned["best_th"],
                        "best_f1": tuned["best_f1"]}
    if args.json:
        out = {k: v for k, v in res.items() if not k.startswith("_")}
        out["per_class"] = {
            str(c): {str(t): v for t, v in aps.items()}
            for c, aps in out["per_class"].items()}
        out["n_gt"] = {str(c): int(n) for c, n in out["n_gt"].items()}
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
