"""Run the trained detector over a test target list and export detections
as PrecomputedDetector JSON (bbox + uncompressed RLE masks).

Splits detection from pose estimation — the equivalent of the reference
teams' practice of shipping Mask-RCNN detection dumps for the BOP pose
tasks, and the primary parity-eval path (BASELINE.json: "via Mask-RCNN
detections").

CLI: python -m pix2pose_tpu.tools.run_detector <cfg.json> <dataset>
         [--out detections.json] [--score-th 0.3]
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np


def encode_rle(mask: np.ndarray) -> dict:
    """Uncompressed row-major RLE (PrecomputedDetector._decode_rle
    format): alternating run lengths starting with a 'False' run."""
    flat = np.asarray(mask, bool).reshape(-1)
    change = np.nonzero(np.diff(flat))[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    runs = np.diff(idx).tolist()
    if flat[0]:
        runs = [0] + runs
    return {"size": [int(mask.shape[0]), int(mask.shape[1])],
            "counts": [int(r) for r in runs]}


def export_detections(detector, dataset, target_list, out_path: str,
                      with_masks: bool = True) -> int:
    entries = []
    for scene_id, im_id, _, _ in target_list:
        rgb = dataset.load_rgb(scene_id, im_id)
        for d in detector.detect(scene_id, im_id, rgb):
            e = {"scene_id": int(scene_id), "im_id": int(im_id),
                 "obj_id": int(d.obj_id), "score": float(d.score),
                 "bbox": [int(x) for x in d.bbox]}
            if with_masks and d.mask is not None:
                e["mask_rle"] = encode_rle(d.mask)
            entries.append(e)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(entries, f)
    return len(entries)


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config
    from pix2pose_tpu.data.bop import BopDataset, get_target_list
    from pix2pose_tpu.inference.jax_detector import JaxDetector
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.utils import checkpoint as ckpt_util

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("--out", default=None)
    p.add_argument("--score-th", type=float, default=0.3)
    args = p.parse_args(argv)

    cfg = load_eval_config(args.cfg)
    ds = BopDataset(cfg.dataset_dir, args.dataset, train=False)
    det_vars = ckpt_util.load_inference_params(
        os.path.join(ds.dir, "weight_detection", "centernet"))
    if det_vars is None:
        raise SystemExit("no trained detector (weight_detection/centernet)")
    model = CenterNetDetector(num_classes=len(ds.model_ids))
    detector = JaxDetector(model, det_vars, ds.model_ids,
                           score_th=args.score_th)
    targets = get_target_list(
        os.path.join(ds.dir, cfg.test_target + ".json"))
    out = args.out or os.path.join(cfg.path_to_output,
                                   f"detections_{ds.name}.json")
    n = export_detections(detector, ds, targets, out)
    print(f"{n} detections -> {out}")


if __name__ == "__main__":
    main()
