"""Anchor-coverage diagnostic for the RetinaNet head (CPU, no training).

Samples scenes from the on-device composer and reports, per GT-size bin
and per class, how many anchors clear the positive-assignment IoU and
how many GTs get ZERO positive anchors (surviving only through
best-anchor forcing — one weak positive). This is how the round-3
base-4.0 starvation was found (objects <24 px: 77% zero-positive;
--anchor-base 3.0 measured mAP@0.50 0.682 -> 0.807 on the 5-class
bench).

    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/anchor_coverage.py \
        [--im-size 256] [--base 4.0] [--batches 20]
"""

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--im-size", type=int, default=256)
    ap.add_argument("--base", type=float, default=4.0)
    ap.add_argument("--pos-iou", type=float, default=0.5)
    ap.add_argument("--batches", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.models.retinanet import anchor_boxes, iou_matrix
    from pix2pose_tpu.training.detector_data import make_detector_batch
    from synthetic import make_shape_patch_store

    store = make_shape_patch_store(np.random.RandomState(0))
    anch = jnp.asarray(anchor_boxes(args.im_size, base=args.base))
    print(f"anchors: {anch.shape[0]} (base {args.base}, "
          f"im_size {args.im_size})")

    key = jax.random.PRNGKey(0)
    sizes, n_pos, best, cls_all = [], [], [], []
    for _ in range(args.batches):
        key, kb = jax.random.split(key)
        b = make_detector_batch(store, kb, 8, args.im_size, 6)
        gb, gv, gc = (np.asarray(b["gt_bbox"]), np.asarray(b["gt_valid"]),
                      np.asarray(b["gt_cls"]))
        for bi in range(gb.shape[0]):
            sel = gv[bi] > 0
            if not sel.any():
                continue
            boxes = gb[bi][sel]
            iou = np.asarray(iou_matrix(anch, jnp.asarray(boxes)))
            for k in range(boxes.shape[0]):
                h = boxes[k, 2] - boxes[k, 0]
                w = boxes[k, 3] - boxes[k, 1]
                sizes.append(np.sqrt(max(h, 1) * max(w, 1)))
                n_pos.append(int((iou[:, k] >= args.pos_iou).sum()))
                best.append(float(iou[:, k].max()))
                cls_all.append(int(gc[bi][sel][k]))

    sizes, n_pos = np.array(sizes), np.array(n_pos)
    best, cls_all = np.array(best), np.array(cls_all)
    print(f"n_gt={len(sizes)}  size p10/50/90: "
          f"{np.percentile(sizes, [10, 50, 90]).round(1)}")
    print(f"anchors with IoU>={args.pos_iou} per GT: mean "
          f"{n_pos.mean():.2f}; GTs with ZERO pos anchors: "
          f"{(n_pos == 0).mean() * 100:.1f}%")
    for lo, hi in [(0, 24), (24, 32), (32, 48), (48, 64), (64, 96),
                   (96, 160), (160, 512)]:
        m = (sizes >= lo) & (sizes < hi)
        if m.sum():
            print(f"  size [{lo:3d},{hi:3d}): n={m.sum():4d} "
                  f"mean_pos={n_pos[m].mean():6.2f} zero_pos="
                  f"{(n_pos[m] == 0).mean() * 100:5.1f}% "
                  f"best_iou_med={np.median(best[m]):.3f}")
    for c in sorted(set(cls_all)):
        m = cls_all == c
        print(f"  class {c}: n={m.sum():4d} "
              f"size_med={np.median(sizes[m]):6.1f} "
              f"mean_pos={n_pos[m].mean():6.2f} zero_pos="
              f"{(n_pos[m] == 0).mean() * 100:5.1f}%")


if __name__ == "__main__":
    main()
