"""Detection-training scene generator (disk format) — reference
``tools/1_1_scene_gen_for_detection_maskrcnn.py``.

Writes cluttered composites + annotations in the reference's on-disk
format: ``train_detect/`` with per-image ``{i:06d}.jpg``, an instance-id
mask ``mask/{i:06d}.npy`` (Mask-RCNN style, ``1_1:62-66,256``) and RetinaNet
``gt.csv`` / ``label.csv`` (``1_1:67-70,311``).

NOTE: the TPU training path doesn't need this tool — detector batches are
synthesized on device (:mod:`pix2pose_tpu.training.detector_data`). This
exists for compatibility with external detector trainers.

CLI: python -m pix2pose_tpu.tools.scene_gen_detection <cfg.json> <dataset>
         <background_dir> [--num N]
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax

from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                 make_detector_batch)


def generate_scenes(store: DetectorStore, out_dir: str, num: int = 1000,
                    im_size: int = 512, k_obj: int = 10, seed: int = 0,
                    class_to_obj_id=None):
    """Write ``num`` composites + annotations to ``out_dir``."""
    from PIL import Image

    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    gt_rows = []
    key = jax.random.PRNGKey(seed)
    img_id = 0
    batch = 8
    while img_id < num:
        key, kb = jax.random.split(key)
        b = make_detector_batch(store, kb, batch_size=batch,
                                im_size=im_size, k_obj=k_obj)
        imgs = np.asarray(b["image"])
        segs = np.asarray(b["seg"])
        heats = np.asarray(b["heat"])
        whs = np.asarray(b["wh"])
        regs = np.asarray(b["reg_mask"])
        for bi in range(batch):
            if img_id >= num:
                break
            fn = f"{img_id:06d}"
            Image.fromarray(
                (np.clip(imgs[bi], 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, fn + ".jpg"), quality=92)
            # instance-id map at full res (class-id based like 1_1's
            # object-index map), upsampled from the stride-4 seg
            seg_up = np.array(Image.fromarray(
                segs[bi].argmax(-1).astype(np.uint8) + 1).resize(
                (im_size, im_size), Image.NEAREST))
            any_obj = np.array(Image.fromarray(
                (segs[bi].max(-1) > 0.5).astype(np.uint8)).resize(
                (im_size, im_size), Image.NEAREST)) > 0
            inst_map = np.where(any_obj, seg_up, 0).astype(np.uint8)
            np.save(os.path.join(out_dir, "mask", fn + ".npy"), inst_map)
            # retinanet-style gt rows from center targets
            cs = np.argwhere(regs[bi] > 0)
            for cv, cu in cs:
                hh, ww = whs[bi, cv, cu] * 4
                cls = int(heats[bi, cv, cu].argmax())
                obj = (class_to_obj_id[cls] if class_to_obj_id
                       else cls + 1)
                v1 = max(int(cv * 4 - hh / 2), 0)
                u1 = max(int(cu * 4 - ww / 2), 0)
                v2 = min(int(cv * 4 + hh / 2), im_size - 1)
                u2 = min(int(cu * 4 + ww / 2), im_size - 1)
                gt_rows.append(f"{fn}.jpg,{u1},{v1},{u2},{v2},obj_{obj}")
            img_id += 1
    with open(os.path.join(out_dir, "gt.csv"), "w") as f:
        f.write("\n".join(gt_rows) + "\n")
    n_cls = store.num_classes
    with open(os.path.join(out_dir, "label.csv"), "w") as f:
        ids = (class_to_obj_id if class_to_obj_id
               else [c + 1 for c in range(n_cls)])
        f.write("\n".join(f"obj_{o},{c}" for c, o in enumerate(ids))
                + "\n")
    return img_id


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config
    from pix2pose_tpu.data.bop import BopDataset
    from pix2pose_tpu.training.data import PatchStore

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("back_dir")
    p.add_argument("--num", type=int, default=20000)
    args = p.parse_args(argv)
    ecfg = load_eval_config(args.cfg)
    ds = BopDataset(ecfg.dataset_dir, args.dataset, train=True)
    stores = {}
    for obj_id in ds.model_ids:
        d = os.path.join(ds.dir, "train_xyz", f"{obj_id:02d}")
        if os.path.isdir(d):
            stores[obj_id] = PatchStore.load(d, args.back_dir)
    backs = stores[next(iter(stores))].backs
    store = DetectorStore.from_patch_stores(stores, backs)
    out = os.path.join(ds.dir, "train_detect")
    n = generate_scenes(store, out, num=args.num,
                        class_to_obj_id=sorted(stores))
    print(f"wrote {n} scenes to {out}")


if __name__ == "__main__":
    main()
