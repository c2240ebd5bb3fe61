"""Training-pair renderer — reference
``tools/2_2_render_pix2pose_training.py``.

For every GT-annotated train view of each object: render the XYZ-colored
model at the (continuous-symmetry-canonicalized) GT pose with the JAX
rasterizer, crop to the rendered bbox, and store an (h, w, 6) uint8 npy
[RGB crop with gray background | rendered XYZ colors], longest side <= 128
(``2_2:147-188``). The YCB-V real-image path samples every 100th cluttered
frame with ``visib_fract >= 0.5`` and adds the visible-mask channel
(``2_2:189-264``).

DESIGN DELTA (TPU-first): the reference also pre-renders 12 in-plane
rotation copies per view to disk (``2_2:64-96``); here rotation coverage is
folded into the on-device training pipeline (full-circle sampling in
``training/data.py``), so only the canonical view is stored — 12x less
data-prep work and disk. The ``rotation_lock`` decision is persisted in
``meta.json`` instead.

CLI: python -m pix2pose_tpu.tools.render_training_pairs <cfg.json> <dataset>
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

import jax

from pix2pose_tpu.data.bop import BopDataset
from pix2pose_tpu.data.ply import load_ply
from pix2pose_tpu.ops import color as color_ops
from pix2pose_tpu.ops import rasterizer
from pix2pose_tpu.utils.symmetry import canonicalize_sym_pose


def _resize_to_128(data: np.ndarray) -> np.ndarray:
    """Downscale so the longest side is <= 128 (``2_2:85-95``)."""
    h, w = data.shape[:2]
    m = max(h, w)
    if m <= 128:
        return data
    scale = 128.0 / m
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    from PIL import Image

    out = np.zeros((nh, nw, data.shape[2]), data.dtype)
    for c0 in range(0, data.shape[2], 3):
        c1 = min(c0 + 3, data.shape[2])
        chunk = data[..., c0:c1]
        if chunk.shape[2] == 1:
            img = Image.fromarray(chunk[..., 0]).resize((nw, nh),
                                                        Image.BILINEAR)
            out[..., c0] = (np.asarray(img) > 127).astype(data.dtype) * (
                1 if data[..., c0].max() <= 1 else 255)
        else:
            img = Image.fromarray(chunk).resize((nw, nh), Image.BILINEAR)
            out[..., c0:c1] = np.asarray(img)
    return out


def _render_view(verts, faces, colors, R, t, cam_k, im_h, im_w):
    out = rasterizer.render_mesh(verts, faces, colors, R, t, cam_k,
                                 im_h, im_w)
    mask = np.asarray(out.mask)
    attr = np.asarray(out.attr)
    return mask, attr


def render_object_pairs(ds: BopDataset, obj_id: int,
                        out_root: str | None = None,
                        max_views: int | None = None) -> int:
    """Generate training pairs for one object. Returns #views written."""
    out_root = out_root or os.path.join(ds.dir, "train_xyz")
    out_dir = os.path.join(out_root, f"{obj_id:02d}")
    os.makedirs(out_dir, exist_ok=True)

    mesh = load_ply(ds.model_ply_path(obj_id))
    scale, ct = color_ops.norm_factor_from_vertices(mesh["pts"])
    colors = np.asarray(color_ops.xyz_to_color01(
        mesh["pts"], np.asarray(scale), np.asarray(ct))) * 255.0

    info = ds.model_info(obj_id)
    sym_axis = None
    if "symmetries_continuous" in info:
        sym_axis = info["symmetries_continuous"][0].get("axis", [0, 0, 1])

    im_w, im_h = ds.im_size
    render = jax.jit(lambda R, t, K: rasterizer.render_mesh(
        mesh["pts"], mesh["faces"], colors, R, t, K, im_h, im_w))

    count = 0
    any_lock = False
    for scene_id in ds.scene_ids():
        cams = ds.scene_camera(scene_id)
        gts = ds.scene_gt(scene_id)
        for im_id, gt_list in sorted(gts.items()):
            for gt in gt_list:
                if gt["obj_id"] != obj_id:
                    continue
                R, lock = canonicalize_sym_pose(gt["R"], sym_axis)
                any_lock = any_lock or lock
                out = render(R.astype(np.float32), gt["t"],
                             cams[im_id]["cam_K"])
                mask = np.asarray(out.mask)
                if mask.sum() < 16:
                    continue
                vu = np.where(mask)
                v0, v1 = int(vu[0].min()), int(vu[0].max()) + 1
                u0, u1 = int(vu[1].min()), int(vu[1].max()) + 1
                rgb = ds.load_rgb(scene_id, im_id).copy()
                rgb[~mask] = 128  # gray background (``2_2:167``)
                data = np.zeros((v1 - v0, u1 - u0, 6), np.uint8)
                data[..., :3] = rgb[v0:v1, u0:u1]
                data[..., 3:6] = np.clip(
                    np.asarray(out.attr)[v0:v1, u0:u1], 0, 255)
                np.save(os.path.join(out_dir, f"{count:06d}.npy"),
                        _resize_to_128(data))
                count += 1
                if max_views is not None and count >= max_views:
                    break
            if max_views is not None and count >= max_views:
                break
        if max_views is not None and count >= max_views:
            break
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"rotation_lock": any_lock,
                   "continuous_sym": sym_axis is not None}, f)
    return count


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("--obj", type=int, default=None)
    p.add_argument("--max-views", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_eval_config(args.cfg)
    ds = BopDataset(cfg.dataset_dir, args.dataset, train=True)
    objs = [args.obj] if args.obj else ds.model_ids
    for obj_id in objs:
        n = render_object_pairs(ds, obj_id, max_views=args.max_views)
        print(f"obj {obj_id}: {n} pairs")


if __name__ == "__main__":
    main()
