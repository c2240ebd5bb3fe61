"""Render synthetic BOP-format train views for datasets without training
images — reference ``tools/render_training_img.py``: render each model at
poses copied from a reference dataset's ``scene_gt.json`` and write a
BOP-layout ``train/`` split (rgb + scene_camera + scene_gt).

The reference uses the lit OpenGL renderer; here the JAX rasterizer renders
shaded vertex-color images (Lambertian headlight, matching the reference's
diffuse+ambient look, ``rendering/renderer.py:13-81``) — or, when the model
ships a sibling texture image + UVs (YCB-V style), UV-textured renders via
``rasterizer.render_textured`` (reference ``renderer.py:50-79``).

CLI: python -m pix2pose_tpu.tools.render_train_views <cfg.json> <dataset>
         <pose_source_dir> [--per-obj N]
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.data.bop import BopDataset
from pix2pose_tpu.data.ply import find_texture, load_ply, load_texture
from pix2pose_tpu.ops import rasterizer


def _shaded_colors(mesh, light=0.6, ambient=0.5):
    """Per-vertex Lambertian shading baked into vertex colors (headlight
    at the camera; attribute interpolation then approximates the lit
    render)."""
    pts = mesh["pts"]
    if "colors" in mesh:
        base = mesh["colors"].astype(np.float32)
    else:
        base = np.full((pts.shape[0], 3), 180.0, np.float32)
    if "normals" in mesh:
        n = mesh["normals"]
    else:
        # area-weighted vertex normals from faces
        f = mesh["faces"]
        fn = np.cross(pts[f[:, 1]] - pts[f[:, 0]],
                      pts[f[:, 2]] - pts[f[:, 0]])
        n = np.zeros_like(pts)
        for k in range(3):
            np.add.at(n, f[:, k], fn)
        n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-9)
    return base, n


def render_train_split(ds: BopDataset, pose_source_dir: str,
                      per_obj: int | None = None, shade: bool = True):
    """Write ``train/{obj_id:06d}/`` scenes with poses from the source
    ``scene_gt.json`` files (reference ``render_training_img.py:32-89``)."""
    from PIL import Image

    # gather poses from the source dataset
    poses = []
    for d in sorted(os.listdir(pose_source_dir)):
        gt_fn = os.path.join(pose_source_dir, d, "scene_gt.json")
        if not os.path.exists(gt_fn):
            continue
        with open(gt_fn) as f:
            for v in json.load(f).values():
                g = v[0]
                poses.append((np.asarray(g["cam_R_m2c"],
                                         np.float32).reshape(3, 3),
                              np.asarray(g["cam_t_m2c"], np.float32)))
    if per_obj:
        poses = poses[:per_obj]
    im_w, im_h = ds.im_size
    K = ds.cam_k
    n_written = 0
    for obj_id in ds.model_ids:
        ply_path = ds.model_ply_path(obj_id)
        mesh = load_ply(ply_path)
        base, normals = _shaded_colors(mesh)
        # UV-textured models (YCB-V style) render through the textured
        # path — the reference's textured GL program
        # (``rendering/renderer.py:50-79``); vertex colors otherwise
        tex_path = find_texture(ply_path)
        textured = tex_path is not None and "texture_uv" in mesh
        if textured:
            texture = jnp.asarray(load_texture(tex_path))
            uvs = mesh["texture_uv"].astype(np.float32)
        sdir = os.path.join(ds.dir, "train", f"{obj_id:06d}")
        os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "mask"), exist_ok=True)
        cam_json, gt_json = {}, {}
        if textured:
            render_tex = jax.jit(
                lambda v, f, uv, n, R, t: rasterizer.render_textured(
                    v, f, uv, texture, n, R, t, K, im_h, im_w,
                    diffuse=0.5 if shade else 0.0,
                    ambient=0.5 if shade else 1.0))
        render = jax.jit(lambda v, f, a, R, t: rasterizer.render_mesh(
            v, f, a, R, t, K, im_h, im_w))
        for i, (R, t) in enumerate(poses):
            if textured:
                out = render_tex(mesh["pts"], mesh["faces"], uvs,
                                 normals.astype(np.float32), R, t)
            else:
                if shade:
                    n_cam = normals @ R.T
                    lam = np.clip(-n_cam[:, 2], 0.0, 1.0)
                    cols = np.clip(base * (0.5 + 0.5 * lam[:, None]), 0,
                                   255)
                else:
                    cols = base
                out = render(mesh["pts"], mesh["faces"],
                             cols.astype(np.float32), R, t)
            mask = np.asarray(out.mask)
            rgb = np.zeros((im_h, im_w, 3), np.uint8)
            rgb[mask] = np.clip(np.asarray(out.attr)[mask], 0,
                                255).astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(sdir, "rgb", f"{i:06d}.png"))
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(sdir, "mask", f"{i:06d}.png"))
            cam_json[str(i)] = {
                "cam_K": np.asarray(K).reshape(-1).tolist(),
                "depth_scale": 1.0}
            gt_json[str(i)] = [{
                "obj_id": int(obj_id),
                "cam_R_m2c": np.asarray(R).reshape(-1).tolist(),
                "cam_t_m2c": np.asarray(t).reshape(-1).tolist()}]
            n_written += 1
        with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
            json.dump(cam_json, f)
        with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
            json.dump(gt_json, f)
    return n_written


def main(argv: Sequence[str] | None = None):
    import argparse

    from pix2pose_tpu.config import load_eval_config

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("pose_source_dir")
    p.add_argument("--per-obj", type=int, default=None)
    args = p.parse_args(argv)
    cfg = load_eval_config(args.cfg)
    ds = BopDataset(cfg.dataset_dir, args.dataset, train=True)
    n = render_train_split(ds, args.pose_source_dir, per_obj=args.per_obj)
    print(f"rendered {n} train views")


if __name__ == "__main__":
    main()
