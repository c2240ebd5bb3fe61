"""Build a miniature BOP-layout dataset on disk from analytic cube scenes.

Gives eval-driver integration tests a self-consistent dataset: models/ with
PLY + models_info.json, test/ scenes with rgb/depth/scene_camera/scene_gt,
test_targets json, and models_xyz/norm_factor.json — no downloads
(SURVEY.md §4 test strategy)."""

import json
import os

import numpy as np

from pix2pose_tpu.data.ply import save_ply
from pix2pose_tpu.ops import rasterizer
from synthetic import CAM_K, pose_with_euler

from test_rasterizer import cube_mesh


def build_cube_dataset(root, n_scenes=1, ims_per_scene=2, half=40.0,
                       im_h=480, im_w=640, xyz_colored=True,
                       split="test"):
    """Create dataset 'cubes' under root. The test RGB images are unlit
    XYZ-color renders, so an identity 'oracle' network yields exact
    correspondences. Returns list of (scene_id, im_id, R, t)."""
    name = "cubes"
    ds_dir = os.path.join(root, name)
    model_dir = os.path.join(ds_dir, "models")
    xyz_dir = os.path.join(ds_dir, "models_xyz")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(xyz_dir, exist_ok=True)

    verts, faces = cube_mesh(half)
    diam = float(np.linalg.norm([2 * half] * 3))
    save_ply(os.path.join(model_dir, "obj_000001.ply"), verts, faces)
    with open(os.path.join(model_dir, "models_info.json"), "w") as f:
        json.dump({"1": {"diameter": diam,
                         "min_x": -half, "min_y": -half, "min_z": -half,
                         "size_x": 2 * half, "size_y": 2 * half,
                         "size_z": 2 * half}}, f)
    with open(os.path.join(ds_dir, "camera.json"), "w") as f:
        json.dump({"fx": float(CAM_K[0, 0]), "fy": float(CAM_K[1, 1]),
                   "cx": float(CAM_K[0, 2]), "cy": float(CAM_K[1, 2]),
                   "width": im_w, "height": im_h, "depth_scale": 1.0}, f)
    # norm factors (cube centered at origin)
    with open(os.path.join(xyz_dir, "norm_factor.json"), "w") as f:
        json.dump({"1": {"x_scale": half, "y_scale": half, "z_scale": half,
                         "x_ct": 0.0, "y_ct": 0.0, "z_ct": 0.0}}, f)

    from PIL import Image

    colors = ((verts / half + 1.0) / 2.0 * 255.0).astype(np.float32)
    entries = []
    targets = []
    rng = np.random.RandomState(7)
    for s in range(n_scenes):
        sdir = os.path.join(ds_dir, split, f"{s:06d}")
        os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "mask_visib"), exist_ok=True)
        cam, gt = {}, {}
        for i in range(ims_per_scene):
            R, t = pose_with_euler(
                yaw=rng.uniform(-1, 1), pitch=rng.uniform(-0.8, 0.8),
                roll=rng.uniform(-1, 1), tx=rng.uniform(-40, 40),
                ty=rng.uniform(-30, 30), tz=rng.uniform(500, 800))
            out = rasterizer.render_mesh(verts, faces, colors, R, t,
                                         CAM_K, im_h, im_w)
            rgb = np.full((im_h, im_w, 3), 128, np.uint8)
            mask = np.asarray(out.mask)
            rgb[mask] = np.clip(np.asarray(out.attr)[mask], 0,
                                255).astype(np.uint8)
            Image.fromarray(rgb).save(
                os.path.join(sdir, "rgb", f"{i:06d}.png"))
            depth_mm = (np.asarray(out.depth)).astype(np.float32)
            Image.fromarray((depth_mm).astype(np.uint16)).save(
                os.path.join(sdir, "depth", f"{i:06d}.png"))
            Image.fromarray((mask * 255).astype(np.uint8)).save(
                os.path.join(sdir, "mask_visib", f"{i:06d}_000000.png"))
            cam[str(i)] = {"cam_K": np.asarray(CAM_K).reshape(-1).tolist(),
                           "depth_scale": 1.0}
            gt[str(i)] = [{"obj_id": 1,
                           "cam_R_m2c": R.reshape(-1).tolist(),
                           "cam_t_m2c": t.tolist()}]
            entries.append((s, i, R, t))
            targets.append({"scene_id": s, "im_id": i, "obj_id": 1,
                            "inst_count": 1})
        with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
            json.dump(cam, f)
        with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
            json.dump(gt, f)
    with open(os.path.join(ds_dir, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)
    return entries
