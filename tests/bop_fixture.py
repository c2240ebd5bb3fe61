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


def box_mesh(hx, hy, hz):
    """Axis-aligned box [-hx,hx]x[-hy,hy]x[-hz,hz] (cube generalized)."""
    v = np.array([[x, y, z] for x in (-hx, hx) for y in (-hy, hy)
                  for z in (-hz, hz)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
    ], np.int32)
    return v, f


def octahedron_mesh(half):
    """Regular octahedron with vertices at ±half on each axis."""
    v = np.array([[half, 0, 0], [-half, 0, 0], [0, half, 0],
                  [0, -half, 0], [0, 0, half], [0, 0, -half]], np.float32)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int32)
    return v, f


def cylinder_mesh(radius=25.0, half_h=45.0, n_seg=48):
    """Closed z-axis cylinder: continuously symmetric about z."""
    ang = np.linspace(0.0, 2 * np.pi, n_seg, endpoint=False)
    ring = np.stack([radius * np.cos(ang), radius * np.sin(ang)], axis=1)
    top = np.concatenate([ring, np.full((n_seg, 1), half_h)], axis=1)
    bot = np.concatenate([ring, np.full((n_seg, 1), -half_h)], axis=1)
    v = np.concatenate([top, bot,
                        [[0.0, 0.0, half_h]], [[0.0, 0.0, -half_h]]],
                       axis=0).astype(np.float32)
    ct, cb = 2 * n_seg, 2 * n_seg + 1
    f = []
    for i in range(n_seg):
        j = (i + 1) % n_seg
        f += [[i, j, n_seg + i], [j, n_seg + j, n_seg + i],  # wall
              [ct, i, j], [cb, n_seg + j, n_seg + i]]        # caps
    return v, np.asarray(f, np.int32)


def _z180():
    """Discrete 180-deg rotation about z as a 4x4 (BOP models_info form)."""
    m = np.eye(4)
    m[0, 0] = m[1, 1] = -1.0
    return m.reshape(-1).tolist()


def multishape_objects():
    """Four analytic shapes incl. one DISCRETELY-symmetric (square prism,
    z180) and one CONTINUOUSLY-symmetric (cylinder, z axis) object:
    {obj_id: (verts, faces, scale(3,), sym_spec)} where sym_spec is None,
    {"discrete": [4x4...]}, or {"continuous": axis}."""
    from test_rasterizer import cube_mesh as _cube

    cube_v, cube_f = _cube(40.0)
    prism_v, prism_f = box_mesh(22.0, 22.0, 55.0)
    octa_v, octa_f = octahedron_mesh(38.0)
    cyl_v, cyl_f = cylinder_mesh(25.0, 45.0)
    return {
        1: (cube_v, cube_f, np.array([40.0, 40.0, 40.0], np.float32), None),
        # square prism: 180-deg z rotation maps the GEOMETRY onto itself
        2: (prism_v, prism_f, np.array([22.0, 22.0, 55.0], np.float32),
            {"discrete": [_z180()]}),
        3: (octa_v, octa_f, np.array([38.0, 38.0, 38.0], np.float32), None),
        # cylinder: ANY z rotation maps the geometry onto itself
        # (reference handles these via get_sympose canonicalization,
        # ``2_2_render_pix2pose_training.py:26-52``)
        4: (cyl_v, cyl_f, np.array([25.0, 25.0, 45.0], np.float32),
            {"continuous": [0, 0, 1]}),
    }


# Disjoint color bands per object: a pixel's band identifies its object, so
# the per-object BandOracleGenerator suppresses occluders/background the
# way a per-object trained network does. Background is white (in no band).
SHAPE_BANDS = {1: (0.0, 0.22), 2: (0.25, 0.47), 3: (0.50, 0.72),
               4: (0.75, 0.97)}


def build_multishape_dataset(root, n_scenes=1, ims_per_scene=4,
                             im_h=480, im_w=640, split="test", seed=11):
    """Dataset 'shapes': 3 objects per image (cube, z-sym square prism,
    octahedron) with deliberate silhouette OVERLAP, per-instance visib
    masks, combined depth, models_info symmetries, ViVo-style targets.
    RGB images are unlit XYZ-color composites (min-depth winner per pixel)
    so the oracle network yields exact correspondences per object.

    Returns list of (scene_id, im_id, {obj_id: (R, t)}).
    """
    name = "shapes"
    ds_dir = os.path.join(root, name)
    model_dir = os.path.join(ds_dir, "models")
    xyz_dir = os.path.join(ds_dir, "models_xyz")
    os.makedirs(model_dir, exist_ok=True)
    os.makedirs(xyz_dir, exist_ok=True)

    objs = multishape_objects()
    minfo, norm = {}, {}
    for obj_id, (v, f, scale, sym) in objs.items():
        save_ply(os.path.join(model_dir, f"obj_{obj_id:06d}.ply"), v, f)
        ext = v.max(0) - v.min(0)
        info = {"diameter": float(np.linalg.norm(ext)),
                "min_x": float(v[:, 0].min()), "min_y": float(v[:, 1].min()),
                "min_z": float(v[:, 2].min()), "size_x": float(ext[0]),
                "size_y": float(ext[1]), "size_z": float(ext[2])}
        if isinstance(sym, dict):
            if "discrete" in sym:
                info["symmetries_discrete"] = sym["discrete"]
            if "continuous" in sym:
                info["symmetries_continuous"] = [
                    {"axis": sym["continuous"], "offset": [0, 0, 0]}]
        elif sym is not None:
            info["symmetries_discrete"] = sym
        minfo[str(obj_id)] = info
        norm[str(obj_id)] = {
            "x_scale": float(scale[0]), "y_scale": float(scale[1]),
            "z_scale": float(scale[2]), "x_ct": 0.0, "y_ct": 0.0,
            "z_ct": 0.0}
    with open(os.path.join(model_dir, "models_info.json"), "w") as f:
        json.dump(minfo, f)
    with open(os.path.join(xyz_dir, "norm_factor.json"), "w") as f:
        json.dump(norm, f)
    with open(os.path.join(ds_dir, "camera.json"), "w") as f:
        json.dump({"fx": float(CAM_K[0, 0]), "fy": float(CAM_K[1, 1]),
                   "cx": float(CAM_K[0, 2]), "cy": float(CAM_K[1, 2]),
                   "width": im_w, "height": im_h, "depth_scale": 1.0}, f)

    from PIL import Image

    # base placements: prism sits BEHIND the cube with overlapping
    # silhouettes (occluded), octahedron clear on the left, cylinder
    # clear on the right
    # the prism sits behind the cube's right edge: overlapping silhouettes
    # but ~half visible. Its original spot ([65,-15,730], straight behind
    # the cube) left it 12-45% visible in EVERY view — train medians 19%
    # — which no occlusion-aware training can recover (the reference
    # filters training views at visib_fract >= 0.5); measured e2e prism
    # AR 0.0 across 6k/12k-step runs before the move.
    base_t = {1: np.array([15.0, 5.0, 620.0]),
              2: np.array([105.0, -35.0, 700.0]),
              3: np.array([-130.0, -40.0, 650.0]),
              4: np.array([150.0, 40.0, 660.0])}
    rng = np.random.RandomState(seed)
    entries, targets = [], []
    for s in range(n_scenes):
        sdir = os.path.join(ds_dir, split, f"{s:06d}")
        os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "mask_visib"), exist_ok=True)
        cam, gt = {}, {}
        for i in range(ims_per_scene):
            depth_all = np.full((im_h, im_w), np.inf, np.float32)
            rgb = np.full((im_h, im_w, 3), 255, np.uint8)  # white bg
            winner = np.zeros((im_h, im_w), np.int32)
            per_obj = {}
            for obj_id, (v, f, scale, _) in objs.items():
                R, t = pose_with_euler(
                    yaw=rng.uniform(-1, 1), pitch=rng.uniform(-0.6, 0.6),
                    roll=rng.uniform(-1, 1),
                    tx=base_t[obj_id][0] + rng.uniform(-15, 15),
                    ty=base_t[obj_id][1] + rng.uniform(-15, 15),
                    tz=base_t[obj_id][2] + rng.uniform(-30, 30))
                lo, hi = SHAPE_BANDS[obj_id]
                base01 = (v / scale + 1.0) / 2.0
                colors = ((lo + (hi - lo) * base01) * 255.0).astype(
                    np.float32)
                out = rasterizer.render_mesh(v, f, colors, R, t, CAM_K,
                                             im_h, im_w)
                d = np.asarray(out.depth)
                m = np.asarray(out.mask)
                d = np.where(m, d, np.inf)
                win = m & (d < depth_all)
                depth_all = np.where(win, d, depth_all)
                rgb[win] = np.clip(np.asarray(out.attr)[win], 0,
                                   255).astype(np.uint8)
                winner[win] = obj_id
                per_obj[obj_id] = (R, t)
            # winner map is final only after all objects composited
            Image.fromarray(rgb).save(
                os.path.join(sdir, "rgb", f"{i:06d}.png"))
            depth_mm = np.where(np.isfinite(depth_all), depth_all,
                                0.0).astype(np.float32)
            Image.fromarray(depth_mm.astype(np.uint16)).save(
                os.path.join(sdir, "depth", f"{i:06d}.png"))
            gt_list = []
            for gt_id, (obj_id, (R, t)) in enumerate(per_obj.items()):
                visib = winner == obj_id
                Image.fromarray((visib * 255).astype(np.uint8)).save(
                    os.path.join(sdir, "mask_visib",
                                 f"{i:06d}_{gt_id:06d}.png"))
                gt_list.append({"obj_id": obj_id,
                                "cam_R_m2c": R.reshape(-1).tolist(),
                                "cam_t_m2c": t.tolist()})
                targets.append({"scene_id": s, "im_id": i,
                                "obj_id": obj_id, "inst_count": 1})
            cam[str(i)] = {"cam_K": np.asarray(CAM_K).reshape(-1).tolist(),
                           "depth_scale": 1.0}
            gt[str(i)] = gt_list
            entries.append((s, i, per_obj))
        with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
            json.dump(cam, f)
        with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
            json.dump(gt, f)
    with open(os.path.join(ds_dir, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)
    return entries


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

def build_duplicate_cube_dataset(root, n_scenes=1, ims_per_scene=3,
                                 im_h=480, im_w=640, half=40.0,
                                 split="test", seed=5):
    """Dataset 'twocubes': TWO instances of the SAME object occluding
    each other in every image — the ViVo duplicate-instance case
    (T-Less/IC-BIN style) that drives inst_count caps
    (``5_evaluation_bop_basic.py:297-299,325-349``) and the ICP
    evaluator's occupancy gating (``5_evaluation_bop_icp3d.py:392-433``).
    Per-instance visib masks, combined depth, unlit XYZ colors (oracle
    network compatible).

    Returns list of (scene_id, im_id, [(R, t), (R, t)]).
    """
    name = "twocubes"
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
    with open(os.path.join(xyz_dir, "norm_factor.json"), "w") as f:
        json.dump({"1": {"x_scale": half, "y_scale": half,
                         "z_scale": half, "x_ct": 0.0, "y_ct": 0.0,
                         "z_ct": 0.0}}, f)
    with open(os.path.join(ds_dir, "camera.json"), "w") as f:
        json.dump({"fx": float(CAM_K[0, 0]), "fy": float(CAM_K[1, 1]),
                   "cx": float(CAM_K[0, 2]), "cy": float(CAM_K[1, 2]),
                   "width": im_w, "height": im_h, "depth_scale": 1.0}, f)

    from PIL import Image

    colors = ((verts / half + 1.0) / 2.0 * 255.0).astype(np.float32)
    rng = np.random.RandomState(seed)
    entries, targets = [], []
    for s in range(n_scenes):
        sdir = os.path.join(ds_dir, split, f"{s:06d}")
        os.makedirs(os.path.join(sdir, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "depth"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "mask_visib"), exist_ok=True)
        cam, gt = {}, {}
        for i in range(ims_per_scene):
            # front cube centered-ish; second cube BEHIND and offset so
            # its silhouette is partially occluded by the first
            poses = []
            R0, t0 = pose_with_euler(
                yaw=rng.uniform(-1, 1), pitch=rng.uniform(-0.6, 0.6),
                roll=rng.uniform(-1, 1),
                tx=-20.0 + rng.uniform(-10, 10),
                ty=rng.uniform(-15, 15), tz=600.0 + rng.uniform(-20, 20))
            R1, t1 = pose_with_euler(
                yaw=rng.uniform(-1, 1), pitch=rng.uniform(-0.6, 0.6),
                roll=rng.uniform(-1, 1),
                tx=t0[0] + 62.0 + rng.uniform(-6, 6),
                ty=t0[1] + rng.uniform(-10, 10),
                tz=t0[2] + 110.0 + rng.uniform(-15, 15))
            poses = [(R0, t0), (R1, t1)]

            depth_all = np.full((im_h, im_w), np.inf, np.float32)
            # gray background = coordinate origin = "no object" for the
            # oracle generator (same convention as build_cube_dataset)
            rgb = np.full((im_h, im_w, 3), 128, np.uint8)
            winner = np.full((im_h, im_w), -1, np.int32)  # instance id
            for inst, (R, t) in enumerate(poses):
                out = rasterizer.render_mesh(verts, faces, colors, R, t,
                                             CAM_K, im_h, im_w)
                d = np.asarray(out.depth)
                m = np.asarray(out.mask)
                d = np.where(m, d, np.inf)
                win = m & (d < depth_all)
                depth_all = np.where(win, d, depth_all)
                rgb[win] = np.clip(np.asarray(out.attr)[win], 0,
                                   255).astype(np.uint8)
                winner[win] = inst
            Image.fromarray(rgb).save(
                os.path.join(sdir, "rgb", f"{i:06d}.png"))
            depth_mm = np.where(np.isfinite(depth_all), depth_all,
                                0.0).astype(np.float32)
            Image.fromarray(depth_mm.astype(np.uint16)).save(
                os.path.join(sdir, "depth", f"{i:06d}.png"))
            gt_list = []
            for inst, (R, t) in enumerate(poses):
                visib = winner == inst
                Image.fromarray((visib * 255).astype(np.uint8)).save(
                    os.path.join(sdir, "mask_visib",
                                 f"{i:06d}_{inst:06d}.png"))
                gt_list.append({"obj_id": 1,
                                "cam_R_m2c": R.reshape(-1).tolist(),
                                "cam_t_m2c": t.tolist()})
            targets.append({"scene_id": s, "im_id": i, "obj_id": 1,
                            "inst_count": 2})
            cam[str(i)] = {"cam_K": np.asarray(CAM_K).reshape(-1).tolist(),
                           "depth_scale": 1.0}
            gt[str(i)] = gt_list
            entries.append((s, i, poses))
        with open(os.path.join(sdir, "scene_camera.json"), "w") as f:
            json.dump(cam, f)
        with open(os.path.join(sdir, "scene_gt.json"), "w") as f:
            json.dump(gt, f)
    with open(os.path.join(ds_dir, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)
    return entries
