"""Rasterizer golden tests against the analytic ray-cast cube
(SURVEY.md §7 'validate against analytic meshes')."""

import numpy as np
import jax.numpy as jnp

from pix2pose_tpu.ops import rasterizer
from synthetic import CAM_K, pose_with_euler, raycast_cube


def cube_mesh(half=40.0):
    v = np.array([[x, y, z] for x in (-half, half) for y in (-half, half)
                  for z in (-half, half)], np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x = -h
        [4, 6, 7], [4, 7, 5],  # x = +h
        [0, 4, 5], [0, 5, 1],  # y = -h
        [2, 3, 7], [2, 7, 6],  # y = +h
        [0, 2, 6], [0, 6, 4],  # z = -h
        [1, 5, 7], [1, 7, 3],  # z = +h
    ], np.int32)
    return v, f


def test_depth_and_mask_vs_raycast():
    half = 40.0
    R, t = pose_with_euler()
    verts, faces = cube_mesh(half)
    out = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K, 480, 640)
    hit, pts = raycast_cube(R, t, CAM_K, 480, 640, half)
    mask = np.asarray(out.mask)
    # masks agree except within a couple of px of the silhouette
    disagree = mask ^ hit
    from scipy import ndimage
    edge = ndimage.binary_dilation(hit, iterations=2) ^ \
        ndimage.binary_erosion(hit, iterations=2)
    assert disagree[~edge].sum() == 0
    # depth agrees with analytic camera-space depth
    depth_gt = (pts @ R.T + t)[..., 2]
    both = mask & hit & ~edge
    err = np.abs(np.asarray(out.depth)[both] - depth_gt[both])
    assert err.max() < 0.5  # mm, at ~600mm range


def test_attribute_interpolation_is_model_coordinates():
    half = 40.0
    R, t = pose_with_euler(yaw=1.1, pitch=0.4, tz=550.0)
    verts, faces = cube_mesh(half)
    out = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K, 480, 640)
    hit, pts = raycast_cube(R, t, CAM_K, 480, 640, half)
    from scipy import ndimage
    edge = ndimage.binary_dilation(hit, iterations=2) ^ \
        ndimage.binary_erosion(hit, iterations=2)
    both = np.asarray(out.mask) & hit & ~edge
    err = np.linalg.norm(np.asarray(out.attr)[both] - pts[both], axis=-1)
    assert err.max() < 0.5  # mm


def test_window_render_equals_full_crop():
    half = 40.0
    R, t = pose_with_euler(tz=650.0)
    verts, faces = cube_mesh(half)
    full = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K, 480, 640)
    hit = np.asarray(full.mask)
    vu = np.where(hit)
    v0, u0 = int(vu[0].min()) - 5, int(vu[1].min()) - 5
    hw = 160
    win = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K, hw, hw,
                                 v0=v0, u0=u0)
    np.testing.assert_allclose(
        np.asarray(win.depth), np.asarray(full.depth)[v0:v0 + hw,
                                                      u0:u0 + hw],
        atol=1e-3)


def test_degenerate_and_empty():
    verts, faces = cube_mesh()
    # behind the camera -> nothing rendered
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, -500.0], np.float32)
    out = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K, 64, 64)
    assert not bool(np.asarray(out.mask).any())
    # degenerate (zero-area) faces are ignored
    f_deg = np.array([[0, 0, 0], [1, 1, 2]], np.int32)
    out2 = rasterizer.render_mesh(verts, f_deg, verts, R,
                                  np.array([0, 0, 500.0], np.float32),
                                  CAM_K, 64, 64)
    assert np.isfinite(np.asarray(out2.depth)).all()


def test_render_lit_shades_by_normal():
    import jax.numpy as jnp
    from pix2pose_tpu.ops.rasterizer import render_lit
    half = 40.0
    verts, faces = cube_mesh(half)
    # outward vertex normals of the cube corners
    normals = (verts / np.linalg.norm(verts, axis=1, keepdims=True)
               ).astype(np.float32)
    colors = np.full((8, 3), 200.0, np.float32)
    R, t = pose_with_euler()
    lit = render_lit(verts, faces, colors, normals, R, t, CAM_K, 480, 640)
    unlit = __import__("pix2pose_tpu.ops.rasterizer", fromlist=["x"]) \
        .render_mesh(verts, faces, colors, R, t, CAM_K, 480, 640)
    m = np.asarray(lit.mask)
    lv = np.asarray(lit.attr)[m]
    uv = np.asarray(unlit.attr)[m]
    # shading darkens at least part of the surface and varies across it
    assert lv.mean() < uv.mean()
    assert lv.std() > uv.std() + 1.0
