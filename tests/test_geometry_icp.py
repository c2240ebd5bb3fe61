"""Depth geometry + ICP: backprojection round trip, normals on analytic
surfaces, ICP recovery of a known perturbation."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.ops import geometry, icp
from synthetic import CAM_K


def test_backproject_roundtrip():
    rng = np.random.RandomState(0)
    depth = rng.uniform(400, 800, (48, 64)).astype(np.float32)
    K = np.asarray(CAM_K)
    pts = np.asarray(geometry.backproject(jnp.asarray(depth), K))
    # reproject
    u = K[0, 0] * pts[..., 0] / pts[..., 2] + K[0, 2]
    v = K[1, 1] * pts[..., 1] / pts[..., 2] + K[1, 2]
    uu, vv = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(u, uu, atol=1e-3)
    np.testing.assert_allclose(v, vv, atol=1e-3)
    np.testing.assert_allclose(pts[..., 2], depth, atol=1e-4)


def test_inpaint_fills_holes():
    depth = np.full((32, 32), 500.0, np.float32)
    depth[10:15, 12:18] = 0.0
    out = np.asarray(geometry.inpaint_depth(jnp.asarray(depth)))
    assert (out > 0).all()
    np.testing.assert_allclose(out, 500.0, atol=1.0)


def test_normals_flat_plane():
    # fronto-parallel plane -> normals along -z or +z
    depth = np.full((64, 64), 600.0, np.float32)
    n = np.asarray(geometry.normals_from_depth(jnp.asarray(depth),
                                               np.asarray(CAM_K),
                                               refine=False))
    interior = n[8:-8, 8:-8]
    assert np.abs(np.abs(interior[..., 2]) - 1.0).max() < 1e-3


def test_normals_tilted_plane():
    # plane z = a + b*x (camera-space): depth(u) solves z = a + b*(u-cx)z/fx
    K = np.asarray(CAM_K)
    a, b = 600.0, 0.5
    u = np.arange(128)[None, :].repeat(96, 0).astype(np.float32)
    depth = a / (1.0 - b * (u - K[0, 2]) / K[0, 0])
    depth = depth.astype(np.float32)
    n = np.asarray(geometry.normals_from_depth(jnp.asarray(depth), K,
                                               refine=False))
    gt = np.array([b, 0.0, -1.0])
    gt = gt / np.linalg.norm(gt)
    interior = n[8:-8, 8:-8].reshape(-1, 3)
    dots = np.abs(interior @ gt)
    assert dots.min() > 0.999


def _sphere_cloud(rng, n, r=50.0):
    p = rng.normal(size=(n, 3))
    p = p / np.linalg.norm(p, axis=1, keepdims=True)
    pts = (p * r).astype(np.float32)
    normals = p.astype(np.float32)
    return pts, normals


def test_icp_recovers_small_pose_delta():
    rng = np.random.RandomState(1)
    tgt, tgt_n = _sphere_cloud(rng, 2048)
    # perturb: small rotation + translation
    w = np.array([0.04, -0.03, 0.05])
    th = np.linalg.norm(w)
    k = w / th
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R_gt = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)
    t_gt = np.array([3.0, -2.0, 4.0])
    # src = inverse-transformed target: tgt = R_gt src + t_gt
    src = (tgt - t_gt) @ R_gt
    res = icp.icp_point_to_plane(src.astype(np.float32), tgt, tgt_n,
                                 iters=20)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=5e-3)
    np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=0.5)
    assert float(res.residual) < 0.2


def test_icp_robust_to_partial_overlap_and_outliers():
    rng = np.random.RandomState(2)
    tgt, tgt_n = _sphere_cloud(rng, 4096)
    src = tgt[:1500] + np.array([2.0, 1.0, -3.0], np.float32)
    # corrupt some target points far away (clutter)
    tgt2 = tgt.copy()
    tgt2[-500:] += 300.0
    res = icp.icp_point_to_plane(src, tgt2, tgt_n, iters=20)
    assert bool(res.ok)
    np.testing.assert_allclose(np.asarray(res.t),
                               [-2.0, -1.0, 3.0], atol=0.6)


def test_icp_too_few_points_flags():
    src = np.zeros((8, 3), np.float32)
    tgt = np.zeros((8, 3), np.float32)
    n = np.zeros((8, 3), np.float32)
    res = icp.icp_point_to_plane(src, tgt, n,
                                 src_valid=np.zeros(8, bool),
                                 tgt_valid=np.zeros(8, bool))
    assert not bool(res.ok)
    assert float(res.residual) == -1.0
