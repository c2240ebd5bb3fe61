"""Viewpoint sampling: uniformity, valid rotations, pose pool."""

import numpy as np

from pix2pose_tpu.utils.views import (fibonacci_sphere, look_at_rotations,
                                      pose_pool)


def test_fibonacci_sphere_uniformity():
    v = fibonacci_sphere(500)
    assert v.shape == (500, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-9)
    # near-uniform: octant counts within 2x of each other
    counts = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                counts.append(((v[:, 0] * sx > 0) & (v[:, 1] * sy > 0)
                               & (v[:, 2] * sz > 0)).sum())
    assert min(counts) > 0.5 * max(counts)


def test_hemisphere():
    v = fibonacci_sphere(100, hemisphere=True)
    assert (v[:, 2] >= -1e-9).all()


def test_rotations_orthonormal_and_looking():
    v = fibonacci_sphere(50)
    Rs = look_at_rotations(v)
    for R, d in zip(Rs, v):
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(R) > 0.99
        # camera z axis == view direction
        np.testing.assert_allclose(R[2], d, atol=1e-9)


def test_pose_pool():
    poses = pose_pool(n_views=10, n_inplane=4, distance=500.0)
    assert len(poses) == 40
    R, t = poses[0]
    assert R.shape == (3, 3) and t[2] == 500.0
