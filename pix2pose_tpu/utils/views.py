"""Viewpoint sampling and pose-pool construction.

The reference carries SSD-6D-era helpers for viewpoint sampling and 6D
pose pools (``rendering/utils.py:17-238``, imported but unused by the
pipeline). Here the useful capability is kept as a small vectorized module:
near-uniform sphere viewpoints (Fibonacci lattice, equivalent coverage to
the icosahedron subdivision the SSD-6D code refines) with optional in-plane
rotations — e.g. to drive ``render_train_views`` without an external
scene_gt pose source.
"""

from __future__ import annotations

import numpy as np


def fibonacci_sphere(n: int, hemisphere: bool = False) -> np.ndarray:
    """(n, 3) near-uniform unit view directions."""
    i = np.arange(n, dtype=np.float64) + 0.5
    phi = np.arccos(1 - (1 if hemisphere else 2) * i / n)
    golden = np.pi * (1 + 5 ** 0.5)
    theta = golden * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(phi)], axis=1)


def look_at_rotations(view_dirs: np.ndarray) -> np.ndarray:
    """(n, 3, 3) camera rotations: object sits at the origin, camera looks
    along +z toward it from direction ``-view_dir``."""
    z = view_dirs / np.linalg.norm(view_dirs, axis=1, keepdims=True)
    up = np.where(np.abs(z[:, 2:3]) < 0.99,
                  np.tile([0.0, 0.0, 1.0], (z.shape[0], 1)),
                  np.tile([1.0, 0.0, 0.0], (z.shape[0], 1)))
    x = np.cross(up, z)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    return np.stack([x, y, z], axis=1)  # rows are camera axes


def pose_pool(n_views: int = 200, n_inplane: int = 1,
              distance: float = 600.0, hemisphere: bool = False):
    """[(R, t), ...] pose pool: n_views viewpoints x n_inplane rotations
    at the given camera distance (mm)."""
    rots = look_at_rotations(fibonacci_sphere(n_views, hemisphere))
    poses = []
    for R in rots:
        for k in range(n_inplane):
            a = 2 * np.pi * k / max(n_inplane, 1)
            c, s = np.cos(a), np.sin(a)
            rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            poses.append(((rz @ R).astype(np.float32),
                          np.array([0.0, 0.0, distance], np.float32)))
    return poses
