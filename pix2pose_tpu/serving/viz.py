"""Visualization helpers: annotated detections and 3D-bounding-box pose
overlays (reference ``ros_kinetic/ros_pix2pose.py:196-245`` and the
``rendering/utils.py`` draw helpers) — pure numpy/PIL, no OpenCV."""

from __future__ import annotations

import numpy as np

_BOX_LINES = [[0, 1], [0, 2], [0, 4], [1, 5], [1, 3], [2, 6], [2, 3],
              [3, 7], [4, 6], [4, 5], [5, 7], [6, 7]]
_LINE_AXIS = [2, 1, 0, 0, 1, 0, 2, 0, 1, 2, 1, 2]


def bbox_corners(vertices: np.ndarray) -> np.ndarray:
    """(8, 3) axis-aligned bounding-box corners of a vertex set, ordered
    like the reference (``ros_pix2pose.py:196-215``)."""
    mn = vertices.min(axis=0)
    mx = vertices.max(axis=0)
    pts = [[mn[0], mn[1], mn[2]], [mn[0], mn[1], mx[2]],
           [mn[0], mx[1], mn[2]], [mn[0], mx[1], mx[2]],
           [mx[0], mn[1], mn[2]], [mx[0], mn[1], mx[2]],
           [mx[0], mx[1], mn[2]], [mx[0], mx[1], mx[2]]]
    return np.asarray(pts, np.float64)


def _draw_line(img, p0, p1, color):
    """Integer Bresenham-ish line via dense sampling (thickness 2)."""
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) * 2
    us = np.linspace(p0[0], p1[0], n).astype(int)
    vs = np.linspace(p0[1], p1[1], n).astype(int)
    h, w = img.shape[:2]
    for dv in (0, 1):
        for du in (0, 1):
            vv = np.clip(vs + dv, 0, h - 1)
            uu = np.clip(us + du, 0, w - 1)
            img[vv, uu] = color


def draw_pose_box(img: np.ndarray, corners: np.ndarray, R, t, cam_k,
                  copy: bool = True) -> np.ndarray:
    """Project the model bbox under pose (R, t) and draw depth-shaded axis
    colored edges (reference ``draw_3d_poses``, ``ros_pix2pose.py:216-245``).
    """
    out = img.copy() if copy else img
    p = corners @ np.asarray(R).T + np.asarray(t)
    z = np.maximum(p[:, 2], 1e-9)
    u = (p[:, 0] / z * cam_k[0, 0] + cam_k[0, 2]).astype(int)
    v = (p[:, 1] / z * cam_k[1, 1] + cam_k[1, 2]).astype(int)
    z_mean = (z.max() + z.min()) / 2
    z_diff = max(z.max() - z.min(), 1e-9)
    for (a, b), axis in zip(_BOX_LINES, _LINE_AXIS):
        amp = (z_mean - (z[a] + z[b]) / 2) / z_diff * 255
        val = int(min(128 + amp, 255))
        if val < 10:
            continue
        color = np.zeros(3, np.uint8)
        color[axis] = val
        _draw_line(out, (u[a], v[a]), (u[b], v[b]), color)
    return out


def draw_detection_box(img: np.ndarray, bbox, color=(0, 255, 0),
                       copy: bool = True) -> np.ndarray:
    """Draw a [v1, u1, v2, u2] detector box."""
    out = img.copy() if copy else img
    v1, u1, v2, u2 = [int(x) for x in bbox]
    _draw_line(out, (u1, v1), (u2, v1), color)
    _draw_line(out, (u2, v1), (u2, v2), color)
    _draw_line(out, (u2, v2), (u1, v2), color)
    _draw_line(out, (u1, v2), (u1, v1), color)
    return out
