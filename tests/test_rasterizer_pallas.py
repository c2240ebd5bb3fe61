"""Pallas rasterizer (interpret mode on CPU) vs the XLA reference."""

import numpy as np
import pytest

from pix2pose_tpu.ops import rasterizer
from pix2pose_tpu.ops.rasterizer_pallas import render_mesh_pallas
from synthetic import CAM_K, pose_with_euler
from test_rasterizer import cube_mesh


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_xla_rasterizer(seed):
    half = 40.0
    R, t = pose_with_euler(yaw=0.3 + seed, pitch=-0.2, tz=600.0)
    verts, faces = cube_mesh(half)
    ref = rasterizer.render_mesh(verts, faces, verts, R, t, CAM_K,
                                 480, 640)
    got = render_mesh_pallas(verts, faces, verts, R, t, CAM_K, 480, 640,
                             interpret=True)
    ref_m = np.asarray(ref.mask)
    got_m = np.asarray(got.mask)
    # masks identical
    np.testing.assert_array_equal(got_m, ref_m)
    # depth identical where covered
    np.testing.assert_allclose(np.asarray(got.depth)[ref_m],
                               np.asarray(ref.depth)[ref_m], rtol=1e-5)
    # attributes identical (non-edge: same winning face)
    d = np.abs(np.asarray(got.attr) - np.asarray(ref.attr))
    assert np.median(d[ref_m]) < 1e-4
    assert (d[ref_m] < 0.5).mean() > 0.995  # tie-broken edges only


def test_empty_scene():
    verts, faces = cube_mesh()
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, -500.0], np.float32)
    out = render_mesh_pallas(verts, faces, verts, R, t, CAM_K, 480, 640,
                             interpret=True)
    assert not bool(np.asarray(out.mask).any())
