"""XYZ colorization round-trip (reference 2_1:51-61 <-> recognition.py:198-202)."""

import numpy as np

from pix2pose_tpu.ops import color


def test_norm_factor_matches_reference_definition():
    rng = np.random.RandomState(0)
    verts = rng.uniform(-40, 60, size=(500, 3)).astype(np.float32)
    scale, ct = color.norm_factor_from_vertices(verts)
    ref_ct = verts.mean(axis=0)
    ref_scale = np.abs(verts - ref_ct).max(axis=0)
    np.testing.assert_allclose(np.asarray(ct), ref_ct, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(scale), ref_scale, rtol=1e-5)


def test_roundtrip_xyz_color_xyz():
    rng = np.random.RandomState(1)
    verts = rng.uniform(-100, 100, size=(200, 3)).astype(np.float32)
    scale, ct = color.norm_factor_from_vertices(verts)
    c01 = color.xyz_to_color01(verts, scale, ct)
    assert np.asarray(c01).min() >= -1e-5 and np.asarray(c01).max() <= 1 + 1e-5
    back = color.color01_to_xyz(c01, scale, ct)
    np.testing.assert_allclose(np.asarray(back), verts, rtol=1e-4, atol=1e-3)


def test_tanh_to_color01_clips():
    x = np.array([-1.5, -1.0, 0.0, 1.0, 1.5], np.float32)
    out = np.asarray(color.tanh_to_color01(x))
    np.testing.assert_allclose(out, [0.0, 0.0, 0.5, 1.0, 1.0], atol=1e-6)


def test_obj_param_vector_order():
    p = {"x_scale": 1.0, "y_scale": 2.0, "z_scale": 3.0,
         "x_ct": 4.0, "y_ct": 5.0, "z_ct": 6.0}
    np.testing.assert_array_equal(color.obj_param_from_norm_factor(p),
                                  np.arange(1.0, 7.0, dtype=np.float32))
