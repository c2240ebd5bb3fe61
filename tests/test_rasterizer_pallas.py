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


# ------------------------------------------------- binned work-list path
def _sphere(n_lat=24, n_lon=30, r=40.0):
    lat = np.linspace(0.12, np.pi - 0.12, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    la, lo = np.meshgrid(lat, lon, indexing="ij")
    verts = np.stack([r * np.sin(la) * np.cos(lo),
                      r * np.sin(la) * np.sin(lo),
                      r * np.cos(la)], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n_lat * n_lon).reshape(n_lat, n_lon)
    i = np.repeat(np.arange(n_lat - 1), n_lon)
    j = np.tile(np.arange(n_lon), n_lat - 1)
    j2 = (j + 1) % n_lon
    f1 = np.stack([idx[i, j], idx[i + 1, j], idx[i, j2]], -1)
    f2 = np.stack([idx[i, j2], idx[i + 1, j], idx[i + 1, j2]], -1)
    return verts, np.concatenate([f1, f2]).astype(np.int32)


@pytest.mark.parametrize("mesh", ["cube", "sphere"])
def test_binned_matches_exhaustive(mesh):
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import project_vertices
    from pix2pose_tpu.ops.rasterizer_pallas import (rasterize_pallas,
                                                    rasterize_pallas_binned)

    verts, faces = cube_mesh(40.0) if mesh == "cube" else _sphere()
    R, t = pose_with_euler(yaw=0.4, pitch=-0.3, tz=500.0)
    uv, z = project_vertices(jnp.asarray(verts), R, t,
                             jnp.asarray(CAM_K))
    a = rasterize_pallas(uv, z, faces, verts, 480, 640, interpret=True)
    b = rasterize_pallas_binned(uv, z, faces, verts, 480, 640,
                                interpret=True)
    assert np.asarray(a.mask).sum() > 500
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(a.mask))
    np.testing.assert_array_equal(np.asarray(b.depth),
                                  np.asarray(a.depth))
    np.testing.assert_array_equal(np.asarray(b.attr), np.asarray(a.attr))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_binned_fuzz_matches_exhaustive(seed):
    """Random meshes with degenerate faces, behind-camera vertices and
    off-screen geometry: the two Pallas drivers must agree exactly."""
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer_pallas import (rasterize_pallas,
                                                    rasterize_pallas_binned)

    rng = np.random.default_rng(seed)
    n_v = 80
    verts = rng.normal(size=(n_v, 3)).astype(np.float32) * 0.04
    faces = rng.integers(0, n_v, size=(90, 3)).astype(np.int32)
    faces[:5, 1] = faces[:5, 0]           # degenerate (repeated vertex)
    z = rng.uniform(0.3, 0.8, n_v).astype(np.float32)
    z[:6] = -0.2                          # behind camera
    uv = rng.uniform(-80, 200, size=(n_v, 2)).astype(np.float32)  # off-screen
    attrs = rng.normal(size=(n_v, 3)).astype(np.float32)
    a = rasterize_pallas(jnp.asarray(uv), jnp.asarray(z), faces, attrs,
                         128, 128, interpret=True)
    b = rasterize_pallas_binned(jnp.asarray(uv), jnp.asarray(z), faces,
                                attrs, 128, 128, interpret=True)
    np.testing.assert_array_equal(np.asarray(b.mask), np.asarray(a.mask))
    np.testing.assert_array_equal(np.asarray(b.depth),
                                  np.asarray(a.depth))
    np.testing.assert_array_equal(np.asarray(b.attr), np.asarray(a.attr))


def test_binned_pair_stats():
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import project_vertices
    from pix2pose_tpu.ops.rasterizer_pallas import binned_pair_stats

    verts, faces = _sphere(40, 50)
    R, t = pose_with_euler(yaw=0.4, tz=500.0)
    uv, z = project_vertices(jnp.asarray(verts), R, t, jnp.asarray(CAM_K))
    st = binned_pair_stats(uv, z, faces, 480, 640)
    assert st["fits"] and 0 < st["needed"] <= st["capacity"]

    # pathological: ~17k screen-spanning random triangles exceed the 8x
    # capacity -> the helper must flag it
    rng = np.random.default_rng(0)
    vb = rng.normal(size=(4000, 3)).astype(np.float32) * 0.2
    fb = rng.integers(0, 4000, size=(17000, 3)).astype(np.int32)
    uv2, z2 = project_vertices(jnp.asarray(vb), np.eye(3, dtype=np.float32),
                               np.array([0, 0, 0.6], np.float32),
                               jnp.asarray(CAM_K))
    st2 = binned_pair_stats(uv2, z2, fb, 480, 640)
    assert not st2["fits"]
    # ...and a larger pair_factor restores capacity
    st3 = binned_pair_stats(uv2, z2, fb, 480, 640, pair_factor=160)
    assert st3["fits"]


def test_binned_vmap_and_empty():
    import jax
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import project_vertices
    from pix2pose_tpu.ops.rasterizer_pallas import (rasterize_pallas,
                                                    rasterize_pallas_binned)

    verts, faces = _sphere(10, 12)
    Ks = jnp.asarray(CAM_K)
    poses = [pose_with_euler(yaw=0.2 * i, tz=500.0 + 40 * i)
             for i in range(2)] + [(np.eye(3, dtype=np.float32),
                                    np.array([0, 0, -500.0], np.float32))]
    uvz = [project_vertices(jnp.asarray(verts), R, t, Ks)
           for R, t in poses]
    uvs = jnp.stack([u for u, _ in uvz])
    zs = jnp.stack([z for _, z in uvz])
    fb = jax.vmap(lambda uv, z: rasterize_pallas_binned(
        uv, z, faces, verts, 128, 128, interpret=True).depth)
    fe = jax.vmap(lambda uv, z: rasterize_pallas(
        uv, z, faces, verts, 128, 128, interpret=True).depth)
    db, de = fb(uvs, zs), fe(uvs, zs)
    np.testing.assert_array_equal(np.asarray(db), np.asarray(de))
    assert not np.asarray(db[2]).any()  # behind-camera frame is empty


def test_binned_overflow_flag():
    """The binned driver reports dropped work pairs via
    ``RenderOut.overflow``; a large-enough pair_factor restores overflow
    == 0 AND exact agreement with the exhaustive driver."""
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import project_vertices
    from pix2pose_tpu.ops.rasterizer_pallas import (rasterize_pallas,
                                                    rasterize_pallas_binned)

    rng = np.random.default_rng(1)
    vb = rng.normal(size=(4000, 3)).astype(np.float32) * 0.2
    fb = rng.integers(0, 4000, size=(17000, 3)).astype(np.int32)
    uv, z = project_vertices(jnp.asarray(vb), np.eye(3, dtype=np.float32),
                             np.array([0, 0, 0.6], np.float32),
                             jnp.asarray(CAM_K))
    small = rasterize_pallas_binned(uv, z, fb, vb, 480, 640,
                                    interpret=True)
    assert int(small.overflow) > 0

    big = rasterize_pallas_binned(uv, z, fb, vb, 480, 640,
                                  pair_factor=160, interpret=True)
    assert int(big.overflow) == 0
    ref = rasterize_pallas(uv, z, fb, vb, 480, 640, interpret=True)
    assert int(ref.overflow) == 0
    np.testing.assert_array_equal(np.asarray(big.mask),
                                  np.asarray(ref.mask))
    np.testing.assert_array_equal(np.asarray(big.depth),
                                  np.asarray(ref.depth))
