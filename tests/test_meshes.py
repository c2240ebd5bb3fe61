"""Vertex-clustering decimation: face budget + geometric fidelity.

The decimated mesh must render depth within a small fraction of the
RGB-D evaluator's 20 mm scoring band
(``tools/5_evaluation_bop_icp3d.py:314-315``)."""

import numpy as np
import pytest

from pix2pose_tpu.data.meshes import cluster_decimate, decimate_mesh


def _uv_sphere(n_lat, n_lon, r=0.05):
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


def test_noop_below_target():
    v, f = _uv_sphere(10, 12)
    v2, f2 = decimate_mesh(v, f, 10_000)
    assert v2 is v and f2 is f


def test_face_budget_and_validity():
    v, f = _uv_sphere(60, 70)  # 8260 faces
    v2, f2 = decimate_mesh(v, f, 2000)
    assert 0 < f2.shape[0] <= 2000
    # meaningful coverage of the budget, not a collapse to a few faces
    assert f2.shape[0] > 500
    assert f2.min() >= 0 and f2.max() < v2.shape[0]
    # non-degenerate faces
    assert (np.ptp(np.sort(f2, 1), 1) > 0).all()
    # cluster means stay on/near the original surface
    r = np.linalg.norm(v2, axis=1)
    np.testing.assert_allclose(r, 0.05, atol=0.004)


def test_rendered_depth_close():
    import jax.numpy as jnp

    from pix2pose_tpu.ops.rasterizer import render_depth

    v, f = _uv_sphere(60, 70)
    v2, f2 = decimate_mesh(v, f, 2000)
    K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 0.4], np.float32)
    d0, m0 = render_depth(jnp.asarray(v), jnp.asarray(f), R, t, K, 128, 128)
    d1, m1 = render_depth(jnp.asarray(v2), jnp.asarray(f2), R, t, K,
                          128, 128)
    d0, m0, d1, m1 = map(np.asarray, (d0, m0, d1, m1))
    both = m0 & m1
    assert both.sum() > 0.9 * m0.sum()
    err = np.abs(d0 - d1)[both]
    assert np.quantile(err, 0.95) < 0.002  # 2 mm << 20 mm band


def test_cluster_decimate_merges_duplicates():
    v = np.array([[0, 0, 0], [1e-4, 0, 0], [1, 0, 0], [0, 1, 0]],
                 np.float32)
    f = np.array([[0, 2, 3], [1, 2, 3]], np.int32)
    v2, f2 = cluster_decimate(v, f, cell=0.01)
    assert v2.shape[0] == 3
    assert f2.shape[0] == 1  # duplicates collapse to one face
