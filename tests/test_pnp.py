"""On-device PnP-RANSAC: synthetic pose recovery, outlier robustness,
degenerate bail-outs (reference contract at recognition.py:214-224)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.ops import pnp

K = np.array([[572.4, 0.0, 325.3], [0.0, 573.6, 242.0], [0.0, 0.0, 1.0]],
             np.float32)


def random_pose(rng):
    a = rng.normal(size=3)
    a = a / np.linalg.norm(a)
    th = rng.uniform(0.2, 2.0)
    kx = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
    R = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * (kx @ kx)
    t = np.array([rng.uniform(-50, 50), rng.uniform(-50, 50),
                  rng.uniform(400, 900)])
    return R.astype(np.float32), t.astype(np.float32)


def synth(rng, n=512, noise=0.0, outlier_frac=0.0, n_valid=None):
    R, t = random_pose(rng)
    obj = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
    img = np.array(pnp.project(jnp.asarray(obj), jnp.asarray(R),
                               jnp.asarray(t), jnp.asarray(K)))
    img += rng.normal(scale=noise, size=img.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        img[idx] += rng.uniform(30, 120, (n_out, 2)) * np.sign(
            rng.normal(size=(n_out, 2)))
    valid = np.ones(n, bool)
    if n_valid is not None:
        valid[:] = False
        valid[rng.choice(n, n_valid, replace=False)] = True
    return obj, img.astype(np.float32), valid, R, t


def rot_err_deg(Ra, Rb):
    ctheta = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(ctheta, -1, 1)))


@pytest.fixture(scope="module")
def solver():
    return jax.jit(lambda o, i, v, k: pnp.pnp_ransac(o, i, v, K, k))


def test_exact_recovery(solver):
    rng = np.random.RandomState(0)
    obj, img, valid, R, t = synth(rng)
    res = solver(obj, img, valid, jax.random.PRNGKey(0))
    assert bool(res.ok)
    assert rot_err_deg(np.asarray(res.R), R) < 0.2
    assert np.linalg.norm(np.asarray(res.t) - t) < 2.0
    assert int(res.n_inliers) > 500


def test_noisy_recovery(solver):
    rng = np.random.RandomState(1)
    for seed in range(3):
        obj, img, valid, R, t = synth(rng, noise=1.0)
        res = solver(obj, img, valid, jax.random.PRNGKey(seed))
        assert bool(res.ok)
        assert rot_err_deg(np.asarray(res.R), R) < 2.0, seed
        # depth-relative: 1px noise over a ~60px object leaves ~2% scale
        # ambiguity, so bound translation error by 2.5% of range
        assert np.linalg.norm(np.asarray(res.t) - t) < 0.025 * t[2], seed


def test_outlier_robustness(solver):
    rng = np.random.RandomState(2)
    obj, img, valid, R, t = synth(rng, noise=0.5, outlier_frac=0.4)
    res = solver(obj, img, valid, jax.random.PRNGKey(3))
    assert bool(res.ok)
    assert rot_err_deg(np.asarray(res.R), R) < 2.0
    assert np.linalg.norm(np.asarray(res.t) - t) < 10.0
    # inliers should roughly match the clean fraction
    assert 0.45 < int(res.n_inliers) / 512 < 0.75


def test_too_few_points_bails(solver):
    rng = np.random.RandomState(3)
    obj, img, valid, R, t = synth(rng, n_valid=5)
    res = solver(obj, img, valid, jax.random.PRNGKey(0))
    assert not bool(res.ok)
    assert int(res.n_inliers) == -1
    np.testing.assert_array_equal(np.asarray(res.R), np.eye(3))
    np.testing.assert_array_equal(np.asarray(res.t), np.zeros(3))


def test_masked_points_ignored(solver):
    rng = np.random.RandomState(4)
    obj, img, valid, R, t = synth(rng, noise=0.3)
    # corrupt masked-out points completely; result must not change much
    valid[:200] = False
    img[:200] = rng.uniform(0, 640, (200, 2))
    res = solver(obj, img, valid, jax.random.PRNGKey(1))
    assert bool(res.ok)
    assert rot_err_deg(np.asarray(res.R), R) < 2.0
    assert not bool(np.asarray(res.inlier_mask)[:200].any())


def test_batched_candidates():
    rng = np.random.RandomState(5)
    objs, imgs, valids, Rs, ts = [], [], [], [], []
    for _ in range(4):
        o, i, v, R, t = synth(rng, noise=0.5)
        objs.append(o); imgs.append(i); valids.append(v)
        Rs.append(R); ts.append(t)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    res = jax.jit(lambda o, i, v, k: pnp.pnp_ransac_batch(o, i, v, K, k))(
        np.stack(objs), np.stack(imgs), np.stack(valids), keys)
    for b in range(4):
        assert bool(res.ok[b])
        assert rot_err_deg(np.asarray(res.R[b]), Rs[b]) < 2.0


def test_compact_correspondences_keeps_all_when_under_cap():
    rng = np.random.RandomState(10)
    n = 512
    obj = rng.randn(n, 3).astype(np.float32)
    img = rng.randn(n, 2).astype(np.float32)
    q = rng.randn(n).astype(np.float32)
    valid = rng.rand(n) < 0.3
    o, i, v, qq, nv, nk = pnp.compact_correspondences(obj, img, valid,
                                                      256, q)
    nvalid = int(valid.sum())
    assert int(nv) == nvalid and int(nk) == nvalid
    np.testing.assert_array_equal(np.asarray(o[:nvalid]), obj[valid])
    np.testing.assert_array_equal(np.asarray(i[:nvalid]), img[valid])
    np.testing.assert_array_equal(np.asarray(qq[:nvalid]), q[valid])
    assert int(np.asarray(v).sum()) == nvalid
    assert not np.asarray(v)[nvalid:].any()
    assert (np.asarray(o[nvalid:]) == 0).all()


def test_compact_correspondences_uniform_subsample_over_cap():
    rng = np.random.RandomState(11)
    n = 512
    obj = rng.randn(n, 3).astype(np.float32)
    img = rng.randn(n, 2).astype(np.float32)
    valid = rng.rand(n) < 0.9
    o, i, v, q, nv, nk = pnp.compact_correspondences(obj, img, valid, 128)
    assert q is None
    assert int(nk) in (127, 128)
    kept = np.asarray(o[:int(nk)])
    vi = np.flatnonzero(valid)
    pos = []
    for row in kept:
        m = np.where((obj[vi] == row).all(1))[0]
        assert len(m) >= 1
        pos.append(m[0])
    # order-preserving uniform subsample: increasing ranks, bounded gaps
    assert all(pos[k] < pos[k + 1] for k in range(len(pos) - 1))
    gaps = np.diff(pos)
    assert gaps.max() <= int(np.ceil(len(vi) / 128)) + 1


def test_compact_correspondences_zero_valid():
    n = 128
    o, i, v, q, nv, nk = pnp.compact_correspondences(
        np.zeros((n, 3), np.float32), np.zeros((n, 2), np.float32),
        np.zeros(n, bool), 64)
    assert int(nv) == 0 and int(nk) == 0 and not np.asarray(v).any()


def test_compacted_solve_matches_full(solver):
    rng = np.random.RandomState(12)
    obj, img, valid, R, t = synth(rng, noise=0.5)
    q = rng.randn(obj.shape[0]).astype(np.float32)
    co, ci, cv, cq, nv, nk = pnp.compact_correspondences(
        obj, img, valid, obj.shape[0] // 2, q)
    res = pnp.pnp_ransac(co, ci, cv, K, jax.random.PRNGKey(3), cq,
                         iters=32, select_stride=4)
    assert bool(res.ok)
    assert rot_err_deg(np.asarray(res.R), R) < 2.0
    assert float(np.linalg.norm(np.asarray(res.t) - t)) < 5.0
