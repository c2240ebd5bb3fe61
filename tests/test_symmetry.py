"""Continuous-symmetry canonicalization: physically-equivalent poses (same
object appearance) must map to one representative in the same equivalence
class."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from pix2pose_tpu.utils.symmetry import canonicalize_sym_pose


def rz(theta):
    return Rotation.from_euler("z", theta).as_matrix()


@pytest.mark.parametrize("seed", range(5))
def test_z_symmetric_equivalent_poses_canonicalize_identically(seed):
    rng = np.random.RandomState(seed)
    R = Rotation.random(random_state=rng).as_matrix()
    sym = [0, 0, 1]
    Rc0, _ = canonicalize_sym_pose(R, sym)
    for theta in rng.uniform(-np.pi, np.pi, 4):
        # model rotated about its own symmetry axis looks identical
        Req = R @ rz(theta)
        Rc, _ = canonicalize_sym_pose(Req, sym)
        np.testing.assert_allclose(Rc, Rc0, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_canonical_pose_is_in_equivalence_class(seed):
    rng = np.random.RandomState(seed)
    R = Rotation.random(random_state=rng).as_matrix()
    Rc, _ = canonicalize_sym_pose(R, [0, 0, 1])
    # Rc = R @ Rz(theta) for some theta  <=>  R^T Rc is a z-rotation
    D = R.T @ Rc
    np.testing.assert_allclose(D[2, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(D[:2, 2], 0.0, atol=1e-6)
    np.testing.assert_allclose(D[2, :2], 0.0, atol=1e-6)


def test_rotation_lock_when_axis_camera_parallel():
    # symmetry axis along camera z: identity pose
    _, lock = canonicalize_sym_pose(np.eye(3), [0, 0, 1])
    assert lock
    # axis perpendicular to camera z
    R = Rotation.from_euler("x", np.pi / 2).as_matrix()
    _, lock = canonicalize_sym_pose(R, [0, 0, 1])
    assert not lock


def test_no_symmetry_passthrough():
    R = Rotation.from_euler("xyz", [0.3, -0.2, 0.9]).as_matrix()
    Rc, lock = canonicalize_sym_pose(R, None)
    np.testing.assert_array_equal(Rc, R)
    assert not lock


def test_canonicalize_discrete_deterministic_and_consistent():
    from pix2pose_tpu.utils.symmetry import canonicalize_discrete
    from scipy.spatial.transform import Rotation

    z180 = np.diag([-1.0, -1.0, 1.0])
    pool = np.stack([np.eye(3), z180])
    rng = np.random.RandomState(0)
    for _ in range(50):
        R = Rotation.random(random_state=rng).as_matrix()
        Rc = canonicalize_discrete(R, pool)
        # representative of the same equivalence class
        assert (np.allclose(Rc, R) or np.allclose(Rc, R @ z180))
        # appearance-equivalent poses map to the SAME canonical frame
        Rc2 = canonicalize_discrete(R @ z180, pool)
        np.testing.assert_allclose(Rc, Rc2, atol=1e-12)
        # idempotent
        np.testing.assert_allclose(canonicalize_discrete(Rc, pool), Rc,
                                   atol=1e-12)


def test_canonicalize_discrete_identity_pool_noop():
    from pix2pose_tpu.utils.symmetry import canonicalize_discrete

    R = np.eye(3)
    out = canonicalize_discrete(R, np.eye(3)[None])
    np.testing.assert_array_equal(out, R)


def test_canonicalize_discrete_fourfold():
    from pix2pose_tpu.utils.symmetry import canonicalize_discrete
    from scipy.spatial.transform import Rotation

    pool = np.stack([Rotation.from_euler("z", a, degrees=True).as_matrix()
                     for a in (0, 90, 180, 270)])
    rng = np.random.RandomState(1)
    for _ in range(20):
        R = Rotation.random(random_state=rng).as_matrix()
        cans = [canonicalize_discrete(R @ T, pool) for T in pool]
        for c in cans[1:]:  # whole orbit -> one representative (fp-tol)
            np.testing.assert_allclose(c, cans[0], atol=1e-9)
