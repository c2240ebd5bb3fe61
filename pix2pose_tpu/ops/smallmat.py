"""Batched small-matrix kernels that avoid XLA's iterative factorizations.

TPU-first rationale: ``jnp.linalg.eigh``/``svd``/``solve`` on batched tiny
matrices lower to Jacobi/QR/pivoted-LU loops that serialize on TPU and
dominate the engine's pose stage (measured on v5e, one 8-image launch:
38.4k ``eigh(12x12)`` = 745 ms, 38.4k ``svd(3x3)`` = 187 ms, 115k
``solve(6x6)`` = 199 ms — versus 46 ms for ALL the generator convs). The
replacements here are fixed-iteration, fully-unrolled elementwise/matvec
programs: every op is a fused VPU kernel over the batch, no data-dependent
control flow, no pivoting.

Used by :mod:`pix2pose_tpu.ops.pnp` (DLT + Gauss-Newton) and
:mod:`pix2pose_tpu.ops.icp` (6x6 normal equations).
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve(A, b, damping: float = 0.0):
    """Solve SPD ``A x = b`` via unrolled batched Cholesky.

    A: (..., k, k) SPD (k static, intended k <= 16); b: (..., k).
    ``damping`` adds ``damping * mean(diag(A)) * I`` for rank safety.
    Singular/indefinite inputs produce garbage-but-finite solutions
    (diagonal is floored) — callers are RANSAC-style loops that score and
    reject, so no pivoting is needed.

    Fully unrolled: O(k^3/6) fused elementwise ops over the batch — no
    pivoted-LU serialization (the jnp.linalg.solve path this replaces).
    """
    k = A.shape[-1]
    if damping:
        tr = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1)
        A = A + (damping * tr + 1e-30)[..., None, None] * jnp.eye(k)
    L = [[None] * k for _ in range(k)]
    for i in range(k):
        for j in range(i + 1):
            s = A[..., i, j]
            for m in range(j):
                s = s - L[i][m] * L[j][m]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    # forward: L y = b
    y = [None] * k
    for i in range(k):
        s = b[..., i]
        for m in range(i):
            s = s - L[i][m] * y[m]
        y[i] = s / L[i][i]
    # backward: L^T x = y
    x = [None] * k
    for i in reversed(range(k)):
        s = y[i]
        for m in range(i + 1, k):
            s = s - L[m][i] * x[m]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def dlt_min_vec(ata, pin: int = 11, damping: float = 1e-7):
    """Approximate the smallest-eigenvalue vector of a DLT normal matrix.

    Replaces ``eigh(ata)[1][..., 0]`` with a PINNED affine solve: with the
    solution vector written p = [q; 1] (component ``pin`` fixed to 1),
    ``min_q [q;1]^T M [q;1]`` gives the 11x11 SPD system
    ``M11 q = -m12``, solved by :func:`chol_solve`.

    Pinning component 11 (= P[2,3], the z-translation of the projective
    pose in the normalized frame) is well-conditioned for PnP: visible
    objects have strictly positive depth, so that entry is never near
    zero relative to the rest of p. The affine solution differs from the
    total-least-squares eigenvector by O(residual), and every caller
    polishes with Gauss-Newton afterwards.

    ata: (..., 12, 12). Returns (..., 12), scale-normalized like an
    eigenvector (unit norm).
    """
    k = ata.shape[-1]
    rest = [i for i in range(k) if i != pin]
    M11 = ata[..., rest, :][..., :, rest]
    m12 = ata[..., rest, pin]
    q = chol_solve(M11, -m12, damping=damping)
    p = jnp.concatenate(
        [q[..., :pin], jnp.ones(q.shape[:-1] + (1,), q.dtype),
         q[..., pin:]], axis=-1)
    return p / jnp.maximum(
        jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-20)


def _quat_to_rot(q):
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3, 3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)
    return r


def nearest_rotation_scale(M, iters: int = 20):
    """Nearest proper rotation to M (Kabsch) + optimal scale.

    Returns (R, lam) with R = argmax_{R in SO(3)} tr(R^T M) and
    lam = tr(R^T M) / 3 (= mean(s * [1, 1, det]) of the SVD solution —
    the exact quantities ``_pose_from_p`` needs, without a 3x3 SVD).

    Method: the optimal R's quaternion is the largest eigenvector of
    Davenport's 4x4 K matrix; found by shifted power iteration run from
    all 4 basis starts simultaneously (a single start can be exactly
    orthogonal to the answer for 180-degree rotations), picking the
    Rayleigh-best. Degenerate M (rank <= 1, eigen-gap ~ 0) yields an
    arbitrary-but-valid rotation — callers are hypothesis loops whose
    scoring rejects those.

    M: (..., 3, 3).
    """
    m = lambda i, j: M[..., i, j]
    t = m(0, 0) + m(1, 1) + m(2, 2)
    K = jnp.stack([
        jnp.stack([t, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2),
                   m(0, 1) - m(1, 0)], -1),
        jnp.stack([m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2),
                   m(0, 1) + m(1, 0), m(2, 0) + m(0, 2)], -1),
        jnp.stack([m(2, 0) - m(0, 2), m(0, 1) + m(1, 0),
                   m(1, 1) - m(0, 0) - m(2, 2), m(1, 2) + m(2, 1)], -1),
        jnp.stack([m(0, 1) - m(1, 0), m(2, 0) + m(0, 2),
                   m(1, 2) + m(2, 1), m(2, 2) - m(0, 0) - m(1, 1)], -1),
    ], -2)  # (..., 4, 4), lam_max <-> optimal quaternion
    sig = 2.0 * jnp.sqrt(jnp.sum(M * M, axis=(-2, -1))) + 1e-12
    B = K + sig[..., None, None] * jnp.eye(4)
    # 4 simultaneous starts: (..., 4, 4) with starts on the LAST axis
    q = jnp.broadcast_to(jnp.eye(4), B.shape)
    for _ in range(iters):
        q = B @ q
        q = q / jnp.maximum(
            jnp.linalg.norm(q, axis=-2, keepdims=True), 1e-30)
    ray = jnp.sum(q * (K @ q), axis=-2)  # (..., 4) Rayleigh per start
    best = jnp.argmax(ray, axis=-1)
    q = jnp.take_along_axis(
        q, best[..., None, None].repeat(4, axis=-2), axis=-1)[..., 0]
    # _quat_to_rot's convention maximizes tr(R M) for this K; we want
    # tr(R^T M), i.e. the transpose (verified against SVD Kabsch)
    R = jnp.swapaxes(_quat_to_rot(q), -1, -2)
    lam = jnp.sum(R * M, axis=(-2, -1)) / 3.0
    return R, lam
