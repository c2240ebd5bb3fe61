"""On-device PnP-RANSAC.

Replaces the reference's per-candidate OpenCV call
(``cv2.solvePnPRansac(..., SOLVEPNP_EPNP, reprojectionError=5,
iterationsCount=100)``, ``pix2pose_model/recognition.py:216-223``) with a
fully vectorized, jittable solver:

- R minimal hypotheses are drawn at once (random blocks of one Gumbel
  permutation of the valid-correspondence mask — no rejection loops),
- each hypothesis is solved by DLT (pinned 11x11 solve of the 12x12 normal
  system — see :mod:`pix2pose_tpu.ops.smallmat` for why not ``eigh``) and
  decomposed to a rigid pose via a quaternion power iteration (not SVD),
- all hypotheses score all correspondences in one broadcast reprojection,
- the consensus set of the best hypothesis is refit with a masked DLT and
  polished by fixed-iteration Gauss-Newton on the pixel reprojection error.

Everything is shape-static: variable-size valid sets are boolean masks, so
the whole thing vmaps over stage-2 candidates and jits once (SURVEY.md §7
"PnP-RANSAC on device").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops import smallmat


class PnPResult(NamedTuple):
    R: jnp.ndarray  # (3, 3)
    t: jnp.ndarray  # (3,)
    n_inliers: jnp.ndarray  # () int32; -1 when invalid (reference semantics)
    inlier_mask: jnp.ndarray  # (N,) bool
    ok: jnp.ndarray  # () bool


def project(obj_pts, R, t, K):
    """Pinhole projection of (N, 3) model points to (N, 2) pixels."""
    p = obj_pts @ R.T + t
    z = p[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xy = p[..., :2] / z
    u = K[0, 0] * xy[..., 0] + K[0, 1] * xy[..., 1] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def _normalized_cam(img_pts, K):
    """Pixel -> normalized camera coordinates via K^-1 (no skew assumed
    beyond K[0,1])."""
    v = (img_pts[..., 1] - K[1, 2]) / K[1, 1]
    u = (img_pts[..., 0] - K[0, 2] - K[0, 1] * v) / K[0, 0]
    return jnp.stack([u, v], axis=-1)


def _dlt_normal_matrix(obj_n, cam_n, w):
    """Accumulate the 12x12 normal matrix sum_i w_i (a1 a1^T + a2 a2^T) of
    the DLT system without materializing A. obj_n: (N,3) normalized object
    points, cam_n: (N,2) normalized camera coords, w: (N,) weights."""
    n = obj_n.shape[0]
    xh = jnp.concatenate([obj_n, jnp.ones((n, 1), obj_n.dtype)], axis=-1)
    zeros = jnp.zeros_like(xh)
    # row for u: [X 0 -u*X]; row for v: [0 X -v*X]
    a1 = jnp.concatenate([xh, zeros, -cam_n[:, :1] * xh], axis=-1)  # (N,12)
    a2 = jnp.concatenate([zeros, xh, -cam_n[:, 1:2] * xh], axis=-1)
    w = w[:, None]
    return (a1 * w).T @ a1 + (a2 * w).T @ a2  # (12, 12)


def _pose_from_p(p_vec, obj_mean, obj_scale, sample_pts, K):
    """Decompose a DLT solution vector into a rigid pose in original
    (unnormalized) object coordinates."""
    P = p_vec.reshape(3, 4)
    # fix projective sign via cheirality of the sample points
    z = sample_pts @ P[2, :3] + P[2, 3]
    P = P * jnp.where(jnp.sum(z) < 0, -1.0, 1.0)
    M = P[:, :3]
    # nearest proper rotation + optimal scale WITHOUT a 3x3 SVD (XLA's
    # batched svd serializes on TPU: 187 ms for one engine launch's worth;
    # see ops/smallmat.py). Returns exactly (u diag(1,1,det) vt,
    # mean(s*[1,1,det])) of the SVD formulation.
    R, lam = smallmat.nearest_rotation_scale(M)
    lam = jnp.where(jnp.abs(lam) < 1e-9, 1e-9, lam)
    t_n = P[:, 3] / lam
    # undo object normalization x' = (x - mean)/scale:
    # X_cam ∝ R x' + t_n  ->  true t = scale * t_n - R mean ... up to the
    # global positive scale `scale` which projection ignores.
    t = obj_scale * t_n - R @ obj_mean
    return R, t


def _gauss_newton_refine(R, t, obj_pts, img_pts, w, K, iters: int = 8,
                         damping: float = 1e-6, huber_px: float = 2.0):
    """Fixed-iteration damped Gauss-Newton on pixel reprojection error,
    parametrized by se(3)-style increments (omega, dt) with R <- exp(w)R.

    Residuals beyond ``huber_px`` get Huber-downweighted (IRLS), which
    suppresses the blur-corrupted silhouette correspondences that sit just
    inside the RANSAC inlier band."""

    def rodrigues(omega):
        th = jnp.linalg.norm(omega) + 1e-12
        k = omega / th
        kx = jnp.array([[0, -k[2], k[1]], [k[2], 0, -k[0]],
                        [-k[1], k[0], 0]])
        return (jnp.eye(3) + jnp.sin(th) * kx
                + (1 - jnp.cos(th)) * (kx @ kx))

    fx, fy, skew = K[0, 0], K[1, 1], K[0, 1]

    def step(carry, _):
        R, t = carry
        p = obj_pts @ R.T + t  # (N,3) camera points
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        inv_z = 1.0 / z
        x, y = p[:, 0], p[:, 1]
        # residuals (N,2)
        u = fx * x * inv_z + skew * y * inv_z + K[0, 2]
        v = fy * y * inv_z + K[1, 2]
        r = jnp.stack([u, v], -1) - img_pts
        # d(uv)/d(p): (N,2,3)
        duv_dp = jnp.stack([
            jnp.stack([fx * inv_z, skew * inv_z,
                       -(fx * x + skew * y) * inv_z ** 2], -1),
            jnp.stack([jnp.zeros_like(x), fy * inv_z,
                       -fy * y * inv_z ** 2], -1),
        ], 1)
        # left perturbation: p(w) = exp(w) p ≈ p + w x p, so
        # dp/d(omega) = -[p]_x and the chain rule gives
        # J_w = duv_dp @ (-[p]_x) = cross(p, duv_dp) row-wise — computed
        # as a cross product: the (N,2,3)@(N,3,3) einsum this replaces
        # lowered to tiny batched matmuls that cost ~12.5 ms PER GN
        # ITERATION at N=4096 on v5e (13 iterations dominated the whole
        # consensus stage)
        J_w = jnp.cross(jnp.broadcast_to(p[:, None, :], duv_dp.shape),
                        duv_dp)
        J = jnp.concatenate([J_w, duv_dp], axis=-1)  # (N,2,6)
        r_norm = jnp.linalg.norm(r, axis=-1)
        huber = jnp.minimum(1.0, huber_px / jnp.maximum(r_norm, 1e-9))
        sw = jnp.sqrt(jnp.maximum(w * huber, 0.0))[:, None]
        # one real GEMM for the whole normal system: G = [sqrt(w) J |
        # sqrt(w) r] flattened over residual rows; G^T G packs JtJ, Jtr
        # (and r^T r, unused) — MXU-shaped (7, 2N) x (2N, 7) instead of
        # weighted-einsum reductions
        G = jnp.concatenate([J, r[..., None]], axis=-1)  # (N,2,7)
        G = (G * sw[..., None]).reshape(-1, 7)
        M = jax.lax.dot_general(G, G, (((0,), (0,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        JtJ, Jtr = M[:6, :6], M[:6, 6]
        delta = smallmat.chol_solve(JtJ + damping * jnp.eye(6), -Jtr)
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        R_new = rodrigues(delta[:3]) @ R
        t_new = t + delta[3:]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    return R, t


def _sample_minimal_sets(key, valid, n_hyp: int, k: int = 6,
                         quality=None, quality_pow: float = 2.0):
    """(n_hyp, k) index sets drawn from the valid mask.

    ONE random permutation ranks the valid points first (Gumbel keys +
    argsort); each hypothesis then takes a k-long block of that
    permutation at a random offset modulo the valid count. Within a set,
    indices are distinct whenever >= k points are valid (blocks of a
    permutation); with fewer, indices wrap onto the valid subset — the
    same degraded-to-valid-subset semantics the validity weights expect.

    Replaces per-hypothesis Gumbel top-k: lax.top_k over an
    (n_hyp, 4096) score matrix per candidate cost 93 ms of an engine
    launch on TPU (one argsort per CANDIDATE amortizes over its ~100
    hypotheses). Block-sampling from one permutation correlates
    hypothesis sets slightly (adjacent points co-occur), which RANSAC is
    insensitive to — consensus scoring sees every hypothesis against ALL
    points regardless.

    ``quality`` (optional, (N,), higher = more trustworthy) switches to
    PROSAC-style progressive sampling: the permutation becomes a
    quality ordering (Gumbel noise only breaks ties) and block offsets
    concentrate on the top of the ranking (off = n_valid * u^quality_pow
    with u ~ U[0,1]), so most minimal sets are drawn from the most
    trustworthy correspondences while the tail still gets occasional
    coverage. Consensus scoring is unchanged (every hypothesis is still
    scored against ALL points), so this only changes WHERE hypotheses
    come from — the knob that lets a trained-confidence pipeline match
    100 random hypotheses with far fewer.
    """
    n = valid.shape[0]
    kp, kc = jax.random.split(key)
    g = jax.random.gumbel(kp, (n,))
    if quality is not None:
        # scale quality to dominate the Gumbel tie-break noise
        q = jnp.asarray(quality, jnp.float32)
        qmax = jnp.max(jnp.where(valid, q, -jnp.inf))
        qmin = jnp.min(jnp.where(valid, q, jnp.inf))
        spread = jnp.maximum(qmax - qmin, 1e-6)
        g = q * (64.0 / spread) + g
    order = jnp.argsort(
        jnp.where(valid, g, -jnp.inf), descending=True)  # valid first
    n_valid = jnp.maximum(jnp.sum(valid).astype(jnp.int32), 1)
    if quality is not None:
        u = jax.random.uniform(kc, (n_hyp, 1))
        off = (u ** quality_pow * n_valid.astype(jnp.float32)) \
            .astype(jnp.int32)
    else:
        off = jax.random.randint(kc, (n_hyp, 1), 0, n_valid)
    pos = (off + jnp.arange(k, dtype=jnp.int32)[None, :]) % n_valid
    return order[pos]


def compact_correspondences(obj_pts, img_pts, valid, k_max: int,
                            quality=None):
    """Compact valid correspondences into a fixed ``(k_max,)`` layout.

    When ``n_valid <= k_max`` every valid point is kept (semantics
    identical to the uncompacted call, just densely packed); otherwise an
    ORDER-PRESERVING uniform subsample of ~``k_max`` points is taken
    (every ``n_valid/k_max``-th valid point), so the spatial distribution
    of the grid correspondences is preserved — no quality/confidence bias
    that could skew the RANSAC consensus band.

    Motivation (measured 2026-08-20): the engine feeds PnP the full
    stride-2 crop grid (4096 points/candidate) of which typically only
    1-2k are valid; every PnP stage (sampling argsort, selection-scoring
    scan, 13 consensus-GN iterations) pays HBM traffic proportional to
    the PADDED length. Compacting to k_max scales all of it down.

    Returns ``(obj_k, img_k, valid_k, quality_k, n_valid, n_kept)``;
    ``n_valid / max(n_kept, 1)`` is the factor that rescales subsampled
    inlier counts back to full-grid units.
    """
    n = valid.shape[0]
    valid = jnp.asarray(valid, bool)
    cum = jnp.cumsum(valid.astype(jnp.int32))
    n_valid = cum[-1]
    scale = jnp.minimum(
        1.0, k_max / jnp.maximum(n_valid.astype(jnp.float32), 1.0))
    tgt = jnp.floor(cum.astype(jnp.float32) * scale + 1e-4) \
        .astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), tgt[:-1]])
    keep = valid & (tgt > prev)
    n_kept = jnp.sum(keep.astype(jnp.int32))
    # pack kept points first, original order preserved: one argsort on a
    # keep-majorized key. NOT jnp.searchsorted — its TPU lowering ran the
    # whole engine launch 95.9 -> 237.6 ms (measured 2026-08-20); a
    # 4096-wide argsort is the same primitive the hypothesis sampler
    # already uses at ~6 ms/launch total.
    ar = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.argsort(jnp.where(keep, ar, n + ar))[:k_max]
    valid_k = jnp.arange(k_max) < n_kept
    obj_k = jnp.where(valid_k[:, None], jnp.asarray(obj_pts)[idx], 0.0)
    img_k = jnp.where(valid_k[:, None], jnp.asarray(img_pts)[idx], 0.0)
    q_k = (None if quality is None
           else jnp.where(valid_k, jnp.asarray(quality)[idx], 0.0))
    return obj_k, img_k, valid_k, q_k, n_valid, n_kept


def pnp_ransac(obj_pts, img_pts, valid, K, key, quality=None, *,
               iters: int = 100,
               reproj_px: float = 5.0, min_pts: int = 6,
               refine_iters: int = 8, sample_k: int = 6,
               sample_k_big: int = 12, hyp_polish_iters: int = 3,
               select_stride: int | None = None) -> PnPResult:
    """RANSAC EPnP-equivalent pose from masked 2D-3D correspondences.

    Args:
      obj_pts: (N, 3) model coordinates (mm).
      img_pts: (N, 2) pixel coordinates (u, v).
      valid: (N,) bool correspondence mask.
      K: (3, 3) intrinsics.
      key: PRNG key.
      quality: optional (N,) per-correspondence trust score (higher =
        better; e.g. the negated predicted-error map). Enables
        PROSAC-style progressive sampling (see
        :func:`_sample_minimal_sets`) — with a trained confidence source
        ``iters`` can drop well below 100 at equal accuracy.
      iters: number of RANSAC hypotheses (reference iterationsCount=100).
      reproj_px: inlier threshold in pixels (reference reprojectionError=5).
      min_pts: minimum valid correspondences (reference ``recognition.py:214``).

    Returns:
      :class:`PnPResult`; ``ok=False`` (with identity pose, n_inliers=-1)
      when fewer than ``min_pts`` valid points — the reference's bail-out
      contract.
    """
    obj_pts = jnp.asarray(obj_pts, jnp.float32)
    img_pts = jnp.asarray(img_pts, jnp.float32)
    valid = jnp.asarray(valid, bool)
    K = jnp.asarray(K, jnp.float32)
    n = obj_pts.shape[0]
    wf = valid.astype(jnp.float32)
    n_valid = jnp.sum(wf)

    # normalize object coordinates for DLT conditioning
    obj_mean = jnp.sum(obj_pts * wf[:, None], 0) / jnp.maximum(n_valid, 1.0)
    centered = (obj_pts - obj_mean) * wf[:, None]
    obj_scale = jnp.sqrt(
        jnp.sum(centered ** 2) / jnp.maximum(n_valid * 3.0, 1.0))
    obj_scale = jnp.maximum(obj_scale, 1e-6)
    obj_n = (obj_pts - obj_mean) / obj_scale
    cam_n = _normalized_cam(img_pts, K)

    # --- hypothesis generation -------------------------------------------
    # Two sample-size populations cover complementary failure regimes:
    # minimal k=6 sets maximize the all-inlier sample probability under
    # heavy outlier contamination, while redundant k=12 sets average down
    # pixel noise a 6-point fit would interpolate verbatim. Samples are
    # weighted by validity so sets drawn from < k valid points degrade to
    # the valid subset instead of ingesting garbage. Each hypothesis is
    # then POLISHED with a few Gauss-Newton steps on its own sample (the
    # DLT's projective relaxation is noise-sensitive; the calibrated ML
    # fit is what OpenCV's EPnP control-point parametrization gives
    # natively) — and scored BOTH raw and polished, keeping the better,
    # so a diverging polish can never cost a hypothesis its consensus.
    # NOTE (measured dead end, 2026-08-17): merging the two populations
    # into one padded-k batch (k_big points everywhere, zero weights on
    # the minimal population's tail) to halve subgraph count REGRESSED
    # the engine launch 154.5 -> 171.4 ms — the doubled per-point work
    # for the minimal half outweighs any kernel-count savings. Keep the
    # two per-k calls.
    def hypotheses(key_h, n_hyp, k):
        idx = _sample_minimal_sets(key_h, valid, n_hyp, k=k,
                                   quality=quality)  # (R, k)
        h_obj = obj_n[idx]  # (R, k, 3)
        h_cam = cam_n[idx]  # (R, k, 2)
        h_w = valid[idx].astype(jnp.float32)
        ata = jax.vmap(_dlt_normal_matrix)(h_obj, h_cam, h_w)
        ata = jnp.where(jnp.isfinite(ata), ata, 0.0)
        # pinned-DLT solve instead of eigh: XLA's batched Jacobi eigh on
        # 12x12 was the single most expensive op of the whole engine
        # (745 ms/launch on v5e — more than all the convs; smallmat.py)
        p_min = smallmat.dlt_min_vec(ata)  # (R, 12)
        Rs, ts = jax.vmap(
            lambda p, sp: _pose_from_p(p, obj_mean, obj_scale, sp, K)
        )(p_min, h_obj)
        if hyp_polish_iters <= 0:
            return Rs, ts
        Rs_p, ts_p = jax.vmap(
            lambda R0, t0, o, im, w: _gauss_newton_refine(
                R0, t0, o, im, w, K, iters=hyp_polish_iters,
                huber_px=reproj_px)
        )(Rs, ts, obj_pts[idx], img_pts[idx], h_w)
        return (jnp.concatenate([Rs, Rs_p]),
                jnp.concatenate([ts, ts_p]))

    key_a, key_b = jax.random.split(key)
    n_min = iters // 2
    Rs_a, ts_a = hypotheses(key_a, n_min, sample_k)
    Rs_b, ts_b = hypotheses(key_b, iters - n_min, sample_k_big)
    Rs = jnp.concatenate([Rs_a, Rs_b])
    ts = jnp.concatenate([ts_a, ts_b])

    # --- scoring ----------------------------------------------------------
    # Chunked scan with an online best-hypothesis carry: broadcasting all
    # 2R hypotheses against all N points at once materializes an
    # (candidates, 2R, N, 3) reprojection temp — 14 GB for a 32-image
    # engine batch (measured XLA OOM) and pure HBM-bandwidth waste even
    # when it fits. Scoring flops are negligible, so a scan over
    # hypothesis chunks costs nothing and keeps the temp at
    # (candidates, CH, N, 3). Selection semantics are identical to the
    # global argmax (first maximum wins across and within chunks).
    finite = jnp.all(jnp.isfinite(Rs), axis=(1, 2)) & jnp.all(
        jnp.isfinite(ts), axis=1)
    # hypothesis SELECTION scores on a strided point subset (the full set
    # still defines the consensus mask below): selection among ~200
    # hypotheses needs only relative inlier counts, and halving the
    # points halves the dominant HBM traffic of the scoring scan
    ss = (select_stride if select_stride is not None
          else (2 if obj_pts.shape[0] >= 1024 else 1))
    obj_s, img_s, val_s = obj_pts[::ss], img_pts[::ss], valid[::ss]
    ch = 25
    n_hyp = Rs.shape[0]
    pad = (-n_hyp) % ch
    if pad:
        Rs_s = jnp.concatenate(
            [Rs, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))])
        ts_s = jnp.concatenate([ts, jnp.zeros((pad, 3))])
        fin_s = jnp.concatenate([finite, jnp.zeros(pad, bool)])
    else:
        Rs_s, ts_s, fin_s = Rs, ts, finite
    n_ch = Rs_s.shape[0] // ch

    def score_chunk(carry, rt):
        Rs_c, ts_c, fin_c = rt
        proj = jax.vmap(lambda R, t: project(obj_s, R, t, K))(Rs_c, ts_c)
        err = jnp.linalg.norm(proj - img_s[None], axis=-1)  # (ch, N/ss)
        depth = jnp.einsum("rj,nj->rn", Rs_c[:, 2, :], obj_s) \
            + ts_c[:, 2:3]
        inl = (err < reproj_px) & val_s[None, :] & (depth > 0)
        sc = jnp.where(fin_c, jnp.sum(inl, axis=1), -1)
        b = jnp.argmax(sc)
        c_sc, c_R, c_t = carry
        better = sc[b] > c_sc
        return (jnp.where(better, sc[b], c_sc),
                jnp.where(better, Rs_c[b], c_R),
                jnp.where(better, ts_c[b], c_t)), None

    (best_score, best_R, best_t), _ = jax.lax.scan(
        score_chunk,
        (jnp.int32(-2), jnp.eye(3, dtype=jnp.float32),
         jnp.zeros(3, jnp.float32)),
        (Rs_s.reshape(n_ch, ch, 3, 3), ts_s.reshape(n_ch, ch, 3),
         fin_s.reshape(n_ch, ch)))
    # consensus set of the winning hypothesis (one projection)
    err_b = jnp.linalg.norm(project(obj_pts, best_R, best_t, K) - img_pts,
                            axis=-1)
    depth_b = obj_pts @ best_R[2] + best_t[2]
    best_inl = (err_b < reproj_px) & valid & (depth_b > 0)

    # --- refit on consensus ----------------------------------------------
    # The hypothesis stage above (mixed-k + per-sample polish) is where
    # robustness lives; this consensus chain deliberately stays the
    # tight-Huber refit->polish->tighten pipeline validated end-to-end on
    # trained-generator correspondences (grid points are sub-pixel with a
    # thin blur-corrupted silhouette fringe: a wide Huber band or a
    # truncated-cost acceptance rule measurably biases DEPTH there —
    # an MSAC-selected variant cost 0.5 AR on the synthetic-cube e2e).
    w_in = best_inl.astype(jnp.float32)
    n_in = jnp.sum(w_in)
    enough = n_in >= min_pts
    w_fit = jnp.where(enough, w_in, wf)  # degenerate fallback: all valid
    ata_all = _dlt_normal_matrix(obj_n, cam_n, w_fit)
    ata_all = jnp.where(jnp.isfinite(ata_all), ata_all, 0.0)
    p_all = smallmat.dlt_min_vec(ata_all)  # pinned solve, not eigh
    R_fit, t_fit = _pose_from_p(p_all, obj_mean, obj_scale,
                                obj_n * w_fit[:, None], K)
    fit_ok = jnp.all(jnp.isfinite(R_fit)) & jnp.all(jnp.isfinite(t_fit))
    R_fit = jnp.where(fit_ok, R_fit, best_R)
    t_fit = jnp.where(fit_ok, t_fit, best_t)
    R_ref, t_ref = _gauss_newton_refine(R_fit, t_fit, obj_pts, img_pts,
                                        w_fit, K, iters=refine_iters)
    ref_ok = jnp.all(jnp.isfinite(R_ref)) & jnp.all(jnp.isfinite(t_ref))
    R_ref = jnp.where(ref_ok, R_ref, R_fit)
    t_ref = jnp.where(ref_ok, t_ref, t_fit)

    # progressive tightening: re-select the consensus at half the band and
    # polish again — kills the wide-band scale drift that 5px tolerates on
    # small objects (boundary pixels stay within 5px for quite-wrong depth)
    err_t = jnp.linalg.norm(project(obj_pts, R_ref, t_ref, K) - img_pts,
                            axis=-1)
    w_tight = ((err_t < 0.5 * reproj_px) & valid).astype(jnp.float32)
    tight_ok = jnp.sum(w_tight) >= min_pts
    w2 = jnp.where(tight_ok, w_tight, w_fit)
    R_t2, t_t2 = _gauss_newton_refine(R_ref, t_ref, obj_pts, img_pts, w2,
                                      K, iters=refine_iters // 2 + 1)
    good2 = jnp.all(jnp.isfinite(R_t2)) & jnp.all(jnp.isfinite(t_t2))
    R_ref = jnp.where(good2, R_t2, R_ref)
    t_ref = jnp.where(good2, t_t2, t_ref)

    # recount inliers with the refined pose (matches OpenCV's returned set)
    err_f = jnp.linalg.norm(project(obj_pts, R_ref, t_ref, K) - img_pts,
                            axis=-1)
    depth_f = obj_pts @ R_ref[2] + t_ref[2]
    inl_f = (err_f < reproj_px) & valid & (depth_f > 0)

    ok = (n_valid >= min_pts) & (best_score > 0)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    return PnPResult(
        R=jnp.where(ok, R_ref, eye),
        t=jnp.where(ok, t_ref, zero),
        n_inliers=jnp.where(ok, jnp.sum(inl_f), -1).astype(jnp.int32),
        inlier_mask=inl_f & ok,
        ok=ok,
    )


def pnp_ransac_batch(obj_pts, img_pts, valid, K, keys, quality=None,
                     **kwargs):
    """Batched over candidates: obj/img/valid/key (and optional
    per-candidate ``quality``) batched, K shared. ``kwargs`` forward to
    :func:`pnp_ransac` (static solver knobs — e.g. the engine passes
    ``EstimatorConfig.ransac_iters`` / ``ransac_reproj_px`` /
    ``min_pnp_px`` here)."""
    fn = functools.partial(pnp_ransac, **kwargs)
    return jax.vmap(fn, in_axes=(0, 0, 0, None, 0,
                                 None if quality is None else 0),
                    out_axes=0)(obj_pts, img_pts, valid, K, keys, quality)
