"""Per-hypothesis depth refinement + depth-consistency scoring.

Device-side core of the RGB-D evaluator (reference
``tools/5_evaluation_bop_icp3d.py:41-94,314-315,477-491``): render the mesh
at the hypothesis pose, lift rendered+sensor depth to clouds, centroid
pre-alignment, point-to-plane ICP (replacing ``cv2.ppf_match_3d_ICP``),
re-render, and score by per-pixel depth agreement
``score = sum(max(0, 0.02 - |dz|)) / 0.02`` over the detection mask.

Two entry points:

- :func:`make_icp_refiner` — one jitted program per object mesh, one
  hypothesis per launch (mirrors the reference's serial loop).
- :func:`make_batch_icp_refiner` — meshes stacked on an object axis
  (:func:`stack_meshes`) and the refine body vmapped over hypotheses with a
  per-hypothesis object index; ALL hypotheses of an image run in one
  launch. The reference instead refines one hypothesis at a time
  (``5_evaluation_bop_icp3d.py:58-94`` called per ROI x candidate).

Clouds are fixed-size masked samples so everything vmaps/jits with static
shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops import geometry, icp, rasterizer


class RefineOut(NamedTuple):
    R: jnp.ndarray        # (3,3) refined rotation
    t_mm: jnp.ndarray     # (3,) refined translation, mm
    score: jnp.ndarray    # () depth-consistency fcn (unweighted by det)
    ratio: jnp.ndarray    # () inlier-pixel fraction of the union mask
    inlier_mask: jnp.ndarray  # (H,W) bool, |dz| < 0.02 within union
    ok: jnp.ndarray       # () bool
    # () int32: dropped rasterizer work pairs across this hypothesis'
    # renders (see RenderOut.overflow) — 0 means renders were exact
    overflow: jnp.ndarray | int = 0


def _sample_masked(key, mask_flat, n_sample):
    """Indices of up to n_sample true entries, evenly strided through the
    mask (stratified; cumsum + searchsorted). Deterministic and cheap —
    a full-image top_k here crashes the TPU XLA compiler under vmap and
    costs a 307k-key sort; ``key`` is kept for API stability."""
    del key
    cnt = jnp.cumsum(mask_flat.astype(jnp.int32))
    total = cnt[-1]
    ranks = (jnp.arange(n_sample, dtype=jnp.int32) * total) // jnp.maximum(
        jnp.int32(n_sample), 1) + 1
    idx = jnp.searchsorted(cnt, ranks)
    idx = jnp.clip(idx, 0, mask_flat.shape[0] - 1)
    valid = jnp.take(mask_flat, idx)
    # duplicates appear when total < n_sample: keep first occurrences only
    first = jnp.concatenate(
        [jnp.ones((1,), bool), idx[1:] != idx[:-1]])
    return idx, valid & first


def _masked_median3(pts, valid):
    """Per-axis median of (N,3) points over a validity mask."""
    return jax.vmap(lambda x: icp._masked_quantile(x, valid, 0.5),
                    in_axes=1)(pts)


def _refine_body(verts_m, faces, im_h, im_w, n_src, n_tgt, icp_iters,
                 icp_rounds, R, t_mm, cam_k, union_mask, depth_m, tgt_pts,
                 tgt_normals, key):
    """Single-hypothesis refine+score; see module docstring for citations.

    Args:
      verts_m: (V,3) mesh vertices in meters. faces: (F,3), -1 = padding.
      R, t_mm: initial pose (mm).
      cam_k: (3,3).
      union_mask: (H,W) bool — detection mask ∧ valid depth
        (``icp3d:455-456``).
      depth_m: (H,W) sensor depth in meters.
      tgt_pts/tgt_normals: (H,W,3) precomputed sensor cloud + normals
        (meters; ``icp3d:372-374``).
    """
    # f32 matmuls throughout: the vertex transforms inside render_mesh and
    # the pose compositions below put mm-scale error on 0.5 m coordinates
    # at the TPU's default bf16 MXU precision — fatal for a refiner whose
    # job is sub-mm. All matmuls here are (N,3)x(3,3) or smaller, so this
    # costs nothing. (The ICP core sets the same precision internally.)
    with jax.default_matmul_precision("highest"):
        return _refine_body_inner(verts_m, faces, im_h, im_w, n_src,
                                  n_tgt, icp_iters, icp_rounds, R, t_mm,
                                  cam_k, union_mask, depth_m, tgt_pts,
                                  tgt_normals, key)


def _refine_body_inner(verts_m, faces, im_h, im_w, n_src, n_tgt, icp_iters,
                       icp_rounds, R, t_mm, cam_k, union_mask, depth_m,
                       tgt_pts, tgt_normals, key):
    k1, k2 = jax.random.split(key)
    tgt_flat = tgt_pts.reshape(-1, 3)
    um_flat = union_mask.reshape(-1)

    # target cloud sample (taken up front: the robust centroid below is
    # computed over the fixed-size sample, not the full image, so the
    # per-axis medians sort 4k points instead of H*W)
    tidx, tvalid = _sample_masked(k2, um_flat & (
        depth_m.reshape(-1) > 0), n_tgt)
    tgt = jnp.take(tgt_flat, tidx, axis=0)
    tgt_n = jnp.take(tgt_normals.reshape(-1, 3), tidx, axis=0)

    # ROBUST target centroid: per-axis median. Mask pixels landing on
    # background/neighbor depth (the common real-scene failure the
    # rejectionScale exists for) shift a MEAN centroid by tens of mm —
    # measured: 30% gross outliers in [0.3, 1.2] m moved the mean-based
    # prealignment ~75 mm along z, which then dominated the final error.
    centroid_tgt = _masked_median3(tgt, tvalid)
    bad_t = (t_mm[2] < 300.0) | (t_mm[2] > 5000.0)
    t_mm = jnp.where(bad_t, centroid_tgt * 1000.0, t_mm)

    # Refine rounds: render at the current pose -> sample source cloud ->
    # ICP -> compose, REPEATED. The source cloud is only valid for the
    # pose it was rendered at — from a 10-20 mm-off init it contains face
    # regions not visible in the sensor view, and those points lock onto
    # adjacent target geometry, stalling a single ICP pass 4-8 mm off
    # even on clean data (measured). Re-rendering at the round-1 pose
    # shrinks that visibility mismatch to near zero. (The reference
    # renders once, ``icp3d:64-68``; the extra rounds only tighten
    # convergence.) Centroid pre-alignment (``icp3d:82-86``) runs in
    # round 0 only — later rounds start in-basin.
    enough = jnp.asarray(True)
    overflow = jnp.int32(0)
    R_in, t_in_mm = R, t_mm
    depth_at_input = None
    for rnd in range(icp_rounds):
        rout = rasterizer.render_mesh(
            verts_m, faces, jnp.zeros((verts_m.shape[0], 1)), R,
            t_mm / 1000.0, cam_k, im_h, im_w)
        overflow = overflow + jnp.int32(rout.overflow)
        rmask = rout.mask & union_mask
        if rnd == 0:
            enough = jnp.sum(rmask) >= 10  # ``icp3d:73-76``
            depth_at_input = rout.depth  # for the score guard below

        src_flat = geometry.backproject(rout.depth, cam_k).reshape(-1, 3)
        sidx, svalid = _sample_masked(k1, rmask.reshape(-1), n_src)
        src = jnp.take(src_flat, sidx, axis=0)

        if rnd == 0:
            # median-for-median so the two sides estimate the same
            # statistic of the visible surface
            centroid_src = _masked_median3(src, svalid)
            shift = centroid_tgt - centroid_src
            src = src + shift
            t_mm = t_mm + shift * 1000.0

        res = icp.icp_point_to_plane(src, tgt, tgt_n, src_valid=svalid,
                                     tgt_valid=tvalid, iters=icp_iters)
        # compose: x_tgt = dR (R x + t) + dt (``icp3d:91-93``)
        use = res.ok & enough
        R = jnp.where(use, res.R @ R, R)
        t_mm = jnp.where(use,
                         (res.R @ (t_mm / 1000.0) + res.t) * 1000.0, t_mm)
    R_ref, t_ref_mm = R, t_mm

    # re-render + depth-consistency score (``icp3d:471-491``)
    rout_ref = rasterizer.render_mesh(
        verts_m, faces, jnp.zeros((verts_m.shape[0], 1)), R_ref,
        t_ref_mm / 1000.0, cam_k, im_h, im_w)
    in_union = union_mask & (depth_m > 0)

    def score_depth(depth_ref):
        dz = jnp.abs(depth_ref - depth_m)
        inlier = in_union & (dz < 0.02) & (depth_ref > 0)
        fcn = jnp.sum(
            jnp.where(in_union, jnp.maximum(0.0, 0.02 - dz), 0.0)) / 0.02
        ratio = jnp.sum(inlier) / jnp.maximum(jnp.sum(in_union), 1)
        return fcn, ratio, inlier

    fcn, ratio, inlier = score_depth(rout_ref.depth)
    # Score guard: never return a pose scoring worse than the input pose
    # (its render is the round-0 render, pre-prealignment). ICP outside
    # its convergence basin can wander arbitrarily far (measured: a
    # 63 mm-off init diverged to 1.4 m on one seed); the guard clamps
    # such failures to "no improvement" at zero extra renders. The
    # reference has no equivalent — its ICP output is used
    # unconditionally — so this only ever helps.
    fcn0, ratio0, inlier0 = score_depth(depth_at_input)
    revert = fcn0 > fcn
    return RefineOut(
        R=jnp.where(revert, R_in, R_ref),
        t_mm=jnp.where(revert, t_in_mm, t_ref_mm),
        score=jnp.where(revert, fcn0, fcn),
        ratio=jnp.where(revert, ratio0, ratio),
        inlier_mask=jnp.where(revert, inlier0, inlier),
        ok=use & enough,
        overflow=overflow + jnp.int32(rout_ref.overflow))


def make_icp_refiner(verts_m, faces, im_h: int, im_w: int,
                     n_src: int = 1024, n_tgt: int = 4096,
                     icp_iters: int = 30, icp_rounds: int = 2):
    """Build the jitted refine+score function for one object mesh
    (vertices in meters)."""
    verts_m = jnp.asarray(verts_m, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    @functools.partial(jax.jit)
    def refine(R, t_mm, cam_k, union_mask, depth_m, tgt_pts, tgt_normals,
               key):
        return _refine_body(verts_m, faces, im_h, im_w, n_src, n_tgt,
                            icp_iters, icp_rounds, R, t_mm, cam_k,
                            union_mask, depth_m, tgt_pts, tgt_normals, key)

    return refine


def stack_meshes(meshes_m: Sequence[tuple], max_faces: int | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Pad and stack [(verts_m (V,3), faces (F,3)), ...] to
    ((O,Vmax,3), (O,Fmax,3)); face padding is -1 (the rasterizer's
    padding convention), vertex padding is zeros.

    ``max_faces``: optionally cluster-decimate dense meshes first
    (:func:`pix2pose_tpu.data.meshes.decimate_mesh`) — the render cost
    inside the refiner scales with the stacked face count, and every
    hypothesis pays for the LARGEST mesh in the bank.
    """
    if max_faces is not None:
        from pix2pose_tpu.data.meshes import decimate_mesh
        meshes_m = [decimate_mesh(v, f, max_faces) for v, f in meshes_m]
    v_max = max(np.asarray(v).shape[0] for v, _ in meshes_m)
    f_max = max(np.asarray(f).shape[0] for _, f in meshes_m)
    verts = np.zeros((len(meshes_m), v_max, 3), np.float32)
    faces = np.full((len(meshes_m), f_max, 3), -1, np.int32)
    for o, (v, f) in enumerate(meshes_m):
        v = np.asarray(v, np.float32)
        f = np.asarray(f, np.int32)
        verts[o, :v.shape[0]] = v
        faces[o, :f.shape[0]] = f
    return verts, faces


def make_batch_icp_refiner(stacked_verts_m, stacked_faces, im_h: int,
                           im_w: int, n_src: int = 1024, n_tgt: int = 4096,
                           icp_iters: int = 30, icp_rounds: int = 2):
    """Build a jitted refine+score over a BATCH of hypotheses with
    per-hypothesis object meshes (gathered from the stacked bank).

    Returns ``refine_batch(obj_idx (B,), R (B,3,3), t_mm (B,3), cam_k,
    union_masks (B,H,W), depth_m, tgt_pts, tgt_normals, keys (B,2))`` —
    the sensor image (depth/cloud/normals/camera) is shared across the
    batch. Output fields carry a leading batch axis.
    """
    sv = jnp.asarray(stacked_verts_m, jnp.float32)
    sf = jnp.asarray(stacked_faces, jnp.int32)

    def one(obj_idx, R, t_mm, cam_k, union_mask, depth_m, tgt_pts,
            tgt_normals, key):
        return _refine_body(sv[obj_idx], sf[obj_idx], im_h, im_w, n_src,
                            n_tgt, icp_iters, icp_rounds, R, t_mm, cam_k,
                            union_mask, depth_m, tgt_pts, tgt_normals, key)

    return jax.jit(jax.vmap(
        one, in_axes=(0, 0, 0, None, 0, None, None, None, 0)))


def make_multiframe_icp_refiner(stacked_verts_m, stacked_faces, im_h: int,
                                im_w: int, n_src: int = 1024,
                                n_tgt: int = 4096, icp_iters: int = 30,
                                icp_rounds: int = 2):
    """Hypotheses spanning MULTIPLE sensor frames in one launch.

    The serving coalescer's ICP shape: per-hypothesis object index AND
    frame index; the sensor stacks (``depths_m``/``tgt_pts``/
    ``tgt_normals``) carry a leading frame axis and each hypothesis
    gathers its own frame. One camera shared (the serving case).

    Returns ``refine(obj_idx (P,), frame_idx (P,), R (P,3,3), t_mm (P,3),
    cam_k (3,3), union_masks (P,H,W), depths_m (B,H,W), tgt_pts
    (B,H,W,3), tgt_normals (B,H,W,3), keys (P,2))`` with batch-axis
    outputs.
    """
    sv = jnp.asarray(stacked_verts_m, jnp.float32)
    sf = jnp.asarray(stacked_faces, jnp.int32)

    def one(obj_idx, frame_idx, R, t_mm, cam_k, union_mask, depths_m,
            tgt_pts, tgt_normals, key):
        return _refine_body(sv[obj_idx], sf[obj_idx], im_h, im_w, n_src,
                            n_tgt, icp_iters, icp_rounds, R, t_mm, cam_k,
                            union_mask, depths_m[frame_idx],
                            tgt_pts[frame_idx], tgt_normals[frame_idx],
                            key)

    return jax.jit(jax.vmap(
        one, in_axes=(0, 0, 0, 0, None, 0, None, None, None, 0)))
