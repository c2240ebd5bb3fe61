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


def _refine_body(verts_m, faces, im_h, im_w, n_src, n_tgt, icp_iters,
                 R, t_mm, cam_k, union_mask, depth_m, tgt_pts, tgt_normals,
                 key):
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
                                  n_tgt, icp_iters, R, t_mm, cam_k,
                                  union_mask, depth_m, tgt_pts,
                                  tgt_normals, key)


def _refine_body_inner(verts_m, faces, im_h, im_w, n_src, n_tgt, icp_iters,
                       R, t_mm, cam_k, union_mask, depth_m, tgt_pts,
                       tgt_normals, key):
    k1, k2 = jax.random.split(key)
    # translation sanity reset (``icp3d:61-62``)
    tgt_flat = tgt_pts.reshape(-1, 3)
    um_flat = union_mask.reshape(-1)
    n_um = jnp.maximum(jnp.sum(um_flat), 1)
    centroid_tgt = jnp.sum(
        jnp.where(um_flat[:, None], tgt_flat, 0.0), 0) / n_um
    bad_t = (t_mm[2] < 300.0) | (t_mm[2] > 5000.0)
    t_mm = jnp.where(bad_t, centroid_tgt * 1000.0, t_mm)

    # render at the initial pose (depth in meters)
    t_m = t_mm / 1000.0
    rout_init = rasterizer.render_mesh(
        verts_m, faces, jnp.zeros((verts_m.shape[0], 1)), R, t_m, cam_k,
        im_h, im_w)
    depth_init, mask_init = rout_init.depth, rout_init.mask
    init_mask = mask_init & union_mask
    enough = jnp.sum(init_mask) >= 10  # ``icp3d:73-76``

    # source cloud: rendered depth + normals within the mask
    src_pts_full = geometry.backproject(depth_init, cam_k)
    src_flat = src_pts_full.reshape(-1, 3)
    sidx, svalid = _sample_masked(k1, init_mask.reshape(-1), n_src)
    src = jnp.take(src_flat, sidx, axis=0)

    # centroid pre-alignment (``icp3d:82-86``)
    n_sv = jnp.maximum(jnp.sum(svalid), 1)
    centroid_src = jnp.sum(
        jnp.where(svalid[:, None], src, 0.0), 0) / n_sv
    shift = centroid_tgt - centroid_src
    src = src + shift
    t_mm = t_mm + shift * 1000.0

    # target cloud sample
    tidx, tvalid = _sample_masked(k2, um_flat & (
        depth_m.reshape(-1) > 0), n_tgt)
    tgt = jnp.take(tgt_flat, tidx, axis=0)
    tgt_n = jnp.take(tgt_normals.reshape(-1, 3), tidx, axis=0)

    res = icp.icp_point_to_plane(src, tgt, tgt_n, src_valid=svalid,
                                 tgt_valid=tvalid, iters=icp_iters)
    # compose: x_tgt = dR (R x + t) + dt (``icp3d:91-93``)
    R_ref = res.R @ R
    t_ref_mm = (res.R @ (t_mm / 1000.0) + res.t) * 1000.0
    use = res.ok & enough
    R_ref = jnp.where(use, R_ref, R)
    t_ref_mm = jnp.where(use, t_ref_mm, t_mm)

    # re-render + depth-consistency score (``icp3d:471-491``)
    rout_ref = rasterizer.render_mesh(
        verts_m, faces, jnp.zeros((verts_m.shape[0], 1)), R_ref,
        t_ref_mm / 1000.0, cam_k, im_h, im_w)
    depth_ref = rout_ref.depth
    dz = jnp.abs(depth_ref - depth_m)
    in_union = union_mask & (depth_m > 0)
    inlier = in_union & (dz < 0.02) & (depth_ref > 0)
    fcn = jnp.sum(
        jnp.where(in_union, jnp.maximum(0.0, 0.02 - dz), 0.0)) / 0.02
    ratio = jnp.sum(inlier) / jnp.maximum(jnp.sum(in_union), 1)
    return RefineOut(R=R_ref, t_mm=t_ref_mm, score=fcn, ratio=ratio,
                     inlier_mask=inlier, ok=use & enough,
                     overflow=(jnp.int32(rout_init.overflow)
                               + jnp.int32(rout_ref.overflow)))


def make_icp_refiner(verts_m, faces, im_h: int, im_w: int,
                     n_src: int = 1024, n_tgt: int = 4096,
                     icp_iters: int = 30):
    """Build the jitted refine+score function for one object mesh
    (vertices in meters)."""
    verts_m = jnp.asarray(verts_m, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    @functools.partial(jax.jit)
    def refine(R, t_mm, cam_k, union_mask, depth_m, tgt_pts, tgt_normals,
               key):
        return _refine_body(verts_m, faces, im_h, im_w, n_src, n_tgt,
                            icp_iters, R, t_mm, cam_k, union_mask, depth_m,
                            tgt_pts, tgt_normals, key)

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
                           icp_iters: int = 30):
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
                            n_tgt, icp_iters, R, t_mm, cam_k, union_mask,
                            depth_m, tgt_pts, tgt_normals, key)

    return jax.jit(jax.vmap(
        one, in_axes=(0, 0, 0, None, 0, None, None, None, 0)))


def make_multiframe_icp_refiner(stacked_verts_m, stacked_faces, im_h: int,
                                im_w: int, n_src: int = 1024,
                                n_tgt: int = 4096, icp_iters: int = 30):
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
                            n_tgt, icp_iters, R, t_mm, cam_k, union_mask,
                            depths_m[frame_idx], tgt_pts[frame_idx],
                            tgt_normals[frame_idx], key)

    return jax.jit(jax.vmap(
        one, in_axes=(0, 0, 0, 0, None, 0, None, None, None, 0)))
