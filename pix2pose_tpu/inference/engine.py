"""Batched two-stage pose inference.

The reference estimates one detection at a time with host-side crops, two
batch<=3 network calls and an OpenCV PnP per candidate
(``pix2pose_model/recognition.py:70-224``; its own TODO at
``recognition.py:123`` asks for the batching this module does). Here the
whole per-image workload is ONE jitted tensor program:

  stage 1: N detections -> fused crop-resize -> one network pass
  stage 2: N x T outlier-threshold candidates -> masked re-crop -> one
           network pass -> vmapped PnP-RANSAC -> masked candidate argmin

All shapes are static: detections are padded to ``max_det`` and invalid
slots carry a validity mask. Correspondences live on the 128-grid (the
reference instead upsamples predictions to the crop window and enumerates
integer pixels — same information, dynamic shapes; see SURVEY.md §7).

Semantics preserved from the reference (with citations inline):
  - square 1.5x crop windows with clamp-and-shift bookkeeping (get_boxes)
  - gray-norm foreground test ||decode|| > 0.3 (``recognition.py:89,137``)
  - per-threshold background zeroing for stage 2 (``recognition.py:94-122``)
  - stage-2 window centered on the stage-1 foreground centroid and capped
    at the stage-1 window size (``recognition.py:108-110``)
  - candidate selection by min centroid-reprojection-distance^2 / n_inliers
    (``recognition.py:158-174``)
  - bail-outs: <10 foreground px, <6 PnP points -> invalid (-1 fraction)
    (``recognition.py:96,149,214``)

Deliberate extension beyond the reference: optional per-detection INSTANCE
masks (``det_masks``). The reference's ``est_pose`` is bbox-only
(``recognition.py:70``), so when two instances of the SAME object overlap
(T-Less/IC-BIN ViVo), the occluded instance's crop is dominated by its
neighbor's pixels and PnP locks onto the wrong instance. When the detector
supplies instance masks (Mask-RCNN contract / our CondInst head), the
engine crops them alongside the RGB and restricts stage-1 foreground and
the PnP correspondence set to the detection's own instance. Pass None to
reproduce reference behavior exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pix2pose_tpu.config import EstimatorConfig
from pix2pose_tpu.ops import boxes as boxes_ops
from pix2pose_tpu.ops import crop as crop_ops
from pix2pose_tpu.ops import pnp as pnp_ops
from pix2pose_tpu.ops.boxes import CropBox
from pix2pose_tpu.ops.color import color01_to_xyz


class PoseEstimate(NamedTuple):
    """Per-detection results (leading axis = padded detection slot)."""

    R: jnp.ndarray            # (N, 3, 3)
    t: jnp.ndarray            # (N, 3) mm
    valid: jnp.ndarray        # (N,) bool — pose found
    frac_inlier: jnp.ndarray  # (N,) max_inlier / stage-1 foreground px; -1 invalid
    n_inliers: jnp.ndarray    # (N,) int32 (at the PnP grid resolution)
    mask_pnp: jnp.ndarray     # (N, S/st, S/st) bool — PnP valid-pixel mask
    fg128: jnp.ndarray        # (N, S, S) bool — stage-2 foreground (sel. cand.)
    xyz128: jnp.ndarray       # (N, S, S, 3) predicted coords in [0,1] colors
    box1: CropBox             # stage-1 crop boxes (batched fields)
    box2: CropBox             # stage-2 crop boxes (batched fields)
    area_scale: jnp.ndarray   # (N,) full-res px per grid px (Hc*Wc/S^2)


def _axis_resample_weights(out_centers, lo_ori1, len1, size: int):
    """(S_out, S_src) bilinear weight matrix for one axis of the stage-1 →
    stage-2 grid map: row i holds the two-tap weights of output center i
    in stage-1 grid coordinates, with taps outside [0, size) dropped
    (zero padding). Built by exact integer-valued-float comparison so the
    matmul reproduces the gather formulation's taps."""
    g = (out_centers - lo_ori1 + 0.5) * size / len1 - 0.5
    i0 = jnp.floor(g)
    f = g - i0
    idx = jnp.arange(size, dtype=jnp.float32)
    return (jnp.where(i0[:, None] == idx[None, :], 1.0 - f[:, None], 0.0)
            + jnp.where(i0[:, None] + 1.0 == idx[None, :], f[:, None], 0.0))


def _stage2_mask_on_grid(fg_prob, box1: CropBox, box2: CropBox, size: int):
    """Resample the stage-1 foreground mask (stage-1 grid frame) onto the
    stage-2 grid, thresholding at 0.9 like the reference's
    ``resize(non_gray_prob, ...) > 0.9`` (``recognition.py:103``). Grid
    points outside the image see mask 0 (reference builds ``bg_full`` as
    all-background outside the window, ``recognition.py:105-106``).

    The grid→grid map is an axis-aligned affine, so the bilinear resample
    is SEPARABLE: two (S, S) weight matmuls on the MXU instead of 4-tap
    gathers per pixel (the gather form cost ~81 ms of a 238 ms engine
    launch on v5e — ablation-measured). ``fg_prob`` may carry leading
    batch axes (e.g. the T outlier thresholds): (..., S, S).
    """
    i = jnp.arange(size, dtype=jnp.float32)
    cv = (jnp.asarray(box2.v1_ori, jnp.float32)
          + (i + 0.5) * jnp.asarray(box2.height, jnp.float32) / size - 0.5)
    cu = (jnp.asarray(box2.u1_ori, jnp.float32)
          + (i + 0.5) * jnp.asarray(box2.width, jnp.float32) / size - 0.5)
    w_v = _axis_resample_weights(
        cv, jnp.asarray(box1.v1_ori, jnp.float32),
        jnp.asarray(box1.height, jnp.float32), size)
    w_u = _axis_resample_weights(
        cu, jnp.asarray(box1.u1_ori, jnp.float32),
        jnp.asarray(box1.width, jnp.float32), size)
    samp = jnp.einsum("iv,...vu,ju->...ij", w_v, fg_prob, w_u,
                      precision=jax.lax.Precision.HIGHEST)
    in_v = ((cv >= jnp.asarray(box2.v1, jnp.float32))
            & (cv < jnp.asarray(box2.v2, jnp.float32)))
    in_u = ((cu >= jnp.asarray(box2.u1, jnp.float32))
            & (cu < jnp.asarray(box2.u2, jnp.float32)))
    return (samp > 0.9) & in_v[:, None] & in_u[None, :]


def _select(tree, idx):
    """Pick candidate ``idx`` along axis 0 of every leaf."""
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def stack_object_params(params_list):
    """Stack per-object generator variables on a leading object axis for
    :meth:`Pix2PoseEstimator.estimate_objects`. All objects must share one
    architecture (true per dataset: one backbone per config)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def estimators_for_objects(model, eval_cfg, model_ids,
                           pnp_stride: int | None = None):
    """One estimator per object, deduped by resolved config.

    The reference builds one ``pix2pose`` graph per object so that a
    list-of-lists ``outlier_th`` config resolves per object
    (``5_evaluation_bop_basic.py:164-170,206-225``, e.g.
    ``cfg/cfg_tless_paper.json``). Estimators whose resolved configs are
    identical share one instance — and hence one compiled XLA program.

    Returns {obj_id: Pix2PoseEstimator}.
    """
    cache: dict = {}
    out = {}
    for idx, obj_id in enumerate(model_ids):
        ecfg = eval_cfg.estimator(idx)
        if ecfg not in cache:
            cache[ecfg] = Pix2PoseEstimator(model, ecfg, pnp_stride)
        out[obj_id] = cache[ecfg]
    return out


class Pix2PoseEstimator:
    """Per-object pose estimator over padded detection batches.

    One instance wraps a generator (model + params) and compiles a single
    XLA program per (max_det, image size). The params / camera / norm-factor
    are runtime arguments, so the same compiled program serves every object
    of a dataset — the reference instead keeps one TF graph per object
    (``5_evaluation_bop_basic.py:206-225``).
    """

    def __init__(self, model, cfg: EstimatorConfig = EstimatorConfig(),
                 pnp_stride: int | None = None):
        self.model = model
        self.cfg = cfg
        # constructor arg overrides the config field (back-compat); the
        # config field is what ab_e2e / eval drivers reach
        self.pnp_stride = (pnp_stride if pnp_stride is not None
                           else cfg.pnp_stride)
        self._run = jax.jit(
            functools.partial(self._estimate),
        )
        # multi-image batching: images/boxes/valid/camera/key carry a
        # leading batch axis; params and norm factors are shared
        self._run_batch = jax.jit(jax.vmap(
            self._estimate, in_axes=(None, 0, 0, 0, 0, None, 0)))
        # multi-OBJECT batching: params/boxes/valid/norm-factors/keys carry
        # a leading object axis; the image and camera are shared. All
        # objects of an image run in ONE launch — the reference instead
        # loops one TF graph per object (``5_evaluation_bop_basic.py:
        # 206-225, 289-304``). outlier_th is a runtime (O, T) array so
        # per-object threshold configs (``basic:164-170``) share the one
        # compiled program.
        self._run_objects = jax.jit(jax.vmap(
            lambda p, rgb, bb, dv, K, op, k, th: self._estimate(
                p, rgb, bb, dv, K, op, k, outlier_th=th),
            in_axes=(0, None, 0, 0, None, 0, 0, 0)))
        # images x objects: the serving coalescer's shape — every frame of
        # a request batch and every object of the model set in ONE launch
        self._run_objects_images = jax.jit(jax.vmap(
            jax.vmap(
                lambda p, rgb, bb, dv, K, op, k, th: self._estimate(
                    p, rgb, bb, dv, K, op, k, outlier_th=th),
                in_axes=(0, None, 0, 0, None, 0, 0, 0)),
            in_axes=(None, 0, 0, 0, 0, None, 0, None)))
        # instance-masked variants (compiled only if used; see the module
        # docstring's det_masks extension)
        self._run_masked = jax.jit(
            lambda p, rgb, bb, dv, m, K, op, k: self._estimate(
                p, rgb, bb, dv, K, op, k, det_masks=m))
        self._run_batch_masked = jax.jit(jax.vmap(
            lambda p, rgb, bb, dv, m, K, op, k: self._estimate(
                p, rgb, bb, dv, K, op, k, det_masks=m),
            in_axes=(None, 0, 0, 0, 0, 0, None, 0)))
        self._run_objects_masked = jax.jit(jax.vmap(
            lambda p, rgb, bb, dv, m, K, op, k, th: self._estimate(
                p, rgb, bb, dv, K, op, k, outlier_th=th, det_masks=m),
            in_axes=(0, None, 0, 0, 0, None, 0, 0, 0)))

    # ------------------------------------------------------------------
    def __call__(self, params, rgb, bboxes, det_valid, cam_k, obj_param,
                 key, det_masks=None) -> PoseEstimate:
        """Estimate poses for up to N detections in one image.

        Args:
          params: generator variables ({'params', 'batch_stats'}).
          rgb: (H, W, 3) uint8/float image (raw, unnormalized).
          bboxes: (N, 4) [v_min, u_min, v_max, u_max] detector boxes.
          det_valid: (N,) bool slot mask.
          cam_k: (3, 3) intrinsics.
          obj_param: (6,) [scale_xyz, ct_xyz] norm factors (mm).
          key: PRNG key for RANSAC.
          det_masks: optional (N, H, W) per-detection instance masks —
            restricts foreground/correspondences to each detection's own
            instance (duplicate-instance scenes); None = reference
            bbox-only behavior.
        """
        if det_masks is not None:
            return self._run_masked(params, rgb, bboxes, det_valid,
                                    det_masks, cam_k, obj_param, key)
        return self._run(params, rgb, bboxes, det_valid, cam_k, obj_param,
                         key)

    def estimate_batch(self, params, rgbs, bboxes, det_valid, cam_ks,
                       obj_param, keys, det_masks=None) -> PoseEstimate:
        """Batched over images: rgbs (B,H,W,3), bboxes (B,N,4),
        det_valid (B,N), cam_ks (B,3,3), keys (B,2). One compiled program
        amortizes launch overhead across a whole image stream.
        ``det_masks`` optionally carries (B,N,H,W) instance masks."""
        if det_masks is not None:
            return self._run_batch_masked(params, rgbs, bboxes, det_valid,
                                          det_masks, cam_ks, obj_param,
                                          keys)
        return self._run_batch(params, rgbs, bboxes, det_valid, cam_ks,
                               obj_param, keys)

    def estimate_objects(self, stacked_params, rgb, bboxes, det_valid,
                         cam_k, obj_params, keys,
                         outlier_th=None, det_masks=None) -> PoseEstimate:
        """Batched over OBJECTS of one image: stacked_params has every
        param leaf stacked on a leading object axis (see
        :func:`stack_object_params`), bboxes (O,N,4), det_valid (O,N),
        obj_params (O,6), keys (O,2); rgb (H,W,3) and cam_k (3,3) shared.
        ``outlier_th`` optionally overrides the config thresholds per
        object as an (O, T) array with T == len(cfg.outlier_th);
        ``det_masks`` optionally carries (O, N, H, W) instance masks.
        Every returned field carries the (O, N, ...) axes."""
        if outlier_th is None:
            o = bboxes.shape[0]
            outlier_th = jnp.tile(
                jnp.asarray(self.cfg.outlier_th, jnp.float32)[None],
                (o, 1))
        if det_masks is not None:
            return self._run_objects_masked(
                stacked_params, rgb, bboxes, det_valid, det_masks, cam_k,
                obj_params, keys, jnp.asarray(outlier_th, jnp.float32))
        return self._run_objects(stacked_params, rgb, bboxes, det_valid,
                                 cam_k, obj_params, keys,
                                 jnp.asarray(outlier_th, jnp.float32))

    def estimate_objects_images(self, stacked_params, rgbs, bboxes,
                                det_valid, cam_ks, obj_params, keys,
                                outlier_th=None) -> PoseEstimate:
        """Batched over IMAGES x OBJECTS: rgbs (B,H,W,3), bboxes
        (B,O,N,4), det_valid (B,O,N), cam_ks (B,3,3), keys (B,O,2);
        stacked_params / obj_params (O,6) shared across images. One
        compiled program serves a whole coalesced request batch — the
        serving frontend's device program (the reference node processes
        one frame, one object, one crop at a time:
        ``ros_kinetic/ros_pix2pose.py:286-349``). Returned fields carry
        (B, O, N, ...) axes."""
        if outlier_th is None:
            o = bboxes.shape[1]
            outlier_th = jnp.tile(
                jnp.asarray(self.cfg.outlier_th, jnp.float32)[None],
                (o, 1))
        return self._run_objects_images(
            stacked_params, rgbs, bboxes, det_valid, cam_ks, obj_params,
            keys, jnp.asarray(outlier_th, jnp.float32))

    # ------------------------------------------------------------------
    def _estimate(self, params, rgb, bboxes, det_valid, cam_k, obj_param,
                  key, outlier_th=None, det_masks=None) -> PoseEstimate:
        cfg = self.cfg
        size = cfg.im_size
        # outlier_th may be a runtime (T,) override (same T as the config)
        th_o = (jnp.asarray(cfg.outlier_th, jnp.float32)
                if outlier_th is None
                else jnp.asarray(outlier_th, jnp.float32))  # (T,)
        n_th = len(cfg.outlier_th)
        im_h, im_w = rgb.shape[0], rgb.shape[1]
        n_det = bboxes.shape[0]

        # normalize once: (x - 128)/128 (reference ``recognition.py:77``)
        rgb_n = (jnp.asarray(rgb, jnp.float32) - 128.0) / 128.0

        # ---------------- stage 1 ----------------
        box1 = jax.vmap(
            lambda b: boxes_ops.get_boxes(b, im_h, im_w, cfg.box_size)
        )(bboxes)
        crops1 = crop_ops.crop_resize_batch(rgb_n, box1, size, True)
        dec1, prob1 = self.model.apply(params, crops1)  # (N,S,S,3),(N,S,S,1)
        prob1 = prob1[..., 0]
        fg1 = jnp.linalg.norm(dec1, axis=-1) > cfg.gray_norm_th  # (N,S,S)
        if det_masks is not None:
            # restrict stage-1 foreground to the detection's own instance
            dm = jnp.asarray(det_masks, jnp.float32)
            m1 = jax.vmap(
                lambda m, b: crop_ops.crop_resize_2d(m, b, size, False)
            )(dm, box1) > 0.5
            fg1 = fg1 & m1
        n_init = jnp.sum(fg1, axis=(1, 2))  # (N,)

        # stage-1 foreground bbox & centroid — threshold-independent
        # (reference ``recognition.py:98-109`` uses non_gray, not the
        # thresholded mask, for both)
        fg_bbox = jax.vmap(boxes_ops.bbox_from_mask)(fg1)  # (N,4) grid coords
        h1 = box1.height.astype(jnp.float32)
        w1 = box1.width.astype(jnp.float32)
        scale_vec = jnp.stack([h1, w1, h1, w1], axis=1) / size
        fg_bbox_canvas = fg_bbox.astype(jnp.float32) * scale_vec

        gi = jnp.arange(size, dtype=jnp.float32)
        fg_f = fg1.astype(jnp.float32)
        fg_n = jnp.maximum(jnp.sum(fg_f, axis=(1, 2)), 1.0)
        mean_v = jnp.sum(fg_f * gi[None, :, None], axis=(1, 2)) / fg_n
        mean_u = jnp.sum(fg_f * gi[None, None, :], axis=(1, 2)) / fg_n
        # grid centroid -> full image (reference ``recognition.py:108-109``:
        # ct = grid_mean - 127/2 + detector box center)
        cx_o = (bboxes[:, 1] + bboxes[:, 3]).astype(jnp.float32) / 2.0
        cy_o = (bboxes[:, 0] + bboxes[:, 2]).astype(jnp.float32) / 2.0
        ct_u = jnp.floor(mean_u - (size - 1) / 2.0 + cx_o)
        ct_v = jnp.floor(mean_v - (size - 1) / 2.0 + cy_o)

        box2 = jax.vmap(
            lambda b, ct, mw: boxes_ops.get_boxes(
                b, im_h, im_w, cfg.box_size, ct=ct, max_w=mw)
        )(fg_bbox_canvas, jnp.stack([ct_v, ct_u], axis=1),
          (box1.v2_ori - box1.v1_ori).astype(jnp.float32))

        # ---------------- stage 2 inputs ----------------
        crops2 = crop_ops.crop_resize_batch(rgb_n, box2, size, True)  # (N,S,S,3)
        # per-threshold foreground prob mask on the stage-1 grid
        fg_th = (fg1[:, None] & (prob1[:, None] < th_o[None, :, None, None]))
        cand_ok = jnp.sum(fg_th, axis=(2, 3)) >= cfg.min_stage1_px  # (N,T)
        mask2 = jax.vmap(  # over detections; T thresholds ride the
            # leading batch axis of the separable-matmul resample
            lambda m, b1, b2: _stage2_mask_on_grid(
                m.astype(jnp.float32), b1, b2, size)
        )(fg_th, box1, box2)  # (N,T,S,S) bool
        stage2_in = crops2[:, None] * mask2[..., None].astype(jnp.float32)

        flat_in = stage2_in.reshape(n_det * n_th, size, size, 3)
        dec2, prob2 = self.model.apply(params, flat_in)
        prob2 = prob2.reshape(n_det, n_th, size, size)
        dec2 = dec2.reshape(n_det, n_th, size, size, 3)

        fg2 = jnp.linalg.norm(dec2, axis=-1) > cfg.gray_norm_th  # (N,T,S,S)
        # zero out gray pixels -> color 0.5 after decode (ref ``:139``)
        dec2 = jnp.where(fg2[..., None], dec2, 0.0)
        xyz01 = jnp.clip((dec2 + 1.0) * 0.5, 0.0, 1.0)
        n_fg2 = jnp.sum(fg2, axis=(2, 3))  # (N,T)
        cand_ok = cand_ok & (n_fg2 >= cfg.min_stage1_px)  # ref ``:149``

        # ---------------- correspondences on the grid ----------------
        vv, uu, in_img = jax.vmap(
            lambda b: crop_ops.crop_pixel_centers(b, size))(box2)  # (N,S,S)
        st = self.pnp_stride
        sub = lambda a: a[..., ::st, ::st]        # (..., S, S) maps
        subc = lambda a: a[..., ::st, ::st, :]    # (..., S, S, C) maps
        gs = size // st
        obj_scale = obj_param[:3]
        obj_ct = obj_param[3:]
        xyz_mm = color01_to_xyz(subc(xyz01), obj_scale, obj_ct)  # (N,T,gs,gs,3)
        pnp_valid = (sub(fg2)
                     & (sub(prob2) < cfg.inlier_th)
                     & sub(in_img)[:, None])  # (N,T,gs,gs)
        if det_masks is not None:
            # correspondences only on the detection's own instance
            m2 = jax.vmap(
                lambda m, b: crop_ops.crop_resize_2d(m, b, size, False)
            )(dm, box2) > 0.5
            pnp_valid = pnp_valid & sub(m2)[:, None]
        img_pts = jnp.stack([sub(uu), sub(vv)], axis=-1)  # (N,gs,gs,2)
        img_pts = jnp.broadcast_to(img_pts[:, None],
                                   (n_det, n_th, gs, gs, 2))

        flat = lambda a, d: a.reshape((n_det * n_th,) + d)
        keys = jax.random.split(key, n_det * n_th)
        # cfg.prosac: order hypothesis sampling by the generator's own
        # predicted-error map (lower predicted error = drawn earlier) —
        # the per-pixel confidence the reference only thresholds
        # (``recognition.py:203``) also carries ranking information
        quality = (-flat(sub(prob2), (gs * gs,)) if cfg.prosac else None)
        p_obj = flat(xyz_mm, (gs * gs, 3))
        p_img = flat(img_pts, (gs * gs, 2))
        p_val = flat(pnp_valid, (gs * gs,))
        if cfg.max_pnp_points and cfg.max_pnp_points < gs * gs:
            # compact the sparse grid correspondences into a fixed short
            # layout — every PnP stage then runs at max_pnp_points instead
            # of gs^2 (see ops/pnp.py:compact_correspondences)
            comp = jax.vmap(
                lambda o, im, v, q: pnp_ops.compact_correspondences(
                    o, im, v, cfg.max_pnp_points, q),
                in_axes=(0, 0, 0, None if quality is None else 0))
            p_obj, p_img, p_val, quality, n_val_full, n_kept = comp(
                p_obj, p_img, p_val, quality)
            count_scale = (n_val_full.astype(jnp.float32)
                           / jnp.maximum(n_kept.astype(jnp.float32), 1.0))
        else:
            count_scale = None
        res = pnp_ops.pnp_ransac_batch(
            p_obj, p_img, p_val, cam_k, keys, quality,
            iters=cfg.ransac_iters, reproj_px=cfg.ransac_reproj_px,
            min_pts=cfg.min_pnp_px, refine_iters=cfg.gn_refine_iters,
            select_stride=cfg.select_stride,
            hyp_polish_iters=cfg.hyp_polish_iters,
        )
        if count_scale is not None:
            # rescale subsampled inlier counts to full-grid units so the
            # dist/frac_inlier rankings match the uncompacted engine
            res = res._replace(n_inliers=jnp.where(
                res.n_inliers >= 0,
                jnp.round(res.n_inliers.astype(jnp.float32)
                          * count_scale).astype(jnp.int32),
                res.n_inliers))
        res = jax.tree_util.tree_map(
            lambda x: x.reshape((n_det, n_th) + x.shape[1:]), res)

        # ---------------- candidate selection ----------------
        # centroid of stage-2 foreground in full-image coords
        fg2s = sub(fg2).astype(jnp.float32)
        fg2_n = jnp.maximum(jnp.sum(fg2s, axis=(2, 3)), 1.0)
        ct_px_v = jnp.sum(fg2s * sub(vv)[:, None], axis=(2, 3)) / fg2_n
        ct_px_u = jnp.sum(fg2s * sub(uu)[:, None], axis=(2, 3)) / fg2_n
        tz = res.t[..., 2]
        proj_u = cam_k[0, 0] * res.t[..., 0] / jnp.where(tz == 0, 1e9, tz) \
            + cam_k[0, 2]
        proj_v = cam_k[1, 1] * res.t[..., 1] / jnp.where(tz == 0, 1e9, tz) \
            + cam_k[1, 2]
        dist = ((proj_v - ct_px_v) ** 2 + (proj_u - ct_px_u) ** 2) \
            / (res.n_inliers.astype(jnp.float32) + 1e-6)
        dist = jnp.where(tz == 0, 9.9e6, dist)  # ref ``recognition.py:163-168``
        usable = cand_ok & res.ok
        dist = jnp.where(usable, dist, jnp.inf)
        best = jnp.argmin(dist, axis=1)  # (N,)
        any_ok = jnp.any(usable, axis=1) & det_valid

        take = jax.vmap(lambda a, i: a[i], in_axes=(0, 0))
        sel = lambda a: take(a, best)
        R = sel(res.R)
        t = sel(res.t)
        n_inl = sel(res.n_inliers)
        # the reference counts inliers at CROP-WINDOW resolution (pred
        # upscaled to the stage-2 window, ``recognition.py:210-223``) while
        # stage-1 foreground is counted on the 128 grid, so its fraction
        # carries a window_area/128^2 factor; our inliers live on the
        # st-strided grid -> scale counts by window_area/gs^2 so score_type
        # 2 ranks different-sized detections like the reference
        win_area = (box2.height * box2.width).astype(jnp.float32)
        frac = (n_inl.astype(jnp.float32) * win_area / float(gs * gs)) \
            / jnp.maximum(n_init.astype(jnp.float32), 1.0)
        # PnP valid-pixel mask (reference ``valid_mask`` at ``:204``)
        valid_sel = sel(pnp_valid)
        fg_sel = sel(fg2)
        xyz_sel = sel(xyz01)

        area_scale = (box2.height * box2.width).astype(jnp.float32) \
            / float(size * size)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), R.shape)
        return PoseEstimate(
            R=jnp.where(any_ok[:, None, None], R, eye),
            t=jnp.where(any_ok[:, None], t, 0.0),
            valid=any_ok,
            frac_inlier=jnp.where(any_ok, frac, -1.0),
            n_inliers=jnp.where(any_ok, n_inl, -1),
            mask_pnp=valid_sel & any_ok[:, None, None],
            fg128=fg_sel & any_ok[:, None, None],
            xyz128=xyz_sel,
            box1=box1,
            box2=box2,
            area_scale=area_scale,
        )
