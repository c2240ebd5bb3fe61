"""Streaming pose-estimation service.

The reference serves through a ROS Kinetic node
(``ros_kinetic/ros_pix2pose.py``): subscribe RGB(+depth) topics, detect,
estimate per-object poses, optionally ICP-refine, publish annotated
detection / pose-overlay images and pose messages, with subscribe/
unsubscribe as crude backpressure (``ros:274-284``).

Here the same capability is a transport-agnostic service:

- :class:`PoseService` — callback core: ``process(rgb, depth=None)`` ->
  :class:`FrameResult` (poses + overlay images). One padded-batch device
  program per frame; per-object grouping like the evaluator.
- :class:`RosAdapter` — optional rospy binding with the same topics and
  backpressure trick as the reference; imports rospy lazily so the core is
  testable anywhere.
- ``ServingConfig.load`` reads the reference's ``ros_config.json`` schema
  unchanged (``ros_kinetic/ros_config.json``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Sequence

import numpy as np

import jax

from pix2pose_tpu.config import EstimatorConfig
from pix2pose_tpu.inference.engine import Pix2PoseEstimator
from pix2pose_tpu.serving import viz


@dataclasses.dataclass
class ServingConfig:
    """Mirror of the reference ``ros_config.json`` knobs."""

    backbone: str = "paper"
    inlier_th: float = 0.15
    outlier_th: Sequence[float] = (0.1, 0.2, 0.3, 0.4)
    cam_K: np.ndarray = None
    im_width: int = 640
    im_height: int = 480
    obj_labels: Sequence[int] = ()
    target_obj_name: Sequence[int] = ()
    icp: bool = False
    model_scale: float = 0.001
    rgb_topic: str = "/camera/rgb"
    depth_topic: str = "/camera/depth"

    @classmethod
    def load(cls, path: str) -> "ServingConfig":
        with open(path) as f:
            raw = json.load(f)
        return cls(
            backbone=raw.get("backbone", "paper"),
            inlier_th=float(raw.get("inlier_th", 0.15)),
            outlier_th=tuple(raw.get("outlier_th", (0.1, 0.2, 0.3))),
            cam_K=np.asarray(raw["cam_K"], np.float32).reshape(3, 3),
            im_width=int(raw.get("im_width", 640)),
            im_height=int(raw.get("im_height", 480)),
            obj_labels=tuple(raw.get("obj_labels", ())),
            target_obj_name=tuple(raw.get("target_obj_name", ())),
            icp=bool(raw.get("icp", 0)),
            model_scale=float(raw.get("model_scale", 0.001)),
            rgb_topic=raw.get("rgb_topic", "/camera/rgb"),
            depth_topic=raw.get("depth_topic", "/camera/depth"),
        )


@dataclasses.dataclass
class PoseOutput:
    obj_id: int
    R: np.ndarray
    t: np.ndarray
    score: float
    bbox: np.ndarray


@dataclasses.dataclass
class FrameResult:
    poses: list
    detection_image: np.ndarray  # annotated boxes
    pose_image: np.ndarray       # 3D bbox overlays
    latency_s: float


class PoseService:
    """Transport-agnostic streaming core."""

    def __init__(self, cfg: ServingConfig, detector, estimator_model,
                 params_by_obj: dict, obj_params: dict,
                 box_corners: dict, refiners: dict | None = None,
                 max_det: int = 4, meshes_m: dict | None = None):
        """Args:
          detector: ``detect(scene_id, im_id, rgb)``-style or
            ``detect(rgb)`` callable adapter.
          box_corners: {obj_id: (8,3) model bbox corners (mm)} for overlay.
          refiners: optional {obj_id: icp refine fn} (see eval.icp_refine)
            used by :meth:`process` when cfg.icp and depth is provided.
          meshes_m: optional {obj_id: (verts_m (V,3), faces (F,3))};
            enables the BATCHED depth/ICP path in :meth:`process_many`
            (all poses of all frames refined in one launch).
        """
        self.cfg = cfg
        self.detector = detector
        self.est = Pix2PoseEstimator(
            estimator_model,
            EstimatorConfig(outlier_th=tuple(cfg.outlier_th),
                            inlier_th=cfg.inlier_th,
                            backbone=cfg.backbone))
        self.params_by_obj = params_by_obj
        self.obj_params = obj_params
        self.box_corners = box_corners
        self.refiners = refiners or {}
        self.max_det = max_det
        self._key = jax.random.PRNGKey(0)
        self.frame_count = 0
        # lazy caches for the coalesced-batch path (process_many)
        self._stacked = None
        self._stacked_op = None
        self._obj_ids: list = []
        self.meshes_m = meshes_m or {}
        self._mf_refiner = None
        self._mesh_index: dict = {}
        self._sensor_prep = None

    # ------------------------------------------------------------------
    def process(self, rgb: np.ndarray, depth: np.ndarray | None = None
                ) -> FrameResult:
        t0 = time.time()
        dets = self._detect(rgb)
        det_img = rgb.copy()
        pose_img = rgb.copy()
        poses = []
        picked: dict[int, list] = {}
        for d in dets:
            if self.cfg.target_obj_name and \
                    d.obj_id not in self.cfg.target_obj_name:
                continue
            if d.obj_id in self.params_by_obj:
                picked.setdefault(d.obj_id, []).append(d)

        tgt_pts = tgt_normals = depth_m = None
        if depth is not None and self.cfg.icp and self.refiners:
            from pix2pose_tpu.ops import geometry
            import jax.numpy as jnp

            depth_m = geometry.despeckle_depth(
                jnp.asarray(depth, jnp.float32))
            tgt_pts = geometry.backproject(depth_m, self.cfg.cam_K)
            tgt_normals = geometry.normals_from_depth(depth_m,
                                                      self.cfg.cam_K)

        for obj_id, ds_ in picked.items():
            ds_ = ds_[:self.max_det]
            bboxes = np.zeros((self.max_det, 4), np.int32)
            valid = np.zeros(self.max_det, bool)
            for i, d in enumerate(ds_):
                bboxes[i] = d.bbox
                valid[i] = True
            self._key, sub = jax.random.split(self._key)
            out = self.est(self.params_by_obj[obj_id], rgb, bboxes, valid,
                           self.cfg.cam_K, self.obj_params[obj_id], sub)
            for i, d in enumerate(ds_):
                if not bool(out.valid[i]):
                    continue
                R = np.asarray(out.R[i])
                t = np.asarray(out.t[i])
                # optional depth refinement (reference ``ros:351-360``)
                if depth_m is not None and obj_id in self.refiners \
                        and d.mask is not None:
                    import jax.numpy as jnp

                    self._key, k2 = jax.random.split(self._key)
                    union = d.mask & (np.asarray(depth_m) > 0.2)
                    ref = self.refiners[obj_id](
                        jnp.asarray(R), jnp.asarray(t), self.cfg.cam_K,
                        jnp.asarray(union), depth_m, tgt_pts, tgt_normals,
                        k2)
                    if bool(ref.ok):
                        R, t = np.asarray(ref.R), np.asarray(ref.t_mm)
                # score = det * frac_inlier * 1000-ish (``ros:332-349``)
                score = d.score * max(float(out.frac_inlier[i]), 0.0)
                poses.append(PoseOutput(obj_id=obj_id, R=R, t=t,
                                        score=score, bbox=d.bbox))
                viz.draw_detection_box(det_img, d.bbox, copy=False)
                if obj_id in self.box_corners:
                    viz.draw_pose_box(pose_img, self.box_corners[obj_id],
                                      R, t, self.cfg.cam_K, copy=False)
        self.frame_count += 1
        return FrameResult(poses=poses, detection_image=det_img,
                           pose_image=pose_img,
                           latency_s=time.time() - t0)

    def _detect(self, rgb):
        try:
            return self.detector.detect(0, self.frame_count, rgb)
        except TypeError:
            return self.detector.detect(rgb)

    # ------------------------------------------------------------------
    def process_many(self, rgbs: Sequence[np.ndarray], depths=None,
                     want_images: bool = False) -> list:
        """Coalesced-batch path: ALL frames x ALL objects in one device
        launch (``engine.estimate_objects_images``). The batch axis is
        padded to a power of two so the number of compiled programs stays
        bounded regardless of request-coalescing jitter. Used by the
        serving frontend; overlays are skipped unless ``want_images``
        (they are host-side work per frame).

        With ``depths`` (per-frame depth in meters, None entries allowed)
        and ``cfg.icp`` and ``meshes_m`` provided, every valid pose of
        every frame is ICP-refined in ONE further launch
        (``make_multiframe_icp_refiner``) — the reference node refines
        one pose at a time (``ros_pix2pose.py:351-360``).

        Returns a list of :class:`FrameResult` (images None when not
        requested)."""
        from pix2pose_tpu.inference.engine import stack_object_params

        t0 = time.time()
        if self._stacked is None:
            self._obj_ids = sorted(self.params_by_obj)
            self._stacked = stack_object_params(
                [self.params_by_obj[o] for o in self._obj_ids])
            self._stacked_op = np.stack(
                [np.asarray(self.obj_params[o], np.float32)
                 for o in self._obj_ids])
        obj_ids = self._obj_ids
        n_obj = len(obj_ids)
        b_real = len(rgbs)
        b_pad = 1
        while b_pad < b_real:
            b_pad *= 2

        dets_per_frame = [self._detect(rgb) for rgb in rgbs]
        self.frame_count += b_real
        bboxes = np.zeros((b_pad, n_obj, self.max_det, 4), np.int32)
        valid = np.zeros((b_pad, n_obj, self.max_det), bool)
        kept: dict[tuple, object] = {}
        for bi, dets in enumerate(dets_per_frame):
            slot = {o: 0 for o in obj_ids}
            for d in dets:
                if self.cfg.target_obj_name and \
                        d.obj_id not in self.cfg.target_obj_name:
                    continue
                if d.obj_id not in self.params_by_obj:
                    continue
                oi = obj_ids.index(d.obj_id)
                si = slot[d.obj_id]
                if si >= self.max_det:
                    continue
                bboxes[bi, oi, si] = d.bbox
                valid[bi, oi, si] = True
                kept[(bi, oi, si)] = d
                slot[d.obj_id] = si + 1

        imgs = np.zeros((b_pad,) + rgbs[0].shape, rgbs[0].dtype)
        for bi, rgb in enumerate(rgbs):
            imgs[bi] = rgb
        cam_ks = np.tile(np.asarray(self.cfg.cam_K, np.float32)[None],
                         (b_pad, 1, 1))
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, b_pad * n_obj).reshape(
            b_pad, n_obj, 2)
        out = self.est.estimate_objects_images(
            self._stacked, imgs, bboxes, valid, cam_ks,
            self._stacked_op, keys)
        out = jax.device_get(out)

        refined = {}
        if depths is not None and self.cfg.icp and self.meshes_m \
                and any(d is not None for d in depths):
            refined = self._batch_refine(depths, out, kept, obj_ids,
                                         b_pad, rgbs[0].shape[:2])

        results = []
        per_frame = (time.time() - t0) / max(b_real, 1)
        for bi in range(b_real):
            det_img = rgbs[bi].copy() if want_images else None
            pose_img = rgbs[bi].copy() if want_images else None
            poses = []
            for oi, obj_id in enumerate(obj_ids):
                for si in range(self.max_det):
                    d = kept.get((bi, oi, si))
                    if d is None or not bool(out.valid[bi, oi, si]):
                        continue
                    if (bi, oi, si) in refined:
                        R, t = refined[(bi, oi, si)]
                    else:
                        R = np.asarray(out.R[bi, oi, si])
                        t = np.asarray(out.t[bi, oi, si])
                    score = d.score * max(
                        float(out.frac_inlier[bi, oi, si]), 0.0)
                    poses.append(PoseOutput(obj_id=obj_id, R=R, t=t,
                                            score=score, bbox=d.bbox))
                    if want_images:
                        viz.draw_detection_box(det_img, d.bbox,
                                               copy=False)
                        if obj_id in self.box_corners:
                            viz.draw_pose_box(
                                pose_img, self.box_corners[obj_id],
                                R, t, self.cfg.cam_K, copy=False)
            results.append(FrameResult(poses=poses,
                                       detection_image=det_img,
                                       pose_image=pose_img,
                                       latency_s=per_frame))
        return results

    # ------------------------------------------------------------------
    def _ensure_mf_refiner(self, im_hw):
        import jax.numpy as jnp

        if self._mf_refiner is None:
            from pix2pose_tpu.eval.icp_refine import (
                make_multiframe_icp_refiner, stack_meshes)

            ids = sorted(self.meshes_m)
            self._mesh_index = {o: i for i, o in enumerate(ids)}
            sv, sf = stack_meshes([self.meshes_m[o] for o in ids],
                                  max_faces=40000)
            self._mf_refiner = make_multiframe_icp_refiner(
                sv, sf, im_hw[0], im_hw[1])
        if self._sensor_prep is None:
            from pix2pose_tpu.ops import geometry

            cam_k = jnp.asarray(self.cfg.cam_K, jnp.float32)

            @jax.jit
            def prep(depths):
                depths = jax.vmap(geometry.despeckle_depth)(depths)
                pts = jax.vmap(
                    lambda d: geometry.backproject(d, cam_k))(depths)
                nrm = jax.vmap(
                    lambda d: geometry.normals_from_depth(d, cam_k)
                )(depths)
                return depths, pts, nrm

            self._sensor_prep = prep

    def _batch_refine(self, depths, out, kept, obj_ids, b_pad, im_hw):
        """One launch: every valid (frame, object, slot) hypothesis with
        a mesh + depth, refined together. Returns {(bi, oi, si): (R, t)}
        for hypotheses the refiner accepted."""
        import jax.numpy as jnp

        self._ensure_mf_refiner(im_hw)
        h, w = im_hw
        depth_stack = np.zeros((b_pad, h, w), np.float32)
        has_depth = np.zeros(b_pad, bool)
        for bi, dm in enumerate(depths):
            if dm is not None:
                depth_stack[bi] = np.asarray(dm, np.float32)
                has_depth[bi] = True

        hyps = []
        for (bi, oi, si), d in sorted(kept.items()):
            if not has_depth[bi]:
                continue
            if obj_ids[oi] not in self._mesh_index:
                continue
            if not bool(out.valid[bi, oi, si]):
                continue
            hyps.append((bi, oi, si, d))
        if not hyps:
            return {}
        p_pad = 1
        while p_pad < len(hyps):
            p_pad *= 2
        obj_idx = np.zeros(p_pad, np.int32)
        frame_idx = np.zeros(p_pad, np.int32)
        rs = np.tile(np.eye(3, dtype=np.float32), (p_pad, 1, 1))
        ts = np.full((p_pad, 3), np.array([0, 0, 1000.0]), np.float32)
        masks = np.zeros((p_pad, h, w), bool)
        for i, (bi, oi, si, d) in enumerate(hyps):
            obj_idx[i] = self._mesh_index[obj_ids[oi]]
            frame_idx[i] = bi
            rs[i] = out.R[bi, oi, si]
            ts[i] = out.t[bi, oi, si]
            dm_ok = depth_stack[bi] > 0.2
            masks[i] = (d.mask & dm_ok) if d.mask is not None else dm_ok

        dj, tgt_pts, tgt_normals = self._sensor_prep(
            jnp.asarray(depth_stack))
        self._key, sub = jax.random.split(self._key)
        keys = jax.random.split(sub, p_pad)
        ref = jax.device_get(self._mf_refiner(
            jnp.asarray(obj_idx), jnp.asarray(frame_idx),
            jnp.asarray(rs), jnp.asarray(ts),
            jnp.asarray(self.cfg.cam_K, jnp.float32),
            jnp.asarray(masks), dj, tgt_pts, tgt_normals, keys))
        refined = {}
        for i, (bi, oi, si, _) in enumerate(hyps):
            if bool(ref.ok[i]):
                refined[(bi, oi, si)] = (np.asarray(ref.R[i]),
                                         np.asarray(ref.t_mm[i]))
        return refined


class RosAdapter:
    """Optional rospy binding: same topics + unsubscribe-while-busy
    backpressure as the reference node (``ros_pix2pose.py:274-284,
    375-388``). Requires rospy + ros_numpy at runtime."""

    def __init__(self, service: PoseService):
        self.service = service

    def spin(self):
        import rospy  # gated: not part of the baked environment
        import ros_numpy
        from sensor_msgs.msg import Image

        cfg = self.service.cfg
        rospy.init_node("pix2pose_tpu")
        pub_det = rospy.Publisher("/pix2pose/detected_object", Image,
                                  queue_size=1)
        pub_pose = rospy.Publisher("/pix2pose/object_pose", Image,
                                   queue_size=1)
        state = {"sub": None, "depth": None}

        def on_depth(msg):
            state["depth"] = ros_numpy.numpify(msg).astype(
                np.float32) / 1000.0

        def on_rgb(msg):
            state["sub"].unregister()  # backpressure (``ros:275``)
            rgb = ros_numpy.numpify(msg)[..., :3]
            res = self.service.process(rgb, state["depth"])
            pub_det.publish(ros_numpy.msgify(
                Image, res.detection_image, encoding="rgb8"))
            pub_pose.publish(ros_numpy.msgify(
                Image, res.pose_image, encoding="rgb8"))
            state["sub"] = rospy.Subscriber(cfg.rgb_topic, Image, on_rgb,
                                            queue_size=1)

        rospy.Subscriber(cfg.depth_topic, Image, on_depth, queue_size=1)
        state["sub"] = rospy.Subscriber(cfg.rgb_topic, Image, on_rgb,
                                        queue_size=1)
        rospy.spin()
