"""BOP RGB-D evaluation driver with ICP refinement.

Mirrors ``tools/5_evaluation_bop_icp3d.py``:

- per-image sensor-cloud precompute (backprojection + normals,
  ``icp3d:372-374``) and valid-depth band 0.2-2.2 m (``icp3d:367``)
- per-hypothesis ICP refinement + depth-consistency scoring
  (:mod:`pix2pose_tpu.eval.icp_refine`)
- TWO-ROUND missing-object recovery (``icp3d:394-433``): round 0 runs the
  targeted detections with occupancy-IoU gating (skip ROIs >0.7 covered);
  round 1 re-tests unused ROIs against objects whose instance count is
  still unfilled, scored 0.001*fcn and accepted only when the depth-inlier
  ratio exceeds 0.5 (``icp3d:489,502``)
- occupancy map of accepted inlier pixels drives the gating
  (``icp3d:392,506``)

Host code orchestrates rounds/occupancy (inherently sequential, tiny);
every per-hypothesis computation (two-stage network, PnP, render, ICP,
scoring) runs in jitted device programs.
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.config import EvalConfig
from pix2pose_tpu.data.bop import BopDataset, get_target_list, \
    save_bop_results
from pix2pose_tpu.eval.icp_refine import (make_batch_icp_refiner,
                                          make_icp_refiner, stack_meshes)
from pix2pose_tpu.inference.engine import (Pix2PoseEstimator,
                                           stack_object_params)
from pix2pose_tpu.ops import geometry


def _bucket(n: int) -> int:
    """Next power of two ≥ n (shape buckets bound recompilation)."""
    b = 1
    while b < n:
        b *= 2
    return b


class BopEvaluatorICP:
    def __init__(self, dataset: BopDataset, cfg: EvalConfig,
                 estimator: Pix2PoseEstimator, params_by_obj: dict,
                 obj_params: dict, meshes_mm: dict, detector,
                 max_det: int = 8, method_name: str = "pix2pose-tpu-icp",
                 batched: bool = True, icp_max_faces: int | None = 40000,
                 use_instance_masks: bool = True, icp_iters: int = 30):
        """Args:
          estimator: one shared :class:`Pix2PoseEstimator` OR a dict
            {obj_id: estimator} (per-object ``outlier_th``; see
            :func:`pix2pose_tpu.inference.engine.estimators_for_objects`).
          meshes_mm: {obj_id: (verts_mm (V,3), faces (F,3))}.
          icp_max_faces: cluster-decimate denser meshes to this many
            faces for the ICP renders (None = render full meshes like the
            reference's CUDA path). Sub-mm geometric error vs the 20 mm
            depth-score band; face count sets the TPU render wall-clock.
          batched: run all hypotheses of an image per round through TWO
            launches (one object-vmapped engine pass + one hypothesis-
            batched ICP refine) instead of the reference's per-ROI serial
            loop (``5_evaluation_bop_icp3d.py:58-94,392-433``). Results
            match the serial path (same gating, replayed on host from the
            batched outputs); RANSAC key assignment differs.
        """
        self.ds = dataset
        self.cfg = cfg
        self.est = estimator
        self.params_by_obj = params_by_obj
        self.obj_params = obj_params
        self.detector = detector
        self.max_det = max_det
        self.method_name = method_name
        # feed detector instance masks into the engine (duplicate-instance
        # disambiguation; engine module docstring); False = reference
        # bbox-only est_pose behavior
        self.use_instance_masks = use_instance_masks
        im_w, im_h = dataset.im_size
        self.im_h, self.im_w = im_h, im_w
        if icp_max_faces is not None:
            from pix2pose_tpu.data.meshes import decimate_mesh
            meshes_mm = {o: decimate_mesh(v, f, icp_max_faces)
                         for o, (v, f) in meshes_mm.items()}
        self.refiners = {
            obj_id: make_icp_refiner(np.asarray(v) / 1000.0, f, im_h, im_w,
                                     icp_iters=icp_iters)
            for obj_id, (v, f) in meshes_mm.items()}
        # dropped binned-rasterizer work pairs across all refines (see
        # RenderOut.overflow); nonzero => some ICP renders truncated
        self.render_overflow = 0
        self._normals = jax.jit(
            lambda d, k: geometry.normals_from_depth(d, k, refine=True))
        self._backproject = jax.jit(geometry.backproject)

        # ---- batched-path object bank ----
        self._obj_list = sorted(set(params_by_obj) & set(meshes_mm))
        self.batched = batched and bool(self._obj_list)
        if self.batched:
            self._obj_index = {o: i for i, o in enumerate(self._obj_list)}
            self._stacked_params = stack_object_params(
                [params_by_obj[o] for o in self._obj_list])
            self._obj_params_stack = np.stack(
                [np.asarray(obj_params[o], np.float32)
                 for o in self._obj_list])
            sv, sf = stack_meshes(
                [(np.asarray(meshes_mm[o][0]) / 1000.0, meshes_mm[o][1])
                 for o in self._obj_list])
            self._refine_batch = make_batch_icp_refiner(
                sv, sf, im_h, im_w, icp_iters=icp_iters)
            # one engine instance + runtime per-object thresholds
            if isinstance(estimator, dict):
                ests = [estimator[o] for o in self._obj_list]
                ths = [e.cfg.outlier_th for e in ests]
                if len({len(t) for t in ths}) != 1:
                    self.batched = False  # ragged T: keep the serial path
                else:
                    self._batch_est = ests[0]
                    self._outlier_th_stack = np.asarray(ths, np.float32)
            else:
                self._batch_est = estimator
                self._outlier_th_stack = np.tile(np.asarray(
                    estimator.cfg.outlier_th, np.float32)[None],
                    (len(self._obj_list), 1))

    # ------------------------------------------------------------------
    def run(self, target_list=None, out_dir: str | None = None, key=None):
        cfg, ds = self.cfg, self.ds
        if target_list is None:
            target_list = get_target_list(
                os.path.join(ds.dir, cfg.test_target + ".json"))
        key = key if key is not None else jax.random.PRNGKey(0)
        results = []
        scene_cams = {}
        for scene_id, im_id, obj_id_targets, inst_counts in target_list:
            if scene_id not in scene_cams:
                scene_cams[scene_id] = ds.scene_camera(scene_id)
            cam = scene_cams[scene_id][im_id]
            rgb = ds.load_rgb(scene_id, im_id)
            depth = ds.load_depth(scene_id, im_id, cam["depth_scale"])
            t1 = time.time()
            key, sub = jax.random.split(key)
            rows = self._process_image(rgb, depth, cam["cam_K"],
                                       scene_id, im_id, obj_id_targets,
                                       inst_counts, sub)
            dt = time.time() - t1
            if not rows:
                continue
            scores = np.array([r["score"] for r in rows])
            scores = scores / max(scores.max(), 1e-12)
            order = np.argsort(1 - scores)
            inst_est = np.zeros(len(inst_counts))
            total = 0
            n_inst = int(np.sum(inst_counts))
            for ridx in order:
                row = rows[ridx]
                gt_no = obj_id_targets.index(row["obj_id"])
                inst_est[gt_no] += 1
                if cfg.task_type == 2 and inst_est[gt_no] > \
                        inst_counts[gt_no]:
                    continue
                results.append({"scene_id": scene_id, "im_id": im_id,
                                "obj_id": row["obj_id"],
                                "score": float(scores[ridx]),
                                "R": row["R"], "t": row["t"], "time": dt})
                total += 1
                if cfg.task_type == 2 and total > n_inst:
                    break
        if self.render_overflow:
            import warnings
            warnings.warn(
                f"{self.render_overflow} rasterizer work pairs dropped "
                "during ICP renders — depth scores may be computed on "
                "truncated renders; raise render pair_factor or lower "
                "icp_max_faces", RuntimeWarning)
        if out_dir:
            suffix = ("-test-primesense.csv" if ds.name == "tless"
                      else "-test.csv")
            save_bop_results(
                os.path.join(out_dir, f"{self.method_name}_{ds.name}"
                             f"{suffix}"), results)
        return results

    # ------------------------------------------------------------------
    def _process_image(self, rgb, depth, cam_k, scene_id, im_id,
                       obj_id_targets, inst_counts, key):
        fn = (self._process_image_batched if self.batched
              else self._process_image_serial)
        return fn(rgb, depth, cam_k, scene_id, im_id, obj_id_targets,
                  inst_counts, key)

    # ------------------------------------------------------------------
    # Serial path: one launch per hypothesis, mirroring the reference's
    # per-ROI loop. Kept as the behavioral oracle for the batched path.
    def _process_image_serial(self, rgb, depth, cam_k, scene_id, im_id,
                              obj_id_targets, inst_counts, key):
        # speckle removal before the cloud+normal precompute — isolated
        # gross depth outliers otherwise corrupt the gradient-based
        # normals over their whole smoothing neighborhood (see
        # geometry.despeckle_depth)
        depth = geometry.despeckle_depth_np(depth)
        depth_valid = (depth > 0.2) & (depth < 2.2)  # ``icp3d:367``
        tgt_pts = self._backproject(jnp.asarray(depth), cam_k)
        tgt_normals = self._normals(jnp.asarray(depth), cam_k)

        detections = self.detector.detect(scene_id, im_id, rgb)
        rows = []
        occupancy = np.zeros(rgb.shape[:2], np.int32)
        roi_used: set[int] = set()
        inst_pred = np.zeros(len(obj_id_targets))

        for rounds in range(2):
            for r_id, det in enumerate(detections):
                if rounds == 1 and r_id in roi_used:
                    continue
                det_mask = det.mask if det.mask is not None else None
                if det_mask is None:
                    continue
                if rounds == 0:
                    if det.obj_id not in obj_id_targets:
                        continue
                    obj_occ = occupancy == det.obj_id
                    iou = _iou(obj_occ, det_mask)
                    if iou > 0.7:  # ``icp3d:409-411``
                        continue
                    candidates = [det.obj_id]
                else:
                    candidates = [
                        obj for gt_no, obj in enumerate(obj_id_targets)
                        if inst_pred[gt_no] < inst_counts[gt_no]]
                    if not candidates:
                        break
                    if _iou(occupancy != 0, det_mask) > 0.7:
                        continue  # ``icp3d:431-433``

                best = None
                for obj_id in candidates:
                    if obj_id not in self.params_by_obj:
                        continue
                    key, k1, k2 = jax.random.split(key, 3)
                    pose = self._est_pose_single(rgb, cam_k, obj_id,
                                                 det.bbox, k1,
                                                 mask=det_mask)
                    if pose is None:
                        continue
                    R0, t0 = pose
                    if t0[2] / 1000.0 < 0.2:  # ``icp3d:451-452``
                        continue
                    union = det_mask & depth_valid
                    if union.sum() <= 30:  # ``icp3d:457-460``
                        continue
                    ref = self.refiners[obj_id](
                        jnp.asarray(R0), jnp.asarray(t0), cam_k,
                        jnp.asarray(union), jnp.asarray(depth), tgt_pts,
                        tgt_normals, k2)
                    fcn = float(ref.score)
                    self.render_overflow += int(ref.overflow)
                    score = (det.score * fcn if rounds == 0
                             else 0.001 * fcn)  # ``icp3d:487-489``
                    if best is None or score > best["score"]:
                        best = {"obj_id": obj_id, "score": score,
                                "R": np.asarray(ref.R),
                                "t": np.asarray(ref.t_mm),
                                "ratio": float(ref.ratio),
                                "inlier": np.asarray(ref.inlier_mask)}
                if best is not None and best["score"] > 0:
                    if rounds == 0 or best["ratio"] > 0.5:  # ``icp3d:502``
                        gt_no = obj_id_targets.index(best["obj_id"])
                        inst_pred[gt_no] += 1
                        occupancy[best["inlier"]] = best["obj_id"]
                        roi_used.add(r_id)
                    rows.append({"obj_id": best["obj_id"],
                                 "score": best["score"],
                                 "R": best["R"], "t": best["t"]})
        return rows

    # ------------------------------------------------------------------
    # Batched path: per round, ONE object-vmapped engine launch for every
    # (ROI, candidate-object) pair plus ONE hypothesis-batched ICP refine
    # launch; the reference's sequential gating (occupancy IoU, instance
    # fill, round-1 acceptance) is replayed on host from the batched
    # outputs. Gating only decides which results are USED — hypothesis
    # computation is gate-independent, so results match the serial path.
    def _process_image_batched(self, rgb, depth, cam_k, scene_id, im_id,
                               obj_id_targets, inst_counts, key):
        # speckle removal, as in the serial path
        depth = geometry.despeckle_depth_np(depth)
        depth_j = jnp.asarray(depth)
        depth_valid = (depth > 0.2) & (depth < 2.2)  # ``icp3d:367``
        tgt_pts = self._backproject(depth_j, cam_k)
        tgt_normals = self._normals(depth_j, cam_k)

        detections = self.detector.detect(scene_id, im_id, rgb)
        rows = []
        occupancy = np.zeros(rgb.shape[:2], np.int32)
        roi_used: set[int] = set()
        inst_pred = np.zeros(len(obj_id_targets))

        for rounds in range(2):
            # 1. candidate (r_id, obj_id) pairs — a superset of what the
            # gating replay will use (round-1 unfilled set only shrinks)
            if rounds == 0:
                pairs = [
                    (r_id, det.obj_id)
                    for r_id, det in enumerate(detections)
                    if det.mask is not None
                    and det.obj_id in obj_id_targets
                    and det.obj_id in self._obj_index]
            else:
                unfilled = [
                    obj for gt_no, obj in enumerate(obj_id_targets)
                    if inst_pred[gt_no] < inst_counts[gt_no]
                    and obj in self._obj_index]
                if not unfilled:
                    break
                pairs = [
                    (r_id, obj) for r_id, det in enumerate(detections)
                    if r_id not in roi_used and det.mask is not None
                    for obj in unfilled]
            if not pairs:
                continue

            key, k_est, k_ref = jax.random.split(key, 3)
            poses = self._estimate_pairs(rgb, cam_k, detections, pairs,
                                         k_est)
            refined = self._refine_pairs(detections, pairs, poses,
                                         depth_valid, cam_k, depth_j,
                                         tgt_pts, tgt_normals, k_ref)

            # 2. replay the serial gating in detection order
            for r_id, det in enumerate(detections):
                if rounds == 1 and r_id in roi_used:
                    continue
                if det.mask is None:
                    continue
                if rounds == 0:
                    if det.obj_id not in obj_id_targets:
                        continue
                    if _iou(occupancy == det.obj_id, det.mask) > 0.7:
                        continue  # ``icp3d:409-411``
                    candidates = [det.obj_id]
                else:
                    candidates = [
                        obj for gt_no, obj in enumerate(obj_id_targets)
                        if inst_pred[gt_no] < inst_counts[gt_no]]
                    if not candidates:
                        break
                    if _iou(occupancy != 0, det.mask) > 0.7:
                        continue  # ``icp3d:431-433``

                best = None
                for obj_id in candidates:
                    r = refined.get((r_id, obj_id))
                    if r is None:
                        continue
                    score = (det.score * r["fcn"] if rounds == 0
                             else 0.001 * r["fcn"])  # ``icp3d:487-489``
                    if best is None or score > best["score"]:
                        best = dict(r, obj_id=obj_id, score=score)
                if best is not None and best["score"] > 0:
                    if rounds == 0 or best["ratio"] > 0.5:  # ``icp3d:502``
                        gt_no = obj_id_targets.index(best["obj_id"])
                        inst_pred[gt_no] += 1
                        occupancy[best["inlier"]] = best["obj_id"]
                        roi_used.add(r_id)
                    rows.append({"obj_id": best["obj_id"],
                                 "score": best["score"],
                                 "R": best["R"], "t": best["t"]})
        return rows

    def _estimate_pairs(self, rgb, cam_k, detections, pairs, key):
        """One engine launch for every (ROI, object) pair: pairs are packed
        into per-object detection slots of an (O, N) grid and run through
        :meth:`Pix2PoseEstimator.estimate_objects`. Returns
        {(r_id, obj_id): (R, t)} for pairs with a valid pose."""
        n_obj = len(self._obj_list)
        per_obj: dict[int, list[int]] = {}
        for r_id, obj in pairs:
            per_obj.setdefault(self._obj_index[obj], []).append(r_id)
        n_pad = _bucket(max(len(v) for v in per_obj.values()))
        bboxes = np.zeros((n_obj, n_pad, 4), np.int32)
        valid = np.zeros((n_obj, n_pad), bool)
        have_masks = self.use_instance_masks and all(
            detections[r_id].mask is not None for r_id, _ in pairs)
        det_masks = (np.zeros((n_obj, n_pad) + rgb.shape[:2], bool)
                     if have_masks else None)
        slots = {}
        for o_idx, r_ids in per_obj.items():
            for s, r_id in enumerate(r_ids):
                bboxes[o_idx, s] = detections[r_id].bbox
                valid[o_idx, s] = True
                if have_masks:
                    det_masks[o_idx, s] = detections[r_id].mask
                slots[(r_id, self._obj_list[o_idx])] = (o_idx, s)

        out = self._batch_est.estimate_objects(
            self._stacked_params, rgb, bboxes, valid, cam_k,
            self._obj_params_stack, jax.random.split(key, n_obj),
            self._outlier_th_stack,
            det_masks=(jnp.asarray(det_masks) if have_masks else None))
        ok = np.asarray(out.valid)
        R = np.asarray(out.R)
        t = np.asarray(out.t)
        return {pair: (R[o, s], t[o, s])
                for pair, (o, s) in slots.items() if ok[o, s]}

    def _refine_pairs(self, detections, pairs, poses, depth_valid, cam_k,
                      depth_j, tgt_pts, tgt_normals, key):
        """One batched ICP launch over all surviving hypotheses. Applies
        the serial path's pre-filters (pose found, t_z ≥ 200 mm
        ``icp3d:451-452``, union > 30 px ``icp3d:457-460``) and returns
        {(r_id, obj_id): {fcn, ratio, R, t, inlier}}."""
        unions = {}
        hyps = []
        for r_id, obj_id in pairs:
            pose = poses.get((r_id, obj_id))
            if pose is None:
                continue
            R0, t0 = pose
            if t0[2] / 1000.0 < 0.2:
                continue
            if r_id not in unions:
                unions[r_id] = detections[r_id].mask & depth_valid
            if unions[r_id].sum() <= 30:
                continue
            hyps.append((r_id, obj_id, R0, t0))
        if not hyps:
            return {}

        h_pad = _bucket(len(hyps))
        obj_idx = np.zeros(h_pad, np.int32)
        Rs = np.tile(np.eye(3, dtype=np.float32), (h_pad, 1, 1))
        ts = np.zeros((h_pad, 3), np.float32)
        u_masks = np.zeros((h_pad,) + depth_valid.shape, bool)
        for i, (r_id, obj_id, R0, t0) in enumerate(hyps):
            obj_idx[i] = self._obj_index[obj_id]
            Rs[i] = R0
            ts[i] = t0
            u_masks[i] = unions[r_id]

        ref = self._refine_batch(
            jnp.asarray(obj_idx), jnp.asarray(Rs), jnp.asarray(ts), cam_k,
            jnp.asarray(u_masks), depth_j, tgt_pts, tgt_normals,
            jax.random.split(key, h_pad))
        fcn = np.asarray(ref.score)
        ratio = np.asarray(ref.ratio)
        self.render_overflow += int(np.sum(np.asarray(
            ref.overflow)[:len(hyps)]))
        R_ref = np.asarray(ref.R)
        t_ref = np.asarray(ref.t_mm)
        inlier = np.asarray(ref.inlier_mask)
        return {(r_id, obj_id): {
                    "fcn": float(fcn[i]), "ratio": float(ratio[i]),
                    "R": R_ref[i], "t": t_ref[i], "inlier": inlier[i]}
                for i, (r_id, obj_id, _, _) in enumerate(hyps)}

    def _est_for(self, obj_id) -> Pix2PoseEstimator:
        if isinstance(self.est, dict):
            return self.est[obj_id]
        return self.est

    def _est_pose_single(self, rgb, cam_k, obj_id, bbox, key, mask=None):
        n = self.max_det
        bboxes = np.zeros((n, 4), np.int32)
        bboxes[0] = bbox
        valid = np.zeros(n, bool)
        valid[0] = True
        det_masks = None
        if mask is not None and self.use_instance_masks:
            det_masks = np.zeros((n,) + rgb.shape[:2], bool)
            det_masks[0] = mask
            det_masks = jnp.asarray(det_masks)
        out = self._est_for(obj_id)(
            self.params_by_obj[obj_id], rgb, bboxes, valid,
            cam_k, self.obj_params[obj_id], key, det_masks=det_masks)
        if not bool(out.valid[0]):
            return None
        return np.asarray(out.R[0]), np.asarray(out.t[0])


def _iou(a, b):
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 0.0
    return np.logical_and(a, b).sum() / union


def main(argv=None):
    """CLI mirroring ``python3 tools/5_evaluation_bop_icp3d.py <gpu> <cfg>
    <dataset>`` (JAX-native device selection, so no gpu arg)."""
    import argparse
    import json

    from pix2pose_tpu.config import load_eval_config
    from pix2pose_tpu.data.ply import load_ply
    from pix2pose_tpu.inference.detector import (GtDetector,
                                                 PrecomputedDetector)
    from pix2pose_tpu.models import build_generator
    from pix2pose_tpu.ops.color import obj_param_from_norm_factor
    from pix2pose_tpu.utils import checkpoint as ckpt_util

    p = argparse.ArgumentParser()
    p.add_argument("cfg")
    p.add_argument("dataset")
    p.add_argument("--detections", default=None)
    p.add_argument("--max-det", type=int, default=8)
    args = p.parse_args(argv)

    cfg = load_eval_config(args.cfg)
    ds = BopDataset(cfg.dataset_dir, args.dataset, train=False)
    with open(os.path.join(ds.dir, "models_xyz", cfg.norm_factor_fn)) as f:
        norm = json.load(f)

    from pix2pose_tpu.inference.engine import estimators_for_objects

    model = build_generator(cfg.backbone)
    # per-object estimator configs (``5_evaluation_bop_basic.py:164-170``)
    est = estimators_for_objects(model, cfg, ds.model_ids)
    params_by_obj, obj_params, meshes = {}, {}, {}
    for obj_id in ds.model_ids:
        if cfg.target_obj and obj_id not in cfg.target_obj:
            continue
        wdir = os.path.join(ds.dir, "pix2pose_weights", f"{obj_id:02d}")
        variables = ckpt_util.load_inference_params(wdir, model)
        if variables is None:
            print(f"skip obj {obj_id}: no weights under {wdir}")
            continue
        params_by_obj[obj_id] = variables
        obj_params[obj_id] = obj_param_from_norm_factor(norm[str(obj_id)])
        mesh = load_ply(ds.model_ply_path(obj_id))
        meshes[obj_id] = (mesh["pts"], mesh["faces"])

    detector = (PrecomputedDetector(args.detections) if args.detections
                else GtDetector(ds))
    ev = BopEvaluatorICP(ds, cfg, est, params_by_obj, obj_params, meshes,
                         detector, max_det=args.max_det)
    results = ev.run(out_dir=cfg.path_to_output)
    print(f"{len(results)} results written to {cfg.path_to_output}")


if __name__ == "__main__":
    main()
