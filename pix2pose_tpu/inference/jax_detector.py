"""Detector-protocol adapters around the trained in-repo detectors
(CenterNet and the RetinaNet-style anchor head)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.inference.detector import Detection
from pix2pose_tpu.models.detector import (CenterNetDetector,
                                          decode_detections)


class JaxDetector:
    """Runs the jitted detector and emits :class:`Detection` records with
    PER-INSTANCE masks from the CondInst dynamic mask head — the contract
    of the reference's Mask-RCNN (``tools/mask_rcnn_util.py:67-133``):
    two overlapping same-class instances get distinct masks, which the
    score_type-2 mask-IoU term and the ICP evaluator's occupancy gating
    depend on.

    The frame is anisotropically resized to the square training resolution
    (the on-device scene composer trains on fully-covered square images, so
    letterbox padding would be out-of-domain); boxes/masks are unscaled
    per axis on the way out.
    """

    def __init__(self, model: CenterNetDetector, variables,
                 class_to_obj_id, score_th: float = 0.3,
                 top_k: int = 32, input_size: int = 512):
        self.model = model
        self.variables = variables
        self.class_to_obj_id = list(class_to_obj_id)
        self.score_th = score_th
        self.input_size = input_size

        def _run(variables, img):
            out = model.apply(variables, img[None])
            return decode_detections(out, top_k=top_k, with_masks=True)

        self._run = jax.jit(_run)

    def detect(self, scene_id, im_id, rgb):
        h, w = rgb.shape[:2]
        s = self.input_size
        img = jnp.asarray(rgb, jnp.float32) / 255.0
        img = jax.image.resize(img, (s, s, 3), method="linear")
        det = jax.device_get(self._run(self.variables, img))
        sv = h / s  # square px -> image px
        su = w / s
        out = []
        from PIL import Image

        for i in range(det.score.shape[1]):
            sc = float(det.score[0, i])
            if sc < self.score_th:
                continue
            b = np.asarray(det.bbox[0, i])
            bbox = np.array([b[0] * sv, b[1] * su, b[2] * sv, b[3] * su])
            bbox = np.round(
                np.clip(bbox, [0, 0, 0, 0], [h - 1, w - 1, h - 1, w - 1])
            ).astype(np.int32)
            if bbox[2] - bbox[0] < 4 or bbox[3] - bbox[1] < 4:
                continue
            cls = int(det.cls[0, i])
            # this instance's stride-grid mask, resized to the frame
            m_res = np.asarray(Image.fromarray(
                np.asarray(det.mask[0, i]).astype(np.uint8) * 255).resize(
                (w, h), Image.BILINEAR)) > 127
            box_m = np.zeros((h, w), bool)
            box_m[bbox[0]:bbox[2] + 1, bbox[1]:bbox[3] + 1] = True
            out.append(Detection(bbox=bbox,
                                 obj_id=self.class_to_obj_id[cls],
                                 score=sc, mask=m_res & box_m))
        return out


class RetinaNetAdapter:
    """Detector protocol over :class:`RetinaNetDetector`.

    Mirrors the reference's keras-retinanet inference path
    (``5_evaluation_bop_basic.py:83-97``): boxes + scores only, no mask
    head — box-shaped masks stand in for the score_type-2 mask-IoU term
    exactly as the reference does there.
    """

    def __init__(self, model, variables, class_to_obj_id,
                 score_th: float = 0.3, top_k: int = 64,
                 input_size: int = 512, nms_iou: float = 0.5):
        from pix2pose_tpu.models.retinanet import (anchor_boxes,
                                                   decode_retinanet)

        self.model = model
        self.variables = variables
        self.class_to_obj_id = list(class_to_obj_id)
        self.score_th = score_th
        self.input_size = input_size
        anchors = jnp.asarray(anchor_boxes(input_size))

        def _run(variables, img):
            out = model.apply(variables, img[None])
            return decode_retinanet(out, anchors, top_k=top_k,
                                    nms_iou=nms_iou)

        self._run = jax.jit(_run)

    def detect(self, scene_id, im_id, rgb):
        h, w = rgb.shape[:2]
        s = self.input_size
        img = jnp.asarray(rgb, jnp.float32) / 255.0
        img = jax.image.resize(img, (s, s, 3), method="linear")
        boxes, scores, cls = jax.device_get(
            self._run(self.variables, img))
        sv, su = h / s, w / s
        out = []
        for i in range(scores.shape[1]):
            sc = float(scores[0, i])
            if sc < self.score_th:
                continue
            b = boxes[0, i]
            bbox = np.array([b[0] * sv, b[1] * su, b[2] * sv, b[3] * su])
            bbox = np.round(
                np.clip(bbox, [0, 0, 0, 0], [h - 1, w - 1, h - 1, w - 1])
            ).astype(np.int32)
            if bbox[2] - bbox[0] < 4 or bbox[3] - bbox[1] < 4:
                continue
            box_m = np.zeros((h, w), bool)
            box_m[bbox[0]:bbox[2] + 1, bbox[1]:bbox[3] + 1] = True
            out.append(Detection(bbox=bbox,
                                 obj_id=self.class_to_obj_id[
                                     int(cls[0, i])],
                                 score=sc, mask=box_m))
        return out
