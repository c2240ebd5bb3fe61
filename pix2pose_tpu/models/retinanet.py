"""RetinaNet-style anchor detector — the alternative detection head.

The reference's T-Less paper results use fizyr keras-retinanet
(``5_evaluation_bop_basic.py:64-97``, ``README.md:60-63``) as an
alternative to Mask-RCNN. This is its TPU-native counterpart, sharing the
ResNet-50 trunk with the rest of the framework:

- FPN over the trunk taps extended to P3/P4/P5 (strides 8/16/32).
- 9 anchors per cell (3 scales x 3 ratios), focal classification
  (alpha .25, gamma 2) + smooth-L1 box regression on (dy,dx,dh,dw)
  deltas with the keras-retinanet std=0.2 scaling.
- Everything shape-static: anchor-target assignment is a jitted function
  of the scene composer's (gt_bbox, gt_cls, gt_valid) outputs; decoding
  is top-k over all anchors followed by a fixed-size greedy NMS
  (O(K^2) IoU matrix + lax.scan) — no dynamic shapes anywhere, so
  train-step and decode both compile once and batch across images.

Unlike the reference's retinanet path there is no mask head (theirs has
none either — boxes only, ``basic:83-97``); the detector adapter emits
box-shaped masks for the score_type-2 mask-IoU term.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pix2pose_tpu.models.resnet50 import ResNet50Trunk

BOX_STD = 0.2  # keras-retinanet delta scaling


class RetinaOut(NamedTuple):
    cls_logits: jnp.ndarray  # (B, A_total, C)
    box_deltas: jnp.ndarray  # (B, A_total, 4)


def anchor_boxes(im_size: int, strides: Sequence[int] = (8, 16, 32),
                 scales: Sequence[float] = (1.0, 1.26, 1.587),
                 ratios: Sequence[float] = (0.5, 1.0, 2.0),
                 base: float = 4.0) -> np.ndarray:
    """All anchors for a square ``im_size`` input, (A_total, 4) as
    [v1, u1, v2, u2] pixels. Level base size = ``base * stride``.

    ORDER CONTRACT: position-major within each level —
    ``index = (v * n + u) * (S*R) + (scale_i * R + ratio_i)`` — matching
    the head's ``(B, H, W, A*C) -> (B, H*W*A, C)`` reshape. An
    anchor-major layout here silently scrambles the prediction<->target
    correspondence (training plateaus, mAP ~0)."""
    out = []
    for s in strides:
        n = im_size // s
        cv = (np.arange(n) + 0.5) * s
        size = base * s
        hws = np.array([[size * sc * math.sqrt(r),
                         size * sc / math.sqrt(r)]
                        for sc in scales for r in ratios],
                       np.float64)  # (A, 2)
        vv, uu = np.meshgrid(cv, cv, indexing="ij")  # (n, n)
        ctr = np.stack([vv, uu], -1)[:, :, None, :]  # (n, n, 1, 2)
        half = hws[None, None, :, :] / 2              # (1, 1, A, 2)
        lvl = np.concatenate([ctr - half, ctr + half], axis=-1)
        out.append(lvl.reshape(-1, 4))
    return np.concatenate(out).astype(np.float32)


class RetinaNetDetector(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32
    head_dim: int = 128
    n_anchors: int = 9
    trunk: str = "resnet50"  # or "tiny"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.trunk == "tiny":
            from pix2pose_tpu.models.detector import TinyTrunk
            f1, f2, f3 = TinyTrunk(dtype=self.dtype, name="trunk")(x,
                                                                   train)
        else:
            f1, f2, f3 = ResNet50Trunk(dtype=self.dtype,
                                       name="trunk")(x, train)
        # extend the trunk (strides 4/8) to P3/P4/P5 (strides 8/16/32)
        c3 = f3  # stride 8
        c4 = nn.Conv(self.head_dim, (3, 3), strides=(2, 2),
                     padding="SAME", dtype=self.dtype, name="down4")(c3)
        c5 = nn.Conv(self.head_dim, (3, 3), strides=(2, 2),
                     padding="SAME", dtype=self.dtype,
                     name="down5")(nn.relu(c4))
        # FPN top-down
        p5 = nn.Conv(self.head_dim, (1, 1), dtype=self.dtype,
                     name="lat5")(c5)
        p4 = nn.Conv(self.head_dim, (1, 1), dtype=self.dtype,
                     name="lat4")(c4) + jax.image.resize(
            p5, (p5.shape[0], p5.shape[1] * 2, p5.shape[2] * 2,
                 p5.shape[3]), method="nearest")
        p3 = nn.Conv(self.head_dim, (1, 1), dtype=self.dtype,
                     name="lat3")(c3) + jax.image.resize(
            p4, (p4.shape[0], p4.shape[1] * 2, p4.shape[2] * 2,
                 p4.shape[3]), method="nearest")
        levels = [nn.Conv(self.head_dim, (3, 3), padding="SAME",
                          dtype=self.dtype, name=f"smooth{i}")(p)
                  for i, p in enumerate((p3, p4, p5))]

        # shared subnets across levels (RetinaNet design)
        def subnet(name, out_ch, bias_init=0.0):
            convs = [nn.Conv(self.head_dim, (3, 3), padding="SAME",
                             dtype=self.dtype, name=f"{name}_c{i}")
                     for i in range(4)]
            head = nn.Conv(out_ch, (3, 3), padding="SAME",
                           dtype=self.dtype, name=f"{name}_out",
                           bias_init=nn.initializers.constant(bias_init))

            def run(p):
                for cv in convs:
                    p = nn.relu(cv(p))
                return head(p)

            return run

        cls_run = subnet("cls", self.n_anchors * self.num_classes,
                         bias_init=-math.log((1 - 0.01) / 0.01))
        box_run = subnet("box", self.n_anchors * 4)
        cls_all, box_all = [], []
        for p in levels:
            b = p.shape[0]
            cls_all.append(cls_run(p).reshape(
                b, -1, self.num_classes).astype(jnp.float32))
            box_all.append(box_run(p).reshape(b, -1, 4).astype(
                jnp.float32))
        return RetinaOut(cls_logits=jnp.concatenate(cls_all, axis=1),
                         box_deltas=jnp.concatenate(box_all, axis=1))


# ------------------------------------------------------------- box algebra
def _to_cwh(boxes):
    cv = (boxes[..., 0] + boxes[..., 2]) / 2
    cu = (boxes[..., 1] + boxes[..., 3]) / 2
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    return cv, cu, h, w


def encode_deltas(anchors, boxes):
    """GT boxes -> regression targets relative to anchors."""
    av, au, ah, aw = _to_cwh(anchors)
    bv, bu, bh, bw = _to_cwh(boxes)
    return jnp.stack([(bv - av) / ah, (bu - au) / aw,
                      jnp.log(jnp.maximum(bh, 1.0) / ah),
                      jnp.log(jnp.maximum(bw, 1.0) / aw)],
                     axis=-1) / BOX_STD


def decode_deltas(anchors, deltas):
    """Regression outputs -> boxes."""
    av, au, ah, aw = _to_cwh(anchors)
    d = deltas * BOX_STD
    cv = av + d[..., 0] * ah
    cu = au + d[..., 1] * aw
    h = ah * jnp.exp(jnp.clip(d[..., 2], -4.0, 4.0))
    w = aw * jnp.exp(jnp.clip(d[..., 3], -4.0, 4.0))
    return jnp.stack([cv - h / 2, cu - w / 2, cv + h / 2, cu + w / 2],
                     axis=-1)


def iou_matrix(a, b):
    """(N,4) x (M,4) -> (N,M) IoU, [v1,u1,v2,u2]."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0) * jnp.clip(
        a[:, 3] - a[:, 1], 0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0) * jnp.clip(
        b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def assign_anchors(anchors, gt_bbox, gt_cls, gt_valid,
                   pos_iou: float = 0.5, neg_iou: float = 0.4):
    """Anchor-target assignment for ONE image (vmap over the batch).

    Returns (cls_target (A,C) 0/1, box_target (A,4) deltas,
    pos (A,) bool, ignore (A,) bool)."""
    big_neg = -1.0
    iou = iou_matrix(anchors, gt_bbox)  # (A, K)
    iou = jnp.where(gt_valid[None, :], iou, big_neg)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    pos = best_iou >= pos_iou
    # force each valid GT's best anchor positive — objects smaller than
    # the coarsest-matching anchor never reach pos_iou and would
    # otherwise train as background (observed: a perfectly-overfit model
    # scoring 0 on 3 of 4 GT boxes)
    k = gt_bbox.shape[0]
    n_a = anchors.shape[0]
    best_a = jnp.argmax(iou, axis=0)  # (K,)
    # scatter with collision-safe reductions: two valid GTs sharing one
    # best anchor resolve to the LOWER gt index (XLA .set() with
    # duplicate indices is order-unspecified), and invalid GTs (whose
    # all(-1) iou row makes argmax degenerate to anchor 0) are routed to
    # an out-of-bounds index and dropped instead of colliding at anchor 0
    safe_a = jnp.where(gt_valid, best_a, n_a)
    forced = jnp.zeros(n_a, jnp.int32).at[safe_a].max(
        gt_valid.astype(jnp.int32), mode="drop") > 0
    forced_gt = jnp.full(n_a, k, jnp.int32).at[safe_a].min(
        jnp.where(gt_valid, jnp.arange(k), k), mode="drop")
    best_gt = jnp.where(forced, jnp.minimum(forced_gt, k - 1), best_gt)
    pos = pos | forced
    ignore = (best_iou >= neg_iou) & ~pos
    cls_t_idx = gt_cls[best_gt]
    box_t = encode_deltas(anchors, gt_bbox[best_gt])
    return cls_t_idx, box_t, pos, ignore


def retinanet_loss(out: RetinaOut, anchors, gt_bbox, gt_cls, gt_valid,
                   num_classes: int, alpha: float = 0.25,
                   gamma: float = 2.0, pos_iou: float = 0.5,
                   neg_iou: float = 0.4):
    """Focal + smooth-L1 over a batch. gt_* carry (B, K, ...) axes."""

    def one(cls_logits, box_deltas, gb, gc, gv):
        cls_idx, box_t, pos, ignore = assign_anchors(
            anchors, gb, gc, gv, pos_iou=pos_iou, neg_iou=neg_iou)
        cls_t = jax.nn.one_hot(jnp.maximum(cls_idx, 0), num_classes) \
            * pos[:, None].astype(jnp.float32)
        p = jax.nn.sigmoid(cls_logits)
        pt = jnp.where(cls_t > 0, p, 1.0 - p)
        a_t = jnp.where(cls_t > 0, alpha, 1.0 - alpha)
        focal = -a_t * jnp.power(1 - pt, gamma) * jnp.log(
            jnp.clip(pt, 1e-6))
        focal = jnp.where(ignore[:, None], 0.0, focal)
        n_pos = jnp.maximum(jnp.sum(pos), 1.0)
        l_cls = jnp.sum(focal) / n_pos
        diff = jnp.abs(box_deltas - box_t)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        l_box = jnp.sum(sl1 * pos[:, None]) / n_pos
        return l_cls, l_box

    l_cls, l_box = jax.vmap(one)(out.cls_logits, out.box_deltas,
                                 gt_bbox, gt_cls, gt_valid)
    total = jnp.mean(l_cls) + jnp.mean(l_box)
    return total, {"cls": jnp.mean(l_cls), "box": jnp.mean(l_box)}


def decode_retinanet(out: RetinaOut, anchors, top_k: int = 64,
                     nms_iou: float = 0.5):
    """Top-k + fixed-size greedy class-aware NMS, fully shape-static.

    Returns (bbox (B,top_k,4), score (B,top_k), cls (B,top_k)); suppressed
    slots carry score 0."""
    anchors = jnp.asarray(anchors)  # numpy anchors + traced gather indices
    probs = jax.nn.sigmoid(out.cls_logits)  # (B, A, C)
    b, a, c = probs.shape
    flat = probs.reshape(b, a * c)
    score, idx = jax.lax.top_k(flat, top_k)
    cls = idx % c
    aidx = idx // c

    def nms_one(boxes_k, score_k, cls_k):
        iou = iou_matrix(boxes_k, boxes_k)
        same = cls_k[:, None] == cls_k[None, :]
        sup = (iou >= nms_iou) & same

        def body(keep, i):
            # suppressed by any earlier KEPT, higher-scored box?
            earlier = (jnp.arange(boxes_k.shape[0]) < i) & keep
            dead = jnp.any(sup[i] & earlier)
            keep = keep.at[i].set(~dead)
            return keep, None

        keep0 = jnp.ones(boxes_k.shape[0], bool)
        keep, _ = jax.lax.scan(body, keep0,
                               jnp.arange(boxes_k.shape[0]))
        return jnp.where(keep, score_k, 0.0)

    anchors_k = anchors[aidx]  # (B, top_k, 4)
    boxes = decode_deltas(anchors_k,
                          jnp.take_along_axis(out.box_deltas,
                                              aidx[..., None], axis=1))
    score = jax.vmap(nms_one)(boxes, score, cls)
    return boxes, score, cls
