"""Trainable 2D detector (TPU-native replacement for the reference's
external Mask-RCNN / keras-retinanet, ``5_evaluation_bop_basic.py:37-101``).

A center-point detector on the shared ResNet-50 trunk: FPN-lite fusion of
the stage taps to stride 4, then four dense heads:

  - ``heat``: per-class center heatmap (focal loss)
  - ``wh``:   box height/width at centers (L1)
  - ``off``:  sub-stride center offset (L1)
  - ``seg``:  per-class semantic mask logits (BCE) — box-cropped at
              inference to stand in for Mask-RCNN instance masks in the
              score_type-2 mask-IoU term (``basic:307-316``)

Decoding is shape-static: 3x3 max-pool NMS on the heatmap, global top-k
peaks, vectorized box/mask assembly — no dynamic shapes, so detection jits
end-to-end and batches across images.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pix2pose_tpu.models.resnet50 import ResNet50Trunk


class DetectorOut(NamedTuple):
    heat: jnp.ndarray  # (B, H/4, W/4, C) logits
    wh: jnp.ndarray    # (B, H/4, W/4, 2)
    off: jnp.ndarray   # (B, H/4, W/4, 2)
    seg: jnp.ndarray   # (B, H/4, W/4, C) logits


class TinyTrunk(nn.Module):
    """Small conv trunk with the same (f1, f2, f3) tap contract as
    :class:`ResNet50Trunk` (strides 2/4/8) — for fast experiments and
    CPU-speed tests; the production detector uses the ResNet-50 trunk."""

    dtype: Any = jnp.float32
    width: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def block(y, ch, stride, name):
            y = nn.Conv(ch, (3, 3), strides=(stride, stride),
                        padding="SAME", dtype=self.dtype,
                        name=f"{name}_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"{name}_bn")(y)
            return nn.relu(y)

        f1 = block(x, self.width, 2, "b1")
        f2 = block(f1, self.width * 2, 2, "b2")
        f2 = block(f2, self.width * 2, 1, "b2b")
        f3 = block(f2, self.width * 4, 2, "b3")
        f3 = block(f3, self.width * 4, 1, "b3b")
        return f1, f2, f3


class CenterNetDetector(nn.Module):
    num_classes: int
    dtype: Any = jnp.float32
    head_dim: int = 128
    trunk: str = "resnet50"  # or "tiny"

    @nn.compact
    def __call__(self, x, train: bool = False):
        trunk_cls = TinyTrunk if self.trunk == "tiny" else ResNet50Trunk
        f1, f2, f3 = trunk_cls(dtype=self.dtype, name="trunk")(x, train)
        # FPN-lite: stride8 -> stride4 fusion
        p3 = nn.Conv(self.head_dim, (1, 1), dtype=self.dtype,
                     name="lat3")(f3)
        p3 = jax.image.resize(p3, (p3.shape[0], p3.shape[1] * 2,
                                   p3.shape[2] * 2, p3.shape[3]),
                              method="nearest")
        p2 = nn.Conv(self.head_dim, (1, 1), dtype=self.dtype,
                     name="lat2")(f2)
        p = p2 + p3
        p = nn.Conv(self.head_dim, (3, 3), padding="SAME", dtype=self.dtype,
                    name="fuse")(p)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="fuse_bn")(p)
        p = nn.relu(p)

        def head(name, ch, bias_init=0.0):
            y = nn.Conv(self.head_dim, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"{name}_conv")(p)
            y = nn.relu(y)
            y = nn.Conv(ch, (1, 1), dtype=self.dtype, name=f"{name}_out",
                        bias_init=nn.initializers.constant(bias_init))(y)
            return y.astype(jnp.float32)

        return DetectorOut(
            heat=head("heat", self.num_classes, bias_init=-2.19),  # p~0.1
            wh=head("wh", 2),
            off=head("off", 2),
            seg=head("seg", self.num_classes, bias_init=-2.19),
        )


class Detections(NamedTuple):
    """Top-k decoded detections (fixed k; filter by score on host)."""

    bbox: jnp.ndarray    # (B, K, 4) [v1, u1, v2, u2] image pixels
    score: jnp.ndarray   # (B, K)
    cls: jnp.ndarray     # (B, K) class index (0-based)
    center: jnp.ndarray  # (B, K, 2) (v, u)


def decode_detections(out: DetectorOut, top_k: int = 32,
                      stride: int = 4) -> Detections:
    """Heatmap peaks -> boxes, shape-static (CenterNet decode)."""
    heat = jax.nn.sigmoid(out.heat)
    # 3x3 max-pool NMS
    pooled = nn.max_pool(heat, (3, 3), strides=(1, 1), padding="SAME")
    heat = jnp.where(jnp.abs(heat - pooled) < 1e-6, heat, 0.0)
    b, h, w, c = heat.shape
    flat = heat.reshape(b, h * w * c)
    score, idx = jax.lax.top_k(flat, top_k)
    cls = idx % c
    pix = idx // c
    pv = (pix // w).astype(jnp.float32)
    pu = (pix % w).astype(jnp.float32)

    def gather_hw(maps, pix_idx):
        flatm = maps.reshape(b, h * w, maps.shape[-1])
        return jnp.take_along_axis(
            flatm, pix_idx[..., None].astype(jnp.int32), axis=1)

    off = gather_hw(out.off, pix)  # (B,K,2)
    wh = gather_hw(out.wh, pix)    # (B,K,2)
    cv = (pv + off[..., 0]) * stride
    cu = (pu + off[..., 1]) * stride
    hh = jnp.maximum(wh[..., 0], 0.0) * stride
    ww = jnp.maximum(wh[..., 1], 0.0) * stride
    bbox = jnp.stack([cv - hh / 2, cu - ww / 2, cv + hh / 2, cu + ww / 2],
                     axis=-1)
    return Detections(bbox=bbox, score=score, cls=cls,
                      center=jnp.stack([cv, cu], axis=-1))


def focal_loss(heat_logits, heat_gt, alpha: float = 2.0,
               beta: float = 4.0):
    """Penalty-reduced pixel-wise focal loss (CenterNet/CornerNet form).

    ``heat_gt`` is the splatted gaussian target in [0, 1]; only exact 1.0
    counts as a positive."""
    p = jax.nn.sigmoid(heat_logits)
    pos = (heat_gt >= 1.0).astype(jnp.float32)
    neg_w = jnp.power(1.0 - heat_gt, beta)
    eps = 1e-6
    pos_loss = -jnp.power(1.0 - p, alpha) * jnp.log(p + eps) * pos
    neg_loss = -jnp.power(p, alpha) * jnp.log(1.0 - p + eps) * neg_w * (
        1.0 - pos)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (jnp.sum(pos_loss) + jnp.sum(neg_loss)) / n_pos


def detector_loss(out: DetectorOut, targets: dict,
                  w_heat: float = 1.0, w_wh: float = 0.1,
                  w_off: float = 1.0, w_seg: float = 1.0):
    """Total loss. targets: ``heat`` (B,h,w,C) gaussian, ``wh`` (B,h,w,2),
    ``off`` (B,h,w,2), ``reg_mask`` (B,h,w) 1 at centers, ``seg`` (B,h,w,C)
    binary."""
    l_heat = focal_loss(out.heat, targets["heat"])
    m = targets["reg_mask"][..., None]
    n_pos = jnp.maximum(jnp.sum(targets["reg_mask"]), 1.0)
    l_wh = jnp.sum(jnp.abs(out.wh - targets["wh"]) * m) / n_pos
    l_off = jnp.sum(jnp.abs(out.off - targets["off"]) * m) / n_pos
    seg_gt = targets["seg"]
    l_seg = jnp.mean(
        jnp.maximum(out.seg, 0) - out.seg * seg_gt
        + jnp.log1p(jnp.exp(-jnp.abs(out.seg))))
    total = (w_heat * l_heat + w_wh * l_wh + w_off * l_off
             + w_seg * l_seg)
    return total, {"heat": l_heat, "wh": l_wh, "off": l_off, "seg": l_seg}
