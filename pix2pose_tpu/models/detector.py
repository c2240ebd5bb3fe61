"""Trainable 2D detector (TPU-native replacement for the reference's
external Mask-RCNN / keras-retinanet, ``5_evaluation_bop_basic.py:37-101``).

A center-point detector on the shared ResNet-50 trunk: FPN-lite fusion of
the stage taps to stride 4, then dense heads:

  - ``heat``: per-class center heatmap (focal loss)
  - ``wh``:   box height/width at centers (L1)
  - ``off``:  sub-stride center offset (L1)
  - ``seg``:  per-class semantic mask logits (BCE, auxiliary supervision)
  - ``ctrl``/``mfeat``: per-pixel dynamic-conv weights + shared mask
    features for PER-INSTANCE masks (CondInst-style): each center peak's
    ctrl vector parameterizes a tiny 3-layer 1x1-conv FCN evaluated over
    ``mfeat`` plus peak-relative coordinates. This supplies true instance
    masks — the contract of the reference's Mask-RCNN
    (``tools/mask_rcnn_util.py:67-133``), consumed by score_type-2
    mask-IoU (``5_evaluation_bop_basic.py:307-316``) and the ICP
    evaluator's occupancy gating/unions
    (``5_evaluation_bop_icp3d.py:392-433``) — two overlapping same-class
    instances get distinct masks, which a semantic seg head cannot do.

Decoding is shape-static: 3x3 max-pool NMS on the heatmap, global top-k
peaks, vectorized box/mask assembly; the dynamic mask FCN is three
einsums over (K, hs*ws, C) — no dynamic shapes, so detection jits
end-to-end and batches across images.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pix2pose_tpu.models.resnet50 import ResNet50Trunk


MASK_DIM = 8        # channels of the shared mask-feature map
_CTRL_IN = MASK_DIM + 2  # + 2 peak-relative coordinate channels
# dynamic FCN: (in->8) + (8->8) + (8->1), weights+biases flattened
N_CTRL = (_CTRL_IN * 8 + 8) + (8 * 8 + 8) + (8 * 1 + 1)
REL_NORM = 16.0     # stride-grid units; ~64 px at stride 4


class DetectorOut(NamedTuple):
    heat: jnp.ndarray  # (B, H/4, W/4, C) logits
    wh: jnp.ndarray    # (B, H/4, W/4, 2)
    off: jnp.ndarray   # (B, H/4, W/4, 2)
    seg: jnp.ndarray   # (B, H/4, W/4, C) logits
    ctrl: jnp.ndarray  # (B, H/4, W/4, N_CTRL) dynamic mask-FCN params
    mfeat: jnp.ndarray  # (B, H/4, W/4, MASK_DIM) shared mask features


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
    """``fused_heads`` computes the six heads' 3x3 hidden convs as ONE
    (head_dim -> 6*head_dim) conv — mathematically identical to six
    separate convs (concatenated output channels, elementwise ReLU,
    per-head 1x1 outputs on channel slices) but a single large MXU
    contraction instead of six 128-wide ones re-reading the same input;
    the heads are ~55%% of the model's FLOPs at 384^2. ``stem_s2d``
    runs the trunk's input conv on space-to-depth input (see
    :class:`~pix2pose_tpu.models.resnet50.ResNet50Trunk`). Both are
    exact-equivalence rewrites (tested), on by default; set False to
    load pre-round-4 checkpoints. Measured step-time-NEUTRAL at batch
    32 @ 384^2 bf16 (68.19 vs 68.26 ms pooled step) — the train step is
    HBM-traffic-bound, so removing ~1e12 flops buys no wall-clock; kept
    because they're free and leave the MXU headroom for anything that
    does become flops-bound (docs/PARITY.md "Detector train step")."""

    num_classes: int
    dtype: Any = jnp.float32
    head_dim: int = 128
    trunk: str = "resnet50"  # or "tiny"
    fused_heads: bool = True
    stem_s2d: bool = True
    # >0: ONE shared 3x3 hidden of this width feeds every head's 1x1
    # (not an exact rewrite — heads share features; a 3x cheaper head
    # stage at 256 than six private 128s). Measured NOT worth the mAP
    # risk: deleting 1e12 of head FLOPs saved only 4 ms — the step is
    # HBM-bound, not flops-bound (docs/PARITY.md "Detector train
    # steps").
    shared_head_dim: int = 0
    # rematerialize trunk bottlenecks in backward (gradients identical).
    # Measured NEGATIVE at batch 32 @ 384^2 bf16: 75.2 vs 68.3 ms — the
    # recompute's extra activation reads exceed the backward-pass
    # traffic it saves at these shapes. Kept as a knob for
    # memory-limited configs (bigger batch / higher res), not speed.
    trunk_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.trunk == "tiny":
            f1, f2, f3 = TinyTrunk(dtype=self.dtype, name="trunk")(x, train)
        else:
            f1, f2, f3 = ResNet50Trunk(dtype=self.dtype,
                                       stem_s2d=self.stem_s2d,
                                       remat=self.trunk_remat,
                                       name="trunk")(x, train)
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

        if self.shared_head_dim:
            hidden = nn.relu(nn.Conv(
                self.shared_head_dim, (3, 3), padding="SAME",
                dtype=self.dtype, name="heads_conv")(p))

            def head(name, ch, bias_init=0.0):
                y = nn.Conv(ch, (1, 1), dtype=self.dtype,
                            name=f"{name}_out",
                            bias_init=nn.initializers.constant(
                                bias_init))(hidden)
                return y.astype(jnp.float32)
        elif self.fused_heads:
            hidden = nn.relu(nn.Conv(
                self.head_dim * 6, (3, 3), padding="SAME",
                dtype=self.dtype, name="heads_conv")(p))
            slot = iter(range(6))

            def head(name, ch, bias_init=0.0):
                i = next(slot)
                y = hidden[..., i * self.head_dim:(i + 1) * self.head_dim]
                y = nn.Conv(ch, (1, 1), dtype=self.dtype,
                            name=f"{name}_out",
                            bias_init=nn.initializers.constant(
                                bias_init))(y)
                return y.astype(jnp.float32)
        else:
            def head(name, ch, bias_init=0.0):
                y = nn.Conv(self.head_dim, (3, 3), padding="SAME",
                            dtype=self.dtype, name=f"{name}_conv")(p)
                y = nn.relu(y)
                y = nn.Conv(ch, (1, 1), dtype=self.dtype,
                            name=f"{name}_out",
                            bias_init=nn.initializers.constant(
                                bias_init))(y)
                return y.astype(jnp.float32)

        return DetectorOut(
            heat=head("heat", self.num_classes, bias_init=-2.19),  # p~0.1
            wh=head("wh", 2),
            off=head("off", 2),
            seg=head("seg", self.num_classes, bias_init=-2.19),
            ctrl=head("ctrl", N_CTRL),
            mfeat=head("mfeat", MASK_DIM),
        )


def _split_ctrl(ctrl):
    """Flat (N_CTRL,) vector -> dynamic FCN weight/bias pytree."""
    i = 0

    def take(n, shape):
        nonlocal i
        out = ctrl[i:i + n].reshape(shape)
        i += n
        return out

    w1 = take(_CTRL_IN * 8, (_CTRL_IN, 8))
    b1 = take(8, (8,))
    w2 = take(8 * 8, (8, 8))
    b2 = take(8, (8,))
    w3 = take(8, (8, 1))
    b3 = take(1, (1,))
    return (w1, b1), (w2, b2), (w3, b3)


def dynamic_mask_logits(mfeat, ctrl_vec, center_vu):
    """One instance's mask logits over the stride grid.

    Args:
      mfeat: (hs, ws, MASK_DIM) shared mask features.
      ctrl_vec: (N_CTRL,) controller gathered at the instance's peak.
      center_vu: (2,) peak (v, u) in stride-grid coords.

    The conditional mask FCN of CondInst (Tian et al. 2020): inputs are
    the shared features concatenated with peak-relative coordinates, so
    one shared feature map yields DISTINCT masks per instance. Three
    1x1 conv layers == three small matmuls — MXU-shaped, vmappable over
    (B, K) with zero dynamic shapes.
    """
    hs, ws, _ = mfeat.shape
    vv = (jnp.arange(hs, dtype=jnp.float32)[:, None] - center_vu[0]) \
        / REL_NORM
    uu = (jnp.arange(ws, dtype=jnp.float32)[None, :] - center_vu[1]) \
        / REL_NORM
    rel = jnp.stack([jnp.broadcast_to(vv, (hs, ws)),
                     jnp.broadcast_to(uu, (hs, ws))], axis=-1)
    x = jnp.concatenate([mfeat, rel], axis=-1)  # (hs, ws, _CTRL_IN)
    (w1, b1), (w2, b2), (w3, b3) = _split_ctrl(ctrl_vec)
    x = jax.nn.relu(x @ w1 + b1)
    x = jax.nn.relu(x @ w2 + b2)
    return (x @ w3 + b3)[..., 0]  # (hs, ws)


class Detections(NamedTuple):
    """Top-k decoded detections (fixed k; filter by score on host)."""

    bbox: jnp.ndarray    # (B, K, 4) [v1, u1, v2, u2] image pixels
    score: jnp.ndarray   # (B, K)
    cls: jnp.ndarray     # (B, K) class index (0-based)
    center: jnp.ndarray  # (B, K, 2) (v, u)
    mask: jnp.ndarray | None = None  # (B, K, H/4, W/4) bool instance masks


def decode_detections(out: DetectorOut, top_k: int = 32,
                      stride: int = 4,
                      with_masks: bool = True) -> Detections:
    """Heatmap peaks -> boxes (+ per-instance masks), shape-static
    (CenterNet decode + CondInst dynamic mask FCN per peak)."""
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
    masks = None
    if with_masks:
        ctrl = gather_hw(out.ctrl, pix)  # (B,K,N_CTRL)
        grid_center = jnp.stack([pv + off[..., 0], pu + off[..., 1]],
                                axis=-1)  # (B,K,2) stride-grid coords
        logits = jax.vmap(  # over batch
            jax.vmap(dynamic_mask_logits, in_axes=(None, 0, 0))
        )(out.mfeat, ctrl, grid_center)  # (B,K,hs,ws)
        # clip to the predicted box (Mask-RCNN semantics: mask lives
        # inside its box)
        gv = jnp.arange(h, dtype=jnp.float32) * stride
        gu = jnp.arange(w, dtype=jnp.float32) * stride
        in_box = ((gv[None, None, :, None] >= bbox[..., 0, None, None])
                  & (gv[None, None, :, None] <= bbox[..., 2, None, None])
                  & (gu[None, None, None, :] >= bbox[..., 1, None, None])
                  & (gu[None, None, None, :] <= bbox[..., 3, None, None]))
        masks = (logits > 0.0) & in_box
    return Detections(bbox=bbox, score=score, cls=cls,
                      center=jnp.stack([cv, cu], axis=-1), mask=masks)


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


def instance_mask_loss(out: DetectorOut, gt_center, gt_mask, gt_valid):
    """Dice loss of the dynamic mask FCN at GT centers (CondInst
    training: controller gathered at each instance's center location,
    target = that instance's VISIBLE mask).

    Args: gt_center (B,K,2) float stride-grid centers; gt_mask
    (B,K,hs,ws) in {0,1}; gt_valid (B,K) bool.
    """
    b, hs, ws, _ = out.mfeat.shape

    def one(mfeat, ctrl_map, centers, masks, valid):
        ci = jnp.clip(jnp.round(centers[:, 0]).astype(jnp.int32), 0,
                      hs - 1)
        cj = jnp.clip(jnp.round(centers[:, 1]).astype(jnp.int32), 0,
                      ws - 1)
        ctrl = ctrl_map[ci, cj]  # (K, N_CTRL)
        logits = jax.vmap(dynamic_mask_logits,
                          in_axes=(None, 0, 0))(mfeat, ctrl, centers)
        p = jax.nn.sigmoid(logits)
        inter = jnp.sum(p * masks, axis=(1, 2))
        denom = jnp.sum(p * p, axis=(1, 2)) + jnp.sum(
            masks * masks, axis=(1, 2))
        dice = 1.0 - 2.0 * inter / jnp.maximum(denom, 1e-6)
        return jnp.sum(jnp.where(valid, dice, 0.0)), jnp.sum(valid)

    loss, n = jax.vmap(one)(out.mfeat, out.ctrl, gt_center, gt_mask,
                            gt_valid)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(n), 1.0)


def detector_loss(out: DetectorOut, targets: dict,
                  w_heat: float = 1.0, w_wh: float = 0.1,
                  w_off: float = 1.0, w_seg: float = 1.0,
                  w_mask: float = 1.0):
    """Total loss. targets: ``heat`` (B,h,w,C) gaussian, ``wh`` (B,h,w,2),
    ``off`` (B,h,w,2), ``reg_mask`` (B,h,w) 1 at centers, ``seg`` (B,h,w,C)
    binary; optionally ``gt_center``/``gt_mask``/``gt_valid`` for the
    per-instance mask head (see :func:`instance_mask_loss`)."""
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
    parts = {"heat": l_heat, "wh": l_wh, "off": l_off, "seg": l_seg}
    if "gt_mask" in targets:
        l_mask = instance_mask_loss(out, targets["gt_center"],
                                    targets["gt_mask"],
                                    targets["gt_valid"])
        total = total + w_mask * l_mask
        parts["mask"] = l_mask
    return total, parts
