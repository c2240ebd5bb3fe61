"""On-device detector-training scene synthesis.

The reference writes 200k cluttered composites to disk for Mask-RCNN /
RetinaNet training (``tools/1_1_scene_gen_for_detection_maskrcnn.py``:
5-20 scaled/rotated/occluded crops per COCO background, visibility filter
0.3). Here the same composition is a jitted batched program that feeds the
detector directly — no disk intermediates:

  sample K object crops -> random affine placement (scale/rotation/shift)
  -> ordered compositing (later crops occlude earlier ones, like the
  sequential pastes in ``1_1:163-241``) -> CenterNet targets (gaussian
  center heatmaps, box sizes, offsets, per-class masks) with the 0.3
  visibility filter (``1_1:250-256``).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops.affine import affine_sample_mm, make_affine

PATCH = 128


@dataclasses.dataclass
class DetectorStore:
    """All objects' patches in one pool + class labels."""

    rgb: jnp.ndarray    # (P, 128, 128, 3) uint8
    mask: jnp.ndarray   # (P, 128, 128) bool
    label: jnp.ndarray  # (P,) int32 class index (0-based; -1 = distractor)
    extent: jnp.ndarray  # (P,) float
    backs: jnp.ndarray  # (M, 256, 256, 3) uint8
    num_classes: int

    @classmethod
    def from_patch_stores(cls, stores: dict, backs, distractors=()):
        """stores: {obj_id: PatchStore-like with rgb/mask/extent}; class
        index = rank of obj_id. ``distractors`` is an optional sequence of
        extra PatchStore-likes whose patches are composited into scenes but
        labelled -1 — they occlude and clutter like the COCO-crop
        distractors the reference pastes (``1_1_scene_gen_for_detection_
        maskrcnn.py:163-241``) but never produce detection targets. Pure
        device-side concatenation — no device->host round trip (which would
        also flip the axon relay into its slow per-launch mode; see
        docs/SCALING.md)."""
        rgbs, masks, labels, extents = [], [], [], []
        for ci, obj_id in enumerate(sorted(stores)):
            st = stores[obj_id]
            rgbs.append(jnp.asarray(st.rgb))
            masks.append(jnp.asarray(st.mask))
            extents.append(jnp.asarray(st.extent))
            labels.append(jnp.full((st.rgb.shape[0],), ci, jnp.int32))
        for st in distractors:
            rgbs.append(jnp.asarray(st.rgb))
            masks.append(jnp.asarray(st.mask))
            extents.append(jnp.asarray(st.extent))
            labels.append(jnp.full((st.rgb.shape[0],), -1, jnp.int32))
        return cls(rgb=jnp.concatenate(rgbs),
                   mask=jnp.concatenate(masks),
                   label=jnp.concatenate(labels),
                   extent=jnp.concatenate(extents),
                   backs=jnp.asarray(backs),
                   num_classes=len(stores))


jax.tree_util.register_pytree_node(
    DetectorStore,
    lambda s: ((s.rgb, s.mask, s.label, s.extent, s.backs),
               s.num_classes),
    lambda aux, c: DetectorStore(*c, num_classes=aux))


def _gauss_radius(h, w, min_overlap=0.7):
    """CenterNet gaussian radius from box size."""
    a = min_overlap
    r = jnp.minimum(h, w) * (1 - a) / (1 + a)
    return jnp.maximum(r, 2.0)


# warp window: covers the largest patch footprint (128 px patch at
# max scale 1.6, any rotation: 128*1.6*sqrt(2) ~ 290, +1 px fractional
# placement). Warping into this window and pasting is ~(S/W0)^2 cheaper
# than warping the full canvas, and the banded-matmul weights stay small.
_WIN = 296


def _place_one(key, rgb_u8, mask, extent, im_size, scale_range,
               warp_dtype=None, force_padded=False):
    """Random affine placement of one patch into the image frame.

    Warp the 4-channel (rgb | mask) patch into a fixed _WIN-sized window
    with the banded-matmul sampler, then paste the window into the frame
    with one dynamic_update_slice — no full-frame gathers (the former
    full-canvas gather path ran on the TPU scalar unit at ~0.001% MFU
    and dominated the train step). When the frame is at least window-
    sized the window origin is clamped into the frame and the affine's
    target center shifted to compensate (identical sampling, window
    coordinates differ), so the paste lands directly on an (S, S)
    canvas; the half-window-padded canvas — 3x the HBM traffic at 384²
    — is only needed for frames smaller than the window.

    Returns (rgb (S,S,3) float, mask (S,S) float)."""
    ks = jax.random.split(key, 4)
    scale = jax.random.uniform(ks[0], minval=scale_range[0],
                               maxval=scale_range[1])
    angle = jax.random.uniform(ks[1], minval=-np.pi, maxval=np.pi)
    margin = extent * scale * 0.5 + 4.0
    cv = jax.random.uniform(ks[2], minval=margin,
                            maxval=im_size - margin)
    cu = jax.random.uniform(ks[3], minval=margin,
                            maxval=im_size - margin)
    pad = _WIN // 2
    iv0 = jnp.floor(cv).astype(jnp.int32) - pad  # window origin (frame)
    iu0 = jnp.floor(cu).astype(jnp.int32) - pad
    direct = im_size >= _WIN and not force_padded  # static
    if direct:
        iv0 = jnp.clip(iv0, 0, im_size - _WIN)
        iu0 = jnp.clip(iu0, 0, im_size - _WIN)
    # out->src map: src px per out px = 1/scale; center in window coords
    mat = make_affine(jnp.array([(PATCH - 1) / 2.0, (PATCH - 1) / 2.0]),
                      jnp.array([cv - iv0, cu - iu0]), 1.0 / scale, angle)
    stacked = jnp.concatenate([rgb_u8.astype(jnp.float32) / 255.0,
                               mask.astype(jnp.float32)[..., None]],
                              axis=-1)
    win = affine_sample_mm(stacked, mat, _WIN, _WIN, 0.0,
                           compute_dtype=warp_dtype)
    if direct:
        canvas = jnp.zeros((im_size, im_size, 4), jnp.float32)
        out = jax.lax.dynamic_update_slice(canvas, win, (iv0, iu0, 0))
    else:
        canvas = jnp.zeros((im_size + _WIN, im_size + _WIN, 4),
                           jnp.float32)
        canvas = jax.lax.dynamic_update_slice(canvas, win,
                                              (iv0 + pad, iu0 + pad, 0))
        out = canvas[pad:pad + im_size, pad:pad + im_size]
    return out[..., :3], (out[..., 3] > 0.5).astype(jnp.float32)


def _splat_gaussian(heat, cls_idx, cv, cu, radius, valid, size):
    v = jnp.arange(size, dtype=jnp.float32)
    g = jnp.exp(-(((v[:, None] - cv) ** 2 + (v[None, :] - cu) ** 2)
                  / (2 * (radius / 3.0) ** 2)))
    g = jnp.where(valid, g, 0.0)
    onehot = jax.nn.one_hot(cls_idx, heat.shape[-1])
    return jnp.maximum(heat, g[..., None] * onehot[None, None, :])


@functools.partial(jax.jit,
                   static_argnames=("batch_size", "im_size", "k_obj",
                                    "stride", "scale_range",
                                    "warp_dtype"))
def make_detector_batch(store: DetectorStore, key, batch_size: int = 8,
                        im_size: int = 512, k_obj: int = 8,
                        stride: int = 4, min_visib: float = 0.3,
                        scale_range: tuple = (0.6, 1.6),
                        warp_dtype: str | None = "bfloat16"):
    """One detector training batch.

    ``scale_range`` sets the random patch-placement scale (x the 128-px
    patch): match it to the deployment's apparent object sizes — a
    detector trained at (0.6, 1.6) (77-205 px instances) merges ADJACENT
    duplicate instances that appear at ~40 px into one detection whose
    size fits its prior (measured on the duplicate-cube e2e: one merged
    box per image; retraining at (0.25, 1.1) splits most of them).

    Returns dict: ``image`` (B,S,S,3) in [0,1], targets ``heat``/``wh``/
    ``off``/``reg_mask``/``seg`` at stride resolution, plus ground-truth
    boxes for detection-quality eval: ``gt_bbox`` (B,K,4) visible-region
    [v1,u1,v2,u2] in image pixels, ``gt_cls`` (B,K), ``gt_valid`` (B,K)
    bool (False for sub-visibility instances and distractor patches).

    ``warp_dtype="bfloat16"`` (default) runs the placement warp's banded
    contractions in bf16 with fp32 accumulation — the warp is HBM-bound
    on its weight tensors, so this is ~2x its cost; pixel error ~2/255,
    below the patches' uint8 quantization. ``None`` forces fp32."""
    # the fixed warp window must cover the largest rotated footprint
    assert scale_range[1] * PATCH * 1.4143 + 2 <= _WIN, scale_range
    wdt = jnp.bfloat16 if warp_dtype == "bfloat16" else None
    hs = im_size // stride
    c = store.num_classes

    def one_scene(k):
        ks = jax.random.split(k, 5)
        pidx = jax.random.randint(ks[0], (k_obj,), 0,
                                  store.rgb.shape[0])
        bidx = jax.random.randint(ks[1], (), 0, store.backs.shape[0])
        place_keys = jax.random.split(ks[2], k_obj)
        rgbs, masks = jax.vmap(
            lambda kk, i: _place_one(kk, store.rgb[i], store.mask[i],
                                     store.extent[i], im_size,
                                     scale_range, wdt)
        )(place_keys, pidx)  # (K,S,S,3), (K,S,S)
        labels = store.label[pidx]

        # background: random image crop upscaled to S; occasionally a flat
        # uniform background so plain walls/tables stay in-domain
        back = jax.image.resize(
            store.backs[bidx].astype(jnp.float32) / 255.0,
            (im_size, im_size, 3), method="linear")
        flat_val = jax.random.uniform(ks[3], (3,), minval=0.25,
                                      maxval=0.75)
        back = jnp.where(jax.random.bernoulli(ks[4], 0.2),
                         jnp.broadcast_to(flat_val,
                                          (im_size, im_size, 3)),
                         back)

        # ordered compositing: slot k is occluded by slots > k
        def suffix_or(carry, m):
            return jnp.logical_or(carry, m > 0), carry

        _, occ_after_rev = jax.lax.scan(
            suffix_or, jnp.zeros((im_size, im_size), bool),
            masks[::-1])
        occ_after = occ_after_rev[::-1]  # (K,S,S): union of later masks
        visible = masks * (1.0 - occ_after.astype(jnp.float32))

        img = back
        for kk in range(k_obj):  # small static loop
            img = jnp.where(visible[kk][..., None] > 0, rgbs[kk], img)

        # ---- targets: boxes at FULL image resolution (stride-grid boxes
        # would quantize GT by +-stride px, capping high-IoU quality),
        # heat/wh/off laid out on the stride grid ----
        vis_s = visible[:, ::stride, ::stride]  # (K,hs,hs) for seg target
        area_full = jnp.maximum(jnp.sum(masks, axis=(1, 2)), 1.0)
        area_vis = jnp.sum(visible, axis=(1, 2))
        valid_gt = (area_vis / area_full) >= min_visib

        gvf = jnp.arange(im_size, dtype=jnp.float32)
        big = 1e9
        vmin = jnp.min(jnp.where(visible > 0,
                                 gvf[None, :, None], big), axis=(1, 2))
        vmax = jnp.max(jnp.where(visible > 0,
                                 gvf[None, :, None], -big), axis=(1, 2))
        umin = jnp.min(jnp.where(visible > 0,
                                 gvf[None, None, :], big), axis=(1, 2))
        umax = jnp.max(jnp.where(visible > 0,
                                 gvf[None, None, :], -big), axis=(1, 2))
        has_px = area_vis > 4.0
        is_gt = labels >= 0  # distractor patches never become targets
        cls_safe = jnp.maximum(labels, 0)
        valid_gt = valid_gt & has_px & is_gt
        # center/size in stride-grid units (the head's output frame)
        cv = (vmin + vmax) / 2.0 / stride
        cu = (umin + umax) / 2.0 / stride
        hh = jnp.maximum(vmax - vmin + 1.0, 1.0) / stride
        ww = jnp.maximum(umax - umin + 1.0, 1.0) / stride

        heat = jnp.zeros((hs, hs, c))
        wh = jnp.zeros((hs, hs, 2))
        off = jnp.zeros((hs, hs, 2))
        reg = jnp.zeros((hs, hs))
        seg = jnp.zeros((hs, hs, c))
        for kk in range(k_obj):
            r = _gauss_radius(hh[kk], ww[kk])
            heat = _splat_gaussian(heat, cls_safe[kk], cv[kk], cu[kk], r,
                                   valid_gt[kk], hs)
            ci = jnp.round(cv[kk]).astype(jnp.int32)
            cj = jnp.round(cu[kk]).astype(jnp.int32)
            ci = jnp.clip(ci, 0, hs - 1)
            cj = jnp.clip(cj, 0, hs - 1)
            upd = valid_gt[kk].astype(jnp.float32)
            # force an exact-1 positive at the center cell
            heat = heat.at[ci, cj, cls_safe[kk]].max(upd)
            wh = wh.at[ci, cj].set(
                jnp.where(upd > 0, jnp.stack([hh[kk], ww[kk]]),
                          wh[ci, cj]))
            off = off.at[ci, cj].set(
                jnp.where(upd > 0,
                          jnp.stack([cv[kk] - ci, cu[kk] - cj]),
                          off[ci, cj]))
            reg = reg.at[ci, cj].max(upd)
            seg = jnp.maximum(
                seg, vis_s[kk][..., None]
                * jax.nn.one_hot(cls_safe[kk], c)[None, None, :]
                * upd)
        # exact visible-region GT boxes in image pixels
        gt_bbox = jnp.stack([vmin, umin, vmax + 1.0, umax + 1.0],
                            axis=-1)
        gt_bbox = jnp.where(valid_gt[:, None], gt_bbox, 0.0)
        # per-INSTANCE visible masks + stride-grid centers for the
        # CondInst mask head (instance_mask_loss) — the semantic ``seg``
        # target cannot separate overlapping same-class instances
        gt_mask = vis_s * valid_gt[:, None, None].astype(jnp.float32)
        gt_center = jnp.stack([cv, cu], axis=-1)  # (K, 2) grid coords
        return (img, heat, wh, off, reg, seg, gt_bbox, labels, valid_gt,
                gt_mask, gt_center)

    keys = jax.random.split(key, batch_size)
    (img, heat, wh, off, reg, seg, gt_bbox, gt_cls, gt_valid, gt_mask,
     gt_center) = jax.vmap(one_scene)(keys)
    return {"image": img, "heat": heat, "wh": wh, "off": off,
            "reg_mask": reg, "seg": seg, "gt_bbox": gt_bbox,
            "gt_cls": gt_cls, "gt_valid": gt_valid, "gt_mask": gt_mask,
            "gt_center": gt_center}


_PACK_BF16 = ("heat", "wh", "off", "seg", "gt_mask")


def pack_detector_batch(batch: dict) -> dict:
    """Compact-dtype encoding for the scene pool
    (:func:`~pix2pose_tpu.training.detector_train.make_pooled_detector_step`):
    image -> uint8, dense targets -> bf16, reg_mask -> bool. ~3.6x less
    pool HBM for the ring update + batch slice each step. Quantization:
    image +-0.5/255 (the composite's sources are uint8 patches, so this
    is below their own quantization); bf16 targets <0.4%% rel error.
    Gated mAP-neutral at equal steps (docs/PARITY.md "Detector train
    steps")."""
    out = dict(batch)
    out["image"] = jnp.round(
        jnp.clip(batch["image"], 0.0, 1.0) * 255.0).astype(jnp.uint8)
    for k in _PACK_BF16:
        out[k] = batch[k].astype(jnp.bfloat16)
    out["reg_mask"] = batch["reg_mask"] > 0.5
    return out


def unpack_detector_batch(packed: dict) -> dict:
    """Inverse of :func:`pack_detector_batch` (back to training dtypes)."""
    out = dict(packed)
    out["image"] = packed["image"].astype(jnp.float32) / 255.0
    for k in _PACK_BF16:
        out[k] = packed[k].astype(jnp.float32)
    out["reg_mask"] = packed["reg_mask"].astype(jnp.float32)
    return out
