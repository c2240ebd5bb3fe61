"""On-device training-batch synthesis.

The reference streams batches from 6 host processes doing per-sample skimage
work — background compositing, imgaug color jitter, occlusion cut-outs,
stage-2 input simulation, rotation, resize (``pix2pose_util/data_io.py``,
hooked up at ``tools/3_train_pix2pose.py:204-206``). SURVEY.md §3.1 flags
this as the main CPU bottleneck.

Here the whole augmentation is ONE jitted batched program on device:

  workspace composite (patch over random background crop)
  -> color jitter (channel shifts, contrast, per-channel gain, blur, noise)
  -> occlusion cut-outs (input only — targets keep the full silhouette,
     matching the reference where ``mask_no_occ_ori``/full XYZ are the
     labels, ``data_io.py:106,261-262``)
  -> stage-2 input simulation on alternating batches: gray background
     masking with blurred/cut mask, extra gray cut-outs, wrong-background
     inclusions (``data_io.py:203-255``)
  -> boundary blur band (``data_io.py:186-195``)
  -> one fused affine sample (center jitter, scale 1.5x(1±0.3), ±15 deg)
     to the network resolution (``data_io.py:110-123,264-272``)

Samples and backgrounds are padded uint8 device arrays loaded once; every
random decision comes from the jax PRNG so batches are reproducible.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops.affine import affine_sample_mm, make_affine

WORK = 192  # workspace resolution (patch region sits centered)
PATCH = 128
BACK = 256  # stored background resolution


@dataclasses.dataclass
class PatchStore:
    """Padded device-side training patches + backgrounds."""

    rgb: jnp.ndarray    # (N, 128, 128, 3) uint8
    xyz: jnp.ndarray    # (N, 128, 128, 3) uint8 (coordinate colors)
    mask: jnp.ndarray   # (N, 128, 128) bool silhouette
    extent: jnp.ndarray  # (N,) float: max(h, w) of the un-padded patch
    backs: jnp.ndarray  # (M, 256, 256, 3) uint8

    @property
    def n_data(self) -> int:
        return self.rgb.shape[0]

    @classmethod
    def load(cls, data_dir: str, back_dir: str | None,
             max_patches: int = 20000, max_backs: int = 512):
        """Read the reference's (h,w,6|7) uint8 npy crops
        (``2_2_render_pix2pose_training.py:76-96``) and background images."""
        from PIL import Image

        from pix2pose_tpu.data.native_loader import load_npy

        rgbs, xyzs, masks, extents = [], [], [], []
        files = sorted(f for f in os.listdir(data_dir)
                       if f.endswith(".npy"))[:max_patches]
        for fn in files:
            arr = load_npy(os.path.join(data_dir, fn))
            h, w = arr.shape[:2]
            rgb = np.zeros((PATCH, PATCH, 3), np.uint8)
            xyz = np.zeros((PATCH, PATCH, 3), np.uint8)
            v0, u0 = (PATCH - h) // 2, (PATCH - w) // 2
            rgb[v0:v0 + h, u0:u0 + w] = arr[..., :3]
            xyz[v0:v0 + h, u0:u0 + w] = arr[..., 3:6]
            m = xyz.sum(axis=2) > 0
            if arr.shape[2] == 7:
                vm = np.zeros((PATCH, PATCH), bool)
                vm[v0:v0 + h, u0:u0 + w] = arr[..., 6] > 0
                m &= vm
            rgbs.append(rgb)
            xyzs.append(xyz)
            masks.append(m)
            extents.append(float(max(h, w)))
        backs = []
        bfiles = (sorted(os.listdir(back_dir))[:max_backs]
                  if back_dir and os.path.isdir(back_dir) else [])
        for fn in bfiles:
            try:
                img = Image.open(os.path.join(back_dir, fn)).convert("RGB")
            except Exception:
                continue
            backs.append(np.asarray(
                img.resize((BACK, BACK), Image.BILINEAR), np.uint8))
        if not backs:
            backs = [np.full((BACK, BACK, 3), 127, np.uint8)]
        return cls(rgb=jnp.asarray(np.stack(rgbs)),
                   xyz=jnp.asarray(np.stack(xyzs)),
                   mask=jnp.asarray(np.stack(masks)),
                   extent=jnp.asarray(np.array(extents, np.float32)),
                   backs=jnp.asarray(np.stack(backs)))


def _rand(key, *shape, lo=0.0, hi=1.0):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def _color_jitter(key, img):
    """imgaug-sequence equivalent (``data_io.py:42-51``), per sample."""
    ks = jax.random.split(key, 6)
    img = img + _rand(ks[0], 3, lo=-15 / 255, hi=15 / 255)[None, None, :]
    img = (img - 0.5) * _rand(ks[1], lo=0.8, hi=1.3) + 0.5
    gain = jnp.where(jax.random.bernoulli(ks[2]),
                     _rand(ks[2], 3, lo=0.8, hi=1.2),
                     _rand(ks[2], lo=0.8, hi=1.2) * jnp.ones(3))
    img = img * gain[None, None, :]
    # light blur: lerp toward a 3x3 box blur by sigma/0.5
    k = jnp.ones((3, 3, 1, 1)) / 9.0
    blurred = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, :, :, None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[:, :, :, 0]
    blurred = blurred.transpose(1, 2, 0)
    alpha = _rand(ks[3], lo=0.0, hi=0.7)
    img = img * (1 - alpha) + blurred * alpha
    noise = jax.random.normal(ks[4], img.shape) * (10 / 255)
    img = jnp.where(jax.random.bernoulli(ks[5], 0.1), img + noise, img)
    return jnp.clip(img, 0.0, 1.0)


def _rect_mask(key, scale_lo, scale_hi, extent):
    """Random occlusion rectangle in workspace coords around the patch
    center (``data_io.py:156-166``)."""
    ks = jax.random.split(key, 4)
    h = _rand(ks[0], lo=scale_lo, hi=scale_hi) * extent
    w = _rand(ks[1], lo=scale_lo, hi=scale_hi) * extent
    cv = WORK / 2 + _rand(ks[2], lo=-0.5, hi=0.5) * extent
    cu = WORK / 2 + _rand(ks[3], lo=-0.5, hi=0.5) * extent
    v = jnp.arange(WORK, dtype=jnp.float32)
    u = jnp.arange(WORK, dtype=jnp.float32)
    inside_v = (v >= cv) & (v < cv + h)
    inside_u = (u >= cu) & (u < cu + w)
    return inside_v[:, None] & inside_u[None, :]


def _blur_ws(img, iters: int = 1):
    k = jnp.ones((3, 3, 1, 1)) / 9.0
    out = img if img.ndim == 3 else img[..., None]
    for _ in range(iters):
        out = jax.lax.conv_general_dilated(
            out.transpose(2, 0, 1)[..., None], k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0] \
            .transpose(1, 2, 0)
    return out if img.ndim == 3 else out[..., 0]


def _one_sample(key, rgb_u8, xyz_u8, mask, extent, back_u8, stage2,
                full_rotation):
    ks = jax.random.split(key, 12)
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    xyz = xyz_u8.astype(jnp.float32) / 255.0
    maskf = mask.astype(jnp.float32)

    rgb = _color_jitter(ks[0], rgb)

    # --- workspace composite -----------------------------------------
    off = jax.random.randint(ks[1], (2,), 0, BACK - WORK)
    back = jax.lax.dynamic_slice(
        back_u8, (off[0], off[1], 0), (WORK, WORK, 3)).astype(
        jnp.float32) / 255.0
    pad = (WORK - PATCH) // 2
    ws_mask = jnp.zeros((WORK, WORK)).at[pad:pad + PATCH,
                                         pad:pad + PATCH].set(maskf)
    ws_rgb_patch = jnp.zeros((WORK, WORK, 3)).at[
        pad:pad + PATCH, pad:pad + PATCH].set(rgb)
    ws_xyz = jnp.full((WORK, WORK, 3), 0.5).at[
        pad:pad + PATCH, pad:pad + PATCH].set(
        jnp.where(mask[..., None], xyz, 0.5))

    # occlusion cut-out removes object -> background shows
    occ = _rect_mask(ks[2], 0.2, 0.7, extent)
    in_mask = ws_mask * (1.0 - occ)
    comp = jnp.where(in_mask[..., None] > 0, ws_rgb_patch, back)

    # boundary blur band (``data_io.py:186-195``)
    band = (_blur_ws(in_mask) > 0.01) & (_blur_ws(in_mask) < 0.99)
    comp = jnp.where(band[..., None], _blur_ws(comp), comp)

    # --- stage-2 input simulation (``data_io.py:203-255``) ------------
    def stage2_fn(comp):
        m = _blur_ws(in_mask) > 0.05  # slightly dilated/blurred mask
        # cutcut: also require non-gray coordinates
        non_gray = jnp.linalg.norm((ws_xyz - 0.5) * 2.0, axis=-1) > 0.3
        m = m & non_gray
        gray = jnp.full_like(comp, 0.5)
        out = jnp.where(m[..., None], comp, gray)
        # simulated stage-1 misses: gray rectangle over the object
        miss = _rect_mask(ks[3], 0.0, 0.5, extent)
        out = jnp.where(miss[..., None], gray, out)
        # wrong background inclusion: background rect leaks back in
        wrong = _rect_mask(ks[4], 0.0, 0.5, extent) & ~(ws_mask > 0)
        out = jnp.where(wrong[..., None], comp, out)
        return out

    comp = jax.lax.cond(stage2, stage2_fn, lambda c: c, comp)

    # --- fused window + rotation sample (``data_io.py:110-123,264``) --
    scale_jit = 1.0 + _rand(ks[5], lo=-0.3, hi=0.3)
    win = jnp.maximum(extent * 1.5 * scale_jit, 16.0)
    jitter = jax.random.uniform(ks[6], (2,), minval=-5.0, maxval=5.0)
    center_src = jnp.array([WORK / 2, WORK / 2]) + jitter
    # the reference pre-renders 30-degree in-plane copies on disk
    # (``2_2_render_pix2pose_training.py:64-96``) and adds ±15 deg at train
    # time; on device we sample the full circle directly — unless the
    # object's continuous-symmetry axis is camera-parallel (rotation_lock,
    # ``2_2:46-50``), which restricts to ±15 deg.
    angle = jnp.where(full_rotation,
                      _rand(ks[7], lo=-180.0, hi=180.0),
                      _rand(ks[7], lo=-15.0, hi=15.0)) * jnp.pi / 180.0
    mat = make_affine(center_src,
                      jnp.array([(PATCH - 1) / 2.0, (PATCH - 1) / 2.0]),
                      win / PATCH, angle)

    # one banded-matmul warp for all seven channels (src | tgt | mask) —
    # the gather path ran on the TPU scalar unit and dominated step time
    stacked = jnp.concatenate([(comp - 0.5) * 2.0, (ws_xyz - 0.5) * 2.0,
                               ws_mask[..., None]], axis=-1)
    warped = affine_sample_mm(stacked, mat, PATCH, PATCH, 0.0)
    src, tgt, prob = warped[..., :3], warped[..., 3:6], warped[..., 6:7]
    return src, tgt, (prob > 0.5).astype(jnp.float32)


def _make_batch(store: PatchStore, key, step, batch_size: int = 50,
                full_rotation=True, n_valid=None):
    """``make_batch`` body; ``full_rotation`` and ``n_valid`` may be
    traced (the former only feeds a ``jnp.where`` in ``_one_sample``,
    the latter a ``randint`` bound), which lets the multi-object trainer
    (``training/multi.py``) vmap this over per-object rotation locks and
    per-object store sizes inside padded stacks."""
    kidx, kback, kaug = jax.random.split(key, 3)
    hi = store.n_data if n_valid is None else n_valid
    idx = jax.random.randint(kidx, (batch_size,), 0, hi)
    bidx = jax.random.randint(kback, (batch_size,), 0,
                              store.backs.shape[0])
    stage2 = (step % 2) == 0
    keys = jax.random.split(kaug, batch_size)
    src, tgt, prob = jax.vmap(
        lambda k, i, b: _one_sample(k, store.rgb[i], store.xyz[i],
                                    store.mask[i], store.extent[i],
                                    store.backs[b], stage2, full_rotation)
    )(keys, idx, bidx)
    return {"src": src, "tgt": tgt, "prob_gt": prob}


@functools.partial(jax.jit,
                   static_argnames=("batch_size", "full_rotation"))
def make_batch(store: PatchStore, key, step, batch_size: int = 50,
               full_rotation: bool = True):
    """One training batch. Stage-2-style inputs on even steps, plain
    stage-1 inputs on odd (``data_io.py:203``: ``batch_count % 2``)."""
    return _make_batch(store, key, step, batch_size, full_rotation)


jax.tree_util.register_pytree_node(
    PatchStore,
    lambda s: ((s.rgb, s.xyz, s.mask, s.extent, s.backs), None),
    lambda _, c: PatchStore(*c))
