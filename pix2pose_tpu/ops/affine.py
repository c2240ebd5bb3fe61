"""Affine bilinear resampling on device.

Used by the training-data pipelines to fuse the reference's host-side
skimage crop/rotate/resize chain (``pix2pose_util/data_io.py:264-272``)
into one on-device sampling step per sample (rotation + scale +
translation as a single 2x3 matrix).

Two implementations of the same backward-map contract:

- ``affine_sample``: classic 4-tap gather. On TPU, 2-D gathers execute
  on the scalar path — measured ~0.001% MFU driving the detector scene
  composer (~4.3 s for a 64-placement batch at 384 squared), which made
  the fused train step ~1 s/step.
- ``affine_sample_mm``: the TPU-native path. The affine is LU-factored
  into two 1-D resamples (Catmull-Smith two-pass): a vertical warp
  applied per source column, then a horizontal warp per output row.
  Each pass is a dense banded-weight contraction (``einsum``) that the
  MXU/VPU executes at memory bandwidth — no gathers anywhere. A column
  pivot (swap the two output axes, transpose at the end) keeps the
  second pass well-conditioned for all rotation angles. For axis-aligned
  maps (angle multiple of 90 deg) the result is bit-for-bit the gather
  path's bilinear; for general rotations the footprint is the standard
  sheared-lattice bilinear of two-pass resampling (same approximation
  order; validated against the gather path in tests/test_data.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_sample(img, mat, out_h: int, out_w: int, fill=0.0):
    """Sample ``img`` at ``mat @ [i, j, 1]`` for each output pixel (i, j).

    Args:
      img: (H, W, C) source.
      mat: (2, 3) output->source coordinate map (row, col convention).
      fill: value outside the source.

    Returns:
      (out_h, out_w, C).
    """
    h, w = img.shape[0], img.shape[1]
    i = jnp.arange(out_h, dtype=jnp.float32)
    j = jnp.arange(out_w, dtype=jnp.float32)
    jj, ii = jnp.meshgrid(j, i)
    sv = mat[0, 0] * ii + mat[0, 1] * jj + mat[0, 2]
    su = mat[1, 0] * ii + mat[1, 1] * jj + mat[1, 2]

    v0 = jnp.floor(sv).astype(jnp.int32)
    u0 = jnp.floor(su).astype(jnp.int32)
    fv = sv - v0
    fu = su - u0

    def tap(vi, ui):
        ok = (vi >= 0) & (vi < h) & (ui >= 0) & (ui < w)
        val = img[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
        return jnp.where(ok[..., None], val, fill)

    out = (tap(v0, u0) * ((1 - fv) * (1 - fu))[..., None]
           + tap(v0, u0 + 1) * ((1 - fv) * fu)[..., None]
           + tap(v0 + 1, u0) * (fv * (1 - fu))[..., None]
           + tap(v0 + 1, u0 + 1) * (fv * fu)[..., None])
    return out


def make_affine(center_src, center_out, scale, angle_rad):
    """(2, 3) map: output px -> source px with rotation ``angle`` and
    uniform ``scale`` (source px per output px) about the given centers."""
    c = jnp.cos(angle_rad) * scale
    s = jnp.sin(angle_rad) * scale
    # [sv; su] = R_scaled @ ([i; j] - center_out) + center_src
    a00, a01 = c, -s
    a10, a11 = s, c
    b0 = center_src[0] - (a00 * center_out[0] + a01 * center_out[1])
    b1 = center_src[1] - (a10 * center_out[0] + a11 * center_out[1])
    return jnp.array([[a00, a01, b0], [a10, a11, b1]])


affine_sample_batch = jax.vmap(affine_sample,
                               in_axes=(0, 0, None, None, None))


def _hat(pos, n: int):
    """(..., n) linear-interpolation weights for fractional positions:
    ``w[k] = max(0, 1 - |pos - k|)``. Rows whose position falls outside
    [0, n-1] lose weight mass — the caller adds ``fill * (1 - sum(w))``,
    which reproduces the gather path's out-of-range fill semantics."""
    k = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - k))


def affine_sample_mm(img, mat, out_h: int, out_w: int, fill=0.0,
                     compute_dtype=None):
    """``affine_sample`` semantics via two banded-matmul passes (no
    gathers; see module docstring). Requires ``out_h == out_w`` (the
    rotation pivot transposes the output under a traced predicate, so
    the two output axes must agree statically — true for every use in
    this codebase).

    ``compute_dtype=jnp.bfloat16`` halves the HBM traffic of the banded
    weight tensors — the dominant cost of the warp on TPU (the (out, out,
    src) pass-2 weights are ~45 MB fp32 PER placement; the detector
    composer issues 64 of them per step). Accumulation stays fp32
    (``preferred_element_type``), so only the hat weights and pixel
    values round to bf16: max abs error vs the fp32 path is ~2/255 on
    [0,1] images (tested) — below the uint8 quantization the patches
    carry anyway. Leave ``None`` for bit-exact fp32 (the golden tests
    against the gather path)."""
    if out_h != out_w:
        raise ValueError("affine_sample_mm requires a square output")
    src_h, src_w = img.shape[0], img.shape[1]
    mat = mat.astype(jnp.float32)
    cdt = compute_dtype or jnp.float32

    # pivot: ensure |d| >= |c| by swapping the two OUTPUT axes (columns
    # of the 2x2 part); undone by a transpose of the result. Keeps the
    # horizontal pass invertible in j and the shear |b/d| <= 1 for
    # similarity transforms at every angle.
    swap = jnp.abs(mat[1, 1]) < jnp.abs(mat[1, 0])
    m2 = jnp.where(swap, mat[:, jnp.array([1, 0, 2])], mat)
    a, b, e = m2[0, 0], m2[0, 1], m2[0, 2]
    c, d, f = m2[1, 0], m2[1, 1], m2[1, 2]
    d = jnp.where(jnp.abs(d) < 1e-8, 1e-8, d)

    i = jnp.arange(out_h, dtype=jnp.float32)
    j = jnp.arange(out_w, dtype=jnp.float32)
    w = jnp.arange(src_w, dtype=jnp.float32)

    # pass 1 (vertical, per source column w): with su fixed at w the
    # source row is rv = (a - b*c/d) i + (b/d) w + (e - b*f/d)
    rv = ((a - b * c / d) * i[:, None] + (b / d) * w[None, :]
          + (e - b * f / d))                      # (out_h, src_w)
    w1 = _hat(rv, src_h)                          # (out_h, src_w, src_h)
    zero_fill = isinstance(fill, (int, float)) and fill == 0.0
    tmp = jnp.einsum("iwh,hwc->iwc", w1.astype(cdt),
                     img.astype(cdt),
                     preferred_element_type=jnp.float32)
    if not zero_fill:
        tmp = tmp + fill * (1.0 - jnp.sum(w1, axis=-1))[..., None]

    # pass 2 (horizontal, per output row i): su = c i + d j + f
    su = c * i[:, None] + d * j[None, :] + f      # (out_h, out_w)
    w2 = _hat(su, src_w)                          # (out_h, out_w, src_w)
    out = jnp.einsum("ijw,iwc->ijc", w2.astype(cdt), tmp.astype(cdt),
                     preferred_element_type=jnp.float32)
    if not zero_fill:
        out = out + fill * (1.0 - jnp.sum(w2, axis=-1))[..., None]

    return jnp.where(swap, out.transpose(1, 0, 2), out).astype(img.dtype)


affine_sample_mm_batch = jax.vmap(affine_sample_mm,
                                  in_axes=(0, 0, None, None, None))
