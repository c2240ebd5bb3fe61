"""Affine bilinear resampling on device.

Used by the training-data pipeline to fuse the reference's host-side
skimage crop/rotate/resize chain (``pix2pose_util/data_io.py:264-272``)
into one gather-based sampling step per sample (rotation + scale +
translation as a single 2x3 matrix).
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
