"""Fused crop + resize as separable sampling matmuls.

The reference prepares every network input by (1) allocating a zero canvas of
the unclamped square-window size, (2) pasting the clamped image patch into it,
and (3) bilinearly resizing the canvas to 128x128 on the host
(``pix2pose_model/recognition.py:75-82,113-121``). Done per crop with skimage,
this is a major CPU bottleneck (SURVEY.md §3.3).

Here the same math is one shape-static tensor program: for each output axis we
build a sampling matrix that maps *original image* rows/cols directly to the
128-grid (the zero canvas is virtual — rows outside the clamped window get
zero weight in the numerator but still dilute the normalization, exactly like
resizing a zero-padded canvas), and apply it as two matmuls that land on the
MXU. Batched over crops with vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops.boxes import CropBox


def _axis_weights(n_src: int, lo_ori, lo, hi, canvas_len, out_size: int,
                  antialias: bool = True, support: int = 24):
    """(out_size, n_src) sampling matrix for one axis.

    Maps image coordinates (axis length ``n_src``) through the virtual canvas
    ``[lo_ori, lo_ori + canvas_len)`` to ``out_size`` output samples, with a
    triangle (linear-interpolation) kernel widened to the downscale factor
    when ``antialias`` — same family of kernel the reference's skimage resize
    uses for its bilinear pass.

    Normalization is the EXACT discrete kernel mass over the canvas support
    (computed on a small ±``support`` window around each center): the
    discrete triangle-kernel sum ripples ±2.5% with the center's fractional
    position, so a continuous-integral approximation leaves a sawtooth bias
    in the resampled values. Mass inside the canvas but outside the image
    window stays in the denominator (the pasted zeros); mass outside the
    canvas is dropped.
    """
    src = jnp.arange(n_src, dtype=jnp.float32)
    c = src - jnp.asarray(lo_ori, jnp.float32)  # canvas coordinate of each src px
    length = jnp.asarray(canvas_len, jnp.float32)
    scale = length / out_size
    s = jnp.maximum(scale, 1.0) if antialias else jnp.float32(1.0)

    i = jnp.arange(out_size, dtype=jnp.float32)
    center = (i + 0.5) * scale - 0.5  # canvas coordinate of output sample i
    d = jnp.abs(c[None, :] - center[:, None]) / s
    k = jnp.maximum(0.0, 1.0 - d) / s

    valid = (src >= lo) & (src < hi)  # inside the clamped image window
    k = k * valid[None, :].astype(k.dtype)

    m = jnp.arange(-support, support + 1, dtype=jnp.float32)
    cpos = jnp.floor(center)[:, None] + m[None, :]  # (out, 2*support+1)
    kf = jnp.maximum(0.0, 1.0 - jnp.abs(cpos - center[:, None]) / s) / s
    in_canvas = (cpos >= 0.0) & (cpos <= length - 1.0)
    denom = jnp.sum(kf * in_canvas.astype(kf.dtype), axis=1)
    return k / jnp.maximum(denom, 1e-6)[:, None]


def crop_resize(image, box: CropBox, out_size: int = 128,
                antialias: bool = True):
    """Crop ``box`` out of ``image`` (zero-padding outside) and resize to
    ``(out_size, out_size)``.

    Equivalent to reference ``recognition.py:75-82``: zero canvas of the
    unclamped window size, paste ``image[v1:v2, u1:u2]``, bilinear-resize to
    the network resolution. ``image`` should already be normalized (the
    reference normalizes with ``(x - 128)/128`` before pasting so the padding
    value 0 equals mid-gray).

    Args:
      image: (H, W, C) float array.
      box: :class:`CropBox` (scalar fields; vmap for batches).

    Returns:
      (out_size, out_size, C) resampled crop.
    """
    h, w = image.shape[0], image.shape[1]
    wv = _axis_weights(h, box.v1_ori, box.v1, box.v2, box.height, out_size,
                       antialias)
    wu = _axis_weights(w, box.u1_ori, box.u1, box.u2, box.width, out_size,
                       antialias)
    tmp = jnp.tensordot(wv, image, axes=[[1], [0]])  # (S, W, C)
    out = jnp.einsum("ju,iuc->ijc", wu, tmp, preferred_element_type=jnp.float32)
    return out


def crop_resize_2d(image2d, box: CropBox, out_size: int = 128,
                   antialias: bool = True):
    """:func:`crop_resize` for a single-channel (H, W) map (masks, depth)."""
    return crop_resize(image2d[..., None], box, out_size, antialias)[..., 0]


def crop_pixel_centers(box: CropBox, out_size: int = 128):
    """Full-image (v, u) coordinates of each output pixel center.

    Inverts the crop-resize mapping so 128-grid predictions can be used as
    2D image points directly (the reference instead upsamples predictions to
    the crop and indexes integer pixels, ``recognition.py:144-156,210-212``).

    Returns:
      vv, uu: (out_size, out_size) float coords; ``in_image`` boolean mask of
      centers that fall inside the clamped window.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    hv = jnp.asarray(box.height, jnp.float32)
    wu = jnp.asarray(box.width, jnp.float32)
    cv = jnp.asarray(box.v1_ori, jnp.float32) + (i + 0.5) * hv / out_size - 0.5
    cu = jnp.asarray(box.u1_ori, jnp.float32) + (i + 0.5) * wu / out_size - 0.5
    vv = jnp.broadcast_to(cv[:, None], (out_size, out_size))
    uu = jnp.broadcast_to(cu[None, :], (out_size, out_size))
    in_image = (
        (vv >= jnp.asarray(box.v1, jnp.float32))
        & (vv < jnp.asarray(box.v2, jnp.float32))
        & (uu >= jnp.asarray(box.u1, jnp.float32))
        & (uu < jnp.asarray(box.u2, jnp.float32))
    )
    return vv, uu, in_image


def paste_to_image(pred, box: CropBox, im_h: int, im_w: int, fill=0.0):
    """Resize a 128-grid prediction back to the crop window and paste it into
    a full-resolution canvas (reference ``recognition.py:144-154``:
    upsample to the window, slice the in-image part, paste at [v1:v2,u1:u2]).

    Shape-static: builds (H, out) / (W, out) scatter matrices. Intended for
    visualization / mask export, not the hot path.
    """
    out_size = pred.shape[0]
    squeeze = pred.ndim == 2
    if squeeze:
        pred = pred[..., None]
    # Transposed sampling: for each image pixel, bilinear-sample the 128 grid.
    v = jnp.arange(im_h, dtype=jnp.float32)
    u = jnp.arange(im_w, dtype=jnp.float32)
    hv = jnp.asarray(box.height, jnp.float32)
    wu = jnp.asarray(box.width, jnp.float32)
    # image px -> output-grid coordinate
    gv = (v - jnp.asarray(box.v1_ori, jnp.float32) + 0.5) * out_size / hv - 0.5
    gu = (u - jnp.asarray(box.u1_ori, jnp.float32) + 0.5) * out_size / wu - 0.5
    gidx = jnp.arange(out_size, dtype=jnp.float32)
    kv = jnp.maximum(0.0, 1.0 - jnp.abs(gv[:, None] - gidx[None, :]))
    ku = jnp.maximum(0.0, 1.0 - jnp.abs(gu[:, None] - gidx[None, :]))
    # renormalize at grid edges (edge replication, like jax.image.resize)
    kv = kv / jnp.maximum(kv.sum(axis=1, keepdims=True), 1e-6)
    ku = ku / jnp.maximum(ku.sum(axis=1, keepdims=True), 1e-6)
    inside_v = (v >= jnp.asarray(box.v1, jnp.float32)) & (
        v < jnp.asarray(box.v2, jnp.float32))
    inside_u = (u >= jnp.asarray(box.u1, jnp.float32)) & (
        u < jnp.asarray(box.u2, jnp.float32))
    kv = kv * inside_v[:, None]
    ku = ku * inside_u[:, None]
    tmp = jnp.tensordot(kv, pred, axes=[[1], [0]])  # (H, S, C)
    out = jnp.einsum("wo,hoc->hwc", ku, tmp, preferred_element_type=jnp.float32)
    inside = inside_v[:, None] & inside_u[None, :]
    out = jnp.where(inside[..., None], out, fill)
    if squeeze:
        out = out[..., 0]
    return out


crop_resize_batch = jax.vmap(crop_resize, in_axes=(None, 0, None, None))
