"""Square-crop box arithmetic.

Replicates the reference's ``get_boxes`` clamp-and-shift bookkeeping
(``pix2pose_model/recognition.py:28-69``) as a pure, jittable function: the
estimator expands a detector bbox to a square window ``box_size * max(w, h)``
around its center, clamps it to the image, and records both the unclamped
("ori") extent and the paste offsets into the zero canvas.

All coordinates are (v, u) = (row, col); a bbox is [v_min, u_min, v_max,
u_max] like the reference's ROI convention (``5_evaluation_bop_basic.py:55``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CropBox(NamedTuple):
    """Result of :func:`get_boxes` — the twelve ints of the reference.

    ``(v1_ori, v2_ori, u1_ori, u2_ori)``: unclamped square window; its size
    defines the zero canvas. ``(v1, v2, u1, u2)``: the window clamped to the
    image. ``(vv1, vv2, uu1, uu2)``: where the clamped image patch lands
    inside the canvas.
    """

    v1_ori: jnp.ndarray
    v2_ori: jnp.ndarray
    u1_ori: jnp.ndarray
    u2_ori: jnp.ndarray
    v1: jnp.ndarray
    v2: jnp.ndarray
    u1: jnp.ndarray
    u2: jnp.ndarray
    vv1: jnp.ndarray
    vv2: jnp.ndarray
    uu1: jnp.ndarray
    uu2: jnp.ndarray

    @property
    def height(self):
        return self.v2_ori - self.v1_ori

    @property
    def width(self):
        return self.u2_ori - self.u1_ori


def get_boxes(
    bbox,
    v_max,
    u_max,
    box_size: float = 1.5,
    ct=None,
    max_w=9999.0,
) -> CropBox:
    """Square crop window around a bbox (reference ``recognition.py:28-69``).

    Args:
      bbox: (4,) [v_min, u_min, v_max, u_max]; float or int.
      v_max, u_max: image height / width.
      box_size: expansion factor (reference default 1.5).
      ct: optional (2,) [ct_v, ct_u] center override — used by stage 2 with
        the stage-1 mask centroid (reference ``recognition.py:108-110``).
      max_w: cap on the window size — stage 2 caps at the stage-1 window
        (reference ``recognition.py:110``; ``max_w=w_stage_1``).

    Returns:
      :class:`CropBox` of int32 scalars (or batched arrays under vmap).
    """
    bbox = jnp.asarray(bbox, jnp.float32)
    if ct is None:
        # int() truncation on a non-negative value == floor.
        ct_v = jnp.floor((bbox[0] + bbox[2]) / 2.0)
        ct_u = jnp.floor((bbox[1] + bbox[3]) / 2.0)
    else:
        ct = jnp.asarray(ct, jnp.float32)
        ct_v, ct_u = ct[0], ct[1]

    width = bbox[3] - bbox[1]
    height = bbox[2] - bbox[0]
    w = jnp.minimum(jnp.asarray(max_w, jnp.float32),
                    jnp.maximum(width * box_size, height * box_size))
    half = jnp.floor(w / 2.0)  # int(h/2) in the reference

    v1_ori = (ct_v - half).astype(jnp.int32)
    v2_ori = (ct_v + half).astype(jnp.int32)
    u1_ori = (ct_u - half).astype(jnp.int32)
    u2_ori = (ct_u + half).astype(jnp.int32)

    v_max = jnp.asarray(v_max, jnp.int32)
    u_max = jnp.asarray(u_max, jnp.int32)

    v1 = jnp.maximum(v1_ori, 0)
    v2 = jnp.minimum(v2_ori, v_max)
    u1 = jnp.maximum(u1_ori, 0)
    u2 = jnp.minimum(u2_ori, u_max)

    shift_v_min = jnp.maximum(-v1_ori, 0)
    shift_v_max = -jnp.maximum(v2_ori - v_max, 0)
    shift_u_min = jnp.maximum(-u1_ori, 0)
    shift_u_max = -jnp.maximum(u2_ori - u_max, 0)

    vv1 = shift_v_min
    vv2 = shift_v_max + (v2_ori - v1_ori)
    uu1 = shift_u_min
    uu2 = shift_u_max + (u2_ori - u1_ori)
    return CropBox(v1_ori, v2_ori, u1_ori, u2_ori, v1, v2, u1, u2,
                   vv1, vv2, uu1, uu2)


def bbox_from_mask(mask):
    """Tight bbox [v_min, u_min, v_max, u_max] of a boolean mask, or zeros if
    empty (reference ``pix2pose_util/common_util.py:5-10``). Shape-static."""
    mask = jnp.asarray(mask, bool)
    any_px = jnp.any(mask)
    h, w = mask.shape[-2], mask.shape[-1]
    rows = jnp.any(mask, axis=-1)
    cols = jnp.any(mask, axis=-2)
    ridx = jnp.arange(h)
    cidx = jnp.arange(w)
    v_min = jnp.min(jnp.where(rows, ridx, h))
    v_max = jnp.max(jnp.where(rows, ridx, -1))
    u_min = jnp.min(jnp.where(cols, cidx, w))
    u_max = jnp.max(jnp.where(cols, cidx, -1))
    out = jnp.stack([v_min, u_min, v_max, u_max]).astype(jnp.int32)
    return jnp.where(any_px, out, jnp.zeros(4, jnp.int32))
