"""Depth-map geometry: backprojection, hole filling, fast normals.

Jittable equivalents of the reference's host-side OpenCV/scipy helpers
(``pix2pose_util/common_util.py``): ``getXYZ`` backprojection (``:13-30``),
and ``get_normal`` — depth inpaint + gaussian refine + gradient-based
normals (``:32-90``). The Navier-Stokes inpaint (``cv2.inpaint``, ``:48``)
becomes a fixed-iteration masked diffusion, which converges to the same
harmonic fill for the small sensor holes this is used on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def backproject(depth, K):
    """Organized point cloud from a depth map (reference ``getXYZ``).

    Args:
      depth: (H, W) depth in any length unit.
      K: (3, 3) intrinsics.

    Returns:
      (H, W, 3) camera-space points, same unit as depth.
    """
    h, w = depth.shape
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    u = jnp.arange(w, dtype=jnp.float32)[None, :]
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    return jnp.stack([x, y, depth], axis=-1)


@functools.partial(jax.jit, static_argnames=("iters",))
def inpaint_depth(depth, iters: int = 32):
    """Fill zero/NaN holes by iterative masked neighbor diffusion
    (stand-in for ``cv2.inpaint(..., INPAINT_NS)``, ``common_util.py:48``)."""
    depth = jnp.nan_to_num(jnp.asarray(depth, jnp.float32))
    known = depth > 0

    k = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])

    def conv(x):
        return jax.lax.conv_general_dilated(
            x[None, :, :, None], k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    def body(carry, _):
        d, m = carry
        mf = m.astype(jnp.float32)
        s = conv(d * mf)
        c = conv(mf)
        fill = s / jnp.maximum(c, 1e-6)
        new_m = m | (c > 0)
        new_d = jnp.where(m, d, jnp.where(c > 0, fill, 0.0))
        return (new_d, new_m), None

    (out, _), _ = jax.lax.scan(body, (depth, known), None, length=iters)
    return jnp.where(known, depth, out)


def gaussian_blur(img, sigma: float = 2.0, radius: int = 6):
    """Separable gaussian blur (stand-in for
    ``ndimage.gaussian_filter(depth, 2)``, ``common_util.py:50``)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    k = k / jnp.sum(k)
    pad = [(radius, radius), (0, 0)]
    out = img
    for axis, kern in ((0, k[:, None]), (1, k[None, :])):
        p = pad if axis == 0 else pad[::-1]
        padded = jnp.pad(out, p, mode="edge")
        out = jax.lax.conv_general_dilated(
            padded[None, :, :, None], kern[:, :, None, None], (1, 1),
            "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return out


@functools.partial(jax.jit, static_argnames=("window",))
def despeckle_depth(depth, tau: float = 0.02, window: int = 3):
    """Invalidate isolated gross depth outliers (sensor speckle / wrong-mask
    pixels landing on background): pixels deviating more than ``tau`` from
    the masked median of their ``window``x``window`` neighborhood become 0.

    The reference's pipeline feeds raw sensor depth to ``cv2.ppf_match_3d_ICP``
    whose per-iteration robust rejection absorbs such points; here the
    speckle is additionally removed BEFORE the cloud + normal precompute
    (``5_evaluation_bop_icp3d.py:372-374`` equivalent) because the
    gradient-based normals (``common_util.py:32-90``) smear each bad pixel
    over its whole smoothing neighborhood — measured: 10% speckle left an
    ~8 mm systematic ICP bias through corrupted normals alone.

    Args:
      depth: (H, W), 0 = invalid. ``tau`` in the same unit.

    Returns:
      (H, W) depth with speckle pixels zeroed.
    """
    d = jnp.asarray(depth, jnp.float32)
    r = window // 2
    big = jnp.asarray(3.4e38, jnp.float32)
    pad = jnp.pad(d, r, constant_values=0.0)
    shifts = []
    for dy in range(window):
        for dx in range(window):
            shifts.append(jax.lax.dynamic_slice(
                pad, (dy, dx), d.shape))
    stack = jnp.stack(shifts, axis=-1)                # (H, W, w*w)
    valid = stack > 0
    n = jnp.sum(valid, axis=-1)
    svals = jnp.sort(jnp.where(valid, stack, big), axis=-1)
    med = jnp.take_along_axis(
        svals, jnp.maximum(n - 1, 0)[..., None] // 2, axis=-1)[..., 0]
    # keep pixels near their local median; windows that are mostly invalid
    # (fewer than half valid) don't give a trustworthy median — keep as-is
    keep = (jnp.abs(d - med) <= tau) | (n < (window * window) // 2 + 1)
    return jnp.where((d > 0) & keep, d, 0.0)


def despeckle_depth_np(depth, tau: float = 0.02, window: int = 3):
    """Host-side numpy twin of :func:`despeckle_depth` for callers that
    hold depth on host anyway (the evaluators) — avoids a device
    round-trip per image through the TPU tunnel."""
    import numpy as np

    d = np.asarray(depth, np.float32)
    r = window // 2
    pad = np.pad(d, r, constant_values=0.0)
    stack = np.stack([pad[dy:dy + d.shape[0], dx:dx + d.shape[1]]
                      for dy in range(window) for dx in range(window)],
                     axis=-1)
    valid = stack > 0
    n = valid.sum(-1)
    svals = np.sort(np.where(valid, stack, np.float32(3.4e38)), axis=-1)
    med = np.take_along_axis(
        svals, np.maximum(n - 1, 0)[..., None] // 2, axis=-1)[..., 0]
    keep = (np.abs(d - med) <= tau) | (n < (window * window) // 2 + 1)
    return np.where((d > 0) & keep, d, 0.0).astype(np.float32)


def _gradient2(x):
    """Central-difference image gradient with edge_order-2 boundaries.

    NOTE: the reference calls ``np.gradient(depth, 2, edge_order=2)``
    (``common_util.py:72``) — spacing=2, which HALVES the true per-pixel
    derivative and biases normals toward fronto-parallel by up to ~13 deg on
    tilted surfaces. We use the correct spacing-1 gradient (validated on
    analytic tilted planes in tests/test_geometry_icp.py); this only makes
    the ICP target normals more accurate.
    """
    def grad_axis(a, axis):
        a = jnp.moveaxis(a, axis, 0)
        interior = (a[2:] - a[:-2]) / 2.0
        first = (-3 * a[0] + 4 * a[1] - a[2]) / 2.0
        last = (3 * a[-1] - 4 * a[-2] + a[-3]) / 2.0
        g = jnp.concatenate([first[None], interior, last[None]], axis=0)
        return jnp.moveaxis(g, 0, axis)

    return grad_axis(x, 0), grad_axis(x, 1)


@functools.partial(jax.jit, static_argnames=("refine",))
def normals_from_depth(depth, K, refine: bool = True):
    """Per-pixel surface normals from a depth map (reference
    ``get_normal``): inpaint + gaussian smooth, then the cross product of
    the backprojection's image-space tangents.

    Returns (H, W, 3) unit normals (zeros where degenerate).
    """
    d = jnp.asarray(depth, jnp.float32)
    if refine:
        d = inpaint_depth(d)
        d = gaussian_blur(d, sigma=2.0)
    h, w = d.shape
    v = jnp.arange(h, dtype=jnp.float32)[:, None] - K[1, 2]
    u = jnp.arange(w, dtype=jnp.float32)[None, :] - K[0, 2]
    cx, cy = 1.0 / K[0, 0], 1.0 / K[1, 1]
    dv, du = _gradient2(d)
    # tangents of P(u,v) = [(u-cu) d / fx, (v-cv) d / fy, d]
    t_u = jnp.stack([d * cx + u * cx * du, v * cy * du, du], axis=-1)
    t_v = jnp.stack([u * cx * dv, d * cy + v * cy * dv, dv], axis=-1)
    n = jnp.cross(t_u, t_v)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm == 0, 1.0, norm)
    return jnp.nan_to_num(n)
