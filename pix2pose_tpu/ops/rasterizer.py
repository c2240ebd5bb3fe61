"""JAX triangle rasterizer: depth + mask + interpolated vertex attributes.

One renderer replaces all three of the reference's raster paths: the unlit
XYZ OpenGL renderer (``rendering/renderer_xyz.py`` — fragment color IS the
vertex color, ``:47``), the lit preview renderer (``rendering/renderer.py``)
and the PyCUDA depth rasterizer (``rendering/gpu_render.py:26-93``).

Design (TPU-first): no scanlines, no atomics. Faces are processed in fixed
chunks under ``lax.scan``; each chunk evaluates barycentric coverage of all
window pixels against all its faces as dense VPU math, reduces with a z-min
(replacing the CUDA kernel's ``atomicMin`` float trick — SURVEY.md §5.2),
and the carried z-buffer/attribute image is updated with a masked select.
Shapes are fully static: (pixels, chunk) intermediates, jit once per
(window, chunk, mesh-size) signature.

Conventions match the reference: OpenCV pinhole projection
(u = fx x/z + cx), camera looks down +z, depth 0 = background. Attributes
are interpolated perspective-correct (GL varying semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RenderOut(NamedTuple):
    depth: jnp.ndarray  # (h, w) float32, 0 = background
    attr: jnp.ndarray   # (h, w, C) interpolated vertex attributes
    mask: jnp.ndarray   # (h, w) bool
    # count of (tile, chunk) work pairs DROPPED by the binned Pallas
    # driver's static capacity (faces missing from some tiles when > 0);
    # always 0 for the XLA and exhaustive-Pallas paths. Device scalar —
    # accumulate and fetch deferred (axon pathology 1), don't read hot.
    overflow: jnp.ndarray | int = 0


def project_vertices(verts, R, t, K):
    """Model-space vertices -> (uv (V,2), z (V,)) in pixels/depth-units.

    Same camera math as the reference renderers
    (``gpu_render.py:99-100``, ``renderer_xyz.py:186-201`` modulo GL clip
    space): X_cam = R X + t, u = fx x/z + cx, v = fy y/z + cy.
    """
    p = verts @ R.T + t
    z = p[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * p[..., 0] / zs + K[0, 1] * p[..., 1] / zs + K[0, 2]
    v = K[1, 1] * p[..., 1] / zs + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def _pad_faces(faces, chunk):
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.full((pad, 3), -1, faces.dtype)], axis=0)
    return faces, (f + pad) // chunk


@functools.partial(
    jax.jit, static_argnames=("h", "w", "chunk", "far"))
def rasterize(uv, z, faces, attrs, h: int, w: int, v0=0, u0=0,
              chunk: int = 128, far: float = 1e9) -> RenderOut:
    """Rasterize a projected mesh into an (h, w) window at offset (v0, u0).

    Args:
      uv: (V, 2) projected pixel coords (full-image frame).
      z: (V,) camera-space depths (>0 in front).
      faces: (F, 3) int vertex indices; index -1 marks padding.
      attrs: (V, C) per-vertex attributes (e.g. XYZ colors).
      h, w: static window size. v0, u0: window origin (may be traced).
      chunk: faces per scan step.

    Returns:
      :class:`RenderOut` with window-frame depth/attr/mask.
    """
    uv = jnp.asarray(uv, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    attrs = jnp.asarray(attrs, jnp.float32)
    n_attr = attrs.shape[-1]
    faces, n_chunks = _pad_faces(jnp.asarray(faces, jnp.int32), chunk)

    # pixel centers in full-image coordinates
    pv = (jnp.arange(h, dtype=jnp.float32) + jnp.asarray(v0, jnp.float32))
    pu = (jnp.arange(w, dtype=jnp.float32) + jnp.asarray(u0, jnp.float32))
    px_u = jnp.broadcast_to(pu[None, :], (h, w)).reshape(-1)  # (P,)
    px_v = jnp.broadcast_to(pv[:, None], (h, w)).reshape(-1)

    face_chunks = faces.reshape(n_chunks, chunk, 3)

    def body(carry, fc):
        zbuf, abuf = carry
        valid_f = fc[:, 0] >= 0
        idx = jnp.maximum(fc, 0)
        tri_uv = uv[idx]        # (chunk, 3, 2)
        tri_z = z[idx]          # (chunk, 3)
        tri_a = attrs[idx]      # (chunk, 3, C)

        u1, u2, u3 = tri_uv[:, 0, 0], tri_uv[:, 1, 0], tri_uv[:, 2, 0]
        v1, v2, v3 = tri_uv[:, 0, 1], tri_uv[:, 1, 1], tri_uv[:, 2, 1]
        den = (v2 - v3) * (u1 - u3) + (u3 - u2) * (v1 - v3)  # (chunk,)
        den_ok = jnp.abs(den) > 1e-12
        den = jnp.where(den_ok, den, 1.0)

        du = px_u[:, None] - u3[None, :]   # (P, chunk)
        dv = px_v[:, None] - v3[None, :]
        a = ((v2 - v3)[None, :] * du + (u3 - u2)[None, :] * dv) / den
        b = ((v3 - v1)[None, :] * du + (u1 - u3)[None, :] * dv) / den
        c = 1.0 - a - b
        cover = ((a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
                 & (c >= 0) & (c <= 1)
                 & den_ok[None, :] & valid_f[None, :]
                 & (tri_z > 0).all(axis=1)[None, :])

        # perspective-correct interpolation: linear in (1/z, attr/z)
        inv_z = 1.0 / jnp.maximum(tri_z, 1e-9)  # (chunk, 3)
        inv_zi = (a * inv_z[None, :, 0] + b * inv_z[None, :, 1]
                  + c * inv_z[None, :, 2])
        zi = 1.0 / jnp.maximum(inv_zi, 1e-12)  # (P, chunk)
        zi = jnp.where(cover, zi, far)

        zmin = jnp.min(zi, axis=1)                  # (P,)
        amin = jnp.argmin(zi, axis=1)               # (P,)
        take = zmin < zbuf

        # attributes of the winning face, perspective-correct
        aw = jnp.take_along_axis(a, amin[:, None], 1)[:, 0]
        bw = jnp.take_along_axis(b, amin[:, None], 1)[:, 0]
        cw = 1.0 - aw - bw
        fa = tri_a[amin]          # (P, 3, C)
        fz = inv_z[amin]          # (P, 3)
        num = (aw[:, None] * fa[:, 0] * fz[:, 0:1]
               + bw[:, None] * fa[:, 1] * fz[:, 1:2]
               + cw[:, None] * fa[:, 2] * fz[:, 2:3])
        denom = (aw * fz[:, 0] + bw * fz[:, 1] + cw * fz[:, 2])
        attr_pix = num / jnp.maximum(denom, 1e-12)[:, None]

        zbuf = jnp.where(take, zmin, zbuf)
        abuf = jnp.where(take[:, None], attr_pix, abuf)
        return (zbuf, abuf), None

    zbuf0 = jnp.full((h * w,), far, jnp.float32)
    abuf0 = jnp.zeros((h * w, n_attr), jnp.float32)
    (zbuf, abuf), _ = jax.lax.scan(body, (zbuf0, abuf0), face_chunks)

    mask = zbuf < far
    depth = jnp.where(mask, zbuf, 0.0).reshape(h, w)
    attr = jnp.where(mask[:, None], abuf, 0.0).reshape(h, w, n_attr)
    return RenderOut(depth=depth, attr=attr, mask=mask.reshape(h, w))


def render_mesh(verts, faces, attrs, R, t, K, h: int, w: int,
                v0=0, u0=0, chunk: int = 128,
                prefer_pallas: bool | None = None,
                pair_factor: int = 8) -> RenderOut:
    """Convenience: pose + project + rasterize (jit-compatible; h, w
    static).

    Full-frame tile-aligned renders on TPU dispatch to the binned Pallas
    kernel (depth tile stays in VMEM across the face loop; grid steps
    scale with actual tile/chunk overlap — faster than both the XLA scan
    path and the exhaustive Pallas grid at every measured mesh size);
    windowed or oddly-shaped renders use the XLA scan path.

    ``pair_factor`` sizes the binned driver's static work list; the
    returned :attr:`RenderOut.overflow` counts dropped work pairs (0 =
    exact). Callers on truncation-sensitive paths (ICP, VSD) accumulate
    it on device and surface it at result-fetch time.
    """
    uv, z = project_vertices(verts, R, t, K)
    if prefer_pallas is None:
        import jax

        # respect an active `jax.default_device(cpu)` override — the
        # backend may be TPU while this computation is placed on CPU
        dd = jax.config.jax_default_device
        platform = (dd.platform if dd is not None
                    else jax.default_backend())
        prefer_pallas = (platform not in ("cpu",)
                         and isinstance(v0, int) and v0 == 0
                         and isinstance(u0, int) and u0 == 0)
    if prefer_pallas and h % 16 == 0 and w % 128 == 0:
        from pix2pose_tpu.ops.rasterizer_pallas import \
            rasterize_pallas_binned

        return rasterize_pallas_binned(uv, z, faces, attrs, h, w,
                                       pair_factor=pair_factor)
    return rasterize(uv, z, faces, attrs, h, w, v0, u0, chunk)


def render_depth(verts, faces, R, t, K, h: int, w: int, **kw):
    """Depth+mask only (the CUDA renderer's contract,
    ``gpu_render.py:122-125``)."""
    out = render_mesh(verts, faces, jnp.zeros((verts.shape[0], 1)), R, t, K,
                      h, w, **kw)
    return out.depth, out.mask


def render_lit(verts, faces, colors, normals, R, t, K, h: int, w: int,
               ambient: float = 0.5, diffuse: float = 0.5,
               **kw) -> RenderOut:
    """Lambertian-headlight shaded render (the lit GL renderer's look,
    ``rendering/renderer.py:33-49``): color attributes are modulated by the
    camera-space normal's facing term before interpolation.

    Args:
      colors: (V, C) base vertex colors. normals: (V, 3) unit normals.
    """
    shade = _headlight_shade(normals, R, ambient, diffuse)
    lit = jnp.asarray(colors, jnp.float32) * shade[:, None]
    return render_mesh(verts, faces, lit, R, t, K, h, w, **kw)


def _headlight_shade(normals, R, ambient: float, diffuse: float):
    """Per-vertex headlight Lambertian term, clipped at 1 like the GL
    shader (``renderer.py:44-46``: ``min(1, ambient + 0.5 * diffuse)``).
    The reference shades with flat face normals (dFdx/dFdy); vertex
    normals give the smooth-shaded equivalent."""
    n_cam = normals @ jnp.asarray(R, jnp.float32).T
    lam = jnp.clip(-n_cam[:, 2], 0.0, 1.0)
    return jnp.minimum(ambient + diffuse * lam, 1.0)


def render_textured(verts, faces, uv_coords, texture, normals, R, t, K,
                    h: int, w: int, ambient: float = 0.5,
                    diffuse: float = 0.5, **kw) -> RenderOut:
    """UV-textured lit render (the reference's textured GL program,
    ``rendering/renderer.py:50-79``): per-vertex UVs are interpolated
    perspective-correct alongside a headlight shade term, then the texture
    is sampled bilinearly per covered pixel and modulated —
    ``gl_FragColor = texture2D(u_tex, v_texcoord) * light_w``.

    Args:
      uv_coords: (V, 2) GL texture coordinates (v up from the bottom; the
        image flip of ``model.py:103`` is handled by the sampler).
      texture: (Ht, Wt, C) texture image, image-row order, any range
        (output attr is in the texture's range).
      normals: (V, 3) unit vertex normals for the shade term.

    Returns :class:`RenderOut` whose ``attr`` is the shaded (h, w, C) RGB.
    """
    from pix2pose_tpu.ops.texture import sample_texture

    shade = _headlight_shade(normals, R, ambient, diffuse)
    attrs = jnp.concatenate(
        [jnp.asarray(uv_coords, jnp.float32), shade[:, None]], axis=1)
    out = render_mesh(verts, faces, attrs, R, t, K, h, w, **kw)
    rgb = sample_texture(texture, out.attr[..., :2])
    rgb = rgb * jnp.clip(out.attr[..., 2:3], 0.0, 1.0)
    rgb = jnp.where(out.mask[..., None], rgb, 0.0)
    return RenderOut(depth=out.depth, attr=rgb, mask=out.mask,
                     overflow=out.overflow)
