"""Texture sampling for the JAX rasterizer (reference textured GL path).

The reference renders UV-textured models through GLSL
(``rendering/renderer.py:50-79``: ``texture2D(u_tex, v_texcoord)`` with the
texture image vertically flipped at load time, ``rendering/model.py:103``
— OpenGL's v-up convention). Here the rasterizer interpolates the UV
attribute per pixel (perspective-correct, like a GL varying) and this
module performs the sampler's job as one batched bilinear gather.

TPU note: the gather is irregular memory traffic, so this lives on the
training-data/preview path (``render_textured``), not in the inference
engine's hot loop — same division of labor as the reference, which only
uses textures for realistic train views.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_texture(tex, uv, flip_v: bool = True):
    """Bilinear texture lookup (GL ``texture2D`` semantics, clamp-to-edge).

    Args:
      tex: (Ht, Wt, C) float32 texture image in image-row order (row 0 =
        TOP of the picture, as decoders emit it). The GL flip
        (``model.py:103``) is folded into the coordinate transform via
        ``flip_v`` instead of flipping the array.
      uv: (..., 2) texture coordinates; u right, v UP from the bottom
        edge (GL convention) when ``flip_v`` is True.

    Returns:
      (..., C) bilinearly interpolated texels.
    """
    tex = jnp.asarray(tex, jnp.float32)
    ht, wt = tex.shape[0], tex.shape[1]
    u = jnp.clip(uv[..., 0], 0.0, 1.0)
    v = jnp.clip(uv[..., 1], 0.0, 1.0)
    # texel-center sampling: u in [0,1] spans [−0.5, Wt−0.5] texel space
    x = u * wt - 0.5
    y = ((1.0 - v) if flip_v else v) * ht - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    # clamp-to-edge: x1 clamps from the UNclamped floor, so coordinates
    # past the edge collapse both taps onto the edge texel
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, wt - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, ht - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, wt - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, ht - 1)
    t00 = tex[y0, x0]
    t01 = tex[y0, x1]
    t10 = tex[y1, x0]
    t11 = tex[y1, x1]
    top = t00 * (1.0 - fx) + t01 * fx
    bot = t10 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy
