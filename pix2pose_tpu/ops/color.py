"""Normalized-coordinate ("XYZ") color codec.

The data contract of the whole system: each object's model coordinates are
affinely mapped into RGB so that a rendered, *unlit* image of the recolored
model is a per-pixel coordinate map. The reference computes per-axis scale
(max abs deviation from the vertex mean) and center and stores them in
``models_xyz/norm_factor.json`` (reference
``tools/2_1_ply_file_to_3d_coord_model.py:30-63,97-101``); inference inverts
the map (reference ``pix2pose_model/recognition.py:197-202``).

Everything here is pure jnp and works under jit/vmap on arrays of any batch
shape.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def norm_factor_from_vertices(vertices, center: bool = True):
    """Per-axis (scale, center) for coordinate colorization.

    ``scale[k] = max(|v[:,k] - mean(v[:,k])|)``, ``center[k] = mean(v[:,k])``
    (reference ``2_1_ply_file_to_3d_coord_model.py:34-47``).

    Args:
      vertices: (N, 3) model vertices (mm, BOP convention).
      center: if False, centers are forced to zero (reference ``2_1:35-46``).

    Returns:
      (scale(3,), center(3,)) float arrays.
    """
    vertices = jnp.asarray(vertices)
    ct = jnp.mean(vertices, axis=0)
    if not center:
        ct = jnp.zeros_like(ct)
    scale = jnp.max(jnp.abs(vertices - ct), axis=0)
    return scale, ct


def xyz_to_color01(xyz, scale, ct):
    """Model coordinates -> color in [0, 1].

    ``c = ((x - ct)/scale + 1)/2`` (reference ``2_1:50-58``). Values are NOT
    clipped (the reference leaves slight overshoot for asymmetric-center axes;
    ``2_1:57-58`` clipping is commented out).
    """
    return ((jnp.asarray(xyz) - ct) / scale + 1.0) * 0.5


def color01_to_xyz(color01, scale, ct):
    """Color in [0, 1] -> model coordinates.

    ``x = (c*2 - 1)*scale + ct`` (reference ``recognition.py:198-202``).
    """
    return (jnp.asarray(color01) * 2.0 - 1.0) * scale + ct


def tanh_to_color01(decoded):
    """Network tanh output in [-1, 1] -> clipped color in [0, 1]
    (reference ``recognition.py:85-88``)."""
    return jnp.clip((decoded + 1.0) * 0.5, 0.0, 1.0)


def colorize_vertices_u8(vertices, scale=None, ct=None):
    """Produce uint8 vertex colors for writing a ``models_xyz`` PLY.

    Reference writes ``round`` -free ``r*255`` casts (``2_1:59-61``, numpy
    float->uint8 truncation via assignment into a uint8 recarray).
    """
    vertices = np.asarray(vertices)
    if scale is None or ct is None:
        s, c = norm_factor_from_vertices(vertices)
        scale = np.asarray(s) if scale is None else scale
        ct = np.asarray(c) if ct is None else ct
    col = np.asarray(xyz_to_color01(vertices, np.asarray(scale), np.asarray(ct)))
    return (col * 255).astype(np.uint8)


def obj_param_from_norm_factor(model_param: dict):
    """Flatten a ``norm_factor.json`` entry into the 6-vector
    [x_scale, y_scale, z_scale, x_ct, y_ct, z_ct] used by the estimator
    (reference ``tools/bop_io.py:33-42``)."""
    return np.array(
        [
            model_param["x_scale"],
            model_param["y_scale"],
            model_param["z_scale"],
            model_param["x_ct"],
            model_param["y_ct"],
            model_param["z_ct"],
        ],
        dtype=np.float32,
    )
