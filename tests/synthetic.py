"""Synthetic scene fixtures: analytic ray-cast cube renders with
self-consistent GT (SURVEY.md §4 — integration tests on scenes we render
ourselves, no dataset downloads)."""

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


CAM_K = np.array([[572.4, 0.0, 325.3],
                  [0.0, 573.6, 242.0],
                  [0.0, 0.0, 1.0]], np.float32)


def raycast_cube(R, t, K, im_h=480, im_w=640, half=40.0):
    """Ray-cast an axis-aligned cube [-half, half]^3 under pose (R, t [mm]).

    Returns (hit (H,W) bool, pts (H,W,3) model-frame intersection points).
    """
    v, u = np.mgrid[0:im_h, 0:im_w].astype(np.float64)
    d = np.stack([(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1],
                  np.ones_like(u)], axis=-1)
    # camera ray -> object frame
    d_o = d @ R  # R^T d
    o_o = -t @ R  # R^T (0 - t)
    inv = 1.0 / np.where(np.abs(d_o) < 1e-12, 1e-12, d_o)
    t1 = (-half - o_o) * inv
    t2 = (half - o_o) * inv
    tmin = np.minimum(t1, t2).max(axis=-1)
    tmax = np.maximum(t1, t2).min(axis=-1)
    hit = (tmax > tmin) & (tmax > 0)
    tcl = np.where(tmin > 0, tmin, tmax)
    pts = o_o[None, None] + tcl[..., None] * d_o
    pts = np.clip(pts, -half, half)
    return hit, pts.astype(np.float32)


def xyz_scene(R, t, K=CAM_K, im_h=480, im_w=640, half=40.0):
    """RGB image whose colors ARE the normalized cube coordinates (the
    contract of models_xyz renders), gray background; plus GT norm factors.

    Returns (rgb uint8 (H,W,3), obj_param (6,), hit mask).
    """
    hit, pts = raycast_cube(R, t, K, im_h, im_w, half)
    scale = np.array([half, half, half], np.float32)
    ct = np.zeros(3, np.float32)
    col = ((pts / scale) + 1.0) / 2.0  # [0,1]
    rgb = np.full((im_h, im_w, 3), 128, np.uint8)
    rgb[hit] = np.clip(col[hit] * 255.0, 0, 255).astype(np.uint8)
    obj_param = np.concatenate([scale, ct]).astype(np.float32)
    return rgb, obj_param, hit


class OracleGenerator(nn.Module):
    """Identity 'network': decodes the input colors as coordinates with
    uniform high confidence. With an XYZ-colored scene this turns the
    inference engine into a closed loop with analytic ground truth."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        dummy = self.param("dummy", nn.initializers.zeros, (1,))
        del dummy
        xyz = jnp.clip(x, -1.0, 1.0)
        prob = jnp.full(x.shape[:-1] + (1,), 0.01, x.dtype)
        return xyz, prob


class BandOracleGenerator(nn.Module):
    """Object-SELECTIVE oracle for multi-object scenes: decodes only colors
    within its object's color band (stored as a param so per-object
    variables stack for ``estimate_objects``), emitting gray + high error
    elsewhere — the analytic analogue of a per-object trained network
    suppressing occluders and background (reference trains one net per
    object, ``3_train_pix2pose.py``)).

    ``coord_rot_deg`` != 0 rotates the decoded normalized coordinates
    about the (1,1,1) axis, simulating a systematically miscalibrated
    generator: PnP then returns a pose rotated by exactly that angle (an
    exact solution with perfect reprojection exists). Unlike a depth-scale
    bias — which the RGB-D evaluator's depth prealignment wipes before ICP
    even runs (measured) — a rotation bias can ONLY be recovered by ICP
    iterations, making it the right knob for the ICP-sensitivity A/B."""

    coord_rot_deg: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        band = self.param("band",
                          lambda key: jnp.array([0.0, 1.0], jnp.float32))
        lo, hi = band[0], band[1]
        c = (jnp.clip(x, -1.0, 1.0) + 1.0) / 2.0
        inside = jnp.all((c >= lo - 0.005) & (c <= hi + 0.005),
                         axis=-1, keepdims=True)
        out01 = (c - lo) / jnp.maximum(hi - lo, 1e-6)
        dec = jnp.where(inside, jnp.clip(out01 * 2.0 - 1.0, -1.0, 1.0), 0.0)
        if self.coord_rot_deg:
            th = np.deg2rad(self.coord_rot_deg)
            ax = np.full(3, 1.0 / np.sqrt(3.0))
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            Rb = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
            dec = dec @ jnp.asarray(Rb.T, dec.dtype)
        prob = jnp.where(inside, 0.01, 0.99).astype(x.dtype)
        return dec, prob


def band_oracle_params(lo: float, hi: float):
    """Variables for :class:`BandOracleGenerator` selecting [lo, hi]^3."""
    return {"params": {"band": jnp.array([lo, hi], jnp.float32)}}


def make_shape_patch_store(rng, n_per=10, n_distractors=12):
    """5-class detector patch pool from rendered 3D shapes + distractors.

    Classes are distinct meshes (cube, tall prism, octahedron,
    tetrahedron, flat plate) with distinct color tints, rendered at random
    poses into 128x128 patches; distractors are grey blobs and random
    rectangles labelled -1 (composited clutter, never targets) — the
    miniature analogue of the reference's >=5-object COCO-cluttered
    detection scenes (``1_1_scene_gen_for_detection_maskrcnn.py``)."""
    import jax.numpy as jnp

    from pix2pose_tpu.ops import rasterizer
    from pix2pose_tpu.training.detector_data import DetectorStore
    from bop_fixture import box_mesh, octahedron_mesh

    def tetra_mesh(half):
        v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                     np.float32) * half
        f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]],
                     np.int32)
        return v, f

    shapes = [box_mesh(30, 30, 30), box_mesh(14, 14, 46),
              octahedron_mesh(34), tetra_mesh(30), box_mesh(36, 36, 7)]
    tints = np.array([[255, 80, 80], [80, 255, 80], [90, 90, 255],
                      [250, 240, 70], [240, 90, 240]], np.float32)
    K = np.array([[160.0, 0, 64.0], [0, 160.0, 64.0], [0, 0, 1]],
                 np.float32)

    class _St:
        pass

    stores = {}
    for ci, (v, f) in enumerate(shapes):
        rgbs, masks, extents = [], [], []
        # per-vertex shading from geometry so patches aren't flat color
        shade = 0.55 + 0.45 * (v[:, 2] - v[:, 2].min()) / max(
            np.ptp(v[:, 2]), 1e-6)
        colors = (tints[ci][None] * shade[:, None]).astype(np.float32)
        for _ in range(n_per):
            R, t = pose_with_euler(
                yaw=rng.uniform(-np.pi, np.pi),
                pitch=rng.uniform(-1.2, 1.2),
                roll=rng.uniform(-np.pi, np.pi),
                tx=0.0, ty=0.0, tz=rng.uniform(280, 360))
            out = rasterizer.render_mesh(v, f, colors, R, t, K, 128, 128)
            m = np.asarray(out.mask)
            rgb = np.zeros((128, 128, 3), np.uint8)
            rgb[m] = np.clip(np.asarray(out.attr)[m], 0, 255).astype(
                np.uint8)
            ys, xs = np.nonzero(m)
            ext = float(max(np.ptp(ys) if ys.size else 1,
                            np.ptp(xs) if xs.size else 1, 8))
            rgbs.append(rgb)
            masks.append(m)
            extents.append(ext)
        st = _St()
        st.rgb = jnp.asarray(np.stack(rgbs))
        st.mask = jnp.asarray(np.stack(masks))
        st.extent = jnp.asarray(np.array(extents, np.float32))
        stores[ci + 1] = st

    dr, dm, de = [], [], []
    yy, xx = np.mgrid[0:128, 0:128]
    for i in range(n_distractors):
        rgb = np.zeros((128, 128, 3), np.uint8)
        m = np.zeros((128, 128), bool)
        if i % 2 == 0:  # grey blob
            r = rng.randint(18, 40)
            m = ((yy - 64) ** 2 + (xx - 64) ** 2) < r * r
            g = rng.randint(120, 220)
            rgb[m] = [g, g, g]
            ext = 2.0 * r
        else:  # random dull rectangle
            h2, w2 = rng.randint(12, 40, 2)
            m[64 - h2:64 + h2, 64 - w2:64 + w2] = True
            rgb[m] = rng.randint(60, 160, 3)
            ext = 2.0 * max(h2, w2)
        dr.append(rgb)
        dm.append(m)
        de.append(float(ext))
    distr = _St()
    distr.rgb = jnp.asarray(np.stack(dr))
    distr.mask = jnp.asarray(np.stack(dm))
    distr.extent = jnp.asarray(np.array(de, np.float32))

    backs = rng.randint(0, 90, (4, 256, 256, 3)).astype(np.uint8)
    return DetectorStore.from_patch_stores(stores, jnp.asarray(backs),
                                           distractors=[distr])


def pose_with_euler(yaw=0.4, pitch=-0.3, roll=0.2, tx=10.0, ty=-20.0,
                    tz=600.0):
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    R = (Rz @ Ry @ Rx).astype(np.float32)
    return R, np.array([tx, ty, tz], np.float32)
