"""Texture-mapped rendering (reference ``rendering/renderer.py:50-79``
textured GL program + ``rendering/model.py:91-120`` texture/UV load)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pix2pose_tpu.data.ply import (find_texture, load_ply, load_texture,
                                   save_ply)
from pix2pose_tpu.ops.rasterizer import render_textured
from pix2pose_tpu.ops.texture import sample_texture

K = np.array([[400.0, 0.0, 64.0], [0.0, 400.0, 64.0], [0.0, 0.0, 1.0]],
             np.float32)


def _quad(side=40.0):
    """Camera-facing square quad at z=200 with corner UVs."""
    s = side / 2
    verts = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    normals = np.tile(np.array([0, 0, -1.0], np.float32), (4, 1))
    return verts, faces, uvs, normals


def _np_bilinear(tex, u, v):
    """Plain-numpy GL-texture2D expectation (v up, clamp-to-edge,
    texel-center sampling)."""
    ht, wt = tex.shape[:2]
    x = np.clip(u, 0, 1) * wt - 0.5
    y = (1.0 - np.clip(v, 0, 1)) * ht - 0.5
    x0 = np.clip(np.floor(x).astype(int), 0, wt - 1)
    y0 = np.clip(np.floor(y).astype(int), 0, ht - 1)
    x1 = np.clip(np.floor(x).astype(int) + 1, 0, wt - 1)
    y1 = np.clip(np.floor(y).astype(int) + 1, 0, ht - 1)
    fx = (x - np.floor(x))[..., None]
    fy = (y - np.floor(y))[..., None]
    top = tex[y0, x0] * (1 - fx) + tex[y0, x1] * fx
    bot = tex[y1, x0] * (1 - fx) + tex[y1, x1] * fx
    return top * (1 - fy) + bot * fy


def test_sampler_matches_numpy_bilinear():
    rs = np.random.RandomState(0)
    tex = rs.rand(13, 9, 3).astype(np.float32) * 255
    uv = rs.rand(200, 2).astype(np.float32) * 1.2 - 0.1  # incl. clamping
    got = np.asarray(sample_texture(jnp.asarray(tex), jnp.asarray(uv)))
    want = _np_bilinear(tex, uv[:, 0], uv[:, 1])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_textured_quad_matches_per_pixel_expectation():
    """Fronto-parallel quad: the rendered image must equal sampling the
    texture at each pixel's analytically known UV (the quad maps linearly
    to screen space, and perspective correction is exact for constant z).
    Checker texture so errors anywhere in the UV chain show as full-scale
    color flips."""
    verts, faces, uvs, normals = _quad()
    tex = np.zeros((16, 16, 3), np.float32)
    tex[::2, ::2] = 255.0
    tex[1::2, 1::2] = 255.0
    tex[:, :, 1] = np.linspace(0, 255, 16)[None, :]  # break symmetry in u
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 200.0], np.float32)
    out = render_textured(verts, faces, uvs, jnp.asarray(tex), normals,
                          R, t, K, 128, 128)
    mask = np.asarray(out.mask)
    got = np.asarray(out.attr)

    # quad spans u,v in [-s,s]*400/200 + 64 = [24, 104) pixels
    ys, xs = np.nonzero(mask)
    # analytic UV of each covered pixel center
    X = (xs - K[0, 2]) * 200.0 / K[0, 0]  # mm in quad plane
    Y = (ys - K[1, 2]) * 200.0 / K[1, 1]
    u = (X + 20.0) / 40.0
    v = (Y + 20.0) / 40.0
    want = _np_bilinear(tex, u, v)
    # headlight shading at normal (0,0,-1): min(1, 0.5+0.5*1) = 1
    np.testing.assert_allclose(got[ys, xs], want, atol=0.75)
    # interior coverage sanity (quad projects to [24,104)^2)
    assert mask[30:98, 30:98].all()
    assert not mask[:20].any() and not mask[:, :20].any()


def test_v_flip_orientation():
    """UV v=1 (texture-space top row after the GL flip) must land at the
    quad's +Y edge, which projects to the image's LOWER half (y down in
    image coords) — the exact flip the reference bakes in by
    ``cv2.flip(img, 0)`` at load (``model.py:103``)."""
    verts, faces, uvs, normals = _quad()
    tex = np.zeros((8, 8, 3), np.float32)
    tex[0] = [255.0, 0.0, 0.0]      # top image row = v~1
    tex[-1] = [0.0, 0.0, 255.0]     # bottom image row = v~0
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 200.0], np.float32)
    out = render_textured(verts, faces, uvs, jnp.asarray(tex), normals,
                          R, t, K, 128, 128)
    a = np.asarray(out.attr)
    # +Y vertex edge (v=1) is at image bottom rows (~103): red
    assert a[102, 64, 0] > 150 and a[102, 64, 2] < 50
    # -Y edge (v=0) at image top rows (~25): blue
    assert a[26, 64, 2] > 150 and a[26, 64, 0] < 50


def test_ply_facewise_texcoord_scatter(tmp_path):
    """Face-wise `property list ... texcoord` PLY (the reference's other
    texcoord layout, ``model.py:106-109``): corner UVs scatter onto
    vertices, last write wins."""
    p = tmp_path / "m.ply"
    with open(p, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 2
property list uchar int vertex_indices
property list uchar float texcoord
end_header
0 0 0
1 0 0
1 1 0
0 1 0
3 0 1 2 6 0.0 0.0 1.0 0.0 1.0 1.0
3 0 2 3 6 0.0 0.0 1.0 1.0 0.0 1.0
""")
    mesh = load_ply(str(p))
    assert mesh["faces"].shape == (2, 3)
    assert mesh["texture_uv"].shape == (4, 2)
    np.testing.assert_allclose(mesh["texture_uv"][1], [1.0, 0.0])
    np.testing.assert_allclose(mesh["texture_uv"][3], [0.0, 1.0])
    # vertex 0 and 2 appear in both faces; last face's write wins
    np.testing.assert_allclose(mesh["texture_uv"][0], [0.0, 0.0])
    np.testing.assert_allclose(mesh["texture_uv"][2], [1.0, 1.0])


def test_ply_binary_facewise_texcoord(tmp_path):
    """Binary little-endian face element with vertex_indices + texcoord
    lists parses to the same scatter."""
    import struct

    p = tmp_path / "m.ply"
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 3\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"element face 1\n"
              b"property list uchar int vertex_indices\n"
              b"property list uchar float texcoord\n"
              b"end_header\n")
    with open(p, "wb") as f:
        f.write(header)
        for v in [(0, 0, 0), (1, 0, 0), (0, 1, 0)]:
            f.write(struct.pack("<3f", *v))
        f.write(struct.pack("<B3i", 3, 0, 1, 2))
        f.write(struct.pack("<B6f", 6, 0.1, 0.2, 0.9, 0.2, 0.5, 0.8))
    mesh = load_ply(str(p))
    assert mesh["faces"].shape == (1, 3)
    np.testing.assert_allclose(mesh["texture_uv"],
                               [[0.1, 0.2], [0.9, 0.2], [0.5, 0.8]],
                               atol=1e-6)


def test_find_and_load_texture(tmp_path):
    from PIL import Image

    ply = tmp_path / "obj_000001.ply"
    save_ply(str(ply), np.zeros((3, 3), np.float32),
             faces=np.array([[0, 1, 2]], np.int32))
    assert find_texture(str(ply)) is None
    img = np.zeros((4, 6, 3), np.uint8)
    img[0, 0] = [10, 20, 30]
    Image.fromarray(img).save(tmp_path / "obj_000001.png")
    tp = find_texture(str(ply))
    assert tp and tp.endswith(".png")
    tex = load_texture(tp)
    assert tex.shape == (4, 6, 3) and tex.dtype == np.float32
    np.testing.assert_allclose(tex[0, 0], [10, 20, 30])


def test_render_train_views_textured(tmp_path):
    """render_train_split picks the textured path when the model ships
    UVs + a sibling texture: emitted views must show the texture's color,
    not the vertex-color fallback."""
    import json

    from PIL import Image

    from pix2pose_tpu.data.bop import BopDataset
    from pix2pose_tpu.tools.render_train_views import render_train_split

    ds_dir = tmp_path / "bop" / "toy"
    (ds_dir / "models").mkdir(parents=True)
    # square-ish box mesh with per-vertex UVs all pointing at one texel
    verts, faces, uvs, normals = _quad(40.0)
    # write a textured ply: vertex texture_u/v route
    p = ds_dir / "models" / "obj_000001.ply"
    n = verts.shape[0]
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float nx\nproperty float ny\nproperty float nz\n"
                "property float texture_u\nproperty float texture_v\n"
                f"element face {faces.shape[0]}\n"
                "property list uchar int vertex_indices\nend_header\n")
        for i in range(n):
            f.write(" ".join(str(float(x)) for x in (*verts[i],
                                                     *normals[i],
                                                     *uvs[i])) + "\n")
        for fc in faces:
            f.write("3 " + " ".join(str(int(x)) for x in fc) + "\n")
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :] = [0, 200, 30]
    Image.fromarray(tex).save(ds_dir / "models" / "obj_000001.png")
    with open(ds_dir / "models" / "models_info.json", "w") as f:
        json.dump({"1": {"diameter": 56.6}}, f)
    # camera + a pose source split
    with open(ds_dir / "camera.json", "w") as f:
        json.dump({"cx": 64.0, "cy": 64.0, "fx": 400.0, "fy": 400.0,
                   "width": 128, "height": 128}, f)
    src = tmp_path / "src_scene"
    (src / "000001").mkdir(parents=True)
    with open(src / "000001" / "scene_gt.json", "w") as f:
        json.dump({"0": [{"obj_id": 1,
                          "cam_R_m2c": list(np.eye(3).reshape(-1)),
                          "cam_t_m2c": [0.0, 0.0, 200.0]}]}, f)

    ds = BopDataset(str(tmp_path / "bop"), "toy", train=True)
    wrote = render_train_split(ds, str(src), per_obj=1)
    assert wrote == 1
    img = np.asarray(Image.open(
        ds_dir / "train" / "000001" / "rgb" / "000000.png"))
    ys, xs = np.nonzero(img.sum(-1) > 0)
    assert len(ys) > 500
    center = img[ys.mean().astype(int), xs.mean().astype(int)]
    # texture green, headlight shade 1.0 at the facing normal
    assert center[1] > 150 and center[0] < 30 and center[2] < 60
