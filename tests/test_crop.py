"""Fused crop-resize vs. explicit canvas-paste + jax.image.resize
(the reference semantics at recognition.py:75-82)."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.ops import boxes, crop


def explicit_canvas_resize(image, box, out_size=128):
    """Reference semantics: zero canvas, paste clamped patch, bilinear resize
    with antialiasing."""
    b = [int(x) for x in box]
    v1_ori, v2_ori, u1_ori, u2_ori, v1, v2, u1, u2, vv1, vv2, uu1, uu2 = b
    canvas = np.zeros((v2_ori - v1_ori, u2_ori - u1_ori, image.shape[2]),
                      np.float32)
    canvas[vv1:vv2, uu1:uu2] = image[v1:v2, u1:u2]
    return np.asarray(
        jax.image.resize(jnp.asarray(canvas), (out_size, out_size,
                                               image.shape[2]),
                         method="linear", antialias=True))


def _rand_image(rng, h=480, w=640, c=3):
    return rng.uniform(-1, 1, size=(h, w, c)).astype(np.float32)


def test_crop_resize_interior_box():
    rng = np.random.RandomState(0)
    img = _rand_image(rng)
    bbox = np.array([100, 200, 260, 380], np.int32)
    box = boxes.get_boxes(bbox, 480, 640)
    got = np.asarray(crop.crop_resize(jnp.asarray(img), box))
    ref = explicit_canvas_resize(img, box)
    assert np.abs(got - ref).max() < 5e-2
    assert np.abs(got - ref).mean() < 5e-3


def test_crop_resize_clipped_box():
    rng = np.random.RandomState(1)
    img = _rand_image(rng)
    for bbox in [
        np.array([-30, -40, 200, 180], np.int32),   # clipped top-left
        np.array([300, 400, 600, 700], np.int32),   # clipped bottom-right
        np.array([-20, 500, 120, 700], np.int32),   # corner
    ]:
        box = boxes.get_boxes(bbox, 480, 640)
        got = np.asarray(crop.crop_resize(jnp.asarray(img), box))
        ref = explicit_canvas_resize(img, box)
        # interior comparison (edge-normalization conventions differ slightly)
        assert np.abs(got[2:-2, 2:-2] - ref[2:-2, 2:-2]).max() < 8e-2
        assert np.abs(got - ref).mean() < 1e-2
        # zero-padding regions must be zero-ish in both
        pad = np.abs(ref).sum(axis=2) < 1e-6
        assert np.abs(got[pad]).max() < 5e-2


def test_crop_resize_upsampling_small_box():
    rng = np.random.RandomState(2)
    img = _rand_image(rng)
    bbox = np.array([101, 201, 131, 229], np.int32)  # ~42px window -> 128
    box = boxes.get_boxes(bbox, 480, 640)
    got = np.asarray(crop.crop_resize(jnp.asarray(img), box))
    ref = explicit_canvas_resize(img, box)
    assert np.abs(got - ref).mean() < 2e-2


def test_crop_resize_batch_vmap():
    rng = np.random.RandomState(3)
    img = jnp.asarray(_rand_image(rng))
    bbs = np.stack([
        np.array([100, 200, 260, 380], np.int32),
        np.array([-30, -40, 200, 180], np.int32),
        np.array([5, 5, 100, 90], np.int32),
    ])
    bx = jax.vmap(lambda b: boxes.get_boxes(b, 480, 640))(bbs)
    out = crop.crop_resize_batch(img, bx, 128, True)
    assert out.shape == (3, 128, 128, 3)
    single = crop.crop_resize(img, jax.tree.map(lambda x: x[0], bx))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single),
                               atol=1e-5)


def test_ramp_sampling_is_exact():
    """Sampling a coordinate ramp must return crop_pixel_centers exactly —
    regression test for the discrete-kernel normalization ripple that
    produced ~5px sawtooth coordinate errors (and ~80mm pose errors)."""
    img = np.zeros((480, 640, 2), np.float32)
    img[..., 0] = np.arange(640)[None, :]
    img[..., 1] = np.arange(480)[:, None]
    for bbox in ([160, 270, 290, 400], [10, 10, 100, 80],
                 [-20, 300, 200, 640]):
        box = boxes.get_boxes(np.asarray(bbox, np.int32), 480, 640)
        out = np.asarray(crop.crop_resize(jnp.asarray(img), box))
        vv, uu, valid = crop.crop_pixel_centers(box, 128)
        from scipy import ndimage
        # erode the in-image mask: at the clipped-window boundary the
        # kernel support correctly mixes in pasted zeros
        inner = ndimage.binary_erosion(np.array(valid), iterations=4)
        inner[:3] = False
        inner[-3:] = False
        inner[:, :3] = False
        inner[:, -3:] = False
        assert np.abs(out[..., 0] - np.asarray(uu))[inner].max() < 0.1
        assert np.abs(out[..., 1] - np.asarray(vv))[inner].max() < 0.1


def test_crop_pixel_centers_roundtrip():
    bbox = np.array([100, 200, 260, 380], np.int32)
    box = boxes.get_boxes(bbox, 480, 640)
    vv, uu, valid = crop.crop_pixel_centers(box, 128)
    # center of output grid ~ center of the window
    v_ct = (int(box.v1_ori) + int(box.v2_ori)) / 2
    u_ct = (int(box.u1_ori) + int(box.u2_ori)) / 2
    assert abs(float(vv[63, 0]) + float(vv[64, 0]) - 2 * v_ct + 1) < 2.0
    assert abs(float(uu[0, 63]) + float(uu[0, 64]) - 2 * u_ct + 1) < 2.0
    assert bool(valid.all())  # interior box: all centers in image


def test_paste_to_image_matches_upsample_paste():
    rng = np.random.RandomState(4)
    pred = rng.uniform(0, 1, size=(128, 128, 3)).astype(np.float32)
    bbox = np.array([100, 200, 260, 380], np.int32)
    box = boxes.get_boxes(bbox, 480, 640)
    out = np.asarray(crop.paste_to_image(jnp.asarray(pred), box, 480, 640))
    b = [int(x) for x in box]
    v1_ori, v2_ori, u1_ori, u2_ori, v1, v2, u1, u2, vv1, vv2, uu1, uu2 = b
    up = np.asarray(jax.image.resize(
        jnp.asarray(pred), (v2_ori - v1_ori, u2_ori - u1_ori, 3),
        method="linear"))
    ref = np.zeros((480, 640, 3), np.float32)
    ref[v1:v2, u1:u2] = up[vv1:vv2, uu1:uu2]
    assert np.abs(out - ref).max() < 5e-2
    assert np.abs(out - ref).mean() < 2e-3
