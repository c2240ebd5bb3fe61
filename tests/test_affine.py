"""ops/affine: gather sampler vs the banded-matmul sampler.

The matmul path (``affine_sample_mm``) is the TPU production path for
training-data synthesis (gathers run on the TPU scalar unit at ~0.001%
MFU); these tests pin its contract to the reference gather
implementation: bit-level agreement on axis-aligned maps (where two-pass
resampling IS bilinear), footprint-level agreement on rotations, exact
fill semantics, and vmap compatibility.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pix2pose_tpu.ops.affine import (affine_sample, affine_sample_mm,
                                     affine_sample_mm_batch, make_affine)


@pytest.fixture(scope="module")
def smooth_img():
    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.rand(12, 12, 3).astype(np.float32))
    return jax.image.resize(base, (192, 192, 3), "cubic")


def _mat(angle_deg, scale=1.2, center_src=(95.5, 95.5),
         center_out=(63.5, 63.5)):
    return make_affine(jnp.asarray(center_src), jnp.asarray(center_out),
                       scale, jnp.deg2rad(angle_deg))


@pytest.mark.parametrize("angle", [0.0, 90.0, 180.0, -90.0])
def test_axis_aligned_matches_gather_exactly(smooth_img, angle):
    m = _mat(angle)
    g = affine_sample(smooth_img, m, 128, 128, 0.0)
    mm = affine_sample_mm(smooth_img, m, 128, 128, 0.0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(mm), atol=5e-6)


@pytest.mark.parametrize("angle", [17.0, 45.0, 133.0, -61.0, 89.0, 179.5])
@pytest.mark.parametrize("scale", [0.7, 1.0, 1.5])
def test_rotated_close_to_gather(smooth_img, angle, scale):
    m = _mat(angle, scale)
    g = np.asarray(affine_sample(smooth_img, m, 128, 128, 0.0))
    mm = np.asarray(affine_sample_mm(smooth_img, m, 128, 128, 0.0))
    # two-pass bilinear has a sheared footprint: tiny mean deviation,
    # bounded max on smooth content
    assert np.mean(np.abs(g - mm)) < 2e-3
    assert np.max(np.abs(g - mm)) < 0.3


@pytest.mark.parametrize("angle", [33.0, -75.0, 120.0])
def test_mask_binarization_iou(angle):
    mask = np.zeros((192, 192, 1), np.float32)
    mask[40:150, 60:170] = 1.0
    m = _mat(angle)
    g = np.asarray(affine_sample(jnp.asarray(mask), m, 128, 128,
                                 0.0))[..., 0] > 0.5
    mm = np.asarray(affine_sample_mm(jnp.asarray(mask), m, 128, 128,
                                     0.0))[..., 0] > 0.5
    inter, union = np.sum(g & mm), max(np.sum(g | mm), 1)
    assert inter / union > 0.99


def test_fill_semantics_outside_source(smooth_img):
    # window mostly outside the source: fill value must appear exactly
    m = make_affine(jnp.asarray([5.0, 5.0]), jnp.asarray([63.5, 63.5]),
                    1.0, jnp.deg2rad(0.0))
    g = affine_sample(smooth_img, m, 128, 128, 0.25)
    mm = affine_sample_mm(smooth_img, m, 128, 128, 0.25)
    np.testing.assert_allclose(np.asarray(g), np.asarray(mm), atol=5e-6)
    # fully outside -> constant fill
    m2 = make_affine(jnp.asarray([-500.0, -500.0]),
                     jnp.asarray([63.5, 63.5]), 1.0, jnp.deg2rad(31.0))
    mm2 = np.asarray(affine_sample_mm(smooth_img, m2, 128, 128, 0.75))
    np.testing.assert_allclose(mm2, 0.75, atol=1e-5)


def test_integer_translation_is_exact(smooth_img):
    m = make_affine(jnp.asarray([17.0, 30.0]), jnp.asarray([0.0, 0.0]),
                    1.0, 0.0)
    mm = np.asarray(affine_sample_mm(smooth_img, m, 128, 128, 0.0))
    np.testing.assert_allclose(
        mm, np.asarray(smooth_img)[17:17 + 128, 30:30 + 128], atol=5e-6)


def test_vmap_batch_matches_single(smooth_img):
    mats = jnp.stack([_mat(10.0), _mat(-120.0, 0.8)])
    imgs = jnp.stack([smooth_img, smooth_img[::-1]])
    batched = affine_sample_mm_batch(imgs, mats, 128, 128, 0.0)
    for b in range(2):
        single = affine_sample_mm(imgs[b], mats[b], 128, 128, 0.0)
        np.testing.assert_allclose(np.asarray(batched[b]),
                                   np.asarray(single), atol=1e-5)


def test_rectangular_output_rejected(smooth_img):
    with pytest.raises(ValueError):
        affine_sample_mm(smooth_img, _mat(0.0), 128, 64, 0.0)
