"""On-device training-batch synthesis: loading, augmentation invariants,
stage alternation, determinism."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.training.data import PatchStore, make_batch


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_xyz")
    data_dir = root / "01"
    back_dir = root / "backs"
    os.makedirs(data_dir)
    os.makedirs(back_dir)
    rng = np.random.RandomState(0)
    # synthetic patches: blob with xyz colors (reference npy format)
    for i in range(6):
        h, w = rng.randint(60, 128), rng.randint(60, 128)
        arr = np.zeros((h, w, 6), np.uint8)
        yy, xx = np.mgrid[0:h, 0:w]
        blob = ((yy - h / 2) ** 2 / (h / 2.5) ** 2
                + (xx - w / 2) ** 2 / (w / 2.5) ** 2) < 1
        arr[..., 0][blob] = rng.randint(50, 255)
        arr[..., 1][blob] = 128
        arr[..., 2][blob] = 200
        arr[..., 3][blob] = (xx[blob] * 255 // w).astype(np.uint8) | 1
        arr[..., 4][blob] = (yy[blob] * 255 // h).astype(np.uint8) | 1
        arr[..., 5][blob] = 128
        np.save(data_dir / f"{i:04d}.npy", arr)
    from PIL import Image
    for i in range(3):
        img = rng.randint(0, 255, (100, 140, 3)).astype(np.uint8)
        Image.fromarray(img).save(back_dir / f"b{i}.jpg")
    return PatchStore.load(str(data_dir), str(back_dir))


def test_store_shapes(store):
    assert store.n_data == 6
    assert store.rgb.shape == (6, 128, 128, 3)
    assert store.backs.shape[1:] == (256, 256, 3)
    assert bool((store.extent >= 60).all())


def test_batch_shapes_and_ranges(store):
    b = make_batch(store, jax.random.PRNGKey(0), 1, batch_size=8)
    assert b["src"].shape == (8, 128, 128, 3)
    assert b["tgt"].shape == (8, 128, 128, 3)
    assert b["prob_gt"].shape == (8, 128, 128, 1)
    assert float(jnp.abs(b["src"]).max()) <= 1.0 + 1e-5
    assert float(jnp.abs(b["tgt"]).max()) <= 1.0 + 1e-5
    assert set(np.unique(np.asarray(b["prob_gt"]))) <= {0.0, 1.0}
    # object must cover a reasonable fraction of the crop
    cover = np.asarray(b["prob_gt"]).mean(axis=(1, 2, 3))
    assert (cover > 0.05).all() and (cover < 0.9).all()


def test_target_matches_prob_mask(store):
    b = make_batch(store, jax.random.PRNGKey(1), 1, batch_size=4)
    tgt = np.asarray(b["tgt"])
    prob = np.asarray(b["prob_gt"])[..., 0] > 0.5
    # outside the mask (minus a bilinear boundary band) the target must be
    # gray (0 in [-1,1] space)
    from scipy import ndimage
    outside = ~ndimage.binary_dilation(prob, iterations=2,
                                       structure=np.ones((1, 3, 3), bool))
    assert np.abs(tgt[outside]).max() < 0.35
    # inside, a decent fraction of pixels are non-gray
    inside_norm = np.linalg.norm(tgt, axis=-1)[prob]
    assert (inside_norm > 0.3).mean() > 0.5


def test_stage2_even_steps_have_gray_background(store):
    b2 = make_batch(store, jax.random.PRNGKey(2), 0, batch_size=4)  # stage2
    b1 = make_batch(store, jax.random.PRNGKey(2), 1, batch_size=4)  # plain
    # stage-2 inputs: background pixels (prob_gt==0) are mostly gray (=0)
    for b, gray_expected in ((b2, True), (b1, False)):
        bg = np.asarray(b["prob_gt"])[..., 0] < 0.5
        src_bg = np.asarray(b["src"])[bg]
        frac_gray = (np.abs(src_bg).max(axis=-1) < 0.05).mean()
        if gray_expected:
            assert frac_gray > 0.5, frac_gray
        else:
            assert frac_gray < 0.4, frac_gray


def test_determinism(store):
    a = make_batch(store, jax.random.PRNGKey(3), 5, batch_size=4)
    b = make_batch(store, jax.random.PRNGKey(3), 5, batch_size=4)
    np.testing.assert_allclose(np.asarray(a["src"]), np.asarray(b["src"]))
    c = make_batch(store, jax.random.PRNGKey(4), 5, batch_size=4)
    assert np.abs(np.asarray(a["src"]) - np.asarray(c["src"])).max() > 0.1
