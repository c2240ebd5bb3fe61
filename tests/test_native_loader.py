"""Native bopio loader vs PIL/numpy ground truth (8-bit RGB, 16-bit depth
PNGs, NPY patches) + parallel batch decode."""

import numpy as np
import pytest

from pix2pose_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.native_available(),
                                reason="native toolchain unavailable")


def _write_pngs(tmp_path, n=6):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths, arrays = [], []
    for i in range(n):
        if i % 2 == 0:
            arr = rng.randint(0, 255, (37 + i, 53, 3)).astype(np.uint8)
            img = Image.fromarray(arr)
        else:
            arr = rng.randint(0, 60000, (41, 29 + i)).astype(np.uint16)
            img = Image.fromarray(arr)
        p = str(tmp_path / f"im{i}.png")
        img.save(p)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_decode_single_rgb_and_depth(tmp_path):
    paths, arrays = _write_pngs(tmp_path, 2)
    got0 = nl.load_png(paths[0])
    np.testing.assert_array_equal(got0, arrays[0])
    got1 = nl.load_png(paths[1])
    assert got1.dtype == np.uint16
    np.testing.assert_array_equal(got1, arrays[1])


def test_batch_decode_parallel(tmp_path):
    paths, arrays = _write_pngs(tmp_path, 6)
    outs = nl.load_png_batch(paths)
    for got, ref in zip(outs, arrays):
        np.testing.assert_array_equal(got, ref)


def test_png_info(tmp_path):
    paths, arrays = _write_pngs(tmp_path, 1)
    h, w, c, bd = nl.png_info(paths[0])
    assert (h, w, c, bd) == (arrays[0].shape[0], arrays[0].shape[1], 3, 8)


def test_npy_loader(tmp_path):
    rng = np.random.RandomState(1)
    for arr in (rng.randint(0, 255, (40, 50, 6)).astype(np.uint8),
                rng.normal(size=(7, 3)).astype(np.float32),
                np.arange(11, dtype=np.float64)):
        p = str(tmp_path / "a.npy")
        np.save(p, arr)
        got = nl.load_npy(p)
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)


def test_batch_speed_sanity(tmp_path):
    """Native batch decode should not be slower than sequential PIL by a
    large factor (usually much faster)."""
    import time
    from PIL import Image

    rng = np.random.RandomState(2)
    paths = []
    for i in range(12):
        arr = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        p = str(tmp_path / f"big{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    t0 = time.perf_counter()
    nl.load_png_batch(paths)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in paths:
        np.asarray(Image.open(p))
    t_pil = time.perf_counter() - t0
    assert t_native < t_pil * 2.0, (t_native, t_pil)
