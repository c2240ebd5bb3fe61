"""PLY round-trip, BOP layout parsing, target lists, results CSV."""

import numpy as np
import pytest

from pix2pose_tpu.data import (BopDataset, get_target_list, load_bop_results,
                               load_ply, save_ply, save_bop_results)
from bop_fixture import build_cube_dataset


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    faces = rng.randint(0, 100, (50, 3)).astype(np.int32)
    colors = rng.randint(0, 255, (100, 3)).astype(np.uint8)
    p = tmp_path / "m.ply"
    save_ply(p, pts, faces, colors)
    m = load_ply(p)
    np.testing.assert_allclose(m["pts"], pts, atol=1e-6)
    np.testing.assert_array_equal(m["faces"], faces)
    np.testing.assert_array_equal(m["colors"], colors)


def test_ply_ascii(tmp_path):
    p = tmp_path / "a.ply"
    p.write_text("\n".join([
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
        "0 0 0", "1 0 0", "1 1 0", "0 1 0",
        "3 0 1 2", "3 0 2 3",
    ]) + "\n")
    m = load_ply(p)
    assert m["pts"].shape == (4, 3)
    np.testing.assert_array_equal(m["faces"], [[0, 1, 2], [0, 2, 3]])


@pytest.fixture(scope="module")
def cube_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=2)
    return str(root), entries


def test_bop_dataset_layout(cube_ds):
    root, entries = cube_ds
    ds = BopDataset(root, "cubes", train=False)
    assert ds.model_ids == [1]
    assert ds.im_size == (640, 480)
    assert ds.cam_k[0, 0] == pytest.approx(572.4)
    scenes = ds.scene_ids()
    assert scenes == [0]
    cam = ds.scene_camera(0)
    assert 0 in cam and 1 in cam
    gt = ds.scene_gt(0)
    np.testing.assert_allclose(gt[0][0]["R"], entries[0][2], atol=1e-6)
    rgb = ds.load_rgb(0, 0)
    assert rgb.shape == (480, 640, 3) and rgb.dtype == np.uint8
    depth = ds.load_depth(0, 0, cam[0]["depth_scale"])
    assert depth.shape == (480, 640)
    assert 0.3 < depth[depth > 0].mean() < 1.0  # meters
    sym = ds.symmetry_pool(1)
    assert sym.shape == (1, 3, 3)


def test_target_list(cube_ds):
    root, entries = cube_ds
    import os
    tl = get_target_list(os.path.join(root, "cubes",
                                      "test_targets_bop19.json"))
    assert len(tl) == 2
    s, i, objs, counts = tl[0]
    assert (s, i, objs, counts) == (0, 0, [1], [1])


def test_results_csv_roundtrip(tmp_path):
    res = [{"scene_id": 1, "im_id": 2, "obj_id": 3, "score": 0.5,
            "R": np.eye(3, dtype=np.float32),
            "t": np.array([1.0, 2.0, 3.0], np.float32), "time": 0.1}]
    p = tmp_path / "out.csv"
    save_bop_results(str(p), res)
    back = load_bop_results(str(p))
    assert back[0]["scene_id"] == 1 and back[0]["obj_id"] == 3
    np.testing.assert_allclose(back[0]["R"], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(back[0]["t"], [1, 2, 3], atol=1e-6)


def test_linemod_split_targets(tmp_path):
    from pix2pose_tpu.data.bop import target_list_from_linemod_split
    p = tmp_path / "ape.txt"
    p.write_text("3\n17\n256\n")
    tl = target_list_from_linemod_split(str(p), obj_id=1)
    assert tl == [(1, 3, [1], [1]), (1, 17, [1], [1]), (1, 256, [1], [1])]
