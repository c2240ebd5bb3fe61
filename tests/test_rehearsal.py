"""Rehearsal harness: synthetic-BOP generator structure + a micro-budget
run of the full one-command pipeline (CI profile of
``python -m pix2pose_tpu rehearsal``)."""

import json
import os

import numpy as np
import pytest

from pix2pose_tpu.data import BopDataset
from pix2pose_tpu.data.synthetic_bop import (build_rehearsal_dataset,
                                             rehearsal_objects)


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("rehearsal"))
    entries = build_rehearsal_dataset(root, n_train=3, n_test=2, seed=0)
    return root, entries


def test_dataset_covers_hard_axes(tiny_root):
    root, entries = tiny_root
    ds = BopDataset(root, "rehearsal", train=False)
    assert ds.model_ids == [1, 2, 3, 4]
    # symmetry annotations: discrete prism, continuous cylinder
    assert "symmetries_discrete" in ds.model_info(2)
    assert ds.model_info(3)["symmetries_continuous"][0]["axis"] == [0, 0, 1]
    # duplicate instances of object 1 in every test target list
    with open(os.path.join(ds.dir, "test_targets_bop19.json")) as f:
        targets = json.load(f)
    c1 = [t for t in targets if t["obj_id"] == 1]
    assert c1 and all(t["inst_count"] == 2 for t in c1)
    # the duplicate pair really occludes: per-instance visib masks exist
    # and at least one image has instance-0/1 areas differing >10%
    # (the far cube is partially hidden)
    s, i, insts = entries["test"][0]
    assert [o for o, _, _ in insts].count(1) == 2
    rgb = ds.load_rgb(s, i)
    assert rgb.shape == (480, 640, 3)
    # textured object: its visible pixels are NOT in the band palette
    # (bands are scalar-ish gradients; the atlas has saturated hues)
    depth = ds.load_depth(s, i)
    assert depth.max() > 0.3  # meters


def test_textured_object_renders_with_atlas(tiny_root):
    root, entries = tiny_root
    ds = BopDataset(root, "rehearsal", train=True)
    s, i, insts = entries["train"][0]
    # find the textured instance's visib mask (slot order = placement)
    slot = [k for k, (o, _, _) in enumerate(insts) if o == 4][0]
    from PIL import Image

    m = np.asarray(Image.open(os.path.join(
        ds.dir, "train", f"{s:06d}", "mask_visib",
        f"{i:06d}_{slot:06d}.png"))) > 127
    assert m.sum() > 200
    rgb = ds.load_rgb(s, i)
    px = rgb[m].astype(np.float32)
    # atlas hues are saturated: strong channel spread, unlike the
    # gray-ish band gradients
    spread = px.max(1) - px.min(1)
    assert np.median(spread) > 40, np.median(spread)


def test_rehearsal_micro_run(tmp_path):
    """CI profile: the ENTIRE one-command pipeline (dataset -> colorize ->
    pairs -> fused GAN -> detector -> mask mAP -> both evaluators x both
    detector transports -> CSVs + summary) at micro budgets. Asserts
    structure and plumbing, not accuracy."""
    from pix2pose_tpu.tools.rehearsal import run_rehearsal

    root = str(tmp_path / "r")
    summary = run_rehearsal(out_root=root, gan_steps=2, det_steps=2,
                            n_train=3, n_test=2, det_im=256, det_k_obj=5,
                            map_images=4, icp=True)
    for k in ("det_box_mAP50", "det_mask_mAP50", "AR_rgb_centernet",
              "AR_rgb_precomputed", "AR_rgbd_centernet",
              "AR_rgbd_precomputed"):
        assert k in summary, k
    out = os.path.join(root, "out")
    assert os.path.exists(os.path.join(out, "rehearsal_summary.json"))
    assert os.path.exists(os.path.join(out, "detections.json"))
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(csvs) == 4, csvs  # {rgb, rgbd} x {centernet, precomputed}


def test_rle_roundtrip():
    from pix2pose_tpu.inference.detector import PrecomputedDetector
    from pix2pose_tpu.tools.rehearsal import _rle_encode

    rng = np.random.RandomState(0)
    for _ in range(5):
        m = rng.rand(13, 17) < 0.4
        dec = PrecomputedDetector._decode_rle(_rle_encode(m))
        np.testing.assert_array_equal(dec, m)
    # all-True and all-False edges
    for m in (np.ones((4, 4), bool), np.zeros((4, 4), bool)):
        np.testing.assert_array_equal(
            PrecomputedDetector._decode_rle(_rle_encode(m)), m)
