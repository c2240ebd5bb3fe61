"""Parity runner (tools/parity_lmo): data gating, weight-layout
resolution, and the full Keras-import -> RGB-eval -> AR pipeline on the
in-repo fixture dataset (the exact code path a real LM-O mount would
take; reference anchor ``5_evaluation_bop_basic.py`` + ``README.md:34``)."""

import os

import numpy as np
import pytest

from pix2pose_tpu.tools import parity_lmo

from bop_fixture import build_cube_dataset
from test_hdf5_import import _write_fake_keras_generator


def test_find_bop_dataset_gates_on_missing(tmp_path):
    root, missing = parity_lmo.find_bop_dataset(str(tmp_path), "lmo")
    assert missing  # nothing mounted -> gated off with a reason
    # present-but-incomplete: dir exists, files missing
    os.makedirs(tmp_path / "lmo")
    root, missing = parity_lmo.find_bop_dataset(str(tmp_path), "lmo")
    assert root == str(tmp_path) and missing


def test_find_bop_dataset_accepts_complete(tmp_path):
    build_cube_dataset(str(tmp_path))
    root, missing = parity_lmo.find_bop_dataset(str(tmp_path), "cubes")
    assert root == str(tmp_path) and missing == []


def test_resolve_weight_dir_layouts(tmp_path):
    ds_dir = tmp_path / "ds"
    w_in_ds = ds_dir / "pix2pose_weights" / "01"
    os.makedirs(w_in_ds)
    (w_in_ds / "inference.hdf5").write_bytes(b"x")
    assert parity_lmo.resolve_weight_dir(
        str(ds_dir), None, "lmo", 1) == str(w_in_ds)
    # external layout <weights>/<dataset>/<obj>/
    ext = tmp_path / "w" / "lmo" / "02"
    os.makedirs(ext)
    (ext / "inference_resnet_model.hdf5").write_bytes(b"x")
    assert parity_lmo.resolve_weight_dir(
        str(tmp_path / "nope"), str(tmp_path / "w"), "lmo", 2) == str(ext)
    assert parity_lmo.resolve_weight_dir(
        str(ds_dir), None, "lmo", 3) is None


def test_run_parity_end_to_end_on_fixture(tmp_path):
    """Import a (random-weight) Keras generator and drive the whole parity
    pipeline; asserts the report structure, not AR quality."""
    build_cube_dataset(str(tmp_path), n_scenes=1, ims_per_scene=2)
    wdir = tmp_path / "cubes" / "pix2pose_weights" / "01"
    os.makedirs(wdir)
    _write_fake_keras_generator(wdir / "inference.hdf5")

    report = parity_lmo.run_parity(
        str(tmp_path), "cubes",
        cfg_path={"backbone": "paper", "score_type": 1, "task_type": 1},
        out_dir=str(tmp_path / "out"))
    assert report["n_results"] >= 0
    assert np.isfinite(report["AR"])
    assert report["baseline_rgb"] is None and report["diff"] is None
    assert report["gt_detector"] is True


def test_main_exits_2_when_gated(tmp_path):
    with pytest.raises(SystemExit) as e:
        parity_lmo.main(["--bop-root", str(tmp_path / "none")])
    assert e.value.code == 2


def test_run_parity_with_icp_on_fixture(tmp_path):
    """--icp path: the same run also drives the RGB-D/ICP evaluator and
    reports the w/-ICP table diff fields (reference README.md:33)."""
    build_cube_dataset(str(tmp_path), n_scenes=1, ims_per_scene=2)
    wdir = tmp_path / "cubes" / "pix2pose_weights" / "01"
    os.makedirs(wdir)
    _write_fake_keras_generator(wdir / "inference.hdf5")

    report = parity_lmo.run_parity(
        str(tmp_path), "cubes",
        cfg_path={"backbone": "paper", "score_type": 1, "task_type": 1},
        out_dir=str(tmp_path / "out"), with_icp=True)
    assert np.isfinite(report["AR"])
    assert "AR_icp" in report and np.isfinite(report["AR_icp"])
    assert report["baseline_icp"] is None and report["diff_icp"] is None
    assert report["icp_render_overflow"] == 0
