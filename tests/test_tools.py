"""Data-prep tools: model colorizer and training-pair renderer end-to-end
on the synthetic cube dataset, feeding the on-device training pipeline."""

import json
import os

import numpy as np
import pytest

from pix2pose_tpu.data import BopDataset, load_ply
from pix2pose_tpu.tools.colorize_models import colorize_dataset
from pix2pose_tpu.tools.render_training_pairs import render_object_pairs
from bop_fixture import build_cube_dataset


@pytest.fixture(scope="module")
def train_ds(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bop_train"))
    entries = build_cube_dataset(root, n_scenes=1, ims_per_scene=4,
                                 split="train")
    return root, entries


def test_colorize_models(train_ds):
    root, _ = train_ds
    ds = BopDataset(root, "cubes", train=True)
    params = colorize_dataset(ds)
    assert 1 in params
    assert params[1]["x_scale"] == pytest.approx(40.0, rel=1e-5)
    assert params[1]["x_ct"] == pytest.approx(0.0, abs=1e-4)
    m = load_ply(os.path.join(ds.dir, "models_xyz", "obj_000001.ply"))
    assert "colors" in m
    # corner (-h,-h,-h) -> color 0, corner (h,h,h) -> color 255
    i_min = np.argmin(m["pts"].sum(axis=1))
    i_max = np.argmax(m["pts"].sum(axis=1))
    assert (m["colors"][i_min] <= 1).all()
    assert (m["colors"][i_max] >= 254).all()


def test_render_training_pairs_and_pipeline(train_ds, tmp_path):
    root, entries = train_ds
    ds = BopDataset(root, "cubes", train=True)
    n = render_object_pairs(ds, 1)
    assert n == 4
    out_dir = os.path.join(ds.dir, "train_xyz", "01")
    files = [f for f in os.listdir(out_dir) if f.endswith(".npy")]
    assert len(files) == 4
    arr = np.load(os.path.join(out_dir, files[0]))
    assert arr.shape[2] == 6
    assert max(arr.shape[:2]) <= 128
    # since the scene rgb IS the xyz render, the two halves must agree on
    # the object (gray background outside)
    obj = arr[..., 3:6].sum(axis=2) > 0
    diff = np.abs(arr[..., :3].astype(int) - arr[..., 3:6].astype(int))
    assert np.median(diff[obj]) <= 2
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["rotation_lock"] is False

    # feed the on-device pipeline
    from PIL import Image
    back_dir = tmp_path / "backs"
    os.makedirs(back_dir)
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (80, 80, 3)).astype(
        np.uint8)).save(back_dir / "b.png")
    import jax
    from pix2pose_tpu.training.data import PatchStore, make_batch
    store = PatchStore.load(out_dir, str(back_dir))
    assert store.n_data == 4
    b = make_batch(store, jax.random.PRNGKey(0), 0, batch_size=4)
    assert b["src"].shape == (4, 128, 128, 3)
    assert float(np.asarray(b["prob_gt"]).mean()) > 0.02


def test_ab_e2e_overrides_and_mini_run(tmp_path):
    """Override parsing + a 1-seed micro A/B: identical configs must
    report ~zero delta and pass; the JSON result carries per-seed rows."""
    from pix2pose_tpu.tools.ab_e2e import parse_overrides, run_ab

    train_o, est_o = parse_overrides(
        ["select_stride=4", "prosac=false", "train.compute_dtype=bfloat16",
         "train.batch_size=16", "outlier_th=0.1,0.2"])
    assert est_o == {"select_stride": 4, "prosac": False,
                     "outlier_th": (0.1, 0.2)}
    assert train_o == {"compute_dtype": "bfloat16", "batch_size": 16}
    import pytest

    with pytest.raises(SystemExit):
        parse_overrides(["not_a_field=1"])

    out = run_ab(seeds=1, steps=2, a_pairs=[], b_pairs=["select_stride=4"],
                 margin=1.0, root=str(tmp_path / "ab"))
    assert out["rows"][0]["seed"] == 0
    assert out["pass"] is True          # margin=1 always passes
    assert out["retrained"] is False    # estimator-only knob: one train
    assert -1.0 <= out["mean_delta"] <= 1.0


def test_visual_sym_probe_filters_training_pool(tmp_path, monkeypatch):
    """Banded (appearance-asymmetric) z180 prism -> identity-only
    training pool; uniform-color prism -> full geometric pool kept."""
    import bop_fixture
    from bop_fixture import build_multishape_dataset
    from pix2pose_tpu.utils.symmetry import training_sym_pool

    root_a = str(tmp_path / "banded")
    build_multishape_dataset(root_a, n_scenes=1, ims_per_scene=6,
                             split="train")
    ds_a = BopDataset(root_a, "shapes", train=True)
    render_object_pairs(ds_a, 2)
    with open(os.path.join(ds_a.dir, "train_xyz", "02",
                           "meta.json")) as f:
        meta = json.load(f)
    assert meta["visual_sym_idx"] == [0], meta
    assert training_sym_pool(ds_a, 2).shape[0] == 1
    assert ds_a.symmetry_pool(2).shape[0] == 2  # eval keeps full pool

    # zero-width band = uniform color = appearance IS z180-symmetric
    monkeypatch.setitem(bop_fixture.SHAPE_BANDS, 2, (0.35, 0.35))
    root_b = str(tmp_path / "uniform")
    build_multishape_dataset(root_b, n_scenes=1, ims_per_scene=6,
                             split="train")
    ds_b = BopDataset(root_b, "shapes", train=True)
    render_object_pairs(ds_b, 2)
    with open(os.path.join(ds_b.dir, "train_xyz", "02",
                           "meta.json")) as f:
        meta_b = json.load(f)
    assert meta_b["visual_sym_idx"] == [0, 1], meta_b
    assert training_sym_pool(ds_b, 2).shape[0] == 2
