"""``python -m pix2pose_tpu.serving`` CLI: weight discovery + server
bring-up on a synthetic dataset (no request round-trip — that path is
covered by tests/test_serving_server.py; here we test the loading
conventions match the evaluator's)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bop_fixture import build_cube_dataset


@pytest.fixture(scope="module")
def cli_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_cli"))
    build_cube_dataset(root, n_scenes=1, ims_per_scene=1, split="test")
    ds_dir = os.path.join(root, "cubes")

    from pix2pose_tpu.models import build_generator
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.utils import checkpoint as ckpt_util

    gen = build_generator("paper")
    gv = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    ckpt_util.export_inference(
        os.path.join(ds_dir, "pix2pose_weights", "01"),
        gv["params"], gv.get("batch_stats", {}))

    det = CenterNetDetector(num_classes=1, trunk="tiny")
    dv = det.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))
    ckpt_util.export_inference(
        os.path.join(ds_dir, "weight_detection", "centernet"),
        dv["params"], dv.get("batch_stats", {}))

    ros_cfg = os.path.join(root, "ros_config.json")
    with open(ros_cfg, "w") as f:
        json.dump({"backbone": "paper", "obj_labels": [1],
                   "cam_K": np.eye(3).ravel().tolist(),
                   "icp": False}, f)
    return root, ros_cfg


def test_create_server_loads_and_binds(cli_dataset, monkeypatch):
    root, ros_cfg = cli_dataset
    # the CLI builds CenterNetDetector(num_classes=...) with the default
    # resnet50 trunk; the fixture's checkpoint is a tiny trunk, which only
    # matters at apply time (never reached here), but keep init cheap:
    from pix2pose_tpu.serving import __main__ as serve_cli

    server = serve_cli.create_server(
        [ros_cfg, root, "cubes", "--port", "0"])
    try:
        host, port = server.address
        assert port > 0
        svc = server.frontend.service
        assert list(svc.params_by_obj) == [1]
        assert 1 in svc.box_corners
        assert svc.box_corners[1].shape == (8, 3)
        assert np.all(np.isfinite(svc.obj_params[1]))
    finally:
        server.close()


def test_create_server_requires_weights(cli_dataset, tmp_path):
    root, ros_cfg = cli_dataset
    bare = str(tmp_path / "bare")
    build_cube_dataset(bare, n_scenes=1, ims_per_scene=1, split="test")
    from pix2pose_tpu.serving import __main__ as serve_cli

    with pytest.raises(SystemExit, match="no trained objects"):
        serve_cli.create_server([ros_cfg, bare, "cubes", "--port", "0"])
