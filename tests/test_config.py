"""Config loading against the actual reference cfg files."""

import glob

import pytest

from pix2pose_tpu.config import EstimatorConfig, EvalConfig, TrainConfig, \
    load_eval_config

REF_CFGS = sorted(glob.glob("/root/reference/cfg/*.json"))


@pytest.mark.skipif(not REF_CFGS, reason="reference cfgs not mounted")
@pytest.mark.parametrize("path", REF_CFGS)
def test_all_reference_configs_load(path):
    cfg = load_eval_config(path)
    assert isinstance(cfg, EvalConfig)
    assert cfg.dataset_dir
    assert cfg.score_type in (1, 2)
    assert cfg.task_type in (1, 2)
    est = cfg.estimator(0)
    assert isinstance(est, EstimatorConfig)
    assert all(0 < t < 1 for t in est.outlier_th)
    assert 0 < est.inlier_th < 1


def test_unknown_keys_ignored():
    cfg = load_eval_config({"dataset_dir": "/d", "bogus_key": 42,
                            "outlier_th": [0.2], "task_type": "2"})
    assert cfg.dataset_dir == "/d"
    assert cfg.task_type == 2


def test_train_config_epoch_budget():
    t = TrainConfig()
    # reference: min(n/50*10, 3000) batches (3_train:191)
    assert t.batches_per_epoch(500) == 100
    assert t.batches_per_epoch(10_000_000) == 3000
    assert len(t.lr_schedule) == 20
    assert t.lr_schedule[0] == 1e-3 and t.lr_schedule[7] == 1e-4
