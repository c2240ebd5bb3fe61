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


TLESS_CFG = "/root/reference/cfg/cfg_tless_paper.json"


@pytest.mark.skipif(not REF_CFGS, reason="reference cfgs not mounted")
def test_per_object_outlier_th_reaches_each_objects_engine():
    """Object k's engine must receive ``outlier_th[k]`` — the reference
    builds one estimator per object (``5_evaluation_bop_basic.py:164-170,
    206-225``) so the list-of-lists config (``cfg_tless_paper.json:12``)
    resolves per object."""
    import json

    from pix2pose_tpu.inference.engine import estimators_for_objects
    from pix2pose_tpu.models import build_generator

    cfg = load_eval_config(TLESS_CFG)
    raw = json.load(open(TLESS_CFG))["outlier_th"]
    assert isinstance(raw[0], list) and len(raw) == 30
    model = build_generator(cfg.backbone)
    model_ids = list(range(1, 31))
    ests = estimators_for_objects(model, cfg, model_ids)
    for k, obj_id in enumerate(model_ids):
        assert ests[obj_id].cfg.outlier_th == tuple(raw[k]), (k, obj_id)
    # identical resolved configs share one estimator (one compiled program)
    distinct = {id(e) for e in ests.values()}
    assert len(distinct) == len({tuple(t) for t in raw})


def test_train_config_epoch_budget():
    t = TrainConfig()
    # reference: min(n/50*10, 3000) batches (3_train:191)
    assert t.batches_per_epoch(500) == 100
    assert t.batches_per_epoch(10_000_000) == 3000
    assert len(t.lr_schedule) == 20
    assert t.lr_schedule[0] == 1e-3 and t.lr_schedule[7] == 1e-4
