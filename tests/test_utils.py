"""Profiling utils + checkpoint round trip + weight converter."""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.utils.profiling import StageTimer
from pix2pose_tpu.utils import checkpoint as ckpt


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] >= 0.02
    assert "a" in t.report() and "b" in t.report()


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(3)}
    d = str(tmp_path / "ck")
    ckpt.save_train_state(d, state, epoch=2)
    assert ckpt.latest_epoch(d) == 2
    restored, e = ckpt.restore_train_state(d, state)
    assert e == 2
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(state["w"]))
    # inference export + load
    ckpt.export_inference(d, {"k": jnp.ones(3)}, {"m": jnp.zeros(2)})
    v = ckpt.load_inference_params(d)
    np.testing.assert_allclose(np.asarray(v["params"]["k"]), 1.0)
    np.testing.assert_allclose(np.asarray(v["batch_stats"]["m"]), 0.0)


def test_convert_weights_from_orbax(tmp_path):
    from pix2pose_tpu.config import TrainConfig
    from pix2pose_tpu.models import AutoEncoder, Discriminator
    from pix2pose_tpu.training.gan import create_train_state
    from pix2pose_tpu.tools.convert_weights import convert

    gen, disc = AutoEncoder(backbone="paper"), Discriminator()
    state = create_train_state(jax.random.PRNGKey(0), gen, disc,
                               TrainConfig())
    d = str(tmp_path / "w")
    ckpt.save_train_state(d, state, epoch=1)
    path = convert(d, "paper")
    assert os.path.isdir(path)
    v = ckpt.load_inference_params(d)
    xyz, prob = gen.apply(v, jnp.zeros((1, 128, 128, 3)))
    assert xyz.shape == (1, 128, 128, 3)
