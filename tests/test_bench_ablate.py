"""tools/bench_ablate.py mode plumbing: every mode's monkeypatch must
stay call-compatible with the engine's pnp invocation (which passes
``quality`` positionally since the PROSAC flip) — signature drift here
broke the attribution sweep once."""

import importlib
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from pix2pose_tpu.ops import pnp as pnp_ops
from pix2pose_tpu.ops import smallmat


@pytest.fixture
def restore_patched():
    saved = (pnp_ops.pnp_ransac_batch, pnp_ops._sample_minimal_sets,
             smallmat.nearest_rotation_scale)
    yield
    (pnp_ops.pnp_ransac_batch, pnp_ops._sample_minimal_sets,
     smallmat.nearest_rotation_scale) = saved


def _tiny_inputs(n_cand=2, n_pts=64):
    rng = np.random.RandomState(0)
    K = jnp.asarray([[500.0, 0, 64], [0, 500.0, 64], [0, 0, 1]])
    obj = jnp.asarray(rng.uniform(-30, 30, (n_cand, n_pts, 3)),
                      jnp.float32)
    R = jnp.eye(3)
    t = jnp.asarray([0.0, 0.0, 500.0])
    proj = jax.vmap(lambda o: pnp_ops.project(o, R, t, K))(obj)
    valid = jnp.ones((n_cand, n_pts), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), n_cand)
    quality = jnp.asarray(rng.uniform(0, 1, (n_cand, n_pts)), jnp.float32)
    return obj, proj, valid, K, keys, quality


@pytest.mark.parametrize("mode", ["pnp-stub", "gn-half", "hyp-half",
                                  "polish-off", "ss4", "sample-stub",
                                  "nrs-8"])
def test_mode_patch_is_engine_call_compatible(mode, restore_patched):
    bench_ablate = importlib.import_module("bench_ablate")
    bench_ablate.apply_mode(mode)
    obj, img, valid, K, keys, quality = _tiny_inputs()
    # the engine's exact calling convention (inference/engine.py:402):
    # quality POSITIONAL, solver knobs as kwargs
    res = pnp_ops.pnp_ransac_batch(obj, img, valid, K, keys, quality,
                                   iters=8, reproj_px=5.0, min_pts=6,
                                   refine_iters=4, select_stride=4,
                                   hyp_polish_iters=3)
    assert res.R.shape == (2, 3, 3)
    assert bool(jnp.all(jnp.isfinite(res.R)))
    # and the engine's no-prosac path (quality=None)
    res2 = pnp_ops.pnp_ransac_batch(obj, img, valid, K, keys, None,
                                    iters=8, reproj_px=5.0, min_pts=6)
    assert res2.t.shape == (2, 3)
