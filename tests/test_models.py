"""Model family: shapes, both backbones, discriminator, transformer loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.models import (AutoEncoder, Discriminator, bce_logits,
                                 transformer_loss)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_paper_generator_shapes(rng):
    model = AutoEncoder(backbone="paper")
    x = jnp.zeros((2, 128, 128, 3))
    variables = model.init(rng, x)
    xyz, prob = model.apply(variables, x)
    assert xyz.shape == (2, 128, 128, 3)
    assert prob.shape == (2, 128, 128, 1)
    assert float(jnp.abs(xyz).max()) <= 1.0
    assert 0.0 <= float(prob.min()) and float(prob.max()) <= 1.0
    # encoder stages produce the documented channel widths
    enc = variables["params"]["encoder"]
    assert enc["e1_1"]["conv"]["kernel"].shape == (5, 5, 3, 64)
    assert enc["e2_1"]["conv"]["kernel"].shape == (5, 5, 128, 128)
    assert enc["e4_2"]["conv"]["kernel"].shape == (5, 5, 256, 256)
    assert variables["params"]["fc_enc"]["kernel"].shape == (8 * 8 * 512, 256)


def test_resnet50_generator_shapes(rng):
    model = AutoEncoder(backbone="resnet50")
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(rng, x)
    xyz, prob = model.apply(variables, x)
    assert xyz.shape == (1, 128, 128, 3)
    assert prob.shape == (1, 128, 128, 1)


def test_generator_train_mode_updates_batch_stats(rng):
    model = AutoEncoder(backbone="paper")
    x = jax.random.normal(rng, (2, 128, 128, 3))
    variables = model.init(rng, x)
    (_, _), updates = model.apply(variables, x, train=True,
                                  mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_discriminator_shapes(rng):
    model = Discriminator()
    x = jnp.zeros((4, 128, 128, 3))
    variables = model.init(rng, x)
    logit = model.apply(variables, x)
    assert logit.shape == (4, 1)


def _ref_transformer_loss(pred, gt, prob, prob_gt, sym):
    """Literal numpy port of reference ae_model.py:31-65 for cross-check."""
    visible = (prob_gt[..., 0] > 0.5).astype(np.float32)
    if len(sym) > 1:
        sums, xyzs = [], []
        for mat in sym:
            gt_t = np.einsum("ij,bhwj->bhwi", mat, gt)
            l = np.abs(gt_t - pred).sum(axis=3) / 3
            xyzs.append(l)
            sums.append(l.sum(axis=(1, 2)))
        sums = np.stack(sums)  # (S,B)
        xyzs = np.stack(xyzs)  # (S,B,H,W)
        switch = (sums == sums.min(axis=0, keepdims=True)).astype(np.float32)
        loss_xyz = (switch[:, :, None, None] * xyzs).sum(axis=0)
    else:
        loss_xyz = np.abs(gt - pred).sum(axis=3) / 3
    prob_l = np.square(prob[..., 0] - np.minimum(loss_xyz, 1))
    loss = visible * loss_xyz * 3 + (1 - visible) * loss_xyz + 0.5 * prob_l
    return loss.mean(axis=(1, 2))


def test_transformer_loss_identity_pool():
    r = np.random.RandomState(0)
    pred = r.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    gt = r.uniform(-1, 1, (3, 16, 16, 3)).astype(np.float32)
    prob = r.uniform(0, 1, (3, 16, 16, 1)).astype(np.float32)
    pgt = (r.uniform(0, 1, (3, 16, 16, 1)) > 0.4).astype(np.float32)
    sym = np.eye(3)[None]
    got = np.asarray(transformer_loss(pred, gt, prob, pgt, sym))
    ref = _ref_transformer_loss(pred, gt, prob, pgt, [np.eye(3)])
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_transformer_loss_symmetry_pool_picks_min():
    r = np.random.RandomState(1)
    # 180-degree z-rotation symmetry
    rot = np.diag([-1.0, -1.0, 1.0])
    sym = np.stack([np.eye(3), rot]).astype(np.float32)
    gt = r.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    # predict the ROTATED gt -> loss under the rotated pose must be ~0
    pred = np.einsum("ij,bhwj->bhwi", rot, gt).astype(np.float32)
    prob = np.zeros((4, 8, 8, 1), np.float32)
    pgt = np.ones((4, 8, 8, 1), np.float32)
    got = np.asarray(transformer_loss(pred, gt, prob, pgt, sym))
    np.testing.assert_allclose(got, 0.0, atol=1e-5)
    ref = _ref_transformer_loss(pred, gt, prob, pgt, list(sym))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_transformer_loss_cross_check_random_pool():
    r = np.random.RandomState(2)
    theta = 2 * np.pi / 3
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    sym = np.stack([np.eye(3, dtype=np.float32), rz, rz @ rz])
    pred = r.uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    gt = r.uniform(-1, 1, (5, 8, 8, 3)).astype(np.float32)
    prob = r.uniform(0, 1, (5, 8, 8, 1)).astype(np.float32)
    pgt = (r.uniform(0, 1, (5, 8, 8, 1)) > 0.5).astype(np.float32)
    got = np.asarray(transformer_loss(pred, gt, prob, pgt, sym))
    ref = _ref_transformer_loss(pred, gt, prob, pgt, list(sym))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bce_logits_matches_definition():
    r = np.random.RandomState(3)
    logits = r.uniform(-3, 3, (8, 1)).astype(np.float32)
    labels = r.uniform(0, 1, (8,)).astype(np.float32)
    p = 1 / (1 + np.exp(-logits[:, 0]))
    ref = -(labels * np.log(p) + (1 - labels) * np.log(1 - p)).mean()
    got = float(bce_logits(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
