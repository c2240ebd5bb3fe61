"""GAN train step: loss decreases, state updates, sharded execution on the
8-device CPU mesh (dp and obj x dp)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.config import TrainConfig
from pix2pose_tpu.models import AutoEncoder, Discriminator
from pix2pose_tpu.parallel import (make_mesh, make_parallel_train_step,
                                   replicate, shard_batch)
from pix2pose_tpu.training import create_train_state, make_train_step


def tiny_models():
    # full architecture at reduced resolution is too slow for CPU CI; use the
    # real 128 model but a tiny batch instead
    return AutoEncoder(backbone="paper"), Discriminator()


def synth_batch(rng, b=4, s=128):
    src = rng.uniform(-1, 1, (b, s, s, 3)).astype(np.float32)
    # target: a smooth function of src so the generator can actually learn
    tgt = np.tanh(src * 0.5 + 0.2).astype(np.float32)
    prob_gt = (rng.uniform(0, 1, (b, s, s, 1)) > 0.3).astype(np.float32)
    return {"src": jnp.asarray(src), "tgt": jnp.asarray(tgt),
            "prob_gt": jnp.asarray(prob_gt)}


@pytest.fixture(scope="module")
def setup():
    gen, disc = tiny_models()
    cfg = TrainConfig(batch_size=4)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, cfg)
    step = make_train_step(gen, disc, cfg)
    return gen, disc, cfg, state, step


def test_single_device_step_and_loss_decreases(setup):
    gen, disc, cfg, state, step = setup
    rng = np.random.RandomState(0)
    batch = synth_batch(rng)
    sym = jnp.eye(3)[None]
    jstep = jax.jit(step)
    losses = []
    for i in range(6):
        state, metrics = jstep(state, batch, sym, 1e-3,
                               jax.random.PRNGKey(i))
        losses.append(float(metrics["recon_loss"]))
    assert int(state.step) == 6
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_bf16_mixed_precision_step():
    """compute_dtype=bfloat16: params/losses stay fp32, step runs, and the
    loss decreases like the fp32 path (mixed-precision training option)."""
    cfg = TrainConfig(batch_size=4, compute_dtype="bfloat16")
    gen = AutoEncoder(backbone="paper", dtype=cfg.jnp_dtype)
    disc = Discriminator(dtype=cfg.jnp_dtype)
    state = create_train_state(jax.random.PRNGKey(0), gen, disc, cfg)
    # params must remain fp32 (standard mixed precision)
    leaves = jax.tree_util.tree_leaves(state.gen_params)
    assert all(l.dtype == jnp.float32 for l in leaves)
    step = jax.jit(make_train_step(gen, disc, cfg))
    rng = np.random.RandomState(0)
    batch = synth_batch(rng)
    sym = jnp.eye(3)[None]
    losses = []
    for i in range(6):
        state, metrics = step(state, batch, sym, 1e-3, jax.random.PRNGKey(i))
        assert metrics["recon_loss"].dtype == jnp.float32
        losses.append(float(metrics["recon_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_dp_sharded_step(setup):
    gen, disc, cfg, state, step = setup
    mesh = make_mesh((1, 8))
    pstep = make_parallel_train_step(step, mesh, object_parallel=False)
    rng = np.random.RandomState(1)
    batch = shard_batch(mesh, synth_batch(rng, b=8))
    state = replicate(mesh, state)
    sym = replicate(mesh, jnp.eye(3)[None])
    state, metrics = pstep(state, batch, sym, 1e-3, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["recon_loss"]))
    assert int(state.step) == 1


def test_object_parallel_step(setup):
    gen, disc, cfg, _, step = setup
    mesh = make_mesh((4, 2))
    n_obj = 4
    states = []
    for o in range(n_obj):
        states.append(create_train_state(jax.random.PRNGKey(o), gen, disc,
                                         cfg))
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *states)
    rng = np.random.RandomState(2)
    batches = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[synth_batch(rng, b=2) for _ in range(n_obj)])
    syms = jnp.tile(jnp.eye(3)[None, None], (n_obj, 1, 1, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), n_obj)
    pstep = make_parallel_train_step(step, mesh, object_parallel=True)
    new_state, metrics = pstep(stacked, batches, syms, 1e-3, keys)
    assert metrics["recon_loss"].shape == (n_obj,)
    assert np.isfinite(np.asarray(metrics["recon_loss"])).all()
    # objects trained on different data must diverge
    p0 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x[0],
                               new_state.gen_params))[0]
    p1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda x: x[1],
                               new_state.gen_params))[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_trained_detector_reaches_map_floor():
    """Slow: train the CenterNet (tiny trunk for CPU speed; same heads,
    losses, composer, and decode as the production ResNet-50 config) on
    5-class + distractor composed scenes, then assert a held-out COCO-mAP
    floor (VERDICT #7; reference counterpart: externally-trained detector
    configs, ``tools/mask_rcnn_util.py:39-65``). Calibration: mAP50 ~0.32
    @400 steps, ~0.36 @600 on this seed/config."""
    from synthetic import make_shape_patch_store
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_detector_step)
    from pix2pose_tpu.training.detector_data import make_detector_batch
    from pix2pose_tpu.eval.detection_metrics import (
        collect_synthetic_detections, evaluate_detections)

    store = make_shape_patch_store(np.random.RandomState(0), n_per=8,
                                   n_distractors=8)
    model = CenterNetDetector(num_classes=5, head_dim=64, trunk="tiny")
    state = create_detector_state(jax.random.PRNGKey(0), model, 192)
    raw = make_detector_step(model)

    @jax.jit
    def step_fn(state, store, key, lr):
        return raw(state, make_detector_batch(store, key, 4, 192, 4), lr)

    key = jax.random.PRNGKey(1)
    for i in range(500):
        key, kb = jax.random.split(key)
        state, parts = step_fn(state, store, kb,
                               2e-3 * min(1.0, (i + 1) / 50))
    assert np.isfinite(float(parts["total"]))
    variables = {"params": state.params, "batch_stats": state.stats}
    preds, gts = collect_synthetic_detections(
        model, variables, store, 16, jax.random.PRNGKey(777),
        im_size=192, k_obj=4, batch_size=4)
    res = evaluate_detections(preds, gts)
    assert res["mAP50"] >= 0.15, res


def test_trained_instance_masks_separate_same_class_overlaps():
    """Slow: train the CenterNet (tiny trunk) on 1-class blob scenes with
    heavy same-class overlap, then assert the CondInst mask head emits
    per-INSTANCE masks: each detection's mask tracks ITS OWN GT instance,
    not the class union (VERDICT r2 missing #2; reference contract =
    Mask-RCNN instance masks, ``mask_rcnn_util.py:67-133``)."""
    from test_detector import _toy_store
    from pix2pose_tpu.models.detector import (CenterNetDetector,
                                              decode_detections)
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_detector_step)
    from pix2pose_tpu.training.detector_data import make_detector_batch
    from pix2pose_tpu.eval.detection_metrics import box_iou_matrix

    store = _toy_store(np.random.RandomState(3), n_classes=1, n_per=6)
    model = CenterNetDetector(num_classes=1, head_dim=64, trunk="tiny")
    state = create_detector_state(jax.random.PRNGKey(0), model, 128)
    raw = make_detector_step(model)

    @jax.jit
    def step_fn(state, store, key, lr):
        return raw(state, make_detector_batch(store, key, 4, 128, 3), lr)

    key = jax.random.PRNGKey(1)
    for i in range(600):
        key, kb = jax.random.split(key)
        state, parts = step_fn(state, store, kb,
                               2e-3 * min(1.0, (i + 1) / 50))
    assert np.isfinite(float(parts["total"]))
    variables = {"params": state.params, "batch_stats": state.stats}

    batch = make_detector_batch(store, jax.random.PRNGKey(123),
                                batch_size=8, im_size=128, k_obj=3)
    out = model.apply(variables, batch["image"])
    det = jax.device_get(decode_detections(out, top_k=4))
    gt_bbox = np.asarray(batch["gt_bbox"])
    gt_valid = np.asarray(batch["gt_valid"])
    gt_mask = np.asarray(batch["gt_mask"])  # (B,K,hs,hs) stride-4

    checked_pairs = 0
    own_ious, cross_ious = [], []
    for b in range(8):
        gv = np.where(gt_valid[b])[0]
        if len(gv) < 2:
            continue
        # relative keep: the 600-step tiny-trunk scores plateau around
        # 0.2-0.3 (absolute 0.3 once filtered EVERYTHING and the test
        # silently checked zero pairs); mask separation — the contract
        # under test — does not depend on absolute confidence
        keep = det.score[b] > max(0.15, 0.6 * float(det.score[b].max()))
        if keep.sum() < 2:
            continue
        dmask = det.mask[b]  # (K, hs, hs)
        dbox = det.bbox[b]
        iou = box_iou_matrix(dbox[keep], gt_bbox[b][gv])
        for di, dk in enumerate(np.where(keep)[0]):
            gi = int(np.argmax(iou[di]))
            if iou[di, gi] < 0.35:
                continue
            own = gt_mask[b, gv[gi]] > 0.5
            others = [gt_mask[b, g] > 0.5 for j, g in enumerate(gv)
                      if j != gi]
            dm = dmask[dk]

            def miou(a, bb):
                u = (a | bb).sum()
                return (a & bb).sum() / max(u, 1)

            own_ious.append(miou(dm, own))
            for om in others:
                if om.sum() and (own & om).sum() >= 0:
                    cross_ious.append(miou(dm, om))
                    checked_pairs += 1
    assert checked_pairs >= 3, "fixture produced too few overlap cases"
    assert np.mean(own_ious) > 0.35, (np.mean(own_ious), own_ious)
    # instance separation: own-instance agreement must dominate
    assert np.mean(own_ious) > 2.0 * np.mean(cross_ious), (
        np.mean(own_ious), np.mean(cross_ious))
