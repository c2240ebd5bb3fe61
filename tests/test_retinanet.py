"""RetinaNet alternative detector: anchors, delta algebra, assignment,
static-shape NMS decode, and a short training-signal check (reference
counterpart: fizyr keras-retinanet, ``5_evaluation_bop_basic.py:64-97``)."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.models.retinanet import (RetinaNetDetector, RetinaOut,
                                           anchor_boxes, assign_anchors,
                                           decode_deltas, decode_retinanet,
                                           encode_deltas, retinanet_loss)
from pix2pose_tpu.training.detector_data import make_detector_batch

from test_detector import _toy_store


def test_anchor_counts_and_coverage():
    a = anchor_boxes(128)
    assert a.shape == ((16 * 16 + 8 * 8 + 4 * 4) * 9, 4)
    # centers span the image
    cv = (a[:, 0] + a[:, 2]) / 2
    assert cv.min() > 0 and cv.max() < 128
    # areas positive, aspect ratios present
    hh, ww = a[:, 2] - a[:, 0], a[:, 3] - a[:, 1]
    assert (hh > 0).all() and (ww > 0).all()
    ratios = np.unique(np.round(hh / ww, 2))
    assert len(ratios) >= 3


def test_anchor_order_is_position_major():
    """The head reshapes (B,H,W,A*C) -> (B,H*W*A,C), so anchor index
    (v*n+u)*A + a MUST vary anchor-shape fastest and position next —
    an anchor-major layout silently scrambles prediction<->target
    correspondence (the training-plateau bug)."""
    a = anchor_boxes(64, strides=(8,))
    n = 64 // 8
    a = a.reshape(n, n, 9, 4)
    cv = (a[..., 0] + a[..., 2]) / 2
    cu = (a[..., 1] + a[..., 3]) / 2
    # all 9 anchors of one cell share its center
    assert np.allclose(cv, cv[..., :1]) and np.allclose(cu, cu[..., :1])
    # centers advance with the stride along each axis
    np.testing.assert_allclose(cv[:, 0, 0], (np.arange(n) + 0.5) * 8)
    np.testing.assert_allclose(cu[0, :, 0], (np.arange(n) + 0.5) * 8)
    # the 9 shapes differ within a cell
    hh = a[0, 0, :, 2] - a[0, 0, :, 0]
    ww = a[0, 0, :, 3] - a[0, 0, :, 1]
    assert len(np.unique(np.round(hh * 1000 + ww, 1))) == 9


def test_assign_forces_best_anchor_for_small_gt():
    """A GT smaller than every anchor must still get (at least) one
    positive anchor — otherwise it trains as background."""
    anchors = jnp.asarray(anchor_boxes(128))
    tiny = jnp.asarray([[60.0, 60.0, 70.0, 70.0],  # 10px: IoU < 0.5 vs
                        [0.0, 0.0, 0.0, 0.0]])     # every >=32px anchor
    gt_cls = jnp.array([3, -1], jnp.int32)
    gt_valid = jnp.array([True, False])
    cls_idx, box_t, pos, ignore = assign_anchors(anchors, tiny, gt_cls,
                                                 gt_valid)
    from pix2pose_tpu.models.retinanet import iou_matrix
    iou = np.asarray(iou_matrix(anchors, tiny))[:, 0]
    assert iou.max() < 0.5  # premise: below the pos threshold
    forced = int(np.argmax(iou))
    assert bool(pos[forced]) and int(cls_idx[forced]) == 3
    assert int(np.asarray(pos).sum()) == 1


def test_assign_forcing_collisions_deterministic():
    """Two valid GTs sharing one best anchor resolve to the LOWER gt
    index; an invalid GT's degenerate argmax (anchor 0) must not corrupt
    anchor 0's assignment."""
    anchors = jnp.asarray(anchor_boxes(128))
    # identical tiny boxes -> identical iou rows -> same best anchor
    box = [60.0, 60.0, 70.0, 70.0]
    gt = jnp.asarray([box, box, [0.0, 0.0, 0.0, 0.0]])
    gt_cls = jnp.array([3, 4, -1], jnp.int32)
    gt_valid = jnp.array([True, True, False])
    cls_idx, box_t, pos, ignore = assign_anchors(anchors, gt, gt_cls,
                                                 gt_valid)
    from pix2pose_tpu.models.retinanet import iou_matrix
    iou = np.asarray(iou_matrix(anchors, gt))[:, 0]
    forced = int(np.argmax(iou))
    assert bool(pos[forced]) and int(cls_idx[forced]) == 3  # gt 0 wins
    # anchor 0 untouched by the invalid GT: positive only if it earned it
    assert not bool(pos[0])


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = jnp.asarray(anchor_boxes(128)[::97])  # subsample
    n = anchors.shape[0]
    centers = rng.uniform(20, 100, (n, 2))
    sizes = rng.uniform(8, 60, (n, 2))
    boxes = jnp.asarray(np.concatenate(
        [centers - sizes / 2, centers + sizes / 2], axis=1))
    rec = decode_deltas(anchors, encode_deltas(anchors, boxes))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes),
                               atol=1e-3)


def test_assign_anchors_pos_neg():
    anchors = jnp.asarray(anchor_boxes(128))
    # GT equals anchor 100 exactly -> that anchor is positive
    gt = jnp.stack([anchors[100], jnp.zeros(4)])
    gt_cls = jnp.array([2, -1], jnp.int32)
    gt_valid = jnp.array([True, False])
    cls_idx, box_t, pos, ignore = assign_anchors(anchors, gt, gt_cls,
                                                 gt_valid)
    assert bool(pos[100])
    assert int(cls_idx[100]) == 2
    np.testing.assert_allclose(np.asarray(box_t[100]), 0.0, atol=1e-5)
    # an anchor far away is negative, not ignored
    far = int(jnp.argmin(jnp.abs(anchors[:, 0] - 120)
                         + jnp.abs(anchors[:, 1] - 8)))
    assert not bool(pos[far]) and not bool(ignore[far])
    # invalid GT can never make positives on its own
    assert np.asarray(pos).sum() >= 1


def test_decode_nms_suppresses_same_class_only():
    anchors = jnp.asarray(anchor_boxes(128))
    a_total = anchors.shape[0]
    c = 3
    logits = np.full((1, a_total, c), -9.0, np.float32)
    # two near-identical anchors (consecutive scale at same location
    # overlap heavily): same class -> suppress; different class -> keep
    i0 = 500
    # find a partner anchor with IoU >= 0.5
    from pix2pose_tpu.models.retinanet import iou_matrix
    cand = np.array(iou_matrix(anchors[i0:i0 + 1], anchors))[0]
    cand[i0] = 0
    i1 = int(np.argmax(cand))
    assert cand[i1] >= 0.5
    logits[0, i0, 1] = 6.0   # class 1, strongest
    logits[0, i1, 1] = 5.0   # class 1, overlapping -> suppressed
    logits[0, i1, 2] = 4.0   # class 2, overlapping -> kept
    out = RetinaOut(cls_logits=jnp.asarray(logits),
                    box_deltas=jnp.zeros((1, a_total, 4)))
    boxes, scores, cls = decode_retinanet(out, anchors, top_k=8)
    kept = [(int(cls[0, i]), float(scores[0, i]))
            for i in range(8) if float(scores[0, i]) > 0.5]
    kept_cls = sorted(c for c, _ in kept)
    assert kept_cls == [1, 2], kept


def test_model_shapes_and_training_signal():
    store = _toy_store(np.random.RandomState(1))
    model = RetinaNetDetector(num_classes=2, head_dim=32, trunk="tiny")
    anchors = anchor_boxes(128)
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out.cls_logits.shape == (1, anchors.shape[0], 2)
    assert out.box_deltas.shape == (1, anchors.shape[0], 4)

    from pix2pose_tpu.training.retinanet_train import (
        create_retinanet_state, make_retinanet_step)
    state = create_retinanet_state(jax.random.PRNGKey(0), model, 128)
    step = jax.jit(make_retinanet_step(model, anchors))
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(6):
        key, kb = jax.random.split(key)
        batch = make_detector_batch(store, kb, batch_size=2, im_size=128,
                                    k_obj=3)
        state, parts = step(state, batch, 1e-3)
        losses.append(float(parts["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
