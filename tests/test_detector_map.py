"""Detection-quality metrics: IoU/AP math on hand-computed cases, oracle
mAP through the scene composer's GT boxes, distractor semantics, and the
score-threshold tuner (the measured replacement for the reference's
hand-tuned detector configs, ``tools/mask_rcnn_util.py:39-65``)."""

import numpy as np
import jax
import jax.numpy as jnp

from pix2pose_tpu.eval.detection_metrics import (average_precision,
                                                 box_iou_matrix,
                                                 evaluate_detections,
                                                 tune_score_threshold)
from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                 make_detector_batch)

from test_detector import _toy_store


def test_box_iou_matrix_known_values():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = box_iou_matrix(a, b)[0]
    np.testing.assert_allclose(iou[0], 1.0)
    np.testing.assert_allclose(iou[1], 25.0 / 175.0)
    np.testing.assert_allclose(iou[2], 0.0)


def test_average_precision_hand_case():
    # perfect ranking
    assert average_precision(np.array([True, True]), 2) == 1.0
    # ranked [TP, FP, TP] over 2 GT: p_env = [1, 2/3, 2/3], recall steps
    # at 0.5 and 1.0 -> 101-pt AP = (51*1 + 50*(2/3)) / 101
    ap = average_precision(np.array([True, False, True]), 2)
    np.testing.assert_allclose(ap, (51 + 50 * 2 / 3) / 101, atol=1e-9)
    # no detections at all
    assert average_precision(np.zeros(0, bool), 3) == 0.0
    # zero GT -> NaN (class excluded from means)
    assert np.isnan(average_precision(np.array([False]), 0))


def test_evaluate_detections_oracle_is_perfect():
    """Composer GT boxes fed back as detections score mAP == 1."""
    store = _toy_store(np.random.RandomState(0))
    b = make_detector_batch(store, jax.random.PRNGKey(3), batch_size=4,
                            im_size=256, k_obj=4)
    gt_bbox = np.asarray(b["gt_bbox"])
    gt_cls = np.asarray(b["gt_cls"])
    gt_valid = np.asarray(b["gt_valid"])
    assert gt_valid.any()
    # valid GT boxes are well-formed and in bounds
    vb = gt_bbox[gt_valid]
    assert (vb[:, 2] > vb[:, 0]).all() and (vb[:, 3] > vb[:, 1]).all()
    assert (vb >= 0).all() and (vb <= 256).all()
    assert (gt_cls[gt_valid] >= 0).all()

    preds, gts = [], []
    for i in range(4):
        v = gt_valid[i]
        gts.append({"bbox": gt_bbox[i][v], "cls": gt_cls[i][v]})
        preds.append({"bbox": gt_bbox[i][v], "cls": gt_cls[i][v],
                      "score": np.ones(int(v.sum()))})
    res = evaluate_detections(preds, gts)
    assert res["mAP50"] == 1.0 and res["mAP75"] == 1.0
    assert res["mAP"] == 1.0


def test_evaluate_detections_penalizes_fp_and_misses():
    gt = [{"bbox": np.array([[10, 10, 50, 50], [100, 100, 140, 140]]),
           "cls": np.array([0, 0])}]
    # one perfect hit, one far-off FP, second GT missed
    pred = [{"bbox": np.array([[10, 10, 50, 50], [200, 200, 220, 220]]),
             "score": np.array([0.9, 0.8]), "cls": np.array([0, 0])}]
    res = evaluate_detections(pred, gt, coco_sweep=False)
    # recall caps at 0.5; 101-pt AP = 51/101 * precision-env(1.0)
    np.testing.assert_allclose(res["mAP50"], 51 / 101, atol=1e-9)


def test_distractors_make_clutter_but_no_targets():
    rng = np.random.RandomState(2)
    # one "class" whose patches are empty (mask all False) + bright
    # distractor blobs: every target must be suppressed while the image
    # still shows the distractor clutter
    empty = DetectorStore(
        rgb=jnp.zeros((2, 128, 128, 3), jnp.uint8),
        mask=jnp.zeros((2, 128, 128), bool),
        label=jnp.zeros((2,), jnp.int32),
        extent=jnp.full((2,), 40.0, jnp.float32),
        backs=jnp.zeros((2, 256, 256, 3), jnp.uint8),
        num_classes=1)
    blob = _toy_store(rng, n_classes=1, n_per=6)
    store = DetectorStore.from_patch_stores(
        {1: empty}, empty.backs,
        distractors=[blob])
    assert int(np.asarray(store.label).min()) == -1
    b = make_detector_batch(store, jax.random.PRNGKey(5), batch_size=2,
                            im_size=256, k_obj=6)
    assert not np.asarray(b["gt_valid"]).any()
    assert np.asarray(b["reg_mask"]).sum() == 0
    assert np.asarray(b["heat"]).max() == 0
    assert np.asarray(b["seg"]).max() == 0
    # ... but the distractors did composite into the image
    assert np.asarray(b["image"]).max() > 0.3


def test_mask_iou_matrix_known_values():
    from pix2pose_tpu.eval.detection_metrics import mask_iou_matrix
    a = np.zeros((1, 8, 8), bool)
    a[0, :4, :4] = True
    b = np.zeros((3, 8, 8), bool)
    b[0, :4, :4] = True          # identical
    b[1, 2:6, :4] = True         # half-overlap: inter 8, union 24
    b[2, 4:, 4:] = True          # disjoint
    iou = mask_iou_matrix(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 8 / 24, 0.0])


def test_mask_map_oracle_and_degradation():
    """GT instance masks fed back as predictions score mask-mAP 1; a
    shifted mask drops high-IoU AP while box mAP stays perfect — i.e.
    the mask metric measures mask quality, not box quality."""
    gt_m = np.zeros((2, 32, 32), bool)
    gt_m[0, 4:16, 4:16] = True
    gt_m[1, 18:30, 18:30] = True
    boxes = np.array([[4, 4, 16, 16], [18, 18, 30, 30]], float) * 4
    gts = [{"bbox": boxes, "cls": np.array([0, 0]), "mask": gt_m}]

    perfect = [{"bbox": boxes, "cls": np.array([0, 0]),
                "score": np.array([0.9, 0.8]), "mask": gt_m}]
    res = evaluate_detections(perfect, gts, iou_type="mask")
    assert res["mAP50"] == 1.0 and res["mAP75"] == 1.0

    # second instance's mask shifted by 4 px (IoU = 8*12/(2*12*12-8*12)
    # = 0.5): matches at 0.5 but not 0.75
    bad_m = gt_m.copy()
    bad_m[1] = np.roll(gt_m[1], 4, axis=1)
    degraded = [{"bbox": boxes, "cls": np.array([0, 0]),
                 "score": np.array([0.9, 0.8]), "mask": bad_m}]
    res_d = evaluate_detections(degraded, gts, iou_type="mask")
    assert res_d["mAP50"] == 1.0
    assert res_d["mAP75"] < 1.0
    # box mAP is blind to the mask error
    res_box = evaluate_detections(degraded, gts)
    assert res_box["mAP75"] == 1.0


def test_collect_with_masks_shapes():
    """The harness plumbs decoded CondInst masks + composer GT instance
    masks through on the stride grid."""
    from pix2pose_tpu.eval.detection_metrics import (
        collect_synthetic_detections)
    from pix2pose_tpu.models.detector import CenterNetDetector

    store = _toy_store(np.random.RandomState(1))
    model = CenterNetDetector(num_classes=store.num_classes, trunk="tiny")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)))
    preds, gts = collect_synthetic_detections(
        model, variables, store, n_images=2, key=jax.random.PRNGKey(9),
        im_size=128, k_obj=3, batch_size=2, top_k=8, with_masks=True)
    assert len(preds) == 2 and len(gts) == 2
    for p, g in zip(preds, gts):
        assert p["mask"].shape == (len(p["bbox"]), 32, 32)
        assert g["mask"].shape == (len(g["bbox"]), 32, 32)
        assert p["mask"].dtype == bool and g["mask"].dtype == bool
    # end-to-end: the metric runs on the collected structures
    res = evaluate_detections(preds, gts, iou_type="mask",
                              coco_sweep=False)
    assert np.isfinite(res["mAP50"]) or np.isnan(res["mAP50"])


def test_tune_score_threshold_splits_tp_from_fp():
    gt = [{"bbox": np.array([[10, 10, 50, 50]]), "cls": np.array([0])}]
    pred = [{"bbox": np.array([[10, 10, 50, 50], [200, 200, 240, 240]]),
             "score": np.array([0.9, 0.2]), "cls": np.array([0, 0])}]
    tuned = tune_score_threshold(pred, gt)
    assert tuned["best_f1"] == 1.0
    assert 0.2 < tuned["best_th"] <= 0.9


def test_scale_range_controls_instance_size():
    """The composer's placement scale range is a deployment knob: the
    duplicate-cube e2e showed a detector trained at (0.6,1.6) merges
    ~40 px adjacent duplicates into one size-prior-compatible box."""
    store = _toy_store(np.random.RandomState(2))
    k = jax.random.PRNGKey(5)
    small = make_detector_batch(store, k, batch_size=2, im_size=256,
                                k_obj=3, scale_range=(0.25, 0.35))
    big = make_detector_batch(store, k, batch_size=2, im_size=256,
                              k_obj=3, scale_range=(1.2, 1.4))

    def mean_area(b):
        v = np.asarray(b["gt_valid"])
        bb = np.asarray(b["gt_bbox"])[v]
        return ((bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])).mean()

    assert np.asarray(small["gt_valid"]).any()
    assert np.asarray(big["gt_valid"]).any()
    assert mean_area(big) > 4.0 * mean_area(small)
