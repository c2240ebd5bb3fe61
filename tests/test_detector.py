"""Detector: model shapes, decode on hand-crafted outputs, scene composer
targets, one train step, end-to-end adapter on an easy synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pix2pose_tpu.models.detector import (CenterNetDetector, DetectorOut,
                                          decode_detections, detector_loss,
                                          focal_loss)
from pix2pose_tpu.training.detector_data import (DetectorStore,
                                                 make_detector_batch)


def test_model_shapes():
    model = CenterNetDetector(num_classes=3)
    x = jnp.zeros((1, 256, 256, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out.heat.shape == (1, 64, 64, 3)
    assert out.wh.shape == (1, 64, 64, 2)
    assert out.off.shape == (1, 64, 64, 2)
    assert out.seg.shape == (1, 64, 64, 3)
    from pix2pose_tpu.models.detector import MASK_DIM, N_CTRL
    assert out.ctrl.shape == (1, 64, 64, N_CTRL)
    assert out.mfeat.shape == (1, 64, 64, MASK_DIM)


def test_decode_handcrafted_peaks():
    h = w = 64
    heat = np.full((1, h, w, 2), -8.0, np.float32)
    heat[0, 10, 20, 0] = 8.0   # class 0 at (10,20)
    heat[0, 40, 50, 1] = 6.0   # class 1 at (40,50)
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 10, 20] = [5.0, 8.0]
    wh[0, 40, 50] = [10.0, 4.0]
    off = np.zeros((1, h, w, 2), np.float32)
    off[0, 10, 20] = [0.5, 0.25]
    from pix2pose_tpu.models.detector import MASK_DIM, N_CTRL
    out = DetectorOut(heat=jnp.asarray(heat), wh=jnp.asarray(wh),
                      off=jnp.asarray(off),
                      seg=jnp.zeros((1, h, w, 2)),
                      ctrl=jnp.zeros((1, h, w, N_CTRL)),
                      mfeat=jnp.zeros((1, h, w, MASK_DIM)))
    det = decode_detections(out, top_k=4)
    assert float(det.score[0, 0]) > 0.99
    assert int(det.cls[0, 0]) == 0
    np.testing.assert_allclose(np.asarray(det.center[0, 0]),
                               [(10 + 0.5) * 4, (20 + 0.25) * 4], atol=.01)
    bbox = np.asarray(det.bbox[0, 0])
    np.testing.assert_allclose(bbox[2] - bbox[0], 20.0, atol=0.01)
    np.testing.assert_allclose(bbox[3] - bbox[1], 32.0, atol=0.01)
    assert int(det.cls[0, 1]) == 1


def test_focal_loss_perfect_prediction_small():
    gt = np.zeros((1, 8, 8, 1), np.float32)
    gt[0, 4, 4, 0] = 1.0
    logits = np.full((1, 8, 8, 1), -20.0, np.float32)
    logits[0, 4, 4, 0] = 20.0
    assert float(focal_loss(jnp.asarray(logits), jnp.asarray(gt))) < 1e-4
    bad = -logits
    assert float(focal_loss(jnp.asarray(bad), jnp.asarray(gt))) > 1.0


def _toy_store(rng, n_classes=2, n_per=3):
    """Distinct bright blobs per class."""
    rgbs, masks, labels, extents = [], [], [], []
    for c in range(n_classes):
        for _ in range(n_per):
            rgb = np.zeros((128, 128, 3), np.uint8)
            m = np.zeros((128, 128), bool)
            r = rng.randint(25, 45)
            yy, xx = np.mgrid[0:128, 0:128]
            blob = ((yy - 64) ** 2 + (xx - 64) ** 2) < r * r
            col = [255, 40] if c == 0 else [40, 255]
            rgb[blob] = [col[0], col[1], 128]
            m |= blob
            rgbs.append(rgb)
            masks.append(m)
            labels.append(c)
            extents.append(float(2 * r))
    backs = rng.randint(0, 60, (2, 256, 256, 3)).astype(np.uint8)
    return DetectorStore(rgb=jnp.asarray(np.stack(rgbs)),
                         mask=jnp.asarray(np.stack(masks)),
                         label=jnp.asarray(np.array(labels, np.int32)),
                         extent=jnp.asarray(np.array(extents, np.float32)),
                         backs=jnp.asarray(backs), num_classes=n_classes)


def test_scene_composer_targets():
    rng = np.random.RandomState(0)
    store = _toy_store(rng)
    b = make_detector_batch(store, jax.random.PRNGKey(0), batch_size=2,
                            im_size=256, k_obj=4)
    assert b["image"].shape == (2, 256, 256, 3)
    assert b["heat"].shape == (2, 64, 64, 2)
    heat = np.asarray(b["heat"])
    reg = np.asarray(b["reg_mask"])
    assert reg.sum() >= 2  # at least some valid GT centers
    # exact positives exist where reg_mask is set
    assert (heat.max(axis=-1)[reg > 0] >= 1.0 - 1e-5).all()
    # seg masks roughly cover the image fraction of objects
    seg = np.asarray(b["seg"])
    assert 0.005 < seg.mean() < 0.6
    # wh at centers is positive
    wh = np.asarray(b["wh"])
    assert (wh[reg > 0] > 0).all()


def test_detector_train_step_decreases_loss():
    rng = np.random.RandomState(1)
    store = _toy_store(rng)
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_detector_step)
    model = CenterNetDetector(num_classes=2, head_dim=32)
    state = create_detector_state(jax.random.PRNGKey(0), model, 256)
    step = jax.jit(make_detector_step(model))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(6):
        key, kb = jax.random.split(key)
        batch = make_detector_batch(store, kb, batch_size=2, im_size=256,
                                    k_obj=4)
        state, parts = step(state, batch, 1e-3)
        losses.append(float(parts["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_instance_masks_distinct_per_peak():
    """Two same-class peaks sharing ONE controller vector still decode to
    DISJOINT masks because the dynamic FCN sees peak-relative
    coordinates — the property semantic segmentation cannot provide
    (reference contract: per-instance Mask-RCNN masks,
    ``mask_rcnn_util.py:67-133``)."""
    from pix2pose_tpu.models.detector import (MASK_DIM, N_CTRL, REL_NORM,
                                              _split_ctrl)

    h = w = 64
    heat = np.full((1, h, w, 1), -8.0, np.float32)
    heat[0, 16, 16, 0] = 8.0
    heat[0, 40, 44, 0] = 7.0
    wh = np.zeros((1, h, w, 2), np.float32)
    wh[0, 16, 16] = wh[0, 40, 44] = [12.0, 12.0]
    off = np.zeros((1, h, w, 2), np.float32)

    # handcraft ctrl: logit = 0.5 - (|rel_v| + |rel_u|) -> a diamond of
    # radius 0.5*REL_NORM grid px around each peak
    ctrl = np.zeros(N_CTRL, np.float32)
    (w1, b1), (w2, b2), (w3, b3) = _split_ctrl(jnp.zeros(N_CTRL))
    c = np.zeros(N_CTRL, np.float32)
    i_w1 = 0
    W1 = np.zeros((MASK_DIM + 2, 8), np.float32)
    W1[MASK_DIM, 0] = 1.0    # +rel_v
    W1[MASK_DIM, 1] = -1.0   # -rel_v
    W1[MASK_DIM + 1, 2] = 1.0
    W1[MASK_DIM + 1, 3] = -1.0
    c[:W1.size] = W1.reshape(-1)
    i = W1.size + 8  # skip b1
    W2 = np.eye(8, dtype=np.float32)
    c[i:i + 64] = W2.reshape(-1)
    i += 64 + 8  # skip b2
    W3 = np.array([-1, -1, -1, -1, 0, 0, 0, 0], np.float32)
    c[i:i + 8] = W3
    i += 8
    c[i] = 0.5  # b3
    ctrl_map = np.broadcast_to(c, (1, h, w, N_CTRL))

    out = DetectorOut(heat=jnp.asarray(heat), wh=jnp.asarray(wh),
                      off=jnp.asarray(off),
                      seg=jnp.zeros((1, h, w, 1)),
                      ctrl=jnp.asarray(ctrl_map),
                      mfeat=jnp.zeros((1, h, w, MASK_DIM)))
    det = decode_detections(out, top_k=2)
    m0 = np.asarray(det.mask[0, 0])
    m1 = np.asarray(det.mask[0, 1])
    assert m0.sum() > 20 and m1.sum() > 20
    assert not (m0 & m1).any()  # disjoint
    assert m0[16, 16] and not m0[40, 44]
    assert m1[40, 44] and not m1[16, 16]


def test_direct_paste_matches_padded_canvas():
    """The clamped-origin direct paste (im_size >= _WIN) must reproduce
    the padded-canvas path: the window origin shift is compensated in
    the affine's target center, so frame-space sampling is identical
    (up to float rounding at mask boundaries)."""
    from pix2pose_tpu.training.detector_data import _WIN, _place_one

    store = _toy_store(np.random.RandomState(3))
    S = _WIN + 88  # 384
    for i, seed in ((0, 0), (3, 7), (5, 11)):
        k = jax.random.PRNGKey(seed)
        args = (k, store.rgb[i], store.mask[i], store.extent[i], S,
                (0.6, 1.6))
        rgb_a, m_a = _place_one(*args)
        rgb_b, m_b = _place_one(*args, force_padded=True)
        np.testing.assert_allclose(np.asarray(rgb_a), np.asarray(rgb_b),
                                   atol=1e-4)
        # mask: a hairline threshold flip at the boundary is acceptable
        assert (np.asarray(m_a) != np.asarray(m_b)).mean() < 1e-4


def test_bf16_warp_close_to_fp32():
    """warp_dtype='bfloat16' (the composer default) stays within the
    patches' own uint8 quantization of the fp32 warp."""
    store = _toy_store(np.random.RandomState(4))
    k = jax.random.PRNGKey(2)
    kw = dict(batch_size=2, im_size=256, k_obj=3)
    b16 = make_detector_batch(store, k, warp_dtype="bfloat16", **kw)
    b32 = make_detector_batch(store, k, warp_dtype=None, **kw)
    img16, img32 = np.asarray(b16["image"]), np.asarray(b32["image"])
    diff = np.abs(img16 - img32)
    # interiors agree to the weight rounding; isolated mask-threshold
    # flips on blob BOUNDARIES swap object/background for single pixels
    # (full-range diff), so bound their fraction, not the max
    assert np.mean(diff) < 3e-3, np.mean(diff)
    assert np.mean(diff.max(-1) > 0.05) < 0.01  # <1% of pixels
    # GT boxes derive from warped-mask extremes: same validity, <=2 px
    v16, v32 = np.asarray(b16["gt_valid"]), np.asarray(b32["gt_valid"])
    assert (v16 == v32).all()
    both = v16 & v32
    bb = np.abs(np.asarray(b16["gt_bbox"]) - np.asarray(b32["gt_bbox"]))
    assert bb[both].max() <= 2.0


def test_pooled_detector_step_trains():
    """Scene-pool regime: ring refresh + contiguous-window batch, one
    jitted program; loss decreases over a few steps."""
    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_train import (
        create_detector_state, make_pooled_detector_step)

    store = _toy_store(np.random.RandomState(5))
    model = CenterNetDetector(num_classes=2, trunk="tiny", head_dim=32)
    state = create_detector_state(jax.random.PRNGKey(0), model, 256)
    init_pool, step = make_pooled_detector_step(
        model, pool_size=8, batch_size=4, im_size=256,
        fresh_per_step=2, k_obj=3)
    pool = init_pool(store, jax.random.PRNGKey(1))
    assert pool["image"].shape == (8, 256, 256, 3)
    first_img = np.asarray(pool["image"][:2]).copy()

    losses = []
    key = jax.random.PRNGKey(2)
    for it in range(6):
        key, ks = jax.random.split(key)
        state, pool, parts = step(state, store, pool, jnp.int32(it), ks,
                                  jnp.float32(1e-3))
        losses.append(float(parts["total"]))
    # ring slot 0..1 was refreshed at it=0 (and it=4): contents changed
    assert np.abs(np.asarray(pool["image"][:2]) - first_img).max() > 0.01
    assert losses[-1] < losses[0]


def test_pooled_step_rejects_bad_sizes():
    import pytest

    from pix2pose_tpu.models.detector import CenterNetDetector
    from pix2pose_tpu.training.detector_train import \
        make_pooled_detector_step

    model = CenterNetDetector(num_classes=2, trunk="tiny")
    with pytest.raises(ValueError):
        make_pooled_detector_step(model, pool_size=7, batch_size=4,
                                  im_size=256, fresh_per_step=2)
    with pytest.raises(ValueError):
        make_pooled_detector_step(model, pool_size=4, batch_size=8,
                                  im_size=256, fresh_per_step=2)


def test_fused_heads_exact_vs_unfused():
    """fused_heads is a pure rewrite: stitching the six per-head 3x3
    kernels into the fused heads_conv reproduces the unfused model's
    outputs exactly (same math, one big contraction)."""
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (2, 64, 64, 3))
    base = CenterNetDetector(num_classes=3, trunk="tiny", head_dim=16,
                             fused_heads=False)
    v = base.init(jax.random.PRNGKey(0), x)
    names = ["heat", "wh", "off", "seg", "ctrl", "mfeat"]  # call order
    p = dict(v["params"])
    fused_kernel = jnp.concatenate(
        [p[f"{n}_conv"]["kernel"] for n in names], axis=-1)
    fused_bias = jnp.concatenate(
        [p[f"{n}_conv"]["bias"] for n in names], axis=-1)
    for n in names:
        del p[f"{n}_conv"]
    p["heads_conv"] = {"kernel": fused_kernel, "bias": fused_bias}
    fused = CenterNetDetector(num_classes=3, trunk="tiny", head_dim=16,
                              fused_heads=True)
    out_a = base.apply(v, x)
    out_b = fused.apply({"params": p, "batch_stats": v["batch_stats"]}, x)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_s2d_stem_exact():
    """The space-to-depth stem is bit-level equivalent to the classic
    7x7/2 stem under the s2d_stem_kernel remap."""
    from pix2pose_tpu.models.resnet50 import ResNet50Trunk, s2d_stem_kernel

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    classic = ResNet50Trunk(stage_blocks=(1, 1), stem_s2d=False)
    v = classic.init(jax.random.PRNGKey(0), x)
    s2d = ResNet50Trunk(stage_blocks=(1, 1), stem_s2d=True)
    k7 = v["params"]["stem_conv"]["kernel"]
    p2 = jax.tree_util.tree_map(lambda a: a, v["params"])
    p2["stem_conv"] = {"kernel": jnp.asarray(s2d_stem_kernel(np.asarray(k7))),
                       "bias": v["params"]["stem_conv"]["bias"]}
    fa = classic.apply(v, x)
    fb = s2d.apply({"params": p2, "batch_stats": v["batch_stats"]}, x)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)
