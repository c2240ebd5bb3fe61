"""get_boxes clamp arithmetic vs. a literal numpy port of the reference
semantics (recognition.py:28-69)."""

import numpy as np
import jax

from pix2pose_tpu.ops import boxes


def ref_get_boxes(bbox, v_max, u_max, box_size=1.5, ct=(-1,), max_w=9999):
    """Literal transcription of reference recognition.py:28-69 for testing."""
    if ct[0] == -1:
        bbox_ct_v = int((bbox[0] + bbox[2]) / 2)
        bbox_ct_u = int((bbox[1] + bbox[3]) / 2)
    else:
        bbox_ct_v, bbox_ct_u = ct[0], ct[1]
    width = bbox[3] - bbox[1]
    height = bbox[2] - bbox[0]
    w = min(max_w, max(width * box_size, height * box_size))
    h = w
    v1_ori = bbox_ct_v - int(h / 2)
    v2_ori = bbox_ct_v + int(h / 2)
    u1_ori = bbox_ct_u - int(w / 2)
    u2_ori = bbox_ct_u + int(w / 2)
    shift_v_min = shift_u_min = shift_v_max = shift_u_max = 0
    v1, v2, u1, u2 = v1_ori, v2_ori, u1_ori, u2_ori
    if v1_ori < 0:
        shift_v_min = np.abs(v1_ori)
        v1 = 0
    if v2_ori > v_max:
        shift_v_max = -np.abs(v2_ori - v_max)
        v2 = v_max
    if u1_ori < 0:
        shift_u_min = np.abs(u1_ori)
        u1 = 0
    if u2_ori > u_max:
        shift_u_max = -np.abs(u2_ori - u_max)
        u2 = u_max
    vv1 = shift_v_min
    vv2 = shift_v_max + (v2_ori - v1_ori)
    uu1 = shift_u_min
    uu2 = shift_u_max + (u2_ori - u1_ori)
    return (v1_ori, v2_ori, u1_ori, u2_ori, v1, v2, u1, u2, vv1, vv2, uu1, uu2)


def test_get_boxes_matches_reference_random():
    rng = np.random.RandomState(0)
    get = jax.jit(boxes.get_boxes, static_argnums=())
    for _ in range(200):
        v0, u0 = rng.randint(-20, 460), rng.randint(-20, 620)
        h, w = rng.randint(5, 300), rng.randint(5, 300)
        bbox = np.array([v0, u0, v0 + h, u0 + w], np.int32)
        ref = ref_get_boxes(bbox, 480, 640)
        got = boxes.get_boxes(bbox, 480, 640)
        np.testing.assert_array_equal(np.array([int(x) for x in got]),
                                      np.array(ref), err_msg=str(bbox))


def test_get_boxes_with_center_and_maxw():
    rng = np.random.RandomState(1)
    for _ in range(100):
        bbox = np.array(
            sorted(rng.uniform(0, 480, 2)) + sorted(rng.uniform(0, 640, 2)),
            np.float32)[[0, 2, 1, 3]]
        ct = (rng.randint(0, 480), rng.randint(0, 640))
        max_w = rng.randint(30, 400)
        ref = ref_get_boxes(bbox, 480, 640, ct=ct, max_w=max_w)
        got = boxes.get_boxes(bbox, 480, 640, ct=np.array(ct), max_w=max_w)
        np.testing.assert_array_equal(np.array([int(x) for x in got]),
                                      np.array(ref))


def test_bbox_from_mask():
    m = np.zeros((48, 64), bool)
    m[10:20, 30:35] = True
    np.testing.assert_array_equal(np.asarray(boxes.bbox_from_mask(m)),
                                  [10, 30, 19, 34])
    np.testing.assert_array_equal(
        np.asarray(boxes.bbox_from_mask(np.zeros((8, 8), bool))), [0, 0, 0, 0])
