import numpy as np
import pytest

import jax.numpy as jnp

from marie_tpu.ops import (
    box_area,
    box_iou,
    boxes_xywh_to_xyxy,
    boxes_xyxy_to_xywh,
    nms,
    pairwise_rotated_iou,
    rotated_iou,
    rotated_nms,
)


def naive_iou(a, b):
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / ua if ua > 0 else 0.0


def naive_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j != i and not suppressed[j] and naive_iou(boxes[i], boxes[j]) > thresh:
                if scores[j] <= scores[i]:
                    suppressed[j] = True
    return sorted(keep)


def test_box_conversions():
    xywh = jnp.array([[10.0, 20.0, 30.0, 40.0]])
    xyxy = boxes_xywh_to_xyxy(xywh)
    np.testing.assert_allclose(xyxy, [[10, 20, 40, 60]])
    np.testing.assert_allclose(boxes_xyxy_to_xywh(xyxy), xywh)


def test_box_iou_matches_naive():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 100, (20, 2, 2))
    boxes = np.concatenate([pts.min(1), pts.max(1)], axis=-1).astype(np.float32)
    got = np.asarray(box_iou(jnp.array(boxes), jnp.array(boxes)))
    for i in range(20):
        for j in range(20):
            assert got[i, j] == pytest.approx(naive_iou(boxes[i], boxes[j]), abs=1e-5)


def test_box_area_clamps_negative():
    assert float(box_area(jnp.array([5.0, 5.0, 3.0, 9.0]))) == 0.0


def test_nms_matches_naive():
    rng = np.random.default_rng(1)
    n = 64
    centers = rng.uniform(10, 90, (n, 2))
    sizes = rng.uniform(5, 25, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(
        np.float32
    )
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    keep_mask, _ = nms(jnp.array(boxes), jnp.array(scores), iou_threshold=0.5)
    got = sorted(np.nonzero(np.asarray(keep_mask))[0].tolist())
    want = naive_nms(boxes, scores, 0.5)
    assert got == want


def test_nms_respects_valid_mask_and_max_outputs():
    boxes = jnp.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]], jnp.float32
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([True, True, False])
    keep, _ = nms(boxes, scores, 0.5, valid_mask=valid)
    assert np.asarray(keep).tolist() == [True, True, False]
    keep, _ = nms(boxes, scores, 0.5, max_outputs=1)
    assert int(np.asarray(keep).sum()) == 1
    assert bool(keep[0])


def test_rotated_iou_axis_aligned_matches_plain():
    # rotated boxes with angle 0 must agree with plain IoU
    a5 = jnp.array([10.0, 10.0, 8.0, 6.0, 0.0])
    b5 = jnp.array([12.0, 11.0, 8.0, 6.0, 0.0])

    def to_xyxy(r):
        cx, cy, w, h, _ = np.asarray(r)
        return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]

    want = naive_iou(to_xyxy(a5), to_xyxy(b5))
    got = float(rotated_iou(a5, b5))
    assert got == pytest.approx(want, abs=1e-5)


def test_rotated_iou_identity_and_45deg():
    box = jnp.array([0.0, 0.0, 1.0, 1.0, 30.0])
    assert float(rotated_iou(box, box)) == pytest.approx(1.0, abs=1e-5)

    sq = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    sq45 = jnp.array([0.0, 0.0, 1.0, 1.0, 45.0])
    inter = 2 * (np.sqrt(2) - 1)  # regular octagon
    want = inter / (2 - inter)
    assert float(rotated_iou(sq, sq45)) == pytest.approx(want, abs=1e-4)


def test_rotated_iou_disjoint():
    a = jnp.array([0.0, 0.0, 2.0, 2.0, 15.0])
    b = jnp.array([10.0, 10.0, 2.0, 2.0, 70.0])
    assert float(rotated_iou(a, b)) == 0.0


def test_pairwise_rotated_iou_shape_and_symmetry():
    rng = np.random.default_rng(2)
    boxes = np.stack(
        [
            rng.uniform(0, 50, 8),
            rng.uniform(0, 50, 8),
            rng.uniform(2, 10, 8),
            rng.uniform(2, 10, 8),
            rng.uniform(-90, 90, 8),
        ],
        axis=-1,
    ).astype(np.float32)
    m = np.asarray(pairwise_rotated_iou(jnp.array(boxes), jnp.array(boxes)))
    assert m.shape == (8, 8)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)
    np.testing.assert_allclose(m, m.T, atol=1e-4)


def test_rotated_nms_suppresses_overlapping():
    boxes = jnp.array(
        [
            [10.0, 10.0, 8.0, 4.0, 20.0],
            [10.5, 10.0, 8.0, 4.0, 22.0],  # heavy overlap with #0
            [40.0, 40.0, 8.0, 4.0, -30.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, _ = rotated_nms(boxes, scores, iou_threshold=0.3)
    assert np.asarray(keep).tolist() == [True, False, True]
