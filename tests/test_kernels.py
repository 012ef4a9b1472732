"""Unit tests for the pure-NumPy post-processing kernels (SURVEY §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from doclayout_yolo_spark import kernels as K


def test_xywh_xyxy_roundtrip():
    rng = np.random.RandomState(0)
    xywh = np.abs(rng.rand(50, 4)).astype(np.float32) * 100 + 1
    back = K.xyxy2xywh(K.xywh2xyxy(xywh))
    np.testing.assert_allclose(back, xywh, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_known():
    out = K.xywh2xyxy(np.array([[10.0, 20.0, 4.0, 6.0]]))
    np.testing.assert_allclose(out, [[8, 17, 12, 23]])


def test_clip_boxes():
    b = np.array([[-5.0, -5.0, 200.0, 300.0]])
    np.testing.assert_allclose(K.clip_boxes(b, 100, 150), [[0, 0, 150, 100]])


def test_scale_boxes_constants():
    # 1000x800 original letterboxed into 640x640: gain = min(640/1000,
    # 640/800) = 0.64, pad_w = round((640 - 800*0.64)/2 - 0.1) =
    # round(63.9) = 64, pad_h = round((640-1000*.64)/2 - .1) = round(-0.1) = 0
    b = np.array([[64.0, 0.0, 704.0, 640.0]])
    out = K.scale_boxes(b, from_shape=(640, 640), to_shape=(1000, 800))
    np.testing.assert_allclose(out, [[0, 0, 800, 1000]], atol=1e-3)


def test_box_iou():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = K.box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-5)
    # symmetry
    np.testing.assert_allclose(K.box_iou(b, a)[:, 0], iou, atol=1e-7)


def _brute_force_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep, removed = [], set()
    for i in order:
        if i in removed:
            continue
        keep.append(i)
        for j in order:
            if j not in removed and j != i:
                if K.box_iou(boxes[i : i + 1], boxes[j : j + 1])[0, 0] > thr:
                    removed.add(j)
        removed.add(i)
    return np.array(keep)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    n = 60
    xy = rng.rand(n, 2).astype(np.float32) * 100
    wh = rng.rand(n, 2).astype(np.float32) * 40 + 5
    boxes = np.concatenate([xy, xy + wh], axis=1)
    scores = rng.rand(n).astype(np.float32)
    np.testing.assert_array_equal(
        K.nms(boxes, scores, 0.5), _brute_force_nms(boxes, scores, 0.5)
    )


def test_nms_tie_break_is_index_order():
    boxes = np.array([[0.0, 0, 10, 10], [100, 100, 110, 110]])
    scores = np.array([0.5, 0.5], dtype=np.float32)
    np.testing.assert_array_equal(K.nms(boxes, scores, 0.5), [0, 1])


def test_class_offset_nms_keeps_cross_class_overlaps():
    boxes = np.array([[0.0, 0, 10, 10], [0, 0, 10, 10]])
    scores = np.array([0.9, 0.8], dtype=np.float32)
    same = K.batched_class_nms(boxes, scores, np.array([1, 1]))
    diff = K.batched_class_nms(boxes, scores, np.array([1, 2]))
    assert len(same) == 1 and len(diff) == 2


def _naive_v10(boxes_xywh, scores, max_det):
    a, nc = scores.shape
    per_anchor = scores.max(axis=1)
    anchors = np.argsort(-per_anchor, kind="stable")[:max_det]
    pairs = [
        (-scores[ai, c], i * nc + c, ai, c)
        for i, ai in enumerate(anchors)
        for c in range(nc)
    ]
    pairs.sort()
    pairs = pairs[:max_det]
    out_anchor = np.array([p[2] for p in pairs], dtype=np.int64)
    out_cls = np.array([p[3] for p in pairs], dtype=np.int64)
    out_conf = np.array([-p[0] for p in pairs], dtype=np.float32)
    return K.xywh2xyxy(boxes_xywh[out_anchor]), out_conf, out_cls, out_anchor


@pytest.mark.parametrize("seed,max_det", [(0, 5), (1, 20), (2, 300)])
def test_v10_topk_matches_naive(seed, max_det):
    rng = np.random.RandomState(seed)
    a, nc = 40, 10
    boxes = rng.rand(a, 4).astype(np.float32) * 100
    scores = rng.rand(a, nc).astype(np.float32)
    got = K.v10_topk(boxes, scores, max_det)
    want = _naive_v10(boxes, scores, max_det)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-6)


def test_v10_topk_is_multilabel():
    # one anchor with two strong classes must emit two detections
    boxes = np.array([[50.0, 50, 20, 20]], dtype=np.float32)
    scores = np.zeros((1, 10), dtype=np.float32)
    scores[0, 3] = 0.9
    scores[0, 7] = 0.8
    _, conf, cls, anchors = K.v10_topk(boxes, scores, max_det=300)
    assert list(cls[:2]) == [3, 7] and list(anchors[:2]) == [0, 0]


def test_reading_order_raster():
    # 2x2 grid, given shuffled: order must be row-major (top-left first)
    boxes = np.array(
        [
            [500.0, 500, 600, 540],  # bottom-right
            [100.0, 100, 200, 140],  # top-left
            [500.0, 100, 600, 140],  # top-right
            [100.0, 500, 200, 540],  # bottom-left
        ],
        dtype=np.float32,
    )
    order = K.reading_order(boxes, np.arange(4))
    np.testing.assert_array_equal(order, [1, 2, 3, 0])


def test_reading_order_band_tolerance():
    # slightly different y within a band: x wins inside the band
    boxes = np.array(
        [[300.0, 104, 400, 140], [100.0, 96, 200, 140]], dtype=np.float32
    )
    order = K.reading_order(boxes, np.arange(2), band_h=32)
    np.testing.assert_array_equal(order, [1, 0])


def test_postprocess_drops_class_and_sorts():
    rng = np.random.RandomState(7)
    boxes = np.zeros((6, 4), dtype=np.float32)
    scores = np.zeros((6, 10), dtype=np.float32)
    for i in range(6):
        boxes[i] = [100, 100 + 200 * i, 300, 60]  # xywh, vertically stacked
        scores[i, 2 if i % 2 else 1] = 0.9  # alternate abandon / plain
    out = K.postprocess(boxes, scores, drop_classes=(2,))
    assert len(out) == 3
    assert all(out["cls"] == 1)
    assert list(out["y1"]) == sorted(out["y1"])
