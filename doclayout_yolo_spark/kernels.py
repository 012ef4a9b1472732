"""Pure-NumPy detection post-processing kernels.

These reproduce, numerically, the reference's post-processing contract
(confidence threshold -> IoU NMS -> class filter -> coordinate ops ->
reading order) without porting its code.  Reference semantics cited
per-function as ``file:line`` in /root/reference (observed behavior
only).  Everything here is deterministic: stable sorts with explicit
anchor-index tie-breaks, float32 box math.

No Spark imports — this module runs identically inside the single
process oracle and inside the Arrow-batched Spark UDF.
"""

from __future__ import annotations

import numpy as np

# Detection row contract: (x1, y1, x2, y2, conf, cls) — the 6-column
# shape asserted by the reference at engine/results.py:470-476 and the
# NMS output contract at utils/ops.py:204-207.
DET_COLS = ("x1", "y1", "x2", "y2", "conf", "cls")


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    """Center (cx,cy,w,h) -> corner (x1,y1,x2,y2).

    Semantics of utils/ops.py:382-400 (half-extent subtract/add).
    """
    x = np.asarray(x, dtype=np.float32)
    y = np.empty_like(x)
    hw = x[..., 2] / 2.0
    hh = x[..., 3] / 2.0
    y[..., 0] = x[..., 0] - hw
    y[..., 1] = x[..., 1] - hh
    y[..., 2] = x[..., 0] + hw
    y[..., 3] = x[..., 1] + hh
    return y


def xyxy2xywh(x: np.ndarray) -> np.ndarray:
    """Corner -> center form (utils/ops.py:402-419)."""
    x = np.asarray(x, dtype=np.float32)
    y = np.empty_like(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2.0
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2.0
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def clip_boxes(boxes: np.ndarray, h: float, w: float) -> np.ndarray:
    """Clamp xyxy boxes into [0,w]x[0,h] (utils/ops.py:305-324)."""
    b = np.asarray(boxes, dtype=np.float32).copy()
    b[..., 0] = np.clip(b[..., 0], 0, w)
    b[..., 1] = np.clip(b[..., 1], 0, h)
    b[..., 2] = np.clip(b[..., 2], 0, w)
    b[..., 3] = np.clip(b[..., 3], 0, h)
    return b


def scale_boxes(
    boxes: np.ndarray,
    from_shape: tuple[float, float],
    to_shape: tuple[float, float],
) -> np.ndarray:
    """Undo a letterbox transform: map boxes from a padded/resized frame
    back to original coordinates.

    Reproduces the exact constants of utils/ops.py:89-124:
    ``gain = min(h1/h0, w1/w0)``, ``pad = round((s1 - s0*gain)/2 - 0.1)``
    then subtract pad, divide by gain, clip.  (h, w) ordering.
    """
    h1, w1 = from_shape
    h0, w0 = to_shape
    gain = min(h1 / h0, w1 / w0)
    pad_w = round((w1 - w0 * gain) / 2 - 0.1)
    pad_h = round((h1 - h0 * gain) / 2 - 0.1)
    b = np.asarray(boxes, dtype=np.float32).copy()
    b[..., 0] -= pad_w
    b[..., 2] -= pad_w
    b[..., 1] -= pad_h
    b[..., 3] -= pad_h
    b[..., :4] /= np.float32(gain)
    return clip_boxes(b, h0, w0)


def box_area(boxes: np.ndarray) -> np.ndarray:
    b = np.asarray(boxes, dtype=np.float32)
    return np.maximum(b[..., 2] - b[..., 0], 0) * np.maximum(b[..., 3] - b[..., 1], 0)


def box_iou(a: np.ndarray, b: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Pairwise IoU matrix (N, M) — semantics of utils/metrics.py:53-72
    (``inter / (area_a + area_b - inter + eps)``)."""
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter + np.float32(eps)
    return inter / union


def nms(
    boxes: np.ndarray,
    scores: np.ndarray,
    iou_thres: float = 0.7,
) -> np.ndarray:
    """Greedy non-maximum suppression; returns kept indices in
    score-descending order.

    Emulates the ordering contract of ``torchvision.ops.nms`` as used at
    utils/ops.py:275-283 (suppress any box whose IoU with an already
    kept higher-scored box exceeds ``iou_thres``), with an explicit
    determinism pin: ties in score break by ascending input index
    (stable argsort on -score).
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    scores = np.asarray(scores, dtype=np.float32)
    n = len(scores)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(-scores, kind="stable")
    if n <= 2048:
        # fast path: one vectorized n x n IoU (<= 16 MB) beats a python
        # loop for typical per-document anchor counts
        iou = box_iou(boxes, boxes)
        keep: list[int] = []
        suppressed = np.zeros(n, dtype=bool)
        for i in order:
            if suppressed[i]:
                continue
            keep.append(int(i))
            suppressed |= iou[i] > iou_thres
            suppressed[i] = True  # self (already kept)
        return np.asarray(keep, dtype=np.int64)
    # memory-safe path for pathological pages: IoU computed lazily for
    # kept boxes vs the lower-scored tail — O(keep * n) work, O(n)
    # memory (at the 30k pre-NMS cap a full matrix would be 3.6 GB)
    b = boxes[order]
    areas = box_area(b)
    alive = np.ones(n, dtype=bool)
    keep = []
    eps = np.float32(1e-7)
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        tail = b[i + 1 :]
        lt = np.maximum(b[i, :2], tail[:, :2])
        rb = np.minimum(b[i, 2:4], tail[:, 2:4])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[:, 0] * wh[:, 1]
        iou = inter / (areas[i] + areas[i + 1 :] - inter + eps)
        alive[i + 1 :] &= ~(iou > iou_thres)
    return np.asarray(keep, dtype=np.int64)


def batched_class_nms(
    boxes: np.ndarray,
    scores: np.ndarray,
    cls: np.ndarray,
    iou_thres: float = 0.7,
    max_det: int = 300,
    max_wh: float = 7680.0,
) -> np.ndarray:
    """Per-class NMS via the class-offset trick of utils/ops.py:275-283
    (boxes shifted by ``cls * max_wh`` so different classes never
    overlap), then ``max_det`` cap (ops.py:283)."""
    boxes = np.asarray(boxes, dtype=np.float32)
    if len(boxes) == 0:
        return np.empty(0, dtype=np.int64)
    offset = np.asarray(cls, dtype=np.float32)[:, None] * np.float32(max_wh)
    keep = nms(boxes + offset, scores, iou_thres)
    return keep[:max_det]


def v10_topk(
    boxes_xywh: np.ndarray,
    class_scores: np.ndarray,
    max_det: int = 300,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Two-stage v10-style top-k post-processing.

    Numerically reproduces utils/ops.py:851-864: stage 1 keeps the
    top-``max_det`` anchors by per-anchor max class score; stage 2 takes
    the flat top-``max_det`` over the surviving (anchor, class) pairs
    with ``cls = idx % nc``, ``anchor = idx // nc``.  Two stages, not
    one — an anchor can emit multiple classes.

    Returns ``(boxes_xyxy, conf, cls, anchor_idx)`` sorted by conf desc
    with stable flat-index tie-break.
    """
    boxes_xywh = np.asarray(boxes_xywh, dtype=np.float32)
    class_scores = np.asarray(class_scores, dtype=np.float32)
    a, nc = class_scores.shape
    if a == 0:
        z4 = np.empty((0, 4), dtype=np.float32)
        z = np.empty(0, dtype=np.float32)
        return z4, z, np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # stage 1: top max_det anchors by max class score (stable tie-break
    # on anchor index).
    per_anchor = class_scores.max(axis=1)
    k1 = min(max_det, a)
    anchor_order = np.argsort(-per_anchor, kind="stable")[:k1]
    sub = class_scores[anchor_order]  # (k1, nc)
    # stage 2: flat top max_det over (anchor, class) pairs.
    flat = sub.reshape(-1)
    k2 = min(max_det, flat.shape[0])
    flat_order = np.argsort(-flat, kind="stable")[:k2]
    sub_anchor = flat_order // nc
    cls = (flat_order % nc).astype(np.int64)
    conf = flat[flat_order]
    anchors = anchor_order[sub_anchor].astype(np.int64)
    boxes = xywh2xyxy(boxes_xywh[anchors])
    return boxes, conf.astype(np.float32), cls, anchors


def reading_order(
    boxes: np.ndarray,
    anchor_idx: np.ndarray,
    band_h: float = 32.0,
) -> np.ndarray:
    """Top-left raster reading order (SURVEY §2.5 T8).

    Bands boxes by ``round(y1 / band_h)`` then orders by
    ``(band, x1, y1, anchor_idx)`` — anchor index is the final,
    always-distinct tie-break, so the sort is fully deterministic.
    Returns a permutation of ``range(len(boxes))``.
    """
    boxes = np.asarray(boxes, dtype=np.float32)
    n = len(boxes)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    band = np.round(boxes[:, 1] / np.float32(band_h)).astype(np.int64)
    return np.lexsort(
        (np.asarray(anchor_idx, dtype=np.int64), boxes[:, 1], boxes[:, 0], band)
    )


def postprocess(
    boxes_xywh: np.ndarray,
    class_scores: np.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    drop_classes: tuple[int, ...] = (),
    keep_classes: tuple[int, ...] | None = None,
    band_h: float = 32.0,
) -> np.ndarray:
    """Full fused post-processing pipeline for one document.

    Order of operations mirrors models/yolov10/predict.py:8-38:
    two-stage top-k (ops.py:851-864) -> xywh2xyxy -> confidence mask
    (predict.py:23) -> class filter (predict.py:24-25) -> per-class NMS
    (ops.py:275-283) -> reading-order sort (north-star T8 addition).

    Returns a structured array with fields
    ``(anchor, x1, y1, x2, y2, conf, cls)`` in reading order.
    """
    boxes, conf, cls, anchors = v10_topk(boxes_xywh, class_scores, max_det)
    mask = conf > np.float32(conf_thres)
    # class filters as equality ORs, not np.isin: the filter sets are
    # 1-3 ids and np.isin's sort-based machinery measured ~10% of the
    # whole extraction kernel on real pages (r5 stage profile)
    if keep_classes is not None:
        km = np.zeros(len(cls), dtype=bool)
        for c in keep_classes:
            km |= cls == c
        mask &= km
    for c in drop_classes:
        mask &= cls != c
    boxes, conf, cls, anchors = boxes[mask], conf[mask], cls[mask], anchors[mask]
    keep = batched_class_nms(boxes, conf, cls, iou_thres, max_det)
    boxes, conf, cls, anchors = boxes[keep], conf[keep], cls[keep], anchors[keep]
    order = reading_order(boxes, anchors, band_h)
    out = np.zeros(
        len(order),
        dtype=[
            ("anchor", np.int64),
            ("x1", np.float32),
            ("y1", np.float32),
            ("x2", np.float32),
            ("y2", np.float32),
            ("conf", np.float32),
            ("cls", np.int64),
        ],
    )
    out["anchor"] = anchors[order]
    out["x1"] = boxes[order, 0]
    out["y1"] = boxes[order, 1]
    out["x2"] = boxes[order, 2]
    out["y2"] = boxes[order, 3]
    out["conf"] = conf[order]
    out["cls"] = cls[order]
    return out
