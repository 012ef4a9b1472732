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


def _det_struct(n: int) -> np.ndarray:
    return np.zeros(
        n,
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


def postprocess_batch(
    docs: list,
    conf_thres: float = 0.25,
    iou_thres: float = 0.7,
    max_det: int = 300,
    drop_classes: tuple[int, ...] = (),
    keep_classes: tuple[int, ...] | None = None,
    band_h: float = 32.0,
    max_wh: float = 7680.0,
) -> list:
    """Cross-document batched :func:`postprocess` — bit-identical
    results, one vectorized pass over a whole Arrow batch.

    ``docs`` is a list of ``(boxes_xywh (a,4), class_scores (a,nc))``
    pairs; the return value is ``[postprocess(*docs[i], ...)]`` —
    exactly, element for element (pinned by the differential tests in
    tests/test_batch_kernel.py).  Identity holds because every float
    op stays elementwise on the same values (concatenation changes
    layout, not bits), and every per-document ordering becomes a
    global stable ``lexsort`` whose PRIMARY key is the document id —
    within a document the secondary keys and stability reproduce the
    scalar path's stable argsorts.

    Three structural shortcuts keep the batched work proportional to
    the *surviving* detections, each with an identity argument:

    - Stage-1 truncation (``a > max_det`` anchors) happens in-batch:
      ``p_of`` is exactly the scalar path's stable ``argsort(-per_
      anchor)`` rank, so dropping rows with ``p_of >= max_det`` IS the
      scalar top-``k1`` anchor selection (real Common-Crawl pages at
      ~25 KB routinely exceed 300 anchors — routing them scalar made
      the batch path miss the pages that dominate kernel time).
    - The stage-2 flat sort runs only over above-``conf_thres`` pairs
      (plus class filters — both are pure masks, so folding them in
      commutes).  Scalar truncates the flat list to ``k2 = min(max_det,
      k1*nc)`` BEFORE masking, so a doc where more than ``k2`` pairs
      (among its stage-1 survivors) clear the threshold could lose
      above-conf pairs to truncation; those docs (counted per doc
      before sorting) route scalar.
    - The stage-2 output order within a doc — ``(-conf, flat-index)``
      — IS the order NMS's stable ``argsort(-scores)`` produces on it,
      so no third sort exists.

    The greedy-NMS data dependency is vectorized over *rank*
    (score-descending position within a doc): iteration ``r``
    processes the rank-r box of every document at once, so the
    Python-loop length is the max survivor count per *chunk*, not the
    document count.  Chunks are size-sorted so the padded ``(D, m, m)``
    IoU tensors stay near ``sum(m_d^2)`` instead of ``D * max(m)^2``.
    """
    out: list = [None] * len(docs)

    def _scalar(d: int) -> None:
        out[d] = postprocess(
            docs[d][0], docs[d][1], conf_thres, iou_thres, max_det,
            drop_classes, keep_classes, band_h,
        )

    idxs: list[int] = []
    for d, (_, sc) in enumerate(docs):
        a = len(np.asarray(sc))
        if a == 0:
            _scalar(d)
        else:
            idxs.append(d)
    if not idxs:
        return out

    A = np.concatenate(
        [np.asarray(docs[d][0], dtype=np.float32).reshape(-1, 4) for d in idxs]
    )
    S = np.concatenate(
        [np.asarray(docs[d][1], dtype=np.float32) for d in idxs]
    )
    counts = np.array([len(np.asarray(docs[d][1])) for d in idxs], dtype=np.int64)
    nd = len(idxs)
    nc = S.shape[1]
    doc_of = np.repeat(np.arange(nd, dtype=np.int64), counts)
    starts = np.zeros(nd, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    seq = np.arange(len(doc_of), dtype=np.int64)
    # original within-doc anchor index — carried explicitly because
    # stage-1 truncation below may drop rows, shifting positions
    aloc = seq - starts[doc_of]

    # ---- stage 1 (v10_topk): p_of is each anchor's rank under the
    # scalar path's stable argsort(-per_anchor); dropping rows with
    # p_of >= max_det IS the scalar top-k1 anchor selection.
    per_anchor = S.max(axis=1)
    order1 = np.lexsort((-per_anchor, doc_of))
    p_of = np.empty(len(seq), dtype=np.int64)
    p_of[order1] = aloc  # doc_of[order1] == doc_of (grouped)
    if (counts > max_det).any():
        m1 = p_of < max_det
        A, S, doc_of, p_of, aloc = A[m1], S[m1], doc_of[m1], p_of[m1], aloc[m1]
        counts = np.minimum(counts, max_det)

    # conf prefilter + stage-2 truncation-violation routing (see
    # docstring); counts is k1 here, so the threshold is min(max_det,
    # k1*nc) exactly as the scalar path truncates
    above = S > np.float32(conf_thres)
    above_per_doc = np.bincount(
        doc_of, weights=above.sum(axis=1), minlength=nd
    ).astype(np.int64)
    viol = above_per_doc > np.minimum(max_det, counts * nc)
    if viol.any():
        for g in np.flatnonzero(viol):
            _scalar(idxs[g])
        good = ~viol
        keep_rows = good[doc_of]
        A, S, above = A[keep_rows], S[keep_rows], above[keep_rows]
        p_of, aloc = p_of[keep_rows], aloc[keep_rows]
        idxs = [d for d, ok in zip(idxs, good) if ok]
        counts = counts[good]
        nd = len(idxs)
        if nd == 0:
            return out
        doc_of = np.repeat(np.arange(nd, dtype=np.int64), counts)

    # ---- stage 2: sort only the masked pairs by (doc, -conf, p*nc+cls)
    colmask = np.ones(nc, dtype=bool)
    if keep_classes is not None:
        colmask[:] = False
        for c in keep_classes:
            colmask[c] = True
    for c in drop_classes:
        colmask[c] = False
    rows, cols = np.nonzero(above & colmask)
    conf = S[rows, cols]
    doc2 = doc_of[rows]
    tie = p_of[rows] * nc + cols
    order2 = np.lexsort((tie, -conf, doc2))
    conf = conf[order2]
    cls = cols[order2].astype(np.int64)
    doc2 = doc2[order2]
    anchors_global = rows[order2]
    anchor_local = aloc[anchors_global]
    boxes = xywh2xyxy(A[anchors_global])

    # ---- per-class NMS, rank-vectorized across docs.  IoU rows are
    # computed lazily per rank (only the upper triangle the greedy loop
    # reads), and docs sit in survivor-count-descending order so rank r
    # touches just the k_r docs deep enough to have a rank-r box — the
    # element count is the true suppression-pair count, not D*m^2.
    shifted = boxes + cls.astype(np.float32)[:, None] * np.float32(max_wh)
    surv = np.bincount(doc2, minlength=nd).astype(np.int64)
    s3 = np.zeros(nd, dtype=np.int64)
    np.cumsum(surv[:-1], out=s3[1:])
    rank3 = np.arange(len(doc2), dtype=np.int64) - s3[doc2]
    kept_flags = np.zeros(len(doc2), dtype=bool)
    if len(doc2):
        size_order = np.argsort(-surv, kind="stable")
        survs = surv[size_order]                 # descending
        m = int(survs[0])
        gmap = np.empty(nd, dtype=np.int64)
        gmap[size_order] = np.arange(nd)
        gi = gmap[doc2]
        B = np.zeros((nd, m, 4), dtype=np.float32)
        B[gi, rank3] = shifted
        areas = np.maximum(B[..., 2] - B[..., 0], 0) * np.maximum(
            B[..., 3] - B[..., 1], 0
        )
        alive = np.zeros((nd, m), dtype=bool)
        alive[gi, rank3] = True
        kept = np.zeros((nd, m), dtype=bool)
        neg_survs = -survs
        eps = np.float32(1e-7)
        thres = np.float32(iou_thres)
        for r in range(m):
            k = int(np.searchsorted(neg_survs, -r, side="left"))  # docs with surv > r
            if k == 0:
                break
            cur = alive[:k, r]
            kept[:k, r] = cur
            if r + 1 >= m:
                continue
            Bk = B[:k, r + 1 :]
            lt = np.maximum(B[:k, r, None, :2], Bk[..., :2])
            rb = np.minimum(B[:k, r, None, 2:4], Bk[..., 2:4])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            union = areas[:k, r, None] + areas[:k, r + 1 :] - inter + eps
            alive[:k, r + 1 :] &= ~(((inter / union) > thres) & cur[:, None])
        # max_det cap: kept ranks are already in score-desc order
        kept &= np.cumsum(kept, axis=1) <= max_det
        kept_flags = kept[gi, rank3]

    fdoc = doc2[kept_flags]
    fb = boxes[kept_flags]
    fconf = conf[kept_flags]
    fcls = cls[kept_flags]
    fanchor = anchor_local[kept_flags]

    # ---- reading order (global lexsort, doc primary) + one shared
    # output buffer: per-doc results are views, not copies
    band = np.round(fb[:, 1] / np.float32(band_h)).astype(np.int64)
    order4 = np.lexsort((fanchor, fb[:, 1], fb[:, 0], band, fdoc))
    st = _det_struct(len(order4))
    st["anchor"] = fanchor[order4]
    st["x1"] = fb[order4, 0]
    st["y1"] = fb[order4, 1]
    st["x2"] = fb[order4, 2]
    st["y2"] = fb[order4, 3]
    st["conf"] = fconf[order4]
    st["cls"] = fcls[order4]
    per_doc_n = np.bincount(fdoc[order4], minlength=nd)
    bounds = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(per_doc_n, out=bounds[1:])
    for g, d in enumerate(idxs):
        out[d] = st[bounds[g] : bounds[g + 1]]
    return out


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
