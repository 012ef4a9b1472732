"""Metrics harness tests: greedy match vs hand-computed cases, Spark
match/AP pipeline vs a single-process NumPy oracle (SURVEY §5.4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from doclayout_yolo_spark.metrics import (
    IOU_THRESHOLDS,
    ap_interp,
    ap_per_class,
    greedy_match,
    match_table,
    summarize,
)


def test_greedy_match_hand_case():
    # det0 overlaps gt0 with IoU ~0.68, det1 is a duplicate of det0's
    # area with lower IoU, det2 is wrong class.
    det = np.array(
        [[0, 0, 10, 10], [2, 2, 12, 12], [0, 0, 10, 10]], dtype=np.float32
    )
    det_cls = np.array([1, 1, 2])
    gt = np.array([[0, 0, 10, 12]], dtype=np.float32)
    gt_cls = np.array([1])
    tp = greedy_match(det, det_cls, gt, gt_cls)
    # IoU(det0, gt0) = 100/120 = 0.833; det1 vs gt: inter 8x8=64... area
    # checks: only det0 matches at 0.5..0.8; gt matched once.
    assert tp[0, 0] and not tp[1, 0] and not tp[2, 0]
    assert tp[:, IOU_THRESHOLDS.tolist().index(0.8)].tolist() == [True, False, False]
    assert not tp[0, -1]  # 0.95 > 0.833


def test_greedy_match_each_side_once():
    # two dets both overlapping one gt: exactly one wins (each side
    # matched at most once); the winner is the lowest det index, per
    # the reference's np.unique gt-dedup (see
    # test_greedy_match_gt_dedup_keeps_lowest_det_index)
    det = np.array([[0, 0, 10, 10], [0, 0, 10, 11]], dtype=np.float32)
    det_cls = np.array([1, 1])
    gt = np.array([[0, 0, 10, 11]], dtype=np.float32)
    gt_cls = np.array([1])
    tp = greedy_match(det, det_cls, gt, gt_cls)
    assert tp[:, 0].sum() == 1 and tp[0, 0]


def _fixture(n_docs=12, seed=3):
    rng = np.random.RandomState(seed)
    det_rows, gt_rows = [], []
    gt_counts: dict[int, int] = {}
    det_id = 0
    for d in range(n_docs):
        doc = f"doc{d}"
        for g in range(rng.randint(2, 6)):
            x, y = rng.rand(2) * 400
            w, h = rng.rand(2) * 100 + 40
            cls = int(rng.randint(0, 3))
            gt_rows.append((doc, g, float(x), float(y), float(x + w), float(y + h), cls))
            gt_counts[cls] = gt_counts.get(cls, 0) + 1
            # jittered detection (sometimes missing / wrong class)
            if rng.rand() < 0.85:
                dx, dy = (rng.rand(2) - 0.5) * 30
                ccls = cls if rng.rand() < 0.8 else int(rng.randint(0, 3))
                det_rows.append(
                    (doc, det_id, float(x + dx), float(y + dy),
                     float(x + w + dx), float(y + h + dy),
                     float(rng.rand()), ccls)
                )
                det_id += 1
        for _ in range(rng.randint(0, 3)):  # false positives
            x, y = rng.rand(2) * 400
            det_rows.append(
                (doc, det_id, float(x), float(y), float(x + 50), float(y + 50),
                 float(rng.rand()), int(rng.randint(0, 3)))
            )
            det_id += 1
    det_pdf = pd.DataFrame(
        det_rows, columns=["doc", "det_id", "x1", "y1", "x2", "y2", "conf", "cls"]
    )
    gt_pdf = pd.DataFrame(
        gt_rows, columns=["doc", "gt_id", "x1", "y1", "x2", "y2", "cls"]
    )
    return det_pdf, gt_pdf, gt_counts


def _numpy_oracle(det_pdf, gt_pdf, gt_counts):
    """Single-process mAP: same kernel semantics, independent plumbing."""
    tps, confs, clss = [], [], []
    for doc, dets in det_pdf.groupby("doc"):
        gts = gt_pdf[gt_pdf["doc"] == doc]
        tp = greedy_match(
            dets[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            dets["cls"].to_numpy(),
            gts[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            gts["cls"].to_numpy(),
        )
        tps.append(tp)
        confs.append(dets["conf"].to_numpy())
        clss.append(dets["cls"].to_numpy())
    tp = np.concatenate(tps)
    conf = np.concatenate(confs)
    cls = np.concatenate(clss)
    order = np.argsort(-conf, kind="stable")
    tp, conf, cls = tp[order], conf[order], cls[order]
    out = {}
    for c in sorted(set(cls.tolist())):
        n_gt = gt_counts.get(int(c), 0)
        if n_gt == 0:
            continue
        m = cls == c
        for i in range(tp.shape[1]):
            ctp = np.cumsum(tp[m, i])
            npreds = np.arange(1, m.sum() + 1)
            out[(int(c), i)] = ap_interp(ctp / n_gt, ctp / npreds)
    return out


def test_spark_map_matches_numpy_oracle(spark):
    det_pdf, gt_pdf, gt_counts = _fixture()
    dets = spark.createDataFrame(det_pdf)
    gts = spark.createDataFrame(gt_pdf)
    matches = match_table(dets, gts)
    ap_df = ap_per_class(matches, gt_counts).toPandas()
    oracle = _numpy_oracle(det_pdf, gt_pdf, gt_counts)
    assert len(ap_df) == len(oracle)
    for _, row in ap_df.iterrows():
        want = oracle[(int(row["cls"]), int(row["iou_idx"]))]
        assert abs(row["ap"] - want) < 1e-9, (row["cls"], row["iou_idx"])
    s = summarize(ap_df)
    assert 0.0 < s["map50_95"] <= s["map50"] <= 1.0


def test_perfect_detections_give_ap_one(spark):
    gt_pdf = pd.DataFrame(
        [("d0", 0, 10.0, 10.0, 100.0, 100.0, 1),
         ("d0", 1, 200.0, 200.0, 300.0, 320.0, 2)],
        columns=["doc", "gt_id", "x1", "y1", "x2", "y2", "cls"],
    )
    det_pdf = gt_pdf.rename(columns={"gt_id": "det_id"}).copy()
    det_pdf["conf"] = [0.9, 0.8]
    dets = spark.createDataFrame(det_pdf)
    gts = spark.createDataFrame(gt_pdf)
    ap_df = ap_per_class(match_table(dets, gts), {1: 1, 2: 1}).toPandas()
    s = summarize(ap_df)
    # the appended (recall=1, precision=0) sentinel + duplicate-x
    # np.interp behavior caps "perfect" AP just under 1.0 — identical
    # to the reference's 101-point formula, so pin ~0.99, not 1.0
    assert s["map50"] > 0.99
    assert s["map50_95"] > 0.99


def test_gt_only_class_counts_as_ap_zero(spark):
    # class 7 has ground truth but zero detections: the reference
    # zero-initializes ap over unique target classes, so it must appear
    # with ap=0 for every threshold (and drag the mAP mean down).
    gt_pdf = pd.DataFrame(
        [("d0", 0, 10.0, 10.0, 100.0, 100.0, 1),
         ("d0", 1, 200.0, 200.0, 300.0, 320.0, 7)],
        columns=["doc", "gt_id", "x1", "y1", "x2", "y2", "cls"],
    )
    det_pdf = pd.DataFrame(
        [("d0", 0, 10.0, 10.0, 100.0, 100.0, 0.9, 1)],
        columns=["doc", "det_id", "x1", "y1", "x2", "y2", "conf", "cls"],
    )
    ap_df = ap_per_class(
        match_table(spark.createDataFrame(det_pdf), spark.createDataFrame(gt_pdf)),
        {1: 1, 7: 1},
    ).toPandas()
    cls7 = ap_df[ap_df["cls"] == 7]
    assert len(cls7) == len(IOU_THRESHOLDS)
    assert (cls7["ap"] == 0.0).all()
    s = summarize(ap_df)
    assert s["map50"] < 0.6  # (≈1 + 0) / 2


def test_confusion_matrix_accepts_gt_id_shaped_gts(spark):
    # match_table's gt contract uses gt_id; confusion_matrix must take
    # the same shape (aliased internally) instead of demanding det_id
    from doclayout_yolo_spark.metrics import confusion_matrix

    det_pdf, gt_pdf, _ = _fixture()
    dets = spark.createDataFrame(det_pdf)
    via_gt_id = confusion_matrix(
        dets, spark.createDataFrame(gt_pdf), nc=3
    ).toPandas()
    via_det_id = confusion_matrix(
        dets,
        spark.createDataFrame(gt_pdf.rename(columns={"gt_id": "det_id"})),
        nc=3,
    ).toPandas()
    key = ["pred_cls", "gt_cls"]
    assert via_gt_id.sort_values(key).reset_index(drop=True).equals(
        via_det_id.sort_values(key).reset_index(drop=True)
    )
    assert len(via_gt_id) == 16  # (nc+1)^2 padded cells


def test_greedy_match_gt_dedup_keeps_lowest_det_index():
    # two same-class dets, each individually matched after det-dedup,
    # both claiming the SAME gt: the reference keeps the lowest det
    # index (np.unique value-ordering), not the higher-IoU one.
    # det0: IoU(gt0)=10/12≈0.833. det1: IoU(gt0)=11/12≈0.917 (higher).
    det = np.array([[0, 0, 10, 10], [0, 0, 10, 11]], dtype=np.float32)
    det_cls = np.array([1, 1])
    gt = np.array([[0, 0, 10, 12]], dtype=np.float32)
    gt_cls = np.array([1])
    tp = greedy_match(det, det_cls, gt, gt_cls)
    i05 = 0
    assert tp[0, i05] and not tp[1, i05]


def test_confusion_pairs_hand_case():
    from doclayout_yolo_spark.metrics import confusion_pairs

    nc = 3
    # det0: cls1, overlaps gt0 (cls1) -> diagonal hit
    # det1: cls2, overlaps gt1 (cls0) -> class confusion (matching is
    #       class-agnostic at IoU 0.45)
    # det2: cls0, overlaps nothing -> (0, background)
    # det3: conf below 0.25 -> dropped entirely
    # gt2: cls2, matched by nothing -> (background, 2)
    det = np.array(
        [[0, 0, 10, 10], [100, 100, 110, 110], [300, 300, 310, 310],
         [0, 0, 10, 10]], dtype=np.float32)
    det_cls = np.array([1, 2, 0, 1])
    det_conf = np.array([0.9, 0.8, 0.7, 0.1])
    gt = np.array(
        [[0, 0, 10, 11], [100, 100, 110, 111], [200, 200, 210, 210]],
        dtype=np.float32)
    gt_cls = np.array([1, 0, 2])
    pairs = confusion_pairs(det, det_cls, det_conf, gt, gt_cls, nc)
    assert sorted(pairs) == sorted([(1, 1), (2, 0), (nc, 2), (0, nc)])


def test_confusion_pairs_no_match_skips_fp_loop():
    from doclayout_yolo_spark.metrics import confusion_pairs

    # reference quirk: when NO det-gt pair clears the IoU threshold,
    # unmatched detections are NOT counted as background FP
    det = np.array([[0, 0, 10, 10]], dtype=np.float32)
    gt = np.array([[500, 500, 510, 510]], dtype=np.float32)
    pairs = confusion_pairs(
        det, np.array([1]), np.array([0.9]), gt, np.array([2]), nc=3)
    assert pairs == [(3, 2)]  # only the background-FN row for the gt
