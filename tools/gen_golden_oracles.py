"""Generate golden-snapshot oracles for the contract queries whose
semantics are not SQL-expressible (greedy NMS, greedy IoU matching,
frozen-MLP refinement).

The expected outputs are computed here by the PYTEST-TRUSTED
single-process NumPy path — the shared kernels (kernels.postprocess,
metrics.greedy_match/ap_interp, oracle.extract_rows, refine.mlp_logits)
that tests/ verify against brute-force / hand-computed / hypothesis
oracles — over the deterministic sf0.01 driver testdata, WITHOUT Spark.
The snapshots land in tests/golden/sf0.01/<name>.parquet and the
contract's oracle_sql() reads them back with DuckDB's parquet_scan, so
the driver's correctness gate value-hashes these three queries like any
other instead of recording a rows-only check.

INDEPENDENT CROSS-CHECK: tests/test_independent_oracle.py re-derives
det_grouped_postprocess, detection_map, det_confusion_matrix and
compression_ratio with a deliberately different pure-Python (no-NumPy)
implementation and asserts agreement with these snapshots — the golden
chain is no longer anchored solely on the code under test.  After
regenerating, that test must still pass.

Regenerate (only when kernel semantics intentionally change):
    python tools/gen_golden_oracles.py && python -m pytest tests/test_independent_oracle.py -x -q
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "sf0.01",
)


def derived_dets() -> pd.DataFrame:
    """NumPy mirror of queries_detect._derived_dets (exact integer
    arithmetic, identical across engines)."""
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    e = ev["event_id"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "doc": (ev["user_id"].to_numpy(np.int64) % 50),
            "det_id": e,
            "cx": ((e * 37) % 800 + 50).astype(np.float64),
            "cy": ((e * 53) % 800 + 50).astype(np.float64),
            "w": ((e * 7) % 300 + 100).astype(np.float64),
            "h": ((e * 11) % 240 + 80).astype(np.float64),
            "conf": ((e * 13) % 100) / 100.0,
            "cls": np.floor((e % 20) / 2.0).astype(np.int64),
        }
    )


def gen_det_grouped_postprocess() -> pa.Table:
    from doclayout_yolo_spark.kernels import postprocess

    d = derived_dets().sort_values(["doc", "det_id"])
    out = {k: [] for k in ("doc", "x1", "y1", "x2", "y2", "conf", "cls")}
    for doc, grp in d.groupby("doc", sort=True):
        boxes = grp[["cx", "cy", "w", "h"]].to_numpy(dtype=np.float32)
        nc = 10
        scores = np.zeros((len(grp), nc), dtype=np.float32)
        scores[np.arange(len(grp)), grp["cls"].to_numpy()] = grp["conf"].to_numpy()
        r = postprocess(boxes, scores, conf_thres=0.25, iou_thres=0.7,
                        max_det=300, drop_classes=(2,))
        out["doc"].extend([int(doc)] * len(r))
        for c in ("x1", "y1", "x2", "y2"):
            out[c].extend(r[c].astype(float).tolist())
        out["conf"].extend(r["conf"].astype(float).tolist())
        out["cls"].extend(r["cls"].tolist())
    return pa.table(
        {
            "doc": pa.array(out["doc"], pa.int64()),
            "x1": pa.array(out["x1"], pa.float64()),
            "y1": pa.array(out["y1"], pa.float64()),
            "x2": pa.array(out["x2"], pa.float64()),
            "y2": pa.array(out["y2"], pa.float64()),
            "conf": pa.array(out["conf"], pa.float64()),
            "cls": pa.array(out["cls"], pa.int64()),
        }
    )


def gen_detection_map() -> pa.Table:
    from doclayout_yolo_spark.metrics import (
        IOU_THRESHOLDS,
        ap_interp,
        greedy_match,
    )

    d = derived_dets()
    d["doc"] = d["doc"].astype(str)
    x1 = d["cx"] - d["w"] / 2.0
    y1 = d["cy"] - d["h"] / 2.0
    boxed = pd.DataFrame(
        {
            "doc": d["doc"], "det_id": d["det_id"], "cls": d["cls"],
            "x1": x1, "y1": y1,
            "x2": d["cx"] + d["w"] / 2.0, "y2": d["cy"] + d["h"] / 2.0,
            "conf": d["conf"],
        }
    )
    dets = boxed[boxed["det_id"] % 2 == 0]
    gts = boxed[boxed["det_id"] % 2 == 1]
    gt_counts = gts.groupby("cls").size().to_dict()
    # per-doc greedy match (same kernel as the Spark applyInPandas stage)
    parts = []
    for doc, dg in dets.groupby("doc"):
        gg = gts[gts["doc"] == doc]
        tp = greedy_match(
            dg[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            dg["cls"].to_numpy(),
            gg[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            gg["cls"].to_numpy(),
        )
        p = dg[["doc", "det_id", "cls", "conf"]].copy()
        for i in range(tp.shape[1]):
            p[f"tp{i}"] = tp[:, i]
        parts.append(p)
    m = pd.concat(parts, ignore_index=True)
    t = len(IOU_THRESHOLDS)
    rows = {"cls": [], "iou_idx": [], "iou_thr": [], "ap": []}
    for cls in sorted(int(c) for c in gt_counts):
        n_gt = int(gt_counts[cls])
        grp = m[m["cls"] == cls].sort_values(
            ["conf", "doc", "det_id"], ascending=[False, True, True]
        )
        npreds = np.arange(1, len(grp) + 1, dtype=np.float64)
        for i in range(t):
            if len(grp) == 0:
                ap = 0.0
            else:
                ctp = grp[f"tp{i}"].to_numpy(dtype=np.float64).cumsum()
                ap = ap_interp(ctp / n_gt, ctp / npreds)
            rows["cls"].append(cls)
            rows["iou_idx"].append(i)
            rows["iou_thr"].append(float(IOU_THRESHOLDS[i]))
            rows["ap"].append(ap)
    return pa.table(
        {
            "cls": pa.array(rows["cls"], pa.int64()),
            "iou_idx": pa.array(rows["iou_idx"], pa.int32()),
            "iou_thr": pa.array(rows["iou_thr"], pa.float64()),
            "ap": pa.array(rows["ap"], pa.float64()),
        }
    )


def gen_det_confusion_matrix() -> pa.Table:
    from doclayout_yolo_spark.metrics import confusion_pairs

    nc = 10
    d = derived_dets()
    x1 = d["cx"] - d["w"] / 2.0
    y1 = d["cy"] - d["h"] / 2.0
    boxed = pd.DataFrame(
        {
            "doc": d["doc"], "det_id": d["det_id"], "cls": d["cls"],
            "conf": d["conf"],
            "x1": x1, "y1": y1,
            "x2": d["cx"] + d["w"] / 2.0, "y2": d["cy"] + d["h"] / 2.0,
        }
    )
    dets = boxed[boxed["det_id"] % 2 == 0]
    gts = boxed[boxed["det_id"] % 2 == 1]
    counts: dict[tuple[int, int], int] = {}
    for doc in sorted(boxed["doc"].unique()):
        dd = dets[dets["doc"] == doc]
        gg = gts[gts["doc"] == doc]
        for pc, gc in confusion_pairs(
            dd[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            dd["cls"].to_numpy(np.int64),
            dd["conf"].to_numpy(np.float64),
            gg[["x1", "y1", "x2", "y2"]].to_numpy(np.float32),
            gg["cls"].to_numpy(np.int64),
            nc,
        ):
            counts[(pc, gc)] = counts.get((pc, gc), 0) + 1
    rows = {"pred_cls": [], "gt_cls": [], "n": []}
    for pc in range(nc + 1):
        for gc in range(nc + 1):
            rows["pred_cls"].append(pc)
            rows["gt_cls"].append(gc)
            rows["n"].append(counts.get((pc, gc), 0))
    return pa.table(
        {
            "pred_cls": pa.array(rows["pred_cls"], pa.int64()),
            "gt_cls": pa.array(rows["gt_cls"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
        }
    )


def gen_refine_region_scores() -> pa.Table:
    from doclayout_yolo_spark.oracle import extract_rows
    from doclayout_yolo_spark.refine import mlp_logits
    from doclayout_yolo_spark.textfeat import N_FEATURES, feature_vector

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    pages = [
        (
            f"https://testdata.local/doc/{int(r.doc_id)}",
            (
                "<html><head><title>d</title></head><body>"
                '<nav><p><a href="/x">home</a></p></nav><h1>Doc '
                f"{int(r.doc_id)}</h1><p>{r.text}</p>"
                "<footer><p>copyright</p></footer></body></html>"
            ).encode("utf-8"),
        )
        for r in docs.itertuples()
    ]
    rows = {"url": [], "region_id": [], "cls": [], "refined_cls": [],
            "refined_score": []}
    for rec in extract_rows(pages):
        spans = rec["spans"]
        if not spans:
            continue
        feats = np.zeros((len(spans), N_FEATURES), dtype=np.float32)
        for i, s in enumerate(spans):
            region_text = rec["extracted_text"][s["start"]:s["end"]]
            feats[i] = feature_vector(
                region_text,
                (s["x1"], s["y1"], s["x2"], s["y2"]),
                (960.0, rec["page_h"]),
            )
        logits = mlp_logits(feats)
        for i, s in enumerate(spans):
            rows["url"].append(rec["url"])
            rows["region_id"].append(int(s["region_id"]))
            rows["cls"].append(int(s["cls"]))
            rows["refined_cls"].append(int(logits[i].argmax()))
            rows["refined_score"].append(float(logits[i].max()))
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "region_id": pa.array(rows["region_id"], pa.int32()),
            "cls": pa.array(rows["cls"], pa.int64()),
            "refined_cls": pa.array(rows["refined_cls"], pa.int64()),
            "refined_score": pa.array(rows["refined_score"], pa.float64()),
        }
    )


def gen_compression_ratio() -> pa.Table:
    """zlib(level 6) compressibility per document — single-process
    twin of queries_curation.compression_ratio's Arrow kernel."""
    import zlib

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")[["doc_id", "text"]]
    raw = [t.encode("utf-8") for t in docs["text"]]
    comp = [len(zlib.compress(b, 6)) for b in raw]
    n = [len(b) for b in raw]
    return pa.table(
        {
            "doc_id": pa.array(docs["doc_id"].astype("int64")),
            "n_bytes": pa.array(n, pa.int64()),
            "comp_bytes": pa.array(comp, pa.int64()),
            "ratio": pa.array(
                [round(c / b, 6) for c, b in zip(comp, n)], pa.float64()
            ),
        }
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, gen in (
        ("det_grouped_postprocess", gen_det_grouped_postprocess),
        ("detection_map", gen_detection_map),
        ("det_confusion_matrix", gen_det_confusion_matrix),
        ("refine_region_scores", gen_refine_region_scores),
        ("compression_ratio", gen_compression_ratio),
    ):
        table = gen()
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(table, path, compression="zstd")
        print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
