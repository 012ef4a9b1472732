"""Differential pins for the cross-document batched detector path.

The contract: ``postprocess_batch(docs) == [postprocess(*d) for d in
docs]`` and ``extract_documents(raws) == [extract_document(r) for r
in raws]`` — EXACTLY, element for element, including error rows.  The
batched path is the Spark kernel's hot path; the scalar path is the
oracle (byte-identity anchor), so these tests are what lets the
pipeline use the fast path at all.
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from doclayout_yolo_spark import fixtures as fx
from doclayout_yolo_spark.extract import (
    ABANDON_CLS,
    CONF_THRES,
    IOU_THRES,
    MAX_DET,
    extract_document,
    extract_documents,
)
from doclayout_yolo_spark.kernels import postprocess, postprocess_batch


def _scalar_results(payloads):
    out = []
    for p in payloads:
        try:
            text, regions, meta = extract_document(p)
            out.append((text, regions, meta, None))
        except Exception as e:  # noqa: BLE001
            out.append(("", [], None, f"{type(e).__name__}: {e}"[:500]))
    return out


def _assert_docs_equal(scalar, batch):
    assert len(scalar) == len(batch)
    for i, (s, b) in enumerate(zip(scalar, batch)):
        st_, sr, sm, se = s
        bt, br, bm, be = b
        assert st_ == bt, f"doc {i}: text differs"
        assert se == be, f"doc {i}: error differs: {se!r} vs {be!r}"
        assert len(sr) == len(br), f"doc {i}: region count differs"
        for ra, rb in zip(sr, br):
            assert ra == rb, f"doc {i}: region differs: {ra} vs {rb}"
        if sm is not None:
            for k in ("n_regions", "n_blocks", "page_h", "page_w", "n_proposals"):
                assert sm[k] == bm[k], f"doc {i}: meta[{k}] differs"


def _assert_dets_equal(a_list, b_list):
    assert len(a_list) == len(b_list)
    for i, (a, b) in enumerate(zip(a_list, b_list)):
        assert len(a) == len(b), f"doc {i}: det count {len(a)} vs {len(b)}"
        for f in ("anchor", "cls"):
            assert np.array_equal(a[f], b[f]), f"doc {i}: field {f}"
        for f in ("x1", "y1", "x2", "y2", "conf"):
            # bit-identity, not closeness
            assert np.array_equal(
                a[f].view(np.uint32), b[f].view(np.uint32)
            ), f"doc {i}: field {f} not bit-identical"


def test_extract_documents_matches_scalar_on_mixed_corpus():
    html_rows = fx.make_rows(range(120))
    pdf_rows = fx.make_pdf_rows(range(30))
    payloads = [bytes(h) for h in html_rows["html"]]
    payloads += [bytes(h) for h in pdf_rows["html"]]
    # poison, empty, gzip, binary junk — quarantine rows must match too
    payloads += [
        b"",
        b"%PDF-1.4 garbage",
        gzip.compress(payloads[0]),
        b"\x00\xff junk \x80",
        "plain text string payload",
    ]
    _assert_docs_equal(_scalar_results(payloads), extract_documents(payloads))


def test_extract_documents_stage_acc_keys():
    rows = fx.make_rows(range(8))
    acc: dict = {}
    extract_documents([bytes(h) for h in rows["html"]], acc)
    assert set(acc) == {"parse_s", "detect_s", "nms_s", "assemble_s"}
    assert all(v >= 0 for v in acc.values())


def _rand_docs(rng, n_docs, max_anchors, nc=10, tie_quant=None):
    docs = []
    for _ in range(n_docs):
        a = int(rng.integers(0, max_anchors + 1))
        cx = rng.uniform(0, 800, a)
        cy = rng.uniform(0, 4000, a)
        w = rng.uniform(1, 400, a)
        h = rng.uniform(1, 200, a)
        boxes = np.stack([cx, cy, w, h], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, (a, nc)).astype(np.float32)
        if tie_quant:
            # quantized scores force ties -> exercises every tie-break
            scores = np.round(scores * tie_quant) / np.float32(tie_quant)
        docs.append((boxes, scores))
    return docs


@pytest.mark.parametrize("tie_quant", [None, 4])
def test_postprocess_batch_random_differential(tie_quant):
    rng = np.random.default_rng(7 if tie_quant else 11)
    docs = _rand_docs(rng, 60, 120, tie_quant=tie_quant)
    scalar = [
        postprocess(b, s, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,))
        for b, s in docs
    ]
    batch = postprocess_batch(
        docs, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,)
    )
    _assert_dets_equal(scalar, batch)


def test_postprocess_batch_scalar_routes():
    """Edge docs mixed with ordinary ones: empty, > max_det anchors
    (stage-1 truncation, handled in-batch), and > k2 above-conf pairs
    (stage-2 truncation violation — the one remaining scalar route)."""
    rng = np.random.default_rng(3)
    docs = _rand_docs(rng, 10, 40)
    # stage-1 truncation doc: 400 anchors > MAX_DET
    docs.insert(2, next(iter(_rand_docs(rng, 1, 0))))  # empty doc
    big = _rand_docs(rng, 1, 0)
    a = 400
    boxes = rng.uniform(0, 500, (a, 4)).astype(np.float32)
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1
    docs.insert(5, (boxes, rng.uniform(0, 1, (a, 10)).astype(np.float32)))
    # stage-2 truncation-violation doc: 120 anchors, everything high-conf
    a = 120
    boxes = rng.uniform(0, 500, (a, 4)).astype(np.float32)
    boxes[:, 2:] = np.abs(boxes[:, 2:]) + 1
    docs.insert(7, (boxes, rng.uniform(0.5, 1, (a, 10)).astype(np.float32)))
    scalar = [
        postprocess(b, s, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,))
        for b, s in docs
    ]
    batch = postprocess_batch(
        docs, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,)
    )
    _assert_dets_equal(scalar, batch)
    del big


@pytest.mark.parametrize("tie_quant", [None, 4, 16])
def test_postprocess_batch_heavy_docs_stage1_truncation(tie_quant):
    """Docs straddling max_det anchors (250..900 vs 300) — stage-1
    truncation now runs IN-BATCH (p_of < max_det is the scalar top-k1
    selection); real ~25 KB pages routinely exceed 300 anchors, so
    this is the hot shape on crawl data."""
    rng = np.random.default_rng(42 if tie_quant else 43)
    docs = []
    for _ in range(30):
        a = int(rng.integers(250, 900))
        boxes = np.stack(
            [
                rng.uniform(0, 800, a),
                rng.uniform(0, 4000, a),
                rng.uniform(1, 400, a),
                rng.uniform(1, 200, a),
            ],
            axis=1,
        ).astype(np.float32)
        scores = rng.uniform(0, 1, (a, 10)).astype(np.float32)
        if tie_quant:
            scores = np.round(scores * tie_quant) / np.float32(tie_quant)
        docs.append((boxes, scores))
    scalar = [
        postprocess(b, s, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,))
        for b, s in docs
    ]
    batch = postprocess_batch(
        docs, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,)
    )
    _assert_dets_equal(scalar, batch)


def test_postprocess_batch_keep_classes():
    rng = np.random.default_rng(5)
    docs = _rand_docs(rng, 20, 60, tie_quant=8)
    scalar = [
        postprocess(
            b, s, CONF_THRES, IOU_THRES, MAX_DET, (2,), keep_classes=(0, 1, 5)
        )
        for b, s in docs
    ]
    batch = postprocess_batch(
        docs, CONF_THRES, IOU_THRES, MAX_DET, (2,), keep_classes=(0, 1, 5)
    )
    _assert_dets_equal(scalar, batch)


def test_postprocess_batch_all_empty():
    docs = [
        (np.zeros((0, 4), np.float32), np.zeros((0, 10), np.float32))
        for _ in range(5)
    ]
    for st_ in postprocess_batch(docs):
        assert len(st_) == 0


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(1, 12),
    max_anchors=st.integers(0, 50),
    quant=st.sampled_from([None, 2, 16]),
)
def test_postprocess_batch_property(seed, n_docs, max_anchors, quant):
    rng = np.random.default_rng(seed)
    docs = _rand_docs(rng, n_docs, max_anchors, tie_quant=quant)
    scalar = [
        postprocess(b, s, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,))
        for b, s in docs
    ]
    batch = postprocess_batch(
        docs, CONF_THRES, IOU_THRES, MAX_DET, (ABANDON_CLS,)
    )
    _assert_dets_equal(scalar, batch)
