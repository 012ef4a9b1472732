"""Committed golden snapshot: pins the extractor's CURRENT behavior.

The byte-identity tests compare the Spark pipeline against the
in-repo oracle — but both share extract.py, so an *unintentional*
semantic change would pass them silently.  This snapshot
(tests/golden/extracted_golden.json, sha256 of text + spans for 50
seeded fixture pages) fails loudly instead.

If a change to extraction semantics is INTENTIONAL, regenerate with:

    python - <<'PY'
    import hashlib, json
    from doclayout_yolo_spark.fixtures import generate_pages_pandas
    from doclayout_yolo_spark.oracle import extract_rows
    pdf = generate_pages_pandas(50)
    rows = extract_rows(zip(pdf["url"], pdf["html"]))
    snap = {r["url"]: {
        "text_sha256": hashlib.sha256(r["extracted_text"].encode()).hexdigest(),
        "n_regions": r["n_regions"], "n_blocks": r["n_blocks"],
        "spans_sha256": hashlib.sha256(
            json.dumps(r["spans"], sort_keys=True).encode()).hexdigest(),
    } for r in rows}
    json.dump(snap, open("tests/golden/extracted_golden.json", "w"),
              indent=0, sort_keys=True)
    PY

and say why in the commit message.
"""

from __future__ import annotations

import hashlib
import json
import os

from doclayout_yolo_spark.fixtures import generate_pages_pandas
from doclayout_yolo_spark.oracle import extract_rows

SNAP = os.path.join(os.path.dirname(__file__), "golden", "extracted_golden.json")


def test_extractor_matches_committed_snapshot():
    with open(SNAP) as f:
        snap = json.load(f)
    pdf = generate_pages_pandas(50)
    rows = extract_rows(zip(pdf["url"], pdf["html"]))
    assert len(rows) == len(snap)
    for r in rows:
        want = snap[r["url"]]
        got_text = hashlib.sha256(r["extracted_text"].encode()).hexdigest()
        got_spans = hashlib.sha256(
            json.dumps(r["spans"], sort_keys=True).encode()
        ).hexdigest()
        assert got_text == want["text_sha256"], r["url"]
        assert got_spans == want["spans_sha256"], r["url"]
        assert r["n_regions"] == want["n_regions"]
        assert r["n_blocks"] == want["n_blocks"]


PDF_SNAP = os.path.join(
    os.path.dirname(__file__), "golden", "pdf_extracted_golden.json"
)


def test_pdf_extractor_matches_committed_snapshot():
    # same drift guard for the PDF leg (regenerate analogously with
    # fixtures.make_pdf_rows(np.arange(50)) when semantics change
    # INTENTIONALLY)
    import numpy as np

    from doclayout_yolo_spark.fixtures import make_pdf_rows

    with open(PDF_SNAP) as f:
        snap = json.load(f)
    pdf = make_pdf_rows(np.arange(50))
    rows = extract_rows(
        zip(pdf["url"], (bytes(h) for h in pdf["html"]))
    )
    assert len(rows) == len(snap)
    for r in rows:
        want = snap[r["url"]]
        got_text = hashlib.sha256(r["extracted_text"].encode()).hexdigest()
        got_spans = hashlib.sha256(
            json.dumps(r["spans"], sort_keys=True).encode()
        ).hexdigest()
        assert got_text == want["text_sha256"], r["url"]
        assert got_spans == want["spans_sha256"], r["url"]
        assert r["n_regions"] == want["n_regions"] > 0
        assert r["n_blocks"] == want["n_blocks"]
