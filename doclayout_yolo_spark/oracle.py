"""Single-process reference extractor (the byte-identity oracle).

Plain Python loop over (url, html) rows — the analog of the reference's
sequential ``stream_inference`` loop (engine/predictor.py:209-293) —
composing the same per-document core as the Spark kernel.  Golden tests
assert the Spark pipeline's ``extracted_text`` is byte-equal per url to
this oracle's output (SURVEY §5.1/§5.3).
"""

from __future__ import annotations

from collections.abc import Iterable

from .extract import Region, extract_document


def extract_rows(
    rows: Iterable[tuple[str, bytes]],
) -> list[dict]:
    """rows: iterable of (url, html_bytes).  Returns one dict per url:
    {url, extracted_text, spans, n_regions, n_blocks, page_h}."""
    out = []
    for url, html in rows:
        text, regions, meta = extract_document(html)
        out.append(
            {
                "url": url,
                "extracted_text": text,
                "spans": [_span_dict(r) for r in regions],
                "n_regions": meta["n_regions"],
                "n_blocks": meta["n_blocks"],
                "page_h": meta["page_h"],
            }
        )
    return out


def _span_dict(r: Region) -> dict:
    return {
        "region_id": r.region_id,
        "cls": r.cls,
        "name": r.name,
        "conf": r.conf,
        "x1": r.x1,
        "y1": r.y1,
        "x2": r.x2,
        "y2": r.y2,
        "start": r.start,
        "end": r.end,
    }
