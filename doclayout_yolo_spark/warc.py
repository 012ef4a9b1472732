"""Minimal WARC (ISO 28500) record writer + parser — the container
format Common-Crawl ships pages in, so the engine can ingest crawl
archives directly instead of requiring pre-exploded tables.

Writer (:func:`build_warc`) and parser (:func:`parse_warc`) are
intentionally independent renderings of the spec: the writer composes
records field-by-field; the parser walks the byte stream
header-by-header and slices payloads by ``Content-Length`` — it never
splits on the ``WARC/1.0`` magic, so payloads that themselves contain
WARC headers (a crawled page ABOUT warc files) round-trip intact.

Scale shape: one WARC file maps to one task — ``records_from_warc``
is called per Arrow batch of (file) blobs inside ``mapInPandas``, so a
10^6-file crawl parses embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

CRLF = b"\r\n"


def build_warc(records: list[tuple[str, str, bytes]]) -> bytes:
    """records: (target_uri, warc_date_iso, payload) -> WARC file bytes.

    Each record: version line, named headers, blank line, payload,
    blank line x2 (ISO 28500 §4: two CRLFs terminate a record)."""
    out = bytearray()
    for uri, date, payload in records:
        out += b"WARC/1.0" + CRLF
        out += b"WARC-Type: response" + CRLF
        out += b"WARC-Target-URI: " + uri.encode("utf-8") + CRLF
        out += b"WARC-Date: " + date.encode("ascii") + CRLF
        out += b"Content-Length: " + str(len(payload)).encode("ascii") + CRLF
        out += CRLF
        out += payload
        out += CRLF + CRLF
    return bytes(out)


def parse_warc(raw: bytes) -> list[dict]:
    """WARC file bytes -> [{uri, date, payload}, ...] in record order.

    Walks headers until the blank line, reads exactly Content-Length
    payload bytes, then expects the record terminator.  Malformed
    records (bad version line, missing/invalid Content-Length, short
    payload) end the parse — everything before them is returned, the
    quarantine convention the extraction pipeline uses for PDFs."""
    recs: list[dict] = []
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate leading record separators
        while raw[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        eol = raw.find(CRLF, pos)
        if eol < 0 or not raw[pos:eol].startswith(b"WARC/"):
            break
        pos = eol + 2
        headers: dict[str, str] = {}
        ok = True
        while True:
            eol = raw.find(CRLF, pos)
            if eol < 0:
                ok = False
                break
            line = raw[pos:eol]
            pos = eol + 2
            if line == b"":
                break  # end of header block
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False
                break
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        if not ok:
            break
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            break
        if clen < 0:
            break  # malformed length: quarantine, never walk backwards
        if pos + clen > n:
            break
        payload = raw[pos : pos + clen]
        pos += clen
        recs.append(
            {
                "uri": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "payload": payload,
            }
        )
    return recs
