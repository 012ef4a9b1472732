"""HTTP/1.x response-envelope parsing for crawl payloads.

Common-Crawl WARC ``response`` records store the raw HTTP response the
crawler received: a status line, header block, and body that may be
chunked (``Transfer-Encoding: chunked``) and/or compressed
(``Content-Encoding: gzip``/``deflate``), with the page's charset
frequently declared only in the ``Content-Type`` header.  The
reference consumes arbitrary real-world files as-is
(doclayout_yolo/data/loaders.py:320-370); this module is the engine's
equivalent obligation for the transport layer: strip the envelope,
de-chunk, decompress (bounded — a hostile body must quarantine, not
OOM the executor), and surface the transport charset label so the
decoder can honor the WHATWG precedence BOM > transport > meta
prescan.

Pure stdlib, shared verbatim by the Spark kernel and the oracle side
of every contract query that exercises it, so byte-identity of the
extracted text is preserved by construction.
"""

from __future__ import annotations

import re
import zlib

from .extract import MAX_INFLATED_BYTES, inflate_if_gzip

# a WARC response payload begins with the HTTP status line; HTTP/0.9
# has no envelope at all and anything else is not an envelope either
_STATUS_LINE_RE = re.compile(rb"^HTTP/\d\.\d[ \t]+(\d{3})[ \t]*([^\r\n]*)")
_CT_CHARSET_RE = re.compile(
    r"""charset[ \t]*=[ \t]*"?[ \t]*([a-zA-Z0-9._\-]{1,32})""", re.I
)


def is_http_response(raw: bytes) -> bool:
    """True when the payload starts with an HTTP/1.x status line."""
    return _STATUS_LINE_RE.match(raw) is not None


def _split_head(raw: bytes) -> tuple[bytes, bytes]:
    """(header block, body) split on the first blank line; tolerates
    lone-LF servers.  No blank line at all -> the whole payload is the
    head and the body is empty (a headers-only 204/304 response)."""
    crlf = raw.find(b"\r\n\r\n")
    lf = raw.find(b"\n\n")
    if crlf == -1 and lf == -1:
        return raw, b""
    if crlf != -1 and (lf == -1 or crlf <= lf):
        return raw[:crlf], raw[crlf + 4 :]
    return raw[:lf], raw[lf + 2 :]


def _dechunk(body: bytes) -> bytes:
    """Decode a ``Transfer-Encoding: chunked`` body: hex chunk sizes
    (chunk extensions after ';' ignored), terminated by a zero chunk;
    trailer headers after the zero chunk are skipped.  Truncated or
    malformed framing raises ValueError into the per-document
    quarantine wrapper; total output is bounded by
    MAX_INFLATED_BYTES."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        sep = 2
        lf = body.find(b"\n", pos)
        if eol == -1 or (lf != -1 and lf < eol):
            eol, sep = lf, 1
        if eol == -1:
            raise ValueError("chunked body: missing size line")
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"chunked body: bad size {size_tok!r}") from e
        pos = eol + sep
        if size == 0:
            return bytes(out)  # trailers (if any) intentionally skipped
        if pos + size > n:
            raise ValueError("chunked body: truncated chunk data")
        out += body[pos : pos + size]
        if len(out) > MAX_INFLATED_BYTES:
            raise ValueError(
                f"chunked body inflates past {MAX_INFLATED_BYTES} bytes"
            )
        pos += size
        # chunk data is followed by CRLF (tolerate lone LF)
        if body[pos : pos + 2] == b"\r\n":
            pos += 2
        elif body[pos : pos + 1] == b"\n":
            pos += 1
        else:
            raise ValueError("chunked body: missing chunk terminator")


def _inflate_deflate(body: bytes) -> bytes:
    """``Content-Encoding: deflate`` — zlib-wrapped per the RFC, but
    a long tail of real servers send raw DEFLATE; try both.  Bounded
    like the gzip path."""
    for wbits in (zlib.MAX_WBITS, -zlib.MAX_WBITS):
        d = zlib.decompressobj(wbits)
        try:
            out = d.decompress(body, MAX_INFLATED_BYTES + 1)
        except zlib.error:
            continue
        if len(out) > MAX_INFLATED_BYTES:
            raise ValueError(
                f"deflate payload inflates past {MAX_INFLATED_BYTES} bytes"
            )
        return out
    raise ValueError("deflate payload: not zlib-wrapped or raw DEFLATE")


def parse_http_response(raw: bytes) -> dict:
    """Parse one HTTP/1.x response.  Returns ``{status, reason,
    headers, body, charset}`` where ``headers`` is a dict with
    lowercase names (duplicates comma-joined per RFC 9110 §5.2),
    ``body`` is the de-chunked, decompressed payload bytes and
    ``charset`` is the raw lowercase Content-Type charset label (or
    ``None``).  Malformed framing raises ValueError — the caller's
    per-document quarantine boundary."""
    m = _STATUS_LINE_RE.match(raw)
    if m is None:
        raise ValueError("not an HTTP response payload")
    head, body = _split_head(raw)
    headers: dict[str, str] = {}
    last: str | None = None
    for line in head.splitlines()[1:]:
        if not line.strip():
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            # obs-fold continuation line (RFC 9112 §5.2)
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        k, _, v = line.partition(b":")
        if not _:
            continue  # junk line — tolerate, real crawls contain them
        key = k.strip().decode("latin-1").lower()
        val = v.strip().decode("latin-1")
        headers[key] = headers[key] + ", " + val if key in headers else val
        last = key
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    ce = headers.get("content-encoding", "").lower().strip()
    if ce in ("gzip", "x-gzip"):
        # tolerant: servers famously declare gzip on identity bodies;
        # inflate_if_gzip passes non-gzip bytes through untouched
        body = inflate_if_gzip(body)
    elif ce == "deflate":
        body = _inflate_deflate(body)
    elif ce in ("", "identity"):
        pass
    else:
        raise ValueError(f"unsupported content-encoding {ce!r}")
    charset = None
    cm = _CT_CHARSET_RE.search(headers.get("content-type", ""))
    if cm is not None:
        charset = cm.group(1).lower()
    return {
        "status": int(m.group(1)),
        "reason": m.group(2).decode("latin-1"),
        "headers": headers,
        "body": body,
        "charset": charset,
    }


def build_http_response(
    body: bytes,
    *,
    status: int = 200,
    reason: str = "OK",
    content_type: str = "text/html",
    charset: str | None = None,
    chunked: bool = False,
    content_encoding: str | None = None,
    chunk_size: int = 7,
    extra_headers: tuple[tuple[str, str], ...] = (),
) -> bytes:
    """Deterministic HTTP/1.1 response writer for fixtures (the WARC
    twin of warc.build_warc).  gzip uses mtime=0 so output bytes are
    reproducible; chunked framing exercises chunk extensions and a
    trailer header on purpose (parsers must skip both)."""
    if content_encoding == "gzip":
        import gzip  # noqa: PLC0415

        body = gzip.compress(body, mtime=0)
    elif content_encoding == "deflate":
        body = zlib.compress(body)
    elif content_encoding is not None:
        raise ValueError(f"unsupported content_encoding {content_encoding!r}")
    ct = content_type + (f"; charset={charset}" if charset else "")
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {ct}"]
    if content_encoding:
        lines.append(f"Content-Encoding: {content_encoding}")
    lines.extend(f"{k}: {v}" for k, v in extra_headers)
    if chunked:
        lines.append("Transfer-Encoding: chunked")
        parts = [
            body[i : i + chunk_size] for i in range(0, len(body), chunk_size)
        ] or [b""]
        framed = bytearray()
        for i, p in enumerate(parts):
            ext = b";x=1" if i == 0 else b""  # first chunk carries an ext
            framed += f"{len(p):x}".encode() + ext + b"\r\n" + p + b"\r\n"
        framed += b"0\r\nX-Trailer: t\r\n\r\n"  # trailer must be skipped
        payload = bytes(framed)
    else:
        lines.append(f"Content-Length: {len(body)}")
        payload = body
    head = "\r\n".join(lines).encode("latin-1") + b"\r\n\r\n"
    return head + payload
