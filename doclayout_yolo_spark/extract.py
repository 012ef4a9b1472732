"""Per-document layout-aware main-content extraction core.

HTML bytes -> DOM block list -> deterministic flow layout (box per
block) -> detection proposals (class-score vectors from tag priors +
link-density / text-density / keyword heuristics, in the spirit of
trafilatura/readability boilerplate stripping) -> the reference's
post-processing chain, numerically reproduced (two-stage top-k ->
confidence threshold -> per-class IoU NMS -> 'abandon' class filter ->
reading-order sort) -> (extracted_text, spans).

This module is pure Python/NumPy and **shared verbatim** by the
single-process oracle (oracle.py) and the Spark Arrow kernel
(pipeline.py): per-document computation depends only on the document's
own bytes — never on batch composition — which is the determinism
contract that makes extracted text byte-identical at any parallelism.

Reference semantics cited as file:line in /root/reference:
- proposal -> Results flow: engine/predictor.py:238-275,
  models/yolov10/predict.py:8-38
- detection row contract (x1,y1,x2,y2,conf,cls): utils/ops.py:204-207
- crop-per-region sink analog (our text spans): engine/results.py:366-386
- JSON summary rounding round(5): engine/results.py:388-430
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html import unescape

import numpy as np

from .kernels import postprocess, postprocess_batch, xyxy2xywh
from .labelmaps import ABANDON_CLS, DOCSTRUCTBENCH_10, NC

KERNEL_VERSION = "1.0.0"

# ---------------------------------------------------------------------------
# 1. HTML -> blocks
# ---------------------------------------------------------------------------

BLOCK_TAGS = {
    "h1", "h2", "h3", "h4", "h5", "h6",
    "p", "li", "blockquote", "pre", "figcaption", "caption",
}
CONTAINER_BLOCK_TAGS = {"table", "figure"}  # folded into one block each
BOILER_CONTAINERS = {"nav", "header", "footer", "aside", "form"}
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}

_WS_RE = re.compile(r"\s+")


def _norm_ws(s: str) -> str:
    # fast path: already-normalized ASCII (no runs, no exotic
    # whitespace) — the regex would only strip edges.  The guard is
    # conservative: any non-ASCII (\xa0, \x85, ...) or control
    # whitespace — including \x1c-\x1f, which Python's \s matches and
    # PDF octal escapes can produce — falls through to the full
    # normalization, so output is identical by construction.
    # (NOTE: a single-regex guard was tried and measured 5.6x SLOWER
    # than these chained substring checks on real block text — str
    # `in` is a memchr-speed C scan, the regex NFA is per-char.)
    if (
        s.isascii()
        and "  " not in s
        and "\t" not in s
        and "\n" not in s
        and "\r" not in s
        and "\f" not in s
        and "\v" not in s
        and "\x1c" not in s
        and "\x1d" not in s
        and "\x1e" not in s
        and "\x1f" not in s
    ):
        return s.strip()
    return _WS_RE.sub(" ", s).strip()


@dataclass(slots=True)
class Block:
    idx: int
    tag: str
    tag_path: str
    depth: int
    text: str
    link_chars: int = 0
    total_chars: int = 0
    in_boiler: bool = False
    # filled by layout:
    x1: float = 0.0
    y1: float = 0.0
    x2: float = 0.0
    y2: float = 0.0

    @property
    def link_density(self) -> float:
        return self.link_chars / max(self.total_chars, 1)


@dataclass(slots=True)
class _OpenBlock:
    tag: str
    tag_path: str
    depth: int
    in_boiler: bool
    parts: list[str] = field(default_factory=list)
    link_chars: int = 0
    total_chars: int = 0


class _BlockParser:
    """Streaming HTML -> flat block list (single pass, no DOM build —
    bounded memory per document regardless of page size).

    Events are fed by the regex tokenizer in :func:`parse_blocks`
    (~15x faster than stdlib html.parser for this workload; entity
    decoding via html.unescape matches convert_charrefs semantics)."""

    def __init__(self) -> None:
        self.blocks: list[Block] = []
        self._stack: list[str] = []
        self._drop_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0
        self._open: _OpenBlock | None = None
        self._container: str | None = None  # 'table' | 'figure'
        self._container_depth = 0

    # -- helpers ----------------------------------------------------------
    def _path(self) -> str:
        return "/".join(self._stack)

    def _begin_block(self, tag: str) -> None:
        self._open = _OpenBlock(
            tag=tag,
            tag_path=self._path(),
            depth=len(self._stack),
            in_boiler=self._boiler_depth > 0,
        )

    def _end_block(self) -> None:
        ob = self._open
        self._open = None
        if ob is None:
            return
        text = _norm_ws("".join(ob.parts))
        if not text and ob.tag != "figure":
            return
        self.blocks.append(
            Block(
                idx=len(self.blocks),
                tag=ob.tag,
                tag_path=ob.tag_path,
                depth=ob.depth,
                text=text,
                link_chars=ob.link_chars,
                total_chars=ob.total_chars,
                in_boiler=ob.in_boiler,
            )
        )

    # -- parser events ------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "br":
            if self._open is not None:
                self._open.parts.append(" ")
            return
        if tag == "img":
            alt = _norm_ws(dict(attrs).get("alt") or "")
            if self._container == "figure" and self._open is not None and alt:
                self._open.parts.append(alt)
                self._open.total_chars += len(alt)
            return
        self._stack.append(tag)
        if tag in BOILER_CONTAINERS:
            self._boiler_depth += 1
        if tag == "a":
            self._link_depth += 1
        if self._container is not None:
            if tag == "figcaption" and self._container == "figure":
                # figcaption escapes the figure container as its own block
                self._container = None
                self._container_depth = 0
                self._end_block()
                self._begin_block(tag)
            elif self._container == "table" and tag in {"tr"}:
                if self._open is not None:
                    self._open.parts.append(" ║ ")  # row separator
            elif self._container == "table" and tag in {"td", "th"}:
                if self._open is not None:
                    self._open.parts.append(" | ")
            return
        if tag in CONTAINER_BLOCK_TAGS:
            if self._open is not None:
                self._end_block()
            self._container = tag
            self._container_depth = len(self._stack)
            self._begin_block(tag)
        elif tag in BLOCK_TAGS:
            if self._open is not None:
                self._end_block()
            self._begin_block(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag in {"br", "img"}:
            return
        # pop stack down past the matching open tag, if present
        if tag in self._stack:
            while self._stack:
                t = self._stack.pop()
                if t in BOILER_CONTAINERS:
                    self._boiler_depth = max(0, self._boiler_depth - 1)
                if t == "a":
                    self._link_depth = max(0, self._link_depth - 1)
                if t == tag:
                    break
        if self._container is not None:
            if tag == self._container and len(self._stack) < self._container_depth:
                self._container = None
                self._container_depth = 0
                self._end_block()
            return
        if tag in BLOCK_TAGS and self._open is not None and self._open.tag == tag:
            self._end_block()

    def handle_data(self, data: str) -> None:
        if self._drop_depth or self._open is None:
            return
        self._open.parts.append(data)
        n = len(_norm_ws(data))
        self._open.total_chars += n
        if self._link_depth:
            self._open.link_chars += n

    def close(self) -> None:
        self._end_block()


# ---------------------------------------------------------------------------
# charset sniffing (BOM + WHATWG-style <meta charset> prescan)
# ---------------------------------------------------------------------------
#
# A large share of real Common-Crawl HTML is not UTF-8 (cp1252,
# Shift-JIS, GBK, ...); decoding everything utf-8/replace silently
# mangles those pages into mojibake.  The sniffer is deterministic and
# pure-stdlib: BOM first (highest precedence, per WHATWG "encoding
# sniffing algorithm"), then a <meta charset=...> / http-equiv
# Content-Type scan over the first SNIFF_LIMIT bytes (the spec's
# prescan window), then the utf-8/replace fallback.  Only an
# allowlisted stdlib codec set is honored — an unknown or misdeclared
# label falls back to utf-8 rather than erroring (decode never raises:
# errors="replace" throughout, so a lying meta tag degrades, it does
# not quarantine).  The reference consumes arbitrary real-world files
# as-is (data/loaders.py:320-370); this is the HTML-bytes equivalent.

SNIFF_LIMIT = 1024  # WHATWG meta-prescan window

# label -> python codec; labels per WHATWG Encoding Standard's label
# table (the subset with stdlib codecs).  x-user-defined and the
# legacy single-byte long tail intentionally degrade to utf-8.
_CHARSET_ALIASES: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    # WHATWG maps latin-1/ascii labels to windows-1252 (supersets)
    "windows-1252": "cp1252", "cp1252": "cp1252", "x-cp1252": "cp1252",
    "iso-8859-1": "cp1252", "iso8859-1": "cp1252", "latin-1": "cp1252",
    "latin1": "cp1252", "l1": "cp1252", "ascii": "cp1252",
    "us-ascii": "cp1252", "ansi_x3.4-1968": "cp1252",
    "iso-8859-15": "iso8859-15", "iso8859-15": "iso8859-15",
    "latin9": "iso8859-15",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "windows-1250": "cp1250", "cp1250": "cp1250",
    "windows-1251": "cp1251", "cp1251": "cp1251",
    "windows-1256": "cp1256", "cp1256": "cp1256",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8_r": "koi8-r",
    # WHATWG: shift_jis labels (incl. sjis) -> windows-31j; cp932 is
    # Python's superset codec for it
    "shift_jis": "cp932", "shift-jis": "cp932", "sjis": "cp932",
    "x-sjis": "cp932", "ms932": "cp932", "windows-31j": "cp932",
    "euc-jp": "euc_jp", "euc_jp": "euc_jp", "x-euc-jp": "euc_jp",
    # WHATWG: gb2312/gbk labels -> GBK; gb18030 distinct
    "gbk": "gbk", "gb2312": "gbk", "gb-2312": "gbk", "gb_2312": "gbk",
    "chinese": "gbk", "csgb2312": "gbk", "x-gbk": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "euc-kr": "euc_kr", "euc_kr": "euc_kr", "korean": "euc_kr",
    "ks_c_5601-1987": "euc_kr", "cseuckr": "euc_kr",
    "tis-620": "cp874", "windows-874": "cp874", "iso-8859-11": "cp874",
    # an ASCII-bytes meta claiming utf-16 is lying about its own
    # encodability; WHATWG maps these labels to utf-8
    "utf-16": "utf-8", "utf-16le": "utf-8", "utf-16be": "utf-8",
}

# Per-tag scan following WHATWG's prescan rules: the 'charset' token
# must begin an attribute-ish position (preceded by whitespace / quote
# / ';'), so data-charset=... cannot hijack the codec; and a charset
# label INSIDE a content="..." value is honored only when the same
# <meta> carries http-equiv (the Content-Type form) — a description
# meta whose text merely mentions "charset=big5" is ignored (r5
# review findings, both confirmed by execution).
_META_TAG_RE = re.compile(rb"<meta([^>]{0,512})>", re.I)
_CHARSET_ATTR_RE = re.compile(
    rb"""(?:^|[\s"';])charset\s*=\s*["']?\s*([a-zA-Z0-9._\-]{1,32})""",
    re.I,
)
_CONTENT_ATTR_RE = re.compile(
    rb"""\bcontent\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""", re.I
)
_HTTP_EQUIV_RE = re.compile(rb"http-equiv", re.I)


def _meta_charset_label(prefix: bytes) -> bytes | None:
    for tag in _META_TAG_RE.finditer(prefix):
        attrs = tag.group(1)
        m = _CHARSET_ATTR_RE.search(attrs)
        if m is None:
            continue
        cm = _CONTENT_ATTR_RE.search(attrs)
        inside_content = (
            cm is not None and cm.start(1) <= m.start() < cm.end(1)
        )
        if inside_content and _HTTP_EQUIV_RE.search(attrs) is None:
            continue
        return m.group(1)
    return None

#: inflate cap for transparently-gunzipped payloads: past this the
#: document is a decompression bomb and must QUARANTINE (error row),
#: not OOM the executor — gzip ratios reach ~1000:1, so a few MB of
#: hostile input could otherwise materialize tens of GB
MAX_INFLATED_BYTES = 256 * 1024 * 1024


def inflate_if_gzip(raw: bytes | bytearray) -> bytes:
    """Transparently inflate a gzip payload (crawl archives often
    store the raw Content-Encoding: gzip response body), bounded by
    MAX_INFLATED_BYTES via streaming reads; oversize or corrupt gzip
    raises into the per-doc quarantine wrapper.  Non-gzip bytes pass
    through untouched."""
    raw = bytes(raw)
    if raw[:2] != b"\x1f\x8b":
        return raw
    import gzip  # noqa: PLC0415
    import io  # noqa: PLC0415

    with gzip.GzipFile(fileobj=io.BytesIO(raw)) as gf:
        out = gf.read(MAX_INFLATED_BYTES + 1)
        if len(out) > MAX_INFLATED_BYTES:
            raise ValueError(
                f"gzip payload inflates past {MAX_INFLATED_BYTES} bytes"
            )
    return out


# transport-layer (HTTP Content-Type header) charset labels: unlike a
# <meta> tag, the header is out-of-band, so a utf-16 label there is
# legitimate (the in-band alias map deliberately coerces utf-16 labels
# to utf-8 because ASCII meta bytes inside utf-16 content are a lie)
_TRANSPORT_UTF16: dict[str, str] = {
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_charset(raw: bytes, transport_label: str | None = None) -> str:
    """Python codec name for an HTML byte payload (never raises).
    Precedence per the WHATWG encoding-sniffing algorithm: BOM, then
    the transport-layer label (HTTP ``Content-Type`` charset — an
    unknown transport label is ignored, not an error), then the
    ``<meta>`` prescan.  Returns ``""`` for the undeclared case — the
    caller then tries strict UTF-8 and falls back to cp1252, the
    WHATWG default legacy encoding for unlabeled content: a large
    share of real undeclared Common-Crawl pages are cp1252/latin-1,
    and utf-8/replace would mangle every non-ASCII byte in them.
    (cp1252 decodes any byte sequence, so the fallback never raises;
    genuinely-UTF-8 pages are caught by the strict pass first —
    random cp1252 text is almost never valid multi-byte UTF-8.)"""
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return "utf-16"  # the codec consumes the BOM and picks endianness
    if transport_label:
        tl = transport_label.lower()
        codec = _TRANSPORT_UTF16.get(tl) or _CHARSET_ALIASES.get(tl)
        if codec is not None:
            return codec
    label = _meta_charset_label(raw[:SNIFF_LIMIT])
    if label is not None:
        return _CHARSET_ALIASES.get(
            label.decode("ascii", "replace").lower(), "utf-8"
        )
    return ""


def decode_html(
    raw: bytes | bytearray, transport_label: str | None = None
) -> str:
    raw = bytes(raw)
    codec = sniff_charset(raw, transport_label)
    if codec:
        return raw.decode(codec, errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        # isolated corruption on an otherwise-valid UTF-8 page (e.g. a
        # truncated multi-byte sequence — common crawl artifact) must
        # NOT flip the whole document to cp1252 mojibake (r5 review
        # finding): only switch codecs when invalid sequences are
        # pervasive, i.e. the page is genuinely a legacy encoding.
        u = raw.decode("utf-8", errors="replace")
        if u.count("�") <= 2:
            return u
        return raw.decode("cp1252", errors="replace")


# tokenizer: comments / doctype / closing tag / opening tag.  Quoted
# attribute values may contain '>'.
_TAG_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"
    r"|<!(?:[^>]*)>"
    r"|<\?(?:[^>]*)>"
    r"|<\s*(/?)\s*([a-zA-Z][a-zA-Z0-9:-]*)"
    # attribute grammar mirrors html.parser's tolerant scanner: quotes
    # delimit values only right after '=' (so '>' inside quoted values
    # is fine, but a stray unpaired quote is junk-attr, not a span).
    # Quantifiers are POSSESSIVE (Python 3.11 re): the plain-greedy
    # form backtracks exponentially on an open tag followed by junk
    # with no '>' (e.g. '<a x=y x=y ...<EOF>'), which pins a core for
    # hours on one corrupt crawl page.  Possessive scanning is
    # equivalent here because no loop branch can consume the '>' the
    # tail needs, so the greedy-first decomposition is the only one
    # that can ever succeed.
    r"((?:[^\s/>=]++(?:\s*+=\s*+(?:\"[^\"]*+\"|'[^']*+'|[^\s>]*+))?+|\s++|/(?!\s*>))*+)"
    r"(/?)\s*>",
    re.S,
)
_ALT_RE = re.compile(r"""\balt\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)
# script/style/etc. have CDATA-like content: tags inside are not parsed
_RAWTEXT_CLOSE = {
    t: re.compile(rf"</\s*{t}\s*>", re.I)
    for t in ("script", "style", "noscript", "template")
}


def parse_blocks(html: bytes | str) -> list[Block]:
    if isinstance(html, (bytes, bytearray)):
        html = decode_html(html)
    p = _BlockParser()
    pos = 0
    n = len(html)
    while pos < n:
        m = _TAG_RE.search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                p.handle_data(unescape(text) if "&" in text else text)
            break
        start = m.start()
        if start > pos:
            text = html[pos:start]
            p.handle_data(unescape(text) if "&" in text else text)
        pos = m.end()
        # one C call for all four groups instead of four (the tokenizer
        # loop is the parse-stage floor; r6 profile: Match.group was
        # ~18% of parse tottime)
        closing, tag, attr_s, selfclose = m.group(1, 2, 3, 4)
        if tag is None:  # comment / doctype / CDATA / processing instr.
            continue
        tag = tag.lower()
        if closing:  # closing tag
            p.handle_endtag(tag)
            continue
        attrs = []
        if tag == "img":
            am = _ALT_RE.search(attr_s or "")
            if am:
                attrs = [("alt", am.group(2) or am.group(3) or am.group(4) or "")]
        p.handle_starttag(tag, attrs)
        if selfclose:  # self-closing
            p.handle_endtag(tag)
        elif tag in _RAWTEXT_CLOSE:
            # raw-text content model: skip to the matching close tag
            cm = _RAWTEXT_CLOSE[tag].search(html, pos)
            if cm is None:
                pos = n
                p.handle_endtag(tag)
            else:
                pos = cm.end()
                p.handle_endtag(tag)
    p.close()
    return p.blocks


# ---------------------------------------------------------------------------
# outlink extraction (crawl-frontier leg)
# ---------------------------------------------------------------------------

# quoted attribute values may contain '>' (same tolerance as the
# block tokenizer _TAG_RE), and 'href' must begin an attribute
# position so data-href/xlink:href can't shadow or fabricate the real
# target (r5 second-pass review findings).
# Quantifiers are POSSESSIVE (r6, advisor finding): the plain-greedy
# form backtracks exponentially on an unterminated tag containing
# quotes and no '>' (measured 10.5 s at 34 quotes, ~2.5x per +2 —
# one corrupt crawl page pins an executor core forever, and the
# per-doc quarantine wrapper cannot catch a hang).  The bare ["']
# branch keeps the old tolerance for a stray unpaired quote (the
# quoted-string branches are tried first, so well-formed values are
# consumed whole).  Sole behavioral delta vs the greedy original: a
# tag whose attrs hold an unterminated quote whose closing partner
# appears only AFTER a '>' no longer "rescues" a garbled match by
# re-splitting the quoted span — it simply doesn't parse as a tag
# (strictly more conservative on corrupt input; all fixtures and
# oracles unaffected — pinned by the regression test).
_ATTRS = r"""((?:"[^"]*+"|'[^']*+'|[^>"']++|["'])*+)"""
_A_TAG_RE = re.compile(r"<\s*a\s" + _ATTRS + ">", re.I | re.S)
_BASE_TAG_RE = re.compile(r"<\s*base\s" + _ATTRS + ">", re.I | re.S)
_HREF_RE = re.compile(
    r"""(?:^|[\s"'])href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)
_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")


def extract_outlinks(url: str, html: bytes | str) -> list[str]:
    """Resolved outlink urls of a page, in document order — the
    crawl-frontier extraction every archive pipeline runs next to the
    content extraction.  hrefs are entity-unescaped and resolved with
    stdlib ``urljoin`` against the page's effective base — the first
    ``<base href>`` if declared (itself resolved against the page
    url, per HTML spec), else the page url; fragment-only and
    non-navigational schemes (javascript/mailto/data/tel) are skipped.
    gzip and charset handling are shared with the block parser
    (inflate_if_gzip + decode_html), so archive-stored response bodies
    yield the same frontier the dispatcher's content path sees.
    Known simplification: a raw-text region (script) containing a
    literal ``<a href=...>`` string would match — acceptable for
    frontier discovery, where a stray candidate link is harmless."""
    from urllib.parse import urljoin  # noqa: PLC0415

    if isinstance(html, (bytes, bytearray)):
        try:
            html = inflate_if_gzip(html)
        except Exception:  # noqa: BLE001
            # corrupt/bomb gzip: a total function for the frontier —
            # the garbage bytes simply yield no links (the CONTENT
            # path quarantines the same document with an error row)
            html = bytes(html)
        html = decode_html(html)
    base = url
    bm = _BASE_TAG_RE.search(html)
    if bm is not None:
        bh = _HREF_RE.search(bm.group(1))
        if bh is not None:
            declared = (bh.group(2) or bh.group(3) or bh.group(4) or "").strip()
            if declared:
                try:
                    base = urljoin(url, unescape(declared))
                except ValueError:
                    pass  # malformed base: keep the page url
    out: list[str] = []
    for m in _A_TAG_RE.finditer(html):
        hm = _HREF_RE.search(m.group(1))
        if hm is None:
            continue
        href = hm.group(2) or hm.group(3) or hm.group(4) or ""
        if "&" in href:
            href = unescape(href)
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        if href.lower().startswith(_SKIP_SCHEMES):
            continue
        try:
            out.append(urljoin(base, href))
        except ValueError:
            # malformed authority (e.g. an unclosed IPv6 bracket)
            # raises from urljoin — skip the link, never the page
            continue
    return out


# ---------------------------------------------------------------------------
# page metadata extraction (title / description / canonical / lang)
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<\s*title[^>]*>(.*?)</\s*title\s*>", re.I | re.S)
_MD_META_RE = re.compile(r"<\s*meta\s" + _ATTRS + ">", re.I | re.S)
_LINK_TAG_RE = re.compile(r"<\s*link\s" + _ATTRS + ">", re.I | re.S)
_HTML_TAG_RE = re.compile(r"<\s*html\s" + _ATTRS + ">", re.I | re.S)
_WS_RUN_RE = re.compile(r"\s+")


def _attr(attrs: str, name: str) -> str | None:
    """Value of attribute ``name`` inside a tag's attribute string —
    quoted or bare, first occurrence, attribute-position anchored
    (same discipline as _HREF_RE so data-content can't shadow
    content)."""
    m = re.search(
        r"""(?:^|[\s"'])"""
        + name
        + r"""\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
        attrs,
        re.I,
    )
    if m is None:
        return None
    return m.group(2) or m.group(3) or m.group(4) or ""


def _clean_meta(v: str) -> str:
    return _WS_RUN_RE.sub(" ", unescape(v)).strip()


def extract_page_metadata(url: str, html: bytes | str) -> dict:
    """Page-level metadata every archive pipeline carries next to the
    extracted text: ``<title>``, meta description, ``og:title``,
    resolved ``<link rel=canonical>``, and the ``<html lang>``
    attribute.  First occurrence wins per field; absent fields are
    None; values are entity-unescaped with whitespace runs collapsed.
    gzip/charset handling is shared with the content path
    (inflate_if_gzip + decode_html), and like the frontier leg this is
    a total function — undecodable bytes yield an all-None row, never
    a task failure."""
    from urllib.parse import urljoin  # noqa: PLC0415

    if isinstance(html, (bytes, bytearray)):
        try:
            html = inflate_if_gzip(html)
        except Exception:  # noqa: BLE001
            html = bytes(html)
        html = decode_html(html)
    title = description = og_title = canonical = lang = None
    tm = _TITLE_RE.search(html)
    if tm is not None:
        title = _clean_meta(tm.group(1))
    for m in _MD_META_RE.finditer(html):
        attrs = m.group(1)
        # a matching name/property WITHOUT a content attribute is no
        # value at all — it must neither emit '' nor consume the
        # first-occurrence-wins slot of a later real tag
        if description is None:
            n = _attr(attrs, "name")
            if n is not None and n.strip().lower() == "description":
                c = _attr(attrs, "content")
                if c is not None:
                    description = _clean_meta(c)
        if og_title is None:
            p = _attr(attrs, "property")
            if p is not None and p.strip().lower() == "og:title":
                c = _attr(attrs, "content")
                if c is not None:
                    og_title = _clean_meta(c)
        if description is not None and og_title is not None:
            break
    for m in _LINK_TAG_RE.finditer(html):
        attrs = m.group(1)
        rel = _attr(attrs, "rel")
        if rel is not None and rel.strip().lower() == "canonical":
            href = (_attr(attrs, "href") or "").strip()
            if href:
                try:
                    canonical = urljoin(url, unescape(href))
                except ValueError:
                    canonical = None
            break
    hm = _HTML_TAG_RE.search(html)
    if hm is not None:
        lv = _attr(hm.group(1), "lang")
        if lv is not None and lv.strip():
            lang = lv.strip()
    return {
        "title": title,
        "description": description,
        "og_title": og_title,
        "canonical": canonical,
        "lang": lang,
    }


# ---------------------------------------------------------------------------
# 2. deterministic flow layout
# ---------------------------------------------------------------------------

PAGE_W = np.float32(960.0)
MARGIN = np.float32(60.0)
CONTENT_X2 = np.float32(900.0)
BLOCK_GAP = np.float32(12.0)

# (line height, chars per line) per tag — a crude but fully
# deterministic text-flow model standing in for a renderer.
_TAG_METRICS: dict[str, tuple[float, float]] = {
    "h1": (40.0, 40.0),
    "h2": (32.0, 48.0),
    "h3": (26.0, 56.0),
    "h4": (22.0, 64.0),
    "h5": (20.0, 72.0),
    "h6": (18.0, 80.0),
    "p": (18.0, 90.0),
    "li": (18.0, 84.0),
    "blockquote": (18.0, 80.0),
    "pre": (16.0, 72.0),
    "figcaption": (16.0, 88.0),
    "caption": (16.0, 88.0),
    "table": (22.0, 100.0),
    "figure": (240.0, 1e9),  # fixed-height media box
}


def layout_blocks(blocks: list[Block]) -> tuple[np.float32, np.float32]:
    """Assign xyxy page geometry by simulated vertical flow.  Pure
    float32 arithmetic (determinism pin), vectorized: per-block heights
    then a float32 cumulative sum reproduces the sequential accumulation
    exactly (same add order).  Returns (page_w, page_h)."""
    if not blocks:
        return PAGE_W, np.float32(MARGIN + MARGIN)
    metrics = np.array(
        [_TAG_METRICS.get(b.tag, (18.0, 90.0)) for b in blocks], dtype=np.float32
    )
    text_len = np.array([len(b.text) for b in blocks], dtype=np.float32)
    n_lines = np.maximum(1, np.ceil(text_len / metrics[:, 1]))
    h = (metrics[:, 0] * n_lines).astype(np.float32)
    depth = np.array([min(b.depth, 8) for b in blocks], dtype=np.float32)
    x1 = (MARGIN + np.float32(12.0) * depth).astype(np.float32)
    # y accumulation: y_{i+1} = (y_i + h_i) + GAP in float32.  The
    # scalar loop's rounding sequence is exactly a LEFT-TO-RIGHT
    # float32 running sum over [MARGIN, h_0, GAP, h_1, GAP, ...]:
    # acc[2i] = y1_i, acc[2i+1] = y2_i, acc[2n] = final y.
    # np.add.accumulate on a float32 array performs the identical
    # sequential same-dtype adds, so every intermediate is
    # bit-identical to the old per-block loop (pinned by the golden
    # byte-identity + parser-differential + independent-oracle tests).
    n = len(blocks)
    seq = np.empty(2 * n + 1, dtype=np.float32)
    seq[0] = MARGIN
    seq[1::2] = h
    seq[2::2] = BLOCK_GAP
    acc = np.add.accumulate(seq)
    y1 = acc[0:-1:2]
    y2 = acc[1::2]
    x1l = x1.tolist()
    y1l = y1.tolist()
    y2l = y2.tolist()
    cx2 = float(CONTENT_X2)
    for i, b in enumerate(blocks):
        b.x1 = x1l[i]
        b.x2 = cx2
        b.y1 = y1l[i]
        b.y2 = y2l[i]
    return PAGE_W, np.float32(acc[-1] + MARGIN)


# ---------------------------------------------------------------------------
# 3. proposal generation (the "detector")
# ---------------------------------------------------------------------------

JITTERS_PER_BLOCK = 3  # anchor fan-out; NMS collapses the jittered dups

_TAG_CLASS_PRIOR: dict[str, int] = {
    "h1": 0,            # title
    "h2": 0, "h3": 0, "h4": 0, "h5": 0, "h6": 0,
    "p": 1,             # plain text
    "li": 1,
    "blockquote": 1,
    "figure": 3,        # figure
    "figcaption": 4,    # figure_caption
    "table": 5,         # table
    "caption": 6,       # table_caption
    "pre": 8,           # isolate_formula
}


def _sigmoid32(x: np.ndarray) -> np.ndarray:
    return (1.0 / (1.0 + np.exp(-x.astype(np.float32)))).astype(np.float32)


def _batch_logits(blocks: list[Block]) -> np.ndarray:
    """(nb, NC) class logits from tag prior + boilerplate heuristics
    (link-density / text-density / tag-path — the readability-spirit
    features of the north star).  Vectorized across blocks with the
    SAME per-element float32 operation order as the original
    one-block-at-a-time code, so every logit is bit-identical (pinned
    by the golden byte-identity tests); only the string features
    (tag prior, keyword scan) stay per-block Python."""
    nb = len(blocks)
    logits = np.full((nb, NC), -4.0, dtype=np.float32)
    rows = np.arange(nb)
    prior = np.array(
        [_TAG_CLASS_PRIOR.get(b.tag, 1) for b in blocks], dtype=np.int64
    )
    logits[rows, prior] = np.float32(3.0)
    ld = np.array([b.link_density for b in blocks], dtype=np.float32)
    # threshold compares go through float64 like the scalar original
    # (np.float32(ld) > 0.3 promoted the float32 to float64, so a block
    # with link_density exactly float32(0.3)=0.30000001 DID clear the
    # 0.3 bar; a float32-vs-float32 compare would not).
    ld64 = ld.astype(np.float64)
    text_len_i = np.array([len(b.text) for b in blocks], dtype=np.int64)
    text_len = np.minimum(text_len_i, 2000).astype(np.float32)
    # text-density proxy: chars per layout line
    span_h = np.array(
        [max((b.y2 - b.y1) / 18.0, 1.0) for b in blocks], dtype=np.float32
    )
    density = text_len / span_h
    # boilerplate evidence (op order matches the scalar original)
    boiler = np.array([b.in_boiler for b in blocks], dtype=bool)
    abandon = np.full(nb, -3.0, dtype=np.float32)
    abandon[boiler] += np.float32(4.5)
    abandon += np.float32(6.0) * ld
    abandon[(text_len_i < 25) & (ld64 > 0.3)] += np.float32(1.5)
    lows = [b.text.lower() for b in blocks]
    for kw in ("cookie", "subscribe", "copyright", "privacy", "all rights reserved"):
        hit = np.array([kw in low for low in lows], dtype=bool)
        abandon[hit] += np.float32(1.0)
    logits[:, ABANDON_CLS] = abandon
    # boilerplate evidence suppresses the content prior hard enough to
    # fall under CONF_THRES=0.25 (sigmoid(3.0 - 4.5) ~= 0.18): the class
    # filter only drops abandon-class detections, so the content-class
    # score of a boilerplate block must die at the confidence mask.
    suppress = boiler | (ld64 > 0.5)
    logits[rows[suppress], prior[suppress]] -= np.float32(4.5)
    weak = (prior == 1) & (text_len_i < 15)
    logits[rows[weak], prior[weak]] -= np.float32(1.0)
    # table-ish density bumps table score
    is_table = np.array([b.tag == "table" for b in blocks], dtype=bool)
    if is_table.any():
        bump = np.minimum(
            density[is_table].astype(np.float64) / 200.0, 1.0
        ).astype(np.float32)
        logits[rows[is_table], 5] += bump
    return logits


def _batch_jitters(blocks: list[Block]) -> np.ndarray:
    """(nb * JITTERS_PER_BLOCK, 2) deterministic jitter offsets,
    derived from each block's own content hash (never from batch
    state); row j=0 of every block is the exact box.  Same float64
    arithmetic order as the scalar original, batch-cast to float32."""
    nb = len(blocks)
    j = JITTERS_PER_BLOCK
    digests = np.frombuffer(
        b"".join(
            hashlib.md5(f"{b.idx}:{b.text[:64]}".encode()).digest()
            for b in blocks
        ),
        dtype=np.uint8,
    ).reshape(nb, 16)
    w = np.array([max(b.x2 - b.x1, 1.0) for b in blocks])  # float64
    hh = np.array([max(b.y2 - b.y1, 1.0) for b in blocks])
    out = np.zeros((nb, j, 2), dtype=np.float32)
    cols = np.arange(1, j)
    hx = digests[:, 2 * cols]          # (nb, j-1)
    hy = digests[:, 2 * cols + 1]
    out[:, 1:, 0] = ((hx / 255.0 - 0.5) * 0.04 * w[:, None]).astype(np.float32)
    out[:, 1:, 1] = ((hy / 255.0 - 0.5) * 0.04 * hh[:, None]).astype(np.float32)
    return out.reshape(nb * j, 2)


def proposals(blocks: list[Block]) -> tuple[np.ndarray, np.ndarray]:
    """Emit (A, 4) xywh anchor boxes and (A, nc) class scores,
    A = len(blocks) * JITTERS_PER_BLOCK.  Anchor index // JITTERS_PER_BLOCK
    recovers the source block (stable determinism contract).
    Vectorized: one xyxy->xywh conversion and one sigmoid over all
    blocks; only the string-feature logits stay per-block."""
    nb = len(blocks)
    j = JITTERS_PER_BLOCK
    if nb == 0:
        return (
            np.zeros((0, 4), dtype=np.float32),
            np.zeros((0, NC), dtype=np.float32),
        )
    xyxy = np.array(
        [[b.x1, b.y1, b.x2, b.y2] for b in blocks], dtype=np.float32
    )
    xywh = xyxy2xywh(xyxy)  # (nb, 4)
    logits = _batch_logits(blocks)  # (nb, nc)
    base = _sigmoid32(logits)
    boxes = np.repeat(xywh, j, axis=0)  # (nb*j, 4)
    offs = _batch_jitters(blocks)  # (nb*j, 2)
    boxes[:, :2] += offs
    scale = np.tile(
        (1.0 - 0.1 * np.arange(j, dtype=np.float32)), nb
    )  # (nb*j,)
    scores = np.repeat(base, j, axis=0) * scale[:, None].astype(np.float32)
    return boxes, scores.astype(np.float32)


# ---------------------------------------------------------------------------
# 4. full document extraction
# ---------------------------------------------------------------------------

CONF_THRES = 0.25   # predict default, engine/model.py:431
IOU_THRES = 0.7     # cfg/default.yaml:51
MAX_DET = 300       # cfg/default.yaml:52
SEPARATOR = "\n\n"


@dataclass
class Region:
    region_id: int
    cls: int
    name: str
    conf: float
    x1: float
    y1: float
    x2: float
    y2: float
    start: int
    end: int
    text: str


def _parse_payload(html: bytes | str):
    """Front half of :func:`extract_document` — decode / dispatch /
    parse.  Returns ``(blocks, page_w, page_h)``; raises into the
    caller's quarantine wrapper on any malformed payload."""
    transport_charset: str | None = None
    if isinstance(html, (bytes, bytearray)):
        # bounded gzip inflate BEFORE dispatch (PDF magic, charset
        # sniff then see the decompressed bytes); bombs/corruption
        # raise into the per-doc quarantine wrapper
        html = inflate_if_gzip(html)
        if html.startswith(b"HTTP/"):
            # a raw WARC response payload: strip the HTTP envelope
            # (de-chunk + decompress, bounded) and keep the header's
            # charset label — transport precedence beats <meta>
            from .http import is_http_response, parse_http_response  # noqa: PLC0415

            if is_http_response(html):
                resp = parse_http_response(html)
                transport_charset = resp["charset"]
                # a compressed file served without Content-Encoding
                # still inflates transparently, same as the top-level
                html = inflate_if_gzip(resp["body"])
    is_pdf = (isinstance(html, bytes) and html.startswith(b"%PDF-")) or (
        isinstance(html, str) and html.startswith("%PDF-")
    )
    if is_pdf:
        from .pdf import parse_pdf_blocks  # noqa: PLC0415

        if isinstance(html, str):
            # a PDF that arrived as text: latin-1 restores the raw
            # bytes exactly when it was decoded that way; anything
            # unmappable raises into the quarantine wrapper
            html = html.encode("latin-1")
        blocks, page_w, page_h = parse_pdf_blocks(html)
        return blocks, np.float32(page_w), np.float32(page_h)
    if isinstance(html, (bytes, bytearray)) and transport_charset:
        html = decode_html(html, transport_charset)
    blocks = parse_blocks(html)
    page_w, page_h = layout_blocks(blocks)
    return blocks, page_w, page_h


def _assemble_regions(
    blocks: list[Block], dets: np.ndarray
) -> tuple[str, list[Region]]:
    """Back half of :func:`extract_document` — map surviving
    detections (reading order) to one region per source block and
    build the byte-identity text payload."""
    seen: set[int] = set()
    regions: list[Region] = []
    pieces: list[str] = []
    cursor = 0
    # field-wise .tolist() up front: per-row structured-scalar access
    # (det["x1"] etc.) dominated the kernel's assemble stage; tolist
    # converts float32 -> nearest double exactly like float(scalar),
    # and round() stays the Python builtin, so values are
    # bit-identical to the scalar loop (golden + differential pinned)
    anchors = dets["anchor"].tolist()
    clss = dets["cls"].tolist()
    confs = dets["conf"].tolist()
    x1s = dets["x1"].tolist()
    y1s = dets["y1"].tolist()
    x2s = dets["x2"].tolist()
    y2s = dets["y2"].tolist()
    sep_len = len(SEPARATOR)
    for k in range(len(anchors)):
        block_i = int(anchors[k]) // JITTERS_PER_BLOCK
        if block_i in seen:
            continue
        seen.add(block_i)
        b = blocks[block_i]
        if not b.text:
            continue
        start = cursor if not pieces else cursor + sep_len
        end = start + len(b.text)
        cls_k = int(clss[k])
        regions.append(
            Region(
                region_id=len(regions),
                cls=cls_k,
                name=DOCSTRUCTBENCH_10[cls_k],
                conf=round(confs[k], 5),  # summary(decimals=5), results.py:388-430
                x1=round(x1s[k], 5),
                y1=round(y1s[k], 5),
                x2=round(x2s[k], 5),
                y2=round(y2s[k], 5),
                start=start,
                end=end,
                text=b.text,
            )
        )
        pieces.append(b.text)
        cursor = end
    return SEPARATOR.join(pieces), regions


_ERR_META = {"n_regions": 0, "n_blocks": 0, "page_h": 0.0}


def extract_documents(
    payloads: list, stage_acc: dict | None = None
) -> list[tuple[str, list[Region], dict, str | None]]:
    """Batched :func:`extract_document` over a whole Arrow batch —
    byte-identical per-document results (pinned by the differential
    tests), one vectorized detector + NMS pass for the entire batch.

    Per-document NumPy fixed overhead dominated the per-doc path on
    real pages (r5 stage profile: detect 39% + NMS 37% of the kernel
    at ~12 anchors/doc).  Here ``proposals`` runs ONCE over the
    concatenated block list (all its ops are row-wise, so slicing the
    result per doc is bit-identical), and :func:`postprocess_batch`
    replaces per-doc argsorts with doc-keyed global lexsorts.

    Returns one ``(text, regions, meta, error)`` tuple per payload —
    the per-document quarantine contract of the pipeline (a poisoned
    payload yields an error row, never an exception).
    """
    from time import perf_counter  # noqa: PLC0415

    n = len(payloads)
    results: list = [None] * n
    parsed: list[tuple[int, list[Block], float, float]] = []
    t0 = perf_counter()
    for i, raw in enumerate(payloads):
        try:
            blocks, pw, ph = _parse_payload(raw)
            parsed.append((i, blocks, pw, ph))
        except Exception as e:  # noqa: BLE001
            results[i] = ("", [], dict(_ERR_META), f"{type(e).__name__}: {e}"[:500])
    t1 = perf_counter()
    try:
        all_blocks = [b for (_, blocks, _, _) in parsed for b in blocks]
        boxes_all, scores_all = proposals(all_blocks)
        j = JITTERS_PER_BLOCK
        docs = []
        off = 0
        for _, blocks, _, _ in parsed:
            a = len(blocks) * j
            docs.append((boxes_all[off : off + a], scores_all[off : off + a]))
            off += a
        t2 = perf_counter()
        dets_list = postprocess_batch(
            docs,
            conf_thres=CONF_THRES,
            iou_thres=IOU_THRES,
            max_det=MAX_DET,
            drop_classes=(ABANDON_CLS,),
        )
    except Exception:  # pragma: no cover — detector bug fallback
        # the batched detector failed wholesale: fall back to the
        # scalar path so per-document quarantine semantics survive
        for i, _, _, _ in parsed:
            try:
                text, regions, meta = extract_document(payloads[i])
                results[i] = (text, regions, meta, None)
            except Exception as e:  # noqa: BLE001
                results[i] = (
                    "", [], dict(_ERR_META), f"{type(e).__name__}: {e}"[:500]
                )
        return results
    t3 = perf_counter()
    for (i, blocks, pw, ph), dets, (bx, _) in zip(parsed, dets_list, docs):
        try:
            extracted, regions = _assemble_regions(blocks, dets)
            meta = {
                "page_w": float(pw),
                "page_h": float(ph),
                "n_blocks": len(blocks),
                "n_proposals": int(len(bx)),
                "n_regions": len(regions),
                "kernel_version": KERNEL_VERSION,
            }
            results[i] = (extracted, regions, meta, None)
        except Exception as e:  # noqa: BLE001
            results[i] = ("", [], dict(_ERR_META), f"{type(e).__name__}: {e}"[:500])
    if stage_acc is not None:
        t4 = perf_counter()
        stage_acc["parse_s"] = stage_acc.get("parse_s", 0.0) + (t1 - t0)
        stage_acc["detect_s"] = stage_acc.get("detect_s", 0.0) + (t2 - t1)
        stage_acc["nms_s"] = stage_acc.get("nms_s", 0.0) + (t3 - t2)
        stage_acc["assemble_s"] = stage_acc.get("assemble_s", 0.0) + (t4 - t3)
    return results


def extract_document(
    html: bytes | str, stage_acc: dict | None = None
) -> tuple[str, list[Region], dict]:
    """HTML or PDF -> (extracted_text, regions-in-reading-order, meta).

    The source dispatcher (S6): payloads starting with ``%PDF-`` route
    to the minimal-PDF layout parser (pdf.py — real coordinates from
    the text matrix), everything else to the streaming HTML block
    parser + simulated flow layout.  Both feed the SAME detector ->
    NMS -> reading-order -> span pipeline, so byte-identity with the
    oracle holds for both formats by construction.

    The text of each surviving region, joined by ``SEPARATOR``, is the
    byte-identity payload; spans carry offsets into it.  ``meta`` holds
    page geometry + counts for lineage.

    ``stage_acc`` (optional, used by the Spark kernel's lineage): a
    dict whose ``parse_s / detect_s / nms_s / assemble_s`` keys are
    INCREMENTED with this document's per-stage wall seconds — the
    reference's speed attribution (predictor.py:259-266 preprocess /
    inference / postprocess dict), extended with the span-assembly
    stage.  Timing never influences results (determinism contract).
    """
    from time import perf_counter  # noqa: PLC0415

    t0 = perf_counter()
    blocks, page_w, page_h = _parse_payload(html)
    t1 = perf_counter()
    boxes_xywh, class_scores = proposals(blocks)
    t2 = perf_counter()
    dets = postprocess(
        boxes_xywh,
        class_scores,
        conf_thres=CONF_THRES,
        iou_thres=IOU_THRES,
        max_det=MAX_DET,
        drop_classes=(ABANDON_CLS,),
    )
    t3 = perf_counter()
    # one region per source block: the two-stage top-k is multi-label
    # (an anchor may emit 2 classes above threshold) and jittered
    # anchors may survive NMS on tiny boxes — dedup by block keeping the
    # first hit in reading order (deterministic, _assemble_regions).
    extracted, regions = _assemble_regions(blocks, dets)
    if stage_acc is not None:
        t4 = perf_counter()
        stage_acc["parse_s"] = stage_acc.get("parse_s", 0.0) + (t1 - t0)
        stage_acc["detect_s"] = stage_acc.get("detect_s", 0.0) + (t2 - t1)
        stage_acc["nms_s"] = stage_acc.get("nms_s", 0.0) + (t3 - t2)
        stage_acc["assemble_s"] = stage_acc.get("assemble_s", 0.0) + (t4 - t3)
    meta = {
        "page_w": float(page_w),
        "page_h": float(page_h),
        "n_blocks": len(blocks),
        "n_proposals": int(len(boxes_xywh)),
        "n_regions": len(regions),
        "kernel_version": KERNEL_VERSION,
    }
    return extracted, regions, meta
