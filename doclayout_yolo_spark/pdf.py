"""Minimal-PDF layout parse: the north rule's "PDF/layout parse" leg.

A real (not stubbed) parser for text PDFs: it walks the page content
streams (inflating ``FlateDecode``-compressed ones with stdlib zlib),
interprets the text-object operators the PDF spec defines —
``BT``/``ET`` text objects, ``Tf`` font selection, ``Tm``/``Td``/
``TD`` positioning, ``TL``/``T*`` leading and next-line, ``Tc``/``Tw``
spacing, ``Tj``/``'``/``TJ`` text showing (ISO 32000-1 §9.4) — and
emits the same :class:`~doclayout_yolo_spark.extract.Block` list the
HTML parser produces, so the whole downstream pipeline (proposal
detector, NMS, reading-order sort, span extraction) is SHARED between
HTML and PDF inputs and byte-identity with the single-process oracle
holds by construction for both.

Unlike the HTML path (which must simulate layout), PDF carries real
coordinates: block geometry comes from the text matrix, converted from
PDF's bottom-left origin to the pipeline's top-left convention.
Multi-page documents are laid out as a continuous scroll (page k's
blocks offset by ``k * page_h``), mirroring how the HTML path treats a
long page; header/footer boilerplate strips apply per physical page.

``TJ`` array elements follow the standard extraction convention: the
strings are concatenated in order, and a kerning adjustment of
``-TJ_SPACE_KERN`` thousandths or beyond (the magnitude real writers
use for inter-word gaps) reads as a space.  Streams whose filter we
cannot decode (or whose flate data is corrupt) contribute zero blocks
rather than an error — the quarantine wrapper records them.

Also provides :func:`build_pdf` / :func:`build_pdf_pages` — a
deterministic writer for structurally valid PDFs (correct xref
offsets, optional FlateDecode compression, selectable show-operator
style) used by fixtures and tests; parser and writer are intentionally
independent renderings of the spec (writer composes objects, parser
resolves the page tree and tokenizes operators) so tests are not
self-certifying string reversals.
"""

from __future__ import annotations

import re
import struct
import zlib

from .extract import Block, _norm_ws

PDF_MAGIC = b"%PDF-"


class EncryptedPdfError(Exception):
    """The document's trailer declares /Encrypt: content streams are
    RC4/AES-encrypted and unreadable without key material.  Raised (not
    degraded) so the quarantine wrapper records a DISTINCT reason —
    encrypted PDFs are a double-digit fraction of wild crawls and must
    be distinguishable from parser bugs in the stats (r4 verdict item
    6).  ISO 32000-1 §7.6: the encryption dictionary is referenced from
    the file trailer's /Encrypt entry."""


# trailer dict (classic xref PDFs) — scanned in the file TAIL where
# real trailers live, so page content merely mentioning the keyword in
# a large document cannot false-positive
_TRAILER_DICT_RE = re.compile(rb"trailer\s*<<(.*?)>>", re.S)
# xref-stream PDFs (§7.5.8) have no trailer keyword: their /Encrypt
# entry lives in the cross-reference STREAM dict, identified by
# /Type /XRef.  Flat-dict match (XRef dicts carry /W /Index /Root —
# never nested dicts), require the indirect-reference form so shown
# TEXT mentioning "/Encrypt 9 0 R" inside a content stream can't
# false-positive (it lacks /Type /XRef in the same dict).
_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R\b")
_FLAT_DICT_RE = re.compile(rb"<<((?:(?!<<|>>).)*)>>", re.S)
_ENCRYPT_SCAN_TAIL = 8192


_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")


def is_encrypted_pdf(raw: bytes) -> bool:
    # classic trailers live at EOF: tail scan suffices
    tail = raw[-_ENCRYPT_SCAN_TAIL:]
    for m in _TRAILER_DICT_RE.finditer(tail):
        if _ENCRYPT_REF_RE.search(m.group(1)):
            return True
    # xref-STREAM PDFs: follow the LAST startxref pointer (itself
    # tail-bounded, where real PDFs put it) to the XRef object and
    # inspect THAT dict only.  This reaches dicts any distance before
    # EOF (r5 finding #1: they precede a possibly-huge stream) without
    # letting page CONTENT anywhere in the file fake an encryption
    # dict (r5 finding #2: a whole-file scan could false-positive on a
    # document quoting '<< /Type /XRef ... /Encrypt ... >>').
    # Incremental-update /Prev chains are not followed: the newest
    # xref section governs the current document state.
    sx = None
    for sx in _STARTXREF_RE.finditer(tail):
        pass
    if sx is not None:
        off = int(sx.group(1))
        window = raw[off : off + _ENCRYPT_SCAN_TAIL]
        dm = _FLAT_DICT_RE.search(window)
        if dm is not None:
            d = dm.group(1)
            if b"/XRef" in d and _ENCRYPT_REF_RE.search(d):
                return True
    return False

# stream object = dict immediately followed by the stream keyword;
# content-stream dicts are flat (/Length, /Filter) so a non-greedy
# dict match is safe
_STREAMOBJ_RE = re.compile(
    rb"<<(?P<dict>.*?)>>\s*stream\r?\n(?P<body>.*?)endstream", re.S
)
_MEDIABOX_RE = re.compile(
    rb"/MediaBox\s*\[\s*([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s+([\d.+-]+)\s*\]"
)
# string-aware text-object match: the body consumes complete literal
# strings atomically, so 'ET' (or 'BT') INSIDE a shown string can never
# terminate the object early
_BT_RE = re.compile(rb"BT((?:\((?:\\.|[^\\()])*\)|(?!ET).)*?)ET", re.S)
_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.S)
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_FLATE_RE = re.compile(rb"/Filter\s*(?:/FlateDecode\b|\[\s*/FlateDecode\s*\])")

# operators inside a text object we interpret (ISO 32000-1 §9.4.2-9.4.3)
_TOKEN_RE = re.compile(
    rb"/(?P<font>\w+)\s+(?P<size>[\d.]+)\s+Tf"
    rb"|(?P<a>[-\d.]+)\s+(?P<b>[-\d.]+)\s+(?P<c>[-\d.]+)\s+(?P<d>[-\d.]+)\s+"
    rb"(?P<e>[-\d.]+)\s+(?P<f>[-\d.]+)\s+Tm"
    rb"|(?P<tx>[-\d.]+)\s+(?P<ty>[-\d.]+)\s+(?P<tdop>Td|TD)"
    rb"|(?P<tl>[-\d.]+)\s+TL"
    rb"|(?P<tc>[-\d.]+)\s+Tc"
    rb"|(?P<tw>[-\d.]+)\s+Tw"
    rb"|(?P<tstar>T\*)"
    rb"|\((?P<text>(?:\\.|[^\\()])*)\)\s*(?P<showop>Tj|')"
    rb"|<(?P<hextext>[0-9A-Fa-f\s]*)>\s*(?P<hexop>Tj|')"
    rb"|\[(?P<tjarr>(?:\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|[-\d.]+|\s+)*)\]\s*TJ"
)
_TJ_ITEM_RE = re.compile(
    rb"\((?P<s>(?:\\.|[^\\()])*)\)|<(?P<h>[0-9A-Fa-f\s]*)>|(?P<n>[-\d.]+)"
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
TJ_SPACE_KERN = 180.0  # |kern| (thousandths) at/above which TJ reads a space


def _unpack_u16be(data: bytes) -> tuple[int, ...]:
    """All complete big-endian u16 codes of ``data`` (trailing odd
    byte dropped), via one struct.unpack call."""
    n = len(data) // 2
    return struct.unpack(f">{n}H", data[: 2 * n])


def _unescape_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i : i + 2] in _UNESCAPE:
            out += _UNESCAPE[raw[i : i + 2]]
            i += 2
        elif raw[i : i + 1] == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 4]
            om = re.match(rb"[0-7]{1,3}", nxt)
            if om:  # octal escape \ddd (ISO 32000-1 §7.3.4.2)
                out.append(int(om.group(0), 8) & 0xFF)
                i += 1 + len(om.group(0))
            else:
                out.append(raw[i + 1])
                i += 2
        else:
            out.append(raw[i])
            i += 1
    return bytes(out)


_WS_SUB = re.compile(rb"\s").sub


def _hex_bytes(raw: bytes) -> bytes:
    """Hex-string payload -> bytes (ISO 32000-1 §7.3.4.3: whitespace
    ignored, odd trailing digit padded with 0).

    Fast path: ``bytes.fromhex`` directly (it tolerates space-separated
    byte pairs); any input it rejects — odd digit count, non-space
    whitespace, intra-pair spaces — falls through to the normalizing
    slow path, which produces the identical result the old
    always-normalize version did."""
    try:
        return bytes.fromhex(raw.decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        h = _WS_SUB(b"", raw)
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))


# WinAnsiEncoding == cp1252 for the defined codes; the five undefined
# cp1252 bytes fall back to their latin-1 identity so decoding is total
_WINANSI_TABLE = [
    chr(i) if i in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
    else bytes([i]).decode("cp1252")
    for i in range(256)
]
_LATIN1_TABLE = [chr(i) for i in range(256)]


class _Font:
    """Per-font decode behavior resolved from the page's /Resources:
    a /ToUnicode CMap (CID fonts — the encoding real-world Word/LaTeX
    PDFs overwhelmingly use) and/or a simple-font /Encoding, including
    /Differences remap arrays (ISO 32000-1 §9.6.6.3)."""

    __slots__ = ("cmap", "code_bytes", "winansi", "diffs")

    def __init__(self, cmap=None, code_bytes=1, winansi=False, diffs=None):
        self.cmap = cmap
        self.code_bytes = code_bytes
        self.winansi = winansi
        self.diffs = diffs

    def decode(self, data: bytes) -> str:
        if self.cmap is not None:
            w = self.code_bytes
            # C-level code extraction (struct.unpack beats the old
            # per-code slice + int.from_bytes loop ~3x; r6 profile:
            # decode was 36% of CID parse wall).  Trailing partial
            # code bytes are dropped exactly like the old
            # range(0, len-w+1, w) loop did.
            if w == 2:
                codes = _unpack_u16be(data)
            elif w == 1:
                codes = data
            else:
                codes = [
                    int.from_bytes(data[i : i + w], "big")
                    for i in range(0, len(data) - w + 1, w)
                ]
            try:
                # fast path: every code mapped — one C-level map()
                return "".join(map(self.cmap.__getitem__, codes))
            except KeyError:
                pass
            out = []
            get = self.cmap.get
            for code in codes:
                got = get(code)
                if got is None:
                    # unmapped CID: chr() of the raw code, EXCEPT the
                    # UTF-16 surrogate range — a lone surrogate in
                    # extracted_text crashes Arrow batch serialization
                    # OUTSIDE the per-doc quarantine wrapper (task
                    # failure, not quarantine), and surrogate-range
                    # glyph ids are common in real Identity-H fonts
                    got = "�" if 0xD800 <= code <= 0xDFFF else chr(code)
                out.append(got)
            return "".join(out)
        if self.diffs:
            base = _WINANSI_TABLE if self.winansi else _LATIN1_TABLE
            d = self.diffs
            return "".join(d.get(c) or base[c] for c in data)
        if self.winansi:
            return "".join(_WINANSI_TABLE[c] for c in data)
        return data.decode("latin-1")


_DEFAULT_FONT = _Font()

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)+)\s*\])"
)
_CODESPACE_RE = re.compile(
    rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", re.S
)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _u16(hexs: bytes) -> str:
    """CMap destination hex -> text (UTF-16BE per the ToUnicode spec).

    Odd-digit destinations (e.g. ``<041>`` from a sloppy producer) are
    padded with a trailing '0' like ``_hex_bytes`` does — a single
    malformed entry must degrade per-entry, not quarantine the doc."""
    s = hexs.decode("ascii")
    if len(s) % 2:
        s += "0"
    return bytes.fromhex(s).decode("utf-16-be", "replace")


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap stream -> (code -> text map, code width in bytes).

    Reads ``bfchar`` pairs, ``bfrange`` (both the incrementing
    ``<lo> <hi> <dst>`` and the explicit-array form), and the
    ``codespacerange`` width (Adobe CMap spec / ISO 32000-1 §9.10.3)."""
    cmap: dict[int, str] = {}
    width = 2
    cm = _CODESPACE_RE.search(data)
    if cm is not None:
        width = max(1, len(cm.group(1)) // 2)
    for section in _BFCHAR_RE.findall(data):
        for src, dst in _HEXPAIR_RE.findall(section):
            cmap[int(src, 16)] = _u16(dst)
    for section in _BFRANGE_RE.findall(data):
        for m in _RANGE_RE.finditer(section):
            lo, hi = int(m.group(1), 16), int(m.group(2), 16)
            # cap the expansion: a corrupt/adversarial range like
            # <00000000> <ffffffff> would otherwise loop 4e9 times and
            # OOM the executor — unbounded WORK is not caught by the
            # quarantine wrapper, only exceptions are.  Valid CMaps
            # never span more than a 16-bit plane per range.
            hi = min(hi, lo + 0xFFFF)
            if m.group(3) is not None:
                base = bytes.fromhex(m.group(3).decode("ascii"))
                base_cp = int.from_bytes(base, "big")
                nb = len(base)
                if nb == 2:
                    # fast path for the ubiquitous 2-byte destination:
                    # chr() per code instead of to_bytes + utf-16-be
                    # decode.  Identical output: a BMP non-surrogate
                    # u16 decodes to chr(cp); a surrogate-range value
                    # decodes (errors="replace") to one U+FFFD; cp >
                    # 0xFFFF is the old OverflowError break.
                    top = min(hi, lo + (0xFFFF - base_cp))
                    for c in range(lo, top + 1):
                        cp = base_cp + (c - lo)
                        cmap[c] = (
                            "�" if 0xD800 <= cp <= 0xDFFF else chr(cp)
                        )
                    continue
                for c in range(lo, hi + 1):
                    try:
                        dst = (base_cp + (c - lo)).to_bytes(nb, "big")
                    except OverflowError:
                        break  # range runs off the destination width
                    cmap[c] = dst.decode("utf-16-be", "replace")
            else:
                dsts = _HEXTOK_RE.findall(m.group(4))
                for c, dst in zip(range(lo, hi + 1), dsts):
                    cmap[c] = _u16(dst)
    return cmap, width


def _dict_region(body: bytes, key: bytes) -> bytes | int | None:
    """Value after ``/key`` in a dict body: the balanced ``<< ... >>``
    region (bytes) for an inline dict, the object number (int) for an
    indirect ``N 0 R`` reference, else None."""
    m = re.search(rb"/" + key + rb"\s*", body)
    if m is None:
        return None
    rest = body[m.end():]
    if rest.startswith(b"<<"):
        depth, i = 0, 0
        while i < len(rest):
            if rest.startswith(b"<<", i):
                depth += 1
                i += 2
            elif rest.startswith(b">>", i):
                depth -= 1
                i += 2
                if depth == 0:
                    return rest[:i]
            else:
                i += 1
        return None
    rm = re.match(rb"(\d+)\s+0\s+R", rest)
    if rm is not None:
        return int(rm.group(1))
    return None


_FONTREF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_WINANSI_RE = re.compile(rb"/Encoding\s*/WinAnsiEncoding\b")

# ---------------------------------------------------------------------------
# simple-font /Encoding dicts with /Differences (ISO 32000-1 §9.6.6.3):
# [ code /name /name ... code /name ... ] — integers set the next code,
# names assign consecutive codes.  Glyph names resolve through the
# Adobe Glyph List conventions: a literal AGL subset (ASCII names,
# Windows/Latin-1 specials), single-character names, and the
# algorithmic uniXXXX / uXXXX[XX] forms.
# ---------------------------------------------------------------------------

_DIFFS_RE = re.compile(rb"/Differences\s*\[(.*?)\]", re.S)
_DIFF_TOK_RE = re.compile(rb"(\d+)|/([A-Za-z0-9._]+)")

_AGL: dict[str, str] = {
    # ASCII
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Windows specials (cp1252 upper region)
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ",
    "perthousand": "‰", "Scaron": "Š",
    "guilsinglleft": "‹", "OE": "Œ", "Zcaron": "Ž",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "bullet": "•", "endash": "–", "emdash": "—",
    "tilde": "˜", "trademark": "™", "scaron": "š",
    "guilsinglright": "›", "oe": "œ", "zcaron": "ž",
    "Ydieresis": "Ÿ",
    # Latin-1 supplement
    "exclamdown": "\xa1", "cent": "\xa2", "sterling": "\xa3",
    "currency": "\xa4", "yen": "\xa5", "brokenbar": "\xa6",
    "section": "\xa7", "dieresis": "\xa8", "copyright": "\xa9",
    "ordfeminine": "\xaa", "guillemotleft": "\xab",
    "logicalnot": "\xac", "registered": "\xae", "macron": "\xaf",
    "degree": "\xb0", "plusminus": "\xb1", "acute": "\xb4",
    "mu": "\xb5", "paragraph": "\xb6", "periodcentered": "\xb7",
    "cedilla": "\xb8", "ordmasculine": "\xba",
    "guillemotright": "\xbb", "onequarter": "\xbc", "onehalf": "\xbd",
    "threequarters": "\xbe", "questiondown": "\xbf",
    "Agrave": "\xc0", "Aacute": "\xc1", "Acircumflex": "\xc2",
    "Atilde": "\xc3", "Adieresis": "\xc4", "Aring": "\xc5",
    "AE": "\xc6", "Ccedilla": "\xc7", "Egrave": "\xc8",
    "Eacute": "\xc9", "Ecircumflex": "\xca", "Edieresis": "\xcb",
    "Igrave": "\xcc", "Iacute": "\xcd", "Icircumflex": "\xce",
    "Idieresis": "\xcf", "Eth": "\xd0", "Ntilde": "\xd1",
    "Ograve": "\xd2", "Oacute": "\xd3", "Ocircumflex": "\xd4",
    "Otilde": "\xd5", "Odieresis": "\xd6", "multiply": "\xd7",
    "Oslash": "\xd8", "Ugrave": "\xd9", "Uacute": "\xda",
    "Ucircumflex": "\xdb", "Udieresis": "\xdc", "Yacute": "\xdd",
    "Thorn": "\xde", "germandbls": "\xdf", "agrave": "\xe0",
    "aacute": "\xe1", "acircumflex": "\xe2", "atilde": "\xe3",
    "adieresis": "\xe4", "aring": "\xe5", "ae": "\xe6",
    "ccedilla": "\xe7", "egrave": "\xe8", "eacute": "\xe9",
    "ecircumflex": "\xea", "edieresis": "\xeb", "igrave": "\xec",
    "iacute": "\xed", "icircumflex": "\xee", "idieresis": "\xef",
    "eth": "\xf0", "ntilde": "\xf1", "ograve": "\xf2",
    "oacute": "\xf3", "ocircumflex": "\xf4", "otilde": "\xf5",
    "odieresis": "\xf6", "divide": "\xf7", "oslash": "\xf8",
    "ugrave": "\xf9", "uacute": "\xfa", "ucircumflex": "\xfb",
    "udieresis": "\xfc", "yacute": "\xfd", "thorn": "\xfe",
    "ydieresis": "\xff",
}


def _glyph_to_unicode(name: str) -> str:
    """AGL-convention glyph name -> text (U+FFFD when unknown; lone
    surrogates are never emitted — Arrow serialization safety, same
    pin as the CID path)."""
    if len(name) == 1:
        return name
    got = _AGL.get(name)
    if got is not None:
        return got
    if name.startswith("uni") and len(name) >= 7 and (len(name) - 3) % 4 == 0:
        try:
            cps = [
                int(name[i : i + 4], 16) for i in range(3, len(name), 4)
            ]
            return "".join(
                "�" if 0xD800 <= c <= 0xDFFF else chr(c) for c in cps
            )
        except ValueError:
            pass
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            c = int(name[1:], 16)
            if c <= 0x10FFFF and not 0xD800 <= c <= 0xDFFF:
                return chr(c)
        except ValueError:
            pass
    return "�"


def _parse_differences(enc_dict: bytes) -> dict[int, str] | None:
    m = _DIFFS_RE.search(enc_dict)
    if m is None:
        return None
    out: dict[int, str] = {}
    code = 0
    for num, name in _DIFF_TOK_RE.findall(m.group(1)):
        if num:
            code = int(num)
        else:
            if 0 <= code <= 255:
                out[code] = _glyph_to_unicode(name.decode("latin-1"))
            code += 1
    return out or None


def _font_map_for_page(
    page_body: bytes,
    dict_objs: dict[int, bytes],
    streams_by_obj: dict[int, bytes | None],
) -> dict[bytes, _Font]:
    """Resolve the page's /Resources /Font dict into name -> _Font.
    Resources may be inline or an indirect reference; font dicts may
    live in object streams (dict_objs is already ObjStm-merged)."""
    res = _dict_region(page_body, b"Resources")
    if isinstance(res, int):
        res = dict_objs.get(res)
    if not isinstance(res, bytes):
        return {}
    fdict = _dict_region(res, b"Font")
    if isinstance(fdict, int):
        fdict = dict_objs.get(fdict)
    if not isinstance(fdict, bytes):
        return {}
    out: dict[bytes, _Font] = {}
    for name, ref in _FONTREF_RE.findall(fdict):
        fbody = dict_objs.get(int(ref))
        if fbody is None:
            continue
        cmap, width = None, 1
        tm = _TOUNICODE_RE.search(fbody)
        if tm is not None:
            data = streams_by_obj.get(int(tm.group(1)))
            if data is not None:
                cmap, width = _parse_tounicode(data)
        if cmap is None and _TYPE0_RE.search(fbody):
            # Identity-H without ToUnicode: 2-byte codes = code points
            cmap, width = {}, 2
        # /Encoding: either the bare /WinAnsiEncoding name or an
        # encoding DICT (inline or indirect) carrying /BaseEncoding
        # and/or a /Differences remap array
        winansi = _WINANSI_RE.search(fbody) is not None
        diffs = None
        enc = _dict_region(fbody, b"Encoding")
        if isinstance(enc, int):
            enc = dict_objs.get(enc)
        if isinstance(enc, bytes):
            winansi = winansi or b"/WinAnsiEncoding" in enc
            diffs = _parse_differences(enc)
        out[name] = _Font(
            cmap=cmap,
            code_bytes=width,
            winansi=winansi,
            diffs=diffs,
        )
    return out


def _tag_for_size(size: float) -> str:
    if size >= 20.0:
        return "h1"
    if size >= 14.0:
        return "h3"
    return "p"


# --- stream filter chain (ISO 32000-1 §7.4) ----------------------------------
#
# /Filter is a name or an array of names applied left-to-right when
# decoding (the array lists encode order, which is decode order too:
# [/ASCII85Decode /FlateDecode] means "un-85 first, then inflate").
# Wild PDFs mix FlateDecode with the ASCII armors (ASCIIHex/ASCII85 —
# mail-safe transports), RunLengthDecode, and legacy LZWDecode
# (pre-Flate writers, still common in old scanned corpora).  Unknown
# filters (DCT/JBIG2/CCITT image codecs, Crypt) return None: the page
# slot is retained and the document degrades, it does not quarantine.

_FILTER_ENTRY_RE = re.compile(rb"/Filter\s*(/[A-Za-z0-9]+|\[[^\]]*\])")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")


def _ahx_decode(data: bytes) -> bytes:
    """ASCIIHexDecode: whitespace ignored, '>' is EOD, an odd final
    digit is padded with '0' (ISO 32000-1 §7.4.2)."""
    data = data.split(b">", 1)[0]
    data = bytes(c for c in data if c not in b" \t\r\n\f\x00")
    if len(data) % 2:
        data += b"0"
    return bytes.fromhex(data.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    """ASCII85Decode: PDF streams end with '~>' but (unlike Adobe ps)
    rarely start with '<~'; normalize to the Adobe frame and let the
    stdlib handle 'z' groups and whitespace."""
    import base64  # noqa: PLC0415

    data = data.strip()
    if data.endswith(b"~>"):
        data = data[:-2]
    if data.startswith(b"<~"):
        data = data[2:]
    return base64.a85decode(b"<~" + data + b"~>", adobe=True)


def _rl_decode(data: bytes) -> bytes:
    """RunLengthDecode (ISO 32000-1 §7.4.5): length byte L then
    L+1 literal bytes (L<128), or 257-L copies of the next byte
    (L>128); 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            chunk = data[i + 1 : i + 2 + ln]
            if len(chunk) != ln + 1:
                raise ValueError("RunLength: truncated literal run")
            out += chunk
            i += 2 + ln
        else:
            if i + 1 >= n:
                raise ValueError("RunLength: truncated repeat run")
            out += data[i + 1 : i + 2] * (257 - ln)
            i += 2
        if len(out) > _MAX_STREAM_OUT:
            raise ValueError("RunLength: output cap exceeded")
    return bytes(out)


# per-stream decode output cap: a page content stream is KBs; capping
# at 64 MB turns LZW (~3840:1 worst case) and Flate (~1032:1) bombs
# into a per-page degrade instead of an executor OOM
_MAX_STREAM_OUT = 64 << 20


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (ISO 32000-1 §7.4.4; TIFF LZW): 9..12-bit codes MSB
    first, 256=clear, 257=EOD, code width grows at 2^w - EarlyChange."""
    clear, eod = 256, 257
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: bytes | None = None
    out = bytearray()
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == clear:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == eod:
                return bytes(out)
            if code in table:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"LZW: invalid code {code}")
            out += entry
            if len(out) > _MAX_STREAM_OUT:
                raise ValueError("LZW: output cap exceeded")
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
                # the decoder's table lags the encoder's by one entry
                # (it learns entry k only after reading code k+1), so
                # it must widen one code earlier than the encoder's
                # own next_code+early threshold — the classic TIFF-LZW
                # "maxcode - 1" rule (libtiff tif_lzw.c does the same)
                if next_code + early >= (1 << width) - 1 and width < 12:
                    width += 1
            prev = entry
    return bytes(out)  # missing EOD: tolerate, emit what decoded


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder for the fixture writer — the exact inverse of
    :func:`_lzw_decode` (same width-change and clear-code policy)."""
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal buf, nbits
        buf = (buf << w) | code
        nbits += w
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code + early >= 4096:
            emit(256, width)  # table full: clear and restart
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        else:
            table[wc] = next_code
            next_code += 1
            if next_code + early >= (1 << width) and width < 12:
                width += 1
        w = bytes([ch])
    if w:
        emit(table[w], width)
        # the DECODER adds a table entry after reading this final code
        # (it cannot know no more data follows) and applies its
        # maxcode-1 widen rule before reading the next code — so EOD
        # must be emitted at the width the decoder will read it with,
        # else a boundary landing exactly on the last data code makes
        # the decoder read a 10-bit EOD the encoder wrote in 9 bits
        # (found by the round-trip property fuzz).
        if next_code + early >= (1 << width) - 1 and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _png_predictor(
    data: bytes, columns: int, colors: int = 1, bpc: int = 8
) -> bytes:
    """Reverse PNG row predictors (Predictor >= 10; RFC 2083 §6): each
    row is a filter-type byte + row bytes.  Used by Flate/LZW streams
    that declare /DecodeParms /Predictor."""
    bpp = max(1, (colors * bpc) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), rowlen + 1):
        ft = data[r]
        row = bytearray(data[r + 1 : r + 1 + rowlen])
        if len(row) < rowlen:
            row += bytes(rowlen - len(row))
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG predictor: bad filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def _decode_stream(dict_bytes: bytes, body: bytes) -> bytes | None:
    """Stream dict + raw body -> decoded body through the full
    /Filter chain, or None when the body is not decodable
    (unsupported filter, corrupt data) — the caller retains the page
    slot and degrades.  /DecodeParms handling is the flat-dict subset
    (Predictor/Columns/Colors/BitsPerComponent/EarlyChange), applied
    to the Flate/LZW stage as content and object streams use it."""
    fm = _FILTER_ENTRY_RE.search(dict_bytes)
    if fm is None:
        return body if b"/Filter" not in dict_bytes else None
    names = [n.decode("ascii") for n in _NAME_RE.findall(fm.group(1))]
    em = _EARLY_RE.search(dict_bytes)
    early = int(em.group(1)) if em else 1
    pm = _PRED_RE.search(dict_bytes)
    if pm is not None and 2 <= int(pm.group(1)) < 10:
        return None  # TIFF predictor: not implemented, degrade
    try:
        for name in names:
            if name in ("FlateDecode", "Fl"):
                dec = zlib.decompressobj()
                body = dec.decompress(body, _MAX_STREAM_OUT)
                if dec.unconsumed_tail:
                    raise ValueError("Flate: output cap exceeded")
            elif name in ("LZWDecode", "LZW"):
                body = _lzw_decode(body, early=early)
            elif name in ("ASCIIHexDecode", "AHx"):
                body = _ahx_decode(body)
            elif name in ("ASCII85Decode", "A85"):
                body = _a85_decode(body)
            elif name in ("RunLengthDecode", "RL"):
                body = _rl_decode(body)
            else:
                return None  # image codec / Crypt: not a text stream
            if pm is not None and name in (
                "FlateDecode", "Fl", "LZWDecode", "LZW",
            ) and int(pm.group(1)) >= 10:
                cm = _COLUMNS_RE.search(dict_bytes)
                com = _COLORS_RE.search(dict_bytes)
                bm = _BPC_RE.search(dict_bytes)
                body = _png_predictor(
                    body,
                    int(cm.group(1)) if cm else 1,
                    int(com.group(1)) if com else 1,
                    int(bm.group(1)) if bm else 8,
                )
    except (ValueError, zlib.error, OverflowError):
        return None
    return body


_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm\b")
_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_N_RE = re.compile(rb"/N\s+(\d+)")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_PAGES_TYPE_RE = re.compile(rb"/Type\s*/Pages\b")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _objstm_members(dict_bytes: bytes, data: bytes) -> dict[int, bytes]:
    """Embedded objects of a decoded /ObjStm body (ISO 32000-1 §7.5.7):
    header = N (objnum, offset) integer pairs, bodies start at /First."""
    nm, fm = _N_RE.search(dict_bytes), _FIRST_RE.search(dict_bytes)
    if nm is None or fm is None:
        return {}
    n, first = int(nm.group(1)), int(fm.group(1))
    header = data[:first].split()
    if len(header) < 2 * n:
        return {}
    out: dict[int, bytes] = {}
    nums = [int(header[2 * i]) for i in range(n)]
    offs = [int(header[2 * i + 1]) for i in range(n)]
    for i in range(n):
        end = first + offs[i + 1] if i + 1 < n else len(data)
        out[nums[i]] = data[first + offs[i] : end]
    return out


def _content_streams(
    raw: bytes,
) -> tuple[list[bytes], tuple[float, ...] | None, list[dict[bytes, _Font]]]:
    """(decoded content-stream bodies in page order, MediaBox or None,
    per-page font maps resolved from /Resources).

    The MediaBox must come from the resolved page dicts, not a regex
    over the raw file: with PDF 1.5 object streams the page dicts are
    FlateDecode-compressed, so a raw scan would silently miss
    non-default page sizes.

    Resolves the page tree — including page dicts stored inside
    compressed /ObjStm object streams (the PDF 1.5+ layout most modern
    writers emit): pages ordered by the /Pages node's /Kids when
    present, else document order; each page's /Contents reference maps
    to one entry.  Falls back to every decodable stream in file order
    when no page objects resolve (fragmentary fixtures, damaged xref)."""
    streams_by_obj: dict[int, bytes | None] = {}
    dict_objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(raw):
        num, body = int(m.group(1)), m.group(2)
        sm = _STREAMOBJ_RE.search(body)
        if sm is None:
            dict_objs[num] = body
            continue
        decoded = _decode_stream(sm.group("dict"), sm.group("body"))
        if decoded is not None and _OBJSTM_RE.search(sm.group("dict")):
            dict_objs.update(_objstm_members(sm.group("dict"), decoded))
        else:
            streams_by_obj[num] = decoded
    # page order: /Kids of the /Pages node when resolvable, else the
    # document order of /Type /Page dicts
    page_nums: list[int] = []
    for body in dict_objs.values():
        if _PAGES_TYPE_RE.search(body):
            km = _KIDS_RE.search(body)
            if km is not None:
                page_nums = [int(r) for r in _REF_RE.findall(km.group(1))]
                break
    if not page_nums:
        page_nums = [
            num for num, body in dict_objs.items() if _PAGE_TYPE_RE.search(body)
        ]
    media: tuple[float, ...] | None = None
    page_content_objs: list[int] = []
    fontmaps: list[dict[bytes, _Font]] = []
    for num in page_nums:
        body = dict_objs.get(num)
        if body is None:
            continue
        if media is None:
            mm = _MEDIABOX_RE.search(body)
            if mm is not None:
                media = tuple(float(v) for v in mm.groups())
        cm = _CONTENTS_RE.search(body)
        if cm is not None:
            page_content_objs.append(int(cm.group(1)))
            fontmaps.append(
                _font_map_for_page(body, dict_objs, streams_by_obj)
            )
    if page_content_objs and all(n in streams_by_obj for n in page_content_objs):
        # keep the page SLOT for an undecodable /Contents stream (empty
        # body -> zero blocks at its position): dropping it would shift
        # every later page up one full page in the continuous scroll and
        # shrink total_h — quarantine must not move other pages.
        return [
            streams_by_obj[n] if streams_by_obj[n] is not None else b""
            for n in page_content_objs
        ], media, fontmaps
    # fallback: every non-ObjStm stream in the file, one logical page
    out = []
    for sm in _STREAMOBJ_RE.finditer(raw):
        if _OBJSTM_RE.search(sm.group("dict")):
            continue
        body = _decode_stream(sm.group("dict"), sm.group("body"))
        if body is None or b"beginbfchar" in body or b"begincmap" in body:
            continue  # never mistake a ToUnicode CMap for a page
        out.append(body)
    return out, media, [{} for _ in out]


def parse_pdf_blocks(raw: bytes) -> tuple[list[Block], float, float]:
    """PDF bytes -> (blocks, page_w, total_h) in top-left coordinates.

    One Block per BT..ET text object (its shown strings joined in
    stream order; ``T*``/``'`` line breaks and large ``TJ`` kerns read
    as spaces).  Geometry: position from the text-matrix state at the
    first shown string; width from a deterministic glyph-advance model
    (``(CHAR_W * size + Tc) * n_chars + Tw * n_spaces``, clamped to the
    page); height spans from the first to the last shown line.
    Multi-page documents stack pages as a continuous scroll, so
    ``total_h = n_pages * page_h``.  Boilerplate: text positioned in a
    physical page's header / footer strips is flagged ``in_boiler`` so
    the shared detector scores it down exactly like HTML <nav>/<footer>
    content.
    """
    if is_encrypted_pdf(raw):
        raise EncryptedPdfError("/Encrypt declared in trailer")
    streams, media, fontmaps = _content_streams(raw)
    if media is None:
        # fragmentary input with no resolvable page dict: raw scan
        m = _MEDIABOX_RE.search(raw)
        media = tuple(float(v) for v in m.groups()) if m else None
    if media is not None:
        x0, y0, x1, y1 = media
        page_w, page_h = x1 - x0, y1 - y0
    else:
        page_w, page_h = DEFAULT_PAGE_W, DEFAULT_PAGE_H
    blocks: list[Block] = []
    for page_i, body in enumerate(streams):
        y_off = page_i * page_h
        fonts = fontmaps[page_i] if page_i < len(fontmaps) else {}
        for bt in _BT_RE.finditer(body):
            size = 12.0
            font = _DEFAULT_FONT
            x, y = 0.0, 0.0
            leading = 0.0
            char_sp, word_sp = 0.0, 0.0
            parts: list[str] = []
            first_pos: tuple[float, float] | None = None
            last_y = 0.0
            first_size = size
            first_char_sp, first_word_sp = 0.0, 0.0
            for tok in _TOKEN_RE.finditer(bt.group(1)):
                # dispatch on the branch's LAST capturing group (one
                # attribute read) instead of probing up to 8 groups per
                # token — the r6 profile showed re.Match.group() calls
                # alone at ~20% of parse wall on CID-heavy documents
                g = tok.lastgroup
                if g == "showop" or g == "hexop":
                    is_hex = g == "hexop"
                    op = tok.group(g)
                    if op == b"'":  # ' = T* then show
                        y -= leading
                    if first_pos is None:
                        first_pos = (x, y)
                        first_size = size
                        first_char_sp, first_word_sp = char_sp, word_sp
                    last_y = y
                    if is_hex:
                        parts.append(font.decode(_hex_bytes(tok.group("hextext"))))
                    else:
                        parts.append(font.decode(_unescape_bytes(tok.group("text"))))
                elif g == "size":
                    size = float(tok.group("size"))
                    font = fonts.get(tok.group("font"), _DEFAULT_FONT)
                elif g == "f":
                    x, y = float(tok.group("e")), float(tok.group("f"))
                elif g == "tdop":
                    tx, ty = float(tok.group("tx")), float(tok.group("ty"))
                    if tok.group("tdop") == b"TD":  # §9.4.2: TD sets TL=-ty
                        leading = -ty
                    x += tx
                    y += ty
                elif g == "tl":
                    leading = float(tok.group("tl"))
                elif g == "tc":
                    char_sp = float(tok.group("tc"))
                elif g == "tw":
                    word_sp = float(tok.group("tw"))
                elif g == "tstar":
                    y -= leading
                elif g == "tjarr":
                    if first_pos is None:
                        first_pos = (x, y)
                        first_size = size
                        first_char_sp, first_word_sp = char_sp, word_sp
                    last_y = y
                    segs: list[str] = []
                    for item in _TJ_ITEM_RE.finditer(tok.group("tjarr")):
                        ig = item.lastgroup
                        if ig == "s":
                            segs.append(font.decode(_unescape_bytes(item.group("s"))))
                        elif ig == "h":
                            segs.append(font.decode(_hex_bytes(item.group("h"))))
                        elif float(item.group("n")) <= -TJ_SPACE_KERN:
                            segs.append(" ")
                    parts.append("".join(segs))
            text = _norm_ws(" ".join(parts))
            if not text or first_pos is None:
                continue
            px, py = first_pos
            y_top = page_h - py - first_size  # baseline -> box top
            width = min(
                (CHAR_W * first_size + first_char_sp) * len(text)
                + first_word_sp * text.count(" "),
                page_w - px,
            )
            # clamp: a text object may reposition UPWARD after its
            # first shown string (columns, superscripts) — the box
            # must never invert (negative area poisons NMS/IoU)
            height = max(py - last_y, 0.0) + first_size * LINE_H
            in_boiler = (
                y_top + height >= page_h - FOOTER_STRIP
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
                    y1=float(y_top + y_off),
                    x2=float(px + width),
                    y2=float(y_top + y_off + height),
                )
            )
    return blocks, page_w, page_h * max(1, len(streams))


# ---------------------------------------------------------------------------
# deterministic minimal-PDF writer (fixtures/tests)
# ---------------------------------------------------------------------------


def _escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _show_ops(
    text: str, size: float, x: float, y_pdf: float, style: str, enc=None
) -> str:
    """One text object. style: 'Tj' = single literal string; 'TJ' =
    word-per-segment array with -250 inter-word kerns (how real
    writers express justified text); 'Tstar' = word-per-line via
    TL/T* (all words share one block, joined by the parser); 'hex' =
    single-byte hex string; 'hexTJ' = kerned TJ array of hex segments;
    'cid' = 2-byte CID codes through ``enc`` (Type0 font + /ToUnicode
    CMap — the encoding real Word/LaTeX writers emit); 'winansi' =
    literal string in WinAnsiEncoding (cp1252) bytes."""
    head = f"BT /F1 {size:g} Tf 1 0 0 1 {x:g} {y_pdf:g} Tm"
    if style == "TJ":
        arr = " -250 ".join(f"({_escape(w)})" for w in text.split(" "))
        return f"{head} [{arr}] TJ ET"
    if style == "hex":
        return f"{head} <{text.encode('latin-1', 'replace').hex()}> Tj ET"
    if style == "hexTJ":
        arr = " -250 ".join(
            f"<{w.encode('latin-1', 'replace').hex()}>" for w in text.split(" ")
        )
        return f"{head} [{arr}] TJ ET"
    if style == "cid":
        arr = " -250 ".join(f"<{enc(w)}>" for w in text.split(" "))
        return f"{head} [{arr}] TJ ET"
    if style == "winansi":
        safe = text.encode("cp1252", "replace").decode("latin-1")
        return f"{head} ({_escape(safe)}) Tj ET"
    if style == "diffenc":
        # literal string of /Differences-remapped single-byte codes
        return f"{head} ({_escape(enc(text))}) Tj ET"
    if style == "Tstar":
        words = text.split(" ")
        body = f" ({_escape(words[0])}) Tj"
        for w in words[1:]:
            body += f" T* ({_escape(w)}) Tj"
        # tiny leading keeps multi-word blocks inside their strip
        return f"{head} 0.01 TL{body} ET"
    return f"{head} ({_escape(text)}) Tj ET"


def _tounicode_cmap(code_of: dict[str, int]) -> bytes:
    """ToUnicode CMap stream body for a char -> CID code map, using
    bfrange for runs (consecutive codes mapping to consecutive BMP
    codepoints) and bfchar for the rest, 100 entries per block as the
    Adobe CMap spec requires."""
    items = sorted((code, ch) for ch, code in code_of.items())
    singles: list[tuple[int, str]] = []
    ranges: list[list[tuple[int, int]]] = []
    run: list[tuple[int, int]] = []

    def flush():
        nonlocal run
        if len(run) >= 3:
            ranges.append(run)
        else:
            singles.extend((c, chr(p)) for c, p in run)
        run = []

    for code, ch in items:
        cp = ord(ch)
        if cp > 0xFFFF:  # non-BMP: surrogate-pair bfchar
            flush()
            singles.append((code, ch))
            continue
        if run and code == run[-1][0] + 1 and cp == run[-1][1] + 1:
            run.append((code, cp))
        else:
            flush()
            run = [(code, cp)]
    flush()
    parts = [
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
    ]
    for i in range(0, len(ranges), 100):
        chunk = ranges[i : i + 100]
        parts.append(f"{len(chunk)} beginbfrange\n")
        for r in chunk:
            parts.append(f"<{r[0][0]:04x}> <{r[-1][0]:04x}> <{r[0][1]:04x}>\n")
        parts.append("endbfrange\n")
    for i in range(0, len(singles), 100):
        chunk = singles[i : i + 100]
        parts.append(f"{len(chunk)} beginbfchar\n")
        for code, ch in chunk:
            parts.append(f"<{code:04x}> <{ch.encode('utf-16-be').hex()}>\n")
        parts.append("endbfchar\n")
    parts.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    return "".join(parts).encode("ascii")


# writer-side encoders for each decodable filter; a '+'-joined spec
# like "a85+flate" lists filters in DECODE order (the /Filter array
# order), so the writer applies them right-to-left when encoding
_ENCODERS: dict[str, tuple[bytes, object]] = {
    "flate": (b"/FlateDecode", lambda d: zlib.compress(d, 6)),
    "ahx": (b"/ASCIIHexDecode", lambda d: d.hex().encode("ascii") + b">"),
    "a85": (
        b"/ASCII85Decode",
        lambda d: __import__("base64").a85encode(d) + b"~>",
    ),
    "rl": (b"/RunLengthDecode", None),  # bound below (needs a loop)
    "lzw": (b"/LZWDecode", lambda d: _lzw_encode(d)),
}


def _rl_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # repeat run of >= 3 identical bytes
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run up to the next 3-byte repeat (max 128)
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)  # EOD
    return bytes(out)


_ENCODERS["rl"] = (b"/RunLengthDecode", _rl_encode)


def _stream_obj(
    content: bytes, compress: bool | str, extra: bytes = b""
) -> bytes:
    if compress:
        spec = "flate" if compress is True else str(compress)
        names = [s.strip() for s in spec.split("+") if s.strip()]
        data = content
        for s in reversed(names):  # encode right-to-left of decode order
            data = _ENCODERS[s][1](data)
        filt_names = b" ".join(_ENCODERS[s][0] for s in names)
        filt = (
            b" /Filter " + filt_names
            if len(names) == 1
            else b" /Filter [" + filt_names + b"]"
        )
    else:
        data, filt = content, b""
    # /Length counts ONLY the stream data; the EOL before 'endstream'
    # is a separator the spec excludes (ISO 32000-1 §7.3.8.2)
    return b"<< /Length %d%s%s >>\nstream\n%s\nendstream" % (
        len(data), filt, extra, data,
    )


def build_pdf_pages(
    pages: list[list[tuple[str, float, float, float]]],
    page_w: float = DEFAULT_PAGE_W,
    page_h: float = DEFAULT_PAGE_H,
    compress: bool | str = False,
    style: str = "Tj",
    objstm: bool = False,
) -> bytes:
    """pages: one list of (string, font_size, x, y_top) per page ->
    valid PDF bytes with a real page tree, per-page content streams
    (FlateDecode-compressed when ``compress``), and a correct xref
    table.  ``y_top`` is top-left-origin; converted to the PDF baseline
    here so the parser's inverse conversion round-trips.

    ``objstm=True`` emits the PDF 1.5+ layout: catalog, page tree, and
    page dicts packed into one FlateDecode /ObjStm object stream
    (ISO 32000-1 §7.5.7) — the shape modern writers produce — with the
    content streams as regular objects."""
    n = len(pages)
    enc = None
    tounicode: bytes | None = None
    diff_array: str | None = None
    if style == "diffenc":
        # every distinct char gets a remapped single-byte code (33+)
        # declared through an /Encoding /Differences array — the
        # simple-font remap real subset-embedding writers emit
        chars = sorted({c for texts in pages for t, *_ in texts for c in t})
        if len(chars) > 222:
            raise ValueError("diffenc fixture writer: >222 distinct chars")
        code_of2 = {c: 33 + i for i, c in enumerate(chars)}

        def enc(s, _m=code_of2):
            return "".join(chr(_m[c]) for c in s)

        def _name_of(c: str) -> str:
            if c.isascii() and (c.isalpha() or c.isdigit()):
                return c if c.isalpha() else (
                    "zero one two three four five six seven eight nine"
                    .split()[int(c)]
                )
            cp = ord(c)
            return f"u{cp:06X}" if cp > 0xFFFF else f"uni{cp:04X}"

        diff_array = "33 " + " ".join(f"/{_name_of(c)}" for c in chars)
    if style == "cid":
        chars = sorted({c for texts in pages for t, *_ in texts for c in t if c != " "})
        code_of = {c: i + 1 for i, c in enumerate(chars)}
        # pre-formatted 4-hex-digit strings: one dict build per doc
        # replaces an f-string format per CHARACTER (r6 profile: the
        # per-char format genexpr was the top synth cost)
        hex_of = {c: format(i + 1, "04x") for i, c in enumerate(chars)}

        def enc(s, _m=hex_of):
            return "".join(map(_m.__getitem__, s))

        tounicode = _tounicode_cmap(code_of)
    contents: list[bytes] = []
    for texts in pages:
        ops = [
            _show_ops(text, size, x, page_h - y_top - size, style, enc)
            for text, size, x, y_top in texts
        ]
        contents.append("\n".join(ops).encode("latin-1"))

    if style == "cid":
        # ToUnicode stream appended as the LAST regular object
        tu_num = (n + 2) if objstm else (4 + 2 * n)
        font_dict = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-Identity"
            f" /Encoding /Identity-H /ToUnicode {tu_num} 0 R >>"
        ).encode()
    elif style == "winansi":
        font_dict = (
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /Encoding /WinAnsiEncoding >>"
        )
    elif style == "diffenc":
        font_dict = (
            "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            " /Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding"
            f" /Differences [{diff_array}] >> >>"
        ).encode("latin-1")
    else:
        font_dict = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    if objstm:
        # regular objs: 1 = ObjStm, 2..n+1 = content streams; embedded
        # (inside the ObjStm): 100 catalog, 101 pages, 102 font,
        # 103+i page dicts
        kids = " ".join(f"{103 + i} 0 R" for i in range(n))
        embedded: list[tuple[int, bytes]] = [
            (100, b"<< /Type /Catalog /Pages 101 0 R >>"),
            (101, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
            (102, font_dict),
        ]
        for i in range(n):
            embedded.append(
                (
                    103 + i,
                    (
                        f"<< /Type /Page /Parent 101 0 R"
                        f" /MediaBox [0 0 {page_w:g} {page_h:g}]"
                        f" /Contents {2 + i} 0 R"
                        f" /Resources << /Font << /F1 102 0 R >> >> >>"
                    ).encode(),
                )
            )
        bodies = [b for _, b in embedded]
        offs, pos = [], 0
        for b in bodies:
            offs.append(pos)
            pos += len(b) + 1
        header = " ".join(
            f"{num} {off}" for (num, _), off in zip(embedded, offs)
        ).encode() + b"\n"
        stm_data = header + b"\n".join(bodies) + b"\n"
        objs = [
            _stream_obj(
                stm_data,
                compress=True,
                extra=b" /Type /ObjStm /N %d /First %d" % (len(embedded), len(header)),
            )
        ]
        objs += [_stream_obj(c, compress) for c in contents]
        if tounicode is not None:
            objs.append(_stream_obj(tounicode, compress))
        root = b"100 0 R"
    else:
        # obj numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
        kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n))
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
            font_dict,
        ]
        for i, texts in enumerate(pages):
            objs.append(
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {page_w:g} {page_h:g}]"
                    f" /Contents {5 + 2 * i} 0 R"
                    f" /Resources << /Font << /F1 3 0 R >> >> >>"
                ).encode()
            )
            objs.append(_stream_obj(contents[i], compress))
        if tounicode is not None:
            objs.append(_stream_obj(tounicode, compress))
        root = b"1 0 R"
    out = bytearray(b"%PDF-1.5\n" if objstm else b"%PDF-1.4\n")
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
        b"trailer\n<< /Size %d /Root %s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, root, xref_at)
    )
    return bytes(out)


def build_pdf(
    texts: list[tuple[str, float, float, float]],
    page_w: float = DEFAULT_PAGE_W,
    page_h: float = DEFAULT_PAGE_H,
    compress: bool | str = False,
    style: str = "Tj",
    objstm: bool = False,
) -> bytes:
    """Single-page convenience wrapper over :func:`build_pdf_pages`."""
    return build_pdf_pages([texts], page_w, page_h, compress, style, objstm)
