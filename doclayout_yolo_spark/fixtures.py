"""Seeded synthetic ``pages`` table generator (the input-hint table).

Schema per BASELINE.json:input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Design mirrors the reference's mesh-candidate BestFit synthetic-data
ETL (mesh-candidate_bestfit/bestfit_generator.py:16-119: seeded layout
synthesis, Pool fan-out ≙ partition parallelism; page-size sampling
utils/process.py:30-42) but emits HTML pages instead of pixels: title,
section headers, paragraphs, list items, figure+caption, table, and
boilerplate blocks (nav / header / footer / ads) that the extractor
must strip.  Host distribution is deliberately skewed (a few hot
hosts) to exercise salting.

Everything is keyed on a per-url PRNG seed -> regenerating with the
same seed is byte-stable, at any parallelism.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timezone

import numpy as np
import pandas as pd

GLOBAL_SEED = 42

# zipf-ish skew: host i gets weight 1/(i+1)^1.2; host 0 is hot.
HOSTS = [f"host{i:02d}.example.org" for i in range(24)]
_HOST_W = np.array([1.0 / (i + 1) ** 1.2 for i in range(len(HOSTS))])
_HOST_P = _HOST_W / _HOST_W.sum()

_WORDS = (
    "data layout page region table figure caption document spark batch "
    "stream extract content header model anchor score merge shuffle "
    "partition vector column text block title order index hash salt"
).split()

_LANGS = ["en"] * 17 + ["de", "fr", "es"]


def _rng_for(url: str) -> np.random.RandomState:
    h = hashlib.md5(f"{GLOBAL_SEED}:{url}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "big"))


def _sentence(rng: np.random.RandomState, lo: int = 6, hi: int = 18) -> str:
    n = int(rng.randint(lo, hi))
    ws = [_WORDS[int(i)] for i in rng.randint(0, len(_WORDS), n)]
    s = " ".join(ws)
    return s[0].upper() + s[1:] + "."


def _paragraph(rng: np.random.RandomState) -> str:
    return " ".join(_sentence(rng) for _ in range(int(rng.randint(2, 6))))


def url_for(i: int) -> str:
    """Deterministic skewed url for row i (host choice seeded by i)."""
    r = np.random.RandomState(GLOBAL_SEED * 1_000_003 + i)
    host = HOSTS[int(r.choice(len(HOSTS), p=_HOST_P))]
    return f"https://{host}/article/{i:08d}"


def make_page(
    url: str, sections: tuple[int, int] = (2, 6)
) -> tuple[bytes, str, str]:
    """Render one seeded HTML page.  Returns (html_bytes, naive_text, lang).

    ``sections`` bounds the per-page section count: the default yields
    ~4 KB pages (fast unit tests); scaling benchmarks pass a larger
    range to approximate real Common-Crawl page weights (tens of KB).
    Byte-stable for a fixed (url, sections)."""
    rng = _rng_for(url)
    title = _sentence(rng, 3, 8).rstrip(".")
    lang = _LANGS[int(rng.randint(0, len(_LANGS)))]
    parts: list[str] = [
        "<!DOCTYPE html><html><head>",
        f"<title>{title}</title>",
        "<style>body{margin:0}</style>",
        '<script>var x = "tracking";</script>',
        "</head><body>",
        # boilerplate: nav + header (abandon regions)
        "<nav><ul>",
    ]
    visible: list[str] = []
    for j in range(int(rng.randint(3, 7))):
        nav = _WORDS[int(rng.randint(0, len(_WORDS)))]
        parts.append(f'<li><a href="/{nav}">{nav}</a></li>')
        visible.append(nav)
    parts.append("</ul></nav>")
    hdr = _sentence(rng, 3, 6)
    parts.append(f"<header><p>{hdr} <a href='/home'>home</a></p></header>")
    visible.append(hdr + " home")

    parts.append(f"<h1>{title}</h1>")
    visible.append(title)

    n_sections = int(rng.randint(sections[0], sections[1]))
    for s in range(n_sections):
        h2 = _sentence(rng, 3, 7).rstrip(".")
        parts.append(f"<h2>{h2}</h2>")
        visible.append(h2)
        for _ in range(int(rng.randint(1, 4))):
            p = _paragraph(rng)
            parts.append(f"<p>{p}</p>")
            visible.append(p)
        if rng.rand() < 0.4:
            parts.append("<ul>")
            for _ in range(int(rng.randint(2, 5))):
                li = _sentence(rng)
                parts.append(f"<li>{li}</li>")
                visible.append(li)
            parts.append("</ul>")
        if rng.rand() < 0.35:
            cap = _sentence(rng, 4, 9)
            parts.append(
                f'<figure><img src="/img/{s}.png" alt="diagram"/>'
                f"<figcaption>Figure {s + 1}: {cap}</figcaption></figure>"
            )
            visible.append(f"Figure {s + 1}: {cap}")
        if rng.rand() < 0.3:
            parts.append("<table>")
            cells: list[str] = []
            for _r in range(int(rng.randint(2, 4))):
                parts.append("<tr>")
                for _c in range(3):
                    cell = _WORDS[int(rng.randint(0, len(_WORDS)))]
                    parts.append(f"<td>{cell}</td>")
                    cells.append(cell)
                parts.append("</tr>")
            parts.append("</table>")
            visible.append(" ".join(cells))
        if rng.rand() < 0.3:
            # ad block: high link density div content (abandon by heuristics)
            ad = _WORDS[int(rng.randint(0, len(_WORDS)))]
            parts.append(
                f'<aside><p><a href="/ad">{ad} subscribe now</a></p></aside>'
            )
            visible.append(f"{ad} subscribe now")
    parts.append(
        "<footer><p>copyright 2026 example "
        '<a href="/privacy">privacy</a> <a href="/terms">terms</a></p></footer>'
    )
    visible.append("copyright 2026 example privacy terms")
    parts.append("</body></html>")
    html = "".join(parts).encode("utf-8")
    return html, " ".join(visible), lang


def make_rows(
    indices: np.ndarray, sections: tuple[int, int] = (2, 6)
) -> pd.DataFrame:
    """Rows of the pages table for the given row indices (vector-safe:
    called per Arrow batch from the distributed generator)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    base = datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp()
    for i in indices:
        i = int(i)
        url = url_for(i)
        html, text, lang = make_page(url, sections)
        urls.append(url)
        tss.append(datetime.fromtimestamp(base + (i % 86400) * 37, tz=timezone.utc))
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
    return pd.DataFrame(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs}
    )


def generate_pages_pandas(n: int) -> pd.DataFrame:
    return make_rows(np.arange(n))


PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def generate_pages_df(
    spark, n: int, partitions: int | None = None,
    sections: tuple[int, int] = (2, 6),
):
    """Distributed seeded generation: ``spark.range(n)`` fan-out with
    per-row seeds (Pool.starmap ≙ partition parallelism, SURVEY §3.3).
    Safe at any scale — no driver-side materialization."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    parts = partitions or spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n, 1, parts).select(F.col("id"))

    def gen(batches):
        for pdf in batches:
            yield make_rows(pdf["id"].to_numpy(), sections)

    return rng_df.mapInPandas(gen, schema=PAGES_DDL)


def make_pdf_rows(ids) -> "pd.DataFrame":
    """Seeded single-page PDFs: title (24pt), 2-4 body paragraphs
    (12pt), a footer line inside the boilerplate strip.  Deterministic
    per id; body wording reuses the HTML generator's vocabulary so the
    two formats exercise the same text statistics."""
    import numpy as np  # noqa: PLC0415

    from .pdf import build_pdf  # noqa: PLC0415

    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    base_ts = pd.Timestamp("2026-01-01")
    for i in ids:
        rng = np.random.RandomState(982_451_653 ^ int(i))
        n_par = int(rng.randint(2, 5))
        title = f"Pdf document {int(i)} " + " ".join(
            rng.choice(_WORDS, 3).tolist()
        )
        texts = [(title, 24.0, 60.0, 80.0)]
        body = []
        y = 140.0
        for _ in range(n_par):
            para = " ".join(rng.choice(_WORDS, int(rng.randint(15, 40))).tolist())
            texts.append((para, 12.0, 60.0, y))
            body.append(para)
            y += 30.0 + float(rng.randint(0, 10))
        texts.append((f"copyright {int(i)} example corp", 9.0, 60.0, 760.0))
        rows["url"].append(f"https://pdfhost{int(i) % 7:02d}.example.com/doc/{int(i)}.pdf")
        rows["warc_ts"].append(base_ts + pd.Timedelta(seconds=int(i)))
        rows["html"].append(build_pdf(texts))
        rows["text"].append(" ".join(body))
        rows["lang"].append("en")
    return pd.DataFrame(rows)


def generate_pdf_pages_df(spark, n: int, partitions: int | None = None):
    """Distributed seeded PDF pages in the same (url, warc_ts, html,
    text, lang) input-hint schema — `html` carries PDF bytes; the
    extraction dispatcher routes on the %PDF- magic."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    parts = partitions or spark.sparkContext.defaultParallelism
    rng_df = spark.range(0, n, 1, parts).select(F.col("id"))

    def gen(batches):
        for pdf in batches:
            yield make_pdf_rows(pdf["id"].to_numpy())

    return rng_df.mapInPandas(gen, schema=PAGES_DDL)
