"""Detection-semantics queries over driver testdata.

The testdata has no boxes, so detections/ground truth are *derived
deterministically* from the ``events`` table with pure integer
arithmetic (identical in Spark and DuckDB), then the reference's
relational post-processing semantics run on them:

- ``det_postprocess_sql``: confidence filter (F1, predict.py:23),
  class allow-filter dropping 'abandon' id 2 (F2, predict.py:24-25),
  xywh->xyxy conversion (C1, ops.py:382-400), clip (C2, ops.py:305-324)
  — fully SQL-expressible, oracle-checked.
- ``det_iou_best_match``: per-document IoU theta-join (J1,
  metrics.py:53-72) + best-match-per-detection ranking (J2's
  relational rendering, validator.py:249-289).
- ``det_grouped_postprocess``: the REAL kernel (two-stage top-k + NMS
  + reading order) via applyInPandas per doc — not SQL-expressible
  (greedy NMS), so no oracle: driver records the rows-only check.

Plus the flagship: ``extract_pages`` — wraps ``documents`` rows into
HTML pages and runs the full extraction pipeline; for this controlled
page shape the extracted text is provably ``'Doc <id>\\n\\n<text>'``,
which gives the full pipeline a value-hash SQL oracle.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from .kernels import postprocess
from .pipeline import extract_pages

PAGE = 1000.0


def _events(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _derived_dets(spark, sf_dir):
    """Deterministic synthetic detections: integer arithmetic on
    event_id only — bit-identical across engines."""
    ev = _events(spark, sf_dir)
    e = F.col("event_id")
    return ev.select(
        (F.col("user_id") % 50).alias("doc"),
        e.alias("det_id"),
        ((e * 37) % 800 + 50).cast("double").alias("cx"),
        ((e * 53) % 800 + 50).cast("double").alias("cy"),
        ((e * 7) % 300 + 100).cast("double").alias("w"),
        ((e * 11) % 240 + 80).cast("double").alias("h"),
        (((e * 13) % 100) / 100.0).alias("conf"),
        # NOT e % 10: class parity must not correlate with the even/odd
        # det-vs-gt split used by det_iou_best_match
        F.floor((e % 20) / 2.0).alias("cls"),
    )


_DERIVED_DUCK = """
  SELECT user_id % 50 AS doc, event_id AS det_id,
         CAST((event_id * 37) % 800 + 50 AS DOUBLE) AS cx,
         CAST((event_id * 53) % 800 + 50 AS DOUBLE) AS cy,
         CAST((event_id * 7) % 300 + 100 AS DOUBLE) AS w,
         CAST((event_id * 11) % 240 + 80 AS DOUBLE) AS h,
         ((event_id * 13) % 100) / 100.0 AS conf,
         -- Spark F.floor -> BIGINT; DuckDB FLOOR -> DOUBLE. Cast so the
         -- value hash matches when cls reaches the output.
         CAST(FLOOR((event_id % 20) / 2.0) AS BIGINT) AS cls
  FROM events
"""


def det_postprocess_sql(spark, sf_dir):
    d = _derived_dets(spark, sf_dir)
    x1 = F.col("cx") - F.col("w") / 2.0
    y1 = F.col("cy") - F.col("h") / 2.0
    x2 = F.col("cx") + F.col("w") / 2.0
    y2 = F.col("cy") + F.col("h") / 2.0
    clip = lambda c: F.greatest(F.lit(0.0), F.least(F.lit(PAGE), c))  # noqa: E731
    return (
        d.filter((F.col("conf") > 0.25) & (F.col("cls") != 2))
        .select(
            "doc",
            "det_id",
            clip(x1).alias("x1"),
            clip(y1).alias("y1"),
            clip(x2).alias("x2"),
            clip(y2).alias("y2"),
            "conf",
            "cls",
        )
    )


DET_POSTPROCESS_SQL = f"""
WITH d AS ({_DERIVED_DUCK})
SELECT doc, det_id,
       GREATEST(0.0, LEAST({PAGE}, cx - w / 2.0)) AS x1,
       GREATEST(0.0, LEAST({PAGE}, cy - h / 2.0)) AS y1,
       GREATEST(0.0, LEAST({PAGE}, cx + w / 2.0)) AS x2,
       GREATEST(0.0, LEAST({PAGE}, cy + h / 2.0)) AS y2,
       conf, cls
FROM d WHERE conf > 0.25 AND cls <> 2
"""


def det_iou_best_match(spark, sf_dir):
    d = _derived_dets(spark, sf_dir)
    boxed = d.select(
        "doc",
        "det_id",
        "cls",
        (F.col("cx") - F.col("w") / 2.0).alias("x1"),
        (F.col("cy") - F.col("h") / 2.0).alias("y1"),
        (F.col("cx") + F.col("w") / 2.0).alias("x2"),
        (F.col("cy") + F.col("h") / 2.0).alias("y2"),
    )
    dets = boxed.filter(F.col("det_id") % 2 == 0).select(
        "doc", F.col("det_id"), F.col("cls"),
        *[F.col(c).alias(f"d_{c}") for c in ("x1", "y1", "x2", "y2")],
    )
    gts = boxed.filter(F.col("det_id") % 2 == 1).select(
        "doc", F.col("det_id").alias("gt_id"), F.col("cls").alias("gt_cls"),
        *[F.col(c).alias(f"g_{c}") for c in ("x1", "y1", "x2", "y2")],
    )
    ix = F.greatest(
        F.lit(0.0),
        F.least(F.col("d_x2"), F.col("g_x2")) - F.greatest(F.col("d_x1"), F.col("g_x1")),
    )
    iy = F.greatest(
        F.lit(0.0),
        F.least(F.col("d_y2"), F.col("g_y2")) - F.greatest(F.col("d_y1"), F.col("g_y1")),
    )
    inter = ix * iy
    area_d = (F.col("d_x2") - F.col("d_x1")) * (F.col("d_y2") - F.col("d_y1"))
    area_g = (F.col("g_x2") - F.col("g_x1")) * (F.col("g_y2") - F.col("g_y1"))
    iou = F.round(inter / (area_d + area_g - inter), 6)
    pairs = (
        dets.join(gts, ["doc"])
        .filter(F.col("cls") == F.col("gt_cls"))
        .select("doc", "det_id", "gt_id", "cls", iou.alias("iou"))
        .filter(F.col("iou") > 0.1)
    )
    w = W.partitionBy("doc", "det_id").orderBy(F.desc("iou"), F.asc("gt_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


DET_IOU_SQL = f"""
WITH d AS ({_DERIVED_DUCK}),
boxed AS (
  SELECT doc, det_id, cls,
         cx - w / 2.0 AS x1, cy - h / 2.0 AS y1,
         cx + w / 2.0 AS x2, cy + h / 2.0 AS y2
  FROM d
),
pairs AS (
  SELECT a.doc, a.det_id, b.det_id AS gt_id, a.cls,
         ROUND(
           GREATEST(0.0, LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1)) *
           GREATEST(0.0, LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1)) /
           ((a.x2 - a.x1) * (a.y2 - a.y1) + (b.x2 - b.x1) * (b.y2 - b.y1)
            - GREATEST(0.0, LEAST(a.x2, b.x2) - GREATEST(a.x1, b.x1)) *
              GREATEST(0.0, LEAST(a.y2, b.y2) - GREATEST(a.y1, b.y1))), 6) AS iou
  FROM boxed a JOIN boxed b
    ON a.doc = b.doc AND a.cls = b.cls
   AND a.det_id % 2 = 0 AND b.det_id % 2 = 1
)
SELECT doc, det_id, gt_id, cls, iou FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc, det_id ORDER BY iou DESC, gt_id ASC) AS rn
  FROM pairs WHERE iou > 0.1
) WHERE rn = 1
"""


# --- the real grouped NMS kernel (no SQL oracle: greedy NMS) --------------------

GROUPED_DDL = "doc long, x1 double, y1 double, x2 double, y2 double, conf double, cls long"


def _grouped_kernel(pdf):
    import pandas as pd  # noqa: PLC0415

    # applyInPandas delivers group rows in shuffle-arrival order; the
    # kernel's tie-breaks pin on input (anchor) index, so sort by det_id
    # first to make the output value-deterministic across runs
    pdf = pdf.sort_values("det_id")
    doc = int(pdf["doc"].iloc[0])
    boxes = pdf[["cx", "cy", "w", "h"]].to_numpy(dtype=np.float32)
    nc = 10
    scores = np.zeros((len(pdf), nc), dtype=np.float32)
    scores[np.arange(len(pdf)), pdf["cls"].to_numpy()] = pdf["conf"].to_numpy()
    out = postprocess(boxes, scores, conf_thres=0.25, iou_thres=0.7,
                      max_det=300, drop_classes=(2,))
    return pd.DataFrame(
        {
            "doc": doc,
            "x1": out["x1"].astype(float),
            "y1": out["y1"].astype(float),
            "x2": out["x2"].astype(float),
            "y2": out["y2"].astype(float),
            "conf": out["conf"].astype(float),
            "cls": out["cls"],
        }
    )


def det_grouped_postprocess(spark, sf_dir):
    d = _derived_dets(spark, sf_dir)
    return d.groupBy("doc").applyInPandas(_grouped_kernel, schema=GROUPED_DDL)


# --- flagship: full extraction over pages built from documents -------------------

def _pages_from_documents(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    html = F.concat(
        F.lit("<html><head><title>d</title></head><body>"
              "<nav><p><a href=\"/x\">home</a></p></nav><h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><footer><p>copyright</p></footer></body></html>"),
    )
    return d.select(
        F.concat(F.lit("https://testdata.local/doc/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )


def extract_pages_flagship(spark, sf_dir):
    pages = _pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", "extracted_text", "n_regions", "n_blocks")


# provable closed form for this controlled page shape: nav+footer are
# boilerplate (stripped), h1 -> 'Doc <id>', p -> text, separator '\n\n'.
FLAGSHIP_SQL = """
SELECT 'https://testdata.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text AS extracted_text,
       CAST(2 AS INT) AS n_regions,
       CAST(4 AS INT) AS n_blocks
FROM documents
"""


def extract_region_rows(spark, sf_dir):
    """Span-level long table (the S11 txt-per-region sink rendering):
    every region of the full extraction pipeline, value-checked against
    the closed form provable for this controlled page shape."""
    pages = _pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", F.explode("spans").alias("s")).select(
        "url",
        F.col("s.region_id").alias("region_id"),
        F.col("s.cls").alias("cls"),
        F.col("s.name").alias("name"),
        F.col("s.conf").alias("conf"),
        F.col("s.x1").alias("x1"),
        F.col("s.y1").alias("y1"),
        F.col("s.x2").alias("x2"),
        F.col("s.y2").alias("y2"),
        F.col("s.start").alias("span_start"),
        F.col("s.end").alias("span_end"),
    )


# closed form (verified against the kernel): title block 'Doc <id>'
# at y 90..130, text block at y1 142, height 18*ceil(len/90), both
# conf sigmoid32(3.0) -> 0.95257, x 96..900; spans joined by '\n\n'.
REGION_ROWS_SQL = """
WITH base AS (
  SELECT 'https://testdata.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
         LENGTH('Doc ' || CAST(doc_id AS VARCHAR)) AS tlen,
         LENGTH(text) AS xlen
  FROM documents
)
SELECT url, CAST(0 AS INT) AS region_id, CAST(0 AS BIGINT) AS cls,
       'title' AS name, CAST(0.95257 AS DOUBLE) AS conf,
       CAST(96 AS DOUBLE) AS x1, CAST(90 AS DOUBLE) AS y1,
       CAST(900 AS DOUBLE) AS x2, CAST(130 AS DOUBLE) AS y2,
       CAST(0 AS INT) AS span_start, CAST(tlen AS INT) AS span_end
FROM base
UNION ALL
SELECT url, CAST(1 AS INT), CAST(1 AS BIGINT), 'plain text', CAST(0.95257 AS DOUBLE),
       CAST(96 AS DOUBLE), CAST(142 AS DOUBLE), CAST(900 AS DOUBLE),
       CAST(142 + 18 * CEIL(xlen / 90.0) AS DOUBLE),
       CAST(tlen + 2 AS INT), CAST(tlen + 2 + xlen AS INT)
FROM base
"""


def detection_map(spark, sf_dir):
    """Full mAP pipeline over derived dets/gts (greedy IoU match ->
    per-class distributed AP reduction, 101-pt interpolation).  Greedy
    matching is not SQL-expressible, so the oracle is a golden snapshot
    generated from the pytest-trusted NumPy path
    (tools/gen_golden_oracles.py -> tests/golden/sf0.01/)."""
    from .metrics import ap_per_class, match_table  # noqa: PLC0415

    d = _derived_dets(spark, sf_dir)
    boxed = d.select(
        F.col("doc").cast("string").alias("doc"),
        "det_id",
        "cls",
        (F.col("cx") - F.col("w") / 2.0).alias("x1"),
        (F.col("cy") - F.col("h") / 2.0).alias("y1"),
        (F.col("cx") + F.col("w") / 2.0).alias("x2"),
        (F.col("cy") + F.col("h") / 2.0).alias("y2"),
        "conf",
    )
    dets = boxed.filter(F.col("det_id") % 2 == 0)
    gts = boxed.filter(F.col("det_id") % 2 == 1).select(
        "doc", F.col("det_id").alias("gt_id"), "x1", "y1", "x2", "y2", "cls"
    )
    gt_counts = {
        int(r["cls"]): r["n"]
        for r in gts.groupBy("cls").agg(F.count("*").alias("n")).collect()
    }
    return ap_per_class(match_table(dets, gts), gt_counts)


def det_confusion_matrix(spark, sf_dir):
    """True (nc+1)^2 detection confusion matrix with background row/col
    (utils/metrics.py:284-384 ConfusionMatrix semantics: conf 0.25,
    class-agnostic IoU 0.45 greedy matching, unmatched gt -> background
    row, unmatched det -> background col).  Greedy matching is not
    SQL-expressible -> golden-snapshot oracle."""
    from .metrics import confusion_matrix  # noqa: PLC0415

    d = _derived_dets(spark, sf_dir)
    boxed = d.select(
        "doc",
        "det_id",
        "cls",
        "conf",
        (F.col("cx") - F.col("w") / 2.0).alias("x1"),
        (F.col("cy") - F.col("h") / 2.0).alias("y1"),
        (F.col("cx") + F.col("w") / 2.0).alias("x2"),
        (F.col("cy") + F.col("h") / 2.0).alias("y2"),
    )
    dets = boxed.filter(F.col("det_id") % 2 == 0)
    gts = boxed.filter(F.col("det_id") % 2 == 1)
    return confusion_matrix(dets, gts, nc=10)


def coco_json_predictions(spark, sf_dir):
    """COCO-JSON predictions sink (models/yolo/detect/val.py:261-275
    pred_to_json): one JSON object per detection with xywh bbox (top-
    left corner + size, bbox rounded to 3 dp, score to 5 dp), built
    with deterministic string ops so both engines emit byte-equal
    JSON."""
    d = det_postprocess_sql(spark, sf_dir)
    w = F.col("x2") - F.col("x1")
    h = F.col("y2") - F.col("y1")
    json = F.format_string(
        '{"image_id":%s,"category_id":%s,"bbox":[%s,%s,%s,%s],"score":%s}',
        F.col("doc").cast("string"),
        F.col("cls").cast("string"),
        F.round(F.col("x1"), 3).cast("string"),
        F.round(F.col("y1"), 3).cast("string"),
        F.round(w, 3).cast("string"),
        F.round(h, 3).cast("string"),
        F.round(F.col("conf"), 5).cast("string"),
    )
    return d.select("doc", "det_id", json.alias("pred_json"))


COCO_JSON_SQL = f"""
WITH d AS ({_DERIVED_DUCK}),
f AS (
  SELECT doc, det_id,
         GREATEST(0.0, LEAST({PAGE}, cx - w / 2.0)) AS x1,
         GREATEST(0.0, LEAST({PAGE}, cy - h / 2.0)) AS y1,
         GREATEST(0.0, LEAST({PAGE}, cx + w / 2.0)) AS x2,
         GREATEST(0.0, LEAST({PAGE}, cy + h / 2.0)) AS y2,
         conf, cls
  FROM d WHERE conf > 0.25 AND cls <> 2
)
SELECT doc, det_id,
       '{{"image_id":' || CAST(doc AS VARCHAR) ||
       ',"category_id":' || CAST(cls AS VARCHAR) ||
       ',"bbox":[' || CAST(ROUND(x1, 3) AS VARCHAR) ||
       ',' || CAST(ROUND(y1, 3) AS VARCHAR) ||
       ',' || CAST(ROUND(x2 - x1, 3) AS VARCHAR) ||
       ',' || CAST(ROUND(y2 - y1, 3) AS VARCHAR) ||
       '],"score":' || CAST(ROUND(conf, 5) AS VARCHAR) || '}}' AS pred_json
FROM f
"""


def refine_region_scores(spark, sf_dir):
    """Refinement-MLP stage over extracted regions (rows-only: frozen
    seeded weights, NumPy matmul inside mapInPandas)."""
    from .refine import refine_regions  # noqa: PLC0415

    pages = _pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, n_buckets=64)
    return refine_regions(out)


def _pdf_pages_from_documents(spark, sf_dir, compress=False, style="Tj", objstm=False):
    """Wrap documents rows into minimal single-page PDFs (title at
    24pt, body at 12pt, footer in the boilerplate strip) — the PDF
    twin of ``_pages_from_documents``.  ``compress``/``style`` select
    FlateDecode streams and the show-operator family (Tj literal vs
    kerned TJ arrays); all variants extract identical text."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def kernel(batches):
        import pandas as pd  # noqa: PLC0415

        from doclayout_yolo_spark.pdf import build_pdf  # noqa: PLC0415

        for pdf in batches:
            urls, htmls = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # PDF literal strings are byte strings: project text to
                # latin-1 (unmappable -> '?') so a single exotic char
                # can never kill the synthesis task; mirrored in the
                # oracle's closed form
                safe = str(text).encode("latin-1", "replace").decode("latin-1")
                urls.append(f"https://testdata.local/pdf/{int(doc_id)}.pdf")
                htmls.append(
                    build_pdf(
                        [
                            (f"Doc {int(doc_id)}", 24.0, 60.0, 80.0),
                            (safe, 12.0, 60.0, 150.0),
                            ("copyright example", 9.0, 60.0, 760.0),
                        ],
                        compress=compress,
                        style=style,
                        objstm=objstm,
                    )
                )
            yield pd.DataFrame({"url": urls, "html": htmls})

    return d.mapInPandas(kernel, schema="url string, html binary")


def extract_pdf_pages(spark, sf_dir):
    """Full extraction over PDF inputs (the north rule's PDF/layout
    parse leg): dispatcher routes on the %PDF- magic, the shared
    detector/NMS/reading-order pipeline does the rest.  Closed form
    for this controlled shape: title block 'Doc <id>' + body text,
    footer stripped as boilerplate."""
    pages = _pdf_pages_from_documents(spark, sf_dir)
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", "extracted_text", "n_regions", "n_blocks")


def extract_pdf_pages_multipage(spark, sf_dir):
    """Two-page PDF twin: page 1 carries the title + first half of the
    body, page 2 the second half + a footer inside page 2's boilerplate
    strip.  The parser lays pages out as a continuous scroll, so the
    extracted text equals title + half1 + half2 — the oracle closed
    form splits the text at the same midpoint token boundary."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def kernel(batches):
        import pandas as pd  # noqa: PLC0415

        from doclayout_yolo_spark.pdf import build_pdf_pages  # noqa: PLC0415

        for pdf in batches:
            urls, htmls = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                safe = str(text).encode("latin-1", "replace").decode("latin-1")
                words = safe.split(" ")
                mid = len(words) // 2
                half1, half2 = " ".join(words[:mid]), " ".join(words[mid:])
                urls.append(f"https://testdata.local/pdfmp/{int(doc_id)}.pdf")
                # a <=1-word doc has an empty first half: page 1 then
                # carries only the title (mirrored in the oracle CASE)
                page1 = [(f"Doc {int(doc_id)}", 24.0, 60.0, 80.0)]
                if half1:
                    page1.append((half1, 12.0, 60.0, 150.0))
                htmls.append(
                    build_pdf_pages(
                        [
                            page1,
                            [
                                (half2, 12.0, 60.0, 150.0),
                                ("copyright example", 9.0, 60.0, 760.0),
                            ],
                        ],
                        compress=True,
                    )
                )
            yield pd.DataFrame({"url": urls, "html": htmls})

    pages = d.mapInPandas(kernel, schema="url string, html binary")
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", "extracted_text", "n_regions", "n_blocks")


PDF_MULTIPAGE_SQL = r"""
WITH s AS (
  SELECT doc_id,
         string_split(regexp_replace(text, '[^\x00-\xff]', '?', 'g'), ' ') AS w
  FROM documents
)
SELECT 'https://testdata.local/pdfmp/' || CAST(doc_id AS VARCHAR) || '.pdf' AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
         CASE WHEN LENGTH(w) >= 2
              THEN array_to_string(w[1 : LENGTH(w) // 2], ' ') || chr(10) || chr(10)
              ELSE '' END ||
         array_to_string(w[LENGTH(w) // 2 + 1 :], ' ') AS extracted_text,
       CAST(CASE WHEN LENGTH(w) >= 2 THEN 3 ELSE 2 END AS INT) AS n_regions,
       CAST(CASE WHEN LENGTH(w) >= 2 THEN 4 ELSE 3 END AS INT) AS n_blocks
FROM s
"""


def extract_pdf_pages_compressed(spark, sf_dir):
    """FlateDecode twin of ``extract_pdf_pages``: pages are written
    with zlib-compressed content streams AND kerned ``TJ`` show arrays
    (the shape every real-world PDF writer emits — reference handles
    real documents via PyMuPDF, mesh-candidate_bestfit/rendering.py:14-54).
    Extracted text must be byte-identical to the uncompressed twin, so
    the oracle closed form is shared."""
    pages = _pdf_pages_from_documents(spark, sf_dir, compress=True, style="TJ")
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", "extracted_text", "n_regions", "n_blocks")


PDF_FLAGSHIP_SQL = r"""
SELECT 'https://testdata.local/pdf/' || CAST(doc_id AS VARCHAR) || '.pdf' AS url,
       'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
         regexp_replace(text, '[^\x00-\xff]', '?', 'g') AS extracted_text,
       CAST(2 AS INT) AS n_regions,
       CAST(3 AS INT) AS n_blocks
FROM documents
"""


def extract_pdf_pages_objstm(spark, sf_dir):
    """PDF 1.5 object-stream twin: page dicts live inside a
    FlateDecode /ObjStm (the layout most modern PDF writers emit);
    extraction must be byte-identical to the classic-layout flagship,
    so the oracle closed form is shared."""
    pages = _pdf_pages_from_documents(spark, sf_dir, compress=True, objstm=True)
    out = extract_pages(pages, n_buckets=64)
    return out.select("url", "extracted_text", "n_regions", "n_blocks")


def extract_quarantine_stats(spark, sf_dir):
    """Poisoned-input robustness through the full pipeline: every 7th
    document becomes a corrupt PDF (valid header, undecodable
    FlateDecode stream).  The kernel must degrade it to an empty
    extraction — never fail the task (P9 quarantine; at 10^12 docs a
    one-in-a-billion poison would otherwise kill whole partitions).
    Output: per url, whether extraction produced text and the block
    count — closed-form oracle on the planting rule."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    CORRUPT = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 8 /Filter /FlateDecode >>\n"
        b"stream\nBADBYTES\nendstream\nendobj\n"
    )

    def kernel(batches):
        import pandas as pd  # noqa: PLC0415

        from doclayout_yolo_spark.pdf import build_pdf  # noqa: PLC0415

        for pdf in batches:
            urls, htmls = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                urls.append(f"https://testdata.local/q/{int(doc_id)}")
                if int(doc_id) % 7 == 0:
                    htmls.append(CORRUPT)
                else:
                    safe = str(text).encode("latin-1", "replace").decode("latin-1")
                    htmls.append(
                        build_pdf(
                            [
                                (f"Doc {int(doc_id)}", 24.0, 60.0, 80.0),
                                (safe, 12.0, 60.0, 150.0),
                                ("copyright example", 9.0, 60.0, 760.0),
                            ],
                            compress=True,
                        )
                    )
            yield pd.DataFrame({"url": urls, "html": htmls})

    pages = d.mapInPandas(kernel, schema="url string, html binary")
    out = extract_pages(pages, n_buckets=64)
    return out.select(
        "url",
        F.when(F.length("extracted_text") > 0, 1).otherwise(0)
        .cast("int")
        .alias("extracted_ok"),
        F.col("n_blocks").cast("int").alias("n_blocks"),
        F.col("error").isNotNull().cast("int").alias("hard_error"),
    )


QUARANTINE_SQL = """
SELECT 'https://testdata.local/q/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS INT) AS extracted_ok,
       CAST(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 3 END AS INT) AS n_blocks,
       CAST(0 AS INT) AS hard_error
FROM documents
"""


N_COPY = 10  # planted duplicate pages (re-crawls under a tracking url)


def corpus_curation_pipeline(spark, sf_dir):
    """The 100 TB workload end-to-end in ONE query: pages -> layout
    extraction (mapInPandas kernel) -> exact content dedup on the
    EXTRACTED text (md5 fingerprint, min-url wins — re-crawls under
    tracking urls collapse because boilerplate was stripped first) ->
    quality gate.  Duplicates are planted deterministically: the first
    N_COPY documents appear again under '?ref=copy' urls.  The closed
    form of the controlled page shape makes the whole chain
    SQL-oracle-able."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = _pages_from_documents(spark, sf_dir)
    copies = docs.filter(F.col("doc_id") < N_COPY)
    copy_pages = _pages_from_documents(spark, sf_dir).join(
        F.broadcast(copies.select(
            F.concat(F.lit("https://testdata.local/doc/"),
                     F.col("doc_id").cast("string")).alias("url"))),
        "url",
    ).select(
        F.concat(F.col("url"), F.lit("?ref=copy")).alias("url"), "html"
    )
    out = extract_pages(pages.unionByName(copy_pages), n_buckets=64)
    fp = out.select(
        "url",
        F.length("extracted_text").alias("n_chars"),
        F.md5(F.col("extracted_text")).alias("fp"),
    )
    w = W.partitionBy("fp").orderBy("url")
    wall = W.partitionBy("fp")
    return fp.select(
        "url",
        "n_chars",
        F.count("*").over(wall).cast("long").alias("dup_group_size"),
        (
            (F.row_number().over(w) == 1) & (F.col("n_chars") >= 20)
        ).cast("long").alias("kept"),
    )


CURATION_SQL = f"""
WITH pages AS (
  SELECT 'https://testdata.local/doc/' || CAST(doc_id AS VARCHAR) AS url,
         'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text AS extracted_text
  FROM documents
  UNION ALL
  SELECT 'https://testdata.local/doc/' || CAST(doc_id AS VARCHAR) || '?ref=copy' AS url,
         'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) || text AS extracted_text
  FROM documents WHERE doc_id < {N_COPY}
),
fp AS (SELECT url, LENGTH(extracted_text) AS n_chars, md5(extracted_text) AS fp FROM pages)
SELECT url, n_chars,
       COUNT(*) OVER (PARTITION BY fp) AS dup_group_size,
       CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY fp ORDER BY url) = 1
                  AND n_chars >= 20 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM fp
"""


def label_verify(spark, sf_dir):
    """S9: YOLO label scan + verify (data/utils.py:166-224 semantics):
    derive 5-col normalized labels, keep rows with all coords in [0,1]
    and cls < nc, drop duplicate rows."""
    ev = _events(spark, sf_dir)
    e = F.col("event_id")
    labels = ev.select(
        (F.col("user_id") % 50).alias("doc"),
        F.floor((e % 20) / 2.0).alias("cls"),
        # some rows deliberately out of range (the verifier must drop them)
        (((e * 29) % 1200) / 1000.0).alias("cx"),
        (((e * 31) % 1000) / 1000.0).alias("cy"),
        (((e * 17) % 400 + 50) / 1000.0).alias("w"),
        (((e * 19) % 300 + 50) / 1000.0).alias("h"),
    )
    ok = labels.filter(
        (F.col("cx") >= 0) & (F.col("cx") <= 1)
        & (F.col("cy") >= 0) & (F.col("cy") <= 1)
        & (F.col("w") > 0) & (F.col("w") <= 1)
        & (F.col("h") > 0) & (F.col("h") <= 1)
        & (F.col("cls") < 10)
    ).dropDuplicates()
    return ok.groupBy("doc").agg(F.count("*").alias("n_valid_labels"))


LABEL_VERIFY_SQL = """
WITH labels AS (
  SELECT DISTINCT user_id % 50 AS doc,
         FLOOR((event_id % 20) / 2.0) AS cls,
         ((event_id * 29) % 1200) / 1000.0 AS cx,
         ((event_id * 31) % 1000) / 1000.0 AS cy,
         ((event_id * 17) % 400 + 50) / 1000.0 AS w,
         ((event_id * 19) % 300 + 50) / 1000.0 AS h
  FROM events
)
SELECT doc, COUNT(*) AS n_valid_labels
FROM labels
WHERE cx BETWEEN 0 AND 1 AND cy BETWEEN 0 AND 1
  AND w > 0 AND w <= 1 AND h > 0 AND h <= 1 AND cls < 10
GROUP BY doc
"""


def class_histogram_padded(spark, sf_dir):
    """A2: targets-per-class histogram right-padded with zero rows for
    absent classes (np.bincount(minlength=nc) analog: class-dim join)."""
    d = _derived_dets(spark, sf_dir).filter(F.col("conf") > 0.9)
    counts = d.groupBy("cls").agg(F.count("*").alias("n"))
    classes = spark.range(10).select(F.col("id").alias("cls"))
    return (
        classes.join(counts, "cls", "left")
        .select("cls", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )


CLASS_HIST_SQL = """
WITH d AS (
  SELECT FLOOR((event_id % 20) / 2.0) AS cls,
         ((event_id * 13) % 100) / 100.0 AS conf
  FROM events
),
counts AS (SELECT cls, COUNT(*) AS n FROM d WHERE conf > 0.9 GROUP BY cls)
SELECT r.cls, COALESCE(counts.n, 0) AS n
FROM (SELECT CAST(i AS BIGINT) AS cls FROM range(10) t(i)) r
LEFT JOIN counts ON r.cls = counts.cls
"""


# Golden-snapshot oracles for the non-SQL-expressible queries (greedy
# NMS / greedy matching / frozen MLP): expected outputs generated ONCE
# by the pytest-trusted single-process NumPy path over the deterministic
# sf0.01 testdata (tools/gen_golden_oracles.py), stored as parquet, read
# back by DuckDB.  Valid for the driver's sf=0.01 correctness gate only.
_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "sf0.01",
)


def _golden_sql(name: str) -> str:
    return (
        f"SELECT * FROM parquet_scan('{_GOLDEN_DIR}/{name}.parquet')"
    )


DETECT_QUERIES = {
    "label_verify": (label_verify, LABEL_VERIFY_SQL),
    "class_histogram_padded": (class_histogram_padded, CLASS_HIST_SQL),
    "det_postprocess_sql": (det_postprocess_sql, DET_POSTPROCESS_SQL),
    "det_iou_best_match": (det_iou_best_match, DET_IOU_SQL),
    "det_grouped_postprocess": (
        det_grouped_postprocess,
        _golden_sql("det_grouped_postprocess"),
    ),
    "extract_pages": (extract_pages_flagship, FLAGSHIP_SQL),
    "corpus_curation_pipeline": (corpus_curation_pipeline, CURATION_SQL),
    "extract_pdf_pages": (extract_pdf_pages, PDF_FLAGSHIP_SQL),
    "extract_pdf_pages_compressed": (extract_pdf_pages_compressed, PDF_FLAGSHIP_SQL),
    "extract_pdf_pages_multipage": (extract_pdf_pages_multipage, PDF_MULTIPAGE_SQL),
    "extract_quarantine_stats": (extract_quarantine_stats, QUARANTINE_SQL),
    "extract_pdf_pages_objstm": (extract_pdf_pages_objstm, PDF_FLAGSHIP_SQL),
    "extract_region_rows": (extract_region_rows, REGION_ROWS_SQL),
    "detection_map": (detection_map, _golden_sql("detection_map")),
    "det_confusion_matrix": (
        det_confusion_matrix,
        _golden_sql("det_confusion_matrix"),
    ),
    "coco_json_predictions": (coco_json_predictions, COCO_JSON_SQL),
    "refine_region_scores": (
        refine_region_scores,
        _golden_sql("refine_region_scores"),
    ),
}
