"""Corpus-curation operators round 2: the training-data-pipeline ops a
100 TB pretrain corpus build needs beyond dedup/quality — paragraph
(chunk-hash) dedup with text reassembly, sequence packing into fixed
token blocks, PII redaction, and URL canonicalization.

Every query here is a `queries()` contract entry with a DuckDB oracle;
all heavy expressions are JVM-side Catalyst (no Python in the hot
path).  Reference scope note: these extend the engine beyond the
reference's own operator set per the build brief (training-data
pipeline ops), so docstrings cite the public technique, not reference
files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# engine-agnostic 60-bit md5 hash (see duckdb-spark parity rules)
_H_SPARK = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
_H_DUCK = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


def _docs(spark: SparkSession, sf_dir: str):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# --- paragraph-level (chunk-hash) dedup --------------------------------------
#
# CCNet-style cross-document paragraph dedup (Wenzek et al., 2020:
# hash every paragraph, drop repeats corpus-wide, keep the first
# occurrence).  The synthetic corpus has no newlines, so "paragraph" =
# a fixed window of CHUNK_W consecutive tokens — the same shape at a
# different split point.
#
# Scale: one scan -> explode to (doc, chunk) rows -> groupBy(chunk
# hash) min-owner (map-side combinable) -> hash-keyed semi join back
# -> per-doc reassembly groupBy.  Two shuffles, both on high-cardinality
# keys; no window over the corpus, no driver collect.

CHUNK_W = 12


def dedup_paragraphs(spark, sf_dir):
    """Cross-corpus chunk dedup: every CHUNK_W-token chunk is kept only
    at its globally FIRST occurrence (ordered by doc_id, then position);
    each document's text is reassembled from its surviving chunks.
    Output: doc_id, n_chunks, n_kept, dedup_text."""
    d = _docs(spark, sf_dir)
    base = d.selectExpr(
        "doc_id",
        f"cast(ceil(size(split(text, ' ')) / {CHUNK_W}) as long) AS n_chunks",
    )
    ch = d.selectExpr(
        "doc_id",
        f"posexplode(transform(sequence(0, cast(ceil(size(split(text, ' ')) / {CHUNK_W}) as int) - 1),"
        f" i -> array_join(slice(split(text, ' '), i * {CHUNK_W} + 1, {CHUNK_W}), ' ')))"
        " AS (chunk_idx, chunk)",
    ).selectExpr("doc_id", "chunk_idx", "chunk", _H_SPARK.format(x="chunk") + " AS h")
    owners = ch.groupBy("h").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first")
    )
    keep = (
        ch.join(owners, "h")
        .where(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("chunk_idx") == F.col("first.chunk_idx"))
        )
        .select("doc_id", "chunk_idx", "chunk")
    )
    kept = keep.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    return base.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
    )


DEDUP_PARAGRAPHS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(range(CAST(ceil(len(t) / {CHUNK_W}.0) AS BIGINT))) AS chunk_idx
  FROM toks
),
ch AS (
  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         array_to_string(t[chunk_idx * {CHUNK_W} + 1 : chunk_idx * {CHUNK_W} + {CHUNK_W}], ' ') AS chunk
  FROM idx
),
hashed AS (
  SELECT *, {_H_DUCK.format(x="chunk")} AS h FROM ch
),
keep AS (
  SELECT doc_id, chunk_idx, chunk FROM (
    SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
    FROM hashed
  ) WHERE rn = 1
),
kept AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(chunk, ' ' ORDER BY chunk_idx) AS dedup_text
  FROM keep GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(ceil(len(t) / {CHUNK_W}.0) AS BIGINT) AS n_chunks,
       COALESCE(k.n_kept, 0) AS n_kept,
       COALESCE(k.dedup_text, '') AS dedup_text
FROM toks b LEFT JOIN kept k ON b.doc_id = k.doc_id
"""


# --- sequence packing into fixed token blocks --------------------------------
#
# The GPT-style pretrain pack: concatenate every document's tokens in
# corpus order and chunk the stream into fixed BLOCK-token training
# blocks; each document maps to a [tok_start, tok_end) span and the
# block range it lands in.
#
# Scale: the naive form is ONE global ordered cumsum — a single-reducer
# window.  This impl is the standard two-phase distributed prefix sum:
# phase 1 computes cumsums inside doc_id-range buckets (parallel,
# bounded), phase 2 runs the tiny window over ONE ROW PER BUCKET
# (n_docs / PACK_BUCKET rows) and broadcasts the bucket offsets back.
# Output is identical to the naive window (same oracle);
# tests/test_plans.py pins that no corpus-sized single-partition window
# exists in the plan.

PACK_BLOCK = 256   # tokens per training block
PACK_BUCKET = 64   # docs per phase-1 partial-sum bucket


def sequence_packing(spark, sf_dir):
    d = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "cast(size(split(text, ' ')) as long) AS n_tokens",
        f"doc_id div {PACK_BUCKET} AS bucket",
    )
    w_local = (
        W.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = d.withColumn("local_cum", F.sum("n_tokens").over(w_local))
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    w_prev = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_total").over(w_prev), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    out = local.join(F.broadcast(offsets), "bucket")
    tok_start = F.col("bucket_offset") + F.col("local_cum") - F.col("n_tokens")
    tok_end = F.col("bucket_offset") + F.col("local_cum")
    return out.select(
        "doc_id",
        "n_tokens",
        tok_start.alias("tok_start"),
        tok_end.alias("tok_end"),
        F.floor(tok_start / PACK_BLOCK).alias("first_block"),
        F.floor((tok_end - 1) / PACK_BLOCK).alias("last_block"),
        (
            F.floor((tok_end - 1) / PACK_BLOCK) - F.floor(tok_start / PACK_BLOCK) + 1
        ).alias("n_blocks"),
    )


SEQUENCE_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS tok_end
  FROM t
)
SELECT doc_id, n_tokens,
       tok_end - n_tokens AS tok_start,
       tok_end,
       (tok_end - n_tokens) // {PACK_BLOCK} AS first_block,
       (tok_end - 1) // {PACK_BLOCK} AS last_block,
       (tok_end - 1) // {PACK_BLOCK} - (tok_end - n_tokens) // {PACK_BLOCK} + 1
         AS n_blocks
FROM c
"""


# --- PII redaction -----------------------------------------------------------
#
# The pre-release scrub every public corpus applies (emails, phone
# numbers -> placeholder tokens).  The synthetic corpus carries no PII,
# so each doc gets a deterministic contact line appended IN-QUERY (both
# engines append the identical line) and the redaction regexes run over
# that; output hashes the redacted text so the value gate proves the
# replacement is byte-identical.  Regexes are kept to the Java/RE2
# common subset.


def pii_redact(spark, sf_dir):
    d = _docs(spark, sf_dir)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
        F.lit(" now"),
    )
    red = F.regexp_replace(
        F.regexp_replace(synth, "[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
        "555-[0-9]{4}",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(synth, F.lit("[a-z0-9.]+@[a-z0-9.]+"))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(synth, F.lit("555-[0-9]{4}")).cast("long").alias("n_phones"),
        F.md5(F.encode(red, "utf-8")).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"),
    )


PII_REDACT_SQL = """
WITH s AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or call 555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS t
  FROM documents
),
r AS (
  SELECT doc_id, t,
         regexp_replace(
           regexp_replace(t, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
           '555-[0-9]{4}', '<PHONE>', 'g') AS red
  FROM s
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
       md5(red) AS redacted_md5,
       CAST(LENGTH(red) AS BIGINT) AS redacted_len
FROM r
"""


# --- URL canonicalization + canonical-url dedup ------------------------------
#
# Crawl dedup's first line of defense: normalize scheme/host case,
# strip default ports and fragments, drop tracking parameters
# (utm_*, fbclid), sort the surviving query params — then group.  The
# documents table carries no url, so a deterministic messy url is
# synthesized per doc IN-QUERY (same expression both engines); distinct
# docs collapse onto shared canonical urls (path keyed by doc_id % 40),
# exercising the dedup.  Canonicalization itself is implemented
# INDEPENDENTLY in Spark functions vs DuckDB functions — the value gate
# compares the two renderings of the same spec.


def url_canonicalize(spark, sf_dir):
    d = _docs(spark, sf_dir)
    messy = F.concat(
        F.lit("HTTPS://Host"),
        F.pmod("doc_id", F.lit(7)).cast("string"),
        F.lit(".Example.COM:443/p/"),
        F.pmod("doc_id", F.lit(40)).cast("string"),
        F.element_at(
            F.array(
                F.concat(F.lit("?utm_source=feed&b=2&a=1")),
                F.concat(
                    F.lit("?a=1&fbclid=zz"),
                    F.lit("&b=2&utm_campaign=x"),
                ),
                F.lit("?b=2&a=1"),
            ),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ),
        F.lit("#frag"),
    )
    no_frag = F.split(messy, "#").getItem(0)
    scheme_host = F.lower(F.split(no_frag, "/p/").getItem(0))
    host_clean = F.regexp_replace(scheme_host, ":443$", "")
    path = F.concat(F.lit("/p/"), F.split(F.split(no_frag, "/p/").getItem(1), "\\?").getItem(0))
    query = F.split(no_frag, "\\?").getItem(1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: ~p.startswith("utm_") & (p != F.lit("fbclid=zz")),
        )
    )
    canonical = F.concat(
        host_clean, path, F.lit("?"), F.array_join(params, "&")
    )
    return (
        d.select(F.col("doc_id"), canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").alias("keeper_doc"),
        )
    )


URL_CANON_SQL = """
WITH m AS (
  SELECT doc_id,
         'HTTPS://Host' || CAST(doc_id % 7 AS VARCHAR) || '.Example.COM:443/p/'
           || CAST(doc_id % 40 AS VARCHAR)
           || CASE doc_id % 3
                WHEN 0 THEN '?utm_source=feed&b=2&a=1'
                WHEN 1 THEN '?a=1&fbclid=zz&b=2&utm_campaign=x'
                ELSE '?b=2&a=1' END
           || '#frag' AS url
  FROM documents
),
c AS (
  SELECT doc_id,
         regexp_replace(lower(string_split(string_split(url, '#')[1], '/p/')[1]),
                        ':443$', '')
         || '/p/' || string_split(string_split(string_split(url, '#')[1], '/p/')[2], '?')[1]
         || '?'
         || array_to_string(
              list_sort(list_filter(
                string_split(string_split(string_split(url, '#')[1], '?')[2], '&'),
                p -> NOT starts_with(p, 'utm_') AND p <> 'fbclid=zz')),
              '&') AS canonical_url
  FROM m
)
SELECT canonical_url, COUNT(*) AS n_dups, MIN(doc_id) AS keeper_doc
FROM c GROUP BY 1
"""


CURATION_QUERIES = {
    "dedup_paragraphs": (dedup_paragraphs, DEDUP_PARAGRAPHS_SQL),
    "sequence_packing": (sequence_packing, SEQUENCE_PACKING_SQL),
    "pii_redact": (pii_redact, PII_REDACT_SQL),
    "url_canonicalize": (url_canonicalize, URL_CANON_SQL),
}
