"""Embedding similarity search + multimodal-column plumbing over the
driver testdata (``embeddings``, ``documents``), each with a DuckDB
oracle where SQL-expressible.

Float-parity convention: element-wise products are bit-deterministic;
folds are sequential in index order in both engines; final values are
rounded to 6 decimals before ranking/output so residual summation
drift can never flip a comparison.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

TOPK = 3
N_QUERIES = 5  # vec_id < 5 are the query vectors


def _emb(spark: SparkSession, sf_dir: str):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


# --- brute-force cosine top-k (the ANN baseline) -----------------------------

def ann_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    t = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("tvec"))
    pairs = F.broadcast(q).crossJoin(t).filter(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("qvec"), F.col("tvec"))
            / (_norm(F.col("qvec")) * _norm(F.col("tvec"))),
            6,
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
    )


ANN_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
pairs AS (
  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.vec, t.vec) /
               (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(t.vec, t.vec))), 6)
         AS cosine
  FROM e q JOIN e t ON q.vec_id < {N_QUERIES} AND q.vec_id <> t.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= {TOPK}
"""


# --- per-label embedding stats ------------------------------------------------

def embedding_label_stats(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    with_norm = emb.select("label", F.round(_norm(F.col("vec")), 6).alias("norm"))
    return with_norm.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.sum("norm"), 4).alias("sum_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


EMB_STATS_SQL = """
WITH n AS (
  SELECT label, ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n, ROUND(SUM(norm), 4) AS sum_norm, ROUND(MAX(norm), 6) AS max_norm
FROM n GROUP BY label
"""


# --- multimodal opaque-binary plumbing (decode stub) ----------------------------
#
# Treats the document text as an opaque binary payload (the image/audio
# analog: binary column + typed metadata).  The decode step is a
# deterministic fake (real decode libs aren't in this container); the
# Spark-side plumbing — binary column, Arrow batches, mapInPandas UDF
# signature, schema — is real and oracle-checked.

DECODE_DDL = (
    "doc_id long, n_bytes long, first_byte long, last_byte long, n_space_bytes long"
)


def _decode_kernel(batches):
    import pandas as pd  # noqa: PLC0415

    for pdf in batches:
        payloads = [bytes(b) if b is not None else b"" for b in pdf["payload"]]
        arrs = [np.frombuffer(p, dtype=np.uint8) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(a) for a in arrs],
                "first_byte": [int(a[0]) if len(a) else -1 for a in arrs],
                "last_byte": [int(a[-1]) if len(a) else -1 for a in arrs],
                "n_space_bytes": [int((a == 32).sum()) for a in arrs],
            }
        )


def multimodal_decode_stub(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return d.mapInPandas(_decode_kernel, schema=DECODE_DDL)


DECODE_SQL = """
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_bytes,
       CAST(ord(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       CAST(ord(substr(text, LENGTH(text), 1)) AS BIGINT) AS last_byte,
       CAST(LENGTH(text) - LENGTH(replace(text, ' ', '')) AS BIGINT) AS n_space_bytes
FROM documents
"""


VECTOR_QUERIES = {
    "ann_cosine_topk": (ann_cosine_topk, ANN_SQL),
    "embedding_label_stats": (embedding_label_stats, EMB_STATS_SQL),
    "multimodal_decode_stub": (multimodal_decode_stub, DECODE_SQL),
}
