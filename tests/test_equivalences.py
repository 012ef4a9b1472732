"""Algebraic-equivalence gates for the skew-safe rewrites: each
optimized plan must produce EXACTLY the rows of its naive counterpart
on adversarial synthetic data (heavy skew, ties), not just on the
driver fixture the contract gate uses."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _skewed_events(spark, n=5000, seed=7):
    rng = np.random.RandomState(seed)
    # one giant stratum (80%), a medium one, and a tail of tiny ones —
    # the shape that made the single-window plan a straggler
    types = np.where(
        rng.rand(n) < 0.8, "hot",
        np.where(rng.rand(n) < 0.5, "warm", rng.choice(list("abcdef"), n)),
    )
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": types,
            "value": rng.rand(n),
        }
    )
    return spark.createDataFrame(pdf)


def test_two_phase_stratified_sample_equals_single_window(spark, tmp_path_factory):
    from doclayout_yolo_spark.queries_text import SAMPLE_K, stratified_sample

    ev = _skewed_events(spark)
    base = tmp_path_factory.mktemp("strat")
    ev.select(
        "event_id",
        F.lit(pd.Timestamp("2026-01-01")).alias("ts"),
        F.lit(0).cast("long").alias("user_id"),
        "event_type",
        "value",
        F.lit("{}").alias("props"),
    ).write.parquet(f"{base}/events.parquet")

    got = {
        (r["event_type"], r["event_id"], r["sample_rank"])
        for r in stratified_sample(spark, str(base)).collect()
    }
    key = F.md5(F.col("event_id").cast("string"))
    w = W.partitionBy("event_type").orderBy(key, F.asc("event_id"))
    want = {
        (r["event_type"], r["event_id"], r["sample_rank"])
        for r in spark.read.parquet(f"{base}/events.parquet")
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .collect()
    }
    assert got == want and len(got) > 0


def test_salted_tfidf_equals_plain_join(spark):
    from doclayout_yolo_spark.queries_text import (
        TFIDF_TOPK,
        _toks_spark,
        tfidf_top_terms,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["term"], r["tfidf"], r["rank"])
        for r in tfidf_top_terms(spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/documents.parquet")
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    words = d.select(
        "doc_id", F.explode(F.expr(_toks_spark("text"))).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = words.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count("*").alias("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    want = {
        (r["doc_id"], r["term"], r["tfidf"], r["rank"])
        for r in tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
            .alias("tfidf"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .collect()
    }
    assert got == want and len(got) == 1500


def test_two_phase_packing_equals_global_window(spark, tmp_path_factory):
    # adversarial doc_id layout: ids sparse and shuffled across
    # buckets, so bucket boundaries fall mid-stream everywhere
    import numpy as np

    from doclayout_yolo_spark.queries_curation import sequence_packing

    rng = np.random.RandomState(11)
    ids = np.sort(rng.choice(100000, size=3000, replace=False))
    pdf = pd.DataFrame(
        {
            "doc_id": ids.astype(np.int64),
            "text": [
                " ".join(["tok"] * int(k)) for k in rng.randint(1, 400, len(ids))
            ],
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
    )
    base = tmp_path_factory.mktemp("pack")
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")

    got = {
        tuple(r) for r in sequence_packing(spark, str(base)).collect()
    }
    d = spark.read.parquet(f"{base}/documents.parquet").selectExpr(
        "doc_id", "cast(size(split(text, ' ')) as long) AS n_tokens"
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = d.withColumn("tok_end", F.sum("n_tokens").over(w)).selectExpr(
        "doc_id",
        "n_tokens",
        "tok_end - n_tokens AS tok_start",
        "tok_end",
        "(tok_end - n_tokens) div 256 AS first_block",
        "(tok_end - 1) div 256 AS last_block",
        "(tok_end - 1) div 256 - (tok_end - n_tokens) div 256 + 1 AS n_blocks",
    ).select(
        "doc_id", "n_tokens", "tok_start", "tok_end",
        "first_block", "last_block", "n_blocks",
    )
    want = {tuple(r) for r in naive.collect()}
    assert got == want


def test_windowed_dedup_paragraphs_equals_groupby_min(spark, tmp_path_factory):
    # planted duplicate chunks across docs (incl. within-doc repeats):
    # the window rewrite must match the naive min-owner + join-back form
    import numpy as np

    from doclayout_yolo_spark.queries_curation import CHUNK_W, dedup_paragraphs

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab -> dense collisions
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(5, 40)))
        for _ in range(400)
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s",
            "n_chars": 1,
        }
    )
    base = tmp_path_factory.mktemp("pardedup")
    spark.createDataFrame(pdf).write.parquet(f"{base}/documents.parquet")

    got = {tuple(r) for r in dedup_paragraphs(spark, str(base)).collect()}

    # naive reference computed single-process
    seen: set[str] = set()
    want = set()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = text.split(" ")
        chunks = [
            " ".join(toks[i : i + CHUNK_W])
            for i in range(0, len(toks), CHUNK_W)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                kept.append(c)
                seen.add(c)
        want.add((int(doc_id), len(chunks), len(kept), " ".join(kept)))
    assert got == want
