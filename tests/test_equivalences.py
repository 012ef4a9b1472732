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
