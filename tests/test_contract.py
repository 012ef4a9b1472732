"""Smoke tests for the driver contract: every queries() entry runs at
sf0.001 and returns rows with stable columns; a sample of oracle pairs
is value-checked against DuckDB (the full sweep lives in
tools/check_contract.py, run at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SAMPLE_ORACLE_CHECK = [
    "q1_pricing_summary",
    "text_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "extract_pages",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "extracted_text" in df.columns


def test_all_queries_run(spark):
    qs = entrymod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()  # runs without error


def test_oracle_keys_subset():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    # the vast majority must carry an oracle
    assert len(osql) >= len(qs) - 3


@pytest.mark.parametrize("name", SAMPLE_ORACLE_CHECK)
def test_oracle_value_match(spark, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    sdf = fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    sset = sorted(tuple(_norm(r[c]) for c in scols) for r in sdf.collect())
    res = con.execute(sql)
    dcols_full = [d[0] for d in res.description]
    idx = [dcols_full.index(c) for c in sorted(dcols_full)]
    dset = sorted(tuple(_norm(r[i]) for i in idx) for r in res.fetchall())
    assert scols == sorted(dcols_full), name
    assert sset == dset, name


def test_multimodal_parity_on_non_ascii_text(spark, tmp_path_factory):
    # regression: byte-true Spark kernels vs character-based DuckDB
    # oracles must agree even when text contains multi-byte characters
    # (the ASCII projection makes offsets equal by construction)
    import duckdb

    from doclayout_yolo_spark.queries_vector import (
        FRAME_SAMPLE_SQL,
        RESIZE_SQL,
        multimodal_frame_sample,
        multimodal_resize_stub,
    )

    d = str(tmp_path_factory.mktemp("nonascii"))
    spark.createDataFrame(
        [(1, "héllo wörld " * 40 + "é€nd"), (2, "plain ascii " * 30)],
        schema="doc_id long, text string",
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{d}/documents.parquet/*.parquet')"
    )
    for fn, sql in (
        (multimodal_frame_sample, FRAME_SAMPLE_SQL),
        (multimodal_resize_stub, RESIZE_SQL),
    ):
        got = {tuple(r) for r in fn(spark, d).collect()}
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        assert got == want, (fn.__name__, got ^ want)
