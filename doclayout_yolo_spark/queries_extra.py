"""Additional operator coverage: multi-dimensional aggregation (cube),
set difference, exact percentiles, as-of-join rendering, keyword-class
scores (C9), and the JSON-summary sink rendering (S13) — each with a
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window as W
from pyspark.sql import functions as F

from .textfeat import KEYWORD_TABLE


def _t(spark: SparkSession, sf_dir: str, name: str):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- CUBE aggregation ---------------------------------------------------------

def cube_order_stats(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- set difference (EXCEPT) ----------------------------------------------------

def customers_minus_eventusers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("key"))
    return o.exceptAll(ev).distinct()


EXCEPT_SQL = """
SELECT DISTINCT o_custkey AS key FROM orders
EXCEPT
SELECT DISTINCT user_id AS key FROM events
"""


# --- exact interpolated percentiles ----------------------------------------------

def event_value_percentiles(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 6).alias("p75"),
    )


PERCENTILE_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.25), 6) AS p25,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.75), 6) AS p75
FROM events GROUP BY event_type
"""


# --- as-of join rendering: last 'click' before each 'purchase' per user ----------

def asof_click_before_purchase(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts_us").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_us").alias("c_ts")
    )
    joined = purchases.join(clicks, "user_id").filter(F.col("c_ts") <= F.col("p_ts"))
    w = W.partitionBy("purchase_id").orderBy(F.desc("c_ts"), F.desc("click_id"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "purchase_id", "click_id",
            (F.col("p_ts") - F.col("c_ts")).alias("gap_us"),
        )
    )


ASOF_SQL = """
WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
joined AS (
  SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
         p.ts_us - c.ts_us AS gap_us,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts_us DESC, c.event_id DESC) AS rn
  FROM ev p JOIN ev c
    ON p.user_id = c.user_id
   AND p.event_type = 'purchase' AND c.event_type = 'click'
   AND c.ts_us <= p.ts_us
)
SELECT user_id, purchase_id, click_id, gap_us FROM joined WHERE rn = 1
"""


# --- C9: keyword-class scores over documents --------------------------------------

def keyword_class_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cols = [F.col("doc_id")]
    for name, kws in KEYWORD_TABLE.items():
        hits = None
        for k in kws:
            h = F.when(F.col("text").contains(k.lower()), 1).otherwise(0)
            hits = h if hits is None else hits + h
        cols.append(
            F.round(hits / F.lit(float(len(kws))), 6).alias(f"kw_{name.replace(' ', '_')}")
        )
    return d.select(*cols)


def _kw_duck() -> str:
    parts = []
    for name, kws in KEYWORD_TABLE.items():
        terms = " + ".join(
            f"(CASE WHEN strpos(text, '{k.lower()}') > 0 THEN 1 ELSE 0 END)"
            for k in kws
        )
        parts.append(
            f"ROUND(({terms}) / {float(len(kws))}, 6) AS kw_{name.replace(' ', '_')}"
        )
    return ",\n       ".join(parts)


KEYWORD_SQL = f"""
SELECT doc_id,
       {_kw_duck()}
FROM documents
"""


# --- S13 rendering: per-doc JSON summary of regions --------------------------------

def region_json_summary(spark, sf_dir):
    """JSON-summary sink (engine/results.py:388-430 analog) over the
    derived detections: deterministic string building so both engines
    emit byte-equal JSON."""
    from .queries_detect import det_postprocess_sql  # noqa: PLC0415

    d = det_postprocess_sql(spark, sf_dir)
    item = F.format_string(
        '{"id":%s,"cls":%s,"conf":%s}',
        F.col("det_id").cast("string"),
        F.col("cls").cast("long").cast("string"),
        F.round(F.col("conf"), 2).cast("string"),
    )
    per_doc = d.select("doc", "det_id", item.alias("j"))
    agg = per_doc.groupBy("doc").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("det_id"), F.col("j")))
        ).alias("items")
    )
    return agg.select(
        "doc",
        F.concat(
            F.lit("["),
            F.array_join(F.transform("items", lambda s: s["j"]), ","),
            F.lit("]"),
        ).alias("regions_json"),
    )


REGION_JSON_SQL = """
WITH d AS (
  SELECT user_id % 50 AS doc, event_id AS det_id,
         ((event_id * 13) % 100) / 100.0 AS conf,
         FLOOR((event_id % 20) / 2.0) AS cls
  FROM events
),
f AS (SELECT * FROM d WHERE conf > 0.25 AND cls <> 2)
SELECT doc,
       '[' || string_agg(
         '{"id":' || CAST(det_id AS VARCHAR) ||
         ',"cls":' || CAST(CAST(cls AS BIGINT) AS VARCHAR) ||
         ',"conf":' || CAST(ROUND(conf, 2) AS VARCHAR) || '}',
         ',' ORDER BY det_id) || ']' AS regions_json
FROM f GROUP BY doc
"""


EXTRA_QUERIES = {
    "cube_order_stats": (cube_order_stats, CUBE_SQL),
    "customers_minus_eventusers": (customers_minus_eventusers, EXCEPT_SQL),
    "event_value_percentiles": (event_value_percentiles, PERCENTILE_SQL),
    "asof_click_before_purchase": (asof_click_before_purchase, ASOF_SQL),
    "keyword_class_scores": (keyword_class_scores, KEYWORD_SQL),
    "region_json_summary": (region_json_summary, REGION_JSON_SQL),
}
