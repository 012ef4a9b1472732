"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "extraction_docs_per_sec": ..., "cpus": ...}

Protocol mirrors the reference's speed benchmark
(evaluate_comprehensive.py:117-147): warmup run, then timed runs.
Results are forced with a noop-format write (full materialization, no
driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from doclayout_yolo_spark.contract import ALL_QUERIES  # noqa: E402
from doclayout_yolo_spark.fixtures import generate_pages_df  # noqa: E402
from doclayout_yolo_spark.pipeline import extract_pages  # noqa: E402
from doclayout_yolo_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "top3_events_per_user",
    "sessionize_events",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_jaccard_lsh",
    "simhash",
    "ann_cosine_topk",
    "ann_lsh_multiband",
    "detection_map",
    "extract_pages",
    "extract_pdf_pages",
    "extract_pdf_pages_compressed",
    "ann_ivf",
    "simhash64_hamming_pairs",
    "tfidf_top_terms",
    "corpus_curation_pipeline",
    "dedup_paragraphs",
    "warc_roundtrip",
    "link_graph_pagerank",
    "event_funnel",
    "inverted_index",
    "corpus_curation_v3",
    "extract_pdf_pages_cid",
    "lang_id_v2",
    "simhash64_sig_pairs",
    "extract_pages_charsets",
    "host_pagerank",
    "robots_policy_filter",
]

N_BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "6000"))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # pin the bench (and the JVM + python workers it forks, which
    # inherit the mask) to the first N cpus — same protocol as
    # tools/scaling_bench.py's taskset, so round-over-round numbers
    # stop drifting with co-tenant placement on the oversubscribed host
    try:
        os.sched_setaffinity(0, range(cpus))
    except (AttributeError, OSError, ValueError):
        pass
    spark = get_spark(app="bench", master=f"local[{cpus}]")

    # warmup: JVM codegen + the full python worker pool (the first
    # mapInPandas job pays worker spawn + pandas import per core; that
    # cost is real but one-time, so it is excluded from per-query timing)
    _force(spark.range(10_000).selectExpr("sum(id) as s"))
    _force(
        spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
            lambda it: it, "id long"
        )
    )

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _sql = ALL_QUERIES[name]
        # untimed per-query warmup: the first execution pays Catalyst
        # analysis + codegen + scan-cache misses (~2-4x the steady
        # state) and is not what a long-running job sees — excluding
        # it is the same protocol as the reference's warmup pass
        # (evaluate_comprehensive.py:117-147)
        _force(fn(spark, sf_dir))
        runs = []
        for _ in range(3):  # mean±std over steady-state runs;
            t0 = time.time()  # best reported: host is an
            _force(fn(spark, sf_dir))  # oversubscribed VM
            runs.append(time.time() - t0)
        best = min(runs)
        mean = sum(runs) / len(runs)
        std = (sum((r - mean) ** 2 for r in runs) / len(runs)) ** 0.5
        timings[name] = round(best, 3)
        stats[name] = {"mean": round(mean, 3), "std": round(std, 3)}
        total += best

    # end-to-end extraction throughput over the Common-Crawl-style
    # pages table (the north-rule metric): seeded generation is cached
    # first so timing covers extraction only.
    pages = generate_pages_df(spark, N_BENCH_PAGES, partitions=cpus * 2)
    pages.cache().count()
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        _force(
            extract_pages(pages, n_buckets=max(64, cpus * 4), num_partitions=cpus * 4)
        )
        dt = min(dt, time.time() - t0)
    timings["pages_extraction"] = round(dt, 3)
    total += dt
    docs_per_sec = N_BENCH_PAGES / dt
    pages.unpersist()

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline query set wall time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "query_stats": stats,
                "sf": sf,
                "extraction_docs_per_sec": round(docs_per_sec, 1),
                "extraction_n_pages": N_BENCH_PAGES,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
