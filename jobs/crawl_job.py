"""spark-submit entry point for the crawl-frontier job: pages ->
outlink extraction -> robots.txt policy filter -> host-graph PageRank
-> prioritized frontier table.  The acquisition-tier companion to
jobs/extract_job.py (content) and jobs/curate_job.py (corpus): its
output is the ranked, policy-clean list of urls a fetcher crawls
next.

Usage (cluster):
    python tools/make_pyfiles.py
    spark-submit --py-files dist/doclayout_yolo_spark.zip \
        jobs/crawl_job.py --input <pages path> --output <frontier path> \
        [--robots <robots parquet (host, body)>] [--iters 5] \
        [--keep-disallowed]

Local smoke:
    spark-submit --master local[8] --py-files dist/doclayout_yolo_spark.zip \
        jobs/crawl_job.py --generate 1000 --output /tmp/frontier

Output schema: (target, src_url, link_pos, allowed, matched,
host, host_pr) — one row per extracted outlink, PageRank of the
TARGET host joined on (plain equi-join; AQE broadcasts while the
rank vector is small and shuffles when a real crawl's host set
outgrows the threshold),
disallowed targets dropped unless --keep-disallowed (then carried
with allowed=false for audit).  A stats JSON line goes to stdout:
input pages, links, distinct hosts, disallowed count (no silent
drops).
"""

from __future__ import annotations

import argparse
import json


def main(stop_session: bool = True) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="pages table path (url, html, ...)")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--generate",
        type=int,
        default=None,
        help="generate N seeded fixture pages instead of reading --input",
    )
    p.add_argument(
        "--robots",
        default=None,
        help="robots.txt table path (host, body); omitted = no policy"
        " filter (every target allowed)",
    )
    p.add_argument("--iters", type=int, default=5)
    p.add_argument(
        "--keep-disallowed",
        action="store_true",
        help="carry robots-disallowed targets with allowed=false"
        " instead of dropping them",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from doclayout_yolo_spark.crawl import robots_filter_df, robots_rules_df
    from doclayout_yolo_spark.fixtures import generate_pages_df
    from doclayout_yolo_spark.pipeline import (
        extract_outlinks_df,
        pagerank_df,
    )

    spark = SparkSession.builder.appName("doclayout-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if args.generate:
        pages = generate_pages_df(spark, args.generate)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        raise SystemExit("need --input or --generate")

    n_pages = pages.count()
    # one extraction pass feeds BOTH the rank graph and the frontier
    links = extract_outlinks_df(pages).localCheckpoint(eager=True)
    # lowercase port-less host key (repo-wide normalization): a
    # mixed-case link must not split a rank node or dodge its robots
    host_re = r"^https?://([^/:?#]+)"
    edges = (
        links.select(
            F.lower(F.regexp_extract("url", host_re, 1)).alias("src"),
            F.lower(F.regexp_extract("target", host_re, 1)).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    ranks = pagerank_df(edges, iters=args.iters, handle_dangling=True)

    frontier = links.select(
        F.col("target"),
        F.col("url").alias("src_url"),
        "link_pos",
        F.lower(F.regexp_extract("target", host_re, 1)).alias("host"),
    )
    n_disallowed = 0
    if args.robots:
        robots = spark.read.parquet(args.robots)
        verdict = robots_filter_df(
            frontier.select(F.col("target").alias("url")).distinct(),
            robots_rules_df(robots),
        )
        frontier = frontier.join(
            verdict.select(
                F.col("url").alias("target"), "allowed", "matched"
            ),
            "target",
        )
        n_disallowed = frontier.filter(~F.col("allowed")).count()
        if not args.keep_disallowed:
            frontier = frontier.filter(F.col("allowed"))
    else:
        frontier = frontier.withColumn("allowed", F.lit(True)).withColumn(
            "matched", F.lit(None).cast("string")
        )

    # rank vector is hosts-sized but NOT broadcast-hinted: at the
    # 10^12-page tier the host set (~10^8) outgrows any broadcast
    # threshold (pagerank_df's own scale model) — a plain equi-join
    # lets AQE broadcast when small and shuffle when not
    out = frontier.join(
        ranks.select(F.col("host"), F.col("pr").alias("host_pr")),
        "host",
        "left",
    ).select(
        "target", "src_url", "link_pos", "allowed", "matched", "host",
        "host_pr",
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    print(
        json.dumps(
            {
                "n_input_pages": n_pages,
                "n_links": links.count(),
                "n_hosts": ranks.count(),
                "n_disallowed": n_disallowed,
                "n_frontier_rows": written.count(),
            }
        )
    )
    if stop_session:
        spark.stop()


if __name__ == "__main__":
    main()
