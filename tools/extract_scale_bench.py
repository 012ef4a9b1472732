"""Scale-proof the FLAGSHIP extraction pipeline: run the end-to-end
job (bucket shuffle -> fused Arrow kernel -> partitioned write +
lineage + manifest) on a seeded N-page corpus and on its 10x twin, and
show per-core throughput holds — the north-rule property (the dedup
family has BENCH/dedup_scale.json; this is the extraction analog).

Protocol (see memory/BENCH/BASELINE.md): the WHOLE ladder runs per
repetition, throughput retention is computed per repetition, and the
MEDIAN repetition is reported with all repetitions disclosed —
best-of-level mixing would bias the ratio on a noisy host.

Also records lineage-derived per-bucket skew (max/mean docs per
bucket) at both volumes: url-hash bucketing must keep the skew flat as
the corpus grows, or stragglers eat the scaling.

Writes BENCH/extract_scale.json and prints it.

Usage: python tools/extract_scale_bench.py  [SPARK_GRAFT_SCALING_REPS=3]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
N_BASE = int(os.environ.get("SPARK_GRAFT_EXTRACT_N", "6000"))
N_BUCKETS = 64


def main() -> None:
    from pyspark.sql import functions as F

    from doclayout_yolo_spark.fixtures import generate_pages_df
    from doclayout_yolo_spark.pipeline import (
        read_extracted,
        run_extraction_job,
    )
    from doclayout_yolo_spark.session import get_spark

    try:
        os.sched_setaffinity(0, range(CPUS))
    except (AttributeError, OSError):
        pass
    spark = get_spark(
        app="extract_scale", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    # warm the Python worker pool (first mapInPandas pays worker spawn
    # + pandas import per core — that cost belongs to neither level)
    generate_pages_df(spark, 256).count()
    run_extraction_job(
        spark, generate_pages_df(spark, 256), "/tmp/exscale_warm", n_buckets=8
    )
    shutil.rmtree("/tmp/exscale_warm", ignore_errors=True)

    levels = {"1x": N_BASE, "10x": N_BASE * 10}
    reps: list[dict] = []
    for rep in range(REPS):
        rep_out: dict = {}
        for label, n in levels.items():
            out_dir = f"/tmp/exscale_{label}_{rep}"
            shutil.rmtree(out_dir, ignore_errors=True)
            pages = generate_pages_df(spark, n)
            stats = run_extraction_job(
                spark, pages, out_dir, n_buckets=N_BUCKETS
            )
            per_bucket = (
                read_extracted(spark, out_dir)
                .groupBy("part_id")
                .count()
                .agg(
                    F.max("count").alias("mx"),
                    F.avg("count").alias("mean"),
                    F.count("*").alias("n_buckets"),
                )
                .first()
            )
            rep_out[label] = {
                "n_docs": stats["n_docs"],
                "wall_s": round(stats["wall_s"], 3),
                "docs_per_sec": round(stats["docs_per_sec"], 1),
                "bucket_skew_max_over_mean": round(
                    per_bucket["mx"] / per_bucket["mean"], 3
                ),
                "n_buckets": per_bucket["n_buckets"],
            }
            shutil.rmtree(out_dir, ignore_errors=True)
        rep_out["throughput_retention_10x"] = round(
            rep_out["10x"]["docs_per_sec"] / rep_out["1x"]["docs_per_sec"], 3
        )
        reps.append(rep_out)
        print(f"rep {rep}: {json.dumps(rep_out)}")

    retentions = [r["throughput_retention_10x"] for r in reps]
    # the rep CLOSEST to the statistical median: with an even rep
    # count, picking sorted[n//2] would select the upper-middle rep
    # and contradict the headline median
    median_val = statistics.median(retentions)
    median_rep = min(
        reps,
        key=lambda r: abs(r["throughput_retention_10x"] - median_val),
    )
    out = {
        "cpus": CPUS,
        "n_base_pages": N_BASE,
        "n_buckets": N_BUCKETS,
        "reps": reps,
        "retention_all_reps": retentions,
        "median_rep": median_rep,
        "throughput_retention_10x_median": statistics.median(retentions),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/extract_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"throughput_retention_10x_median": out["throughput_retention_10x_median"],
                      "median_rep": median_rep}))
    spark.stop()


if __name__ == "__main__":
    main()
