"""Scale evidence for pipeline.pagerank_df (the crawl-prioritization
rank engine behind jobs/crawl_job.py): run the 5-iteration dangling-
aware recurrence on synthetic host graphs at 10x-apart sizes and
record wall + throughput.

Graph shape mirrors a crawl host graph: H hosts, E = 10*H weighted
edges with a skewed (power-ish) in-degree via a quadratic residue map,
plus a 3% dangling-host tail (hosts that appear only as dst) so the
dangling path — the expensive variant — is the one measured.

Writes BENCH/pagerank_scale.json.  Usage:
    python tools/pagerank_scale_bench.py [H_small] [H_big]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(spark, n_hosts: int) -> dict:
    from pyspark.sql import functions as F

    from doclayout_yolo_spark.pipeline import pagerank_df

    # 10 out-edges per non-dangling host; dst skew: (src*k + k*k) % H
    # concentrates mass on low residues.  The top 3% of host ids never
    # appear as src -> dangling.
    live = int(n_hosts * 0.97)
    edges = (
        spark.range(live)
        .select(
            F.concat(F.lit("h"), F.col("id")).alias("src"),
            F.expr(
                f"transform(sequence(1, 10),"
                f" k -> concat('h', (id * k + k * k) % {n_hosts}))"
            ).alias("ts"),
        )
        .select("src", F.explode("ts").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("w"))
    )
    t0 = time.time()
    ranks = pagerank_df(edges, iters=5, damping=0.85, handle_dangling=True)
    total = ranks.agg(F.sum("pr")).first()[0]
    wall = time.time() - t0
    n = ranks.count()
    return {
        "n_hosts_requested": n_hosts,
        "n_hosts_ranked": n,
        "wall_s": round(wall, 3),
        "hosts_per_sec": round(n / wall, 1),
        "rank_mass": round(float(total), 9),
    }


def main() -> None:
    h_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    h_big = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    from doclayout_yolo_spark.session import get_spark

    spark = get_spark(app="pagerank-scale", master="local[32]")
    run(spark, 1_000)  # warmup: worker pool + codegen
    small = run(spark, h_small)
    big = run(spark, h_big)
    out = {
        "what": "pagerank_df 5-iter dangling-aware recurrence on synthetic skewed host graphs (10 edges/host, 3% dangling tail)",
        "small": small,
        "big": big,
        "wall_ratio_at_10x_hosts": round(big["wall_s"] / small["wall_s"], 2),
        "note": "rank mass must be ~1.0 at both sizes (mass conservation incl. dangling recovery); wall ratio << 10 means the fixed per-iteration cost (scheduling, checkpoint) still dominates at these sizes - the shuffle volume term is the 10x-growing part",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "pagerank_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
