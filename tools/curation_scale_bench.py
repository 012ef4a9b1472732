"""Scale-proof the COMPOSED curation funnel (r4 verdict item 5): run
``corpus_curation_v3`` — real extraction -> exact window dedup -> LSH
near-dup collapse -> decontamination -> PII redaction -> quality gate —
on the sf0.1 documents table and its deterministic 10x twin (built by
tools/dedup_scale_bench.build_10x: replicas share NO shingles, so the
near-dup rate is held constant while volume grows 10x).

Each dedup leg already has 10x evidence (BENCH/dedup_scale.json); this
measures the COMPOSITION, which can silently re-introduce a broadcast
or an unpersisted double-scan that per-leg tests miss.  Alongside the
wall ratio, the v3 plan pins are re-checked at 10x: exactly ONE
extraction MapInPandas, checkpointed cluster labels, bounded scan
count, bounded plan size.

Writes BENCH/curation_scale.json and prints it.

Usage: python tools/curation_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = 2


def plan_pins(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "n_mapinpandas": plan.count("MapInPandas"),
        "n_file_scans": plan.count("FileScan parquet"),
        "has_checkpointed_labels": "Scan ExistingRDD" in plan,
        "plan_lines": plan.count("\n"),
    }


def main() -> None:
    from doclayout_yolo_spark.queries_text import corpus_curation_v3
    from doclayout_yolo_spark.session import get_spark
    from tools.dedup_scale_bench import TENX_DIR, build_10x

    try:
        os.sched_setaffinity(0, range(CPUS))
    except (AttributeError, OSError):
        pass
    spark = get_spark(
        app="curation_scale", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.range(10).count()  # JVM warmup
    build_10x(spark)

    out: dict = {"base_sf_dir": BASE_SF, "tenx_dir": TENX_DIR, "cpus": CPUS}
    for label, sf_dir in (("1x", BASE_SF), ("10x", TENX_DIR)):
        best, n_out = float("inf"), None
        for _ in range(REPS):
            t0 = time.time()
            n_out = corpus_curation_v3(spark, sf_dir).count()
            best = min(best, time.time() - t0)
        out[label] = {
            "docs": spark.read.parquet(f"{sf_dir}/documents.parquet").count(),
            "wall_s": round(best, 3),
            "surviving_docs": n_out,
            "plan": plan_pins(corpus_curation_v3(spark, sf_dir)),
        }
    out["scaling_10x_over_1x"] = {
        "wall_ratio": round(out["10x"]["wall_s"] / out["1x"]["wall_s"], 2),
        "survivors_ratio": round(
            out["10x"]["surviving_docs"] / max(out["1x"]["surviving_docs"], 1), 2
        ),
    }
    pins_ok = all(
        out[lbl]["plan"]["n_mapinpandas"] == 1
        and out[lbl]["plan"]["has_checkpointed_labels"]
        and out[lbl]["plan"]["n_file_scans"] <= 6
        and out[lbl]["plan"]["plan_lines"] < 300
        for lbl in ("1x", "10x")
    )
    out["plan_pins_hold_at_10x"] = pins_ok

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/curation_scale.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
