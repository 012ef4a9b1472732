"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

import os

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")
# golden-snapshot oracles are generated for sf0.01 inputs only
GOLDEN_ONLY_AT_001 = {
    "det_grouped_postprocess", "detection_map", "det_confusion_matrix",
    "refine_region_scores", "compression_ratio",
}


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision: the driver hashes exact values, so 9 sig figs
        # here would hide mismatches the driver catches
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26].rstrip("0")
    return str(v)


def row_key(row):
    return tuple(normalize(v) for v in row)


def main(only: list[str], spark=None) -> int:
    from doclayout_yolo_spark.contract import ALL_QUERIES
    from doclayout_yolo_spark.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark(
            app="check_contract", master="local[8]", shuffle_partitions=8
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name, (fn, sql) in ALL_QUERIES.items():
        if only and name not in only:
            continue
        if name in GOLDEN_ONLY_AT_001 and not SF_DIR.endswith("sf0.01"):
            print(f"[skip] {name}: golden oracle is sf0.01-only")
            continue
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                row_key(tuple(r[c] for c in scols)) for r in srows
            )
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {str(e)[:300]}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            res = con.execute(sql)
            dcols_full = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            continue
        dcols = sorted(dcols_full)
        idx = [dcols_full.index(c) for c in dcols]
        dset = sorted(row_key(tuple(r[i] for i in idx)) for r in drows)
        ok_cols = scols == dcols
        ok_count = len(srows) == len(drows)
        ok_vals = sset == dset
        status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"[{status}] {name}: spark={len(srows)} duck={len(drows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {dcols}'}"
        )
        if not ok_vals and ok_cols and ok_count:
            diff = [
                (a, b) for a, b in zip(sset, dset) if a != b
            ][:3]
            for a, b in diff:
                print(f"    spark {a}\n    duck  {b}")
        if status == "FAIL":
            failures.append((name, "mismatch"))
    if own_session:
        spark.stop()
    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
