"""The Spark extraction job.

Plan (SURVEY §3.1 Spark rendering):

    scan(pages) -> select(url, html)            # column pruning, P3
      -> withColumn(part_id = pmod(xxhash64(url), n_buckets))
      -> [resume] LEFT ANTI JOIN manifest ON part_id   # exactly-once, P13
      -> repartition(P, part_id)                # explicit shuffle, P8
      -> mapInArrow(extract_kernel)             # fused Arrow kernel, P1/P11
      -> write parquet partitioned by part_id   # Iceberg-analog sink
    + per-task lineage rows via accumulator -> lineage parquet
    + manifest rows (one per completed bucket) -> manifest parquet

At 100 TB this maps 1:1 onto an Iceberg table: ``part_id`` becomes the
``bucket(url)`` partition transform, the manifest+data write becomes a
single atomic snapshot commit, and resume prunes scanned files by
partition.  Parquet stands in here because no Iceberg runtime jar is
available in the sandbox; the logic (anti-join resume keyed on bucket,
idempotent re-run) is identical.

Kernel determinism: per-document computation uses only the document's
own bytes (extract.extract_document), so outputs are byte-identical at
any parallelism / batch composition — the cross-parallelism test pins
this (SURVEY §5.6).
"""

from __future__ import annotations

import os
import time

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import KERNEL_VERSION, extract_document, extract_documents
from .tableformat import FORMAT, TOMBSTONE

SPANS_DDL = (
    "array<struct<region_id:int,cls:int,name:string,conf:double,"
    "x1:double,y1:double,x2:double,y2:double,start:int,end:int>>"
)
OUTPUT_DDL = (
    "url string, part_id int, extracted_text string, "
    f"spans {SPANS_DDL}, n_regions int, n_blocks int, page_h double, "
    "error string"
)

DEFAULT_BUCKETS = 64  # >> cores locally; thousands on a real cluster


class _ListAccum(AccumulatorParam):
    """Accumulates small per-task lineage dicts to the driver (one row
    per Arrow-kernel task — tiny even at 10^5 partitions)."""

    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def _extract_one(url: str, raw: bytes, stage_acc: dict | None = None):
    """Per-document quarantine wrapper (P9): a poisoned document must
    yield an error row, never kill the task — at 10^12 documents a
    one-in-a-billion parser bug would otherwise fail whole partitions."""
    try:
        text, regions, meta = extract_document(raw, stage_acc=stage_acc)
        return text, regions, meta, None
    except Exception as e:  # noqa: BLE001
        return (
            "",
            [],
            {"n_regions": 0, "n_blocks": 0, "page_h": 0.0},
            f"{type(e).__name__}: {e}"[:500],
        )


def _extract_batches(batches, lineage_acc=None):
    """mapInArrow kernel: iterator of Arrow record batches of (url,
    html, part_id) -> iterator of output record batches.  One fused
    kernel per task, mirroring the reference's
    single-predictor-per-worker pattern (engine/predictor.py:112,218).

    r6: Arrow-native on BOTH sides (was mapInPandas).  The old path
    paid a pandas object-column round trip each way, and built spans
    as per-row lists of dicts that pandas->Arrow coerced row by row —
    the dominant non-compute cost of the flagship (guide §4.2: hand
    whole batches to vectorized construction).  Spans are now built
    once per batch from flat field lists via StructArray/
    ListArray.from_arrays; url/html/part_id pass through as Arrow
    columns.  Row values are identical — only the serialization path
    changed (golden byte-identity + contract sweeps pin this)."""
    import pyarrow as pa  # noqa: PLC0415 — executor-side import

    from pyspark import TaskContext  # noqa: PLC0415

    t_start = time.time()
    n_docs = 0
    n_regions_total = 0
    bytes_in = 0
    part_ids = set()
    # per-stage speed attribution (A11 / predictor.py:259-266 parity):
    # parse / detect / NMS / assemble wall seconds, summed per task
    stage_acc: dict = {}
    span_struct = pa.struct(
        [
            ("region_id", pa.int32()), ("cls", pa.int32()),
            ("name", pa.string()), ("conf", pa.float64()),
            ("x1", pa.float64()), ("y1", pa.float64()),
            ("x2", pa.float64()), ("y2", pa.float64()),
            ("start", pa.int32()), ("end", pa.int32()),
        ]
    )
    out_schema = pa.schema(
        [
            ("url", pa.string()), ("part_id", pa.int32()),
            ("extracted_text", pa.string()),
            ("spans", pa.list_(span_struct)),
            ("n_regions", pa.int32()), ("n_blocks", pa.int32()),
            ("page_h", pa.float64()), ("error", pa.string()),
        ]
    )
    for rb in batches:
        raws = [
            h if h is not None else b""
            for h in rb.column(rb.schema.get_field_index("html")).to_pylist()
        ]
        pid_col = rb.column(rb.schema.get_field_index("part_id"))
        pids = pid_col.to_pylist()
        # one batched detector + NMS pass for the whole Arrow batch —
        # byte-identical to the per-doc path (extract.extract_documents),
        # ~1.4-16x the per-doc throughput depending on page size
        results = extract_documents(raws, stage_acc)
        texts: list[str] = []
        errors: list[str | None] = []
        nregs: list[int] = []
        nblks: list[int] = []
        pageh: list[float] = []
        offsets: list[int] = [0]
        f_rid: list[int] = []
        f_cls: list[int] = []
        f_name: list[str] = []
        f_conf: list[float] = []
        f_x1: list[float] = []
        f_y1: list[float] = []
        f_x2: list[float] = []
        f_y2: list[float] = []
        f_start: list[int] = []
        f_end: list[int] = []
        for raw, pid, (text, regions, meta, err) in zip(
            raws, pids, results
        ):
            texts.append(text)
            errors.append(err)
            nregs.append(meta["n_regions"])
            nblks.append(meta["n_blocks"])
            pageh.append(meta["page_h"])
            for r in regions:
                f_rid.append(r.region_id)
                f_cls.append(r.cls)
                f_name.append(r.name)
                f_conf.append(r.conf)
                f_x1.append(r.x1)
                f_y1.append(r.y1)
                f_x2.append(r.x2)
                f_y2.append(r.y2)
                f_start.append(r.start)
                f_end.append(r.end)
            offsets.append(len(f_rid))
            n_docs += 1
            n_regions_total += meta["n_regions"]
            bytes_in += len(raw)
            part_ids.add(pid)
        struct_arr = pa.StructArray.from_arrays(
            [
                pa.array(f_rid, pa.int32()), pa.array(f_cls, pa.int32()),
                pa.array(f_name, pa.string()), pa.array(f_conf, pa.float64()),
                pa.array(f_x1, pa.float64()), pa.array(f_y1, pa.float64()),
                pa.array(f_x2, pa.float64()), pa.array(f_y2, pa.float64()),
                pa.array(f_start, pa.int32()), pa.array(f_end, pa.int32()),
            ],
            fields=list(span_struct),
        )
        spans_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), struct_arr
        )
        yield pa.RecordBatch.from_arrays(
            [
                rb.column(rb.schema.get_field_index("url")).cast(pa.string()),
                pid_col.cast(pa.int32()),
                pa.array(texts, pa.string()),
                spans_arr,
                pa.array(nregs, pa.int32()),
                pa.array(nblks, pa.int32()),
                pa.array(pageh, pa.float64()),
                pa.array(errors, pa.string()),
            ],
            schema=out_schema,
        )
    if lineage_acc is not None and n_docs > 0:  # skip empty tasks
        tc = TaskContext.get()
        lineage_acc.add(
            [
                {
                    "task_partition_id": tc.partitionId() if tc else -1,
                    # accumulator updates in transformations are
                    # at-least-once (task retries / speculative attempts
                    # re-fire them); the driver dedups by partition id,
                    # last attempt wins
                    "attempt_number": tc.attemptNumber() if tc else 0,
                    "task_attempt_id": tc.taskAttemptId() if tc else -1,
                    "part_ids": sorted(part_ids),
                    "n_docs": n_docs,
                    "n_regions": n_regions_total,
                    "bytes_in": bytes_in,
                    "t_start": t_start,
                    "t_end": time.time(),
                    "parse_s": stage_acc.get("parse_s", 0.0),
                    "detect_s": stage_acc.get("detect_s", 0.0),
                    "nms_s": stage_acc.get("nms_s", 0.0),
                    "assemble_s": stage_acc.get("assemble_s", 0.0),
                    "kernel_version": KERNEL_VERSION,
                }
            ]
        )


def with_part_id(df: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Bucket assignment — the Iceberg ``bucket(n, url)`` transform
    analog.  xxhash64 is JVM-side and stable across runs."""
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )


def extract_pages(
    df: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
    lineage_acc=None,
) -> DataFrame:
    """Core transform: prune columns, bucket, run the fused Arrow
    kernel.  Returns the extraction DataFrame (lazy).

    The kernel is per-document deterministic, so the QUERY path never
    needs the rows grouped by bucket — shuffling the html payloads
    here was pure overhead (guide §8: heavy opaque bytes must move at
    most once, and for a read-compute-discard query they need not move
    at all).  The exchange is kept ONLY when the input's partitioning
    cannot feed every core (e.g. a single-split upstream scan); the
    bucket-grouped layout the Iceberg-style sink wants is established
    by ``run_extraction_job``'s own repartition before its partitioned
    write, which is unchanged."""
    pruned = df.select("url", "html")  # never ship text/lang into the kernel (P3)
    bucketed = with_part_id(pruned, n_buckets)
    sc = df.sparkSession.sparkContext
    try:
        cur = bucketed.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: keep the shuffle
        cur = 0
    if cur < sc.defaultParallelism:
        parts = num_partitions or sc.defaultParallelism
        bucketed = bucketed.repartition(parts, "part_id")
    return bucketed.mapInArrow(
        lambda it: _extract_batches(it, lineage_acc), schema=OUTPUT_DDL
    )


# ---------------------------------------------------------------------------
# job runner: manifest + lineage + exactly-once resume
# ---------------------------------------------------------------------------


# Storage concerns (data/manifest layout, commit, tombstone, reconcile,
# snapshot-staleness) live behind the TableFormat seam — see
# tableformat.py for the 1:1 mapping of each operation to the real
# Iceberg call a production deployment swaps in.  The thin wrappers
# below keep the historical pipeline API.


def _manifest_path(output_path: str) -> str:
    return FORMAT.manifest_path(output_path)


def _lineage_path(output_path: str) -> str:
    return FORMAT.lineage_path(output_path)


def data_path(output_path: str) -> str:
    return FORMAT.data_path(output_path)


def completed_buckets(spark: SparkSession, output_path: str) -> DataFrame | None:
    return FORMAT.committed_buckets(spark, output_path, KERNEL_VERSION)


def _reconcile_orphans(spark: SparkSession, output_path: str) -> list[int]:
    return FORMAT.reconcile(spark, output_path)


LINEAGE_DDL = (
    "task_partition_id int, attempt_number int, "
    "part_ids array<int>, n_docs long, "
    "n_regions long, bytes_in long, t_start double, t_end double, "
    "parse_s double, detect_s double, nms_s double, assemble_s double, "
    "kernel_version string"
)


def _dedup_lineage(rows) -> list[dict]:
    """Accumulator delivery is at-least-once under task retries /
    speculation: keep exactly one row per task partition, last attempt
    wins, so stats and the lineage table never double-count."""
    best: dict[int, dict] = {}
    for r in rows:
        k = r["task_partition_id"]
        cur = best.get(k)
        if cur is None or (
            (r["attempt_number"], r["task_attempt_id"])
            > (cur["attempt_number"], cur["task_attempt_id"])
        ):
            best[k] = r
    return [best[k] for k in sorted(best)]


def _write_lineage(spark: SparkSession, lineage_rows: list[dict], output_path: str) -> None:
    if not lineage_rows:
        return
    spark.createDataFrame(
        [
            (
                r["task_partition_id"], r["attempt_number"],
                r["part_ids"], r["n_docs"],
                r["n_regions"], r["bytes_in"], float(r["t_start"]),
                float(r["t_end"]),
                float(r.get("parse_s", 0.0)), float(r.get("detect_s", 0.0)),
                float(r.get("nms_s", 0.0)), float(r.get("assemble_s", 0.0)),
                r["kernel_version"],
            )
            for r in lineage_rows
        ],
        schema=LINEAGE_DDL,
    ).write.mode("append").parquet(_lineage_path(output_path))


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
    bucket_filter=None,
) -> dict:
    """Run (or resume) the extraction job.

    Resume semantics (P13): buckets listed in the manifest are skipped
    via a broadcast LEFT ANTI JOIN — re-running after a partial failure
    processes only unfinished buckets and never duplicates a row.
    Data directories for buckets missing from the manifest (crash
    between data and manifest commit) are deleted up front, so the
    pair behaves atomically.  ``bucket_filter`` (a Column predicate on
    part_id) exists for the kill/resume test to simulate a mid-job
    crash.
    """
    sc = spark.sparkContext
    orphans = _reconcile_orphans(spark, output_path)
    lineage_acc = sc.accumulator([], _ListAccum())

    bucketed = with_part_id(pages.select("url", "html"), n_buckets)
    done = completed_buckets(spark, output_path)
    if done is not None:
        bucketed = bucketed.join(F.broadcast(done), "part_id", "left_anti")
    if bucket_filter is not None:
        bucketed = bucketed.filter(bucket_filter)

    parts = num_partitions or sc.defaultParallelism
    out = bucketed.repartition(parts, "part_id").mapInArrow(
        lambda it: _extract_batches(it, lineage_acc), schema=OUTPUT_DDL
    )
    # Observation: the idiomatic Spark metrics hook — aggregates ride
    # the write action itself (no second job), complementing the
    # row-level lineage table with run-level counters
    from pyspark.sql import Observation  # noqa: PLC0415

    obs = Observation("extract_metrics")
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("extracted_text")).alias("chars"),
        F.count(F.col("error")).alias("errors"),
    )
    t0 = time.time()
    out.write.mode("append").partitionBy("part_id").parquet(data_path(output_path))
    wall = time.time() - t0
    observed = obs.get

    # lineage + manifest (post-write: in Iceberg these rows join the
    # same atomic snapshot commit as the data files)
    lineage_rows = _dedup_lineage(lineage_acc.value)
    n_docs = sum(r["n_docs"] for r in lineage_rows)
    processed = sorted({p for r in lineage_rows for p in r["part_ids"]})
    _write_lineage(spark, lineage_rows, output_path)
    FORMAT.commit_buckets(spark, output_path, processed, KERNEL_VERSION)
    return {
        "n_docs": n_docs,
        "n_buckets_processed": len(processed),
        "n_orphan_buckets_repaired": len(orphans),
        "wall_s": wall,
        "docs_per_sec": n_docs / wall if wall > 0 else 0.0,
        "observed_rows": int(observed.get("rows", 0) or 0),
        "observed_chars": int(observed.get("chars", 0) or 0),
        "observed_errors": int(observed.get("errors", 0) or 0),
    }


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.parquet(data_path(output_path))


def read_lineage(spark: SparkSession, output_path: str) -> DataFrame:
    """Lineage rows with schema evolution handled: round-1 outputs
    predate the attempt_number column, and a resumed job appends
    new-schema files into the same _lineage dir — a plain parquet read
    could drop the column or fail depending on which footer the reader
    samples.  mergeSchema unions the schemas; legacy rows surface with
    attempt_number = 0 (first attempt, the only kind round 1 recorded)."""
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(_lineage_path(output_path))
    )
    if "attempt_number" not in df.columns:
        df = df.withColumn("attempt_number", F.lit(0))
    df = df.withColumn(
        "attempt_number", F.coalesce(F.col("attempt_number"), F.lit(0))
    )
    # per-stage speed columns arrived in round 5; legacy rows -> 0.0
    for c in ("parse_s", "detect_s", "nms_s", "assemble_s"):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(0.0))
        else:
            df = df.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
    return df


def stale_buckets(
    spark: SparkSession, output_path: str, version: str = KERNEL_VERSION
) -> list[int]:
    """Buckets whose newest manifest row was written by an OLDER
    kernel: the targets of an incremental re-extraction after a kernel
    upgrade (the Iceberg snapshot-evolution analog — reprocess only
    what the new code would change, not the whole corpus).  Tombstoned
    buckets (emptied by an incremental removal) are NOT stale — they
    have no data to upgrade."""
    return FORMAT.stale_buckets(spark, output_path, version)


def reprocess_stale_buckets(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
) -> dict:
    """Re-extract only the buckets stamped with an older kernel
    version.  Data partitions are replaced via DYNAMIC partition
    overwrite (idempotent — a crashed re-run repeats harmlessly), then
    the manifest gains current-version rows, after which
    ``stale_buckets`` reports empty.  Old manifest rows stay as
    history, exactly like superseded Iceberg snapshots."""
    stale = stale_buckets(spark, output_path)
    if not stale:
        return {"n_docs": 0, "n_buckets_reprocessed": 0}
    sc = spark.sparkContext
    lineage_acc = sc.accumulator([], _ListAccum())
    bucketed = with_part_id(pages.select("url", "html"), n_buckets).filter(
        F.col("part_id").isin(stale)
    )
    parts = num_partitions or sc.defaultParallelism
    out = bucketed.repartition(parts, "part_id").mapInArrow(
        lambda it: _extract_batches(it, lineage_acc), schema=OUTPUT_DDL
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(data_path(output_path))
    )
    lineage_rows = _dedup_lineage(lineage_acc.value)
    n_docs = sum(r["n_docs"] for r in lineage_rows)
    _write_lineage(spark, lineage_rows, output_path)
    FORMAT.commit_buckets(spark, output_path, stale, KERNEL_VERSION)
    return {"n_docs": n_docs, "n_buckets_reprocessed": len(stale)}


def snapshot_diff(old_pages: DataFrame, new_pages: DataFrame) -> DataFrame:
    """(url, status) for two crawl snapshots of the pages table:
    added / removed / changed / unchanged by html content hash.  One
    full-outer hash join on the url key — no windows, no collect; the
    generic twin of the fixture-bound ``crawl_snapshot_diff`` contract
    query (queries_curation.py)."""
    cur = new_pages.select("url", F.md5(F.col("html")).alias("cur_md5"))
    prev = old_pages.select("url", F.md5(F.col("html")).alias("prev_md5"))
    status = (
        F.when(F.col("prev_md5").isNull(), "added")
        .when(F.col("cur_md5").isNull(), "removed")
        .when(F.col("cur_md5") == F.col("prev_md5"), "unchanged")
        .otherwise("changed")
    )
    return cur.join(prev, "url", "full_outer").select(
        "url", status.alias("status")
    )


def run_incremental_job(
    spark: SparkSession,
    old_pages: DataFrame,
    new_pages: DataFrame,
    output_path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    num_partitions: int | None = None,
) -> dict:
    """Incremental crawl update: diff the two snapshots, then
    re-extract ONLY the buckets touched by added / changed / removed
    urls — each affected bucket is rebuilt from the NEW snapshot via
    dynamic partition overwrite (idempotent: a crashed run repeats
    harmlessly, exactly like ``reprocess_stale_buckets``), and a
    bucket whose urls all vanished has its data partition deleted (the
    delete-file action an Iceberg snapshot commit would record).
    Untouched buckets are never read, never rewritten.

    Cost at crawl scale: one url-hash join (the diff) + extraction
    proportional to CHANGED content, not corpus size — the whole point
    of incremental ingestion at 10^12 documents."""
    # persisted: the status counts and the affected-bucket collect
    # both consume the diff, and the full-outer md5 join over two
    # snapshots is the dominant non-extraction cost at crawl scale —
    # paying it twice would double it
    diff = snapshot_diff(old_pages, new_pages).persist()
    counts = {
        r["status"]: r["count"]
        for r in diff.groupBy("status").count().collect()
    }
    affected = (
        with_part_id(diff.filter(F.col("status") != "unchanged"), n_buckets)
        .select("part_id")
        .distinct()
        .collect()
    )  # bounded by n_buckets — dimension-sized, never corpus-sized
    diff.unpersist(blocking=False)
    stale = sorted(r["part_id"] for r in affected)
    result = {
        "n_added": int(counts.get("added", 0)),
        "n_removed": int(counts.get("removed", 0)),
        "n_changed": int(counts.get("changed", 0)),
        "n_unchanged": int(counts.get("unchanged", 0)),
        "n_buckets_reprocessed": len(stale),
        "n_docs": 0,
    }
    if not stale:
        return result
    sc = spark.sparkContext
    lineage_acc = sc.accumulator([], _ListAccum())
    bucketed = with_part_id(new_pages.select("url", "html"), n_buckets).filter(
        F.col("part_id").isin(stale)
    )
    parts = num_partitions or sc.defaultParallelism
    out = bucketed.repartition(parts, "part_id").mapInArrow(
        lambda it: _extract_batches(it, lineage_acc), schema=OUTPUT_DDL
    )
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(data_path(output_path))
    )
    # dynamic overwrite only replaces partitions PRESENT in the write:
    # a bucket emptied by removals must be deleted explicitly, AND
    # recorded as a manifest tombstone — deleting only the data would
    # leave completed_buckets permanently claiming a bucket that has no
    # data directory, indistinguishable from a committed one at the
    # next _reconcile_orphans pass (r4 advisor finding)
    live = {
        r["part_id"]
        for r in bucketed.select("part_id").distinct().collect()
    }
    emptied = [p for p in stale if p not in live]
    for p in emptied:
        FORMAT.delete_partition_dir(output_path, p)
    lineage_rows = _dedup_lineage(lineage_acc.value)
    result["n_docs"] = sum(r["n_docs"] for r in lineage_rows)
    _write_lineage(spark, lineage_rows, output_path)
    FORMAT.commit_buckets(
        spark, output_path, [p for p in stale if p in live], KERNEL_VERSION
    )
    FORMAT.tombstone_buckets(spark, output_path, emptied)
    return result


# ---------------------------------------------------------------------------
# crawl-frontier outlinks
# ---------------------------------------------------------------------------

OUTLINKS_DDL = "url string, link_pos int, target string"


def extract_outlinks_df(pages: DataFrame) -> DataFrame:
    """(url, html) pages -> (url, link_pos, target) frontier rows via
    the shared outlink extractor (gzip + charset handling identical to
    the content path).  Map-only — zero shuffle; a poisoned page
    contributes no links rather than failing the task (P9 parity)."""

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        from .extract import extract_outlinks  # noqa: PLC0415

        for pdf in batches:
            urls, pos, tgt = [], [], []
            for u, h in zip(pdf["url"], pdf["html"]):
                try:
                    links = extract_outlinks(
                        u, bytes(h) if h is not None else b""
                    )
                except Exception:  # noqa: BLE001 — quarantine parity
                    links = []
                for i, t in enumerate(links):
                    urls.append(u)
                    pos.append(i)
                    tgt.append(t)
            yield pd.DataFrame({"url": urls, "link_pos": pos, "target": tgt})

    return pages.select("url", "html").mapInPandas(kern, schema=OUTLINKS_DDL)


METADATA_DDL = (
    "url string, title string, description string, og_title string,"
    " canonical string, lang string"
)


def extract_metadata_df(pages: DataFrame) -> DataFrame:
    """(url, html) pages -> one metadata row per page via the shared
    extractor (extract.extract_page_metadata — gzip + charset handling
    identical to the content path).  Map-only, zero shuffle; a
    poisoned page yields an all-None row rather than failing the task
    (P9 parity)."""

    def kern(batches):
        import pandas as pd  # noqa: PLC0415

        from .extract import extract_page_metadata  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for u, h in zip(pdf["url"], pdf["html"]):
                try:
                    md = extract_page_metadata(
                        u, bytes(h) if h is not None else b""
                    )
                except Exception:  # noqa: BLE001 — quarantine parity
                    md = {}
                rows.append(
                    {
                        "url": u,
                        "title": md.get("title"),
                        "description": md.get("description"),
                        "og_title": md.get("og_title"),
                        "canonical": md.get("canonical"),
                        "lang": md.get("lang"),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "title", "description", "og_title",
                    "canonical", "lang",
                ],
            )

    return pages.select("url", "html").mapInPandas(kern, schema=METADATA_DDL)


# ---------------------------------------------------------------------------
# skew-aware host aggregation (salting exemplar, P9)
# ---------------------------------------------------------------------------


def host_stats(pages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-host page counts/bytes over a zipf-skewed host distribution.

    Two-stage salted aggregation: stage 1 groups on (host, salt) so the
    hot host's rows spread over ``n_salts`` reducers (map-side partial
    aggregation still applies); stage 2 re-aggregates the tiny
    (host, salt) partials.  This is the explicit skew treatment the
    north rule asks for; AQE skew-join handling is the backstop.
    """
    host = F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("host")
    salted = pages.select(
        host,
        F.length("html").alias("html_bytes"),
        F.pmod(F.xxhash64("url"), F.lit(n_salts)).alias("salt"),
    )
    partial = salted.groupBy("host", "salt").agg(
        F.count("*").alias("c"), F.sum("html_bytes").alias("b")
    )
    return (
        partial.groupBy("host")
        .agg(F.sum("c").alias("n_pages"), F.sum("b").alias("total_html_bytes"))
        .orderBy(F.desc("n_pages"), "host")
    )


# ---------------------------------------------------------------------------
# host-graph PageRank (crawl prioritization over the outlink frontier)
# ---------------------------------------------------------------------------


def pagerank_df(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    handle_dangling: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over a weighted ``(src, dst, w)`` host
    graph — the crawl-prioritization consumer of the outlink frontier
    (``extract_outlinks_df``).  Output: one row per host, columns
    ``(host, pr)`` with Σpr = 1.

    Scale shape (|hosts| ~ 10^8 at crawl scale — far too big to
    broadcast or collect, tiny next to |docs|): each iteration is ONE
    equi-join of the rank vector to the edge list on ``src`` (both
    sides hash-partitioned on the join key; the edge side's shuffle is
    reused across iterations because the edge subtree is identical
    every round and Spark's ReuseExchange dedups identical exchanges
    in the final plan) plus ONE ``groupBy(dst)`` with map-side partial
    aggregation.  No driver-side actions, collects, or persists — the
    whole ``iters``-deep recurrence is a single lazy plan.

    Dangling hosts (no out-edges) leak rank mass; the leaked mass is
    recovered as ``1 - Σ contributions`` (rank mass is conserved, so
    the contributions' total is exactly the non-dangling share), read
    from the same aggregation via a one-row cross join.  That second
    reference to the contribution subtree would double the LOGICAL
    plan every round (2^iters analysis blowup), so the dangling path
    truncates lineage with an eager ``localCheckpoint`` per iteration
    — the standard Spark shape for iterative algorithms; the
    checkpointed frame is the |hosts|-row rank vector, not the edge
    list.  With ``handle_dangling=False`` (use when the graph is known
    dangling-free, e.g. every host link-reciprocated by construction)
    the whole recurrence stays one lazy, action-free, linear plan.
    """
    # the static side (edge transitions, host list, n) is referenced by
    # EVERY iteration; a lazy chain would re-derive it — and whatever
    # upstream corpus scan/extraction produced the edges — once per
    # iteration.  Materialize it once with an eager localCheckpoint:
    # the recurrence then references checkpointed partitions, the
    # upstream runs exactly once, and storage is released with the
    # frames (no persist bookkeeping).  localCheckpoint is lost on
    # executor failure — acceptable for a rank job that simply reruns.
    edges = edges.localCheckpoint(eager=True)
    hosts = (
        edges.select(F.col("src").alias("host"))
        .unionByName(edges.select(F.col("dst").alias("host")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_df = hosts.agg(F.count("*").cast("double").alias("n"))
    # per-src out-mass ow = Σw; the per-edge contribution is computed
    # as (pr * w) / ow — the SAME association order as the oracle's
    # `p.pr * ew.w / outw.ow`, so cross-engine drift is summation
    # order only (~1 ulp, far under the 6-dp rounding)
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    trans = (
        edges.join(outw, "src")
        .select("src", "dst", "w", "ow")
        .localCheckpoint(eager=True)
    )
    ranks = hosts.crossJoin(F.broadcast(n_df)).select(
        "host", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            ranks.join(trans, ranks.host == trans.src)
            .groupBy("dst")
            .agg(
                F.sum(F.col("pr") * F.col("w") / F.col("ow")).alias("contrib")
            )
        )
        base = hosts.join(
            contrib, hosts.host == contrib.dst, "left"
        ).select("host", F.coalesce("contrib", F.lit(0.0)).alias("contrib"))
        if handle_dangling:
            total = contrib.agg(F.sum("contrib").alias("tot"))
            base = base.crossJoin(F.broadcast(total))
            inflow = F.col("contrib") + (F.lit(1.0) - F.col("tot")) / F.col("n")
        else:
            inflow = F.col("contrib")
        ranks = base.crossJoin(F.broadcast(n_df)).select(
            "host",
            (
                (F.lit(1.0) - F.lit(damping)) / F.col("n")
                + F.lit(damping) * inflow
            ).alias("pr"),
        )
        if handle_dangling:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
