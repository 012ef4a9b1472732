"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship layout-aware extraction query on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator (SURVEY.md §2 + training-data-pipeline ops) with DuckDB
oracles where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from doclayout_yolo_spark import contract  # noqa: E402
from doclayout_yolo_spark.queries_detect import extract_pages_flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: wrap sf0.001 documents into Common-Crawl-style HTML
    pages and run the full layout-aware extraction pipeline
    (bucketed repartition -> mapInPandas Arrow kernel -> text+spans)."""
    return extract_pages_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
