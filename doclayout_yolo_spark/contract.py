"""Central registry for the driver contract (__spark_entry__.py):
query name -> (spark_callable, duckdb_oracle_sql | None)."""

from __future__ import annotations

from .queries_curation import CURATION_QUERIES
from .queries_detect import DETECT_QUERIES
from .queries_extra import EXTRA_QUERIES
from .queries_relational import RELATIONAL_QUERIES
from .queries_text import TEXT_QUERIES
from .queries_vector import VECTOR_QUERIES

ALL_QUERIES: dict = {}
for group in (
    RELATIONAL_QUERIES,
    TEXT_QUERIES,
    VECTOR_QUERIES,
    DETECT_QUERIES,
    EXTRA_QUERIES,
    CURATION_QUERIES,
):
    for name, pair in group.items():
        assert name not in ALL_QUERIES, f"duplicate query name {name}"
        ALL_QUERIES[name] = pair


def queries():
    return {name: fn for name, (fn, _sql) in ALL_QUERIES.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL_QUERIES.items() if sql is not None}
