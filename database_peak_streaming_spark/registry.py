"""Central registry of the engine's query surface.

Aggregates QUERIES/ORACLE_SQL from every operator module; this is what
``__spark_entry__.py`` (the driver contract) and the local harness serve.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from database_peak_streaming_spark.operators import (
    aggregates,
    arrays_json,
    curation,
    dedup,
    joins,
    pivots,
    sampling,
    scalars,
    scans,
    similarity,
    sorts_setops,
    storage,
    text,
    time_windows,
    tpch_like,
    udf_queries,
    windows,
)

_MODULES = [
    scans,
    aggregates,
    tpch_like,
    joins,
    windows,
    sorts_setops,
    scalars,
    arrays_json,
    pivots,
    time_windows,
    text,
    dedup,
    similarity,
    udf_queries,
    storage,
    sampling,
    curation,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
    for _name, _sql in _m.ORACLE_SQL.items():
        if _name not in _m.QUERIES:
            raise ValueError(f"oracle without query: {_name}")
        ORACLE_SQL[_name] = _sql
