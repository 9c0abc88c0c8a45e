"""Batch sources/sinks: parquet/CSV/JSON readers and the table catalog.

Reference parity:
* S9 catalog scan (``sqlite_master`` at reference ``analyze_data.py:21-24``)
  -> ``spark.catalog.listTables()`` over registered temp views.
* S10 full-table scan (``analyze_data.py:44-47``) -> ``spark.read.parquet``;
  Catalyst prunes columns and pushes predicates into the scan, which the
  reference's ``SELECT *`` + Python loop could never do.
* S11 CSV export (drafted at ``analyze_data.py:8-26``) -> ``write_csv``.

Scale note: Parquet scans split at ``maxPartitionBytes`` so a 100 TB table
becomes ~800k uniform scan tasks; filters/projections reach the reader
(check ``PushedFilters`` in ``df.explain``), so queries touching a few
columns/partitions read a few columns/partitions, not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: The fixture tables (TESTDATA.md) — TPC-H-ish star schema + events
#: stream replay + LLM-data tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Memoized scan relations, keyed by (applicationId, table, dir, fanout).
#: Building a fresh reader per query re-lists the directory and re-reads
#: parquet footers on the DRIVER — measured as a large share of the
#: constant ~1s per-query overhead at toy scale (Catalyst's own
#: planning phases are ~0.1-0.5 s/query per QueryPlanningTracker).
#: DataFrames are immutable, so handing
#: every query the same resolved relation is semantically free; the
#: fixture dirs are never mutated within a session (writers use their
#: own paths).  Keyed by applicationId so a new session never sees a
#: dead session's plans; stale entries are purged on first miss.
_SCAN_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one fixture table as a DataFrame (lazy; no IO until an action).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read nanos as long (legacy conf) and rebuild the
    microsecond TimestampType column in the plan — a pure column
    expression, so the conversion is distributed and codegen'd (same
    truncation DuckDB applies casting ns->us).  The fixtures carry no
    sub-microsecond precision, so this is exact.
    """
    app_id = spark.sparkContext.applicationId
    key = (
        app_id,
        name,
        sf_dir,
        os.environ.get("SPARK_GRAFT_SCAN_FANOUT") == "1",
    )
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    for stale in [k for k in _SCAN_CACHE if k[0] != app_id]:
        del _SCAN_CACHE[stale]
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    df = _maybe_fanout(spark, name, df)
    _SCAN_CACHE[key] = df
    return df


#: Tables eligible for scan fan-out: the ones with heavy PER-ROW compute
#: downstream (JSON parsing, tokenization, vector math), where parallel
#: CPU wins exceed the redistribution shuffle.  Plain scan->agg tables
#: (lineitem/orders) measured *slower* with fan-out — the shuffle costs
#: more than single-core partial aggregation saves.
_FANOUT_TABLES = frozenset({"events", "documents", "embeddings"})


def _maybe_fanout(spark: SparkSession, name: str, df: DataFrame) -> DataFrame:
    """Opt-in scan fan-out (``SPARK_GRAFT_SCAN_FANOUT=1``; bench only).

    The fixture parquet files hold ONE row group each, which hard-caps
    scan + partial-aggregate parallelism at one task no matter how the
    byte range splits.  The fan-out repartition trades one small shuffle
    for full-core downstream parallelism — measured 1.5x on the headline
    suite locally.  Default OFF: a production 100 TB table has thousands
    of row groups, scan parallelism comes free, and this shuffle would be
    pure waste — which is why it is an env-gated bench tweak, not an
    operator behavior.
    """
    if name in _FANOUT_TABLES and os.environ.get("SPARK_GRAFT_SCAN_FANOUT") == "1":
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def fanout_barrier(df: DataFrame) -> DataFrame:
    """Pin heavy in-row projections ABOVE the scan fan-out (round 12).

    Catalyst pushes deterministic projections below a repartition, so a
    per-row kernel (gram construction, tokenization HOFs) placed after
    ``_maybe_fanout``'s exchange can land back on the one-row-group scan
    task and run single-threaded anyway.  Under the same env gate as the
    fan-out, cut lineage so the projection stays above the exchange; the
    materialized rows are the PRE-kernel narrow columns the caller
    selected.  Default OFF like the fan-out itself: at production
    row-group counts scan parallelism is free and neither the exchange
    nor the cut should exist (a corpus-sized text checkpoint would be
    exactly wrong at 100 TB).
    """
    if os.environ.get("SPARK_GRAFT_SCAN_FANOUT") == "1":
        return df.localCheckpoint()
    return df


def compute_width(spark: SparkSession) -> int:
    """Partition width for COMPUTE-BOUND keyed repartitions.

    Compute-quadratic stages (pair joins, wedge aggregations) want one
    task per core even when the configured shuffle width is tuned lower
    for byte-bound work — AQE's byte-based coalescing would otherwise
    collapse a small-bytes/huge-CPU exchange to a handful of tasks.
    Both inputs scale with the deployment (``spark.sql.shuffle.partitions``
    via env/conf, ``defaultParallelism`` with the master's core count),
    so nothing here pins local mode.  Shared policy for every call site
    (round-13, ADVICE ask: one definition instead of five copies).
    """
    return max(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        spark.sparkContext.defaultParallelism,
    )


def register_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view (the session catalog).

    Equivalent of the reference's create-if-not-exists bootstrap +
    ``sqlite_master`` introspection: after this, ``spark.sql`` sees the
    same table names the DuckDB oracle does and
    ``spark.catalog.listTables()`` enumerates them.
    """
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def list_tables(spark: SparkSession) -> list[str]:
    """Catalog scan (S9): names of all tables visible to the session."""
    return sorted(t.name for t in spark.catalog.listTables())


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV read with header (S11 read side). Explicit schema preferred at
    scale — schema inference is an extra full scan."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink with header row (S11; reference drafted it via
    ``cur.description`` at ``analyze_data.py:8-26``)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines read; schema optional (inference costs a scan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "append", partition_by: tuple[str, ...] = ()
) -> None:
    """Parquet sink (S7 append / overwrite). ``partition_by`` date columns
    turn retention deletes into metadata-only partition drops (§4)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
