"""Scan / projection / filter / scalar-subquery operators.

Reference parity: P1 projection (``database_peak_streaming.py:27``,
``analyze_data.py:49-51``), P4 TTL predicate (``:67``), P5 scalar-subquery
theta predicate (``:68-69``), S9/S10 catalog + full scan.

Scale notes: projections and predicates here compile to parquet
``ReadSchema``/``PushedFilters`` — verified by ``plans/explain.py``
helpers — so the 100 TB scan reads only the referenced columns and
row groups whose min/max stats pass the predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def scan_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select / rename / reorder / derived literal (P1, P2)."""
    p = load_table(spark, "part", sf_dir)
    return (
        p.select(
            F.col("p_partkey").alias("part_id"),
            F.col("p_name").alias("part_name"),
            F.col("p_retailprice").alias("price"),
            F.col("p_size").alias("size"),
        )
        .withColumn("price_tier", (F.col("price") / F.lit(100)).cast("long"))
        .orderBy("part_id")
    )


def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison / boolean / IN / BETWEEN / LIKE / IS NULL predicates
    (P4 generalized).  All of these push down to the parquet scan."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.filter(
            (F.col("o_orderstatus").isin("F", "P"))
            & F.col("o_totalprice").between(50_000, 200_000)
            & F.col("o_orderpriority").like("1%")
            & F.nullif(F.col("o_orderstatus"), F.lit("X")).isNotNull()
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .orderBy("o_orderkey")
    )


def filter_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate (P5: ``id < (SELECT id FROM st_data
    LIMIT 1)`` at ``database_peak_streaming.py:68-69``), generalized to
    "rows above the global mean".

    Spark-first: the scalar aggregate becomes a 1-row DataFrame joined in
    by broadcast — no driver-side ``collect`` round-trip, so the plan
    stays fully distributed and re-optimizable.
    """
    li = load_table(spark, "lineitem", sf_dir)
    threshold = li.agg(F.avg("l_extendedprice").alias("avg_price"))
    return (
        li.crossJoin(F.broadcast(threshold))
        .filter(F.col("l_extendedprice") > F.col("avg_price"))
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("l_returnflag")
    )


def catalog_list_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog scan (S9 ≙ ``sqlite_master`` at ``analyze_data.py:21-24``):
    register all fixture tables, list them from the session catalog.
    Scoped to the engine's own table set: Spark's session catalog is
    shared state (other queries may hold temp views in it), unlike the
    reference's per-file SQLite master table."""
    from database_peak_streaming_spark.sources.batch import TABLES, register_tables

    register_tables(spark, sf_dir)
    names = sorted(t.name for t in spark.catalog.listTables() if t.name in TABLES)
    return spark.createDataFrame([(n,) for n in names], "table_name string")


#: primary-key EXPRESSION per fixture table (manifest checksum basis).
#: lineitem's key is COMPOSITE — (l_orderkey, l_linenumber) — so its
#: checksum folds both columns (l_linenumber alone ranges 1-7 and its
#: sum is a near-constant that misses most row changes, e.g. a line
#: moving between orders; round-6 ADVICE).  The ``* 8`` keeps the fold
#: injective (l_linenumber < 8) and exact in BIGINT.  Expressions are
#: ANSI-portable: the same string runs in Spark SQL and the DuckDB
#: oracle.
_PK = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "CAST(l_orderkey AS BIGINT) * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version manifest: one row per fixture table with its row
    count, column count, and an exact key checksum — the snapshot
    fingerprint a data-versioning layer (DVC / Delta snapshot / lakeFS
    commit) records so "did anything change since the last run?" is one
    tiny table compare instead of a 100 TB diff.  The checksum bases on
    the integer key column (engine-portable exact arithmetic; content
    hashing of float/text columns would hang cross-engine equality on
    value FORMATTING, which is exactly what the differential harness
    exists to avoid).

    Ten independent tiny aggregates unioned — each is one scan of only
    its key column (column pruning leaves every other byte unread), so
    the manifest costs key-column IO, not table IO."""
    parts = []
    for t in sorted(_PK):
        pk = _PK[t]
        parts.append(
            load_table(spark, t, sf_dir).agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr(pk).cast("long")).alias("key_checksum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


def ps_api_groupby_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-on-Spark API surface (``pyspark.pandas``): the pandas
    idiom — ``df.pandas_api().groupby(...).agg(...)`` — lowered onto
    the SAME Catalyst plan as the DataFrame form.  This is the
    migration bridge for the reference's pandas/numpy analysis style
    (analyze_data.py works in DataFrames-as-pandas terms): a user can
    keep pandas syntax and get distributed execution, because ps ops
    compile to Spark plans, never collect.

    Values ride the cent grid so count/sum/max are exact BIGINTs.
    Note ps adds NO distributed-ordering guarantees pandas has — which
    is why the result is explicitly sorted before comparison, same as
    every other query here."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    psdf = o.pandas_api()
    g = psdf.groupby("o_orderstatus").agg({"cents": ["count", "sum", "max"]})
    g.columns = ["count", "sum", "max"]
    out = g.reset_index().to_spark()
    return (
        out.select(
            F.col("o_orderstatus").alias("status"),
            F.col("count").cast("long").alias("n_orders"),
            (F.col("sum") / F.lit(100.0)).alias("total_price"),
            (F.col("max") / F.lit(100.0)).alias("max_price"),
        )
        .orderBy("status")
    )


QUERIES = {
    "dataset_manifest": dataset_manifest,
    "ps_api_groupby_stats": ps_api_groupby_stats,
    "scan_project_rename": scan_project_rename,
    "filter_predicates": filter_predicates,
    "filter_scalar_subquery": filter_scalar_subquery,
    "catalog_list_tables": catalog_list_tables,
}

ORACLE_SQL = {
    "dataset_manifest": """
            SELECT 'customer' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(c_custkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM customer
            UNION ALL
            SELECT 'documents' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(doc_id AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM documents
            UNION ALL
            SELECT 'embeddings' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(vec_id AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM embeddings
            UNION ALL
            SELECT 'events' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(event_id AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM events
            UNION ALL
            SELECT 'lineitem' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_orderkey AS BIGINT) * 8 + l_linenumber)
                        AS BIGINT)
                       AS key_checksum FROM lineitem
            UNION ALL
            SELECT 'nation' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(n_nationkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM nation
            UNION ALL
            SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM orders
            UNION ALL
            SELECT 'part' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(p_partkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM part
            UNION ALL
            SELECT 'region' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(r_regionkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM region
            UNION ALL
            SELECT 'supplier' AS table_name, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(s_suppkey AS BIGINT)) AS BIGINT)
                       AS key_checksum FROM supplier
        ORDER BY table_name
    """,
    "scan_project_rename": """
        SELECT p_partkey AS part_id, p_name AS part_name,
               p_retailprice AS price, p_size AS size,
               CAST(FLOOR(p_retailprice / 100) AS BIGINT) AS price_tier
        FROM part ORDER BY part_id
    """,
    "filter_predicates": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND o_totalprice BETWEEN 50000 AND 200000
          AND o_orderpriority LIKE '1%'
          AND NULLIF(o_orderstatus, 'X') IS NOT NULL
        ORDER BY o_orderkey
    """,
    "filter_scalar_subquery": """
        SELECT l_returnflag, COUNT(*) AS n_above_avg
        FROM lineitem
        WHERE l_extendedprice > (SELECT AVG(l_extendedprice) FROM lineitem)
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "catalog_list_tables": """
        SELECT table_name FROM (VALUES ('customer'),('documents'),('embeddings'),
            ('events'),('lineitem'),('nation'),('orders'),('part'),('region'),
            ('supplier')) AS t(table_name)
        ORDER BY table_name
    """,
}

ORACLE_SQL["ps_api_groupby_stats"] = """
    WITH o AS (
        SELECT o_orderstatus,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders)
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           SUM(cents) / 100.0 AS total_price,
           MAX(cents) / 100.0 AS max_price
    FROM o GROUP BY o_orderstatus ORDER BY status
"""
