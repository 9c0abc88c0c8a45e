"""Storage-format operators: CSV/JSON round-trips, SQL-string API, and
remaining grouping surfaces (SURVEY.md §2B scan/sink rows; S8/S11).

The round-trip queries exercise the engine's non-parquet IO paths
end-to-end: write to a session-scoped temp location, read back, verify
against the parquet-sourced oracle — proving format fidelity (headers,
type inference, JSON lines) not just API presence.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_peak_streaming_spark.operators.common import dsum
from database_peak_streaming_spark.sources.batch import load_table, read_csv, read_json, write_csv


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 (drafted CSV export, analyze_data.py:8-26) done for real:
    nation -> CSV with header -> read back with explicit schema ->
    aggregate.  Explicit schema on re-read: inference is an extra scan
    and type-lossy (the scale rule)."""
    n = load_table(spark, "nation", sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dps_csv_roundtrip_{os.getpid()}")
    write_csv(n, path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema=schema)
    return (
        back.groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"), F.min("n_name").alias("first_name"))
        .orderBy("n_regionkey")
    )


def jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write + schema-given read (supplier), then project."""
    s = load_table(spark, "supplier", sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dps_jsonl_roundtrip_{os.getpid()}")
    s.write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    back = read_json(spark, path, schema=schema)
    return (
        back.select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_suppkey")
    )


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write + read round-trip (part) — the third columnar-adjacent
    format after parquet and the text formats, exercising Spark's
    built-in ORC source/sink (vectorized reader, predicate pushdown).
    Schema given on re-read, same rule as the CSV path.  The aggregate
    runs on the re-read data, so the oracle (computed from parquet)
    proves the format preserved values, not just that the API ran."""
    p = load_table(spark, "part", sf_dir)
    path = os.path.join(tempfile.gettempdir(), f"dps_orc_roundtrip_{os.getpid()}")
    p.select("p_partkey", "p_brand", "p_size", "p_retailprice").write.mode(
        "overwrite"
    ).orc(path)
    schema = T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).orc(path)
    return (
        back.filter(F.col("p_size") <= 20)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", "sum_price"),
            F.min("p_partkey").alias("min_partkey"),
        )
        .orderBy("p_brand")
    )


def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS beyond rollup/cube: exactly the sets asked for,
    via the SQL surface (the DataFrame API has no direct equivalent)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map / map_keys / map_values / element_at on built maps."""
    r = load_table(spark, "region", sf_dir)
    m = F.create_map(
        F.lit("key"), F.col("r_regionkey").cast("string"),
        F.lit("name"), F.col("r_name"),
    )
    return (
        r.select(
            "r_regionkey",
            F.map_keys(m)[0].alias("k0"),
            F.map_keys(m)[1].alias("k1"),
            F.element_at(m, "name").alias("name_via_map"),
            F.size(F.map_values(m)).cast("long").alias("n_vals"),
        )
        .orderBy("r_regionkey")
    )


def sql_api_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query through the engine's SQL-string surface —
    same Catalyst plan as the DataFrame form (S8/S9: views + SQL)."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_sql")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem_sql
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


def sql_api_cte_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-dialect breadth: CTE + LATERAL VIEW explode + two-level
    aggregation through the SQL-string surface — the HiveQL-style
    row-generator syntax a SQL-first user reaches for (the DataFrame
    twin is ``array_explode_pos``).  Explode fans out rows inside one
    codegen stage; only the per-doc aggregate shuffles."""
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents_sql")
    return spark.sql(
        """
        WITH toks AS (
            SELECT doc_id, tok
            FROM documents_sql
            LATERAL VIEW explode(split(text, ' ')) t AS tok
        )
        SELECT doc_id,
               COUNT(*) AS n_tok,
               COUNT(DISTINCT tok) AS n_distinct
        FROM toks
        GROUP BY doc_id
        ORDER BY doc_id
        LIMIT 100
        """
    )


QUERIES = {
    "csv_roundtrip": csv_roundtrip,
    "sql_api_cte_lateral": sql_api_cte_lateral,
    "jsonl_roundtrip": jsonl_roundtrip,
    "orc_roundtrip": orc_roundtrip,
    "grouping_sets_explicit": grouping_sets_explicit,
    "map_funcs": map_funcs,
    "sql_api_q1": sql_api_q1,
}

ORACLE_SQL = {
    "sql_api_cte_lateral": """
        WITH toks AS (
            SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
            FROM documents
        )
        SELECT doc_id,
               COUNT(*) AS n_tok,
               COUNT(DISTINCT tok) AS n_distinct
        FROM toks
        GROUP BY doc_id
        ORDER BY doc_id
        LIMIT 100
    """,
    "csv_roundtrip": """
        SELECT n_regionkey, COUNT(*) AS n, MIN(n_name) AS first_name
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
    "jsonl_roundtrip": """
        SELECT s_suppkey, s_name, ROUND(s_acctbal, 2) AS acctbal
        FROM supplier ORDER BY s_suppkey
    """,
    "orc_roundtrip": """
        SELECT p_brand, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
               MIN(p_partkey) AS min_partkey
        FROM part WHERE p_size <= 20
        GROUP BY p_brand ORDER BY p_brand
    """,
    "grouping_sets_explicit": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    "map_funcs": """
        SELECT r_regionkey,
               'key' AS k0,
               'name' AS k1,
               r_name AS name_via_map,
               CAST(2 AS BIGINT) AS n_vals
        FROM region ORDER BY r_regionkey
    """,
    "sql_api_q1": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
}
