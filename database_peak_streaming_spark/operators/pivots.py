"""Pivot (long->wide) and melt/stack (wide->long) operators
(SURVEY.md §2B pivot row; reference A8 per-port regroup at
``analyze_data.py:66-82`` and the wide ``peak1..peakN`` storage schema).

The engine's canonical layout is LONG (one row per measurement) — wide
views are produced on demand by ``pivot`` and consumed back by
``stack``.  Scale note: ``pivot`` with an explicit value list avoids the
extra distinct-values scan Spark otherwise runs; the value list is part
of the schema config (as the reference's ``num_of_peaks`` was).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.common import DEC
from database_peak_streaming_spark.sources.batch import load_table


def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(returnflag).pivot(linestatus): long -> wide qty sums.
    Explicit value list ('F','O') — no discovery scan."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .select(
            "l_returnflag",
            F.col("F").alias("qty_f"),
            F.col("O").alias("qty_o"),
        )
        .orderBy("l_returnflag")
    )


def melt_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stack (wide -> long): unpivot per-order numeric columns into
    (measure, value) rows — the inverse of pivot_wide, mirroring how the
    reference's wide ``peak1..peakN`` rows melt back to long form."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.expr(
                "stack(2, 'totalprice', o_totalprice, "
                "'custkey_x10', CAST(o_custkey * 10 AS DOUBLE)) AS (measure, value)"
            ),
        )
        .orderBy("o_orderkey", "measure")
    )


QUERIES = {
    "pivot_wide": pivot_wide,
    "melt_stack": melt_stack,
}

ORACLE_SQL = {
    "pivot_wide": f"""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS {DEC})) FILTER (WHERE l_linestatus = 'F')
                    AS DOUBLE) AS qty_f,
               CAST(SUM(CAST(l_quantity AS {DEC})) FILTER (WHERE l_linestatus = 'O')
                    AS DOUBLE) AS qty_o
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "melt_stack": """
        SELECT o_orderkey, measure, value FROM (
            SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
            FROM orders WHERE o_orderkey <= 500
            UNION ALL
            SELECT o_orderkey, 'custkey_x10', CAST(o_custkey * 10 AS DOUBLE)
            FROM orders WHERE o_orderkey <= 500
        ) u ORDER BY o_orderkey, measure
    """,
}
