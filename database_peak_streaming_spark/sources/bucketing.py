"""Bucketed tables for co-located (shuffle-free) joins (SURVEY.md §4;
"Partitioning & shuffle" in the project brief).

A fact-fact join (orders x lineitem on orderkey) shuffles BOTH sides on
every query.  Bucketing pays that shuffle ONCE at write time: both
tables hash-clustered into the same bucket count on the join key, so
every subsequent join plans as a zip of corresponding buckets — at
100 TB this removes the single largest recurring cost of a star-schema
workload.  The plan-level effect (SortMergeJoin with no Exchange on
either side) is asserted in tests/test_scale_patterns.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table.  Sorting within buckets additionally removes the join's sort
    step (pure merge)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — planner emits a
    shuffle-free (and with sortBy, sort-free) SortMergeJoin."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
