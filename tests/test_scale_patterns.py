"""Scale-pattern tests: skew salting (semantics preserved), bucketed
co-located joins (shuffle elimination visible in the plan), and
partition pruning (date predicates prune directories, not just rows)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_salted_agg_equals_plain(spark):
    from database_peak_streaming_spark.operators.skew import salted_agg

    li_load = __import__(
        "database_peak_streaming_spark.sources.batch", fromlist=["load_table"]
    ).load_table
    li = li_load(spark, "lineitem", SF_DIR)
    salted = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("l_orderkey", "count"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
    ).collect()
    plain = (
        li.groupBy("l_returnflag")
        .agg(
            F.count("l_orderkey").alias("n"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .collect()
    )
    key = lambda rows: {r.l_returnflag: (r.n, r.min_qty, r.max_qty) for r in rows}
    assert key(salted) == key(plain)


def test_salted_decimal_sum_bit_identical(spark):
    from database_peak_streaming_spark.operators.common import dsum
    from database_peak_streaming_spark.operators.skew import salted_sum_decimal
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", SF_DIR)
    salted = {
        r.l_returnflag: r.s
        for r in salted_sum_decimal(li, ["l_returnflag"], "l_extendedprice", "s").collect()
    }
    plain = {
        r.l_returnflag: r.s
        for r in li.groupBy("l_returnflag").agg(dsum("l_extendedprice", "s")).collect()
    }
    assert salted == plain  # exact equality — decimal path is order-free


def test_salted_rejects_non_algebraic(spark):
    from database_peak_streaming_spark.operators.skew import salted_agg
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", SF_DIR)
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(li, ["l_returnflag"], {"m": ("l_quantity", "median")})


def test_bucketed_join_eliminates_shuffle(spark, tmp_path_factory):
    from database_peak_streaming_spark.plans import explain as E
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.sources.bucketing import (
        cobucketed_join,
        write_bucketed,
    )

    o = load_table(spark, "orders", SF_DIR).select("o_orderkey", "o_totalprice")
    li = load_table(spark, "lineitem", SF_DIR).select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(o, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, sort_col="o_orderkey")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # fixture tables are broadcast-sized; disable broadcast so the
        # plan shows what a fact-fact join would do at real scale
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = E.formatted_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located: no exchange on either side of the join
        assert "Exchange hashpartitioning" not in plan, plan
        # and the answer matches the plain join
        assert joined.count() == o.join(li, "o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_partition_pruning_skips_directories(spark, tmp_path_factory):
    """A date predicate over a date-partitioned table must prune at the
    DIRECTORY level — the scan's input files may only come from matching
    partitions.  This is the read-side contract behind the tiered
    store's layout (partition-drop TTL, date-scoped backfills): at 100 TB
    a query for one day touches one directory, not the table."""
    from database_peak_streaming_spark.sources.batch import load_table

    out = str(tmp_path_factory.mktemp("part_prune") / "events_by_date")
    ev = load_table(spark, "events", SF_DIR).withColumn(
        "date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("date").parquet(out)

    one_day = spark.read.parquet(out).filter(F.col("date") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the predicate must become a PARTITION filter (directory pruning),
    # not a row-level data filter over the whole table
    assert "PartitionFilters: [isnotnull(date" in plan, plan
    assert "= 2024-01-02)" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan
    # and the pruned read still answers correctly
    want = ev.filter(F.to_date("ts") == "2024-01-02").count()
    assert one_day.count() == want > 0


def test_runtime_bloom_filter_injects_on_selective_shuffle_join(spark):
    """Catalyst's runtime row-level Bloom filter (SPARK-32268) — the
    engine-native twin of the manual ``join_bloom_prefilter`` — must
    inject a ``bloom_filter_agg`` / ``might_contain`` pair when a
    selective build side feeds a SHUFFLE join: the filter prunes probe
    rows before the exchange, which is the whole game at 100 TB.  The
    fixture sides are far below the production size thresholds, so the
    thresholds are lowered for the probe (broadcast also disabled —
    with a broadcast join there is no probe-side shuffle to protect
    and Spark rightly skips injection); production keeps the defaults
    and gets the same rewrite on real volumes."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        sup = spark.read.parquet(f"{SF_DIR}/supplier.parquet").filter(
            F.col("s_acctbal") >= 9000
        )
        j = (
            li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .groupBy("s_nationkey")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
