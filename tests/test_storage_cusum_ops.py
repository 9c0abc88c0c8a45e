"""Invariant + plan tests for the round-5 storage and CUSUM ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.storage import (
    partitioned_write_prune,
    schema_evolution_merge,
)
from database_peak_streaming_spark.operators.time_windows import (
    CUSUM_H_MICROS,
    cusum_drift_flags,
)
from database_peak_streaming_spark.plans import explain as E
from database_peak_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_schema_evolution_nulls_not_zeros(spark):
    """Old-schema rows must surface as NULL acctbal (count excludes
    them), never as silent zeros inflating n_with_acctbal."""
    rows = schema_evolution_merge(spark, SF_DIR).collect()
    c = load_table(spark, "customer", SF_DIR)
    odd = c.where(F.col("c_custkey") % 2 == 1).count()
    assert sum(r["n_with_acctbal"] for r in rows) == odd
    assert sum(r["n_rows"] for r in rows) == c.count()
    assert any(r["n_rows"] > r["n_with_acctbal"] for r in rows)


def test_partitioned_read_prunes_directories(spark):
    """The re-read's scan must carry partition filters (directory-level
    pruning), not read-everything-then-filter."""
    df = partitioned_write_prune(spark, SF_DIR)
    plan = E.formatted_plan(df)
    assert "PartitionFilters" in plan
    # both partition predicates must appear as partition filters, and
    # the data-file scan must not read the partition columns as data
    pf = plan[plan.index("PartitionFilters"):].split("]", 1)[0]
    assert "event_type" in pf and "hour" in pf


def test_cusum_matches_reference_recursion(spark):
    """The window form C_t - min(0, min prefix C) must equal the
    textbook recursion S_t = max(0, S_{t-1} + y_t), replayed in Python
    per event_type."""
    ev = (
        load_table(spark, "events", SF_DIR)
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append(r)
    expect = {}
    for et, rows in by_type.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        s = 0
        mx = 0
        flagged = 0
        first_ts = None
        for r in rows:
            y = round(r["value"] * 1_000_000) - 55_000_000
            s = max(0, s + y)
            mx = max(mx, s)
            if s > CUSUM_H_MICROS:
                flagged += 1
                if first_ts is None:
                    first_ts = r["ts"]
        expect[et] = (len(rows), flagged, round(mx / 1_000_000, 6), first_ts)
    got = {
        r["event_type"]: (
            r["n_events"],
            r["n_flagged"],
            r["max_cusum"],
            r["first_flag_ts"],
        )
        for r in cusum_drift_flags(spark, SF_DIR).collect()
    }
    assert got == expect
