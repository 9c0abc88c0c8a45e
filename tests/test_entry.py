"""Driver-contract tests for __spark_entry__: the exact surface the
external harness consumes (entry / queries / oracle_sql), pinned so a
refactor can't silently break the round gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # stable, named schema — no auto-generated aggregate column names
    assert all("(" not in c for c in df.columns), df.columns


def test_queries_and_oracles_consistent():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 125
    assert set(o) <= set(q), "oracle without a query"
    # every oracle is non-empty SQL text
    assert all(isinstance(s, str) and s.strip().upper().startswith(("SELECT", "WITH"))
               for s in o.values())


def test_check_window_prefix_stable():
    """The first 50 names in queries() iteration order ARE the driver's
    correctness window — they must all carry oracles and span the
    registry's modules (details asserted in tests/test_registry.py);
    here: the contract dict preserves registry order."""
    from database_peak_streaming_spark.registry import QUERIES

    assert list(entry_mod.queries())[:50] == list(QUERIES)[:50]


def test_every_query_callable_signature(spark):
    """Spot-check a sample across modules: every callable accepts
    (spark, sf_dir) and returns a DataFrame lazily (no eager action)."""
    from pyspark.sql import DataFrame

    from tests.conftest import SF_DIR

    q = entry_mod.queries()
    sample = list(q)[::17]  # every 17th query, ~8 across the registry
    for name in sample:
        df = q[name](spark, SF_DIR)
        assert isinstance(df, DataFrame), name


def test_bench_headline_names_registered():
    """bench.py's headline set must stay a subset of the registry (a
    query rename would otherwise break the driver's bench run), and its
    comparable subset must all carry oracles."""
    import bench

    from database_peak_streaming_spark.registry import ORACLE_SQL, QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"bench names not registered: {missing}"
    oracled = [n for n in bench.HEADLINE if n in ORACLE_SQL]
    assert len(oracled) >= 20, "comparable subset shrank unexpectedly"
