"""Differential tests: every registered query with an oracle must
hash-match DuckDB on sf0.001 (t1 smoke tier; the driver re-runs the same
contract at sf0.01).  One parametrized test per query so failures are
individually visible.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _query_names():
    from database_peak_streaming_spark.registry import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, oracle, name):
    from database_peak_streaming_spark.harness.diff import diff_query
    from database_peak_streaming_spark.registry import ORACLE_SQL, QUERIES

    df = QUERIES[name](spark, SF_DIR)
    sql = ORACLE_SQL.get(name)
    if sql is None:
        # Non-SQL-expressible op: must run AND yield rows — an empty
        # result is a silent regression, not a pass.
        assert df.count() > 0, f"{name}: no-oracle query returned 0 rows"
        return
    res = diff_query(name, df, sql, oracle)
    assert res.rows_match, res.describe()
    assert res.hash_match, res.describe()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
