"""Oracle result-type guard (round-5 VERDICT task 1).

Both round-5 driver hash failures were the same bug class: a DuckDB
oracle whose ``SUM(BIGINT)`` result surfaced as ``HUGEINT`` (int128),
which the round driver's canonicalizer renders differently from BIGINT
while the local harness collapses the two — so the local gate stayed
green and the divergence only appeared at the driver.  This test runs
every registered oracle through DuckDB's binder and asserts no result
column carries a type outside the portable set, so the class can never
recur (it would have caught both round-5 reds before the driver did).
"""

from __future__ import annotations

import duckdb
import pytest

from database_peak_streaming_spark.harness.diff import oracle_connection
from database_peak_streaming_spark.registry import ORACLE_SQL
from tests.conftest import SF_DIR

#: Types whose canonical rendering is driver-dependent.  HUGEINT /
#: UHUGEINT are the diagnosed round-5 class; unsigned ints are banned
#: with them because the same "wider-than-int64 rendered differently"
#: hazard applies to UBIGINT.  LIST/STRUCT/MAP (round-6 red row
#: ``build_inverted_index``: ``BIGINT[]`` result column) are banned
#: because the driver canonicalizes with a pandas ``sort_values``,
#: where container cells are unhashable (``TypeError: unhashable
#: type: 'list'``) — nested results must be stringified
#: (``array_join`` / ``concat_ws`` on the Spark side,
#: ``LIST_AGGREGATE(..., 'string_agg', ...)`` in the oracle).
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT", "STRUCT", "MAP", "[]", "UNION"}


def _unportable(columns, types) -> list[str]:
    return [
        f"{col}:{typ}"
        for col, typ in zip(columns, map(str, types))
        if any(tok in str(typ).upper() for tok in _FORBIDDEN)
    ]


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return oracle_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_result_types_portable(con, name):
    rel = con.sql(ORACLE_SQL[name])
    bad = _unportable(rel.columns, rel.types)
    assert not bad, (
        f"{name}: oracle produces driver-unportable column types {bad}; "
        "stringify containers / CAST wide ints back to BIGINT "
        "(round-5 VERDICT #1/#2, round-6 VERDICT #1)"
    )


@pytest.mark.parametrize(
    "sql,col",
    [
        ("SELECT [1, 2, 3] AS x", "x:BIGINT[]"),  # the round-6 class
        ("SELECT {'a': 1} AS x", "x"),  # STRUCT
        ("SELECT MAP([1], ['a']) AS x", "x"),  # MAP
        ("SELECT SUM(x) AS x FROM (VALUES (1), (2)) t(x)", "x:HUGEINT"),
    ],
)
def test_guard_red_bars_container_and_wide_int_results(con, sql, col):
    """The guard itself must flag each diagnosed bug class — a synthetic
    LIST oracle (round 6), STRUCT/MAP, and the round-5 HUGEINT."""
    rel = con.sql(sql)
    bad = _unportable(rel.columns, rel.types)
    assert bad and bad[0].startswith(col.split(":")[0])
