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
#: hazard applies to UBIGINT.
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    return oracle_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_result_types_portable(con, name):
    rel = con.sql(ORACLE_SQL[name])
    bad = [
        f"{col}:{typ}"
        for col, typ in zip(rel.columns, map(str, rel.types))
        if any(tok in str(typ).upper() for tok in _FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle produces driver-unportable column types {bad}; "
        "CAST the aggregate back to BIGINT (see round-5 VERDICT #1/#2)"
    )
