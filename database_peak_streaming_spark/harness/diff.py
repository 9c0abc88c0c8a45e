"""Run an engine query and its ANSI-SQL oracle side-by-side and compare.

Mirrors what the round driver does (row-count + schema + order-insensitive
value hash) so regressions surface locally before a round ends.

Canonicalization (FIXTURES.md "Canonicalization rules"):
* columns sorted by name,
* doubles rounded to 6 decimals (engines differ in last-ulp float math;
  exact-decimal aggregation inside the queries keeps sums bit-stable,
  rounding mops up the rest),
* timestamps rendered as UTC ISO-8601 strings,
* NULL -> fixed token,
* rows sorted -> sha256.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from database_peak_streaming_spark.sources.batch import TABLES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with every fixture table registered as a view.
    Accepts all three layouts: a single parquet file per table (the
    driver fixtures), a flat directory of part files (bench_scaled.py's
    scaled copies), or a hive-partitioned directory tree (Spark
    ``partitionBy`` output — the partition column is recovered from the
    directory names)."""
    import os

    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.isdir(path):
            src = (
                f"read_parquet('{path}/**/*.parquet', hive_partitioning = 1)"
            )
        else:
            src = f"'{path}'"
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM {src}")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == 0:
            r = 0.0  # normalize -0.0
        return f"{r:.6f}"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, _dt.timedelta):
        return f"interval:{v.total_seconds()}"
    import decimal

    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6f}"
    return str(v)


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class DiffResult:
    name: str
    engine_rows: int
    oracle_rows: int
    rows_match: bool
    hash_match: bool
    engine_cols: list[str]
    oracle_cols: list[str]

    @property
    def ok(self) -> bool:
        return self.rows_match and self.hash_match

    def describe(self) -> str:
        status = "OK" if self.ok else "FAIL"
        return (
            f"[{status}] {self.name}: engine={self.engine_rows} oracle={self.oracle_rows}"
            f" rows_match={self.rows_match} hash_match={self.hash_match}"
        )


def diff_query(
    name: str,
    engine_df: DataFrame,
    sql: str,
    con: duckdb.DuckDBPyConnection,
) -> DiffResult:
    engine_rows = engine_df.collect()
    engine_cols = engine_df.columns
    res = con.sql(sql)
    oracle_cols = list(res.columns)
    oracle_rows = res.fetchall()
    e_hash = value_hash(engine_cols, [tuple(r) for r in engine_rows])
    o_hash = value_hash(oracle_cols, oracle_rows)
    return DiffResult(
        name=name,
        engine_rows=len(engine_rows),
        oracle_rows=len(oracle_rows),
        rows_match=len(engine_rows) == len(oracle_rows),
        hash_match=e_hash == o_hash and sorted(engine_cols) == sorted(oracle_cols),
        engine_cols=engine_cols,
        oracle_cols=oracle_cols,
    )


def main() -> None:  # pragma: no cover - CLI convenience
    """``python -m database_peak_streaming_spark.harness.diff [sf_dir]``:
    run the full differential suite and exit non-zero on any mismatch."""
    import sys

    from database_peak_streaming_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dps-diff-cli")
    spark.sparkContext.setLogLevel("ERROR")
    results = run_suite(spark, sf_dir)
    for r in results:
        print(r.describe())
    fails = sum(1 for r in results if not r.ok)
    print(f"TOTAL {len(results)} FAIL {fails}")
    sys.exit(1 if fails else 0)


def run_suite(
    spark: SparkSession, sf_dir: str, only: list[str] | None = None
) -> list[DiffResult]:
    """Run every registered (query, oracle) pair; queries without an
    oracle get a rows>0 smoke check only."""
    from database_peak_streaming_spark.registry import ORACLE_SQL, QUERIES

    if only:
        unknown = sorted(set(only) - set(QUERIES))
        if unknown:
            # a typo'd `only` must fail loudly — an empty run would
            # vacuously pass every all(r.ok ...) gate built on it
            raise ValueError(f"unknown query names in only=: {unknown}")
    con = oracle_connection(sf_dir)
    results: list[DiffResult] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        sql = ORACLE_SQL.get(name)
        if sql is None:
            # rows>0 is a real check: a no-oracle query that regresses
            # to empty output must FAIL the local gate, not slide by.
            n = df.count()
            results.append(
                DiffResult(name, n, -1, n > 0, n > 0, df.columns, [])
            )
            continue
        results.append(diff_query(name, df, sql, con))
    return results


if __name__ == "__main__":  # pragma: no cover
    main()
