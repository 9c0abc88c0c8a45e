"""Physical-plan inspection helpers (SURVEY.md §4).

The reference had no optimizer; this engine's optimizer is Catalyst, and
these helpers make its behavior a *tested contract* rather than a hope:
filter pushdown, column pruning, broadcast strategy, and codegen
coverage are asserted in tests/test_plans.py for the headline queries —
the properties that decide whether a plan survives a 100x scale-up.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (what ``df.explain('formatted')``
    prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached the parquet reader (row-group pruning)."""
    plan = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    """Schemas actually read from parquet (column pruning evidence)."""
    plan = formatted_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in (
        formatted_plan(df)
    )


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes in the plan — the scale-limiting
    operations (each is a full cluster shuffle or a broadcast)."""
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Distinct whole-stage-codegen spans (``*(n)`` operator prefixes) —
    operators inside a span run as one fused JVM loop.  Under AQE the
    markers only appear on the finalized plan, so by default this runs
    the query (cheap at test SF) and reads the executed plan."""
    if execute:
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
    else:
        plan = formatted_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def scan_columns(df: DataFrame, table_hint: str | None = None) -> set[str]:
    """Column names the scan reads (from ReadSchema entries)."""
    cols: set[str] = set()
    for schema in read_schemas(df):
        for field in schema.split(","):
            name = field.split(":", 1)[0].strip()
            if name:
                cols.add(name)
    return cols
