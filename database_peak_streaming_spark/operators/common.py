"""Shared helpers for the operator surface."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for any fixture money/quantity sum at sf100.
DEC = "decimal(28,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double column.

    Casting to decimal before summing makes the aggregation exact, so the
    result does not depend on row order or partitioning — a requirement
    for a distributed engine to be hash-comparable with a single-node
    oracle, and for run-to-run reproducibility at any cluster size.
    The final cast back to double keeps the public schema simple.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg rounded to 6 decimals: the mean's error is ~1 ulp of the mean,
    far below 1e-6, so rounding yields a stable cross-engine value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), 6).alias(alias)


def r6(c: Column, alias: str) -> Column:
    """Round a double expression to 6 decimals (cross-engine stability)."""
    return F.round(c, 6).alias(alias)
