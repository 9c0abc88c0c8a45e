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


def micros(col: Column | str) -> Column:
    """Exact fixed-point micro-units: ``CAST(x AS DECIMAL(18,6))`` —
    identical HALF_UP rounding to the ``DEC`` cast for every |x| < 1e12,
    but precision 18 keeps the value in Spark's compact-long decimal
    form (no BigDecimal) — shifted into a plain LONG.

    Why: summing a DECIMAL(28,6) input forces a BigDecimal-backed
    aggregation buffer (precision > 18 leaves the UnsafeRow fast path),
    which is the dominant cost of the exact-sum queries; summing longs
    stays in whole-stage codegen's primitive path.  See ``dsum_bounded``
    and the q1 two-phase form for the two scale-safe consumption
    patterns."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,6)") * 1000000).cast("long")


def from_micros(sum_micros: Column, alias: str) -> Column:
    """Exact decimal descale of a summed micro-unit column back to the
    public double schema (same value ``dsum`` produces)."""
    return (sum_micros.cast(DEC) / 1000000).cast("double").alias(alias)


def dsum_bounded(col: Column | str, alias: str) -> Column:
    """Order-independent exact sum via long micro-units — for groupings
    whose PER-GROUP row count is bounded by the schema (an order's
    lineitems, a session's events), NOT by table scale.  The long
    partial never overflows because group_rows x max|x| x 1e6 << 2^63
    by construction; for global/low-cardinality groupings (sums that
    grow with SF) use ``dsum`` or the two-phase pid split (see
    q1_pricing_summary), never this.

    The boundedness argument is ENFORCED, not assumed: the partial is
    ``try_sum`` (NULL on long overflow instead of Spark's silent
    non-ANSI wrap), and a NULL partial with non-null inputs raises —
    degenerate partitioning or an unbounded group fed here fails the
    query instead of yielding a silently wrong "exact" sum."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.try_sum(micros(c))
    guarded = F.when(
        s.isNull() & (F.count(c) > 0),
        F.raise_error(
            F.lit(
                "dsum_bounded overflow: long micro-unit partial wrapped — "
                "group is not schema-bounded; use dsum/two-phase split"
            )
        ).cast("long"),
    ).otherwise(s)
    return from_micros(guarded, alias)


def micros_partial(col: Column | str, alias: str) -> Column:
    """Phase-1 partial for the two-phase exact sum (see
    ``q1_pricing_summary``): ``try_sum`` of long micro-units — NULL on
    long overflow instead of Spark's silent non-ANSI wrap.  Consume with
    ``merge_micros_checked``, which turns that NULL into a hard error."""
    return F.try_sum(micros(col)).alias(alias)


def merge_micros_checked(partial: str, alias: str) -> Column:
    """Phase-2 merge of ``micros_partial`` columns: decimal-exact sum,
    raising if any partial is NULL (overflow in phase 1).  Assumes the
    summed measure is NOT NULL by schema (true for every fixture money/
    quantity column), so a NULL partial can only mean a wrapped long —
    the "partition rows are bounded" safety argument is enforced, not
    documented."""
    p = F.col(partial)
    s = F.when(F.count(F.lit(1)) == F.count(p), F.sum(p)).otherwise(
        F.raise_error(
            F.lit(
                f"{partial}: long micro-unit partial overflowed — "
                "partition/group no longer satisfies the boundedness "
                "argument; repartition or use dsum"
            )
        ).cast("long")
    )
    return from_micros(s, alias)


def davg(col: Column | str, alias: str) -> Column:
    """avg rounded to 6 decimals: the mean's error is ~1 ulp of the mean,
    far below 1e-6, so rounding yields a stable cross-engine value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.avg(c), 6).alias(alias)


def r6(c: Column, alias: str) -> Column:
    """Round a double expression to 6 decimals (cross-engine stability)."""
    return F.round(c, 6).alias(alias)
