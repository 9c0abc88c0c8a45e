"""Shared helpers for the operator surface."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for any fixture money/quantity sum at sf100.
DEC = "decimal(28,6)"


#: Limb width for ``dsum``'s split-long exact sum.  Each 21-bit limb of
#: the micro-unit long is summed separately, so per-group totals stay
#: inside int64 up to ~2^63 / 2^21 = 4.4e12 rows per group — beyond a
#: 100 TB table's global aggregate — while every per-row and per-sum
#: operation stays a primitive long in whole-stage codegen.
_LIMB = 21
_LIMB_MASK = (1 << _LIMB) - 1


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent EXACT sum of a double money/quantity column.

    Exactness makes the result independent of row order and
    partitioning — a requirement for a distributed engine to be
    hash-comparable with a single-node oracle, and for run-to-run
    reproducibility at any cluster size.

    Implementation: fixed-point micro-units (``micros``, a long) split
    into three 21-bit limbs that are summed as plain longs and
    recombined in decimal only at the per-group merge.  The naive
    ``sum(cast(x as decimal(28,6)))`` form is exact too, but routes
    every row through BigDecimal (precision > 18 leaves the compact
    aggregation buffer) — measured ~5x the plain-double cost on the q1
    shape at 30x sf0.1, vs ~parity for this form.  The limb identity
    ``m == (m >> 42)*2^42 + ((m >> 21) & mask)*2^21 + (m & mask)``
    holds for any signed long in two's complement (arithmetic shift =
    floor division), so negative values need no special casing.

    The 4.4e12-rows-per-group bound is ENFORCED: limb sums are
    ``try_sum`` (NULL on long overflow instead of the silent non-ANSI
    wrap), and a NULL limb with non-null inputs raises."""
    c = F.col(col) if isinstance(col, str) else col
    m = micros(c)
    l0 = F.try_sum(m.bitwiseAND(F.lit(_LIMB_MASK)))
    l1 = F.try_sum(F.shiftright(m, _LIMB).bitwiseAND(F.lit(_LIMB_MASK)))
    l2 = F.try_sum(F.shiftright(m, 2 * _LIMB))
    total = (
        l2.cast("decimal(38,6)") * (1 << (2 * _LIMB))
        + l1.cast("decimal(38,6)") * (1 << _LIMB)
        + l0.cast("decimal(38,6)")
    )
    guarded = F.when(
        (l0.isNull() | l1.isNull() | l2.isNull()) & (F.count(c) > 0),
        F.raise_error(
            F.lit(
                "dsum overflow: limb sum wrapped — group exceeds the "
                "4.4e12-row exactness bound"
            )
        ).cast("decimal(38,6)"),
    ).otherwise(total)
    return (guarded / 1000000).cast("double").alias(alias)


#: Exactness bound for the double fast path in ``micros``: |x| * 1e6
#: must sit far inside 2^53 so the float error analysis below holds.
_MICROS_SAFE_ABS = 4.0e9


def micros(col: Column | str) -> Column:
    """Exact fixed-point micro-units as a plain LONG, computed entirely
    in double arithmetic: ``sign(x) * floor(|x| * 1e6 + 0.5)`` —
    HALF_UP, the same value ``CAST(x AS DECIMAL(18,6))`` yields on
    every in-contract input, with no per-row Decimal allocation.

    Why not the decimal cast: double->decimal conversion routes
    through BigDecimal per row, and it dominated the exact-sum
    queries — measured at 30x sf0.1, q1's aggregation was ~5x the
    plain-double-sum cost with the cast and ~parity without it.  The
    double form stays in whole-stage codegen's primitive path.

    Exactness argument (why this equals the decimal cast, not merely
    approximates it): every column fed here carries values whose REAL
    decimal form has <= 6 fractional digits (fixture money/quantity
    columns have 2; the q1 ``price*(1-disc)*(1+tax)`` chain compounds
    to 6), so the true value of ``x * 1e6`` is an integer — at least
    0.5 away from every rounding boundary ``k + 0.5``.  The stored
    double ``x`` differs from that decimal value by < 1 ulp and the
    ``* 1e6`` adds one more rounding, a combined absolute error
    < 1e-2 for |x| <= 4e9 — far smaller than the 0.5 gap, so ``floor``
    lands on exactly the integer the decimal cast produces.  Inputs
    beyond the magnitude bound raise rather than silently losing
    exactness (tests/test_properties.py pins cast-equivalence over
    random in-contract values and the raise itself)."""
    c = F.col(col) if isinstance(col, str) else col
    x = c * 1000000.0
    rounded = F.when(x >= 0.0, F.floor(x + 0.5)).otherwise(
        -F.floor(0.5 - x)
    )
    return F.when(
        F.abs(c) > _MICROS_SAFE_ABS,
        F.raise_error(
            F.lit(
                "micros: |x| exceeds the exact double fast-path bound "
                "(4e9); widen to the decimal cast for this column"
            )
        ).cast("long"),
    ).otherwise(rounded)


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
