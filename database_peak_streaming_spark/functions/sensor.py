"""Sensor-domain column kernels — the reference's numpy math re-expressed
as Catalyst column expressions (SURVEY.md §2A P6-P13).

Everything here is a pure column function: vectorized JVM execution,
usable identically in batch and streaming plans.  The reference computed
these with numpy on driver-side lists; here they run distributed, inside
whole-stage codegen, with no Python on the hot path.

Reference sites (cited per kernel):
* timestamp reconstruction   hyperion.py:418,467,547
* power calibration          hyperion.py:533-540
* wavelength axis            hyperion.py:527-531
* channel bitmask decode     hyperion.py:495-501
* cumsum ragged re-slice     hyperion.py:440-453
* strain / temperature       analyze_data.py:30-41
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Reference constants (analyze_data.py:31-34).
GAUGE_FACTOR = 0.807
DEFAULT_NUM_PORTS = 8  # database_peak_streaming.py:71


def reconstruct_timestamp(ts_int: Column, ts_frac: Column) -> Column:
    """Event time from split integer-seconds / fractional-nanoseconds
    (``timestamp_frac * 1e-9 + timestamp_int``, hyperion.py:418,467,547).

    Returns TimestampType at microsecond precision via integer math —
    exact, unlike the reference's double addition which loses ns
    precision above ~2^22 seconds.
    """
    micros = ts_int.cast("long") * F.lit(1_000_000) + (
        ts_frac.cast("long") / F.lit(1_000)
    ).cast("long")
    return F.timestamp_micros(micros)


def epoch_seconds(ts_int: Column, ts_frac: Column) -> Column:
    """The reference's exact double form (processing pipelines that need
    the raw float epoch, e.g. the st_data.timestamp column at
    database_peak_streaming.py:34)."""
    return ts_int.cast("double") + ts_frac.cast("double") * F.lit(1e-9)


def power_calibration(counts: Column, inv_scale: Column, offset: Column) -> Column:
    """Linear power calibration: raw uint16 counts -> dBm
    (``data * inv_scale + offset``, hyperion.py:533-540).  Array-wide via
    ``transform`` — one codegen'd loop per row, the columnar analogue of
    the reference's broadcasted numpy multiply."""
    return F.transform(counts, lambda c: c.cast("double") * inv_scale + offset)


def wavelength_axis(start: Column, increment: Column, n_points: Column) -> Column:
    """Spectrum x-axis: ``start + arange(n) * increment``
    (hyperion.py:527-531)."""
    return F.transform(
        F.sequence(F.lit(0), n_points.cast("int") - 1),
        lambda i: start + i.cast("double") * increment,
    )


def decode_channel_bitmask(bits: Column) -> Column:
    """Active-channel map from a 16-bit bitmask (hyperion.py:495-501):
    indices of set bits, ascending."""
    return F.filter(F.sequence(F.lit(0), F.lit(15)), lambda i: _getbit(bits, i) == 1)


def _getbit(value: Column, pos: Column) -> Column:
    """Bit extraction with column operands (shiftright builtin requires a
    literal count): (value div 2^pos) % 2 for non-negative values."""
    return F.floor(value.cast("long") / F.pow(F.lit(2.0), pos.cast("double"))).cast(
        "long"
    ) % 2


def cumsum_boundaries(counts: Column) -> Column:
    """Prefix sums of per-channel peak counts -> slice boundaries
    (``np.cumsum(peak_counts)``, hyperion.py:442).  An array *scan*
    expressed with aggregate-into-array."""
    return F.aggregate(
        counts,
        F.array().cast("array<long>"),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0).cast("long"))
                + x.cast("long")
            ),
        ),
    )


def reslice_ragged(flat: Column, counts: Column) -> Column:
    """Ragged re-slice: flat wavelength array -> per-channel arrays driven
    by the counts (hyperion.py:446-453).  slice(flat, start_i, count_i)
    with starts from the exclusive prefix sum."""
    bounds = cumsum_boundaries(counts)
    idx = F.sequence(F.lit(1), F.size(counts))
    prev = lambda i: F.when(i == 1, F.lit(0).cast("long")).otherwise(
        F.try_element_at(bounds, (i - 1).cast("int"))
    )
    return F.transform(
        idx,
        lambda i: F.slice(
            flat,
            prev(i).cast("int") + 1,
            F.try_element_at(counts, i.cast("int")).cast("int"),
        ),
    )


def total_strain(wl: Column, iwl: Column, gauge_factor: float = GAUGE_FACTOR) -> Column:
    """``total_strain = 1e6 * ((wl - iwl) / iwl / gf)``
    (analyze_data.py:37)."""
    return F.lit(1e6) * ((wl - iwl) / iwl / F.lit(gauge_factor))


def temperature(
    wl: Column,
    iwl: Column,
    itp: Column,
    gauge_factor: float = GAUGE_FACTOR,
    metal_constant: float = 23.0,
    alpha: float = 0.55,
) -> Column:
    """``temperature = (wl - iwl) / (wl * gf * (k + alpha)) + itp``
    (analyze_data.py:39; constants are deployment-specific, defaults are
    test fixtures)."""
    return (wl - iwl) / (wl * F.lit(gauge_factor) * F.lit(metal_constant + alpha)) + itp


def strain(total: Column, temp: Column) -> Column:
    """``strain = total_strain - temperature`` (analyze_data.py:41)."""
    return total - temp


def gap_fill_locf(
    df,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
):
    """Per-key regular-grid resample with last-observation-carried-forward
    (the distributed form of ``resample_gap_fill_locf``): each key's
    series is re-gridded onto its own [min(ts), max(ts)] axis at ``step``
    and holes take the last seen value.

    Axis generation is ``sequence()`` per key (no stored calendar table);
    the LOCF window partitions by ``key`` so fills never cross series and
    the work distributes — one shuffle on the key, running state is a
    single value per series.  Buckets before a key's first observation
    do not exist by construction (the axis starts at the key's min).
    """
    from pyspark.sql import DataFrame, Window

    assert isinstance(df, DataFrame)
    bucketed = (
        df.select(key, F.date_trunc("hour", F.col(ts_col)).alias("bucket"), value_col)
        .groupBy(key, "bucket")
        .agg(F.avg(value_col).alias("_v"))
    )
    axis = (
        bucketed.groupBy(key)
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            key,
            F.explode(
                F.expr(f"sequence(_lo, _hi, interval {step})")
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        axis.join(bucketed, [key, "bucket"], "left")
        .select(
            key,
            "bucket",
            F.coalesce(F.col("_v"), F.last("_v", ignorenulls=True).over(w)).alias(
                "filled_value"
            ),
            F.col("_v").isNull().alias("was_gap"),
        )
    )
