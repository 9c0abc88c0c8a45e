"""Batch analytics over the tiered store — the reference's
``analyze_data.py`` path (SURVEY.md §3.2), Spark-first.

Reference flow: ``SELECT *`` both lt tables -> positional id re-join ->
per-port column grouping from first-row counts -> per-series plot
(``analyze_data.py:44-91``).  Here: one conformed long-form table, a
windowed first-value baseline, pure-column derivation, and a single
``toPandas`` at the plotting boundary — the only driver-side hop, after
all reduction has happened distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.functions import sensor


def per_port_series(lt: DataFrame) -> DataFrame:
    """Per-port ordered series regroup (A8, ``analyze_data.py:66-82``):
    one row per (channel, peak_idx) carrying the time-ordered series —
    the distributed form of the reference's per-port plot loops."""
    return (
        lt.groupBy("channel", "peak_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("window_start", "mean_wavelength"))
            ).alias("series")
        )
        .select(
            "channel",
            "peak_idx",
            F.transform("series", lambda s: s["window_start"]).alias("ts_series"),
            F.transform("series", lambda s: s["mean_wavelength"]).alias("wl_series"),
        )
        .orderBy("channel", "peak_idx")
    )


def derive_strain(
    lt: DataFrame,
    itp: float = 21.5,
    metal_constant: float = 23.0,
    alpha: float = 0.55,
) -> DataFrame:
    """Full P12 derivation over the long-term tier
    (``analyze_data.py:30-41``): per-series first-value baseline (iwl),
    then total_strain / temperature / strain columns."""
    w = Window.partitionBy("channel", "peak_idx").orderBy("window_start")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    iwl = F.first("mean_wavelength").over(w_all)
    total = sensor.total_strain(F.col("mean_wavelength"), F.col("iwl"))
    temp = sensor.temperature(
        F.col("mean_wavelength"),
        F.col("iwl"),
        F.lit(itp),
        metal_constant=metal_constant,
        alpha=alpha,
    )
    return (
        lt.withColumn("iwl", iwl)
        .withColumn("total_strain", total)
        .withColumn("temperature", temp)
        .withColumn("strain", sensor.strain(F.col("total_strain"), F.col("temperature")))
    )


def to_plot_frames(derived: DataFrame) -> dict[int, "object"]:
    """The plotting boundary (S12): one pandas frame per channel, indexed
    by window_start — hand directly to matplotlib outside the engine.
    The reduction (windowing, baselines, derivation) already ran
    distributed; only the to-be-plotted points cross to the driver."""
    pdf = derived.select(
        "channel", "peak_idx", "window_start", "mean_wavelength",
        "total_strain", "temperature", "strain",
    ).toPandas()
    return {
        int(ch): g.sort_values(["peak_idx", "window_start"]).reset_index(drop=True)
        for ch, g in pdf.groupby("channel")
    }
