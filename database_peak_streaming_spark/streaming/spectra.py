"""Spectrum-format stream → tier pipeline: completes S4's end-to-end
treatment across payload kinds (peaks got the full stream→tier path in
``streaming.pipeline``; this gives the spectrum format the same).

Reference parity: the spectrum frame (hyperion.py:473-549) carries a
uint16 intensity matrix per scan; the reference parsed it and handed
the matrix to the plotting path (analyze_data.py).  Here the decoded
per-channel counts arrays are exploded to (ts, channel, point_idx,
intensity) long form and window-averaged per spectral point — the same
event-time topology as the peaks pipeline, so the tier sink, epoch
idempotence, retention, and sentinel flush all apply unchanged.

Scale: the explode multiplies rows by num_points (typically 2-4k), but
the windowed aggregation keys on (window, channel, point_idx) so state
is bounded by active_windows x channels x points regardless of uptime,
and the explode+agg stays in whole-stage codegen (no Python after the
decode kernel).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_peak_streaming_spark.streaming.pipeline import (
    WATERMARK_DELAY,
    WINDOW_LENGTH,
    PeaksPipeline,
)


def window_spectrum_means(
    stream: DataFrame,
    window_length: str = WINDOW_LENGTH,
    watermark_delay: str = WATERMARK_DELAY,
) -> DataFrame:
    """Event-time tumbling mean intensity per (channel, point_idx) over
    a decoded spectrum stream (``decode_spectrum_frames`` output) —
    works identically on a batch DataFrame (the tests' oracle path).

    ``wavelength`` is reconstructed from the header axis parameters
    (start + idx*increment, hyperion.py:528-530) and aggregated with
    ``min`` — it is constant per (channel, point_idx) for a fixed
    instrument configuration, and min is deterministic under any
    partitioning (``first`` is not)."""
    from database_peak_streaming_spark.streaming.ops import as_event_time

    long = stream.select(
        "ts",
        "channel",
        "start_wavelength",
        "wavelength_increment",
        # OUTER: the flush sentinel (S6) travels as a null-counts row —
        # plain posexplode would erase it before the watermark sees its
        # timestamp and the last ~1 s of windows would never flush
        F.posexplode_outer("counts").alias("point_idx", "intensity"),
    ).withColumn(
        "wavelength",
        F.col("start_wavelength")
        + F.col("point_idx") * F.col("wavelength_increment"),
    )
    return (
        as_event_time(long, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_length).alias("w"),
            F.col("channel"),
            F.col("point_idx"),
        )
        .agg(
            F.avg("intensity").alias("mean_intensity"),
            F.min("wavelength").alias("wavelength"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "channel",
            "point_idx",
            "wavelength",
            "mean_intensity",
            "n_samples",
        )
    )


@dataclass
class SpectraPipeline(PeaksPipeline):
    """The peaks pipeline with the spectrum window aggregation — sink,
    epoch idempotence, sentinel handling, and trigger modes inherited."""

    def aggregated(self, stream: DataFrame) -> DataFrame:
        return window_spectrum_means(
            stream, self.window_length, self.watermark_delay
        )
