"""Sensor-format stream → tier pipeline: the third payload kind
(hyperion.py:388-420) through the same event-time topology as peaks
(``streaming.pipeline``) and spectra (``streaming.spectra``), so S4 is
closed end-to-end for every frame format the reference parses.

``decode_sensor_frames`` already emits long form (serial_number, ts,
sensor_idx, value) — no explode needed; the aggregation keys on
(window, sensor_idx) and state stays bounded by
active_windows x sensors regardless of uptime.
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


def window_sensor_means(
    stream: DataFrame,
    window_length: str = WINDOW_LENGTH,
    watermark_delay: str = WATERMARK_DELAY,
) -> DataFrame:
    """Event-time tumbling mean per sensor over a decoded sensor stream
    (``decode_sensor_frames`` output) — works identically on a batch
    DataFrame (the tests' oracle path).  The flush sentinel travels as a
    null-``sensor_idx`` row and is dropped by the tier sink."""
    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_length).alias("w"),
            F.col("sensor_idx"),
        )
        .agg(
            F.avg("value").alias("mean_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "sensor_idx",
            "mean_value",
            "n_samples",
        )
    )


@dataclass
class SensorsPipeline(PeaksPipeline):
    """The peaks pipeline with the sensor window aggregation — sink,
    epoch idempotence, sentinel handling, and trigger modes inherited.
    The sink's null-payload drop keys on ``sensor_idx`` here."""

    def aggregated(self, stream: DataFrame) -> DataFrame:
        return window_sensor_means(
            stream, self.window_length, self.watermark_delay
        )

    def _sink(self, batch_df: DataFrame, epoch_id: int) -> None:
        real = batch_df.filter(F.col("sensor_idx").isNotNull())
        if real.isEmpty():
            self.epochs_seen.append(epoch_id)
            return
        self.store.write_epoch(real, epoch_id=epoch_id)
        self.epochs_seen.append(epoch_id)
