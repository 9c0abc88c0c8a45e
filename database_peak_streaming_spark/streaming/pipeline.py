"""The reference-parity streaming pipeline: peaks stream -> event-time
window means -> tiered epoch sink (SURVEY.md §3.1 Spark equivalent).

Reference mapping, hop by hop:

| reference (database_peak_streaming.py)        | here                       |
|-----------------------------------------------|----------------------------|
| 97 ms collection loop (:21-29, A1)            | window(ts, window_length)  |
| per-peak numpy.mean (:38-45, A2)              | avg() per (window,ch,peak) |
| hourly buffered flush (:20,47-58, A3)         | foreachBatch epoch         |
| [::600] stride to lt (:52-56, A4)             | TieredStore minute resample|
| TTL delete + align (:65-69, A5)               | TieredStore partition drop |
| queue sentinel shutdown (hyperion.py:308, S6) | flush sentinel / stop()    |
| executemany INSERT (:60-63, S7)               | parquet epoch append       |

State design (the 100 TB story): aggregation state is keyed by
(window, channel, peak_idx) and expires at the watermark, so state size
is bounded by (active windows x channels x peaks) regardless of uptime —
the reference instead held unbounded Python-list buffers between hourly
flushes.  The sink shuffles once per epoch on the window key; the tier
write is append-only into date partitions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from database_peak_streaming_spark.streaming.tiering import TieredStore

#: Reference dev config (database_peak_streaming.py:10-14,23,71).
WINDOW_LENGTH = "100 milliseconds"  # ≙ the 97 ms collection loop
WATERMARK_DELAY = "1 second"


def window_means(
    stream: DataFrame,
    window_length: str = WINDOW_LENGTH,
    watermark_delay: str = WATERMARK_DELAY,
) -> DataFrame:
    """Event-time tumbling window means per (channel, peak_idx) over a
    long-form peaks stream (ts, channel, peak_idx, wavelength) — works
    identically on a batch DataFrame (the tests' oracle path)."""
    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_length).alias("w"),
            F.col("channel"),
            F.col("peak_idx"),
        )
        .agg(
            F.avg("wavelength").alias("mean_wavelength"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "channel",
            "peak_idx",
            "mean_wavelength",
            "n_samples",
        )
    )


@dataclass
class PeaksPipeline:
    """End-to-end streaming pipeline writing the tiered store each epoch.

    ``run_available_now`` replays a finite source and blocks until the
    sentinel-flushed stream drains — the test/backfill mode.  A live
    deployment calls ``start`` with a processing-time trigger instead.
    """

    spark: SparkSession
    store: TieredStore
    window_length: str = WINDOW_LENGTH
    watermark_delay: str = WATERMARK_DELAY
    epochs_seen: list[int] = field(default_factory=list)

    def _sink(self, batch_df: DataFrame, epoch_id: int) -> None:
        # Drop sentinel-only windows (null channel) before persisting.
        real = batch_df.filter(F.col("channel").isNotNull())
        if real.isEmpty():
            self.epochs_seen.append(epoch_id)
            return
        self.store.write_epoch(real, epoch_id=epoch_id)
        self.epochs_seen.append(epoch_id)

    def aggregated(self, stream: DataFrame) -> DataFrame:
        return window_means(stream, self.window_length, self.watermark_delay)

    def start(
        self,
        stream: DataFrame,
        checkpoint: str,
        trigger: dict,
        state_partitions: int | None = None,
    ) -> StreamingQuery:
        """Launch with an explicit trigger, e.g. ``{"processingTime":
        "100 milliseconds"}`` (prod) or ``{"availableNow": True}``
        (replay).

        ``state_partitions`` sizes the stateful shuffle: state-store
        partitioning is FIXED by ``spark.sql.shuffle.partitions`` at the
        checkpoint's first batch (AQE never re-plans stateful streaming
        shuffles), and every partition pays a delta-commit per epoch —
        so a low-rate stream on a wide default (64) spends its trigger
        budget on empty state commits, not windows (the bench's
        streaming-throughput decomposition, bench.py:514).  Size it to
        the state volume: ~windows-per-epoch / few-thousand, or ~2x
        executor count on a cluster.  The session conf is restored
        after `.start()` so concurrent batch plans keep their width."""
        if state_partitions is None:
            return (
                self.aggregated(stream)
                .writeStream.outputMode("append")
                .foreachBatch(self._sink)
                .option("checkpointLocation", checkpoint)
                .trigger(**trigger)
                .start()
            )
        prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions", str(state_partitions)
        )
        try:
            return self.start(stream, checkpoint, trigger)
        finally:
            self.spark.conf.set("spark.sql.shuffle.partitions", prev)

    def run_available_now(
        self, stream: DataFrame, checkpoint: str, timeout_s: int = 120
    ) -> None:
        q = self.start(stream, checkpoint, {"availableNow": True})
        q.awaitTermination(timeout_s)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise TimeoutError("streaming replay did not drain in time")
