"""Streaming replay sources (S1 stand-in) and the end-of-stream sentinel.

The production source in the reference is a TCP instrument stream
(hyperion.py:284-312); per the project scope that stays external — the
engine ingests from replayable sources (files, rate, socket).  This
module replays the parquet fixtures as a stream with rate control
(``maxFilesPerTrigger`` ≙ the bounded-queue backpressure S5) and
provides a finite-replay *flush sentinel*: the streaming analogue of the
reference's ``{'data': None}`` end-of-stream marker (hyperion.py:308,
consumed at database_peak_streaming.py:26-29), used to push the
watermark past the last real window so append-mode sinks flush
everything on ``Trigger.AvailableNow`` replays.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def events_stream(
    spark: SparkSession, sf_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """events.parquet as a rate-controlled file stream (schema taken from
    the static read — never inferred on the stream path)."""
    # Raw schema (ts arrives as nanos-long under the legacy conf the
    # batch loader sets); the stream applies the same us-timestamp
    # rebuild expression as sources.batch.load_table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(f"{sf_dir}/events.parquet")
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def replay_dataframe(
    spark: SparkSession,
    df: DataFrame,
    n_chunks: int = 4,
    order_col: str | None = None,
    sentinel_row: dict | None = None,
    dir_hint: str = "dps-replay",
) -> tuple[DataFrame, str]:
    """Materialize ``df`` as ``n_chunks`` ordered parquet files and open
    them as a one-file-per-trigger stream — deterministic micro-batch
    replay for tests and backfills.

    ``sentinel_row``: optional final-chunk row (the flush sentinel, S6).
    Returns (stream_df, temp_dir); caller removes the dir.
    """
    tmp = Path(tempfile.mkdtemp(prefix=dir_hint))
    data_dir = tmp / "stream"
    data_dir.mkdir()
    if order_col is not None:
        df = df.orderBy(order_col)
    pdf = df.toPandas()
    chunk = max(1, len(pdf) // n_chunks)
    for i in range(n_chunks):
        lo = i * chunk
        hi = len(pdf) if i == n_chunks - 1 else (i + 1) * chunk
        part = pdf.iloc[lo:hi]
        if i == n_chunks - 1 and sentinel_row is not None:
            import pandas as pd

            part = pd.concat([part, pd.DataFrame([sentinel_row])], ignore_index=True)
        stage = tmp / f"stage_{i:04d}"
        spark.createDataFrame(part, schema=df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(stage))
        # single flat file per chunk: ordered names, ordered mtimes
        part_file = next(stage.glob("part-*.parquet"))
        part_file.rename(data_dir / f"chunk_{i:04d}.parquet")
        shutil.rmtree(stage)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(data_dir))
    )
    return stream, str(tmp)


def cleanup_replay(path: str) -> None:
    shutil.rmtree(path, ignore_errors=True)


def rate_peaks_stream(
    spark: SparkSession,
    rows_per_second: int = 10,
    num_channels: int = 4,
    num_peaks: int = 4,
) -> DataFrame:
    """Live synthetic peaks source: Spark's ``rate`` source (monotone
    timestamped ticks) expanded to the reference's scan shape — the
    production-shaped stand-in for the TCP instrument (S1) when running
    the pipeline with a processing-time trigger.

    One rate tick = one scan (the reference's 10 Hz, README.md:15);
    explode to (channel, peak_idx) long form with a deterministic
    wavelength function of (tick, channel, peak) so output is assertable.
    """
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value (tick)
    grid = F.explode(
        F.expr(
            f"flatten(transform(sequence(1, {num_channels}), "
            f"ch -> transform(sequence(0, {num_peaks - 1}), pk -> struct(ch, pk))))"
        )
    ).alias("cp")
    return (
        rate.select(
            F.col("value").alias("scan_id"),
            F.col("timestamp").alias("ts"),
            grid,
        )
        .select(
            "scan_id",
            "ts",
            F.col("cp.ch").alias("channel"),
            F.col("cp.pk").alias("peak_idx"),
            (
                F.lit(1500.0)
                + F.col("cp.ch") * 10
                + F.col("cp.pk")
                + F.sin(F.col("scan_id") / 100.0) * 0.01
            ).alias("wavelength"),
        )
    )
