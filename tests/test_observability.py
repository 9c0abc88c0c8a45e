"""Observability surface: in-plan observe() metrics and streaming
progress telemetry (the engine-native form of the reference's ad-hoc
ingest counters, database_peak_streaming.py:31-45)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-obs-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_observe_metrics_match_direct_aggregates(spark):
    """observe() metrics ride the SAME pass as the main query — one
    action, and the audit values must equal a direct recompute."""
    from database_peak_streaming_spark.observability import (
        observed_scan_audit,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    ev = load_table(spark, "events", SF_DIR)
    audited, obs = observed_scan_audit(ev, "value")
    # the main query: any action through the audited frame
    out = audited.groupBy("event_type").count().collect()
    assert len(out) == 5
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_nulls"),
        F.sum(F.col("value").cast("decimal(28,6)")).alias("sum_value"),
    ).collect()[0]
    assert got["n_rows"] == direct.n_rows == ev.count()
    assert got["n_nulls"] == direct.n_nulls
    assert got["sum_value"] == direct.sum_value


def test_streaming_progress_reports_watermark_drops(spark, tmpdir_):
    """StreamingQueryProgress must account for every input row and
    report the late row dropped by the watermark in its state-operator
    telemetry — the metric a production deployment alerts on (the
    semantic drop itself is pinned by
    test_late_data_dropped_by_watermark)."""
    from pyspark.sql import types as T

    from database_peak_streaming_spark.observability import ProgressCapture
    from database_peak_streaming_spark.streaming.ops import tumbling_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (1, t0, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1.0),
        (3, t0 + dt.timedelta(hours=1, minutes=5), 1.0),
        (4, t0 + dt.timedelta(hours=6), 1.0),
        (5, t0 + dt.timedelta(hours=6, minutes=1), 1.0),
        (6, t0 + dt.timedelta(minutes=20), 99.0),  # LATE for hour 0
        (7, t0 + dt.timedelta(hours=12), 1.0),
    ]
    df = spark.createDataFrame(rows, schema=schema)
    stream, replay_dir = replay_dataframe(
        spark, df, n_chunks=7, order_col="event_id"
    )
    sink: list = []
    try:
        q = (
            tumbling_counts(stream, "ts", "1 hour", "30 minutes")
            .writeStream.outputMode("append")
            .foreachBatch(lambda b, _e: sink.extend(b.collect()))
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        progress = ProgressCapture.snapshots(q)
    finally:
        cleanup_replay(replay_dir)
    assert ProgressCapture.total_input_rows(progress) == len(rows)
    assert ProgressCapture.total_dropped_by_watermark(progress) >= 1
