"""Arbitrary-stateful-processing test: the incremental minute
downsampler must equal the batch 'first event per (user, minute)' oracle
across micro-batch boundaries (state carried between epochs)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-stateful-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_minute_first_matches_batch(spark, tmpdir_):
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.stateful import stateful_minute_first

    ev = (
        load_table(spark, "events", SF_DIR)
        .select("user_id", "ts", "value")
        .filter(F.col("user_id") < 10)
    )
    stream, replay_dir = replay_dataframe(spark, ev, n_chunks=5, order_col="ts")

    rows = []

    def sink(batch_df, _):
        rows.extend(batch_df.collect())

    try:
        q = (
            stateful_minute_first(stream, "user_id")
            .writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        # generous bound: under full-suite CPU contention the stateful
        # exchange can take >120s wall even though it always completes
        q.awaitTermination(420)
        assert not q.isActive
    finally:
        cleanup_replay(replay_dir)

    got = {(r.user_id, r.minute_start): (r.ts, r.value) for r in rows}
    assert len(got) == len(rows), "one emission per (key, minute)"

    batch = (
        ev.withColumn("minute_start", F.date_trunc("minute", "ts"))
        .groupBy("user_id", "minute_start")
        .agg(
            F.min("ts").alias("ts"),
            F.min_by("value", "ts").alias("value"),
        )
        .collect()
    )
    expected = {(r.user_id, r.minute_start): (r.ts, r.value) for r in batch}
    assert got == expected
