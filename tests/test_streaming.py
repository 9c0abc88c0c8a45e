"""Streaming semantics tests (SURVEY.md §5.2-5.3): batch-equivalence
oracles, late-data drops, streaming dedup, stream-static joins, and the
end-to-end reference-parity peaks pipeline with tiered storage.
"""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-stream-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _collect_stream(spark, stream_df, checkpoint: str, timeout_s: int = 120):
    """Drain an append-mode stream through foreachBatch into a list."""
    rows = []

    def sink(batch_df, _epoch):
        rows.extend(batch_df.collect())

    q = (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    assert not q.isActive
    return rows


def _synth_peaks(n_scans=20, n_channels=4, n_peaks=4, hz=10.0):
    """FIXTURES.md peaks_raw: 10 Hz scans, per-peak base + drift + noise
    (deterministic seed)."""
    rng = np.random.default_rng(42)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for s in range(n_scans):
        ts = t0 + dt.timedelta(seconds=s / hz)
        for ch in range(1, n_channels + 1):
            for pk in range(n_peaks):
                wl = 1500.0 + 10 * ch + pk + 0.01 * s + rng.normal(0, 0.001)
                rows.append((s, ts, ch, pk, wl))
    return pd.DataFrame(
        rows, columns=["scan_id", "ts", "channel", "peak_idx", "wavelength"]
    )


def test_peaks_pipeline_end_to_end(spark, tmpdir_):
    """Replay a synthetic peaks stream; assert window means match the
    numpy oracle (A2), lt tier is the per-minute resample (A4), retention
    drops old partitions (A5), and compat views pair by id (§1.2)."""
    from database_peak_streaming_spark.schemas import peaks_long_schema
    from database_peak_streaming_spark.streaming.pipeline import PeaksPipeline, window_means
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    pdf = _synth_peaks()
    df = spark.createDataFrame(pdf, schema=peaks_long_schema())
    sentinel = {
        "scan_id": -1,
        "ts": pdf.ts.max() + dt.timedelta(seconds=60),
        "channel": None,
        "peak_idx": None,
        "wavelength": None,
    }
    df_n = df
    stream, replay_dir = replay_dataframe(
        spark, df_n, n_chunks=4, order_col="scan_id", sentinel_row=sentinel
    )
    store = TieredStore(spark, f"{tmpdir_}/tiers", st_length_s=7 * 86400)
    pipe = PeaksPipeline(spark, store)
    try:
        pipe.run_available_now(stream, f"{tmpdir_}/ckpt")
    finally:
        cleanup_replay(replay_dir)

    st = store.read_st()
    got = {
        (r.window_start, r.channel, r.peak_idx): (r.mean_wavelength, r.n_samples)
        for r in st.collect()
    }
    # numpy oracle: mean per (100ms floor, channel, peak)
    pdf["win"] = pdf.ts.dt.floor("100ms")
    oracle = pdf.groupby(["win", "channel", "peak_idx"]).wavelength.agg(["mean", "count"])
    assert len(got) == len(oracle)
    for (win, ch, pk), row in oracle.iterrows():
        mean, n = got[(win.to_pydatetime(), ch, pk)]
        assert abs(mean - row["mean"]) < 1e-9
        assert n == row["count"]

    # lt tier: all 2 s of data in one minute bucket -> one row per (ch, pk)
    lt = store.read_lt()
    assert lt.count() == 4 * 4
    first_windows = {r.window_start for r in lt.collect()}
    assert first_windows == {min(g for (g, _, _) in got)}

    # retention: plant an expired partition, drop it
    old = st.limit(4).withColumn(
        "window_start", F.expr("window_start - INTERVAL 30 DAYS")
    ).withColumn("date", F.to_date("window_start"))
    old.write.mode("append").partitionBy("date").parquet(store.st_path)
    dropped = store.apply_retention(dt.datetime(2024, 1, 2))
    assert dropped == ["date=2023-12-02"]
    assert store.read_st().count() == len(oracle)

    # compat views: st_data/st_peak pair positionally by id (§1.2)
    store.compat_views(num_of_ports=4, num_of_peaks=4)
    n_data = spark.table("st_data").count()
    n_windows = st.select("window_start").distinct().count()
    assert n_data == st.count()  # long-form rows carry through

    # batch == stream equivalence for the same transformation
    batch_out = window_means(df_n).collect()
    assert len(batch_out) == len(got)


def test_stream_batch_equivalence_tumbling(spark, tmpdir_):
    """Tumbling 1h counts over replayed events == the same agg in batch
    (SURVEY.md §5.2)."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import tumbling_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "value")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "event_id": -1,
        "ts": max_ts + dt.timedelta(hours=2),
        "value": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            tumbling_counts(stream, "ts", "1 hour", "10 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    got_d = {
        r.window_start: (r.n, round(r.sum_value, 6))
        for r in got
        if r.window_start <= max_ts  # sentinel's own window excluded
    }
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .collect()
    )
    batch_d = {r.window_start: (r.n, round(r.sum_value, 6)) for r in batch}
    assert got_d == batch_d


def test_streaming_dedup(spark, tmpdir_):
    """Duplicate event_ids across micro-batches are dropped
    (watermark-bounded state)."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import streaming_dedup
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = (
        load_table(spark, "events", SF_DIR)
        .select("event_id", "ts", "value")
        .limit(200)
    )
    doubled = ev.unionAll(ev)  # every row twice
    stream, replay_dir = replay_dataframe(
        spark, doubled, n_chunks=4, order_col="ts"
    )
    try:
        got = _collect_stream(
            spark,
            streaming_dedup(stream, ["event_id"], "ts", "2 hours"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    ids = [r.event_id for r in got]
    assert len(ids) == len(set(ids)) == 200


def test_stream_static_join(spark, tmpdir_):
    """Stream-static enrich: every streamed event joins its user dim row."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import stream_static_join
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "user_id")
    dim = ev.select("user_id").distinct().withColumn(
        "user_tier", (F.col("user_id") % 3).cast("int")
    )
    stream, replay_dir = replay_dataframe(spark, ev, n_chunks=3, order_col="ts")
    try:
        got = _collect_stream(
            spark, stream_static_join(stream, dim, ["user_id"]), f"{tmpdir_}/ckpt"
        )
    finally:
        cleanup_replay(replay_dir)
    assert len(got) == ev.count()
    assert all(r.user_tier == r.user_id % 3 for r in got)


def test_late_data_dropped_by_watermark(spark, tmpdir_):
    """A row arriving after the watermark passed its window is dropped
    from append-mode aggregation (SURVEY.md §5.2 late-data test)."""
    from database_peak_streaming_spark.streaming.ops import tumbling_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from pyspark.sql import types as T

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # One row per micro-batch.  Event 4 pushes the watermark past hour 0;
    # the input-side late filter applies the advanced watermark one batch
    # later (watermark propagation lags a batch), so event 5 is a spacer
    # and event 6 is the genuinely-late row that must be dropped.
    on_time = [
        (1, t0, 1.0),
        (2, t0 + dt.timedelta(minutes=10), 1.0),
        (3, t0 + dt.timedelta(hours=1, minutes=5), 1.0),
        (4, t0 + dt.timedelta(hours=6), 1.0),  # pushes watermark past hour 0
        (5, t0 + dt.timedelta(hours=6, minutes=1), 1.0),  # spacer batch
        (6, t0 + dt.timedelta(minutes=20), 99.0),  # LATE for hour 0
        (7, t0 + dt.timedelta(hours=12), 1.0),  # flusher
    ]
    df = spark.createDataFrame(on_time, schema=schema)
    stream, replay_dir = replay_dataframe(spark, df, n_chunks=7, order_col="event_id")
    try:
        got = _collect_stream(
            spark,
            tumbling_counts(stream, "ts", "1 hour", "30 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    by_window = {r.window_start: r.n for r in got}
    assert by_window[t0] == 2, "late row must be excluded from hour-0 window"


def test_sliding_counts_stream_matches_batch(spark, tmpdir_):
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import sliding_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "value")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {"event_id": -1, "ts": max_ts + dt.timedelta(hours=3), "value": None}
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            sliding_counts(stream, "ts", "1 hour", "30 minutes", "10 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    got_d = {r.window_start: r.n for r in got if r.window_start <= max_ts}
    batch = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
        .collect()
    )
    batch_d = {r.window_start: r.n for r in batch if r.window_start <= max_ts}
    assert got_d == batch_d


def test_session_counts_stream_matches_batch(spark, tmpdir_):
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import session_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "user_id")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "event_id": -1,
        "ts": max_ts + dt.timedelta(hours=3),
        "user_id": -1,
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            session_counts(stream, "ts", "user_id", "30 minutes", "10 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    got_d = {
        (r.user_id, r.session_start): r.n_events for r in got if r.user_id >= 0
    }
    batch = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .collect()
    )
    batch_d = {(r.user_id, r.session_start): r.n_events for r in batch}
    assert got_d == batch_d


def test_stream_stream_interval_join_matches_batch(spark, tmpdir_):
    """Stream-stream attribution join (click -> purchase within 30 min,
    same user) equals the identical interval join run as a batch query.
    Both sides are independent file-replay streams; AvailableNow drains
    them to completion so no pair is lost to an unadvanced watermark."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        stream_stream_interval_join,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
    )
    cs, c_dir = replay_dataframe(spark, clicks, n_chunks=3, order_col="click_ts")
    ps, p_dir = replay_dataframe(spark, purchases, n_chunks=3, order_col="purchase_ts")
    try:
        got = _collect_stream(
            spark,
            stream_stream_interval_join(
                cs, ps, "click_user", "purchase_user",
                "click_ts", "purchase_ts", "2 hours", "30 MINUTES",
            ),
            f"{tmpdir_}/ckpt",
            timeout_s=180,
        )
    finally:
        cleanup_replay(c_dir)
        cleanup_replay(p_dir)

    batch = (
        clicks.join(
            purchases,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
            "inner",
        )
        .select("click_id", "purchase_id")
        .collect()
    )
    got_pairs = sorted((r.click_id, r.purchase_id) for r in got)
    batch_pairs = sorted((r.click_id, r.purchase_id) for r in batch)
    assert len(batch_pairs) > 0
    assert got_pairs == batch_pairs


def test_stream_stream_left_outer_join_matches_batch(spark, tmpdir_):
    """Left-outer interval join: matched pairs equal the batch join, and
    clicks with NO purchase within the interval emit null-padded rows
    once their state expires.  Compared against the batch left join on
    the watermark-closed prefix (rows older than max_ts - delay - upper;
    younger unmatched rows are still legitimately buffered at stream
    end)."""
    import datetime as dt

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        stream_stream_interval_join_left,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("purchase_user"),
        F.col("ts").alias("purchase_ts"),
    )
    # S6 sentinels: outer-join nulls emit only in a batch AFTER the
    # watermark passes the buffered row; a far-future row on EACH side
    # (global watermark is the min across streams) closes all real state
    # before the replay drains.  Distinct negative user ids so the
    # sentinels can't join each other or any real row.
    max_ts = max(r.ts for r in ev.select(F.max("ts").alias("ts")).collect())
    far = max_ts + dt.timedelta(days=2)
    cs, c_dir = replay_dataframe(
        spark, clicks, n_chunks=3, order_col="click_ts",
        sentinel_row={"click_id": -1, "click_user": -1, "click_ts": far},
    )
    ps, p_dir = replay_dataframe(
        spark, purchases, n_chunks=3, order_col="purchase_ts",
        sentinel_row={"purchase_id": -1, "purchase_user": -2, "purchase_ts": far},
    )
    try:
        got = _collect_stream(
            spark,
            stream_stream_interval_join_left(
                cs, ps, "click_user", "purchase_user",
                "click_ts", "purchase_ts", "2 hours", "30 MINUTES",
            ),
            f"{tmpdir_}/ckpt",
            timeout_s=180,
        )
    finally:
        cleanup_replay(c_dir)
        cleanup_replay(p_dir)
    got = [r for r in got if r.click_id >= 0]

    # the sentinels push the final watermark 2 days past every real row,
    # so ALL real click state closes; the cutoff now only guards the
    # margin below the sentinel itself
    closed_before = far - dt.timedelta(hours=3, minutes=30)
    batch = (
        clicks.join(
            purchases,
            (F.col("click_user") == F.col("purchase_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
            "left",
        )
        .filter(F.col("click_ts") < F.lit(closed_before))
        .select("click_id", "purchase_id")
        .collect()
    )
    got_pairs = sorted(
        (r.click_id, r.purchase_id)
        for r in got
        if r.click_ts.replace(tzinfo=None) < closed_before
    )
    batch_pairs = sorted((r.click_id, r.purchase_id) for r in batch)
    assert any(p is None for _, p in batch_pairs), "fixture lacks unmatched clicks"
    assert got_pairs == batch_pairs


def test_update_mode_emits_revisions_and_converges(spark, tmpdir_):
    """outputMode('update') re-emits a window's row each time a later
    chunk revises it; the LAST emission per window must equal the batch
    aggregate (append mode only emits after the watermark closes a
    window — update mode is the low-latency path that shows revisions)."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import tumbling_counts
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "value").limit(600)
    # order by event_id, NOT ts: chunks interleave event times, so later
    # chunks revise windows already emitted — exercising update semantics
    stream, replay_dir = replay_dataframe(spark, ev, n_chunks=4, order_col="event_id")
    emissions = []

    def sink(batch_df, epoch):
        emissions.extend((epoch, r) for r in batch_df.collect())

    try:
        q = (
            tumbling_counts(stream, "ts", "1 hour", "30 days")
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
    finally:
        cleanup_replay(replay_dir)

    last = {}
    for epoch, r in emissions:
        last[r.window_start] = (r.n, r.sum_value)
    batch = {
        r.window_start: (r.n, r.sum_value)
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "n", "sum_value")
            .collect()
        )
    }
    assert {k: v[0] for k, v in last.items()} == {k: v[0] for k, v in batch.items()}
    # at least one window was revised across epochs (update mode observable)
    assert len(emissions) > len(batch)
