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


def test_streaming_dedup_within_watermark(spark, tmpdir_):
    """dropDuplicatesWithinWatermark: duplicates delivered in a LATER
    chunk (the queue-redelivery shape) still dedup to one row per key,
    and the streamed result equals the batch distinct."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        streaming_dedup_within_watermark,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = (
        load_table(spark, "events", SF_DIR)
        .select("event_id", "ts", "value")
        .limit(200)
    )
    doubled = ev.unionAll(ev)
    stream, replay_dir = replay_dataframe(
        spark, doubled, n_chunks=4, order_col="ts"
    )
    try:
        got = _collect_stream(
            spark,
            streaming_dedup_within_watermark(
                stream, ["event_id"], "ts", "2 hours"
            ),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    ids = sorted(r.event_id for r in got)
    batch_ids = sorted(r.event_id for r in ev.select("event_id").collect())
    assert ids == batch_ids


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


def _synth_peak_frames(n_scans=20, n_channels=4, n_peaks=2, base_epoch=1_700_000_000):
    """Deterministic reference-format binary frames: 10 Hz scans (100 ms
    fractional steps), n_peaks wavelengths per channel."""
    from database_peak_streaming_spark.sources.binary import encode_peaks_frame

    frames = []
    for s in range(n_scans):
        frames.append(
            encode_peaks_frame(
                serial_number=999,
                timestamp_int=base_epoch + s // 10,
                timestamp_frac=(s % 10) * 100_000_000,
                counts=[n_peaks] * n_channels,
                wavelengths=[
                    1500.0 + 10 * ch + pk + 0.01 * s
                    for ch in range(1, n_channels + 1)
                    for pk in range(n_peaks)
                ],
            )
        )
    return frames


def test_socket_live_path_matches_replay(spark, tmpdir_):
    """S1 closure: the live-shaped path (TCP socket source -> base64
    line framing -> decode_peaks_frames -> window_means -> tiered sink)
    must produce the same st tier as the replay pipeline over the same
    binary frames (hyperion.py:284-312's connect->parse->queue loop,
    re-expressed as a Structured Streaming topology)."""
    import time

    from database_peak_streaming_spark.sources.binary import (
        decode_peaks_frames,
        encode_peaks_frame,
    )
    from database_peak_streaming_spark.streaming.pipeline import PeaksPipeline
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.socket_source import (
        FrameServer,
        peaks_socket_stream,
    )
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    frames = _synth_peak_frames()
    # flush sentinel (S6): one real frame 60 s past the data, pushing
    # the watermark over every data window; its own window is excluded
    # from the comparison below.
    sentinel = encode_peaks_frame(
        serial_number=0,
        timestamp_int=1_700_000_000 + 60,
        timestamp_frac=0,
        counts=[1, 0, 0, 0],
        wavelengths=[0.0],
    )
    wire = frames + [sentinel]

    # replay path (the existing verified pipeline) over the same frames
    batch = spark.createDataFrame([(f,) for f in wire], "frame binary")
    decoded = decode_peaks_frames(batch, num_channels=4)
    stream, replay_dir = replay_dataframe(spark, decoded, n_chunks=4, order_col="ts")
    store_replay = TieredStore(spark, f"{tmpdir_}/replay_tiers", st_length_s=30 * 86400)
    try:
        PeaksPipeline(spark, store_replay).run_available_now(
            stream, f"{tmpdir_}/replay_ckpt"
        )
    finally:
        cleanup_replay(replay_dir)
    # the sentinel's OWN window never flushes (nothing advances the
    # watermark past it) — exclude anything at/after its known ts
    sentinel_ts = dt.datetime(1970, 1, 1) + dt.timedelta(seconds=1_700_000_060)
    want = {
        (r.window_start, r.channel, r.peak_idx): (r.mean_wavelength, r.n_samples)
        for r in store_replay.read_st().collect()
        if r.window_start < sentinel_ts
    }
    assert len(want) == 20 * 4 * 2  # every (scan-window, channel, peak)

    # live path: TCP server -> socket source -> same pipeline
    server = FrameServer(wire).start()
    store_live = TieredStore(spark, f"{tmpdir_}/live_tiers", st_length_s=30 * 86400)
    pipe = PeaksPipeline(spark, store_live)
    live = peaks_socket_stream(spark, "127.0.0.1", server.port, num_channels=4)
    q = pipe.start(live, f"{tmpdir_}/live_ckpt", {"processingTime": "200 milliseconds"})
    try:
        deadline = time.time() + 90
        got = {}
        while time.time() < deadline:
            try:
                got = {
                    (r.window_start, r.channel, r.peak_idx): (
                        r.mean_wavelength,
                        r.n_samples,
                    )
                    for r in store_live.read_st().collect()
                }
            except Exception:  # tier dir not created yet
                got = {}
            if len(got) >= len(want):
                break
            time.sleep(1.0)
    finally:
        q.stop()
        server.close()

    got = {k: v for k, v in got.items() if k[0] < sentinel_ts}
    assert got.keys() == want.keys()
    for k, (mean, n) in want.items():
        assert abs(got[k][0] - mean) < 1e-9 and got[k][1] == n


def test_spectrum_pipeline_end_to_end(spark, tmpdir_):
    """S4 across all payload kinds: replay a synthetic SPECTRUM frame
    stream through the tiered pipeline; window means must match the
    numpy oracle and the lt tier must resample per minute — the
    spectrum twin of test_peaks_pipeline_end_to_end."""
    from database_peak_streaming_spark.sources.binary import (
        decode_spectrum_frames,
        encode_spectrum_frame,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.spectra import (
        SpectraPipeline,
        window_spectrum_means,
    )
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    n_scans, n_points, base = 20, 8, 1_700_000_000
    # channels 1 and 3 active (bits 0b0101), deterministic intensities
    frames = []
    for s in range(n_scans):
        matrix = np.array(
            [
                [1000 + 10 * ch + p + (s % 5) for p in range(n_points)]
                for ch in (1, 3)
            ],
            dtype=np.uint16,
        )
        frames.append(
            encode_spectrum_frame(
                serial_number=42,
                timestamp_int=base + s // 10,
                timestamp_frac=(s % 10) * 100_000_000,
                start_wavelength=1500.0,
                wavelength_increment=0.02,
                active_channel_bits=0b0101,
                matrix=matrix,
            )
        )
    batch = spark.createDataFrame([(f,) for f in frames], "frame binary")
    decoded = decode_spectrum_frames(batch)

    # numpy oracle over the decoded batch: mean intensity per
    # (100ms window, channel, point)
    pdf = decoded.toPandas()
    rows = []
    for _, r in pdf.iterrows():
        for p, v in enumerate(r.counts):
            rows.append((r.ts.floor("100ms"), r.channel, p, v))
    opdf = pd.DataFrame(rows, columns=["win", "channel", "point_idx", "v"])
    oracle = opdf.groupby(["win", "channel", "point_idx"]).v.agg(["mean", "count"])

    # stream path: replay decoded rows with a flush sentinel
    sentinel = {
        "serial_number": -1,
        "ts": pdf.ts.max() + dt.timedelta(seconds=60),
        "channel": None,
        "start_wavelength": None,
        "wavelength_increment": None,
        "counts": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, decoded, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    store = TieredStore(spark, f"{tmpdir_}/tiers", st_length_s=30 * 86400)
    pipe = SpectraPipeline(spark, store)
    try:
        pipe.run_available_now(stream, f"{tmpdir_}/ckpt")
    finally:
        cleanup_replay(replay_dir)

    got = {
        (r.window_start, r.channel, r.point_idx): (
            r.mean_intensity,
            r.n_samples,
            r.wavelength,
        )
        for r in store.read_st().collect()
    }
    assert len(got) == len(oracle) == n_scans * 2 * n_points
    for (win, ch, pk), row in oracle.iterrows():
        mean, n, wl = got[(win.to_pydatetime(), ch, pk)]
        assert abs(mean - row["mean"]) < 1e-9
        assert n == row["count"]
        assert abs(wl - (1500.0 + 0.02 * pk)) < 1e-12

    # lt tier: 2 s of data -> one minute bucket -> one row per (ch, point)
    assert store.read_lt().count() == 2 * n_points

    # stream == batch equivalence for the same transformation
    batch_means = window_spectrum_means(decoded)
    assert batch_means.count() == len(oracle)


def test_sensor_pipeline_end_to_end(spark, tmpdir_):
    """S4's third payload kind: replay a synthetic SENSOR frame stream
    through the tiered pipeline; window means must match the numpy
    oracle — completes stream->tier coverage across peaks, spectra,
    and sensors."""
    from database_peak_streaming_spark.sources.binary import (
        decode_sensor_frames,
        encode_sensor_frame,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.sensors import (
        SensorsPipeline,
        window_sensor_means,
    )
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    n_scans, n_sensors, base = 20, 6, 1_700_000_000
    frames = [
        encode_sensor_frame(
            serial_number=7,
            timestamp_int=base + s // 10,
            timestamp_frac=(s % 10) * 100_000_000,
            values=[20.0 + i + 0.25 * (s % 4) for i in range(n_sensors)],
        )
        for s in range(n_scans)
    ]
    batch = spark.createDataFrame([(f,) for f in frames], "frame binary")
    decoded = decode_sensor_frames(batch)

    pdf = decoded.toPandas()
    pdf["win"] = pdf.ts.dt.floor("100ms")
    oracle = pdf.groupby(["win", "sensor_idx"]).value.agg(["mean", "count"])

    sentinel = {
        "serial_number": -1,
        "ts": pdf.ts.max() + dt.timedelta(seconds=60),
        "sensor_idx": None,
        "value": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, decoded, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    store = TieredStore(spark, f"{tmpdir_}/tiers", st_length_s=30 * 86400)
    pipe = SensorsPipeline(spark, store)
    try:
        pipe.run_available_now(stream, f"{tmpdir_}/ckpt")
    finally:
        cleanup_replay(replay_dir)

    got = {
        (r.window_start, r.sensor_idx): (r.mean_value, r.n_samples)
        for r in store.read_st().collect()
    }
    assert len(got) == len(oracle) == n_scans * n_sensors
    for (win, si), row in oracle.iterrows():
        mean, n = got[(win.to_pydatetime(), si)]
        assert abs(mean - row["mean"]) < 1e-9 and n == row["count"]

    # lt tier: 2 s of data -> one minute bucket -> one row per sensor
    assert store.read_lt().count() == n_sensors

    # stream == batch equivalence
    assert window_sensor_means(decoded).count() == len(oracle)


def test_stream_distinct_users_sketch_bounded(spark, tmpdir_):
    """Windowed distinct-user cardinality on a stream (HLL++ sketch
    state — exact countDistinct is unsupported in streaming aggregation)
    must land within the sketch's error bound of the exact batch
    recompute for every window, and the incremental cross-micro-batch
    merge must equal the single-pass batch estimate exactly (sketch
    merge is deterministic)."""
    import datetime as dt

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import tumbling_distinct_users
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select("event_id", "ts", "user_id")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {"event_id": -1, "ts": max_ts + dt.timedelta(hours=2), "user_id": None}
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            tumbling_distinct_users(stream, "ts", "user_id", "1 hour", "10 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    got_d = {
        r.window_start: r.approx_users for r in got if r.window_start <= max_ts
    }
    exact = {
        r.window_start: (r.exact, r.approx)
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(
                F.countDistinct("user_id").alias("exact"),
                F.approx_count_distinct("user_id", 0.02).alias("approx"),
            )
            .select(F.col("w.start").alias("window_start"), "exact", "approx")
            .collect()
        )
    }
    assert set(got_d) == set(exact)
    for w, est in got_d.items():
        ex, batch_est = exact[w]
        # bound vs truth: 2.5 sigma of rsd=0.02
        assert abs(est - ex) / ex <= 0.05, (w, est, ex)
        # incremental merge == single-pass sketch (determinism)
        assert est == batch_est, (w, est, batch_est)


def test_rollup_mv_stream_matches_batch(spark, tmpdir_):
    """Streaming materialized-view maintenance: replaying events through
    the foreachBatch rollup-MV sink must leave the stored view EQUAL to
    the one-shot batch rollup — the monoid-merge algebra the batch
    query `incremental_rollup_merge` proves declaratively, here pinned
    across micro-batch boundaries."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import rollup_mv_sink
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "ts", "event_type", "value"
    )
    stream, replay_dir = replay_dataframe(spark, ev, n_chunks=4, order_col="ts")
    mv_dir = f"{tmpdir_}/rollup_mv"
    try:
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(rollup_mv_sink(spark, mv_dir))
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert not q.isActive
    finally:
        cleanup_replay(replay_dir)

    got = {
        (r.day, r.event_type): (r.n_events, r._dsum)
        for r in spark.read.parquet(mv_dir).collect()
    }
    want = {
        (r.day, r.event_type): (r.n_events, r._dsum)
        for r in ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("_dsum"),
        )
        .collect()
    }
    assert got == want


def test_stream_stream_full_outer_join_matches_batch(spark, tmpdir_):
    """FULL OUTER interval join: matched pairs equal the batch join and
    UNMATCHED rows from BOTH sides emit null-padded after their state
    expires — compared against the batch full join on the
    watermark-closed prefix (sentinels push the final watermark past
    every real row)."""
    import datetime as dt

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        stream_stream_interval_join_full,
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
    # signups join clicks-within-30min: both sides have unmatched rows
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("signup_user"),
        F.col("ts").alias("signup_ts"),
    )
    max_ts = max(r.ts for r in ev.select(F.max("ts").alias("ts")).collect())
    far = max_ts + dt.timedelta(days=2)
    cs, c_dir = replay_dataframe(
        spark, clicks, n_chunks=3, order_col="click_ts",
        sentinel_row={"click_id": -1, "click_user": -1, "click_ts": far},
    )
    ss, s_dir = replay_dataframe(
        spark, signups, n_chunks=3, order_col="signup_ts",
        sentinel_row={"signup_id": -1, "signup_user": -2, "signup_ts": far},
    )
    try:
        got = _collect_stream(
            spark,
            stream_stream_interval_join_full(
                cs, ss, "click_user", "signup_user",
                "click_ts", "signup_ts", "2 hours", "30 MINUTES",
            ),
            f"{tmpdir_}/ckpt",
            timeout_s=180,
        )
    finally:
        cleanup_replay(c_dir)
        cleanup_replay(s_dir)
    got = [
        r
        for r in got
        if (r.click_id is None or r.click_id >= 0)
        and (r.signup_id is None or r.signup_id >= 0)
    ]
    closed_before = far - dt.timedelta(hours=3, minutes=30)
    batch = (
        clicks.join(
            signups,
            (F.col("click_user") == F.col("signup_user"))
            & (F.col("signup_ts") >= F.col("click_ts"))
            & (
                F.col("signup_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
            "full",
        )
        .filter(
            (F.col("click_ts").isNull() | (F.col("click_ts") < F.lit(closed_before)))
            & (F.col("signup_ts").isNull() | (F.col("signup_ts") < F.lit(closed_before)))
        )
        .select("click_id", "signup_id")
        .collect()
    )

    def _closed(r) -> bool:
        for c in ("click_ts", "signup_ts"):
            v = getattr(r, c)
            if v is not None and v.replace(tzinfo=None) >= closed_before:
                return False
        return True

    def _key(p):
        return (p[0] is None, p[0] or 0, p[1] is None, p[1] or 0)

    got_pairs = sorted(
        ((r.click_id, r.signup_id) for r in got if _closed(r)), key=_key
    )
    batch_pairs = sorted(
        ((r.click_id, r.signup_id) for r in batch), key=_key
    )
    assert any(s is None for _, s in batch_pairs), "no unmatched clicks"
    assert any(c is None for c, _ in batch_pairs), "no unmatched signups"
    assert got_pairs == batch_pairs


def test_streaming_session_dynamic_gap_matches_batch(spark, tmpdir_):
    """Spark 4 dynamic-gap sessions: `session_window(ts, gap_expr)`
    where a purchase extends its session by 2 h and anything else by
    30 min.  The streamed result (state-store session merge across
    micro-batches, append on watermark close) must equal the SAME
    aggregation run in batch mode over the whole table — the
    stream==batch contract every windowed op in streaming/ops.py
    carries."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        as_event_time,
        session_counts_dynamic,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", "ts", "event_type"
    )
    # far-future sentinel advances the watermark past every real
    # session's close so append mode flushes them all (the
    # test_session_counts_stream_matches_batch pattern)
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "user_id": -1,
        "ts": max_ts + dt.timedelta(hours=6),
        "event_type": "click",
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            session_counts_dynamic(stream, "ts", "user_id", "2 hours"),
            f"{tmpdir_}/ckpt_dyn_sess",
        )
    finally:
        cleanup_replay(replay_dir)
    got = [r for r in got if r.user_id >= 0]
    want = session_counts_dynamic(as_event_time(ev, "ts"), "ts", "user_id", "2 hours").collect()
    key = lambda r: (r.user_id, r.session_start)
    got_d = {key(r): (r.session_end, r.n_events, r.n_purchases) for r in got}
    want_d = {key(r): (r.session_end, r.n_events, r.n_purchases) for r in want}
    assert len(got_d) == len(got) and len(want_d) == len(want)
    assert got_d == want_d
    # the dynamic gap actually bites: purchases must have opened longer
    # sessions than a fixed 30-min rule would (at least one session
    # spans > 30 min of inactivity only a purchase could bridge)
    assert any(n_p > 0 for (_, _, n_p) in want_d.values())


def test_streaming_ks_drift_matches_batch(spark, tmpdir_):
    """Distribution-drift monitoring on a stream: the windowed
    value-histogram (the bounded sufficient statistic) accumulated
    incrementally across micro-batches, finalized into per-(window,
    type) KS drift, must equal the same histogram + finalizer computed
    in one batch pass — and every D must be a valid KS statistic."""
    import datetime as dt

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        ks_drift_from_histogram,
        windowed_value_histogram,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "ts", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "event_id": -1,
        # 6-hour windows align to the day grid: the last real window can
        # close up to 6h past max_ts, and eviction needs the watermark
        # (sentinel - delay) strictly beyond that close — +24h is safely
        # past it regardless of where max_ts falls in its window.
        "ts": max_ts + dt.timedelta(hours=24),
        "event_type": "view",
        "value": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        hist_rows = _collect_stream(
            spark,
            windowed_value_histogram(
                stream, "ts", "event_type", "6 hours", "10 minutes"
            ),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    hist_stream = spark.createDataFrame(
        [r for r in hist_rows if r.window_start <= max_ts]
    )
    got = {
        (r.window_start, r.event_type): (r.ks_d, r.n_events)
        for r in ks_drift_from_histogram(hist_stream).collect()
    }

    hist_batch = (
        ev.groupBy(
            F.window("ts", "6 hours").alias("w"),
            "event_type",
            F.floor(F.col("value") / F.lit(1.0)).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "bucket", "n")
    )
    want = {
        (r.window_start, r.event_type): (r.ks_d, r.n_events)
        for r in ks_drift_from_histogram(hist_batch).collect()
    }
    assert got == want
    assert got, "no windows produced"
    for (w, t), (d, n) in got.items():
        assert 0.0 <= d <= 1.0, (w, t, d)
        assert n > 0


def test_streaming_psi_drift_matches_batch(spark, tmpdir_):
    """Window-over-window PSI from the streamed value-histogram must
    equal the same finalizer over the batch-computed histogram, every
    PSI must be non-negative (each (p-q)ln(p/q) term is), and the
    first window per key must be absent (no predecessor to score
    against)."""
    import datetime as dt

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import (
        psi_from_histogram,
        windowed_value_histogram,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "ts", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "event_id": -1,
        "ts": max_ts + dt.timedelta(hours=24),
        "event_type": "view",
        "value": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=4, order_col="ts", sentinel_row=sentinel
    )
    try:
        hist_rows = _collect_stream(
            spark,
            windowed_value_histogram(
                stream, "ts", "event_type", "6 hours", "10 minutes"
            ),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    hist_stream = spark.createDataFrame(
        [r for r in hist_rows if r.window_start <= max_ts]
    )
    got = {
        (r.window_start, r.event_type): (r.psi, r.n_prev_events, r.n_cur_events)
        for r in psi_from_histogram(hist_stream).collect()
    }

    hist_batch = (
        ev.groupBy(
            F.window("ts", "6 hours").alias("w"),
            "event_type",
            F.floor(F.col("value") / F.lit(1.0)).cast("long").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "bucket", "n")
    )
    want = {
        (r.window_start, r.event_type): (r.psi, r.n_prev_events, r.n_cur_events)
        for r in psi_from_histogram(hist_batch).collect()
    }
    assert got == want
    assert got, "no window pairs produced"
    first_window = min(w for (w, _) in got)
    windows = sorted({w for (w, _) in got})
    all_windows = sorted(
        {r.window_start for r in hist_batch.select("window_start").collect()}
    )
    # the earliest histogram window never appears as a scored window
    assert first_window == all_windows[1]
    assert set(windows) == set(all_windows[1:])
    for (w, t), (psi, n_prev, n_cur) in got.items():
        assert psi >= 0.0, (w, t, psi)
        assert n_prev >= 0 and n_cur >= 0


def test_stream_batch_equivalence_ohlc(spark, tmpdir_):
    """Streaming OHLC candles (min_by/max_by with O(1) window state)
    over a chunked replay == the batch bars on the same events —
    order-aware open/close survive out-of-order micro-batch arrival
    because the ordering key travels with the aggregate state."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import tumbling_ohlc
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )

    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "ts", "event_type", "value"
    )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = {
        "event_id": -1,
        "ts": max_ts + dt.timedelta(hours=2),
        "event_type": "purchase",
        "value": 0.0,
    }
    stream, replay_dir = replay_dataframe(
        spark, ev, n_chunks=3, order_col="ts", sentinel_row=sentinel
    )
    try:
        got = _collect_stream(
            spark,
            tumbling_ohlc(stream, "ts", "event_type", "1 hour", "10 minutes"),
            f"{tmpdir_}/ckpt",
        )
    finally:
        cleanup_replay(replay_dir)
    got_d = {
        (r.event_type, r.window_start): (
            r.n_events, r.open, r.high, r.low, r.close,
        )
        for r in got
        if r.window_start <= max_ts
    }
    okey = F.struct(F.col("ts"), F.col("event_id"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    batch = (
        ev.select("event_type", "ts", "event_id", cents.alias("cents"))
        .groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min_by("cents", okey) / 100.0, 6).alias("open"),
            F.round(F.max("cents") / 100.0, 6).alias("high"),
            F.round(F.min("cents") / 100.0, 6).alias("low"),
            F.round(F.max_by("cents", okey) / 100.0, 6).alias("close"),
        )
        .select(
            "event_type", F.col("w.start").alias("window_start"),
            "n_events", "open", "high", "low", "close",
        )
        .collect()
    )
    batch_d = {
        (r.event_type, r.window_start): (
            r.n_events, r.open, r.high, r.low, r.close,
        )
        for r in batch
    }
    assert got_d == batch_d
