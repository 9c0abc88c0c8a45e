"""Fault-tolerance tests: epoch re-delivery idempotence and
kill-and-resume from checkpoint (the at-least-once -> exactly-once story
the reference could not have — its buffers died with the process)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-ft-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _peaks(n_scans=40):
    t0 = dt.datetime(2024, 7, 1)
    rows = []
    for s in range(n_scans):
        ts = t0 + dt.timedelta(seconds=s / 10)
        for ch in (1, 2):
            for pk in (0, 1):
                rows.append((s, ts, ch, pk, 1500.0 + ch + pk + 0.001 * s))
    return pd.DataFrame(
        rows, columns=["scan_id", "ts", "channel", "peak_idx", "wavelength"]
    )


def test_epoch_redelivery_is_noop(spark, tmpdir_):
    from database_peak_streaming_spark.schemas import peaks_long_schema
    from database_peak_streaming_spark.streaming.pipeline import window_means
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    df = spark.createDataFrame(_peaks(), schema=peaks_long_schema())
    agg = window_means(df)
    store = TieredStore(spark, f"{tmpdir_}/tiers")
    store.write_epoch(agg, epoch_id=7)
    n1 = store.read_st().count()
    store.write_epoch(agg, epoch_id=7)  # re-delivery after "crash"
    assert store.read_st().count() == n1, "same epoch must not double-append"
    store.write_epoch(agg, epoch_id=8)  # a NEW epoch appends
    assert store.read_st().count() == 2 * n1


def test_epoch_partial_crash_redelivery_exactly_once(spark, tmpdir_):
    """The hard crash window: st files published but the commit marker
    never written.  Re-delivery must converge to exactly-once content —
    the epoch-tagged publish replaces the partial attempt instead of
    appending next to it."""
    from pathlib import Path

    from database_peak_streaming_spark.schemas import peaks_long_schema
    from database_peak_streaming_spark.streaming.pipeline import window_means
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    df = spark.createDataFrame(_peaks(), schema=peaks_long_schema())
    agg = window_means(df)
    store = TieredStore(spark, f"{tmpdir_}/tiers")
    store.write_epoch(agg, epoch_id=7)
    n1 = store.read_st().count()

    # simulate a crash after the st publish but before the marker:
    marker = Path(f"{tmpdir_}/tiers/_epochs/7.committed")
    marker.unlink()
    store.write_epoch(agg, epoch_id=7)  # re-delivery
    assert store.read_st().count() == n1, "partial-commit retry double-appended st"
    assert marker.exists()

    # simulate a crash mid-publish (some of the epoch's files landed):
    marker.unlink()
    published = sorted(Path(store.st_path).glob("date=*/epoch-7-*.parquet"))
    assert published, "expected epoch-tagged st files"
    published[0].unlink()  # half-published state
    store.write_epoch(agg, epoch_id=7)  # re-delivery
    assert store.read_st().count() == n1, "mid-publish retry lost or doubled rows"


def test_compaction_crash_recovery(spark, tmpdir_):
    """compact_st's swap must never lose a partition: a crash between
    the trash and tmp renames leaves a trash dir that the next call
    restores; leftover tmp dirs are discarded."""
    import shutil as sh
    from pathlib import Path

    from database_peak_streaming_spark.schemas import peaks_long_schema
    from database_peak_streaming_spark.streaming.pipeline import window_means
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    df = spark.createDataFrame(_peaks(), schema=peaks_long_schema())
    agg = window_means(df)
    store = TieredStore(spark, f"{tmpdir_}/tiers")
    store.write_epoch(agg, epoch_id=1)
    store.write_epoch(agg.withColumn("n_samples", F.col("n_samples")), epoch_id=2)
    n = store.read_st().count()

    st = Path(store.st_path)
    part = sorted(st.glob("date=*"))[0]
    # crash between swap steps 2 and 3: live partition renamed to trash
    part.rename(st / f"_compact_trash_{part.name}")
    assert not part.exists()
    store.compact_st()
    assert part.exists(), "trash partition was not restored"
    assert store.read_st().count() == n, "recovery lost rows"

    # stale tmp dir from an interrupted attempt is discarded
    tmp = st / f"_compact_tmp_{part.name}"
    tmp.mkdir()
    (tmp / "junk.parquet").write_bytes(b"junk")
    store.compact_st()
    assert not tmp.exists()
    assert store.read_st().count() == n


def test_kill_and_resume_from_checkpoint(spark, tmpdir_):
    """Stop the stream mid-replay; restart on the same checkpoint; the
    final store must equal the batch oracle exactly (no loss, no dups)."""
    from database_peak_streaming_spark.schemas import peaks_long_schema
    from database_peak_streaming_spark.streaming.pipeline import (
        PeaksPipeline,
        window_means,
    )
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    pdf = _peaks()
    df = spark.createDataFrame(pdf, schema=peaks_long_schema())
    sentinel = {
        "scan_id": -1,
        "ts": pdf.ts.max() + dt.timedelta(seconds=60),
        "channel": None,
        "peak_idx": None,
        "wavelength": None,
    }
    stream, replay_dir = replay_dataframe(
        spark, df, n_chunks=8, order_col="scan_id", sentinel_row=sentinel
    )
    store = TieredStore(spark, f"{tmpdir_}/tiers")
    pipe = PeaksPipeline(spark, store)
    ckpt = f"{tmpdir_}/ckpt"
    try:
        # phase 1: process a couple of files, then kill mid-stream
        q = pipe.start(stream, ckpt, {"processingTime": "300 milliseconds"})
        t0 = time.time()
        while time.time() - t0 < 30 and len(pipe.epochs_seen) < 3:
            time.sleep(0.2)
        q.stop()
        assert len(pipe.epochs_seen) >= 1

        # phase 2: resume from the same checkpoint, drain to the end
        pipe2 = PeaksPipeline(spark, store)
        pipe2.run_available_now(stream, ckpt)
    finally:
        cleanup_replay(replay_dir)

    got = {
        (r.window_start, r.channel, r.peak_idx): (
            round(r.mean_wavelength, 9),
            r.n_samples,
        )
        for r in store.read_st().collect()
    }
    oracle = {
        (r.window_start, r.channel, r.peak_idx): (
            round(r.mean_wavelength, 9),
            r.n_samples,
        )
        for r in window_means(df).collect()
    }
    assert got == oracle, (
        f"exactly-once violated: {len(got)} stored vs {len(oracle)} expected"
    )


def test_stateful_transitions_kill_resume_exactly_once(spark, tmpdir_):
    """Kill the stateful transition stream mid-replay and resume on the
    same checkpoint into a transactional file sink: the final
    (prev, next) counts must equal the oracle-checked batch Markov
    query exactly — state-store recovery re-derives per-user continuity
    and the sink's manifest commits each batch atomically (no loss, no
    double-emits)."""
    from collections import Counter

    from database_peak_streaming_spark.operators.behavior import (
        events_markov_transitions,
    )
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.stateful import (
        stateful_transitions,
    )
    from tests.conftest import SF_DIR

    ev = load_table(spark, "events", SF_DIR).select(
        "user_id", "ts", "event_id", "event_type"
    )
    stream, replay_dir = replay_dataframe(spark, ev, n_chunks=8, order_col="ts")
    out = f"{tmpdir_}/transitions_out"
    ckpt = f"{tmpdir_}/transitions_ckpt"

    def start(**trigger):
        return (
            stateful_transitions(stream)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    try:
        q = start(processingTime="300 milliseconds")
        t0 = time.time()
        while time.time() - t0 < 40 and (
            q.lastProgress is None or q.lastProgress["batchId"] < 2
        ):
            time.sleep(0.2)
        q.stop()

        q2 = start(availableNow=True)
        q2.awaitTermination(420)
        assert not q2.isActive
    finally:
        cleanup_replay(replay_dir)

    got = Counter(
        (r.prev_type, r.next_type)
        for r in spark.read.parquet(out).collect()
    )
    batch = {
        (r.prev_type, r.next_type): r.n_transitions
        for r in events_markov_transitions(spark, SF_DIR).collect()
    }
    assert dict(got) == batch


def test_rollup_mv_sink_redelivery_exactly_once(spark, tmpdir_):
    """foreachBatch is at-least-once: a re-delivered epoch must NOT
    double-merge into the rollup MV (the epoch marker commits
    atomically with the snapshot swap), while a new epoch must."""
    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import rollup_mv_sink

    ev = load_table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    mv_dir = f"{tmpdir_}/mv"
    sink = rollup_mv_sink(spark, mv_dir)

    sink(half1, 0)
    n_after_0 = {
        (r.day, r.event_type): r.n_events
        for r in spark.read.parquet(mv_dir).collect()
    }
    # crash window: epoch 0 re-delivered -> must be a no-op
    sink(half1, 0)
    again = {
        (r.day, r.event_type): r.n_events
        for r in spark.read.parquet(mv_dir).collect()
    }
    assert again == n_after_0, "re-delivered epoch double-merged"
    # new epoch merges; final MV equals the one-shot batch rollup
    sink(half2, 1)
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


def test_rollup_mv_sink_swap_window_crash_recovery(spark, tmpdir_):
    """The snapshot swap is rmtree + rename; a crash BETWEEN them
    leaves no mv_dir but a complete committed ``.next``.  Before the
    round-7 recovery step the next sink entry saw epoch -1, merged the
    re-delivered batch into an EMPTY view, and the whole MV history
    was silently lost (round-6 ADVICE, medium).  This drives both
    crash windows:

    * committed ``.next`` + missing mv_dir -> adopted, epoch preserved,
      re-delivery skipped, nothing lost;
    * uncommitted ``.next`` (no ``_epoch`` marker — crash mid-write)
      -> discarded, the live mv_dir stays authoritative.
    """
    import os
    import shutil

    from database_peak_streaming_spark.sources.batch import load_table
    from database_peak_streaming_spark.streaming.ops import rollup_mv_sink

    ev = load_table(spark, "events", "/root/testdata/sf0.001").select(
        "event_id", "ts", "event_type", "value"
    )
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    mv_dir = f"{tmpdir_}/mv"
    sink = rollup_mv_sink(spark, mv_dir)
    sink(half1, 0)
    committed = {
        (r.day, r.event_type): (r.n_events, r._dsum)
        for r in spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(mv_dir)
        .collect()
    }

    # crash window 1: epoch 0's swap completed the copy but died between
    # rmtree(mv_dir) and os.replace — simulate by moving the committed
    # snapshot to .next and re-delivering epoch 0
    os.replace(mv_dir, mv_dir + ".next")
    sink(half1, 0)  # re-delivery after the crash
    healed = {
        (r.day, r.event_type): (r.n_events, r._dsum)
        for r in spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(mv_dir)
        .collect()
    }
    assert healed == committed, "committed .next snapshot was not adopted"
    assert not os.path.exists(mv_dir + ".next")

    # crash window 2: a later write died BEFORE the _epoch marker —
    # the partial .next must be rolled back, not adopted
    os.makedirs(mv_dir + ".next")
    with open(f"{mv_dir}.next/part-zzz.parquet", "w") as f:
        f.write("garbage — no _epoch marker, must be discarded")
    sink(half2, 1)
    assert not os.path.exists(f"{mv_dir}.next/part-zzz.parquet")
    got = {
        (r.day, r.event_type): (r.n_events, r._dsum)
        for r in spark.read.option("pathGlobFilter", "*.parquet")
        .parquet(mv_dir)
        .collect()
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
