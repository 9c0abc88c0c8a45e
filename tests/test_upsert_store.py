"""KeyedUpsertStore: exactly-once streaming MERGE with snapshot
isolation and time travel, proven against the batch oracle and under
crash injection."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-upsert-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark):
    from database_peak_streaming_spark.sources.batch import load_table

    # user ts values are unique per user in the fixture, which makes
    # max_by(value, ts) well-defined for the batch oracle
    return (
        load_table(spark, "events", SF_DIR)
        .select("user_id", "ts", "value")
        .filter(F.col("user_id") < 50)
    )


def _batch_oracle(spark):
    ev = _events(spark)
    return {
        r["user_id"]: (r["n_events"], r["last_value"], r["last_ts"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max_by("value", "ts").alias("last_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }


def _state_dict(df):
    return {
        r["user_id"]: (r["n_events"], r["last_value"], r["last_ts"])
        for r in df.collect()
    }


def test_streaming_upsert_matches_batch_state(spark, tmpdir_):
    from database_peak_streaming_spark.streaming.replay import (
        cleanup_replay,
        replay_dataframe,
    )
    from database_peak_streaming_spark.streaming.upsert import KeyedUpsertStore

    stream, replay_dir = replay_dataframe(
        spark, _events(spark), n_chunks=5, order_col="ts"
    )
    store = KeyedUpsertStore(spark, f"{tmpdir_}/state")
    try:
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(store.foreach_batch())
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(420)
        assert not q.isActive
    finally:
        cleanup_replay(replay_dir)

    assert _state_dict(store.read_latest()) == _batch_oracle(spark)
    # time travel: an earlier retained snapshot is a strict prefix state
    versions = store.versions()
    assert len(versions) >= 2
    early = _state_dict(store.read_version(versions[0]))
    late = _batch_oracle(spark)
    assert all(early[k][0] <= late[k][0] for k in early)
    # prune keeps the committed snapshot readable
    store.prune(keep=2)
    assert _state_dict(store.read_latest()) == late


def test_upsert_epoch_redelivery_and_crash(spark, tmpdir_):
    """Exactly-once under foreachBatch's at-least-once: re-delivered
    epochs are no-ops, and a crash AFTER the snapshot write but BEFORE
    the pointer flip re-merges from the previous committed snapshot."""
    from database_peak_streaming_spark.streaming.upsert import KeyedUpsertStore

    ev = _events(spark).orderBy("ts").limit(200).cache()
    first, second = ev.limit(100), ev.subtract(ev.limit(100))
    store = KeyedUpsertStore(spark, f"{tmpdir_}/state")

    store.upsert_epoch(first, epoch_id=0)
    s0 = _state_dict(store.read_latest())
    store.upsert_epoch(first, epoch_id=0)  # re-delivery: no-op
    assert _state_dict(store.read_latest()) == s0

    store.upsert_epoch(second, epoch_id=1)
    s1 = _state_dict(store.read_latest())
    assert sum(v[0] for v in s1.values()) == 200

    # crash injection: snapshot v_2 written, pointer still at 1
    store.upsert_epoch(second, epoch_id=2)  # double-apply attempt...
    Path(f"{tmpdir_}/state/_latest").write_text("1")  # ...crashed pre-flip
    store.upsert_epoch(second, epoch_id=2)  # re-delivery
    got = _state_dict(store.read_latest())
    assert sum(v[0] for v in got.values()) == 300, (
        "retry must re-merge from v_1, not double-apply onto the "
        "uncommitted v_2"
    )
