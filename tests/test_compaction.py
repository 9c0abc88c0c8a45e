"""Compaction test: many epoch files collapse to one per partition with
identical content."""

from __future__ import annotations

import datetime as dt
import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-compact-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_compact_st_preserves_content(spark, tmpdir_):
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    store = TieredStore(spark, f"{tmpdir_}/tiers")
    t0 = dt.datetime(2024, 8, 1)
    # 6 epochs -> 6+ files in one date partition
    for epoch in range(6):
        batch = spark.createDataFrame(
            [
                (t0 + dt.timedelta(seconds=epoch * 10 + i), 1, i, 1500.0 + i, 1)
                for i in range(4)
            ],
            "window_start timestamp, channel int, peak_idx int,"
            " mean_wavelength double, n_samples long",
        )
        store.write_epoch(batch, epoch_id=epoch)

    before = store.read_st().orderBy("window_start", "peak_idx").collect()
    n_files_before = len(glob.glob(f"{store.st_path}/date=*/*.parquet"))
    assert n_files_before >= 6

    done = store.compact_st(target_files_per_date=1)
    assert done == {"date=2024-08-01": n_files_before}

    n_files_after = len(glob.glob(f"{store.st_path}/date=*/*.parquet"))
    assert n_files_after == 1
    after = store.read_st().orderBy("window_start", "peak_idx").collect()
    assert after == before

    # idempotent: already-compacted partitions are skipped
    assert store.compact_st(target_files_per_date=1) == {}


def test_compact_default_sizes_from_bytes(spark, tmpdir_):
    """With no explicit target, the per-partition file count derives
    from partition bytes / target_file_bytes — a tiny partition lands on
    exactly 1 file; an artificially small target_file_bytes forces >1."""
    store, before = _seeded_store(spark, f"{tmpdir_}/tiers")
    done = store.compact_st()  # bytes << 128 MiB -> 1 file
    assert done
    assert len(glob.glob(f"{store.st_path}/date=*/*.parquet")) == 1
    after = store.read_st().orderBy("window_start", "peak_idx").collect()
    assert after == before


def _seeded_store(spark, root):
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    store = TieredStore(spark, root)
    t0 = dt.datetime(2024, 8, 1)
    for epoch in range(3):
        batch = spark.createDataFrame(
            [
                (t0 + dt.timedelta(seconds=epoch * 10 + i), 1, i, 1500.0 + i, 1)
                for i in range(4)
            ],
            "window_start timestamp, channel int, peak_idx int,"
            " mean_wavelength double, n_samples long",
        )
        store.write_epoch(batch, epoch_id=epoch)
    return store, store.read_st().orderBy("window_start", "peak_idx").collect()


def test_compact_crash_after_stage_write(spark, tmpdir_):
    """Crash between swap steps 1 and 2: tmp dir fully written, live
    partition untouched.  Recovery must discard the tmp dir and the next
    compaction must succeed with identical content."""
    from pathlib import Path

    store, before = _seeded_store(spark, f"{tmpdir_}/tiers")
    st = Path(store.st_path)
    part = st / "date=2024-08-01"
    tmp = st / f"_compact_tmp_{part.name}"
    store.read_st().coalesce(1).write.parquet(str(tmp))  # simulated step 1

    done = store.compact_st(target_files_per_date=1)
    assert done, "partition should still need compaction"
    assert not tmp.exists()
    after = store.read_st().orderBy("window_start", "peak_idx").collect()
    assert after == before


def test_compact_crash_between_renames(spark, tmpdir_):
    """Crash between swap steps 2 and 3 — the window the unlink-first
    design lost data in: live partition renamed away, tmp not yet
    promoted.  Recovery must restore the trash dir (old data is never
    unlinked before the replacement is live)."""
    from pathlib import Path

    store, before = _seeded_store(spark, f"{tmpdir_}/tiers")
    st = Path(store.st_path)
    part = st / "date=2024-08-01"
    tmp = st / f"_compact_tmp_{part.name}"
    trash = st / f"_compact_trash_{part.name}"
    store.read_st().coalesce(1).write.parquet(str(tmp))  # step 1
    part.rename(trash)  # step 2, then crash

    store.compact_st(target_files_per_date=1)
    assert not trash.exists() and not tmp.exists()
    after = store.read_st().orderBy("window_start", "peak_idx").collect()
    assert after == before


def test_compact_crash_before_trash_delete(spark, tmpdir_):
    """Crash between swap steps 3 and 4: compacted data live, old data
    still in trash.  Recovery must drop the trash without doubling rows
    (Spark already ignores the _-prefixed dir on read)."""
    from pathlib import Path

    store, before = _seeded_store(spark, f"{tmpdir_}/tiers")
    st = Path(store.st_path)
    part = st / "date=2024-08-01"
    tmp = st / f"_compact_tmp_{part.name}"
    trash = st / f"_compact_trash_{part.name}"
    compacted = store.read_st().coalesce(1)
    compacted.write.parquet(str(tmp))  # step 1
    part.rename(trash)  # step 2
    tmp.rename(part)  # step 3, then crash

    assert store.compact_st(target_files_per_date=1) == {}  # already 1 file
    assert not trash.exists()
    after = store.read_st().orderBy("window_start", "peak_idx").collect()
    assert after == before
