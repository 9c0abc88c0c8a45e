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
