"""Live-mode pipeline test: rate-source peaks through the tiered
pipeline with a processing-time trigger — the production shape (A1's
~100 ms cadence), bounded by A7-style stop.  Also documents measured
micro-batch cadence (BASELINE.md: 'document measured minimum trigger
latency')."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-live-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_live_rate_pipeline_processing_time(spark, tmpdir_):
    from database_peak_streaming_spark.streaming.pipeline import PeaksPipeline
    from database_peak_streaming_spark.streaming.replay import rate_peaks_stream
    from database_peak_streaming_spark.streaming.tiering import TieredStore

    stream = rate_peaks_stream(spark, rows_per_second=20, num_channels=2, num_peaks=2)
    store = TieredStore(spark, f"{tmpdir_}/tiers")
    pipe = PeaksPipeline(
        spark, store, window_length="500 milliseconds", watermark_delay="1 second"
    )
    # state sized to the stream (4 series -> a handful of windows per
    # epoch): 64 default partitions would pay 64 empty state commits
    # per 500 ms trigger and stall the cadence on a loaded box (same
    # decomposition as bench.py:514)
    q = pipe.start(
        stream,
        f"{tmpdir_}/ckpt",
        {"processingTime": "500 milliseconds"},
        state_partitions=4,
    )
    try:
        # run live ~12 s: enough for several windows to close past the
        # watermark and flush epochs to the store
        t0 = time.time()
        while time.time() - t0 < 12 and not pipe.epochs_seen:
            time.sleep(0.5)
        time.sleep(8)
    finally:
        q.stop()  # A7: bounded stream lifetime

    assert len(pipe.epochs_seen) >= 3, "multiple live epochs should commit"
    st = store.read_st()
    rows = st.collect()
    assert rows, "closed windows must be persisted while the stream runs"
    # per-window series complete: every persisted window has all 4 series
    per_window = {}
    for r in rows:
        per_window.setdefault(r.window_start, set()).add((r.channel, r.peak_idx))
    assert all(len(s) == 4 for s in per_window.values())
    # deterministic wavelength function: mean of a constant-per-series
    # value equals that value (sin term varies < 0.01, tolerance 0.05)
    for r in rows:
        expected = 1500.0 + r.channel * 10 + r.peak_idx
        assert abs(r.mean_wavelength - expected) < 0.05
