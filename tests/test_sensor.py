"""Sensor-domain kernel tests against numpy/pure-Python oracles
(SURVEY.md §5.3/§5.5) — the reference's own math re-verified:
power cal (hyperion.py:533-540), wavelength axis (:527-531), bitmask
(:495-501), cumsum re-slice (:440-453), ts reconstruction (:418,467,547),
strain/temperature (analyze_data.py:30-41).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from database_peak_streaming_spark.functions import sensor


def test_reconstruct_timestamp(spark):
    df = spark.createDataFrame(
        [(1_700_000_000, 500_000_000), (1_700_000_001, 0)], "i long, f long"
    )
    out = df.select(
        sensor.reconstruct_timestamp(F.col("i"), F.col("f")).alias("ts"),
        F.round(sensor.epoch_seconds(F.col("i"), F.col("f")), 6).alias("es"),
    ).collect()
    assert out[0].ts == dt.datetime(2023, 11, 14, 22, 13, 20, 500000)
    assert out[0].es == 1_700_000_000.5
    assert out[1].ts == dt.datetime(2023, 11, 14, 22, 13, 21)


def test_power_calibration_matches_numpy(spark):
    counts = np.array([0, 1000, 40000, 65535], dtype=np.int64)
    inv_scale, offset = 0.001, -60.0
    df = spark.createDataFrame(
        [(counts.tolist(), inv_scale, offset)], "c array<long>, s double, o double"
    )
    out = df.select(
        sensor.power_calibration(F.col("c"), F.col("s"), F.col("o")).alias("db")
    ).collect()[0].db
    # oracle: (data * inv_scale) + offset  (hyperion.py:538)
    expected = counts * inv_scale + offset
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_wavelength_axis(spark):
    df = spark.createDataFrame([(1500.0, 0.01, 5)], "s double, i double, n int")
    out = df.select(
        sensor.wavelength_axis(F.col("s"), F.col("i"), F.col("n")).alias("wl")
    ).collect()[0].wl
    expected = 1500.0 + np.arange(5) * 0.01  # hyperion.py:527-531
    np.testing.assert_allclose(out, expected, rtol=1e-12)


def test_decode_channel_bitmask(spark):
    # 0b0000000001010010 -> channels 1, 4, 6 (hyperion.py:495-501)
    df = spark.createDataFrame([(0b1010010,), (0,), (0xFFFF,)], "bits long")
    out = df.select(
        sensor.decode_channel_bitmask(F.col("bits")).alias("ch")
    ).collect()
    assert out[0].ch == [1, 4, 6]
    assert out[1].ch == []
    assert out[2].ch == list(range(16))


def test_cumsum_and_ragged_reslice(spark):
    counts = [2, 0, 3, 1]
    flat = [10.0, 11.0, 20.0, 21.0, 22.0, 30.0]
    df = spark.createDataFrame([(counts, flat)], "c array<int>, f array<double>")
    row = df.select(
        sensor.cumsum_boundaries(F.col("c")).alias("b"),
        sensor.reslice_ragged(F.col("f"), F.col("c")).alias("slices"),
    ).collect()[0]
    assert row.b == list(np.cumsum(counts))  # hyperion.py:442
    # hyperion.py:446-453: split flat data at the boundaries
    assert row.slices == [[10.0, 11.0], [], [20.0, 21.0, 22.0], [30.0]]


def test_strain_temperature_formulas(spark):
    """analyze_data.py:37,39,41 against a pure-Python oracle."""
    gf, k, alpha, itp = sensor.GAUGE_FACTOR, 23.0, 0.55, 21.5
    wl, iwl = 1550.2, 1550.0
    df = spark.createDataFrame([(wl, iwl, itp)], "wl double, iwl double, itp double")
    total = sensor.total_strain(F.col("wl"), F.col("iwl"))
    temp = sensor.temperature(F.col("wl"), F.col("iwl"), F.col("itp"))
    row = df.select(
        total.alias("total_strain"),
        temp.alias("temperature"),
        sensor.strain(total, temp).alias("strain"),
    ).collect()[0]
    exp_total = 1e6 * ((wl - iwl) / iwl / gf)
    exp_temp = (wl - iwl) / (wl * gf * (k + alpha)) + itp
    assert abs(row.total_strain - exp_total) < 1e-9
    assert abs(row.temperature - exp_temp) < 1e-9
    assert abs(row.strain - (exp_total - exp_temp)) < 1e-9


def test_gap_fill_locf_matches_pandas_ffill(spark):
    """Per-key LOCF gap fill equals pandas resample('1h').mean().ffill()
    per key — fills never leak across keys."""
    import pandas as pd

    from database_peak_streaming_spark.functions.sensor import gap_fill_locf
    from database_peak_streaming_spark.sources.batch import load_table
    from tests.conftest import SF_DIR

    ev = (
        load_table(spark, "events", SF_DIR)
        .filter((F.col("event_type") == "error") & (F.col("user_id") % 31 == 0))
        .select((F.col("user_id") % 3).alias("series"), "ts", "value")
    )
    got = gap_fill_locf(ev, "series", "ts", "value").toPandas()
    pdf = ev.toPandas()
    assert got["was_gap"].any()  # the cohort is sparse enough to have holes
    for s, grp in pdf.groupby("series"):
        expect = (
            grp.set_index("ts")["value"]
            .resample("1h")
            .mean()
            .ffill()
        )
        g = got[got.series == s].set_index("bucket").sort_index()
        assert len(g) == len(expect)
        assert (g["filled_value"].round(9) == expect.round(9)).all()
