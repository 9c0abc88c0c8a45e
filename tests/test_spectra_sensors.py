"""Spectrum + sensor binary payload tests (SURVEY.md §1.1 payload kinds
2 and 3): decode, bitmask channel mapping, and the full spectrum
pipeline (counts -> power calibration -> wavelength axis) vs numpy."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from database_peak_streaming_spark.functions import sensor


def test_spectrum_decode_and_calibrate(spark):
    from database_peak_streaming_spark.sources.binary import (
        decode_spectrum_frames,
        encode_spectrum_frame,
    )

    rng = np.random.default_rng(99)
    bits = 0b0000000001010010  # channels 1, 4, 6 (hyperion.py:495-501)
    matrix = rng.integers(0, 65535, size=(3, 32), dtype=np.uint16)
    frame = encode_spectrum_frame(
        serial_number=555,
        timestamp_int=1_700_000_100,
        timestamp_frac=0,
        start_wavelength=1510.0,
        wavelength_increment=0.01,
        active_channel_bits=bits,
        matrix=matrix,
    )
    df = spark.createDataFrame([(1, frame)], "fid long, frame binary")
    decoded = decode_spectrum_frames(df)
    rows = decoded.orderBy("channel").collect()
    assert [r.channel for r in rows] == [1, 4, 6]
    for r, m_row in zip(rows, matrix):
        assert r.counts == m_row.astype(int).tolist()
        assert r.serial_number == 555
        assert r.ts == dt.datetime(2023, 11, 14, 22, 15, 0)

    # full P7+P8 pipeline: dBm = counts * inv_scale + offset over the
    # generated wavelength axis (hyperion.py:527-540)
    inv_scale, offset = 0.001, -60.0
    out = decoded.select(
        "channel",
        sensor.power_calibration(
            F.col("counts"), F.lit(inv_scale), F.lit(offset)
        ).alias("dbm"),
        sensor.wavelength_axis(
            F.col("start_wavelength"),
            F.col("wavelength_increment"),
            F.size("counts"),
        ).alias("wl_axis"),
    ).orderBy("channel").collect()
    for r, m_row in zip(out, matrix):
        np.testing.assert_allclose(r.dbm, m_row * inv_scale + offset, rtol=1e-12)
        np.testing.assert_allclose(
            r.wl_axis, 1510.0 + np.arange(32) * 0.01, rtol=1e-12
        )


def test_sensor_frames_roundtrip(spark):
    from database_peak_streaming_spark.sources.binary import (
        decode_sensor_frames,
        encode_sensor_frame,
    )

    values = [21.5, 22.75, -3.25, 1e6]
    frames = [
        (s, encode_sensor_frame(77, 1_700_000_000 + s, 500_000_000, values))
        for s in range(3)
    ]
    df = spark.createDataFrame(frames, "fid long, frame binary")
    rows = decode_sensor_frames(df).collect()
    assert len(rows) == 3 * len(values)
    by_ts = {}
    for r in rows:
        by_ts.setdefault(r.ts, {})[r.sensor_idx] = r.value
    assert len(by_ts) == 3
    for ts, vals in by_ts.items():
        assert ts.microsecond == 500000  # frac ns -> us
        assert [vals[i] for i in range(4)] == values
    assert all(r.serial_number == 77 for r in rows)
