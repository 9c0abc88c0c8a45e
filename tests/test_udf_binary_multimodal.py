"""Tests: UDF surface, binary frame decode (S4), multimodal plumbing."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_pandas_udf_scalar_matches_builtin(spark):
    from database_peak_streaming_spark.functions.udfs import log1p_row_udf, log1p_vec
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", SF_DIR).limit(500)
    rows = o.select(
        F.log1p("o_totalprice").alias("builtin"),
        log1p_vec("o_totalprice").alias("vec"),
        log1p_row_udf("o_totalprice").alias("row"),
    ).collect()
    for r in rows:
        assert abs(r.builtin - r.vec) < 1e-12
        assert abs(r.builtin - r.row) < 1e-12


def test_grouped_agg_pandas_udf(spark):
    from database_peak_streaming_spark.functions.udfs import weighted_mean_grouped
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", SF_DIR)
    got = {
        r.l_returnflag: r.wm
        for r in li.groupBy("l_returnflag")
        .agg(weighted_mean_grouped("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    }
    pdf = li.select("l_returnflag", "l_extendedprice", "l_quantity").toPandas()
    for flag, g in pdf.groupby("l_returnflag"):
        expected = np.average(g.l_extendedprice, weights=g.l_quantity)
        assert abs(got[flag] - expected) < 1e-6


def test_apply_in_pandas_zscore(spark):
    from database_peak_streaming_spark.functions.udfs import zscore_by_group
    from database_peak_streaming_spark.sources.batch import load_table

    c = load_table(spark, "customer", SF_DIR)
    out = zscore_by_group(c, "c_mktsegment", "c_acctbal")
    pdf = out.toPandas()
    for seg, g in pdf.groupby("c_mktsegment"):
        # z-scores are mean-0, std-1 per group
        assert abs(g.zscore.mean()) < 1e-9
        assert abs(g.zscore.std(ddof=1) - 1.0) < 1e-9
    # window-function oracle for one row
    ora = c.selectExpr(
        "c_custkey",
        "(c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_mktsegment))"
        " / stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment) AS z",
    ).collect()
    ora_d = {r.c_custkey: r.z for r in ora}
    for _, row in pdf.iterrows():
        assert abs(ora_d[row.c_custkey] - row.zscore) < 1e-9


def test_binary_peaks_frame_roundtrip(spark):
    """Encode reference-format frames (hyperion.py:432-453 layout), decode
    distributed, compare to the known payload."""
    from database_peak_streaming_spark.sources.binary import (
        decode_peaks_frames,
        encode_peaks_frame,
    )

    counts = [2, 0, 3, 1, 0, 0, 0, 0]
    wls = [1500.1, 1500.2, 1510.1, 1510.2, 1510.3, 1520.5]
    frames = [
        (
            s,
            encode_peaks_frame(
                serial_number=424242,
                timestamp_int=1_700_000_000 + s,
                timestamp_frac=250_000_000,
                counts=counts,
                wavelengths=[w + s for w in wls],
            ),
        )
        for s in range(5)
    ]
    df = spark.createDataFrame(frames, "scan long, frame binary")
    out = decode_peaks_frames(df, num_channels=8).collect()
    assert len(out) == 5 * len(wls)
    first_scan = sorted(
        [r for r in out if r.ts == dt.datetime(2023, 11, 14, 22, 13, 20, 250000)],
        key=lambda r: (r.channel, r.peak_idx),
    )
    assert [r.channel for r in first_scan] == [1, 1, 3, 3, 3, 4]
    assert [round(r.wavelength, 4) for r in first_scan] == wls
    assert all(r.serial_number == 424242 for r in out)


def test_multimodal_pipeline_with_fake_codec(spark):
    from database_peak_streaming_spark.functions.multimodal import (
        extract_features,
        fake_codec,
        filter_by_meta,
        real_codec,
        synth_items,
    )

    items = synth_items(spark, n=64)
    kept = filter_by_meta(items, min_width=128, media_type="image/png")
    assert 0 < kept.count() < 64
    feats = extract_features(kept, codec=fake_codec, dim=32).collect()
    assert len(feats) == kept.count()
    assert all(len(r.feature) == 32 for r in feats)
    # determinism: same payload -> same sha + feature
    again = extract_features(kept, codec=fake_codec, dim=32).collect()
    assert sorted((r.item_id, r.sha) for r in feats) == sorted(
        (r.item_id, r.sha) for r in again
    )
    # real codec is an explicit stub
    with pytest.raises(Exception) as ei:
        extract_features(kept.limit(1), codec=real_codec).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_bmp_roundtrip_pixel_exact():
    """encode_bmp -> decode_bmp recovers pixels exactly (row order,
    channel order, 4-byte padding all undone)."""
    from database_peak_streaming_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # odd widths pad
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_golden_bytes_layout():
    """Decode a hand-assembled file (not via encode_bmp) so an
    encoder/decoder bug pair cannot cancel: 2x1 24-bit BMP, bottom-up,
    BGR — file row 0 is the BOTTOM image row."""
    import struct

    from database_peak_streaming_spark.functions.multimodal import decode_bmp

    # bottom row pixel = RGB(1,2,3), top row pixel = RGB(9,8,7)
    data = bytes([3, 2, 1, 0]) + bytes([7, 8, 9, 0])  # BGR + row pad to 4
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, 1, 2, 1, 24, 0, len(data), 0, 0, 0, 0,
    )
    img = decode_bmp(header + data)
    assert img.shape == (2, 1, 3)
    assert img[0, 0].tolist() == [9, 8, 7]  # top-down output
    assert img[1, 0].tolist() == [1, 2, 3]
    # negative height = top-down file: same bytes, no flip
    header_td = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, 1, -2, 1, 24, 0, len(data), 0, 0, 0, 0,
    )
    img_td = decode_bmp(header_td + data)
    assert img_td[0, 0].tolist() == [1, 2, 3]


def test_ppm_decode_with_comments():
    from database_peak_streaming_spark.functions.multimodal import (
        decode_ppm,
        real_codec,
    )

    body = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n2 2\n255\n" + body
    img = decode_ppm(payload)
    assert img.shape == (2, 2, 3)
    assert img.reshape(-1).tolist() == list(body)
    assert np.array_equal(real_codec(payload), img)  # dispatch


def test_codec_error_paths():
    import pytest as _pytest

    from database_peak_streaming_spark.functions.multimodal import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        real_codec,
    )

    with _pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 100)  # bad header size / bpp
    with _pytest.raises(ValueError):
        decode_ppm(b"P6 2 2 255 ")  # truncated body
    with _pytest.raises(NotImplementedError):
        real_codec(b"\x89PNG\r\n")  # compressed formats stay injected
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    truncated = encode_bmp(px)[:-1]
    with _pytest.raises(ValueError):
        decode_bmp(truncated)


def test_extract_features_with_real_codec_bmp(spark):
    """The real_codec path now runs end-to-end on BMP payloads — the
    former always-raises stub only applies to compressed formats."""
    from database_peak_streaming_spark.functions.multimodal import (
        IMAGE_META_SCHEMA,
        encode_bmp,
        extract_features,
    )

    rng = np.random.default_rng(11)
    rows = []
    for i in range(8):
        px = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        payload = encode_bmp(px)
        rows.append((i, "image/bmp", 4, 4, len(payload), payload))
    items = spark.createDataFrame(rows, schema=IMAGE_META_SCHEMA)
    feats = extract_features(items, dim=16).collect()  # default real_codec
    assert len(feats) == 8
    assert all(len(r.feature) == 16 for r in feats)
