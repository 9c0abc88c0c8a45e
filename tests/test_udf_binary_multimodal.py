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
