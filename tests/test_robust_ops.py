"""Invariant tests for the histogram / winsorize / spelling-variant ops
beyond the value-hash differential gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.aggregates import (
    agg_histogram_fixed,
    winsorize_clip_p05_p95,
)
from database_peak_streaming_spark.operators.text import (
    vocab_spelling_variants,
)
from database_peak_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def test_histogram_partitions_the_table(spark):
    e = load_table(spark, "events", SF_DIR)
    rows = agg_histogram_fixed(spark, SF_DIR).collect()
    assert sum(r["n_events"] for r in rows) == e.count()
    for r in rows:
        assert 0 <= r["bucket"] <= 19
        assert r["bucket_hi"] - r["bucket_lo"] == 25.0
        # every bucket's sum is consistent with its bounds (top bucket
        # absorbs the tail, so no upper check there)
        assert r["sum_value"] >= r["bucket_lo"] * r["n_events"]
        if r["bucket"] < 19:
            assert r["sum_value"] <= r["bucket_hi"] * r["n_events"]


def test_winsorize_clip_fractions(spark):
    e = load_table(spark, "events", SF_DIR)
    per_group = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for r in winsorize_clip_p05_p95(spark, SF_DIR).collect():
        n = per_group[r["event_type"]]
        assert r["n_events"] == n
        # exact interpolated percentiles clip at most ceil(5% of n) rows
        # per side (values strictly beyond the p05/p95 band)
        assert r["n_clipped_lo"] <= math.ceil(0.05 * n)
        assert r["n_clipped_hi"] <= math.ceil(0.05 * n)
        assert r["min_winsorized"] <= r["mean_winsorized"] <= r["max_winsorized"]
        # clipping pulls the mean toward the band, never outside it
        assert r["min_winsorized"] >= 0.0


def test_spelling_variant_blocking_is_complete(spark):
    """FastSS delete-<=2 candidates must recover EXACTLY the brute-force
    all-pairs lev<=2 set over the vocabulary."""
    d = load_table(spark, "documents", SF_DIR)
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.length("tok") >= 4)
        .distinct()
    )
    a = vocab.select(F.col("tok").alias("tok_a"))
    b = vocab.select(F.col("tok").alias("tok_b"))
    brute = {
        (r["tok_a"], r["tok_b"], r["lev"])
        for r in a.crossJoin(b)
        .where(F.col("tok_a") < F.col("tok_b"))
        .withColumn("lev", F.levenshtein("tok_a", "tok_b").cast("long"))
        .where(F.col("lev") <= 2)
        .collect()
    }
    blocked = {
        (r["tok_a"], r["tok_b"], r["lev"])
        for r in vocab_spelling_variants(spark, SF_DIR).collect()
    }
    assert blocked == brute
    assert blocked, "fixture vocabulary should contain lev<=2 pairs"
