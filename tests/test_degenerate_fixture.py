"""Degenerate-corpus regression tests (round-6 VERDICT task 7).

Round 5 fixed two fixture-shape hazards — the multimodal oracle's
``list_reduce`` raising on an nf=0 (empty-payload) document, and
``ab_test_lift_ztest``'s arm crossJoin returning 0 rows when an arm is
empty — but no test would catch either regressing on a future fixture.
These tests BUILD the degenerate fixture: a documents table containing
an empty-text doc and an events table whose users all land in one arm,
then run query and oracle side-by-side on it.  Reverting either
round-5 fix makes the corresponding test fail (the oracle raises /
the row counts diverge), which is the red-bar the VERDICT asked for.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from database_peak_streaming_spark.harness.diff import (
    diff_query,
    oracle_connection,
)
from database_peak_streaming_spark.sources.batch import TABLES, load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """sf0.001 with documents ∪ {empty-text doc} and events restricted
    to arm-0 users (user_id % 2 == 0); every other table symlinked."""
    d = tmp_path_factory.mktemp("degenerate-fixture")
    for t in TABLES:
        if t in ("documents", "events"):
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")

    docs = load_table(spark, "documents", SF_DIR)
    empty_doc = docs.agg(
        *[
            (F.max("doc_id") + 1).alias("doc_id")
            if f.name == "doc_id"
            else (
                F.lit("").alias("text")
                if f.name == "text"
                else F.first(f.name, ignorenulls=True).alias(f.name)
            )
            for f in docs.schema.fields
        ]
    ).select(*docs.columns)
    docs.unionByName(empty_doc).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )

    ev = load_table(spark, "events", SF_DIR)
    ev.where(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    return str(d)


def _check(spark, degenerate_dir, name):
    from database_peak_streaming_spark.registry import ORACLE_SQL, QUERIES

    con = oracle_connection(degenerate_dir)
    res = diff_query(
        name, QUERIES[name](spark, degenerate_dir), ORACLE_SQL[name], con
    )
    assert res.ok, res.describe()
    return res


def test_multimodal_frame_sample_handles_empty_payload(
    spark, degenerate_dir
):
    """nf = 0 guard: the empty-text doc must flow through both the
    Spark kernel (hash of b'') and the oracle's CASE guard — without
    the guard DuckDB's list_reduce raises on the empty frame list."""
    res = _check(spark, degenerate_dir, "multimodal_frame_sample")
    # the degenerate doc is actually present and exercised
    assert res.engine_rows == res.oracle_rows > 1


def test_multimodal_audio_energy_handles_empty_payload(
    spark, degenerate_dir
):
    """Zero-window guard: the empty-text doc must emit the sentinel row
    (0 windows, 0.0 energies, peak -1) from the kernel AND survive the
    oracle's LEFT JOIN + COALESCE back to documents — an inner join or
    a non-total kernel would drop or crash on it."""
    res = _check(spark, degenerate_dir, "multimodal_audio_window_energy")
    assert res.engine_rows == res.oracle_rows > 1


def test_ab_test_single_arm_yields_null_row(spark, degenerate_dir):
    """Single-arm corpus: the conditional rollup must return ONE row
    with NULL B-arm stats, exactly like the oracle's scalar subqueries
    — the pre-fix crossJoin of two filtered arms returned 0 rows."""
    res = _check(spark, degenerate_dir, "ab_test_lift_ztest")
    assert res.engine_rows == res.oracle_rows == 1


@pytest.mark.parametrize(
    "name",
    [
        # round-9 document-pipeline ops: the empty-text doc must flow
        # through tokenize/score/classify identically in both engines
        "corpus_perplexity_gate",
        "ml_naive_bayes_langid",
        "dedup_threshold_sweep",
        "dedup_minhash_recall_audit",
        # round-9 event ops on the single-arm (even-user) event log
        "stats_welch_ttest",
        "stats_power_mde",
        "events_sequence_regex",
        "ts_sax_motifs",
        "ts_stl_residual_outliers",
        "ab_bandit_ucb",
        "join_scd2_point_in_time",
        "resample_interpolate_linear",
    ],
)
def test_round9_ops_survive_degenerate_fixture(spark, degenerate_dir, name):
    """Round-9 operators keep engine==oracle on the degenerate corpus
    (empty-text document; user-parity-restricted events).  Divergent
    empty-string tokenization or a non-total kernel shows up as a hash
    mismatch or a raise here before it can show up on a driver
    fixture."""
    _check(spark, degenerate_dir, name)


@pytest.mark.parametrize(
    "name",
    [
        # round-11 document ops: the empty-text doc must decode to an
        # empty PCM stream / a 1-token zero-segment MSTTR row in both
        # engines
        "multimodal_wav_pcm_decode",
        "text_msttr_diversity",
        # round-11 event ops on the single-arm (even-user) event log:
        # shorter daily series (theta/pinball eligibility filters),
        # fewer type pairs, sparser paths and CEP traces
        "ts_theta_method",
        "forecast_pinball_quantile",
        "stats_cliffs_delta_matrix",
        "events_path_edit_distance",
        "events_cep_pattern_matches",
    ],
)
def test_round11_ops_survive_degenerate_fixture(spark, degenerate_dir, name):
    """Round-11 operators keep engine==oracle on the degenerate corpus
    (empty-text document; user-parity-restricted events)."""
    _check(spark, degenerate_dir, name)
