"""Invariant tests for document chunking and sequence packing
(operators/chunking.py) beyond the value-hash differential gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    PACK_SHARDS,
    chunk_documents_overlap,
    pack_sequences_greedy,
)
from database_peak_streaming_spark.sources.batch import load_table
from tests.conftest import SF_DIR


def _doc_token_counts(spark):
    d = load_table(spark, "documents", SF_DIR)
    return {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }


def test_chunk_geometry(spark):
    """Per doc: chunk count = ceil(n/stride), indices contiguous from 0,
    starts at idx*stride, sizes in [1, CHUNK] with only the tail short."""
    counts = _doc_token_counts(spark)
    rows = chunk_documents_overlap(spark, SF_DIR).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(counts)
    for doc_id, chunks in by_doc.items():
        n = counts[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert len(chunks) == math.ceil(n / CHUNK_STRIDE)
        for k, c in enumerate(chunks):
            assert c["chunk_idx"] == k
            assert c["chunk_start"] == k * CHUNK_STRIDE
            expect = min(CHUNK_TOKENS, n - k * CHUNK_STRIDE)
            assert c["n_chunk_tokens"] == expect
            assert 1 <= c["n_chunk_tokens"] <= CHUNK_TOKENS


def test_chunk_overlap_covers_doc(spark):
    """Consecutive chunks overlap by CHUNK-STRIDE tokens and the last
    chunk reaches the final token, so the union of chunk spans is exactly
    [0, n) with no gaps."""
    counts = _doc_token_counts(spark)
    agg = (
        chunk_documents_overlap(spark, SF_DIR)
        .groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("end"),
            F.max("chunk_start").alias("last_start"),
        )
        .collect()
    )
    for r in agg:
        n = counts[r["doc_id"]]
        assert r["end"] == n  # last chunk reaches the end
        # consecutive starts differ by STRIDE < CHUNK -> no gap possible
        assert r["last_start"] < n


def test_pack_conserves_docs_and_tokens(spark):
    counts = _doc_token_counts(spark)
    bins = pack_sequences_greedy(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in bins) == len(counts)
    assert sum(r["n_tokens"] for r in bins) == sum(counts.values())
    for r in bins:
        assert 0 <= r["shard_id"] < PACK_SHARDS
        assert r["seq_id"] >= 0
        assert 0 <= r["n_straddlers"] <= r["n_docs"]


def test_pack_bins_contiguous_and_filled(spark):
    """With every fixture doc shorter than the budget, the per-shard
    concatenation crosses each budget boundary inside some doc, so
    seq_ids are contiguous and every non-final bin's fill reaches the
    budget minus the largest doc (a bin only closes when the next doc
    would start past its boundary)."""
    counts = _doc_token_counts(spark)
    assert max(counts.values()) < PACK_BUDGET
    bins = pack_sequences_greedy(spark, SF_DIR).collect()
    by_shard: dict[int, list] = {}
    for r in bins:
        by_shard.setdefault(r["shard_id"], []).append(r)
    max_doc = max(counts.values())
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["seq_id"])
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        # running offsets: bin b holds docs whose start is in
        # [b*BUDGET, (b+1)*BUDGET) -> its token fill is at least
        # BUDGET - start_slack and at most BUDGET + straddler spill.
        for r in rows[:-1]:
            assert r["n_tokens"] > PACK_BUDGET - max_doc
            assert r["n_tokens"] < PACK_BUDGET + max_doc


def test_chunk_geometry_property_random_docs(spark):
    """Hypothesis-style geometry check over random token counts (driven
    through the REAL Spark kernel once, not per-example — Spark startup
    makes per-example @given runs impractical): for every token count
    1..300, chunk count, starts, and sizes must satisfy the closed-form
    geometry."""
    import math

    from pyspark.sql import types as T

    docs = spark.createDataFrame(
        [(n, " ".join("w%d" % i for i in range(n))) for n in range(1, 301)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    toks = F.split(F.col("text"), " ")
    s = docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_start"),
        F.size(toks).alias("n"),
    )
    rows = s.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_start").alias("last_start"),
        F.first("n").alias("n"),
    ).collect()
    assert len(rows) == 300
    for r in rows:
        n = r["doc_id"]  # doc_id IS the token count by construction
        assert r["n"] == n
        assert r["n_chunks"] == math.ceil(n / CHUNK_STRIDE)
        assert r["last_start"] == (r["n_chunks"] - 1) * CHUNK_STRIDE
        assert r["last_start"] < n  # last chunk is non-empty
