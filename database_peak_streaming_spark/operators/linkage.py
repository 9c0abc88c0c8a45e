"""Record linkage / entity resolution: blocked pairwise comparison with
an edit-distance classifier — the block -> compare -> classify pipeline
every production ER system runs (Fellegi-Sunter shape, deterministic
classifier).

Scale design: the all-pairs comparison is O(N^2) and never runs; the
block key (here a text prefix; in production a phonetic key, sorted
token prefix, or MinHash band — see operators/dedup.py for the banded
family) turns it into an equi-join whose cost is bounded by block
occupancy, exactly like the LSH band join at dedup.py.  Levenshtein is
the expensive verifier and runs ONLY inside blocks, on pairs that
already share a cheap signature.  Both engines implement the same
unit-cost edit distance, so the query carries a full DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Blocking prefix length and the relative edit-distance acceptance
#: threshold (dist <= REL_THRESHOLD * max(len)).
BLOCK_PREFIX = 20
REL_THRESHOLD = 0.25


def linkage_blocked_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match near-identical documents by exact-prefix blocking plus a
    relative Levenshtein threshold.

    Candidate generation is an equi-self-join on the first
    ``BLOCK_PREFIX`` characters — mutated copies in the fixture corpus
    share their opening (edits land throughout the body), which is the
    classic ER bet: a cheap stable key survives the noise.  Pairs are
    oriented doc_a < doc_b so each match appears once.  The verifier
    accepts when the edit distance is at most ``REL_THRESHOLD`` of the
    longer text.  Compare operators/dedup.py:142 (n-gram Jaccard) for
    the order-insensitive sibling; edit distance additionally respects
    sequence, catching reorder-sensitive corruption Jaccard forgives."""
    from database_peak_streaming_spark.sources.batch import load_table

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        "text",
        F.length("text").alias("len"),
        F.substring("text", 1, BLOCK_PREFIX).alias("block"),
    )
    a = d.select(
        F.col("block"),
        F.col("doc_id").alias("doc_a"),
        F.col("text").alias("text_a"),
        F.col("len").alias("len_a"),
    )
    b = d.select(
        F.col("block"),
        F.col("doc_id").alias("doc_b"),
        F.col("text").alias("text_b"),
        F.col("len").alias("len_b"),
    )
    pairs = a.join(b, "block").where(F.col("doc_a") < F.col("doc_b"))
    scored = pairs.select(
        "doc_a",
        "doc_b",
        "len_a",
        "len_b",
        F.levenshtein("text_a", "text_b").alias("edit_dist"),
    )
    return (
        scored.where(
            F.col("edit_dist")
            <= REL_THRESHOLD * F.greatest("len_a", "len_b")
        )
        .select(
            "doc_a",
            "doc_b",
            "edit_dist",
            F.round(
                1.0 - F.col("edit_dist") / F.greatest("len_a", "len_b"), 6
            ).alias("similarity"),
        )
        .orderBy("doc_a", "doc_b")
    )


QUERIES = {"linkage_blocked_levenshtein": linkage_blocked_levenshtein}

ORACLE_SQL = {
    "linkage_blocked_levenshtein": f"""
        WITH d AS (
            SELECT doc_id, text, LENGTH(text) AS len,
                   substr(text, 1, {BLOCK_PREFIX}) AS block
            FROM documents),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.len AS len_a, b.len AS len_b,
                   levenshtein(a.text, b.text) AS edit_dist
            FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b, CAST(edit_dist AS INT) AS edit_dist,
               ROUND(1.0 - edit_dist / GREATEST(len_a, len_b), 6)
                   AS similarity
        FROM pairs
        WHERE edit_dist <= {REL_THRESHOLD} * GREATEST(len_a, len_b)
        ORDER BY doc_a, doc_b
    """,
}
