"""Document chunking + sequence packing for LLM training pipelines
(SURVEY.md §2B LLM-data rows; north-star mandated — no reference
counterpart, these are the corpus-shaping ops a training-data pipeline
needs between curation and the trainer).

Both ops are pure column expressions + one windowed aggregation — no
Python in the hot path:

* ``chunk_documents_overlap`` — fixed-size sliding-window chunks with
  overlap (RAG / context-window chunking).  Scan → ``sequence``-explode →
  ``slice`` projection: map-side only, ZERO shuffles; a 100 TB corpus
  chunks at scan speed with fan-out ~n_tokens/stride per doc.
* ``pack_sequences_greedy`` — concat-and-split sequence packing (the
  GPT-style "pack documents into fixed token-budget training rows").
  Packing is inherently sequential in the concatenation order, so we
  shard the corpus by a deterministic key and pack WITHIN shards: each
  shard is one window partition, shards run in parallel, and at 100 TB
  you raise ``PACK_SHARDS`` (e.g. 4096) so no executor ever sees more
  than one shard's doc-id+count pairs (narrow rows — the window carries
  token COUNTS, never text).  The md5 concatenation order makes the
  exact packing engine- and partitioning-independent (same property as
  operators/sampling.py's md5 splits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table

#: Chunk geometry: 32-token windows advancing 24 tokens (8-token overlap).
#: Fixture docs are <=99 whitespace tokens, so every size band (0, 1 and
#: several chunks) is exercised; production values (512/448 etc.) only
#: change the literals.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

#: Packing geometry: 256-token training rows, 8 parallel packing shards.
PACK_BUDGET = 256
PACK_SHARDS = 8


def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: every doc becomes ceil(n/stride) chunks of
    up to CHUNK_TOKENS whitespace tokens, consecutive chunks overlapping
    by CHUNK_TOKENS - CHUNK_STRIDE tokens.

    Emits a chunk fingerprint (md5 of the re-joined token slice) rather
    than the chunk text so the result stays narrow; the fingerprint is
    also what a downstream chunk-level dedup would key on.
    """
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    t = d.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))
    s = t.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("chunk_start"),
    )
    chunk = F.slice(s["toks"], F.col("chunk_start") + 1, F.lit(CHUNK_TOKENS))
    return (
        s.select(
            "doc_id",
            (F.col("chunk_start") / CHUNK_STRIDE).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n") - F.col("chunk_start")
            ).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing: concatenate docs in a
    deterministic (md5) order within PACK_SHARDS parallel shards, then
    cut every PACK_BUDGET tokens; a doc belongs to the training row its
    FIRST token lands in (straddlers spill into the next row, counted).

    Returns one row per (shard, seq) training row with its doc count,
    token fill, and straddler count — the packing manifest a trainer's
    data loader materializes.
    """
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.col("doc_id") % PACK_SHARDS).cast("int").alias("shard_id"),
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("ord_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = t.select(
        "shard_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("offset"),
    ).select(
        "shard_id",
        "n_tokens",
        F.floor(F.col("offset") / PACK_BUDGET).cast("long").alias("seq_id"),
        (
            F.col("offset") + F.col("n_tokens")
            > (F.floor(F.col("offset") / PACK_BUDGET) + 1) * PACK_BUDGET
        ).alias("straddles"),
    )
    return (
        placed.groupBy("shard_id", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.col("straddles").cast("long")).alias("n_straddlers"),
        )
        .orderBy("shard_id", "seq_id")
    )


#: shard count for the training-layout manifest (production: O(10^4)
#: shards so each is one worker's streaming read).
LAYOUT_SHARDS = 16


def training_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE + sharding — the step between a
    curated corpus and the trainer's data loader: every epoch must read
    the docs in a fixed pseudo-random order, resumable from any step,
    identical no matter how the corpus was partitioned when written.

    Content-stable layout: shard = md5(doc_id) bucket (NOT doc_id % k —
    consecutive ids land together and training order would correlate
    with crawl order), position within shard = rank of a SECOND
    independent md5.  Both keys derive from content ids, so re-running
    on a re-partitioned copy of the corpus yields byte-identical
    shards — the reproducibility property checkpoint-resume needs.

    Output is the per-shard MANIFEST (row counts, token volume, the
    layout fingerprint): shard assignment is map-only, the intra-shard
    rank is a shard-local window (parallel across shards), and only
    manifest rows leave the shuffle — the full (doc -> position) table
    is written as shard-partitioned parquet at production scale, never
    collected."""
    d = load_table(spark, "documents", sf_dir)
    shard_key = F.md5(F.concat(F.lit("shard#"), F.col("doc_id").cast("string")))
    pos_key = F.md5(F.concat(F.lit("pos#"), F.col("doc_id").cast("string")))
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        (
            F.conv(F.substring(shard_key, 1, 13), 16, 10).cast("bigint")
            % LAYOUT_SHARDS
        ).cast("int").alias("shard_id"),
        pos_key.alias("pos_key"),
    )
    w = Window.partitionBy("shard_id").orderBy("pos_key", "doc_id")
    placed = t.withColumn("position", F.row_number().over(w).cast("long"))
    return (
        placed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("doc_id").alias("id_checksum"),
            # order-sensitive fingerprint: md5 of the position-ordered
            # doc-id stream — equal iff the LAYOUT (not just membership)
            # is reproduced
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("position", "doc_id"))
                        ),
                        lambda s: s["doc_id"].cast("string"),
                    ),
                )
            ).alias("layout_fp"),
        )
        .orderBy("shard_id")
    )


QUERIES = {
    "chunk_documents_overlap": chunk_documents_overlap,
    "pack_sequences_greedy": pack_sequences_greedy,
    "training_shard_layout": training_shard_layout,
}

ORACLE_SQL = {
    "training_shard_layout": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(('0x' || SUBSTR(MD5('shard#' ||
                        CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                        % {LAYOUT_SHARDS} AS INT) AS shard_id,
                   MD5('pos#' || CAST(doc_id AS VARCHAR)) AS pos_key
            FROM documents)
        SELECT shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
               MD5(STRING_AGG(CAST(doc_id AS VARCHAR), ','
                              ORDER BY pos_key, doc_id)) AS layout_fp
        FROM t
        GROUP BY shard_id
        ORDER BY shard_id
    """,
    # DuckDB lists are 1-indexed and list_slice's end is inclusive;
    # range(0, n, s) matches Spark's sequence(0, n-1, s) for n >= 1
    # (split(' ') never yields an empty list, so n >= 1 always).
    "chunk_documents_overlap": f"""
        WITH t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
                   LEN(STRING_SPLIT(text, ' ')) AS n
            FROM documents),
        s AS (
            SELECT doc_id, toks, n,
                   UNNEST(RANGE(0, n, {CHUNK_STRIDE})) AS chunk_start
            FROM t)
        SELECT doc_id,
               CAST(chunk_start / {CHUNK_STRIDE} AS INT) AS chunk_idx,
               CAST(chunk_start AS BIGINT) AS chunk_start,
               CAST(LEAST({CHUNK_TOKENS}, n - chunk_start) AS BIGINT)
                   AS n_chunk_tokens,
               MD5(ARRAY_TO_STRING(
                   LIST_SLICE(toks, chunk_start + 1,
                              LEAST(chunk_start + {CHUNK_TOKENS}, n)),
                   ' ')) AS chunk_fp
        FROM s
        ORDER BY doc_id, chunk_idx
    """,
    "pack_sequences_greedy": f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(doc_id % {PACK_SHARDS} AS INT) AS shard_id,
                   MD5(CAST(doc_id AS VARCHAR)) AS ord_key
            FROM documents),
        placed AS (
            SELECT shard_id, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY shard_id ORDER BY ord_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - n_tokens AS "offset"
            FROM t)
        SELECT shard_id,
               CAST(FLOOR("offset" / {PACK_BUDGET}) AS BIGINT) AS seq_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN "offset" + n_tokens >
                        (FLOOR("offset" / {PACK_BUDGET}) + 1) * {PACK_BUDGET}
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
        FROM placed
        GROUP BY shard_id, seq_id
        ORDER BY shard_id, seq_id
    """,
}
