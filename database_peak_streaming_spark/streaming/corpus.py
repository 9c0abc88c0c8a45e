"""Streaming corpus ingestion — the CONTINUOUS form of the curation
funnel (operators/curation.py): documents arrive as a stream, pass the
same quality gate, and are exact-deduplicated on a content hash with
watermark-bounded state, then append to a curated store.

This is what a training-data pipeline actually runs day to day: the
batch funnel curates the historical corpus once; this path keeps the
curated store current as new crawl/ingest batches land, without ever
re-reading the corpus.  Both share one quality definition
(``operators.curation.quality_score_col``) so stream == batch is an
invariant, not a coincidence (asserted in tests/test_corpus_stream.py).

Scale design:

* The dedup key is ``sha2(text, 256)`` — 32 bytes per document in the
  state store regardless of document size; documents themselves are
  never held in state.
* ``dropDuplicatesWithinWatermark`` scopes state to the watermark
  horizon: a duplicate arriving within ``dedup_horizon`` of the
  original is dropped, and state older than the horizon is evicted.
  Unbounded-retention exact dedup across the WHOLE corpus is the batch
  funnel's job (or a stream-static anti-join against the curated
  store's hash index — ``anti_join_existing``); holding every hash
  forever in streaming state is exactly the unbounded-buffer mistake
  the reference made with its in-process lists
  (database_peak_streaming.py:33-36, grown per batch, bounded only by
  process death).
* The quality gate runs BEFORE the stateful dedup, so rejected
  documents never enter the state store — same stage ordering as the
  batch funnel, same reason: prune before the expensive operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.curation import (
    QUALITY_CUTOFF,
    quality_score_col,
)


def quality_gate(docs: DataFrame) -> DataFrame:
    """Filter to quality-passing documents — identical expression to the
    batch funnel's stage 1 (works on batch AND streaming frames)."""
    return docs.filter(quality_score_col() > QUALITY_CUTOFF)


def streaming_curate(
    docs: DataFrame,
    ts_col: str = "arrival_ts",
    dedup_horizon: str = "10 minutes",
) -> DataFrame:
    """Quality gate + watermark-scoped exact dedup for a streaming
    documents frame (must carry an event-time column ``ts_col``).

    The first-received document per content hash survives; duplicates
    arriving within ``dedup_horizon`` are dropped; state is evicted
    past the horizon.  Output carries the content hash so downstream
    sinks can maintain a hash index for the cross-horizon anti-join.
    """
    from database_peak_streaming_spark.streaming.ops import as_event_time

    gated = quality_gate(docs).withColumn("content_sha", F.sha2(F.col("text"), 256))
    return (
        as_event_time(gated, ts_col)
        .withWatermark(ts_col, dedup_horizon)
        .dropDuplicatesWithinWatermark(["content_sha"])
    )


def anti_join_existing(fresh: DataFrame, curated_hashes: DataFrame) -> DataFrame:
    """Cross-horizon dedup: drop documents whose content hash already
    exists in the curated store's hash index (a static frame refreshed
    per deploy/compaction).  Stream-static left-anti join — stateless on
    the stream side, so it composes with the watermark dedup above:
    within-horizon dups die in state, historical dups die here."""
    return fresh.join(
        curated_hashes.select("content_sha"), "content_sha", "left_anti"
    )


def run_ingest(
    curated: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append the curated stream to a lang-partitioned parquet store and
    block until the replay drains (``availableNow``) or return the live
    query.  Exactly-once to the sink comes from the parquet sink's
    per-batch commit log under ``checkpoint_dir`` — kill-and-resume
    re-delivers only uncommitted batches (same recovery contract as
    streaming/tiering.py, tested in tests/test_fault_tolerance.py for
    the tiered sink and tests/test_corpus_stream.py for this one)."""
    writer = (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("lang")
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
