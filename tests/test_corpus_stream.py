"""Streaming corpus ingestion (streaming/corpus.py): the continuous
curation funnel must equal the batch computation — same quality gate,
same exact-dedup semantics — over a deterministic chunked replay, and
its parquet sink must recover exactly-once from a checkpoint.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-corpus-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs_with_arrivals(spark, n_dups: int = 40):
    """Documents + synthetic arrival timeline: every doc arrives once at
    ts = t0 + doc_id seconds (so arrival order == doc_id order), and the
    first ``n_dups`` quality-passing docs arrive AGAIN 30 s later with a
    new doc_id — in-horizon duplicates the stream must drop."""
    from database_peak_streaming_spark.sources.batch import load_table

    d = load_table(spark, "documents", SF_DIR)
    ts = F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
    base = d.withColumn("arrival_ts", ts)
    max_id = d.agg(F.max("doc_id")).first()[0]
    dups = (
        base.orderBy("doc_id")
        .limit(n_dups)
        .withColumn("doc_id", F.col("doc_id") + max_id + 1)
        .withColumn("arrival_ts", F.col("arrival_ts") + F.expr("INTERVAL 30 SECONDS"))
    )
    return base.unionByName(dups)


def test_streaming_curate_equals_batch(spark, tmpdir_):
    """Chunked replay through quality gate + watermark dedup must yield
    exactly the batch answer: quality-passing distinct contents, first
    arrival kept."""
    from database_peak_streaming_spark.streaming.corpus import (
        quality_gate,
        streaming_curate,
    )
    from database_peak_streaming_spark.streaming.replay import replay_dataframe

    docs = _docs_with_arrivals(spark)

    stream, replay_dir = replay_dataframe(
        spark, docs, n_chunks=4, order_col="arrival_ts", dir_hint="dps-corpus"
    )
    try:
        curated = streaming_curate(stream, dedup_horizon="10 minutes")
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.collect())

        q = (
            curated.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", f"{tmpdir_}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(420)
        assert not q.isActive
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)

    # batch oracle: quality gate, then one survivor per content, and the
    # survivor is the FIRST arrival (min arrival_ts == min doc_id here)
    batch = (
        quality_gate(docs)
        .withColumn("content_sha", F.sha2(F.col("text"), 256))
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_arrivals"),
        )
    ).collect()

    got_ids = sorted(r.doc_id for r in rows)
    want_ids = sorted(r.doc_id for r in batch)
    assert got_ids == want_ids, (
        f"stream kept {len(got_ids)} docs, batch oracle {len(want_ids)}"
    )
    # the injected duplicates were really exercised: some contents arrived twice
    assert any(r.n_arrivals > 1 for r in batch)
    # and every duplicate's KEEPER is the original (first) arrival
    dup_keepers = {r.doc_id for r in batch if r.n_arrivals > 1}
    assert dup_keepers and all(i in set(got_ids) for i in dup_keepers)


def test_anti_join_existing_drops_historical(spark):
    """Cross-horizon dedup: a hash index of already-curated contents
    anti-joins fresh arrivals (static form — the stream-static join is
    plan-identical)."""
    from database_peak_streaming_spark.streaming.corpus import (
        anti_join_existing,
        quality_gate,
    )

    docs = _docs_with_arrivals(spark, n_dups=0)
    fresh = quality_gate(docs).withColumn(
        "content_sha", F.sha2(F.col("text"), 256)
    )
    # pretend the first half of contents are already curated
    existing = fresh.filter(F.col("doc_id") % 2 == 0).select("content_sha")
    kept = anti_join_existing(fresh, existing)
    assert kept.count() == fresh.join(existing, "content_sha", "left_anti").count()
    assert kept.filter(F.col("doc_id") % 2 == 0).count() == 0


def test_ingest_sink_kill_and_resume(spark, tmpdir_):
    """Stop the ingest mid-replay, restart on the same checkpoint: the
    curated store must hold exactly the full-drain content set — no
    loss, no duplicates (parquet sink commit log)."""
    from database_peak_streaming_spark.streaming.corpus import (
        run_ingest,
        streaming_curate,
    )
    from database_peak_streaming_spark.streaming.replay import replay_dataframe

    docs = _docs_with_arrivals(spark)
    out, ckpt = f"{tmpdir_}/curated", f"{tmpdir_}/ckpt"

    stream, replay_dir = replay_dataframe(
        spark, docs, n_chunks=6, order_col="arrival_ts", dir_hint="dps-corpus2"
    )
    try:
        # first attempt: process a couple of micro-batches, then stop
        curated = streaming_curate(stream, dedup_horizon="10 minutes")
        q = (
            curated.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .partitionBy("lang")
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = 420
        import time

        t0 = time.time()
        while time.time() - t0 < deadline and q.lastProgress is None:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(deadline)

        # resume on the same checkpoint (same source path) and drain fully
        curated2 = streaming_curate(
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{replay_dir}/stream"),
            dedup_horizon="10 minutes",
        )
        run_ingest(curated2, out, ckpt, available_now=True)

        got = spark.read.parquet(out)
        n_docs = got.count()
        n_distinct = got.select("content_sha").distinct().count()
        assert n_docs == n_distinct, "sink holds duplicate contents"
        from database_peak_streaming_spark.streaming.corpus import quality_gate

        want = (
            quality_gate(docs)
            .select(F.sha2(F.col("text"), 256).alias("content_sha"))
            .distinct()
            .count()
        )
        assert n_distinct == want, f"sink {n_distinct} contents, oracle {want}"
    finally:
        shutil.rmtree(replay_dir, ignore_errors=True)
