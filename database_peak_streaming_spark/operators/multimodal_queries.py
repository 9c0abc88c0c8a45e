"""Registered (oracle-checked) queries over BINARY payload columns —
the driver-visible face of the multimodal plumbing in
functions/multimodal.py.

The fixture tables carry no media blobs (the container ships no codecs),
so the payload column is derived on the fly — ``encode(text)`` — which
is exactly the point: the queries exercise the REAL binary-column path
(BinaryType column -> Arrow batch -> mapInPandas kernel -> typed result)
with content that both engines can also fingerprint declaratively, so
the mapInPandas output is hash-checked against a pure-SQL oracle.  A
production deployment swaps the derived payload for a real media column
and the injected codec for PIL/ffmpeg (functions/multimodal.py:57-63);
nothing else changes.

Scale notes: the payload never reaches the driver; per-batch memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` x average
payload size (set at the session level); the kernel emits fixed-width
rows so the downstream plan is payload-free immediately after the map.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_peak_streaming_spark.sources.batch import load_table

_FINGERPRINT_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def multimodal_payload_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload fingerprinting through the multimodal kernel path:
    payload = utf-8 bytes of ``documents.text`` as a ``BinaryType``
    column, then a ``mapInPandas`` kernel (the same batch shape as
    ``functions.multimodal.extract_features``) computes per-item sha256
    and byte length.  The oracle computes the identical fingerprint
    declaratively (DuckDB ``sha256``/``octet_length`` over the encoded
    text), so the Arrow round-trip through Python is hash-verified."""

    def _fingerprint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                out.append((item_id, hashlib.sha256(raw).hexdigest(), len(raw)))
            yield pd.DataFrame(out, columns=["item_id", "sha", "n_bytes"])

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return (
        items.mapInPandas(_fingerprint, schema=_FINGERPRINT_SCHEMA)
        .orderBy("item_id")
    )


def multimodal_meta_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only pruning stats — the scan pattern that lets a 100 TB
    media table skip payload IO: derive typed metadata (media_type from a
    stable content property, n_bytes), filter on metadata alone, and
    aggregate.  No payload column ever enters the plan, which is the
    point: with a real parquet media table, column pruning means the blob
    column is never read for this query."""
    d = load_table(spark, "documents", sf_dir)
    media_type = F.when(F.col("doc_id") % 3 == 0, F.lit("image/jpeg")).otherwise(
        F.lit("image/png")
    )
    meta = d.select(
        "doc_id",
        media_type.alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    return (
        meta.filter(F.col("n_bytes") >= 200)
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("media_type")
    )


QUERIES = {
    "multimodal_payload_fingerprint": multimodal_payload_fingerprint,
    "multimodal_meta_filter_stats": multimodal_meta_filter_stats,
}

ORACLE_SQL = {
    "multimodal_payload_fingerprint": """
        SELECT doc_id AS item_id,
               SHA256(text) AS sha,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
        FROM documents ORDER BY item_id
    """,
    "multimodal_meta_filter_stats": """
        WITH meta AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
                        ELSE 'image/png' END AS media_type,
                   CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
            FROM documents)
        SELECT media_type,
               COUNT(*) AS n_items,
               CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
               MAX(n_bytes) AS max_bytes
        FROM meta
        WHERE n_bytes >= 200
        GROUP BY media_type
        ORDER BY media_type
    """,
}
