"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The pattern a 100 TB training-data pipeline needs (north-star mandated):

* payloads are ``BinaryType`` columns — never materialized driver-side;
* per-item metadata travels as typed columns (width/height/codec/...),
  so filtering ("only 224x224+, only jpeg") is predicate pushdown on
  scalars, and the binary column is only *read* for rows that survive;
* decode / resize / feature-extract run in ``mapInPandas`` batches.

The actual codec calls are STUBBED (no image/audio libs in this
container): ``decode_image`` raises ``NotImplementedError`` unless given
the deterministic test codec.  The Spark-side plumbing — schemas, batch
iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def fake_codec(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> pseudo-pixel
    array.  Lets the full pipeline run end-to-end in this container."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)


def real_codec(payload: bytes) -> np.ndarray:  # pragma: no cover - stub
    """Production decode hook (PIL/libvips/ffmpeg).  Deliberately stubbed:
    the container ships no media libraries."""
    raise NotImplementedError(
        "media decode requires an image/audio library; inject via "
        "extract_features(codec=...) in a deployment image"
    )


def extract_features(
    items: DataFrame,
    codec: Callable[[bytes], np.ndarray] = real_codec,
    dim: int = 32,
) -> DataFrame:
    """Binary payloads -> fixed-dim float features via mapInPandas.

    Batch shape contract: each pandas batch holds
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows max — size that
    config so (rows x avg payload bytes) fits executor memory; for 10 MB
    images that means ~100-row batches, set at the session level.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                vec = codec(raw)
                vec = np.resize(vec, dim).astype(np.float32)
                out.append(
                    (item_id, hashlib.sha256(raw).hexdigest(), vec.tolist())
                )
            yield pd.DataFrame(out, columns=["item_id", "sha", "feature"])

    return items.select("item_id", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def filter_by_meta(
    items: DataFrame, min_width: int = 0, media_type: str | None = None
) -> DataFrame:
    """Metadata-only predicate: prunes rows before any payload touch —
    with parquet column pruning the binary column is never read for
    filtered-out rows."""
    out = items.filter(F.col("width") >= min_width)
    if media_type is not None:
        out = out.filter(F.col("media_type") == media_type)
    return out


def synth_items(spark, n: int = 64) -> DataFrame:
    """Deterministic binary fixture: payload = packed item index bytes."""
    rows = [
        (
            i,
            "image/png" if i % 3 else "image/jpeg",
            64 + (i % 8) * 32,
            64 + (i % 5) * 32,
            16,
            struct.pack("<QQ", i, i * i),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema=IMAGE_META_SCHEMA)
