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
import math
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


#: frame-sampling geometry: fixed-width frames, every STRIDE-th kept.
FRAME_LEN = 16
FRAME_STRIDE = 4

_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through the binary kernel path: the
    payload is treated as a container of fixed ``FRAME_LEN``-byte
    frames; every ``FRAME_STRIDE``-th frame is kept and the sampled
    stream is fingerprinted — the exact plumbing shape of an ffmpeg
    keyframe sampler (payload in, frame subset out, metadata row
    emitted), with byte slicing standing in for the codec (the
    documented functions/multimodal.py:57 sandbox boundary).

    The kernel slices BYTES; the oracle slices CHARS and the fixture
    corpus is ASCII, so the two agree — ``n_bytes`` is emitted beside
    the frame stats so any future non-ASCII fixture surfaces as a loud
    hash mismatch, not silent drift.  Payloads never shuffle: the map
    emits fixed-width rows and the sort runs on those."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                nf = (len(raw) + FRAME_LEN - 1) // FRAME_LEN
                kept = range(0, nf, FRAME_STRIDE)
                sampled = b"".join(
                    raw[i * FRAME_LEN : (i + 1) * FRAME_LEN] for i in kept
                )
                out.append(
                    (
                        item_id,
                        nf,
                        len(kept),
                        hashlib.sha256(sampled).hexdigest(),
                        len(raw),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["item_id", "n_frames", "n_sampled", "sha", "n_bytes"],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_sample, schema=_FRAME_SCHEMA).orderBy("item_id")


#: audio-style windowing: samples per analysis window (non-overlapping)
AUDIO_WIN = 64

_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_windows", T.LongType()),
        T.StructField("mean_rms", T.DoubleType()),
        T.StructField("max_rms", T.DoubleType()),
        T.StructField("peak_window", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def multimodal_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style per-window RMS energy through the binary kernel
    path: the payload is read as 8-bit unsigned PCM, cut into
    ``AUDIO_WIN``-sample windows (last window ragged), and each item
    emits window count, mean/max window RMS and the peak window index —
    the librosa frame-energy / silence-detection shape (payload in,
    fixed-width feature row out), with byte-code arithmetic standing in
    for the codec at the documented functions/multimodal.py sandbox
    boundary.

    Determinism: the RMS numerator is an exact int64 sum of squared
    sample codes computed identically by numpy and the oracle's
    SUM(c*c); one double division + sqrt per window, both engines IEEE.
    The kernel is TOTAL over degenerate payloads (0 bytes -> 0 windows,
    0.0 energies, peak -1) and the oracle LEFT-JOINs back to documents
    so the empty-payload doc of the degenerate fixture matches.
    ``n_bytes`` rides along so a non-ASCII future fixture (bytes !=
    chars) fails loudly, as in `multimodal_frame_sample`."""
    import numpy as np

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw)
                if n == 0:
                    out.append((item_id, 0, 0.0, 0.0, -1, 0))
                    continue
                arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                rms = []
                for k in range(0, n, AUDIO_WIN):
                    w = arr[k : k + AUDIO_WIN]
                    s2 = int((w * w).sum())
                    rms.append(math.sqrt(s2 / len(w)))
                peak = max(range(len(rms)), key=lambda i: (rms[i], -i))
                out.append(
                    (
                        item_id,
                        len(rms),
                        sum(rms) / len(rms),
                        rms[peak],
                        peak,
                        n,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id",
                    "n_windows",
                    "mean_rms",
                    "max_rms",
                    "peak_window",
                    "n_bytes",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return (
        items.mapInPandas(_energy, schema=_AUDIO_SCHEMA)
        .select(
            "item_id",
            "n_windows",
            F.round("mean_rms", 6).alias("mean_rms"),
            F.round("max_rms", 6).alias("max_rms"),
            "peak_window",
            "n_bytes",
        )
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


#: BMP geometry for the decode query: fixed 16-px-wide images (a
#: 16 x 3 = 48-byte row is already 4-byte aligned, so padding math in
#: the encoder and the oracle agree trivially).
BMP_WIDTH = 16

_BMP_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_px", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
        T.StructField("first_px_r", T.IntegerType()),
    ]
)


def multimodal_bmp_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the binary kernel path — no stub: each
    document's bytes become the RGB pixels of an uncompressed 24-bit BMP
    (built by ``functions.multimodal.encode_bmp`` — bottom-up rows, BGR,
    4-byte padding: a real file another tool could open), and
    ``real_codec`` decodes the file back to (H, W, 3) RGB with the
    pure-numpy ``decode_bmp``.  Emitted channel sums and the decoded
    top-left pixel are recomputed by the oracle DIRECTLY from the source
    text's byte values, so an encoder/decoder disagreement on channel
    order, row order, or padding is a hash mismatch, not a silent bug
    (channel sums catch BGR/RGB swaps; ``first_px_r`` catches a missing
    bottom-up flip).  ASCII-fixture convention as multimodal_frame_sample:
    the oracle reads char codes, the kernel reads bytes.

    Scale shape: one mapInPandas stage, payload-free immediately after
    (fixed-width stat rows out), no shuffle at all before the driver
    fetch — the 100 TB plan is scan -> decode -> stats, embarrassingly
    parallel."""
    from database_peak_streaming_spark.functions.multimodal import (
        encode_bmp,
        real_codec,
    )

    import numpy as np

    def _decode_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                h = max(1, math.ceil(len(raw) / (BMP_WIDTH * 3)))
                px = np.zeros(h * BMP_WIDTH * 3, dtype=np.uint8)
                px[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                img = encode_bmp(px.reshape(h, BMP_WIDTH, 3))
                dec = real_codec(img)  # dispatches to decode_bmp
                sums = dec.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (
                        item_id,
                        int(dec.shape[1]),
                        int(dec.shape[0]),
                        int(dec.shape[0] * dec.shape[1]),
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        int(dec[0, 0, 0]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "width", "height", "n_px",
                    "sum_r", "sum_g", "sum_b", "first_px_r",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_decode_stats, schema=_BMP_SCHEMA)



#: PPM geometry mirrors the BMP query's 16-px width; the 4-bin red-
#: channel histogram uses 64-value buckets.
PPM_WIDTH = 16
PPM_BINS = 4


_PPM_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_px", T.LongType()),
        T.StructField("r_bin0", T.LongType()),
        T.StructField("r_bin1", T.LongType()),
        T.StructField("r_bin2", T.LongType()),
        T.StructField("r_bin3", T.LongType()),
        T.StructField("sum_rgb", T.LongType()),
    ]
)


def multimodal_ppm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL P6 (binary PPM) decode through the SECOND pure-numpy codec:
    each document's bytes become the RGB pixels of a P6 file (header +
    raw top-down RGB — built inline, readable by any image tool), and
    ``real_codec`` dispatches to ``decode_ppm`` (header parse with
    whitespace/comment handling + reshape).  The emitted red-channel
    4-bin histogram and total RGB sum are recomputed by the oracle
    directly from the source text's char codes, so a header-length or
    channel-order bug in the decoder is a hash mismatch — the PPM twin
    of ``multimodal_bmp_decode_stats``'s pixel-level contract (which
    covered only the BMP half of the real codec until now).

    Scale shape: identical — one mapInPandas stage, fixed-width stat
    rows out, no shuffle before the fetch."""
    from database_peak_streaming_spark.functions.multimodal import real_codec

    import numpy as np

    def _ppm_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                h = max(1, math.ceil(len(raw) / (PPM_WIDTH * 3)))
                px = np.zeros(h * PPM_WIDTH * 3, dtype=np.uint8)
                px[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                ppm = b"P6\n%d %d\n255\n" % (PPM_WIDTH, h) + px.tobytes()
                dec = real_codec(ppm)  # dispatches to decode_ppm
                r = dec.reshape(-1, 3)[:, 0]
                bins = np.bincount(r >> 6, minlength=PPM_BINS)
                out.append(
                    (
                        item_id,
                        int(dec.shape[0] * dec.shape[1]),
                        int(bins[0]),
                        int(bins[1]),
                        int(bins[2]),
                        int(bins[3]),
                        int(dec.sum(dtype=np.int64)),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_px",
                    "r_bin0", "r_bin1", "r_bin2", "r_bin3", "sum_rgb",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_ppm_stats, schema=_PPM_SCHEMA)


QUERIES = {
    "multimodal_payload_fingerprint": multimodal_payload_fingerprint,
    "multimodal_meta_filter_stats": multimodal_meta_filter_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_window_energy": multimodal_audio_window_energy,
    "multimodal_bmp_decode_stats": multimodal_bmp_decode_stats,
    "multimodal_ppm_histogram": multimodal_ppm_histogram,
}

ORACLE_SQL = {
    "multimodal_ppm_histogram": f"""
        WITH s AS (
            SELECT doc_id AS item_id, text,
                   CAST(LENGTH(text) AS BIGINT) AS l,
                   {PPM_WIDTH} * GREATEST(1, CAST(CEIL(LENGTH(text)
                       / {PPM_WIDTH * 3}.0) AS BIGINT)) AS n_px
            FROM documents),
        rpix AS (
            SELECT item_id,
                   CASE WHEN 3 * k < l
                        THEN ORD(SUBSTRING(text, CAST(3 * k + 1 AS INT), 1))
                        ELSE 0 END AS r
            FROM (SELECT item_id, text, l,
                         UNNEST(RANGE(0, n_px)) AS k
                  FROM s)),
        hist AS (
            SELECT item_id,
                   CAST(SUM(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS r_bin0,
                   CAST(SUM(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS r_bin1,
                   CAST(SUM(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS r_bin2,
                   CAST(SUM(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS r_bin3
            FROM rpix GROUP BY 1),
        sums AS (
            SELECT doc_id AS item_id,
                   CAST(COALESCE(SUM(ORD(c)), 0) AS BIGINT) AS sum_rgb
            FROM documents
            LEFT JOIN (SELECT doc_id AS did,
                              UNNEST(STRING_SPLIT(text, '')) AS c
                       FROM documents) u
              ON u.did = documents.doc_id
            GROUP BY 1)
        SELECT s.item_id, s.n_px,
               h.r_bin0, h.r_bin1, h.r_bin2, h.r_bin3,
               m.sum_rgb
        FROM s
        JOIN hist h ON h.item_id = s.item_id
        JOIN sums m ON m.item_id = s.item_id
        ORDER BY s.item_id
    """,
    "multimodal_frame_sample": f"""
        WITH s AS (
            SELECT doc_id AS item_id, text,
                   CAST(octet_length(encode(text)) AS BIGINT) AS nb,
                   CAST(CEIL(length(text) / {FRAME_LEN}.0) AS BIGINT) AS nf
            FROM documents)
        SELECT item_id,
               nf AS n_frames,
               CAST(CEIL(nf / {FRAME_STRIDE}.0) AS BIGINT) AS n_sampled,
               -- nf = 0 guard (round-5 ADVICE): list_reduce raises on an
               -- empty frame list; the kernel hashes the empty string, so
               -- the oracle must stay total over any corpus.
               CASE WHEN nf = 0 THEN sha256('')
                    ELSE sha256(list_reduce(
                        LIST_TRANSFORM(
                            RANGE(0, CAST(nf AS INT), {FRAME_STRIDE}),
                            i -> substring(text,
                                           CAST(i * {FRAME_LEN} + 1 AS BIGINT),
                                           {FRAME_LEN})),
                        (x, y) -> x || y)) END AS sha,
               nb AS n_bytes
        FROM s
        ORDER BY item_id
    """,
    "multimodal_audio_window_energy": f"""
        WITH chars AS (
            SELECT doc_id,
                   CAST((i - 1) // {AUDIO_WIN} AS BIGINT) AS w,
                   ORD(SUBSTRING(text, CAST(i AS INT), 1)) AS c
            FROM (SELECT doc_id, text,
                         UNNEST(RANGE(1, LENGTH(text) + 1)) AS i
                  FROM documents)),
        wrms AS (
            SELECT doc_id, w,
                   SQRT(SUM(c * c) * 1.0 / COUNT(*)) AS rms
            FROM chars GROUP BY doc_id, w),
        agg AS (
            SELECT doc_id,
                   COUNT(*) AS n_windows,
                   AVG(rms) AS mean_rms,
                   MAX(rms) AS max_rms
            FROM wrms GROUP BY doc_id),
        peak AS (
            SELECT doc_id, w AS peak_window
            FROM (SELECT doc_id, w,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY rms DESC, w) AS rn
                  FROM wrms)
            WHERE rn = 1)
        SELECT d.doc_id AS item_id,
               COALESCE(a.n_windows, 0) AS n_windows,
               COALESCE(ROUND(a.mean_rms, 6), 0.0) AS mean_rms,
               COALESCE(ROUND(a.max_rms, 6), 0.0) AS max_rms,
               COALESCE(p.peak_window, -1) AS peak_window,
               CAST(OCTET_LENGTH(ENCODE(d.text)) AS BIGINT) AS n_bytes
        FROM documents d
        LEFT JOIN agg a ON a.doc_id = d.doc_id
        LEFT JOIN peak p ON p.doc_id = d.doc_id
        ORDER BY item_id
    """,
    "multimodal_payload_fingerprint": """
        SELECT doc_id AS item_id,
               SHA256(text) AS sha,
               CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
        FROM documents ORDER BY item_id
    """,
    "multimodal_bmp_decode_stats": f"""
        WITH geom AS (
            SELECT doc_id, text,
                   GREATEST(1, CAST(CEIL(OCTET_LENGTH(ENCODE(text))
                                         / {BMP_WIDTH * 3}.0) AS INT)) AS h
            FROM documents),
        b AS (
            SELECT doc_id,
                   UNNEST(RANGE(1, LENGTH(text) + 1)) AS i,
                   text
            FROM documents),
        sums AS (
            SELECT doc_id,
                   SUM(CASE WHEN (i - 1) % 3 = 0
                            THEN ORD(SUBSTRING(text, CAST(i AS INT), 1)) END) AS sr,
                   SUM(CASE WHEN (i - 1) % 3 = 1
                            THEN ORD(SUBSTRING(text, CAST(i AS INT), 1)) END) AS sg,
                   SUM(CASE WHEN (i - 1) % 3 = 2
                            THEN ORD(SUBSTRING(text, CAST(i AS INT), 1)) END) AS sb,
                   MAX(CASE WHEN i = 1
                            THEN ORD(SUBSTRING(text, CAST(i AS INT), 1)) END) AS r0
            FROM b GROUP BY doc_id)
        SELECT g.doc_id AS item_id,
               {BMP_WIDTH} AS width,
               g.h AS height,
               CAST({BMP_WIDTH} * g.h AS BIGINT) AS n_px,
               CAST(COALESCE(s.sr, 0) AS BIGINT) AS sum_r,
               CAST(COALESCE(s.sg, 0) AS BIGINT) AS sum_g,
               CAST(COALESCE(s.sb, 0) AS BIGINT) AS sum_b,
               CAST(COALESCE(s.r0, 0) AS INT) AS first_px_r
        FROM geom g LEFT JOIN sums s ON s.doc_id = g.doc_id
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


#: nearest-neighbor resize target (out x out pixels)
BMP_RESIZE_OUT = 4

_BMP_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_size", T.IntegerType()),
        T.StructField("rs_r", T.LongType()),
        T.StructField("rs_g", T.LongType()),
        T.StructField("rs_b", T.LongType()),
        T.StructField("px00_r", T.IntegerType()),
    ]
)


def multimodal_bmp_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE through the real codec path — the remaining verb of
    the multimodal mandate (decode / feature-extract / RESIZE /
    frame-sample): each document's bytes become a real 24-bit BMP
    (``multimodal_bmp_decode_stats``'s encode), the pure-numpy decoder
    recovers (H, 16, 3) RGB, and a NEAREST-NEIGHBOR downsample to 4x4
    picks rows floor(k*H/4) and cols floor(j*16/4) — the thumbnail
    kernel every vision-data pipeline runs before dedup or CLIP
    scoring.  Emitted: per-channel sums over the 16 sampled pixels and
    the resized top-left R, all recomputed by the oracle DIRECTLY from
    source byte offsets ((row*16 + col)*3 + channel), so a wrong
    sampling grid, channel order, or row flip is a hash mismatch.

    Scale shape: identical to the decode pass — one mapInPandas stage,
    payload-free immediately after, embarrassingly parallel."""
    from database_peak_streaming_spark.functions.multimodal import (
        encode_bmp,
        real_codec,
    )

    import numpy as np

    out_n = BMP_RESIZE_OUT

    def _resize_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                h = max(1, math.ceil(len(raw) / (BMP_WIDTH * 3)))
                px = np.zeros(h * BMP_WIDTH * 3, dtype=np.uint8)
                px[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
                img = encode_bmp(px.reshape(h, BMP_WIDTH, 3))
                dec = real_codec(img)
                rows = (np.arange(out_n) * dec.shape[0]) // out_n
                cols = (np.arange(out_n) * dec.shape[1]) // out_n
                small = dec[np.ix_(rows, cols)]
                sums = small.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                out.append(
                    (
                        item_id,
                        int(dec.shape[0]),
                        out_n,
                        int(sums[0]),
                        int(sums[1]),
                        int(sums[2]),
                        int(small[0, 0, 0]),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "src_height", "out_size",
                    "rs_r", "rs_g", "rs_b", "px00_r",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_resize_stats, schema=_BMP_RESIZE_SCHEMA)


QUERIES["multimodal_bmp_resize_stats"] = multimodal_bmp_resize_stats

ORACLE_SQL["multimodal_bmp_resize_stats"] = f"""
    WITH geom AS (
        SELECT doc_id, text,
               GREATEST(1, CAST(CEIL(OCTET_LENGTH(ENCODE(text))
                                     / {BMP_WIDTH * 3}.0) AS INT)) AS h
        FROM documents),
    grid AS (
        SELECT g.doc_id, g.text, g.h,
               (k.k * g.h) // {BMP_RESIZE_OUT} AS r,
               (j.j * {BMP_WIDTH}) // {BMP_RESIZE_OUT} AS c
        FROM geom g
        CROSS JOIN (SELECT UNNEST(RANGE(0, {BMP_RESIZE_OUT})) AS k) k
        CROSS JOIN (SELECT UNNEST(RANGE(0, {BMP_RESIZE_OUT})) AS j) j),
    px AS (
        SELECT doc_id, h, r, c,
               (r * {BMP_WIDTH} + c) * 3 + 1 AS i0,
               LENGTH(text) AS len, text
        FROM grid),
    vals AS (
        SELECT doc_id, h, r, c,
               CASE WHEN i0 <= len
                    THEN ORD(SUBSTRING(text, CAST(i0 AS INT), 1))
                    ELSE 0 END AS vr,
               CASE WHEN i0 + 1 <= len
                    THEN ORD(SUBSTRING(text, CAST(i0 + 1 AS INT), 1))
                    ELSE 0 END AS vg,
               CASE WHEN i0 + 2 <= len
                    THEN ORD(SUBSTRING(text, CAST(i0 + 2 AS INT), 1))
                    ELSE 0 END AS vb
        FROM px)
    SELECT doc_id AS item_id,
           CAST(MAX(h) AS INT) AS src_height,
           {BMP_RESIZE_OUT} AS out_size,
           CAST(SUM(vr) AS BIGINT) AS rs_r,
           CAST(SUM(vg) AS BIGINT) AS rs_g,
           CAST(SUM(vb) AS BIGINT) AS rs_b,
           CAST(MAX(CASE WHEN r = 0 AND c = 0 THEN vr END) AS INT)
               AS px00_r
    FROM vals
    GROUP BY doc_id
"""


#: WAV fixture geometry: mono 16-bit PCM at 8 kHz; the high byte of
#: each sample runs through an affine byte transform so roughly half
#: the decoded samples are NEGATIVE — the fixture text is ASCII
#: (char codes <= 127), so without the transform the int16 sign path
#: (the classic WAV-decode bug) would never be exercised.
WAV_RATE = 8000
WAV_HI_MUL = 37
WAV_HI_ADD = 11

_WAV_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("min_s", T.IntegerType()),
        T.StructField("max_s", T.IntegerType()),
        T.StructField("n_neg", T.LongType()),
        T.StructField("first_s", T.IntegerType()),
    ]
)


def multimodal_wav_pcm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the binary kernel path — the audio
    sibling of ``multimodal_bmp_decode_stats`` (reference parity: the
    instrument logger's binary payload handling, hyperion.py's framed
    spectrum reads, generalized to media containers): each document's
    byte pairs become little-endian signed 16-bit PCM samples (high
    byte pushed through an affine transform so the sign path is
    exercised — see ``WAV_HI_MUL``), ``encode_wav`` wraps them in a
    real 44-byte-header RIFF/WAVE file another tool could play, and
    ``decode_wav`` parses the chunk list back for real (magic, fmt
    tag/width, data chunk walk).  Emitted per item: sample count,
    parsed rate, energy (sum of squares), min/max/first sample and the
    negative-sample count — each recomputed by the oracle DIRECTLY
    from source char codes, so an endianness swap, a sign-extension
    bug, or an off-by-one in the header walk is a hash mismatch, not a
    silent corruption.

    Scale shape: one mapInPandas stage, payload-free immediately after
    (fixed-width stat rows out), no shuffle before the driver fetch —
    scan -> decode -> stats, embarrassingly parallel at 100 TB."""
    from database_peak_streaming_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    import numpy as np

    def _decode_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw) // 2
                b = np.frombuffer(raw, dtype=np.uint8, count=2 * n)
                lo = b[0::2].astype(np.int32)
                hi = (b[1::2].astype(np.int32) * WAV_HI_MUL + WAV_HI_ADD) % 256
                pcm = (lo | (hi << 8)).astype(np.uint16).view(np.int16)
                dec, rate = decode_wav(encode_wav(pcm, WAV_RATE))
                v = dec.astype(np.int64)
                out.append(
                    (
                        item_id,
                        int(v.size),
                        int(rate),
                        int((v * v).sum()) if v.size else 0,
                        int(v.min()) if v.size else 0,
                        int(v.max()) if v.size else 0,
                        int((v < 0).sum()),
                        int(v[0]) if v.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_samples", "sample_rate", "sum_sq",
                    "min_s", "max_s", "n_neg", "first_s",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_decode_stats, schema=_WAV_SCHEMA)


QUERIES["multimodal_wav_pcm_decode"] = multimodal_wav_pcm_decode

ORACLE_SQL["multimodal_wav_pcm_decode"] = f"""
    WITH s AS (
        SELECT doc_id AS item_id, text,
               CAST(LENGTH(text) // 2 AS BIGINT) AS n
        FROM documents),
    samp AS (
        SELECT item_id, k,
               ORD(SUBSTRING(text, CAST(2 * k + 1 AS INT), 1))
               + 256 * ((ORD(SUBSTRING(text, CAST(2 * k + 2 AS INT), 1))
                         * {WAV_HI_MUL} + {WAV_HI_ADD}) % 256) AS su
        FROM (SELECT item_id, text, UNNEST(RANGE(0, n)) AS k FROM s)),
    sv AS (
        SELECT item_id, k,
               CASE WHEN su >= 32768 THEN su - 65536 ELSE su END AS v
        FROM samp),
    agg AS (
        SELECT item_id AS aid,
               SUM(v * v) AS ssq, MIN(v) AS mn, MAX(v) AS mx,
               SUM(CASE WHEN v < 0 THEN 1 ELSE 0 END) AS nneg,
               MAX(CASE WHEN k = 0 THEN v END) AS f
        FROM sv GROUP BY 1)
    SELECT s.item_id,
           s.n AS n_samples,
           {WAV_RATE} AS sample_rate,
           CAST(COALESCE(a.ssq, 0) AS BIGINT) AS sum_sq,
           CAST(COALESCE(a.mn, 0) AS INT) AS min_s,
           CAST(COALESCE(a.mx, 0) AS INT) AS max_s,
           CAST(COALESCE(a.nneg, 0) AS BIGINT) AS n_neg,
           CAST(COALESCE(a.f, 0) AS INT) AS first_s
    FROM s LEFT JOIN agg a ON a.aid = s.item_id
    ORDER BY s.item_id
"""


#: decimation factor for the audio downsample (keep every Dth sample)
WAV_DECIM = 4

_WAV_DECIM_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("sum_sq_out", T.LongType()),
        T.StructField("min_out", T.IntegerType()),
        T.StructField("max_out", T.IntegerType()),
        T.StructField("first_out", T.IntegerType()),
    ]
)


def multimodal_wav_decimate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio DOWNSAMPLE through the real codec path — the resize verb
    for audio, completing the per-format verb pairs (BMP: decode +
    resize; WAV: decode + decimate): each document's bytes become a
    real RIFF/WAVE file (``multimodal_wav_pcm_decode``'s encode), the
    chunk-walking decoder recovers the int16 stream, and a stride-
    ``WAV_DECIM`` DECIMATION keeps every 4th sample — the cheap
    anti-aliasing-free downsample a fingerprinting/VAD pre-pass runs
    (cf. the strided frame sample in ``multimodal_frame_sample``; the
    reference's A4 strided downsample is the sensor-series form of the
    same verb).  Emitted: input/output sample counts and the decimated
    stream's energy/min/max/first — each recomputed by the oracle from
    source char codes restricted to stride-aligned sample indices, so
    an off-by-one in the stride phase is a hash mismatch.

    Scale shape: identical to the decode pass — one mapInPandas
    stage, fixed-width stat rows, zero shuffle before the fetch."""
    from database_peak_streaming_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    import numpy as np

    def _decimate_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                raw = bytes(payload)
                n = len(raw) // 2
                b = np.frombuffer(raw, dtype=np.uint8, count=2 * n)
                lo = b[0::2].astype(np.int32)
                hi = (b[1::2].astype(np.int32) * WAV_HI_MUL + WAV_HI_ADD) % 256
                pcm = (lo | (hi << 8)).astype(np.uint16).view(np.int16)
                dec, _rate = decode_wav(encode_wav(pcm, WAV_RATE))
                small = dec[::WAV_DECIM].astype(np.int64)
                out.append(
                    (
                        item_id,
                        int(dec.size),
                        int(small.size),
                        int((small * small).sum()) if small.size else 0,
                        int(small.min()) if small.size else 0,
                        int(small.max()) if small.size else 0,
                        int(small[0]) if small.size else 0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "item_id", "n_samples", "n_out", "sum_sq_out",
                    "min_out", "max_out", "first_out",
                ],
            )

    d = load_table(spark, "documents", sf_dir)
    items = d.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )
    return items.mapInPandas(_decimate_stats, schema=_WAV_DECIM_SCHEMA)


QUERIES["multimodal_wav_decimate_stats"] = multimodal_wav_decimate_stats

ORACLE_SQL["multimodal_wav_decimate_stats"] = f"""
    WITH s AS (
        SELECT doc_id AS item_id, text,
               CAST(LENGTH(text) // 2 AS BIGINT) AS n
        FROM documents),
    samp AS (
        SELECT item_id, k,
               ORD(SUBSTRING(text, CAST(2 * k + 1 AS INT), 1))
               + 256 * ((ORD(SUBSTRING(text, CAST(2 * k + 2 AS INT), 1))
                         * {WAV_HI_MUL} + {WAV_HI_ADD}) % 256) AS su
        FROM (SELECT item_id, text, UNNEST(RANGE(0, n)) AS k FROM s)
        WHERE k % {WAV_DECIM} = 0),
    sv AS (
        SELECT item_id, k,
               CASE WHEN su >= 32768 THEN su - 65536 ELSE su END AS v
        FROM samp),
    agg AS (
        SELECT item_id AS aid,
               CAST(COUNT(*) AS BIGINT) AS n_out,
               SUM(v * v) AS ssq, MIN(v) AS mn, MAX(v) AS mx,
               MAX(CASE WHEN k = 0 THEN v END) AS f
        FROM sv GROUP BY 1)
    SELECT s.item_id,
           s.n AS n_samples,
           COALESCE(a.n_out, 0) AS n_out,
           CAST(COALESCE(a.ssq, 0) AS BIGINT) AS sum_sq_out,
           CAST(COALESCE(a.mn, 0) AS INT) AS min_out,
           CAST(COALESCE(a.mx, 0) AS INT) AS max_out,
           CAST(COALESCE(a.f, 0) AS INT) AS first_out
    FROM s LEFT JOIN agg a ON a.aid = s.item_id
    ORDER BY s.item_id
"""
