"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The pattern a 100 TB training-data pipeline needs (north-star mandated):

* payloads are ``BinaryType`` columns — never materialized driver-side;
* per-item metadata travels as typed columns (width/height/codec/...),
  so filtering ("only 224x224+, only jpeg") is predicate pushdown on
  scalars, and the binary column is only *read* for rows that survive;
* decode / resize / feature-extract run in ``mapInPandas`` batches.

Codec status: self-contained formats decode for REAL — pure-numpy
uncompressed-24-bit-BMP, binary-PPM and RIFF/WAVE-PCM decoders below,
pixel/sample-exact and oracle-checked (operators/multimodal_queries.py
registers decode queries whose channel/sample sums DuckDB recomputes
from the source bytes).  Compressed formats (JPEG/PNG/video, MP3/AAC)
still require a media library the container does not ship;
``real_codec`` raises ``NotImplementedError`` for those only, with the
injection point documented.
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


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB).  Returns an (H, W, 3) uint8 array in RGB channel order,
    rows top-down — i.e. the orientation every ML pipeline expects,
    with the file's bottom-up row order and BGR pixel order undone.

    Handles the two quirks real BMP files have: 4-byte row padding and
    negative ``height`` (top-down files).  Anything fancier (palettes,
    RLE, BITFIELDS, other bit depths) raises ValueError — this decoder
    exists to close the sandbox codec gap for the format that needs no
    compression library, not to reimplement libbmp."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_offset + row_bytes * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = (
        np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height,
                      offset=data_offset)
        .reshape(height, row_bytes)[:, : width * 3]
        .reshape(height, width, 3)
    )
    if not top_down:
        rows = rows[::-1]  # file stores bottom-up
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp` — (H, W, 3) uint8 RGB top-down ->
    uncompressed 24-bit bottom-up BMP bytes.  Exists so the decoder has
    an independent in-repo round-trip partner and so fixtures can build
    real BMP payloads without a media library."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("expected (H, W, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    data = body.tobytes()
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (H, W, 3) uint8 RGB.  PPM is
    already top-down RGB, so decode is header parse + reshape."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM payload")
    # header = magic, width, height, maxval separated by whitespace
    # (comment lines allowed); pixel data starts after the single
    # whitespace byte that follows maxval
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    need = i + w * h * 3
    if len(payload) < need:
        raise ValueError(f"truncated PPM: {len(payload)} < {need} bytes")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM parser -> (int16 sample array, sample_rate).  Walks
    the chunk list for real (a WAV file may carry LIST/fact/cue chunks
    between ``fmt `` and ``data``), validates PCM format tag 1 /
    16-bit / mono, and reinterprets the data chunk as little-endian
    signed 16-bit samples.  The audio sibling of :func:`decode_bmp`:
    the container format needs no compression library, so the sandbox
    can decode it byte-exactly; compressed audio (MP3/AAC/Opus) stays
    behind the ``real_codec`` injection hook."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt: tuple[int, int, int, int] | None = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        # a lying chunk size would silently truncate the sample stream
        # (or leak struct.error from the fmt parse below) — fail the
        # documented ValueError contract instead (r11 ADVICE)
        if len(body) != size:
            raise ValueError(
                f"chunk {cid!r} claims {size} bytes, payload has only "
                f"{len(body)}"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} bytes)")
            tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, bits = fmt
    if tag != 1 or bits != 16 or channels != 1:
        raise ValueError(
            f"only mono 16-bit PCM supported (tag={tag}, ch={channels}, "
            f"bits={bits})"
        )
    n = len(data) // 2
    samples = np.frombuffer(data, dtype="<i2", count=n).copy()
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Inverse of :func:`decode_wav` — mono int16 samples -> canonical
    44-byte-header RIFF/WAVE PCM bytes, the round-trip partner that
    lets fixtures build real WAV payloads without an audio library."""
    body = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s" "4sIHHIIHH" "4sI",
        b"RIFF", 36 + len(body), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(body),
    )
    return hdr + body


def real_codec(payload: bytes) -> np.ndarray:
    """Production decode hook.  Self-contained formats (uncompressed
    24-bit BMP, binary PPM, RIFF/WAVE PCM) decode here with the
    pure-numpy decoders above — pixel/sample-exact, no media library.
    Compressed formats (JPEG/PNG/video, MP3/AAC) still need
    PIL/libvips/ffmpeg, which this container does not ship: inject via
    ``extract_features(codec=...)`` in a deployment image."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:4] == b"RIFF":
        return decode_wav(payload)[0]
    raise NotImplementedError(
        "compressed media decode requires an image/audio library; inject "
        "via extract_features(codec=...) in a deployment image "
        "(BMP, PPM and WAV decode natively)"
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
