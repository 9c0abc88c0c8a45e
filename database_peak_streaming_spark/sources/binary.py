"""Binary wire-format decode (SURVEY.md §2A S4): the reference's
Hyperion peaks frame, parsed distributed.

Frame layout (reference ``hyperion.py:432-453``):

    header: struct '<HHIQII' -> (length, version, reserved, serial_number,
                                 timestamp_int, timestamp_frac)
    body:   int16[num_channels]  per-channel peak counts
            float64[sum(counts)] flat peak wavelengths

The reference parsed one frame at a time with ``struct.unpack`` +
``np.frombuffer`` on the driver's asyncio thread.  Here frames are rows
of a BinaryType column and a ``mapInPandas`` kernel decodes an Arrow
batch of frames per call — same zero-copy numpy internals, but sharded
across executors, so decode throughput scales with cores, not with one
event loop.

Output is the engine's canonical LONG form (scan_id, ts, channel,
peak_idx, wavelength) — the ragged per-channel slices (hyperion.py:
446-453) become rows, not nested lists.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

HEADER_FMT = "<HHIQII"  # hyperion.py:436 (unpack 'HHIQII')
HEADER_LEN = struct.calcsize(HEADER_FMT)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("serial_number", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("peak_idx", T.IntegerType()),
        T.StructField("wavelength", T.DoubleType()),
    ]
)


def encode_peaks_frame(
    serial_number: int,
    timestamp_int: int,
    timestamp_frac: int,
    counts: list[int],
    wavelengths: list[float],
    version: int = 1,
) -> bytes:
    """Build a reference-format frame (test fixture generator; the exact
    inverse of the decode path — SURVEY.md §5.5 unit strategy)."""
    assert sum(counts) == len(wavelengths)
    header = struct.pack(
        HEADER_FMT, 0, version, 0, serial_number, timestamp_int, timestamp_frac
    )
    body = (
        np.asarray(counts, dtype=np.int16).tobytes()
        + np.asarray(wavelengths, dtype=np.float64).tobytes()
    )
    return header + body


def _decode_one(frame: bytes, num_channels: int) -> Iterator[tuple]:
    (_, _, _, serial, ts_int, ts_frac) = struct.unpack_from(HEADER_FMT, frame, 0)
    # hyperion.py:467: timestamp_frac * 1e-9 + timestamp_int
    ts = pd.Timestamp(ts_int, unit="s") + pd.Timedelta(ts_frac, unit="ns")
    counts = np.frombuffer(
        frame, dtype=np.int16, count=num_channels, offset=HEADER_LEN
    )
    data = np.frombuffer(frame, dtype=np.float64, offset=HEADER_LEN + 2 * num_channels)
    # hyperion.py:442-453: cumsum boundaries -> ragged slices -> long rows
    start = 0
    for ch, n in enumerate(counts, start=1):
        for pk in range(int(n)):
            yield (serial, ts, ch, pk, float(data[start + pk]))
        start += int(n)


def decode_peaks_frames(
    frames: DataFrame, frame_col: str = "frame", num_channels: int = 8
) -> DataFrame:
    """Decode a DataFrame of binary peak frames to long form via
    ``mapInPandas`` (Arrow-batched; one Python call per batch of frames,
    not per frame)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                row
                for frame in pdf[frame_col]
                for row in _decode_one(frame, num_channels)
            ]
            yield pd.DataFrame(
                rows,
                columns=["serial_number", "ts", "channel", "peak_idx", "wavelength"],
            )

    return frames.mapInPandas(_decode, schema=DECODED_SCHEMA)
