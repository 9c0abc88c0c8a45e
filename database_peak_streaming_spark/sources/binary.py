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


# ---------------------------------------------------------------------------
# Spectrum frames (reference hyperion.py:473-549): 48-byte header
# '<HHIQIIddIHH' (length, version, reserved, serial, ts_int, ts_frac,
# start_wavelength, wavelength_increment, num_points, num_channels,
# active_channel_bits) + uint16[num_channels][num_points] matrix.  The
# bitmask maps matrix rows to physical channel ids (hyperion.py:495-501).
# ---------------------------------------------------------------------------

SPECTRUM_HEADER_FMT = "<HHIQIIddIHH"
SPECTRUM_HEADER_LEN = struct.calcsize(SPECTRUM_HEADER_FMT)

SPECTRUM_SCHEMA = T.StructType(
    [
        T.StructField("serial_number", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("start_wavelength", T.DoubleType()),
        T.StructField("wavelength_increment", T.DoubleType()),
        T.StructField("counts", T.ArrayType(T.IntegerType())),
    ]
)


def encode_spectrum_frame(
    serial_number: int,
    timestamp_int: int,
    timestamp_frac: int,
    start_wavelength: float,
    wavelength_increment: float,
    active_channel_bits: int,
    matrix: "np.ndarray",
    version: int = 1,
) -> bytes:
    """Reference-format spectrum frame (test fixture generator)."""
    num_channels, num_points = matrix.shape
    assert bin(active_channel_bits).count("1") == num_channels
    header = struct.pack(
        SPECTRUM_HEADER_FMT,
        0,
        version,
        0,
        serial_number,
        timestamp_int,
        timestamp_frac,
        start_wavelength,
        wavelength_increment,
        num_points,
        num_channels,
        active_channel_bits,
    )
    return header + matrix.astype(np.uint16).tobytes()


def _decode_spectrum(frame: bytes) -> Iterator[tuple]:
    (
        _len,
        _ver,
        _res,
        serial,
        ts_int,
        ts_frac,
        start_wl,
        wl_inc,
        num_points,
        num_channels,
        bits,
    ) = struct.unpack_from(SPECTRUM_HEADER_FMT, frame, 0)
    ts = pd.Timestamp(ts_int, unit="s") + pd.Timedelta(ts_frac, unit="ns")
    matrix = np.frombuffer(
        frame, dtype=np.uint16, offset=SPECTRUM_HEADER_LEN
    ).reshape(num_channels, num_points)
    # bitmask -> channel map (hyperion.py:495-501): row i of the matrix
    # belongs to the i-th set bit of active_channel_bits
    channels = [b for b in range(16) if (bits >> b) & 1]
    for row, ch in zip(matrix, channels):
        yield (serial, ts, ch, start_wl, wl_inc, row.astype(np.int32).tolist())


def decode_spectrum_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Spectrum frames -> one row per active channel carrying the raw
    uint16 counts array plus the wavelength-axis parameters; downstream,
    ``functions.sensor.power_calibration`` and ``wavelength_axis`` turn
    counts into (wavelength, dBm) series as pure column expressions."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                row for frame in pdf[frame_col] for row in _decode_spectrum(frame)
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "serial_number",
                    "ts",
                    "channel",
                    "start_wavelength",
                    "wavelength_increment",
                    "counts",
                ],
            )

    return frames.mapInPandas(_decode, schema=SPECTRUM_SCHEMA)


# ---------------------------------------------------------------------------
# Sensor frames (reference hyperion.py:388-420): 24-byte header
# '<HBBIQII' + float64[] flat payload.
# ---------------------------------------------------------------------------

SENSOR_HEADER_FMT = "<HBBIQII"
SENSOR_HEADER_LEN = struct.calcsize(SENSOR_HEADER_FMT)

SENSOR_SCHEMA = T.StructType(
    [
        T.StructField("serial_number", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("sensor_idx", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def encode_sensor_frame(
    serial_number: int,
    timestamp_int: int,
    timestamp_frac: int,
    values: list[float],
    version: int = 1,
) -> bytes:
    header = struct.pack(
        SENSOR_HEADER_FMT,
        0,
        version,
        0,
        0,  # reserved word (the 'I' after the two bytes)
        serial_number,
        timestamp_int,
        timestamp_frac,
    )
    return header + np.asarray(values, dtype=np.float64).tobytes()


def decode_sensor_frames(frames: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Sensor frames -> long form (one row per sensor value)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for frame in pdf[frame_col]:
                frame = bytes(frame)
                (_l, _v, _r, _pad, serial, ts_int, ts_frac) = struct.unpack_from(
                    SENSOR_HEADER_FMT, frame, 0
                )
                ts = pd.Timestamp(ts_int, unit="s") + pd.Timedelta(ts_frac, unit="ns")
                vals = np.frombuffer(frame, dtype=np.float64, offset=SENSOR_HEADER_LEN)
                rows.extend(
                    (serial, ts, i, float(v)) for i, v in enumerate(vals)
                )
            yield pd.DataFrame(
                rows, columns=["serial_number", "ts", "sensor_idx", "value"]
            )

    return frames.mapInPandas(_decode, schema=SENSOR_SCHEMA)


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
