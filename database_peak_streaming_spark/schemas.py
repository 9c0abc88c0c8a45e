"""Config-generated schemas mirroring the reference's parameterized DDL.

The reference generates ``CREATE TABLE`` statements from
``num_of_ports`` / ``num_of_peaks`` constants
(``database_peak_streaming.py:71,10,74-80``); here the same parameters
generate StructTypes.  Two layouts:

* LONG (canonical): one row per (scan, channel, peak) measurement —
  aggregation-friendly, skew-free, schema-stable as peak counts change.
* WIDE (compatibility): ``port1..portP`` / ``peak1..peakN`` columns, the
  reference's storage shape, produced from long form by pivot.

SURVEY.md §1.3/§4: the tier tables become ONE conformed table per tier
(timestamp + port counts + peak means) rather than the reference's
fragile positionally-id-paired pair.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Reference dev defaults (database_peak_streaming.py:10,71); production
#: uses num_of_peaks=120 (README.md:11).
NUM_OF_PORTS = 8
NUM_OF_PEAKS = 8


def peaks_long_schema() -> T.StructType:
    """Canonical long-form stream schema (FIXTURES.md peaks_raw).

    Payload fields are nullable: the end-of-stream flush sentinel (S6 ≙
    hyperion.py:308's ``{'data': None}``) is a real row with null
    payload, exactly like the reference's marker."""
    return T.StructType(
        [
            T.StructField("scan_id", T.LongType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("channel", T.IntegerType(), True),
            T.StructField("peak_idx", T.IntegerType(), True),
            T.StructField("wavelength", T.DoubleType(), True),
        ]
    )


def st_data_schema(num_of_ports: int = NUM_OF_PORTS) -> T.StructType:
    """Wide tier-table shape: st_data/lt_data
    (database_peak_streaming.py:74,77-78).  SMALLINT UNSIGNED -> int
    (Spark has no unsigned types; non-negativity is checked in tests)."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("timestamp", T.DoubleType(), False),
            *[
                T.StructField(f"port{i}", T.IntegerType(), True)
                for i in range(1, num_of_ports + 1)
            ],
        ]
    )


def st_peak_schema(num_of_peaks: int = NUM_OF_PEAKS) -> T.StructType:
    """Wide tier-table shape: st_peak/lt_peak
    (database_peak_streaming.py:75,79-80).  FLOAT UNSIGNED -> double."""
    return T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            *[
                T.StructField(f"peak{i}", T.DoubleType(), True)
                for i in range(1, num_of_peaks + 1)
            ],
        ]
    )


def conformed_tier_schema(
    num_of_ports: int = NUM_OF_PORTS, num_of_peaks: int = NUM_OF_PEAKS
) -> T.StructType:
    """The engine's single conformed tier table: window time + per-port
    counts + per-peak means in one row (replaces the id-paired st_data/
    st_peak split, SURVEY.md §1.3)."""
    return T.StructType(
        [
            T.StructField("window_start", T.TimestampType(), False),
            T.StructField("date", T.DateType(), False),
            *[
                T.StructField(f"port{i}", T.IntegerType(), True)
                for i in range(1, num_of_ports + 1)
            ],
            *[
                T.StructField(f"peak{i}", T.DoubleType(), True)
                for i in range(1, num_of_peaks + 1)
            ],
        ]
    )
