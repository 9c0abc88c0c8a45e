"""Custom stateful streaming operator: incremental per-key minute
downsampler via ``applyInPandasWithState`` (SURVEY.md §2B streaming
stateful-downsample row [R A4]).

The reference decimated by position (``st_data[::600]``,
database_peak_streaming.py:52-56) inside an in-process buffer.  The
streaming form needs *cross-batch* memory — "have I already emitted a row
for this key's current minute?" — which is exactly what Spark's
arbitrary-stateful-processing API provides: per-key GroupState that
outlives micro-batches, with watermark-based timeout so state for idle
keys is evicted (bounded memory at any key cardinality).

This is the (b)-tier custom-operator path from the project brief: the
built-in window aggregation can express "first per minute" only per
completed window; the stateful form emits immediately on the first event
of each minute — one row of state per key, O(1) per event.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("last_minute_epoch", T.LongType())])


def minute_first_output_schema(key_field: T.StructField) -> T.StructType:
    return T.StructType(
        [
            key_field,
            T.StructField("minute_start", T.TimestampType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


def stateful_minute_first(
    stream: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Emit the first event of each (key, minute), incrementally.

    State per key: the last minute already emitted.  Within a batch the
    kernel scans the key's rows in event order; across batches the
    GroupState carries the high-water minute.  State times out once the
    watermark passes (idle keys cost nothing forever).

    Correctness caveat (tested): exactly-once "first" requires per-key
    event-time ordering across batches, which replayed file streams
    provide; with out-of-order sources the winner within a minute is
    first-*arrival* (the reference's own semantics — its stride picked
    rows by arrival order too, database_peak_streaming.py:52-56).
    """
    key_field = stream.schema[key_col]
    out_schema = minute_first_output_schema(key_field)

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last_minute,) = state.get if state.exists else (-1,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            minutes = pdf[ts_col].dt.floor("60s")
            for ts, minute, value in zip(pdf[ts_col], minutes, pdf[value_col]):
                epoch_min = int(minute.timestamp())
                if epoch_min > last_minute:
                    out.append((key[0], minute, ts, float(value)))
                    last_minute = epoch_min
        state.update((last_minute,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3_600_000)
        if out:
            yield pd.DataFrame(
                out, columns=[key_col, "minute_start", ts_col, value_col]
            )

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
