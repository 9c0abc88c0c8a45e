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

try:  # Spark >= 4.0: the transformWithState arbitrary-state API
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]

STATE_SCHEMA = T.StructType([T.StructField("last_minute_epoch", T.LongType())])

#: Idle horizon before a key's state is evicted (event-time).
IDLE_TIMEOUT_MS = 3_600_000


def _idle_timeout_ts(state: GroupState, batch_max_ts) -> int:
    """Event-time eviction timestamp for a key that was just processed.

    Normally ``watermark + 1h``.  In the FIRST micro-batch, however,
    ``getCurrentWatermarkMs()`` is still 0 (the watermark only advances
    AFTER a batch completes), so ``0 + 1h`` = epoch+1h — any key absent
    from the second batch would be evicted immediately regardless of
    real idleness, silently dropping one cross-batch transition
    (round-5 ADVICE).  When the watermark has not advanced yet, derive
    the base from the batch's own max event time (session tz is pinned
    UTC, so the naive pandas timestamp IS epoch-UTC)."""
    wm = state.getCurrentWatermarkMs()
    if wm <= 0 and batch_max_ts is not None:
        wm = int(pd.Timestamp(batch_max_ts).value // 1_000_000)
    return wm + IDLE_TIMEOUT_MS


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
        batch_max = None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            mx = pdf[ts_col].max()
            batch_max = mx if batch_max is None else max(batch_max, mx)
            minutes = pdf[ts_col].dt.floor("60s")
            for ts, minute, value in zip(pdf[ts_col], minutes, pdf[value_col]):
                epoch_min = int(minute.timestamp())
                if epoch_min > last_minute:
                    out.append((key[0], minute, ts, float(value)))
                    last_minute = epoch_min
        state.update((last_minute,))
        state.setTimeoutTimestamp(_idle_timeout_ts(state, batch_max))
        if out:
            yield pd.DataFrame(
                out, columns=[key_col, "minute_start", ts_col, value_col]
            )

    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- transformWithState: the current-generation arbitrary-state API ------

EMA_ALPHA = 0.2


class EmaSmoother(StatefulProcessor):
    """Per-key exponential-moving-average smoother on Spark 4's
    ``transformWithState`` API (the successor to ``applyInPandasWithState``:
    typed state handles, multiple state variables, timers) — the
    streaming form of the reference's P12-style baseline smoothing over a
    live sensor series.

    State: ONE double per key (the running EMA) in a ``ValueState`` —
    bounded memory at any key cardinality, checkpointed with the query,
    so kill-and-resume continues the smoothing exactly where it stopped.
    Emits every input row with its smoothed value (output volume ==
    input volume; no retraction, append mode).

    Correctness contract (tested): with per-key event-time-ordered
    arrival (replayed file streams; a watermark-sorted source at scale),
    the streamed EMA equals the batch pandas EMA over the full series.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState("ema", "ema double")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        ema = self._state.get()[0] if self._state.exists() else None
        pdfs = list(rows)
        pdf = pd.concat(pdfs).sort_values("ts") if len(pdfs) > 1 else pdfs[0].sort_values("ts")
        out_ema = []
        for v in pdf["value"]:
            v = float(v)
            ema = v if ema is None else EMA_ALPHA * v + (1.0 - EMA_ALPHA) * ema
            out_ema.append(ema)
        if out_ema:
            self._state.update((float(ema),))
        yield pd.DataFrame(
            {
                "channel": pdf["channel"].astype("int64"),
                "ts": pdf["ts"],
                "value": pdf["value"].astype("float64"),
                "ema": out_ema,
            }
        )

    def close(self) -> None:
        pass


def stateful_ema_tws(stream: DataFrame) -> DataFrame:
    """``EmaSmoother`` wired through ``transformWithStateInPandas``.

    Runtime requirements beyond this container: the TWS Python protocol
    needs ``google.protobuf`` (standard in Spark distributions' Python
    env, absent here — the e2e test auto-skips without it; the processor
    kernel itself is unit-tested either way), and the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider``), which the CALLER must set
    before starting the query — deliberately not mutated here: flipping
    a session-wide conf inside a query builder would silently change the
    provider under every other streaming query in the session, breaking
    any that resume a checkpoint written by the default provider.  At
    scale RocksDB is the store you want anyway (state spills to disk,
    changelog checkpointing, not JVM heap)."""
    proc = EmaSmoother()
    return stream.groupBy("channel").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="channel bigint, ts timestamp, value double, ema double",
        outputMode="append",
        timeMode="none",
    )


#: inactivity gap that closes a TWS session (matches window_session_30m)
TWS_SESSION_GAP_US = 30 * 60 * 1_000_000


class SessionFlusher(StatefulProcessor):
    """Timer-driven sessionizer on ``transformWithState`` — exercises
    the TWS features the EMA processor doesn't: EVENT-TIME TIMERS
    (``timeMode="eventTime"``) and timer lifecycle (register on every
    update, delete the stale one, flush in ``handleExpiredTimer``).

    Per key the ValueState holds the OPEN session (start/last micros,
    count, value total).  A session closes two ways, both emitting one
    row: an in-batch successor arriving past the 30-min gap, or the
    event-time timer at ``last_ts + gap`` expiring under the watermark
    — the inactivity flush ``applyInPandasWithState`` could only
    approximate with coarse per-batch timeouts.  Kill-and-resume
    safety comes from the state store: the open session and its timer
    are checkpointed together.

    Scale: O(1) state per key plus one pending timer — the production
    sessionizer shape for unbounded keys (the batch
    ``sessionize_gap_ids`` is the audit/backfill twin)."""

    def init(self, handle) -> None:
        self._handle = handle
        self._sess = handle.getValueState(
            "sess",
            "start_us long, last_us long, n long, total double, "
            "timer_ms long",
        )

    @staticmethod
    def _row(key, start_us, last_us, n, total) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "channel": pd.array([int(key[0])], dtype="int64"),
                "start_ts": pd.to_datetime([start_us], unit="us"),
                "end_ts": pd.to_datetime([last_us], unit="us"),
                "n_events": pd.array([int(n)], dtype="int64"),
                "total_value": pd.array([float(total)], dtype="float64"),
            }
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._sess.exists():
            start_us, last_us, n, total, timer_ms = self._sess.get()
        else:
            start_us = last_us = n = 0
            total = 0.0
            timer_ms = -1
        pdfs = list(rows)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values("ts")
        for ts, v in zip(pdf["ts"], pdf["value"]):
            us = int(ts.value // 1_000)
            if n > 0 and us - last_us > TWS_SESSION_GAP_US:
                yield self._row(key, start_us, last_us, n, total)
                start_us, n, total = us, 0, 0.0
            elif n == 0:
                start_us = us
            last_us = us
            n += 1
            total += float(v)
        if timer_ms >= 0:
            self._handle.deleteTimer(timer_ms)
        new_timer_ms = (last_us + TWS_SESSION_GAP_US) // 1_000
        self._handle.registerTimer(new_timer_ms)
        self._sess.update(
            (int(start_us), int(last_us), int(n), float(total),
             int(new_timer_ms))
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        if not self._sess.exists():
            return
        start_us, last_us, n, total, timer_ms = self._sess.get()
        if expiredTimerInfo.getExpiryTimeInMs() != timer_ms:
            return  # stale timer a deleteTimer raced with
        yield self._row(key, start_us, last_us, n, total)
        self._sess.clear()

    def close(self) -> None:
        pass


def stateful_session_tws(
    stream: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """``SessionFlusher`` wired through ``transformWithStateInPandas``
    with ``timeMode="eventTime"`` (timers expire against the
    watermark, so the stream needs one).  Same caller-side RocksDB
    provider note as ``stateful_ema_tws``."""
    from database_peak_streaming_spark.streaming.ops import as_event_time

    proc = SessionFlusher()
    return (
        as_event_time(stream, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("channel")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=(
                "channel bigint, start_ts timestamp, end_ts timestamp, "
                "n_events bigint, total_value double"
            ),
            outputMode="append",
            timeMode="eventTime",
        )
    )


#: value-bucket width for the TWS MapState counter
TWS_BUCKET_WIDTH = 100.0


class BucketCounter(StatefulProcessor):
    """Per-key value-histogram maintainer on ``transformWithState``
    MAPSTATE — the state type the EMA (ValueState) and sessionizer
    (timers) don't exercise: an unbounded-domain map of value-bucket
    -> running count per key, updated point-wise (only the buckets a
    batch touches are read/written, never the whole map — the property
    that makes MapState the right store when per-key state is a
    DICTIONARY, not a scalar).

    Emits the post-update (bucket, count) rows a batch touched — a
    changelog: downstream keeps the latest row per (key, bucket), and
    after a full replay that latest value equals the batch histogram
    exactly (pinned in tests/test_stateful.py)."""

    def init(self, handle) -> None:
        self._counts = handle.getMapState("counts", "bucket long", "n long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdfs = list(rows)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        touched: dict[int, int] = {}
        for v in pdf["value"]:
            b = int(float(v) // TWS_BUCKET_WIDTH)
            if b not in touched:
                existing = (
                    self._counts.getValue((b,))
                    if self._counts.containsKey((b,))
                    else None
                )
                touched[b] = int(existing[0]) if existing is not None else 0
            touched[b] += 1
        for b, n in touched.items():
            self._counts.updateValue((b,), (n,))
        yield pd.DataFrame(
            {
                "channel": pd.array(
                    [int(key[0])] * len(touched), dtype="int64"
                ),
                "bucket": pd.array(sorted(touched), dtype="int64"),
                "n": pd.array(
                    [touched[b] for b in sorted(touched)], dtype="int64"
                ),
            }
        )

    def close(self) -> None:
        pass


def stateful_bucket_counts_tws(stream: DataFrame) -> DataFrame:
    """``BucketCounter`` wired through ``transformWithStateInPandas``
    (same caller-side RocksDB provider note as ``stateful_ema_tws``)."""
    proc = BucketCounter()
    return stream.groupBy("channel").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="channel bigint, bucket bigint, n bigint",
        outputMode="append",
        timeMode="none",
    )


#: rolling-buffer depth for the TWS ListState median
TWS_ROLL_K = 5


class RollingBuffer(StatefulProcessor):
    """Per-key last-K rolling median on ``transformWithState``
    LISTSTATE — the fourth and final TWS state type (ValueState: EMA;
    timers: sessionizer; MapState: bucket counter; ListState: this) —
    the store for per-key state that is a bounded SEQUENCE: the buffer
    of the K most recent values, which a scalar can't hold and a map
    has no order for.  Emits every event with the exact median of the
    last K values (itself included) — the streaming twin of the
    ``win_rolling_median`` frame query, with O(K) state per key.

    Determinism contract (same as EmaSmoother): per-key event-time
    ordered arrival; rows are (ts, event_id)-sorted inside each batch
    and the replayed chunks are ts-ordered across batches, so the
    streamed buffer walks the series in exactly the batch frame
    order."""

    def init(self, handle) -> None:
        self._buf = handle.getListState("buf", "cents long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        pdfs = list(rows)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        buf = [int(t[0]) for t in self._buf.get()]
        medians = []
        for c in pdf["cents"]:
            buf.append(int(c))
            if len(buf) > TWS_ROLL_K:
                buf.pop(0)
            s = sorted(buf)
            mid = len(s) // 2
            med = (
                float(s[mid])
                if len(s) % 2
                else (s[mid - 1] + s[mid]) / 2.0
            )
            medians.append(med / 100.0)
        self._buf.put([(v,) for v in buf])
        yield pd.DataFrame(
            {
                "channel": pdf["channel"].astype("int64"),
                "event_id": pdf["event_id"].astype("int64"),
                "rolling_median": pd.array(medians, dtype="float64"),
            }
        )

    def close(self) -> None:
        pass


def stateful_rolling_median_tws(stream: DataFrame) -> DataFrame:
    """``RollingBuffer`` wired through ``transformWithStateInPandas``
    (same caller-side RocksDB provider note as ``stateful_ema_tws``)."""
    proc = RollingBuffer()
    return stream.groupBy("channel").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType="channel bigint, event_id bigint, rolling_median double",
        outputMode="append",
        timeMode="none",
    )


EMA_STATE_SCHEMA = T.StructType([T.StructField("ema", T.DoubleType())])


def stateful_ema(stream: DataFrame, watermark_delay: str = "10 minutes") -> DataFrame:
    """Per-channel running EMA via ``applyInPandasWithState`` — the
    e2e-tested form of ``EmaSmoother`` (same recurrence, same one-double
    state per key; see the class docstring).  State times out after the
    watermark passes an idle hour, so abandoned channels cost nothing."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (ema,) = state.get if state.exists else (None,)
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values("ts")
        out_ema = []
        for v in pdf["value"]:
            v = float(v)
            ema = v if ema is None else EMA_ALPHA * v + (1.0 - EMA_ALPHA) * ema
            out_ema.append(ema)
        if out_ema:
            state.update((float(ema),))
        state.setTimeoutTimestamp(_idle_timeout_ts(state, pdf["ts"].max()))
        yield pd.DataFrame(
            {
                "channel": pdf["channel"].astype("int64"),
                "ts": pdf["ts"],
                "value": pdf["value"].astype("float64"),
                "ema": out_ema,
            }
        )

    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("channel")
        .applyInPandasWithState(
            fn,
            outputStructType="channel bigint, ts timestamp, value double, ema double",
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- incremental Holt linear-trend smoother ------------------------------

#: (level, trend) once seeded; ``prev`` holds y_1 while n == 1.  Holt
#: needs TWO observations to seed (b_1 = y_2 - y_1), so the state
#: machine is: n=0 nothing seen -> n=1 prev=y_1 -> n>=2 recurrence.
HOLT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("prev", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def stateful_holt(
    stream: DataFrame, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Per-channel incremental Holt linear-trend smoothing via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``ts_holt_linear`` fold (operators/time_windows.py): same
    recurrence, same (y_2, y_2 - y_1) seeding, but O(1) state per key
    — TWO doubles of smoothing state instead of the key's history,
    which is the production shape when keys are unbounded and the
    batch fold is the audit/backfill path.  Each event emits the
    post-update (level, trend) pair, so a monitoring sink can read the
    instantaneous trend (the drift direction EMA cannot expose).
    State times out after the watermark passes an idle hour, like the
    EMA above."""
    from database_peak_streaming_spark.operators.time_windows import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_ONE_MINUS_ALPHA,
        HOLT_ONE_MINUS_BETA,
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        level, trend, prev, n = (
            state.get if state.exists else (0.0, 0.0, 0.0, 0)
        )
        chunks = list(pdfs)
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values("ts")
        out_level, out_trend = [], []
        for v in pdf["value"]:
            y = float(v)
            if n == 0:
                level, trend = y, 0.0
                prev, n = y, 1
            elif n == 1:
                level, trend = y, y - prev
                n = 2
            else:
                l_new = HOLT_ALPHA * y + HOLT_ONE_MINUS_ALPHA * (
                    level + trend
                )
                trend = (
                    HOLT_BETA * (l_new - level) + HOLT_ONE_MINUS_BETA * trend
                )
                level = l_new
            out_level.append(level)
            out_trend.append(trend)
        if out_level:
            state.update((float(level), float(trend), float(prev), int(n)))
        state.setTimeoutTimestamp(_idle_timeout_ts(state, pdf["ts"].max()))
        yield pd.DataFrame(
            {
                "channel": pdf["channel"].astype("int64"),
                "ts": pdf["ts"],
                "value": pdf["value"].astype("float64"),
                "level": out_level,
                "trend": out_trend,
            }
        )

    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, "ts")
        .withWatermark("ts", watermark_delay)
        .groupBy("channel")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "channel bigint, ts timestamp, value double, "
                "level double, trend double"
            ),
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- incremental CUSUM drift monitor -------------------------------------

CUSUM_STATE_SCHEMA = T.StructType([T.StructField("s_micros", T.LongType())])


def stateful_cusum(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    ref_micros: int = 55_000_000,
    h_micros: int = 200_000_000,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Incremental one-sided CUSUM (Page recursion) per key, emitting
    alarm rows (``S_t > h``) as they happen — the streaming twin of the
    batch window form in operators/time_windows.cusum_drift_flags
    (stream==batch equivalence is tested).

    State per key: ONE long (the current CUSUM in exact micro-units), so
    memory is O(keys) regardless of stream length; watermark timeout
    evicts idle keys.  Increments use the same floor(|v|*1e6 + 0.5)
    fixed-point rule as the batch form, making the recursion
    bit-identical across the two execution modes.  Same cross-batch
    ordering caveat as ``stateful_minute_first``: per-key event-time
    order across micro-batches (replay provides it)."""
    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField(ts_col, T.TimestampType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cusum", T.DoubleType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import math

        if state.hasTimedOut:
            state.remove()
            return
        (s,) = state.get if state.exists else (0,)
        out = []
        batch_max = None
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            mx = pdf[ts_col].max()
            batch_max = mx if batch_max is None else max(batch_max, mx)
            for ts, eid, val in zip(pdf[ts_col], pdf[id_col], pdf[value_col]):
                y = int(math.floor(abs(val) * 1_000_000 + 0.5)) - ref_micros
                s = max(0, s + y)
                if s > h_micros:
                    out.append((key[0], ts, int(eid), s / 1_000_000))
        state.update((s,))
        state.setTimeoutTimestamp(_idle_timeout_ts(state, batch_max))
        if out:
            yield pd.DataFrame(out, columns=[key_col, ts_col, id_col, "cusum"])

    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- incremental Markov transition extraction -----------------------------

TRANSITION_STATE_SCHEMA = T.StructType(
    [T.StructField("last_type", T.StringType())]
)


def stateful_transitions(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Per-key first-order transition extraction: emit one
    (prev_type, next_type) row per event after the first — the
    incremental feeder for the Markov matrix the batch query
    ``operators/behavior.events_markov_transitions`` computes
    (stream==batch equivalence is tested: streamed transition counts
    equal the batch lag-window counts).

    State per key: ONE string (the last event type seen), so memory is
    O(keys) at any stream length; watermark timeout evicts idle users.
    This is the online form of sequence featurization — downstream a
    ``foreachBatch`` sink upserts (prev, next) count deltas, giving a
    continuously-fresh transition matrix without re-scanning history.
    Same cross-batch ordering caveat as ``stateful_minute_first``:
    per-key event-time order across micro-batches (replay provides
    it)."""
    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField("prev_type", T.StringType()),
            T.StructField("next_type", T.StringType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last,) = state.get if state.exists else (None,)
        out = []
        batch_max = None
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col])
            mx = pdf[ts_col].max()
            batch_max = mx if batch_max is None else max(batch_max, mx)
            for t in pdf[type_col]:
                if last is not None:
                    out.append((key[0], last, t))
                last = t
        if last is not None:
            state.update((last,))
        state.setTimeoutTimestamp(_idle_timeout_ts(state, batch_max))
        if out:
            yield pd.DataFrame(
                out, columns=[key_col, "prev_type", "next_type"]
            )

    from database_peak_streaming_spark.streaming.ops import as_event_time

    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- incremental weighted reservoir (A-Res) --------------------------------

RESERVOIR_K = 10

RESERVOIR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.DoubleType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("weights", T.ArrayType(T.LongType())),
    ]
)


def stateful_weighted_reservoir(
    stream: DataFrame,
    key_col: str = "lang",
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    k: int = RESERVOIR_K,
) -> DataFrame:
    """Per-key incremental weighted reservoir (A-Res, Efraimidis &
    Spirakis 2006) over a stream: keep the k rows with the smallest
    ``-ln(u)/w`` where u derives from md5 of the row id — the SAME
    content-keyed rule as the batch ``sample_weighted_ares``
    (operators/sampling.py), so the streamed reservoir after any
    replay equals the batch sample exactly (A-Res top-k is an
    associative merge; content-derived uniforms remove the RNG).

    This is the streaming form of sample-proportional-to-volume corpus
    mixing: a training-blend sampler that stays exact while documents
    arrive continuously.  State per key: the k-row reservoir (three
    parallel arrays) — O(k) regardless of stream length; no timeout
    (the reservoir is the durable artifact, not a window).  Emits the
    CURRENT reservoir each micro-batch (update semantics; the last
    emission per key is the final sample)."""
    import hashlib
    import math

    m = float(16**13)
    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField(id_col, T.LongType()),
            T.StructField(weight_col, T.LongType()),
            T.StructField("ares_key", T.DoubleType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, ids, weights = state.get
            cur = list(zip(keys, ids, weights))
        else:
            cur = []
        for pdf in pdfs:
            for i, w in zip(pdf[id_col], pdf[weight_col]):
                hx = hashlib.md5(str(int(i)).encode()).hexdigest()[:13]
                u = (float(int(hx, 16)) + 1.0) / (m + 1.0)
                cur.append((-math.log(u) / float(w), int(i), int(w)))
        cur.sort(key=lambda t: (t[0], t[1]))
        cur = cur[:k]
        state.update(
            (
                [t[0] for t in cur],
                [t[1] for t in cur],
                [t[2] for t in cur],
            )
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(cur),
                id_col: [t[1] for t in cur],
                weight_col: [t[2] for t in cur],
                "ares_key": [t[0] for t in cur],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Misra-Gries counter budget for the streaming heavy-hitter tracker
MG_STREAM_K = 8

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def stateful_heavy_hitters(
    stream: DataFrame,
    key_col: str = "event_type",
    item_col: str = "user_id",
    k: int = MG_STREAM_K,
) -> DataFrame:
    """Incremental per-key Misra-Gries heavy hitters over a stream:
    O(k) counters of state per key track every item whose true
    frequency exceeds n/(k+1), with the classic deterministic
    guarantee true - n/(k+1) <= estimate <= true — the streaming twin
    of the batch two-pass `sketch_mg_heavy_hitters`
    (operators/sketches.py), whose exact-recount second pass a live
    stream cannot afford; the MG error bound is what it buys instead.

    Determinism across micro-batch boundaries: MG folds are
    order-sensitive, so the kernel sorts each batch's rows by
    (ts, event_id) — with the ts-ordered replay chunks this makes the
    full processing order the global event-time order, and the
    streamed result equals the same fold run over the batch rows in
    one pass (pinned in tests/test_stateful.py).  State per key is two
    k-length arrays + a count — bounded for any stream length; no
    timeout (the counter set is the durable artifact, not a window).
    Emits the CURRENT counter set each micro-batch tagged with the
    monotone n_seen (update semantics; rows at max n_seen per key are
    the final answer)."""
    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            key_field,
            T.StructField(item_col, T.LongType()),
            T.StructField("est_count", T.LongType()),
            T.StructField("n_seen", T.LongType()),
        ]
    )

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen = state.get
            ctr = dict(zip(items, counts))
        else:
            ctr, n_seen = {}, 0
        parts = [pdf[["ts", "event_id", item_col]] for pdf in pdfs]
        if parts:
            batch = pd.concat(parts).sort_values(["ts", "event_id"])
            for it in batch[item_col]:
                it = int(it)
                n_seen += 1
                if it in ctr:
                    ctr[it] += 1
                elif len(ctr) < k:
                    ctr[it] = 1
                else:
                    # full: decrement every counter, drop the zeros
                    # (the arriving item is NOT inserted — textbook MG)
                    for j in list(ctr):
                        ctr[j] -= 1
                        if ctr[j] == 0:
                            del ctr[j]
        state.update((list(ctr.keys()), list(ctr.values()), n_seen))
        ranked = sorted(ctr.items(), key=lambda t: (-t[1], t[0]))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(ranked),
                item_col: [t[0] for t in ranked],
                "est_count": [t[1] for t in ranked],
                "n_seen": [n_seen] * len(ranked),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: CEP sequence pattern (skip-till-next-match within a per-step gap)
#: and the step timeout.  Calibrated on the fixture: 24 h steps yield a
#: real match count at sf0.001 (19 completions over 15 users); tighter
#: gaps leave the detector vacuous on a month-long 1k-event trace.
CEP_PATTERN = ("click", "view", "purchase")
CEP_GAP_US = 24 * 3600 * 1_000_000


class PatternDetector(StatefulProcessor):
    """CEP-style SEQUENCE-PATTERN detector on ``transformWithState`` —
    the complex-event-processing primitive (Flink MATCH_RECOGNIZE /
    CEP library territory) the stateful shelf was missing: per user,
    detect ``CEP_PATTERN`` with skip-till-next-match semantics — an
    event advances the machine iff it matches the EXPECTED next step;
    non-matching events are skipped; a step arriving more than
    ``CEP_GAP_US`` after the previous accepted step resets the machine
    (then the resetting event itself may start a new match).  One
    match row (user, start_ts, end_ts) is emitted per completion and
    the machine restarts — non-overlapping greedy matches, the
    deterministic contract a batch oracle can replay.

    State: ONE (stage, first_us, last_us) triple per key in a
    ``ValueState`` — bounded memory at any key cardinality regardless
    of trace length (the reason CEP engines compile to automata
    instead of buffering windows).  Correctness contract (tested):
    with per-key event-time-ordered arrival, streamed matches equal a
    single-pass batch walk of the same automaton.
    """

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "cep", "stage int, first_us long, last_us long"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            stage, first_us, last_us = self._state.get()
        else:
            stage, first_us, last_us = 0, 0, 0
        pdfs = list(rows)
        pdf = pd.concat(pdfs) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        # normalize to ns explicitly before the //1000: a us-resolution
        # datetime column would otherwise yield MILLIseconds and shift
        # every gap comparison 1000x (r11 ADVICE)
        us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).tolist()
        out_start, out_end = [], []
        for t_us, etype in zip(us, pdf["event_type"]):
            if stage > 0 and t_us - last_us > CEP_GAP_US:
                stage = 0
            if etype == CEP_PATTERN[stage]:
                if stage == 0:
                    first_us = t_us
                stage += 1
                last_us = t_us
                if stage == len(CEP_PATTERN):
                    out_start.append(first_us)
                    out_end.append(t_us)
                    stage = 0
        self._state.update((int(stage), int(first_us), int(last_us)))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])] * len(out_start),
                "start_ts": pd.to_datetime(out_start, unit="us"),
                "end_ts": pd.to_datetime(out_end, unit="us"),
            }
        )

    def close(self) -> None:
        pass


def stateful_pattern_tws(stream: DataFrame) -> DataFrame:
    """``PatternDetector`` wired through ``transformWithStateInPandas``
    (same runtime requirements as ``stateful_ema_tws``: vendored
    protobuf + caller-set RocksDB provider)."""
    proc = PatternDetector()
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=(
            "user_id bigint, start_ts timestamp, end_ts timestamp"
        ),
        outputMode="append",
        timeMode="none",
    )
