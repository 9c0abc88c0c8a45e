"""Streaming breadth operators (SURVEY.md §2B streaming rows): dedup,
stream-static join, sliding/session windows, late-data handling.

Each takes a *streaming* DataFrame and returns a transformed streaming
DataFrame — composition stays declarative, so Catalyst's incremental
planner owns state management.  Semantics are verified against batch
equivalents in tests/test_streaming.py (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce ``ts_col`` to TIMESTAMP (LTZ) so it can carry a watermark.

    Parquet written with tz-naive timestamps (the driver's testdata and
    most pandas/arrow writers) reads back as TIMESTAMP_NTZ under Spark
    4's parquet type inference, and ``withWatermark`` rejects NTZ event
    time.  With the session timezone pinned to UTC (session.py) the cast
    is value-preserving; on an already-LTZ column it is a no-op."""
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def streaming_dedup(
    stream: DataFrame, keys: list[str], watermark_col: str, delay: str
) -> DataFrame:
    """Exactly-once-per-key dedup with watermark-bounded state
    (SURVEY.md §2B streaming-dedup [N]): duplicates arriving within
    ``delay`` of first sight are dropped; state for keys older than the
    watermark is evicted, so memory is bounded by the dup horizon — the
    scale contract exact global dedup cannot offer a stream."""
    stream = as_event_time(stream, watermark_col)
    return stream.withWatermark(watermark_col, delay).dropDuplicates(keys)


def streaming_dedup_within_watermark(
    stream: DataFrame, keys: list[str], watermark_col: str, delay: str
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` (Spark 3.5+) — the dedup whose
    GUARANTEE is time-scoped rather than key-scoped: events with the
    same key whose event times fall within ``delay`` of each other
    dedup exactly once, and state evicts as the watermark passes each
    key's FIRST-SEEN time + delay.  Operationally different from
    ``streaming_dedup`` above in the contract that matters for
    at-least-once sources: plain dropDuplicates keeps a key's state
    until ITS OWN event time expires (a late dup re-emits once state
    is gone and the dup's event time is newer), while the
    WithinWatermark form pins eviction to first-sight, matching the
    "redelivery happens within N minutes" shape of Kafka/queue
    retries.  State is bounded by keys-per-delay-window either way."""
    stream = as_event_time(stream, watermark_col)
    return stream.withWatermark(
        watermark_col, delay
    ).dropDuplicatesWithinWatermark(keys)


def stream_static_join(stream: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Enrich a stream with a static dimension (stream-static inner
    join).  The static side is planned per micro-batch — broadcast when
    small (it is here), so no stream-side shuffle."""
    return stream.join(F.broadcast(dim), on=on, how="inner")


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key_l: str,
    key_r: str,
    ts_l: str,
    ts_r: str,
    delay: str,
    upper: str,
) -> DataFrame:
    """Stream-stream inner join with an event-time interval bound
    (attribution shape: right-side events within ``upper`` after a
    left-side event for the same key).

    Both sides carry watermarks and the join condition carries a
    two-sided time-range, which is what lets the incremental planner
    EVICT buffered rows: left state is held for ``delay`` + ``upper``,
    right state for ``delay`` — without the range the state would grow
    unboundedly.  Physically both streams shuffle on the equality key,
    so the 100 TB/day story is the same hash-partitioned join as batch,
    just with watermark-bounded buffers instead of full materialization.
    """
    lw = as_event_time(left, ts_l).withWatermark(ts_l, delay)
    rw = as_event_time(right, ts_r).withWatermark(ts_r, delay)
    cond = (
        (F.col(key_l) == F.col(key_r))
        & (F.col(ts_r) >= F.col(ts_l))
        & (F.col(ts_r) <= F.col(ts_l) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner")


def stream_stream_interval_join_left(
    left: DataFrame,
    right: DataFrame,
    key_l: str,
    key_r: str,
    ts_l: str,
    ts_r: str,
    delay: str,
    upper: str,
) -> DataFrame:
    """LEFT OUTER form of the interval join: matched pairs emit like the
    inner form; an UNMATCHED left row emits with right-side nulls only
    once the watermark proves no match can still arrive — i.e. when its
    buffered state expires (``delay`` + ``upper`` past its event time).
    That state-eviction null is the semantic difference from batch: a
    left row younger than the final watermark stays buffered forever in
    an unterminated stream, so equivalence with the batch left join
    holds for rows older than (max event time - delay - upper), which is
    what the test asserts.  Same physical shape as the inner join: both
    streams shuffle on the equality key, watermark-bounded buffers."""
    lw = as_event_time(left, ts_l).withWatermark(ts_l, delay)
    rw = as_event_time(right, ts_r).withWatermark(ts_r, delay)
    cond = (
        (F.col(key_l) == F.col(key_r))
        & (F.col(ts_r) >= F.col(ts_l))
        & (F.col(ts_r) <= F.col(ts_l) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "leftOuter")


def stream_stream_interval_join_full(
    left: DataFrame,
    right: DataFrame,
    key_l: str,
    key_r: str,
    ts_l: str,
    ts_r: str,
    delay: str,
    upper: str,
) -> DataFrame:
    """FULL OUTER form of the interval join (Spark >= 3.1): matched
    pairs emit like the inner form; unmatched rows from EITHER side
    emit null-padded once the watermark proves no partner can still
    arrive.  Completes the stream-stream join family (inner / left /
    full) — the reconciliation shape ("every click AND every purchase
    accounted for, matched where possible") that audit pipelines run
    continuously.  Same physical plan as the other two: both streams
    hash-shuffle on the equality key with watermark-bounded buffers;
    the right side's unmatched state is held ``delay`` and the left's
    ``delay + upper``, exactly the left-outer bounds plus the mirrored
    right-side eviction."""
    lw = as_event_time(left, ts_l).withWatermark(ts_l, delay)
    rw = as_event_time(right, ts_r).withWatermark(ts_r, delay)
    cond = (
        (F.col(key_l) == F.col(key_r))
        & (F.col(ts_r) >= F.col(ts_l))
        & (F.col(ts_r) <= F.col(ts_l) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "fullOuter")


def tumbling_counts(
    stream: DataFrame, ts_col: str, length: str, delay: str
) -> DataFrame:
    """Tumbling event-time counts+sums (A1/A2 on arbitrary streams)."""
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, length).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


def tumbling_distinct_users(
    stream: DataFrame, ts_col: str, key: str, length: str, delay: str
) -> DataFrame:
    """Windowed DISTINCT-cardinality on a stream via HLL++ sketch state
    (``approx_count_distinct``): per-window state is a fixed-size sketch
    merged incrementally across micro-batches, never the key set — the
    only way a distinct-users-per-window metric is computable over an
    unbounded stream with bounded memory (exact ``countDistinct`` is
    unsupported in streaming aggregation for exactly this reason).
    rsd=0.02 matches the batch surface (``agg_approx_distinct``); the
    stream==batch equivalence test bounds the estimate against the
    exact batch recompute."""
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, length).alias("w"))
        .agg(
            F.approx_count_distinct(key, 0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(F.col("w.start").alias("window_start"), "approx_users", "n")
    )


def sliding_counts(
    stream: DataFrame, ts_col: str, length: str, slide: str, delay: str
) -> DataFrame:
    """Sliding event-time windows on a stream."""
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, length, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(
    stream: DataFrame, ts_col: str, key: str, gap: str, delay: str
) -> DataFrame:
    """Per-key session windows with inactivity ``gap`` on a stream."""
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def session_counts_dynamic(
    stream: DataFrame, ts_col: str, key: str, delay: str
) -> DataFrame:
    """Per-key session windows whose inactivity gap is an EXPRESSION of
    the row — Spark 4's dynamic-gap ``session_window(ts, gap_expr)``:
    here a purchase extends its session's life by 2 h, anything else by
    30 min (the same rule as the batch
    ``operators/behavior.sessionize_dynamic_gap``, which from the next
    event's perspective reads "the allowed gap depends on the PREVIOUS
    event's type").  Works identically on a stream (state-store session
    merge under the watermark) and in batch mode — the stream==batch
    equality is pinned in tests/test_streaming.py."""
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("2 hours")
    ).otherwise(F.lit("30 minutes"))
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("n_purchases"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "n_purchases",
        )
    )


def windowed_value_histogram(
    stream: DataFrame,
    ts_col: str,
    key: str,
    length: str,
    delay: str,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Streaming sufficient statistics for distribution monitoring:
    per-(window, key, value-bucket) counts.  The bucketization is the
    whole trick — per-window state is bounded by the value DOMAIN
    (range / bucket_width buckets), not the event count, so the
    aggregation is an ordinary watermark-evicted incremental count at
    any stream rate.  Finalization (KS drift, histogram diffs, ...)
    runs as a tiny batch computation over the materialized counts —
    the sketch-in-stream / finalize-in-batch split
    `tumbling_distinct_users` uses for cardinality, applied to whole
    distributions."""
    bucket = (
        F.floor(F.col("value") / F.lit(bucket_width)).cast("long").alias("bucket")
    )
    # NULL values keep flowing as a NULL bucket — deliberately NOT
    # filtered here: a deterministic filter gets pushed BELOW the
    # EventTimeWatermark node by the optimizer, so dropping null-value
    # rows pre-aggregation would also drop the end-of-stream flush
    # sentinel (whose value is null) from event-time tracking and the
    # final window would never close.  The finalizer drops the null
    # bucket instead.
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, length).alias("w"), F.col(key), bucket)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key, "bucket", "n")
    )


def ks_drift_from_histogram(hist: DataFrame, key: str = "event_type") -> DataFrame:
    """Finalize the streaming histogram into per-(window, key) KS drift
    vs the window's pooled distribution: D = sup over buckets of
    |F_key - F_pool| — the batch `stats_ks_drift_by_type` statistic,
    at bucket resolution, per window.

    Input is the (window, key, bucket, n) output of
    `windowed_value_histogram` (batch DataFrame — e.g. the contents of
    its sink).  The dense (window x key x bucket) grid this builds is
    bounded by windows x |keys| x (domain / width) — metadata-sized —
    and is REQUIRED for correctness: a key missing a bucket where the
    pool has mass still contributes that bucket's |F_key - F_pool|
    gap, which a sparse-join formulation would silently skip."""
    hist = hist.where(F.col("bucket").isNotNull())
    support = hist.select("window_start", "bucket").distinct()
    keys = hist.select("window_start", key).distinct()
    grid = support.join(keys, "window_start")
    dense = grid.join(hist, ["window_start", key, "bucket"], "left").fillna(
        0, subset=["n"]
    )
    from pyspark.sql import Window as W

    wk = (
        W.partitionBy("window_start", key)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = (
        W.partitionBy("window_start")
        .orderBy("bucket")
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = dense.select(
        "window_start",
        key,
        "bucket",
        F.sum("n").over(wk).alias("cum_k"),
        F.sum("n").over(wp).alias("cum_all"),
    )
    totals = cum.groupBy("window_start", key).agg(
        F.max("cum_k").alias("n_k"), F.max("cum_all").alias("n_all")
    )
    return (
        cum.join(totals, ["window_start", key])
        .groupBy("window_start", key)
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_k") / F.col("n_k")
                        - F.col("cum_all") / F.col("n_all")
                    )
                ),
                6,
            ).alias("ks_d"),
            F.max("n_k").cast("long").alias("n_events"),
        )
        .orderBy("window_start", key)
    )


def psi_from_histogram(hist: DataFrame, key: str = "event_type") -> DataFrame:
    """Finalize the streaming histogram into window-over-window PSI per
    key: each window's bucket distribution scored against the SAME
    key's distribution in the immediately preceding window (PSI =
    sum_b (p_cur - p_prev) * ln(p_cur / p_prev), 0.5-Laplace smoothed
    so empty cells stay finite) — the continuous-monitoring twin of the
    batch era-split `stats_psi_value_drift`, sharing its rule of
    thumb (< 0.1 stable, > 0.25 action).

    Input is the (window, key, bucket, n) output of
    `windowed_value_histogram`.  The dense (window x key x bucket)
    grid is domain-bounded metadata and REQUIRED: a bucket the
    previous window populated but the current one missed must
    contribute its smoothed divergence, and the lag over the dense
    grid is what makes "previous window" well-defined even for a key
    silent in some window (it scores as an all-smoothing-floor
    distribution, maximal drift — the alert you want)."""
    hist = hist.where(F.col("bucket").isNotNull())
    wins = hist.select("window_start").distinct()
    keys = hist.select(key).distinct()
    buckets = hist.select("bucket").distinct()
    # bucket-set size rides as a broadcast scalar (1-row aggregate of a
    # domain-bounded distinct) — never a driver pull
    n_buckets = buckets.agg(F.count(F.lit(1)).alias("n_b"))
    dense = (
        wins.crossJoin(keys)
        .crossJoin(buckets)
        .join(hist, ["window_start", key, "bucket"], "left")
        .fillna(0, subset=["n"])
        .crossJoin(F.broadcast(n_buckets))
    )
    from pyspark.sql import Window as W

    lag_w = W.partitionBy(key, "bucket").orderBy("window_start")
    lagged = dense.withColumn("n_prev", F.lag("n", 1).over(lag_w)).where(
        F.col("n_prev").isNotNull()
    )
    totals = lagged.groupBy("window_start", key).agg(
        F.sum("n").alias("t_cur"), F.sum("n_prev").alias("t_prev")
    )
    p_cur = (F.col("n") + F.lit(0.5)) / (
        F.col("t_cur") + F.lit(0.5) * F.col("n_b")
    )
    p_prev = (F.col("n_prev") + F.lit(0.5)) / (
        F.col("t_prev") + F.lit(0.5) * F.col("n_b")
    )
    return (
        lagged.join(totals, ["window_start", key])
        .groupBy("window_start", key)
        .agg(
            F.round(
                F.sum((p_cur - p_prev) * F.log(p_cur / p_prev)), 6
            ).alias("psi"),
            F.max("t_prev").cast("long").alias("n_prev_events"),
            F.max("t_cur").cast("long").alias("n_cur_events"),
        )
        .orderBy("window_start", key)
    )


def merge_rollup_delta(mv: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Monoid merge of a (day, event_type) rollup delta into the stored
    materialized view — the per-batch step of the streaming MV sink
    (the batch-checkable algebra is ``operators/storage.
    incremental_rollup_merge``: counts and decimal sums add, so
    merging per-batch rollups equals re-aggregating from scratch).
    ``mv`` is None on the first batch."""
    if mv is None:
        return delta
    from pyspark.sql import types as T

    zero = F.lit(0).cast(T.DecimalType(28, 6))
    return (
        mv.alias("m")
        .join(
            delta.alias("d"),
            (F.col("m.day") == F.col("d.day"))
            & (F.col("m.event_type") == F.col("d.event_type")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("m.day"), F.col("d.day")).alias("day"),
            F.coalesce(F.col("m.event_type"), F.col("d.event_type")).alias(
                "event_type"
            ),
            (
                F.coalesce(F.col("m.n_events"), F.lit(0))
                + F.coalesce(F.col("d.n_events"), F.lit(0))
            ).alias("n_events"),
            (
                F.coalesce(F.col("m._dsum"), zero)
                + F.coalesce(F.col("d._dsum"), zero)
            ).alias("_dsum"),
        )
    )


def rollup_mv_sink(spark, mv_dir: str):
    """``foreachBatch`` sink maintaining a (day, event_type) rollup MV
    on parquet: each micro-batch is rolled up to the grain (delta is
    grain-sized, never event-sized) and monoid-merged into the stored
    view — the streaming materialized-view pattern whose correctness
    the batch query ``incremental_rollup_merge`` proves declaratively
    (stream==batch equality is pinned in tests/test_streaming.py).

    EXACTLY-ONCE under re-delivery: foreachBatch is at-least-once (a
    crash between sink completion and checkpoint commit re-delivers
    the epoch), and a re-merged delta would DOUBLE-COUNT.  The sink
    therefore writes the last-applied epoch id INSIDE the new snapshot
    before the directory swap — a snapshot is COMMITTED exactly when
    its ``_epoch`` marker exists (the KeyedUpsertStore pattern,
    minimal; crash-injection tested in tests/test_fault_tolerance.py).

    The swap itself is two steps (rmtree old, rename new into place),
    so every sink entry begins with RECOVERY: a ``.next`` snapshot
    bearing a complete ``_epoch`` marker is always at least as new as
    ``mv_dir`` and is adopted (this heals a crash in the rmtree/rename
    window, where mv_dir is gone but the finished snapshot survives —
    without it the next restart would silently rebuild from an empty
    MV); a ``.next`` without the marker is an aborted write and is
    discarded.

    Scale: per batch this reads/writes the MV (grain-sized); the raw
    history is never re-aggregated — the point of incremental
    maintenance."""
    import os
    import shutil

    nxt = mv_dir + ".next"

    def _recover() -> None:
        if os.path.exists(os.path.join(nxt, "_epoch")):
            # complete, committed snapshot: adopt it (epoch inside is
            # >= any epoch mv_dir could carry)
            shutil.rmtree(mv_dir, ignore_errors=True)
            os.replace(nxt, mv_dir)
        else:
            # partial write (crash before the marker): roll back
            shutil.rmtree(nxt, ignore_errors=True)

    def _last_epoch() -> int:
        marker = os.path.join(mv_dir, "_epoch")
        if os.path.exists(marker):
            with open(marker) as f:
                return int(f.read().strip())
        return -1

    def _sink(batch_df: DataFrame, epoch: int) -> None:
        _recover()
        if epoch <= _last_epoch():
            return  # re-delivered epoch: already merged, skip
        delta = batch_df.groupBy(
            F.to_date("ts").alias("day"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).alias("_dsum"),
        )
        mv = (
            spark.read.option("pathGlobFilter", "*.parquet").parquet(mv_dir)
            if os.path.exists(mv_dir)
            else None
        )
        merged = merge_rollup_delta(mv, delta)
        # copy-on-write: the merge READS mv_dir, so write the new
        # version beside it, stamp the epoch inside it, then swap —
        # any crash from here to the rename is healed by _recover()
        merged.write.mode("overwrite").parquet(nxt)
        with open(os.path.join(nxt, "_epoch"), "w") as f:
            f.write(str(epoch))
        shutil.rmtree(mv_dir, ignore_errors=True)
        os.replace(nxt, mv_dir)

    return _sink


def tumbling_ohlc(
    stream: DataFrame, ts_col: str, key: str, length: str, delay: str
) -> DataFrame:
    """Streaming OHLC candle bars — the continuous form of the batch
    `window_ohlc_bars` operator: per (key, tumbling window), OPEN/CLOSE
    via ``min_by``/``max_by`` on the (ts, event_id) total order plus
    HIGH/LOW/volume.  Every aggregate here carries O(1) partial state
    (an extremum or an (argument, ordering) pair), so the window state
    per (key, window) is constant regardless of event volume — the
    property that makes a candle feed computable on an unbounded
    stream, emitted exactly once per window when the watermark closes
    it."""
    okey = F.struct(F.col(ts_col), F.col("event_id"))
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        as_event_time(stream, ts_col)
        .withWatermark(ts_col, delay)
        .select(key, ts_col, "event_id", cents.alias("cents"))
        .groupBy(F.col(key), F.window(ts_col, length).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min_by("cents", okey) / 100.0, 6).alias("open"),
            F.round(F.max("cents") / 100.0, 6).alias("high"),
            F.round(F.min("cents") / 100.0, 6).alias("low"),
            F.round(F.max_by("cents", okey) / 100.0, 6).alias("close"),
        )
        .select(
            key, F.col("w.start").alias("window_start"),
            "n_events", "open", "high", "low", "close",
        )
    )
