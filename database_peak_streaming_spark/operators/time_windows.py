"""Event-time window aggregation operators (SURVEY.md §2B streaming rows,
batch-checkable form).

Reference parity: A1/A2 — the ~97 ms processing-time micro-batch window
with per-window means (``database_peak_streaming.py:21-45``) — expressed
as *event-time* tumbling windows, the reproducible generalization
(SURVEY.md §7 "hard parts": event-time-first).  The same ``F.window`` /
``F.session_window`` expressions run identically under Structured
Streaming (streaming/pipeline.py reuses them); batch mode here gives the
DuckDB-checkable semantics, and the streaming tests assert
stream==batch equivalence.

Scale notes: window aggregation shuffles on (window, keys); state in
streaming mode is bounded by the watermark.  Sliding windows multiply
rows by (length/slide) — kept at 2x here; session windows are
gaps-and-islands, one shuffle + per-key sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.common import davg, dsum
from database_peak_streaming_spark.sources.batch import load_table


def window_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows over events: per-window,
    per-type counts and value aggregates (A1+A2 generalized)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", "sum_value"),
            davg("value", "avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
            "avg_value",
        )
        .orderBy("window_start", "event_type")
    )


def window_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): each event lands in 2
    windows."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


def window_session_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: per-user activity sessions closed by a 30-minute
    inactivity gap.  ``session_window`` in Spark; gaps-and-islands over
    lag() in the oracle — same semantics."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


def window_downsample_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute resample keeping the first event per bucket — the
    engine's semantic form of the reference's 1/N strided downsample to
    the long-term tier (A4, ``database_peak_streaming.py:52-56``; intent
    "one per minute" per README.md:15).  First = min event_id within the
    minute (explicit order; the reference relied on insertion order)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n_in_bucket"))
        .select(F.col("w.start").alias("minute_start"), "first_event_id", "n_in_bucket")
        .orderBy("minute_start")
    )


def window_stride_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal positional stride ``[::N]`` (A4's exact semantics) over
    an explicit total order: every 600th event by event_id rank.  Spark
    has no stable physical row order — the ordering column makes the
    reference's implicit assumption explicit (SURVEY.md §7)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.orderBy("event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") - 1) % 600 == 0)
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id")
    )


def resample_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample with last-observation-carried-forward: a
    sparse event series (errors from a user cohort, ~0.4/hour at sf0.01)
    re-gridded onto a complete hourly axis, gaps filled with the last
    seen hourly average (leading gaps stay NULL, flagged).

    The downsample ops (A4) assume every bucket has data; real sensor
    feeds drop scans, and the analysis side (`analyze_data.py:66-82`
    plots assume contiguous series) needs the holes closed.  The axis is
    `sequence()` + explode — generated, not stored.  The LOCF window
    here is a single global series (720 rows — driver-trivial); with a
    per-sensor key the same window partitions by that key and
    distributes: state is one value per partition, the scan stays
    parallel."""
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("event_type") == "error") & (F.col("user_id") % 7 == 0)
    )
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        davg("value", "avg_value")
    )
    axis = spark.sql(
        """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
                                   timestamp'2024-01-30 23:00:00',
                                   interval 1 hour)) AS hour"""
    )
    from pyspark.sql import Window

    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        axis.join(hourly, "hour", "left")
        .select(
            "hour",
            F.coalesce(
                F.col("avg_value"),
                F.last("avg_value", ignorenulls=True).over(w),
            ).alias("filled_value"),
            F.col("avg_value").isNull().alias("was_gap"),
        )
        .orderBy("hour")
    )


def resample_gap_fill_locf_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed LOCF: the scale-safe form of ``resample_gap_fill_locf``.

    The single-series variant's window is ``Window.orderBy("hour")`` — a
    deliberate single-partition scan, fine for one 720-row series and
    nothing else.  Here the same fill runs per key (error-event cohorts,
    ``user_id % 5`` as a stand-in sensor id): the generated axis is
    (cohort x hour), the window partitions by cohort, and the carried
    state is ONE value per key — so 1 M sensors parallelize across
    executors while each key's scan stays ordered.  This is the form a
    100 TB sensor fleet actually runs (functions/sensor.py:gap_fill_locf
    is the reusable library kernel with the same contract)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "error")
    hourly = ev.groupBy(
        (F.col("user_id") % 5).alias("cohort"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(davg("value", "avg_value"))
    axis_hours = spark.sql(
        """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
                                   timestamp'2024-01-30 23:00:00',
                                   interval 1 hour)) AS hour"""
    )
    cohorts = spark.range(5).select(F.col("id").alias("cohort"))
    axis = cohorts.crossJoin(axis_hours)
    w = (
        Window.partitionBy("cohort")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        axis.join(hourly, ["cohort", "hour"], "left")
        .select(
            "cohort",
            "hour",
            F.coalesce(
                F.col("avg_value"),
                F.last("avg_value", ignorenulls=True).over(w),
            ).alias("filled_value"),
            F.col("avg_value").isNull().alias("was_gap"),
        )
        .orderBy("cohort", "hour")
    )


#: CUSUM constants: reference level (target + slack) in micro-units and
#: the alarm threshold.  Mean event value is ~50, so drift pressure is
#: negative on average and alarms fire only on genuine high-value bursts.
CUSUM_REF_MICROS = 55_000_000
CUSUM_H_MICROS = 200_000_000


def cusum_drift_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event_type — the classic
    change-point monitor (Page 1954), usually written as the recursion
    ``S_t = max(0, S_{t-1} + y_t)``.

    The recursion IS window-expressible (so it stays declarative and
    cross-engine checkable): with ``C_t = running sum of y``,
    ``S_t = C_t - min(0, min_{i<=t} C_i)`` — two window expressions over
    ONE sort, no recursion, no UDF.  Increments are exact long
    micro-units, so the running sums are bit-identical across engines
    and row orders.

    Scale: per-key sequential scan is inherent to CUSUM; keys are the
    parallelism unit (one window partition per event_type).  The
    incremental streaming twin of this recursion is the
    ``applyInPandasWithState`` pattern in streaming/stateful.py.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    y = (
        F.signum("value")
        * F.floor(F.abs(F.col("value")) * 1_000_000 + F.lit(0.5))
    ).cast("long") - F.lit(CUSUM_REF_MICROS)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.select("event_type", "ts", "event_id", y.alias("y")).withColumn(
        "c", F.sum("y").over(w)
    )
    s = c.withColumn(
        "s", F.col("c") - F.least(F.lit(0).cast("long"), F.min("c").over(w))
    )
    flagged = F.col("s") > CUSUM_H_MICROS
    return (
        s.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(flagged.cast("long")).alias("n_flagged"),
            F.round(F.max("s") / 1_000_000, 6).alias("max_cusum"),
            F.min(F.when(flagged, F.col("ts"))).alias("first_flag_ts"),
        )
        .orderBy("event_type")
    )


#: seasonal-naive forecast: train/evaluation split boundary (fixture
#: events span all of 2024-01 at every SF, so the cut holds 9 days out).
FORECAST_SPLIT = "2024-01-22"


def forecast_seasonal_naive_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: the per-(event_type, hour-of-
    day) mean over the TRAIN weeks predicts every holdout event's value;
    the query reports per-type holdout MAE against that profile plus
    the train profile's peak hour — the baseline every real forecaster
    must beat, and the drift check (profile vs holdout error) a
    monitoring pipeline alerts on.

    Two passes over events split by a literal timestamp (both pushed to
    the parquet scan): train collapses to a 120-cell profile (exact
    decimal means) that broadcasts onto the holdout rows; unseen
    (type, hour) cells drop their holdout rows by the inner join
    (counted via n_eval).  The profile means are exact-decimal sums
    divided as doubles (engine-identical); the final MAE is a plain
    double mean rounded to 6dp — association-order noise is ~1e-12
    against a 1e-6 rounding grid."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", "ts", "value", F.hour("ts").alias("hod")
    )
    cut = F.lit(FORECAST_SPLIT).cast("timestamp")
    profile = (
        ev.where(F.col("ts") < cut)
        .groupBy("event_type", "hod")
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("baseline")
        )
    )
    holdout = ev.where(F.col("ts") >= cut)
    scored = holdout.join(F.broadcast(profile), ["event_type", "hod"])
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(
                F.avg(F.abs(F.col("value") - F.col("baseline"))), 6
            ).alias("mae"),
        )
        .orderBy("event_type")
    )


def window_hourly_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per (tumbling hour, event type) — the event-time
    window x ranking composition (leaderboards, per-window extremes)
    that neither family shows alone.  The tumbling bucket comes from
    ``window()`` (the same streaming-compatible assignment as
    window_tumbling_1h, so the query lifts to Structured Streaming by
    swapping the source); ranking is a per-(bucket, type) row_number
    with an event_id tie-break.  One shuffle on the composite key; rank
    state is O(k) per group under the filter."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    bucketed = ev.select(
        F.window("ts", "1 hour").start.alias("hour_start"),
        "event_type",
        "event_id",
        "value",
    )
    w = W.partitionBy("hour_start", "event_type").orderBy(
        F.desc("value"), "event_id"
    )
    return (
        bucketed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            "hour_start",
            "event_type",
            "rnk",
            "event_id",
            F.round("value", 6).alias("value"),
        )
        .orderBy("hour_start", "event_type", "rnk")
    )


def events_minute_load_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-load profile: events-per-minute distribution per event
    type (active-minute count, p50/p95 and max rate) — the capacity
    numbers a streaming deployment sizes its triggers and state stores
    against (BASELINE.md's windows/s envelope is exactly this figure's
    production twin).

    Two aggregations: corpus -> per-(type, minute) counts (one shuffle,
    uniform keys), then a |types|-key percentile rollup over
    minute-counts — integer inputs, so the interpolated percentiles
    are engine-identical.  Minutes with zero events are absent by
    construction (the profile is over ACTIVE minutes; the gap-fill twin
    is resample_gap_fill_locf)."""
    ev = load_table(spark, "events", sf_dir)
    per_min = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        per_min.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_active_minutes"),
            F.round(F.expr("percentile(n, 0.5D)"), 6).alias("p50_per_min"),
            F.round(F.expr("percentile(n, 0.95D)"), 6).alias("p95_per_min"),
            F.max("n").alias("max_per_min"),
        )
        .orderBy("event_type")
    )


#: EMA smoothing factor — matches streaming/stateful.EMA_ALPHA so the
#: batch fold below is the driver-verifiable twin of the streaming op.
EMA_FOLD_ALPHA = 0.2


def ema_batch_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key exponential moving average as a BATCH declarative fold —
    the oracle-checkable twin of the streaming ``stateful_ema``
    operator (streaming/stateful.py; same recurrence
    ``ema_t = a*v_t + (1-a)*ema_{t-1}``, seeded ``ema_0 = v_0``).

    A sequential recurrence has no window-algebra form (unlike CUSUM's
    prefix-min trick above), but it IS a left fold — so the declarative
    plan is collect_list -> array_sort -> ``F.aggregate`` (JVM
    higher-order function, no Python).  Both engines fold the same
    ts-ordered values with the same double arithmetic in the same
    order, so the result is bit-identical before the 6dp rounding
    (DuckDB's ``list_reduce`` seeds from the first element exactly like
    the slice-init here).

    Scale: one shuffle; per-key state is the key's full value list, so
    keys are the parallelism unit and per-key cardinality the memory
    bound — same contract as any per-key sequential scan (CUSUM above).
    For unbounded keys the streaming stateful form (O(1) state per key)
    is the production path; this batch form is the audit/backfill
    path."""
    ev = load_table(spark, "events", sf_dir)
    a = F.lit(EMA_FOLD_ALPHA)
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.transform(F.col("arr"), lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return (
        ev.groupBy("event_type")
        .agg(arr.alias("arr"))
        .select(
            "event_type",
            F.size("arr").cast("long").alias("n_events"),
            F.round(ema, 6).alias("final_ema"),
        )
        .orderBy("event_type")
    )


def events_gap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inactivity-gap detection: emit every pair of
    consecutive events more than 24 h apart — the monitoring primitive
    behind churn alerts, sensor-dropout detection, and SLA "no data
    since" pages (the dual of sessionization: the GAPS are the signal,
    not the islands).

    One shuffle on user_id feeding a lag window; the gap predicate is
    row-local after that.  Gap length is exact integer epoch-second
    arithmetic, so the filter and output are engine-identical."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.lag("ts").over(w).alias("prev_ts"),
    ).withColumn(
        "gap_sec",
        F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"),
    )
    return (
        gaps.filter(F.col("gap_sec") > 24 * 3600)
        .select(
            "user_id",
            "prev_ts",
            F.col("ts").alias("resumed_ts"),
            "gap_sec",
        )
        .orderBy("user_id", "resumed_ts")
    )


def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 50-event Pearson correlation between value and
    event-time per event type — the windowed trend detector (corr
    against time ~ normalized slope direction) that drift monitors
    threshold on; completes the window-function surface with a
    BIVARIATE aggregate over a moving frame (everything else in the
    windows pack is univariate).

    One shuffle per key feeding one window sort; corr is a one-pass
    co-moment fold in both engines, and the output keeps only FULL
    50-row frames (rn >= 50), so no small-frame NULL/NaN edge where
    engines disagree."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.unix_timestamp("ts").cast("double").alias("tsec"),
    )
    order = Window.partitionBy("event_type").orderBy("ts", "event_id")
    frame = order.rowsBetween(-49, Window.currentRow)
    return (
        base.withColumn("rn", F.row_number().over(order))
        .withColumn("roll_corr", F.corr("value", "tsec").over(frame))
        .filter(F.col("rn") >= 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.round(F.min("roll_corr"), 6).alias("min_corr"),
            F.round(F.max("roll_corr"), 6).alias("max_corr"),
            F.sum((F.abs(F.col("roll_corr")) > 0.3).cast("long")).alias(
                "n_trending"
            ),
        )
        .orderBy("event_type")
    )


def events_dow_hod_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap — the usage grid
    behind "when are our users active" dashboards and the capacity
    planner's weekly shape.  One tiny-key (<=168 cells) aggregation;
    exact counts, decimal-exact value sums.  ISO day numbering
    (1=Monday) on both engines."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.dayofweek("ts").alias("dow_sun1"),
            F.hour("ts").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value", "avg_value"),
        )
        .select(
            # normalize Spark's Sunday=1 to ISO Monday=1
            (((F.col("dow_sun1") + 5) % 7) + 1).alias("iso_dow"),
            "hod",
            "n_events",
            "avg_value",
        )
        .orderBy("iso_dow", "hod")
    )


#: centered moving-average half-width for the decomposition trend
#: (25 hourly points — the classic odd-window MA for a daily cycle).
_MA_HALF = 12


def ts_seasonal_decompose_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of the per-type hourly value
    series (the moving-average half of STL): trend = centered 25-point
    MA over the hourly means, seasonal index = per-(type, hour-of-day)
    mean of the detrended series — the decomposition a capacity planner
    or anomaly detector runs before alerting on raw values.

    ENGINE-EXACT BY INTEGER ARITHMETIC: every stage stays in long
    micro-units (the operators/common.py ``micros`` contract) with
    explicit FLOOR at each division, so the 3-stage float pipeline
    (mean -> MA -> detrended mean) that would otherwise accumulate
    engine-specific roundoff is instead bit-identical anywhere.  The MA
    is ROWS-based over the hourly series (standard for a regular grid;
    the fixture's traffic has no empty hours), and only FULL 25-point
    frames contribute, so edges don't bias the seasonal fit.

    Plan: one (type, hour)-key aggregation, one per-type window sort
    shared by the MA sum and count, one 120-cell rollup — at 100 TB the
    hourly series is ~9 K rows per type-year, so everything after the
    first aggregation is dashboard-sized."""
    ev = load_table(spark, "events", sf_dir)
    trended = _hourly_trended(ev)
    return (
        trended.groupBy("event_type", F.hour("hb").alias("hod"))
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.floor(
                F.sum(F.col("m") - F.col("trend")) / F.count(F.lit(1))
            )
            .cast("long")
            .alias("_sm"),
        )
        .select(
            "event_type",
            "hod",
            "n_hours",
            F.round(F.col("_sm") / 1e6, 6).alias("seasonal_value"),
        )
        .orderBy("event_type", "hod")
    )


def _hourly_trended(ev: DataFrame) -> DataFrame:
    """The decompose pipeline's shared first half (hourly micro-unit
    means + centered 25-point MA trend, full frames only), used by
    ``ts_seasonal_decompose_ma`` (which rolls it up to the seasonal
    index) and ``ts_stl_residual_outliers`` (which subtracts both
    components per hour).  All long micro-units with explicit FLOOR at
    each division — bit-identical in any engine."""
    from pyspark.sql import Window

    from database_peak_streaming_spark.operators.common import micros

    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hb")
    ).agg(
        F.sum(micros("value")).alias("t"),
        F.count(F.lit(1)).alias("c"),
    )
    m = hourly.withColumn(
        "m", F.floor(F.col("t") / F.col("c")).cast("long")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hb")
        .rowsBetween(-_MA_HALF, _MA_HALF)
    )
    return (
        m.withColumn("ma_sum", F.sum("m").over(w))
        .withColumn("ma_n", F.count(F.lit(1)).over(w))
        .where(F.col("ma_n") == 2 * _MA_HALF + 1)
        .withColumn(
            "trend",
            F.floor(F.col("ma_sum") / (2 * _MA_HALF + 1)).cast("long"),
        )
    )


def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the MEDIAN of all
    pairwise slopes (y_j - y_i) / (x_j - x_i) of the daily event-count
    series — the outlier-resistant complement to the least-squares
    ``agg_regression_by_group`` (a single spiky day moves OLS, not the
    slope median; Sen 1968).

    Scale design: the pairwise fan-out happens AFTER the daily rollup,
    so the self-join's per-group input is bounded by the calendar span
    (days), never the event count — pair volume is groups x C(span, 2)
    regardless of table size.  Slopes are exact-integer differences
    divided once into doubles; both engines sort identical doubles, so
    the interpolated median is bit-stable under rounding."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = (
        ev.groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("y"))
        .withColumn("x", F.datediff(F.col("d"), F.lit("1970-01-01")))
    )
    a = daily.select(
        "event_type", F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = daily.select(
        "event_type", F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    pairs = a.join(b, "event_type").where(F.col("xa") < F.col("xb"))
    slope = (F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))
    return (
        pairs.groupBy("event_type")
        .agg(
            F.round(F.median(slope), 6).alias("sen_slope"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
        .orderBy("event_type")
    )


#: rolling-median frame width (events); also the full-frame gate
ROLL_MED_N = 50


def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 50-event median of `value` per user — the median-filter
    smoother (the robust moving average that ignores spikes a mean
    frame chases), the order-statistic sibling of `win_rolling_corr`'s
    moment frame.  Spark's `median` aggregate refuses window frames,
    so the filter is built from primitives: collect_list over the
    frame -> array_sort -> the two middle elements averaged — all JVM
    HOFs inside whole-stage codegen, never Python.  Full frames only
    (exactly N rows), so the middle indexes are constants and no
    small-frame interpolation divergence exists between engines.

    Scale: one shuffle on user_id, one per-user sort shared by both
    window expressions; per-row state is the N-value frame (O(N) per
    row, N fixed at 50)."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "event_id", "ts", "value")
        .where(F.col("value").isNotNull())
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_MED_N - 1), W.currentRow)
    )
    lst = F.array_sort(F.collect_list("value").over(w))
    lo = ROLL_MED_N // 2  # 1-based: elements 25 and 26 of a 50-list
    med = (F.try_element_at(lst, F.lit(lo)) + F.try_element_at(lst, F.lit(lo + 1))) / F.lit(2.0)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).alias("n_frame"),
            med.alias("med_raw"),
        )
        .where(F.col("n_frame") == ROLL_MED_N)
        .select(
            "user_id",
            "event_id",
            F.round("med_raw", 6).alias("rolling_med"),
        )
        .orderBy("user_id", "event_id")
    )


def events_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness per event type: the Fano factor (index of dispersion)
    of per-minute arrival counts, F = Var(x)/E(x) over the COMPLETE
    minute grid — a Poisson process gives F ~ 1, clumpy/bursty arrival
    F > 1, pacemaker-regular F < 1; the one-number arrival-process
    diagnostic behind capacity planning and anomaly thresholds.

    Zero minutes count WITHOUT materializing them: empty grid cells
    contribute nothing to sum(x) or sum(x^2), only to the cell count —
    which is the calendar span in minutes, computed from the global
    bounds as exact integer epoch-minute arithmetic.  So the plan is
    one groupBy to observed (type, minute) cells, one tiny moment
    rollup, and a broadcast bounds scalar; every input to the final
    doubles is an exact BIGINT, evaluated in the same operation order
    by both engines."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.expr("unix_timestamp(ts) div 60").alias("minute"),
    )
    cells = ev.groupBy("event_type", "minute").agg(
        F.count(F.lit(1)).alias("x")
    )
    moments = cells.groupBy("event_type").agg(
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
        F.count(F.lit(1)).alias("n_active"),
    )
    global_bounds = ev.agg(
        F.min("minute").alias("m0"), F.max("minute").alias("m1")
    )
    n = F.col("m1") - F.col("m0") + F.lit(1)
    mean = F.col("s") / n
    var = (F.col("q") - F.col("s") * mean) / n
    return (
        moments.crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.round(var / mean, 6).alias("fano"),
            F.round(mean, 6).alias("mean_per_minute"),
            n.cast("long").alias("n_minutes"),
            F.col("n_active").cast("long").alias("n_active_minutes"),
        )
        .orderBy("event_type")
    )


#: robust-z threshold: |value - med| > Z * 1.4826 * MAD flags an outlier
ROBUST_Z = 3.0


def win_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median/MAD outlier detection per user: each event scored
    against its own trailing 50-event frame with the robust z-score
    |x - med| / (1.4826 * MAD) — the anomaly band a mean/stddev frame
    gets WRONG in exactly the cases that matter (the outliers being
    hunted inflate the stddev and mask themselves; the median and MAD
    ignore them).  1.4826 scales MAD to sigma under normality
    (1 / Phi^-1(3/4)).

    Same primitives discipline as `win_rolling_median` (Spark medians
    refuse frames): ONE collect_list frame is sorted for the median,
    re-transformed to absolute deviations and re-sorted for the MAD —
    all JVM array HOFs over the shared per-user sort; full frames only
    so the middle indexes are constants.  Element access uses
    try_element_at: Catalyst legally pushes the mad > 0 predicate BELOW
    the full-frame gate, where ANSI element_at on a short frame would
    throw — try_element_at yields NULL there, the predicate evaluates
    false, and the row was outside the gate anyway (DuckDB's
    out-of-bounds list index is NULL, so both engines agree).  Emits flagged rows only
    (outliers are the output, not per-row scores); MAD = 0 frames
    (constant windows) cannot flag — both engines drop them with the
    same guard."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "event_id", "ts", "value")
        .where(F.col("value").isNotNull())
    )
    # Compute-heavy / byte-light window (round 12, guide §2.5): each row
    # pays two 50-element array sorts + a transform, but rows are four
    # narrow columns, so AQE's byte-based coalescing ran the whole
    # window on TWO tasks (2.3 MB shuffle in, 39 s + 35 s single-stage
    # walls at sf0.1).  Pin the window's own partition key at the
    # core/shuffle width — the Window exec reuses this exchange (same
    # key), so no extra shuffle appears; both knobs scale with the
    # deployment.
    from database_peak_streaming_spark.sources.batch import compute_width

    n_part = compute_width(spark)
    ev = ev.repartition(n_part, "user_id")
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_MED_N - 1), W.currentRow)
    )
    lo = ROLL_MED_N // 2
    lst = F.array_sort(F.collect_list("value").over(w))
    framed = ev.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n_frame"),
        lst.alias("s"),
    ).where(F.col("n_frame") == ROLL_MED_N)
    med = (F.try_element_at("s", F.lit(lo)) + F.try_element_at("s", F.lit(lo + 1))) / F.lit(2.0)
    staged = framed.select(
        "user_id",
        "event_id",
        "value",
        med.alias("med"),
        F.array_sort(
            F.transform("s", lambda xi: F.abs(xi - med))
        ).alias("d"),
    )
    scored = staged.select(
        "user_id",
        "event_id",
        "value",
        "med",
        (
            (F.try_element_at("d", F.lit(lo)) + F.try_element_at("d", F.lit(lo + 1)))
            / F.lit(2.0)
        ).alias("mad"),
    )
    z = F.abs(F.col("value") - F.col("med")) / (
        F.lit(1.4826) * F.col("mad")
    )
    return (
        scored.where(F.col("mad") > 0)
        .withColumn("robust_z", F.round(z, 6))
        .where(F.col("robust_z") > ROBUST_Z)
        .select(
            "user_id",
            "event_id",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "robust_z",
        )
        # Materialized before the global sort (round 12, guide §2.4):
        # the range exchange's boundary-sampling job re-executes an
        # unmaterialized child, so the whole window chain ran TWICE.
        # Flagged outliers are a tiny table; the cut runs the chain
        # once and the sort reads the checkpoint.
        .localCheckpoint()
        .orderBy("user_id", "event_id")
    )


#: autocorrelation lags probed by ts_acf_hourly (hours)
ACF_LAGS = (1, 2, 3, 6, 12, 24)


def ts_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the hourly event-count series per
    event type at lags 1/2/3/6/12/24 h — the seasonality probe that
    justifies (or falsifies) the seasonal-naive forecaster's 24-hour
    assumption (`forecast_seasonal_naive_mae`) and the MA
    decomposition's period.  Standard biased estimator: r_k =
    sum_t (x_t - mean)(x_{t-k} - mean) / sum_t (x_t - mean)^2 over the
    DENSE hour grid (missing hours are real zeros, not absent rows).

    Engine-exact float discipline: every sum is an exact BIGINT moment
    (S, Q = sum x^2, and per-lag P_k = sum x_t*x_{t-k}, A_k/B_k
    boundary sums), expanded algebraically so the only float ops are a
    fixed-order handful per (type, lag) — both engines compute
    bit-identical doubles regardless of partitioning or sum order.

    Scale: the series is hours x types (calendar-bounded, never
    event-count-sized) after the one data-sized groupBy; the lag
    window and moment rollup run on that tiny grid.  One window over
    6 lags shares a single per-type sort."""
    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").fillna(
        0, subset=["x"]
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("h")
    lagged = dense.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in ACF_LAGS],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ]
    for k in ACF_LAGS:
        aggs += [
            F.sum(F.col("x") * F.col(f"l{k}")).alias(f"p{k}"),
            F.sum(F.when(F.col(f"l{k}").isNotNull(), F.col("x"))).alias(
                f"a{k}"
            ),
            F.sum(f"l{k}").alias(f"b{k}"),
        ]
    st = lagged.groupBy("event_type").agg(*aggs)
    stack_args = ", ".join(f"{k}, p{k}, a{k}, b{k}" for k in ACF_LAGS)
    long = st.select(
        "event_type",
        "n",
        "s",
        "q",
        F.expr(f"stack({len(ACF_LAGS)}, {stack_args}) AS (lag, p, a, b)"),
    )
    mean = F.col("s") / F.col("n")
    num = (
        F.col("p")
        - mean * (F.col("a") + F.col("b"))
        + (F.col("n") - F.col("lag")) * mean * mean
    )
    den = F.col("q") - mean * F.col("s")
    return (
        long.select(
            "event_type",
            F.col("lag").cast("long").alias("lag_hours"),
            F.round(num / den, 6).alias("acf"),
            F.col("n").cast("long").alias("n_hours"),
        )
        .orderBy("event_type", "lag_hours")
    )


#: Holt's linear-trend smoothing coefficients.  The complements (0.6,
#: 0.8) are spelled as literals in BOTH engines — never computed as
#: 1 - alpha — so every double in the recursion is parsed from the
#: same decimal text.
HOLT_ALPHA, HOLT_ONE_MINUS_ALPHA = 0.4, 0.6
HOLT_BETA, HOLT_ONE_MINUS_BETA = 0.2, 0.8


def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's LINEAR-trend exponential smoothing (double exponential
    smoothing) per event type over the daily value series — one rung
    past ``ema_batch_fold``: the recursion carries a (level, trend)
    PAIR, so the fold's accumulator is a 2-element double array, and
    the 7-day-ahead forecast is ``level + 7 * trend`` (the forecasting
    step EMA cannot produce: EMA flat-lines, Holt extrapolates).

        l_t = a*y_t + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}

    Seeding (l_1, b_1) = (y_1, y_2 - y_1) makes (l_2, b_2) collapse to
    EXACTLY (y_2, y_2 - y_1), so both engines seed the fold at t = 2
    with that pair and fold over y_3..y_n — identical doubles in
    identical order, bit-equal before the 6dp rounding (the
    ``ema_batch_fold`` discipline, pair-valued).  Daily inputs are
    exact decimal sums cast-and-rounded onto the scale-6 grid.

    Scale: one shuffle to the (type, day) grain (the only data-sized
    stage), then per-type folds over day-count-sized arrays — keys are
    the parallelism unit, same contract as every sequential-recurrence
    batch fold here."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    arr = F.array_sort(F.collect_list(F.struct("day", "y")))
    vals = F.transform(F.col("arr"), lambda s: s["y"])
    a, ca = F.lit(HOLT_ALPHA), F.lit(HOLT_ONE_MINUS_ALPHA)
    g, cg = F.lit(HOLT_BETA), F.lit(HOLT_ONE_MINUS_BETA)

    def _step(acc: Column, x: Column) -> Column:
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        l_new = a * x + ca * (l_prev + b_prev)
        return F.array(l_new, g * (l_new - l_prev) + cg * b_prev)

    seed = F.array(
        F.element_at(vals, 2),
        F.element_at(vals, 2) - F.element_at(vals, 1),
    )
    lb = F.aggregate(
        F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0))), seed, _step
    )
    return (
        daily.groupBy("event_type")
        .agg(arr.alias("arr"))
        .where(F.size(F.col("arr")) >= 3)
        .select(
            "event_type",
            F.size("arr").cast("long").alias("n_days"),
            F.round(F.element_at(lb, 1), 6).alias("level"),
            F.round(F.element_at(lb, 2), 6).alias("trend"),
            F.round(
                F.element_at(lb, 1) + F.lit(7.0) * F.element_at(lb, 2), 6
            ).alias("forecast_7d"),
        )
        .orderBy("event_type")
    )


def intervals_merge_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval COALESCING: merge each customer's
    overlapping 14-day order-activity intervals into maximal covered
    spans — the consolidation dual of the pair-finding
    ``join_interval_binned`` family (overlap asks "which pairs
    conflict"; this asks "what is the union of covered time").  The
    classic SQL islands construction: an interval OPENS a new island
    iff its start is >= the running max end of every earlier interval
    (end-exclusive, so back-to-back [a,b) [b,c) do NOT merge); island
    id = running count of opens; spans are per-island min start / max
    end.

    All arithmetic is exact integer day numbers, so the oracle is
    value-identical with no float boundary anywhere.  Scale: one
    shuffle on the customer key feeds BOTH windows (same partition +
    order), then a customer x island groupBy — per-key work is a
    single ordered pass, the merge-scan shape that survives any
    volume."""
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).alias("sd"),
    )
    iv = o.withColumn("ed", F.col("sd") + 14)
    w = Window.partitionBy("o_custkey").orderBy("sd", "o_orderkey")
    prev_max_end = F.max("ed").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "opens",
        F.when(
            prev_max_end.isNull() | (F.col("sd") >= prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("opens").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = flagged.groupBy("o_custkey", "island").agg(
        F.min("sd").alias("span_start"),
        F.max("ed").alias("span_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    return (
        spans.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start"))
            .cast("long")
            .alias("covered_days"),
            F.max("n_intervals").cast("long").alias("max_span_intervals"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            "n_spans",
            "covered_days",
            "max_span_intervals",
        )
        .orderBy("custkey")
    )


#: Holt-Winters additive coefficients and season length (weekly
#: seasonality of daily totals).  Complements spelled as literals in
#: both engines, like the Holt pair above.
HW_SEASON = 7
HW_A, HW_CA = 0.3, 0.7
HW_G, HW_CG = 0.1, 0.9
HW_D, HW_CD = 0.2, 0.8


def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE Holt-Winters (triple exponential smoothing) per event
    type over daily value totals with weekly seasonality — the full
    classical forecasting recursion: level, trend AND a rotating
    m=7 seasonal vector, which ``ts_holt_linear`` cannot carry.

        l_t = a*(y_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*b_{t-1}
        s_t = d*(y_t - l_t)     + (1-d)*s_{t-m}

    The fold accumulator is a 9-double array [l, b, s_{t-m+1..t}] —
    each step consumes the OLDEST seasonal (position 3), shifts the
    window, appends the fresh one: a pure array rebuild both engines'
    fold lambdas express identically, so the recursion is bit-exact
    before rounding (the pair-fold discipline, vector-valued).
    Textbook seeding: l_0 = mean(week 1), b_0 = (mean(week 2) -
    mean(week 1))/7, s_i = y_i - l_0; the fold runs from day 8.
    Forecasts re-attach the right seasonal: y-hat(t+h) = l + h*b +
    s_{t+h-m}.

    Scale: one shuffle to the (type, day) grain; per-type folds over
    day-count arrays — identical contract to every sequential
    recurrence here (the streaming O(1)-state form is the production
    path; this is the audit/backfill and the forecast initializer)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    arr = F.array_sort(F.collect_list(F.struct("day", "y")))
    vals = F.transform(F.col("arr"), lambda s: s["y"])
    m = HW_SEASON

    def _mean_slice(start: int) -> Column:
        return (
            F.aggregate(
                F.slice(vals, start, m),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / float(m)
        )

    l0 = _mean_slice(1)
    b0 = (_mean_slice(m + 1) - _mean_slice(1)) / float(m)
    seed = F.concat(
        F.array(l0, b0),
        F.transform(F.slice(vals, 1, m), lambda y: y - l0),
    )
    a, ca = F.lit(HW_A), F.lit(HW_CA)
    g, cg = F.lit(HW_G), F.lit(HW_CG)
    dd, cd = F.lit(HW_D), F.lit(HW_CD)

    def _step(acc: Column, y: Column) -> Column:
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        s_old = F.element_at(acc, 3)
        l_new = a * (y - s_old) + ca * (l_prev + b_prev)
        b_new = g * (l_new - l_prev) + cg * b_prev
        s_new = dd * (y - l_new) + cd * s_old
        return F.concat(
            F.array(l_new, b_new),
            F.slice(acc, 4, m - 1),
            F.array(s_new),
        )

    acc = F.aggregate(
        F.slice(vals, m + 1, F.greatest(F.size(vals) - m, F.lit(0))),
        seed,
        _step,
    )
    lvl = F.element_at(acc, 1)
    trd = F.element_at(acc, 2)

    def _fc(h: int) -> Column:
        return F.round(
            lvl + F.lit(float(h)) * trd + F.element_at(acc, 2 + h), 6
        )

    return (
        daily.groupBy("event_type")
        .agg(arr.alias("arr"))
        .where(F.size(F.col("arr")) >= 2 * m)
        .select(
            "event_type",
            F.size("arr").cast("long").alias("n_days"),
            F.round(lvl, 6).alias("level"),
            F.round(trd, 6).alias("trend"),
            _fc(1).alias("forecast_1d"),
            _fc(2).alias("forecast_2d"),
            _fc(3).alias("forecast_3d"),
        )
        .orderBy("event_type")
    )


CROSTON_A, CROSTON_CA = 0.1, 0.9


def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) + the SBA bias correction
    (Syntetos-Boylan 2005) for INTERMITTENT demand — per-part daily
    shipment quantities, where most days are zero and a plain EMA
    (``ema_batch_fold``) chases the zeros: Croston instead smooths
    demand SIZE and inter-demand INTERVAL separately (both only at
    demand points) and forecasts the rate z/p.  The inventory-planning
    standard for slow movers, which is most of any parts catalog.

    Key structural fact exploited here: Croston's recursion only
    updates at demand occurrences, so the fold runs over the SPARSE
    (day, qty) series with explicit day-gaps — the dense zero-filled
    grid (the LOCF/resample shape) is never materialized, and per-key
    work is O(demand days), not O(calendar days).  Accumulator is a
    [z, p] pair folded with one alpha (the ts_holt_linear
    pair-accumulator discipline); seeding (z, p) = (y_1, d_2 - d_1)
    and folding from the second demand makes both engines fold
    bit-identically over exact-integer inputs.

    One (part, day) groupBy is the only data-sized stage; the fold
    runs per part over demand-day-sized arrays."""
    li = load_table(spark, "lineitem", sf_dir)
    # ONE shuffle serves both aggregations: hash-partitioning on
    # l_partkey alone satisfies the (l_partkey, dn) clustering of the
    # daily rollup AND the per-part collect, so the explicit repartition
    # replaces the chain's two exchanges (the (part, day) shuffle, then
    # the part shuffle) with one — lineitem's ~1 row per (part, day)
    # means the forfeited map-side combine reduced nothing anyway
    # (round 12, guide §2.4).
    demand = (
        li.select(
            "l_partkey",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            ).alias("dn"),
            "l_quantity",
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "dn")
        .agg(F.round(F.sum("l_quantity"), 0).cast("long").alias("q"))
    )
    arr = F.array_sort(F.collect_list(F.struct("dn", "q")))
    per = (
        demand.groupBy("l_partkey")
        .agg(arr.alias("arr"))
        .where(F.size("arr") >= 5)
    )
    ds = F.transform(F.col("arr"), lambda s: s["dn"].cast("double"))
    ys = F.transform(F.col("arr"), lambda s: s["q"].cast("double"))
    n = F.size(F.col("arr"))
    gaps = F.zip_with(
        F.slice(ds, 2, n - 1), F.slice(ds, 1, n - 1), lambda a, b: a - b
    )
    pairs = F.zip_with(
        F.slice(ys, 2, n - 1), gaps, lambda y, g: F.array(y, g)
    )
    a, ca = F.lit(CROSTON_A), F.lit(CROSTON_CA)

    def _step(acc, x):
        return F.array(
            a * F.element_at(x, 1) + ca * F.element_at(acc, 1),
            a * F.element_at(x, 2) + ca * F.element_at(acc, 2),
        )

    seed = F.array(
        F.element_at(ys, 1), F.element_at(ds, 2) - F.element_at(ds, 1)
    )
    zp = F.aggregate(pairs, seed, _step)
    z, p = F.element_at(zp, 1), F.element_at(zp, 2)
    return (
        per.select(
            F.col("l_partkey").alias("partkey"),
            n.cast("long").alias("n_demand_days"),
            F.round(z, 6).alias("demand_size_ema"),
            F.round(p, 6).alias("interval_ema"),
            F.round(z / p, 6).alias("croston_rate"),
            F.round((1.0 - CROSTON_A / 2.0) * z / p, 6).alias("sba_rate"),
        )
        .orderBy("partkey")
    )


def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection by BINARY SEGMENTATION (Scott &
    Knott 1974; the first split of PELT-style pipelines) on the daily
    event-count series per type: the split day minimizing total
    within-segment sum of squared error, found in ONE window pass —
    prefix sums S_t and Q_t give every candidate split's left/right
    SSE in closed form (SSE = Q - S^2/n per segment), so no
    per-candidate re-scan exists.  This is the level-shift detector
    beside CUSUM (`cusum_drift_flags`): CUSUM flags *when* drift
    accumulates online; binseg names the single best retrospective
    break and its variance-explained gain.

    Scale design: the data-sized stage is one (type, day) groupBy;
    everything after runs on the calendar-sized daily series (prefix
    sums + an argmin window).  Recursing into segments = re-running
    this operator on the winning halves — each recursion touches only
    calendar-sized frames.

    Exactness: daily counts, their squares, and both prefix sums are
    exact BIGINTs; each candidate's SSE is the same IEEE expression
    tree over identical exact inputs in both engines, and the argmin
    tie-breaks on (rounded SSE, day) so the winner is engine-stable."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = daily.select(
        "event_type",
        "day",
        F.row_number().over(w_ord).alias("t"),
        F.sum("y").over(w_cum).alias("s"),
        F.sum(F.col("y") * F.col("y")).over(w_cum).alias("q"),
        F.sum("y").over(w_all).alias("sn"),
        F.sum(F.col("y") * F.col("y")).over(w_all).alias("qn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    t, n = F.col("t").cast("double"), F.col("n").cast("double")
    s, q = F.col("s").cast("double"), F.col("q").cast("double")
    sn, qn = F.col("sn").cast("double"), F.col("qn").cast("double")
    sse = (q - s * s / t) + ((qn - q) - (sn - s) * (sn - s) / (n - t))
    total = qn - sn * sn / n
    cand = c.where(F.col("t") < F.col("n")).select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n_days"),
        F.round(total, 6).alias("sse_total"),
        F.round(sse, 6).alias("sse_split"),
    )
    w_pick = Window.partitionBy("event_type").orderBy("sse_split", "day")
    return (
        cand.withColumn("rk", F.row_number().over(w_pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("split_day"),
            "n_days",
            "sse_total",
            "sse_split",
            F.round(F.col("sse_total") - F.col("sse_split"), 6).alias(
                "gain"
            ),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "ts_changepoint_binseg": ts_changepoint_binseg,
    "ts_holt_linear": ts_holt_linear,
    "ts_croston_intermittent": ts_croston_intermittent,
    "ts_holt_winters_additive": ts_holt_winters_additive,
    "intervals_merge_spans": intervals_merge_spans,
    "ts_theil_sen_trend": ts_theil_sen_trend,
    "ts_acf_hourly": ts_acf_hourly,
    "win_rolling_median": win_rolling_median,
    "win_robust_outliers": win_robust_outliers,
    "events_burstiness_fano": events_burstiness_fano,
    "ts_seasonal_decompose_ma": ts_seasonal_decompose_ma,
    "forecast_seasonal_naive_mae": forecast_seasonal_naive_mae,
    "events_dow_hod_heatmap": events_dow_hod_heatmap,
    "ema_batch_fold": ema_batch_fold,
    "events_gap_detection": events_gap_detection,
    "win_rolling_corr": win_rolling_corr,
    "window_hourly_topk": window_hourly_topk,
    "events_minute_load_percentiles": events_minute_load_percentiles,
    "cusum_drift_flags": cusum_drift_flags,
    "resample_gap_fill_locf": resample_gap_fill_locf,
    "resample_gap_fill_locf_per_key": resample_gap_fill_locf_per_key,
    "window_tumbling_1h": window_tumbling_1h,
    "window_sliding_1h_30m": window_sliding_1h_30m,
    "window_session_30m": window_session_30m,
    "window_downsample_1min": window_downsample_1min,
    "window_stride_downsample": window_stride_downsample,
}

_DEC = "DECIMAL(28,6)"


def _acf_sql() -> str:
    """Mirror of ts_acf_hourly: exact-BIGINT moments per lag, unpivoted
    via UNION ALL, with float ops in the same fixed order as the Spark
    expressions (see the function docstring's determinism argument)."""
    lag_cols = ",\n                   ".join(
        f"LAG(x, {k}) OVER w AS l{k}" for k in ACF_LAGS
    )
    moment_cols = ",\n                   ".join(
        f"CAST(SUM(x * l{k}) AS BIGINT) AS p{k},\n"
        f"                   CAST(SUM(CASE WHEN l{k} IS NOT NULL "
        f"THEN x END) AS BIGINT) AS a{k},\n"
        f"                   CAST(SUM(l{k}) AS BIGINT) AS b{k}"
        for k in ACF_LAGS
    )
    unpivot = "\n            UNION ALL\n            ".join(
        f"SELECT event_type, n, s, q, {k} AS lag, p{k} AS p, "
        f"a{k} AS a, b{k} AS b FROM st"
        for k in ACF_LAGS
    )
    return f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT UNNEST(generate_series(h0, h1,
                                      INTERVAL 1 HOUR)) AS h
                        FROM bnds) g),
        dense AS (
            SELECT grid.event_type, grid.h, COALESCE(hourly.x, 0) AS x
            FROM grid LEFT JOIN hourly
              ON hourly.event_type = grid.event_type
             AND hourly.h = grid.h),
        lagged AS (
            SELECT event_type, x,
                   {lag_cols}
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY h)),
        st AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                   {moment_cols}
            FROM lagged GROUP BY 1),
        longf AS (
            {unpivot})
        SELECT event_type,
               CAST(lag AS BIGINT) AS lag_hours,
               ROUND((p - (s * 1.0 / n) * (a + b)
                      + (n - lag) * (s * 1.0 / n) * (s * 1.0 / n))
                     / (q - (s * 1.0 / n) * s), 6) AS acf,
               n AS n_hours
        FROM longf
        ORDER BY event_type, lag_hours
    """


ORACLE_SQL = {
    "ts_acf_hourly": _acf_sql(),
    "events_burstiness_fano": """
        WITH ev AS (
            SELECT event_type,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 60 AS minute
            FROM events),
        cells AS (
            SELECT event_type, minute, CAST(COUNT(*) AS BIGINT) AS x
            FROM ev GROUP BY 1, 2),
        moments AS (
            SELECT event_type,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                   CAST(COUNT(*) AS BIGINT) AS n_active
            FROM cells GROUP BY 1),
        b AS (SELECT MIN(minute) AS m0, MAX(minute) AS m1 FROM ev)
        SELECT event_type,
               ROUND(((q - s * (s * 1.0 / (m1 - m0 + 1)))
                      / (m1 - m0 + 1))
                     / (s * 1.0 / (m1 - m0 + 1)), 6) AS fano,
               ROUND(s * 1.0 / (m1 - m0 + 1), 6) AS mean_per_minute,
               CAST(m1 - m0 + 1 AS BIGINT) AS n_minutes,
               n_active AS n_active_minutes
        FROM moments CROSS JOIN b
        ORDER BY event_type
    """,
    "win_robust_outliers": """
        WITH ev AS (
            SELECT user_id, event_id, ts, value
            FROM events WHERE value IS NOT NULL),
        win AS (
            SELECT user_id, event_id, value,
                   LIST(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
                       AS vals
            FROM ev),
        srt AS (
            SELECT user_id, event_id, value, LIST_SORT(vals) AS s,
                   LEN(vals) AS n
            FROM win),
        staged AS (
            SELECT user_id, event_id, value,
                   (s[25] + s[26]) / 2.0 AS med,
                   LIST_SORT(LIST_TRANSFORM(
                       s, xi -> ABS(xi - (s[25] + s[26]) / 2.0))) AS d
            FROM srt WHERE n = 50),
        scored AS (
            SELECT user_id, event_id, value, med,
                   (d[25] + d[26]) / 2.0 AS mad
            FROM staged)
        SELECT user_id, event_id, value,
               ROUND(med, 6) AS med,
               ROUND(mad, 6) AS mad,
               robust_z
        FROM (
            SELECT *, ROUND(ABS(value - med) / (1.4826 * mad), 6)
                       AS robust_z
            FROM scored WHERE mad > 0)
        WHERE robust_z > 3.0
        ORDER BY user_id, event_id
    """,
    "win_rolling_median": """
        WITH ev AS (
            SELECT user_id, event_id, ts, value
            FROM events WHERE value IS NOT NULL),
        win AS (
            SELECT user_id, event_id,
                   LIST(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
                       AS vals
            FROM ev),
        srt AS (
            SELECT user_id, event_id, LIST_SORT(vals) AS s,
                   LEN(vals) AS n
            FROM win)
        SELECT user_id, event_id,
               ROUND((s[25] + s[26]) / 2.0, 6) AS rolling_med
        FROM srt WHERE n = 50
        ORDER BY user_id, event_id
    """,
    "ts_theil_sen_trend": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS y
            FROM events GROUP BY 1, 2),
        pts AS (
            SELECT event_type,
                   DATE_DIFF('day', DATE '1970-01-01', d) AS x, y
            FROM daily),
        pairs AS (
            SELECT a.event_type,
                   (b.y - a.y) * 1.0 / (b.x - a.x) AS slope
            FROM pts a JOIN pts b
              ON a.event_type = b.event_type AND a.x < b.x)
        SELECT event_type,
               ROUND(MEDIAN(slope), 6) AS sen_slope,
               COUNT(*) AS n_pairs
        FROM pairs
        GROUP BY event_type
        ORDER BY event_type
    """,
    "ts_seasonal_decompose_ma": f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS hb,
                   SUM(CAST(SIGN(value) * FLOOR(ABS(value) * 1e6 + 0.5)
                            AS BIGINT)) AS t,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2),
        m AS (
            SELECT event_type, hb,
                   CAST(FLOOR(t / c) AS BIGINT) AS m
            FROM hourly),
        trended AS (
            SELECT event_type, hb, m,
                   CAST(FLOOR(ma_sum / {2 * _MA_HALF + 1}) AS BIGINT)
                       AS trend
            FROM (
                SELECT event_type, hb, m,
                       SUM(m) OVER w AS ma_sum,
                       COUNT(*) OVER w AS ma_n
                FROM m
                WINDOW w AS (PARTITION BY event_type ORDER BY hb
                             ROWS BETWEEN {_MA_HALF} PRECEDING
                                  AND {_MA_HALF} FOLLOWING))
            WHERE ma_n = {2 * _MA_HALF + 1})
        SELECT event_type,
               CAST(HOUR(hb) AS INT) AS hod,
               COUNT(*) AS n_hours,
               ROUND(CAST(FLOOR(SUM(m - trend) / COUNT(*)) AS BIGINT)
                     / 1e6, 6) AS seasonal_value
        FROM trended
        GROUP BY event_type, HOUR(hb)
        ORDER BY event_type, hod
    """,
    "events_dow_hod_heatmap": """
        SELECT CAST(isodow(ts) AS INT) AS iso_dow,
               CAST(hour(ts) AS INT) AS hod,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY iso_dow, hod
    """,
    "ema_batch_fold": f"""
        WITH ordered AS (
            SELECT event_type,
                   LIST(value ORDER BY ts, event_id) AS vals
            FROM events GROUP BY event_type)
        SELECT event_type,
               CAST(LEN(vals) AS BIGINT) AS n_events,
               ROUND(LIST_REDUCE(vals,
                     (acc, x) -> {EMA_FOLD_ALPHA} * x
                                 + (1.0 - {EMA_FOLD_ALPHA}) * acc), 6)
                   AS final_ema
        FROM ordered
        ORDER BY event_type
    """,
    "events_gap_detection": """
        WITH g AS (
            SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ts
            FROM events)
        SELECT user_id, prev_ts, ts AS resumed_ts,
               -- FLOOR: Spark's unix_timestamp truncates to whole
               -- seconds; DuckDB's epoch() keeps the fraction
               CAST(FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts)) AS BIGINT)
                   AS gap_sec
        FROM g
        WHERE FLOOR(epoch(ts)) - FLOOR(epoch(prev_ts)) > 24 * 3600
        ORDER BY user_id, resumed_ts
    """,
    "win_rolling_corr": """
        WITH base AS (
            SELECT event_type, ts, event_id, value,
                   CAST(FLOOR(epoch(ts)) AS DOUBLE) AS tsec
            FROM events),
        rolled AS (
            SELECT event_type,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS rn,
                   CORR(value, tsec) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
                       AS roll_corr
            FROM base)
        SELECT event_type,
               COUNT(*) AS n_frames,
               ROUND(MIN(roll_corr), 6) AS min_corr,
               ROUND(MAX(roll_corr), 6) AS max_corr,
               CAST(SUM(CASE WHEN ABS(roll_corr) > 0.3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_trending
        FROM rolled
        WHERE rn >= 50
        GROUP BY event_type
        ORDER BY event_type
    """,
    "events_minute_load_percentiles": """
        WITH per_min AS (
            SELECT event_type, date_trunc('minute', ts) AS minute,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT event_type,
               COUNT(*) AS n_active_minutes,
               ROUND(QUANTILE_CONT(n, 0.5), 6) AS p50_per_min,
               ROUND(QUANTILE_CONT(n, 0.95), 6) AS p95_per_min,
               MAX(n) AS max_per_min
        FROM per_min
        GROUP BY event_type
        ORDER BY event_type
    """,
    "window_hourly_topk": """
        WITH ranked AS (
            SELECT date_trunc('hour', ts) AS hour_start,
                   event_type, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY date_trunc('hour', ts), event_type
                       ORDER BY value DESC, event_id) AS rnk
            FROM events)
        SELECT hour_start, event_type, CAST(rnk AS INT) AS rnk,
               event_id, ROUND(value, 6) AS value
        FROM ranked
        WHERE rnk <= 3
        ORDER BY hour_start, event_type, rnk
    """,
    "forecast_seasonal_naive_mae": f"""
        WITH profile AS (
            SELECT event_type, hour(ts) AS hod,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                       / COUNT(*) AS baseline
            FROM events
            WHERE ts < TIMESTAMP '{FORECAST_SPLIT}'
            GROUP BY event_type, hour(ts)),
        holdout AS (
            SELECT event_type, hour(ts) AS hod, value
            FROM events
            WHERE ts >= TIMESTAMP '{FORECAST_SPLIT}')
        SELECT h.event_type,
               COUNT(*) AS n_eval,
               ROUND(AVG(ABS(h.value - p.baseline)), 6) AS mae
        FROM holdout h JOIN profile p USING (event_type, hod)
        GROUP BY h.event_type
        ORDER BY h.event_type
    """,
    "cusum_drift_flags": f"""
        WITH y AS (
            SELECT event_type, ts, event_id,
                   CAST(ROUND(value * 1000000) AS BIGINT)
                       - {CUSUM_REF_MICROS} AS y
            FROM events),
        c AS (
            SELECT event_type, ts, event_id, y,
                   SUM(y) OVER w AS c
            FROM y
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        s AS (
            SELECT event_type, ts,
                   c - LEAST(0, MIN(c) OVER w) AS s
            FROM c
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN s > {CUSUM_H_MICROS} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_flagged,
               ROUND(MAX(s) / 1000000.0, 6) AS max_cusum,
               MIN(CASE WHEN s > {CUSUM_H_MICROS} THEN ts END)
                   AS first_flag_ts
        FROM s
        GROUP BY event_type
        ORDER BY event_type
    """,
    "resample_gap_fill_locf": """
        WITH axis AS (
            SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                          TIMESTAMP '2024-01-30 23:00:00',
                                          INTERVAL 1 HOUR)) AS hour
        ), hourly AS (
            SELECT CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events
            WHERE event_type = 'error' AND user_id % 7 = 0
            GROUP BY 1
        )
        SELECT a.hour,
               COALESCE(h.avg_value,
                        LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
                            ORDER BY a.hour
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        )) AS filled_value,
               h.avg_value IS NULL AS was_gap
        FROM axis a LEFT JOIN hourly h ON a.hour = h.hour
        ORDER BY a.hour
    """,
    "resample_gap_fill_locf_per_key": """
        WITH axis AS (
            SELECT c.cohort, h.hour
            FROM (SELECT CAST(UNNEST([0, 1, 2, 3, 4]) AS BIGINT) AS cohort) c
            CROSS JOIN (
                SELECT UNNEST(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                              TIMESTAMP '2024-01-30 23:00:00',
                                              INTERVAL 1 HOUR)) AS hour) h
        ), hourly AS (
            SELECT user_id % 5 AS cohort,
                   CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
                   ROUND(AVG(value), 6) AS avg_value
            FROM events
            WHERE event_type = 'error'
            GROUP BY 1, 2
        )
        SELECT a.cohort, a.hour,
               COALESCE(h.avg_value,
                        LAST_VALUE(h.avg_value IGNORE NULLS) OVER (
                            PARTITION BY a.cohort ORDER BY a.hour
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                        )) AS filled_value,
               h.avg_value IS NULL AS was_gap
        FROM axis a LEFT JOIN hourly h
          ON a.cohort = h.cohort AND a.hour = h.hour
        ORDER BY a.cohort, a.hour
    """,
    "window_tumbling_1h": f"""
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS window_start, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS sum_value,
               ROUND(AVG(value), 6) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "window_sliding_1h_30m": f"""
        WITH assigned AS (
            SELECT TIME_BUCKET(INTERVAL '30 minutes', ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT TIME_BUCKET(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
            FROM events)
        SELECT window_start, COUNT(*) AS n,
               CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS sum_value
        FROM assigned GROUP BY window_start ORDER BY window_start
    """,
    "window_session_30m": f"""
        WITH marked AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL '30 minutes' THEN 0 ELSE 1 END AS new_session
            FROM events),
        numbered AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM marked)
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS sum_value
        FROM numbered GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    "window_downsample_1min": """
        SELECT TIME_BUCKET(INTERVAL '1 minute', ts) AS minute_start,
               MIN(event_id) AS first_event_id,
               COUNT(*) AS n_in_bucket
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "window_stride_downsample": """
        SELECT event_id, ts, event_type, value FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY event_id) AS rn FROM events) t
        WHERE (rn - 1) % 600 = 0 ORDER BY event_id
    """,
}

ORACLE_SQL["ts_holt_linear"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
                   AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    series AS (
        SELECT event_type, LIST(y ORDER BY day) AS vals
        FROM daily GROUP BY event_type),
    folded AS (
        SELECT event_type, LEN(vals) AS n_days,
               LIST_REDUCE(
                   [[vals[2], vals[2] - vals[1]]]
                       || LIST_TRANSFORM(vals[3:], y -> [y, 0.0]),
                   (acc, x) -> [
                       {HOLT_ALPHA} * x[1]
                           + {HOLT_ONE_MINUS_ALPHA} * (acc[1] + acc[2]),
                       {HOLT_BETA} * (({HOLT_ALPHA} * x[1]
                           + {HOLT_ONE_MINUS_ALPHA} * (acc[1] + acc[2]))
                           - acc[1])
                           + {HOLT_ONE_MINUS_BETA} * acc[2]]) AS lb
        FROM series WHERE LEN(vals) >= 3)
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(lb[1], 6) AS level,
           ROUND(lb[2], 6) AS trend,
           ROUND(lb[1] + 7.0 * lb[2], 6) AS forecast_7d
    FROM folded ORDER BY event_type
"""

ORACLE_SQL["intervals_merge_spans"] = """
    WITH iv AS (
        SELECT o_custkey, o_orderkey,
               DATE_DIFF('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS sd,
               DATE_DIFF('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) + 14 AS ed
        FROM orders),
    flagged AS (
        SELECT o_custkey, o_orderkey, sd, ed,
               CASE WHEN MAX(ed) OVER (
                        PARTITION BY o_custkey ORDER BY sd, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR sd >= MAX(ed) OVER (
                        PARTITION BY o_custkey ORDER BY sd, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS opens
        FROM iv),
    islands AS (
        SELECT o_custkey, sd, ed,
               SUM(opens) OVER (
                   PARTITION BY o_custkey ORDER BY sd, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS island
        FROM flagged),
    spans AS (
        SELECT o_custkey, island,
               MIN(sd) AS span_start, MAX(ed) AS span_end,
               COUNT(*) AS n_intervals
        FROM islands GROUP BY o_custkey, island)
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(span_end - span_start) AS BIGINT) AS covered_days,
           CAST(MAX(n_intervals) AS BIGINT) AS max_span_intervals
    FROM spans GROUP BY o_custkey ORDER BY custkey
"""

ORACLE_SQL["ts_holt_winters_additive"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
                   AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    series AS (
        SELECT event_type, LIST(y ORDER BY day) AS vals
        FROM daily GROUP BY event_type),
    seeded AS (
        SELECT event_type, vals, LEN(vals) AS n_days,
               LIST_REDUCE(vals[1:{HW_SEASON}], (a, b) -> a + b)
                   / {float(HW_SEASON)} AS l0,
               (LIST_REDUCE(vals[{HW_SEASON + 1}:{2 * HW_SEASON}],
                            (a, b) -> a + b) / {float(HW_SEASON)}
                - LIST_REDUCE(vals[1:{HW_SEASON}], (a, b) -> a + b)
                    / {float(HW_SEASON)}) / {float(HW_SEASON)} AS b0
        FROM series WHERE LEN(vals) >= {2 * HW_SEASON}),
    folded AS (
        SELECT event_type, n_days,
               LIST_REDUCE(
                   [[l0, b0] || LIST_TRANSFORM(vals[1:{HW_SEASON}],
                                               y -> y - l0)]
                       || LIST_TRANSFORM(vals[{HW_SEASON + 1}:],
                                         y -> [y]),
                   (acc, x) -> [
                       {HW_A} * (x[1] - acc[3])
                           + {HW_CA} * (acc[1] + acc[2]),
                       {HW_G} * (({HW_A} * (x[1] - acc[3])
                                  + {HW_CA} * (acc[1] + acc[2]))
                                 - acc[1])
                           + {HW_CG} * acc[2]]
                       || acc[4:{2 + HW_SEASON}]
                       || [{HW_D} * (x[1]
                                     - ({HW_A} * (x[1] - acc[3])
                                        + {HW_CA} * (acc[1] + acc[2])))
                           + {HW_CD} * acc[3]]) AS acc
        FROM seeded)
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(acc[1], 6) AS level,
           ROUND(acc[2], 6) AS trend,
           ROUND(acc[1] + 1.0 * acc[2] + acc[3], 6) AS forecast_1d,
           ROUND(acc[1] + 2.0 * acc[2] + acc[4], 6) AS forecast_2d,
           ROUND(acc[1] + 3.0 * acc[2] + acc[5], 6) AS forecast_3d
    FROM folded ORDER BY event_type
"""

ORACLE_SQL["ts_croston_intermittent"] = f"""
    WITH demand AS (
        SELECT l_partkey,
               DATE_DIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   AS dn,
               CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2),
    -- The [z, p] pair recursion decomposes into TWO INDEPENDENT flat
    -- scalar folds (z only reads acc[1]/x[1], p only acc[2]/x[2]) —
    -- the round-9 nested list-of-pairs form exhausted DuckDB's memory
    -- budget at the 10x tier (VERDICT r9 ask #6); flat double lists
    -- fold in bounded state.  Gaps come from a LAG window (an indexed
    -- LIST_TRANSFORM(generate_series...) rebuild measured 2x slower
    -- at the 10x tier and OOM'd at 30x even single-fold).  Step
    -- parity with the Spark F.aggregate: z seeds y_1 and folds
    -- y_2..y_n (LIST_REDUCE seeds from the first element); p seeds
    -- gap_1 AND folds gap_1 again first (the pair fold's step i=2
    -- applies x=[y_2, gap_1] onto the seed [y_1, gap_1]), hence the
    -- explicit [gs[1]] prepend.
    pts AS (
        SELECT l_partkey, dn, q,
               CAST(dn - LAG(dn) OVER (PARTITION BY l_partkey
                                       ORDER BY dn) AS DOUBLE) AS gap
        FROM demand),
    series AS (
        SELECT l_partkey,
               LIST(CAST(q AS DOUBLE) ORDER BY dn) AS ys,
               LIST(gap ORDER BY dn) FILTER (WHERE gap IS NOT NULL) AS gs
        FROM pts GROUP BY l_partkey),
    eligible AS (SELECT * FROM series WHERE LEN(ys) >= 5),
    folded AS (
        SELECT l_partkey, LEN(ys) AS n,
               LIST_REDUCE(ys,
                   (acc, x) -> {CROSTON_A} * x + {CROSTON_CA} * acc) AS z,
               LIST_REDUCE([gs[1]] || gs,
                   (acc, x) -> {CROSTON_A} * x + {CROSTON_CA} * acc) AS p
        FROM eligible)
    SELECT l_partkey AS partkey,
           CAST(n AS BIGINT) AS n_demand_days,
           ROUND(z, 6) AS demand_size_ema,
           ROUND(p, 6) AS interval_ema,
           ROUND(z / p, 6) AS croston_rate,
           ROUND((1.0 - {CROSTON_A} / 2.0) * z / p, 6) AS sba_rate
    FROM folded ORDER BY partkey
"""

ORACLE_SQL["ts_changepoint_binseg"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    c AS (
        SELECT event_type, day,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
                   AS t,
               SUM(y) OVER (PARTITION BY event_type ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS s,
               SUM(y * y) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING) AS q,
               SUM(y) OVER (PARTITION BY event_type) AS sn,
               SUM(y * y) OVER (PARTITION BY event_type) AS qn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily),
    cand AS (
        SELECT event_type, day,
               CAST(n AS BIGINT) AS n_days,
               ROUND(CAST(qn AS DOUBLE)
                     - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                       / CAST(n AS DOUBLE), 6) AS sse_total,
               ROUND((CAST(q AS DOUBLE)
                      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(t AS DOUBLE))
                     + ((CAST(qn AS DOUBLE) - CAST(q AS DOUBLE))
                        - (CAST(sn AS DOUBLE) - CAST(s AS DOUBLE))
                          * (CAST(sn AS DOUBLE) - CAST(s AS DOUBLE))
                          / (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))), 6)
                   AS sse_split
        FROM c WHERE t < n),
    pick AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY sse_split, day) AS rk
        FROM cand)
    SELECT event_type, day AS split_day, n_days, sse_total, sse_split,
           ROUND(sse_total - sse_split, 6) AS gain
    FROM pick WHERE rk = 1
    ORDER BY event_type
"""


def intervals_active_count_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-interval count over time by SWEEP LINE — "how many orders
    were in flight on each day": each order spans order date to its
    latest lineitem shipment, every span contributes +1 at its start and
    -1 the day after its end, and a prefix sum over the boundary days
    yields the concurrency series.  This is the stabbing-count dual of
    the interval JOINS (join_interval_*): no pairing at all, so the
    operator that looks quadratic is one groupBy + one calendar-bounded
    window — the backlog/concurrency curve capacity dashboards report.

    Scale: the data-sized stages are the order-span groupBy and the
    boundary groupBy (both key-partitioned, map-side combinable); the
    running sum touches only distinct boundary days, bounded by the
    calendar regardless of data volume.  All counts exact BIGINT."""
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("start")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("rcpt")
    )
    spans = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "start")
        .agg(F.max("rcpt").alias("end"))
    )
    deltas = spans.select(
        F.col("start").alias("day"), F.lit(1).alias("delta")
    ).unionAll(
        spans.select(
            F.date_add(F.col("end"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("long").alias("net_change")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.select(
            "day",
            "net_change",
            F.sum("net_change").over(w).cast("long").alias("open_orders"),
        )
        .orderBy("day")
    )


QUERIES["intervals_active_count_daily"] = intervals_active_count_daily
ORACLE_SQL["intervals_active_count_daily"] = """
    WITH spans AS (
        SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS start,
               MAX(CAST(l.l_shipdate AS DATE)) AS "end"
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)),
    deltas AS (
        SELECT start AS day, 1 AS delta FROM spans
        UNION ALL
        SELECT "end" + INTERVAL 1 DAY, -1 FROM spans),
    daily AS (
        SELECT CAST(day AS DATE) AS day,
               CAST(SUM(delta) AS BIGINT) AS net_change
        FROM deltas GROUP BY CAST(day AS DATE))
    SELECT day, net_change,
           CAST(SUM(net_change) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
    FROM daily
    ORDER BY day
"""


def window_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle bars — per (event type, hour): OPEN (first value),
    HIGH, LOW, CLOSE (last value), volume and turnover — the
    time-series downsampling shape finance/telemetry dashboards
    consume, and the canonical use of `min_by`/`max_by` as order-aware
    aggregates (open/close need the EARLIEST/LATEST row, not an
    extremum of values).  First/last are tie-broken on (ts, event_id),
    a total order, so both engines pick the same row.

    Scale: ONE map-side-combinable groupBy on (type, hour) — min_by /
    max_by / min / max / count / sum all carry O(1) partial state, so
    the bar build is a single shuffle of bounded keys at any data
    volume.  Cents arithmetic keeps the turnover sum exact."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    okey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type", "hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.min_by("cents", okey) / 100.0, 6).alias("open"),
            F.round(F.max("cents") / 100.0, 6).alias("high"),
            F.round(F.min("cents") / 100.0, 6).alias("low"),
            F.round(F.max_by("cents", okey) / 100.0, 6).alias("close"),
            F.round(F.sum("cents") / 100.0, 6).alias("turnover"),
        )
        .orderBy("event_type", "hour")
    )


QUERIES["window_ohlc_bars"] = window_ohlc_bars
ORACLE_SQL["window_ohlc_bars"] = """
    WITH ev AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour, ts, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events)
    SELECT event_type, hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(FIRST(cents ORDER BY ts, event_id) / 100.0, 6) AS open,
           ROUND(MAX(cents) / 100.0, 6) AS high,
           ROUND(MIN(cents) / 100.0, 6) AS low,
           ROUND(LAST(cents ORDER BY ts, event_id) / 100.0, 6) AS close,
           ROUND(SUM(cents) / 100.0, 6) AS turnover
    FROM ev
    GROUP BY event_type, hour
    ORDER BY event_type, hour
"""


def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum DRAWDOWN of the cumulative per-type value series — the
    risk metric beside the OHLC bars: with C_t the running total and
    P_t its running peak, drawdown_t = P_t - C_t and the max over t is
    the worst peak-to-trough drop; also emits when the trough occurred
    and the end-of-series recovery gap.  One ordered window pass
    computes the whole family (two running aggregates + one argmax) —
    the classic "two prefix scans" shape that needs no self-join.

    Exactness: running sums/maxima of exact cent integers; the trough
    pick tie-breaks on (drawdown desc, ts asc, event_id) so both
    engines choose the same row."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100, 0).cast("long") - 500).alias(
            "pnl_cents"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scanned = ev.select(
        "event_type",
        "ts",
        "event_id",
        F.sum("pnl_cents").over(w_cum).alias("cum"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "cum",
        F.max("cum").over(w_cum).alias("peak"),
    )
    dd = scanned.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("peak") - F.col("cum")).alias("dd"),
        "cum",
        "peak",
    )
    w_pick = Window.partitionBy("event_type").orderBy(
        F.col("dd").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    last = dd.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.max("dd").alias("max_dd"),
    )
    trough = (
        dd.withColumn("rk", F.row_number().over(w_pick))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("ts").alias("trough_ts"),
            F.round(F.col("peak") / 100.0, 6).alias("peak_at_trough"),
        )
    )
    return (
        last.join(trough, "event_type")
        .select(
            "event_type",
            "n_events",
            F.round(F.col("max_dd") / 100.0, 6).alias("max_drawdown"),
            "trough_ts",
            "peak_at_trough",
        )
        .orderBy("event_type")
    )


QUERIES["win_max_drawdown"] = win_max_drawdown
ORACLE_SQL["win_max_drawdown"] = """
    WITH ev AS (
        SELECT event_type, ts, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) - 500 AS pnl_cents
        FROM events),
    scanned AS (
        SELECT event_type, ts, event_id,
               SUM(pnl_cents) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM ev),
    dd AS (
        SELECT event_type, ts, event_id, cum,
               MAX(cum) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM scanned),
    picked AS (
        SELECT *, peak - cum AS d,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY peak - cum DESC, ts, event_id)
                   AS rk
        FROM dd),
    agg AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(d) AS max_dd
        FROM picked GROUP BY event_type)
    SELECT agg.event_type, n_events,
           ROUND(max_dd / 100.0, 6) AS max_drawdown,
           p.ts AS trough_ts,
           ROUND(p.peak / 100.0, 6) AS peak_at_trough
    FROM agg JOIN picked p
      ON p.event_type = agg.event_type AND p.rk = 1
    ORDER BY agg.event_type
"""


#: rolling-distinct window length in days (inclusive: [D-6, D])
ROLLING_DISTINCT_DAYS = 7


def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling COUNT(DISTINCT user) — 7-day active users per
    (event_type, day) — WITHOUT a per-day distinct scan: the sweep-line
    differencing trick.  A user with presence days d1 < d2 < ... is
    active on day D iff some di lies in [D-6, D], i.e. D is covered by
    the interval union U [di, di+7) — so merge each user's presence
    into maximal covered spans (islands with gap <= 6), convert each
    span [a, e) to a +1 delta at a and a -1 delta at e, and the running
    sum of per-day deltas IS the exact distinct count.  This is how
    rolling-window actives are computed at warehouse scale: naive
    per-day COUNT(DISTINCT) over a sliding range re-reads every event
    ~7x and keeps per-day hash sets; the sweep-line form touches each
    presence row once.  Keyed by event_type so sparse per-type presence
    exercises real island structure (open/extend/close all fire).

    Scale: ONE shuffle on (event_type, user_id) (collect_set folds
    presence days inside the agg — dedup rides the partial
    aggregation), spans fold per key over the calendar-bounded sorted
    day array, then a groupBy on (event_type, day) whose output is
    TYPE x CALENDAR-bounded, so the final per-type running-sum window
    is a bounded pass (~|types| x 365 rows/year) no matter the corpus
    size.  The oracle recomputes counts by brute-force range join — an
    INDEPENDENT method, so a differencing bug cannot self-confirm."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day"),
    )
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.array_sort(F.collect_set("day")).alias("days")
    )
    wlen = ROLLING_DISTINCT_DAYS
    # fold sorted days -> merged end-exclusive spans [a, e): extend the
    # open span while d < cur_e, else emit and reopen
    span_t = "array<struct<a:int,e:int>>"
    acc_t = f"struct<spans:{span_t},a:int,e:int>"
    init = F.struct(
        F.array().cast(span_t).alias("spans"),
        F.lit(None).cast("int").alias("a"),
        F.lit(None).cast("int").alias("e"),
    ).cast(acc_t)
    merge = lambda acc, d: F.when(  # noqa: E731
        acc["a"].isNull(),
        F.struct(
            acc["spans"].alias("spans"),
            d.alias("a"),
            (d + wlen).alias("e"),
        ).cast(acc_t),
    ).when(
        d < acc["e"],
        F.struct(
            acc["spans"].alias("spans"),
            acc["a"].alias("a"),
            (d + wlen).alias("e"),
        ).cast(acc_t),
    ).otherwise(
        F.struct(
            F.array_append(
                acc["spans"], F.struct(acc["a"].alias("a"), acc["e"].alias("e"))
            ).alias("spans"),
            d.alias("a"),
            (d + wlen).alias("e"),
        ).cast(acc_t)
    )
    finish = lambda acc: F.when(  # noqa: E731
        acc["a"].isNull(), acc["spans"]
    ).otherwise(
        F.array_append(
            acc["spans"], F.struct(acc["a"].alias("a"), acc["e"].alias("e"))
        )
    )
    spans = per_user.select(
        "event_type",
        F.explode(F.aggregate("days", init, merge, finish)).alias("s"),
    )
    deltas = spans.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("s.a").alias("day"), F.lit(1).alias("d")),
                F.struct(F.col("s.e").alias("day"), F.lit(-1).alias("d")),
            )
        ).alias("x"),
    ).select("event_type", "x.day", "x.d")
    per_day = deltas.groupBy("event_type", "day").agg(F.sum("d").alias("net"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stepped = per_day.withColumn("n_active_7d", F.sum("net").over(wcum))
    global_bounds = ev.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        stepped.crossJoin(F.broadcast(global_bounds))
        .filter((F.col("day") >= F.col("lo")) & (F.col("day") <= F.col("hi")))
        .select(
            "event_type",
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day")).alias(
                "day"
            ),
            F.col("n_active_7d").cast("long").alias("n_active_7d"),
        )
    )


QUERIES["window_rolling_distinct_users"] = window_rolling_distinct_users
ORACLE_SQL["window_rolling_distinct_users"] = """
    WITH pres AS (
        SELECT DISTINCT event_type, user_id, CAST(ts AS DATE) AS day
        FROM events),
    flagged AS (
        SELECT event_type, user_id, day,
               CASE WHEN LAG(day) OVER w IS NULL
                         OR date_diff('day', LAG(day) OVER w, day)
                            >= 7 THEN 1 ELSE 0 END AS opens
        FROM pres
        WINDOW w AS (PARTITION BY event_type, user_id ORDER BY day)),
    islands AS (
        SELECT event_type, user_id, day,
               SUM(opens) OVER (PARTITION BY event_type, user_id
                                ORDER BY day) AS isl
        FROM flagged),
    spans AS (
        SELECT event_type, user_id,
               MIN(day) AS a, MAX(day) + INTERVAL 7 DAY AS e
        FROM islands GROUP BY event_type, user_id, isl),
    bdays AS (
        SELECT DISTINCT event_type, d FROM (
            SELECT event_type, a AS d FROM spans
            UNION ALL SELECT event_type, CAST(e AS DATE) AS d FROM spans)
        WHERE d BETWEEN (SELECT MIN(CAST(ts AS DATE)) FROM events)
                    AND (SELECT MAX(CAST(ts AS DATE)) FROM events))
    SELECT b.event_type, b.d AS day,
           (SELECT COUNT(DISTINCT p.user_id) FROM pres p
             WHERE p.event_type = b.event_type
               AND p.day BETWEEN b.d - INTERVAL 6 DAY AND b.d)
               AS n_active_7d
    FROM bdays b
"""


def resample_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resample with LINEAR interpolation — the other
    canonical gap-fill beside LOCF (``resample_gap_fill_locf_per_key``):
    each missing hour gets the straight line between its surrounding
    observations; leading/trailing gaps (no observation on one side)
    stay NULL and are flagged.  LOCF answers "what was the state";
    interpolation answers "what was the level" — sensor calibration and
    rate series want the latter.

    Scale: identical shape to the LOCF twin — generated (cohort x hour)
    axis, per-cohort windows carrying ONE (hour, value) pair of state
    in each direction, so a million keys parallelize across the
    cohort hash exchange.  Determinism: observed hourly means are the
    6dp ``davg`` convention, the interpolation weight is a ratio of
    small integer hour offsets, and both engines evaluate the same
    IEEE expression tree."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type") == "error"
    )
    hourly = ev.groupBy(
        (F.col("user_id") % 5).alias("cohort"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(davg("value", "v"))
    axis = spark.sql(
        """SELECT c.cohort, explode(sequence(timestamp'2024-01-01 00:00:00',
                                             timestamp'2024-01-30 23:00:00',
                                             interval 1 hour)) AS hour
           FROM (SELECT explode(sequence(0, 4)) AS cohort) c"""
    )
    g = axis.join(hourly, ["cohort", "hour"], "left")
    wb = (
        Window.partitionBy("cohort")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("cohort")
        .orderBy("hour")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    prev_v = F.last("v", ignorenulls=True).over(wb)
    prev_h = F.last(obs_hour, ignorenulls=True).over(wb)
    next_v = F.first("v", ignorenulls=True).over(wf)
    next_h = F.first(obs_hour, ignorenulls=True).over(wf)
    span = (
        F.unix_timestamp(next_h) - F.unix_timestamp(prev_h)
    ).cast("double")
    frac = (
        F.unix_timestamp("hour") - F.unix_timestamp(prev_h)
    ).cast("double") / span
    # floor(x*1e6 + 0.5)/1e6, not round(x, 6): the interpolated value
    # can land exactly on a half-microunit tie (observed at sf0.001 —
    # 44.4103125), where engine round conventions diverge; the
    # explicit half-up floor is identical everywhere
    interp = F.when(
        F.col("v").isNotNull(), F.col("v")
    ).when(
        prev_v.isNotNull() & next_v.isNotNull(),
        F.floor(
            (prev_v + (next_v - prev_v) * frac) * 1000000 + F.lit(0.5)
        ).cast("double")
        / F.lit(1000000.0),
    )
    return g.select(
        "cohort",
        "hour",
        interp.alias("value_interp"),
        F.col("v").isNull().cast("long").alias("was_gap"),
        (F.col("v").isNull() & (prev_v.isNull() | next_v.isNull()))
        .cast("long")
        .alias("edge_gap"),
    ).orderBy("cohort", "hour")


QUERIES["resample_interpolate_linear"] = resample_interpolate_linear
ORACLE_SQL["resample_interpolate_linear"] = """
    WITH hourly AS (
        SELECT user_id % 5 AS cohort,
               DATE_TRUNC('hour', ts) AS hour,
               ROUND(AVG(value), 6) AS v
        FROM events
        WHERE event_type = 'error'
        GROUP BY user_id % 5, DATE_TRUNC('hour', ts)),
    axis AS (
        SELECT c.cohort, h.hour
        FROM (SELECT UNNEST(RANGE(0, 5)) AS cohort) c,
             (SELECT UNNEST(GENERATE_SERIES(TIMESTAMP '2024-01-01 00:00:00',
                                            TIMESTAMP '2024-01-30 23:00:00',
                                            INTERVAL 1 HOUR)) AS hour) h),
    g AS (
        SELECT a.cohort, a.hour, hr.v
        FROM axis a LEFT JOIN hourly hr
          ON a.cohort = hr.cohort AND a.hour = hr.hour),
    st AS (
        SELECT cohort, hour, v,
               LAST_VALUE(v IGNORE NULLS) OVER wb AS prev_v,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN hour END
                          IGNORE NULLS) OVER wb AS prev_h,
               FIRST_VALUE(v IGNORE NULLS) OVER wf AS next_v,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN hour END
                           IGNORE NULLS) OVER wf AS next_h
        FROM g
        WINDOW wb AS (PARTITION BY cohort ORDER BY hour
                      ROWS UNBOUNDED PRECEDING),
               wf AS (PARTITION BY cohort ORDER BY hour
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT cohort, hour,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                  CAST(FLOOR((prev_v + (next_v - prev_v)
                        * (CAST(EPOCH(hour) - EPOCH(prev_h) AS DOUBLE)
                           / CAST(EPOCH(next_h) - EPOCH(prev_h)
                                  AS DOUBLE))) * 1000000 + 0.5)
                       AS DOUBLE) / 1000000.0
           END AS value_interp,
           CAST(v IS NULL AS BIGINT) AS was_gap,
           CAST(v IS NULL AND (prev_v IS NULL OR next_v IS NULL)
                AS BIGINT) AS edge_gap
    FROM st
    ORDER BY cohort, hour
"""


def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization + motif counting (Lin/Keogh '03): each event
    type's hourly-mean series is z-normalized, discretized to a 4-letter
    alphabet at the N(0,1) quartile breakpoints (-0.6745, 0, 0.6745),
    and the top-10 recurring 3-symbol motifs per type are counted — the
    classic time-series data-mining reduction that turns numeric series
    into strings so substring machinery (here: the same trigram
    explode the text pack uses) finds repeated structure.

    Determinism: hourly means are 6dp ``davg`` values copied onto an
    exact micro-unit grid, so the per-type mean/std come from exact
    integer moments and the z-breakpoint comparisons are identical
    doubles in both engines.  Scale: one (type, hour) groupBy is the
    only data-sized stage; series length is calendar-bounded, so
    symbolization and motif counting run on |types| x |hours| rows."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(davg("value", "v"))
    hourly = hourly.withColumn(
        "vm", F.floor(F.col("v") * 1000000 + F.lit(0.5)).cast("long")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("s"),
        F.sum(F.col("vm") * F.col("vm")).alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n")
        )
        / (F.col("n") - F.lit(1.0))
    )
    z = (F.col("vm").cast("double") - F.col("mu")) / F.col("sd")
    sym = (
        F.when(z < F.lit(-0.6745), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(0.6745), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    series = (
        hourly.join(stats.select("event_type", mu.alias("mu"), sd.alias("sd")), "event_type")
        .withColumn("sym", sym)
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("hour", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("sax")
        )
    )
    # substring with a dynamic start needs the expr form (F.substring
    # takes a literal start); build trigrams via expr over the sequence
    grams = series.select(
        "event_type",
        F.explode(
            F.expr(
                "transform(sequence(1, length(sax) - 2),"
                " i -> substring(sax, i, 3))"
            )
        ).alias("motif"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n_occ"), F.asc("motif")
    )
    return (
        grams.groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("event_type", "motif", "n_occ", F.col("rn").cast("long").alias("rank"))
        .orderBy("event_type", "rank")
    )


QUERIES["ts_sax_motifs"] = ts_sax_motifs
ORACLE_SQL["ts_sax_motifs"] = """
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hour,
               CAST(FLOOR(ROUND(AVG(value), 6) * 1000000 + 0.5)
                    AS BIGINT) AS vm
        FROM events GROUP BY event_type, DATE_TRUNC('hour', ts)),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(vm) AS DOUBLE) AS s,
               CAST(SUM(vm * vm) AS DOUBLE) AS ss
        FROM hourly GROUP BY event_type),
    syms AS (
        SELECT h.event_type, h.hour,
               CASE WHEN (CAST(h.vm AS DOUBLE) - s.s / s.n)
                         / SQRT((s.ss - s.s * s.s / s.n) / (s.n - 1.0))
                         < -0.6745 THEN 'a'
                    WHEN (CAST(h.vm AS DOUBLE) - s.s / s.n)
                         / SQRT((s.ss - s.s * s.s / s.n) / (s.n - 1.0))
                         < 0.0 THEN 'b'
                    WHEN (CAST(h.vm AS DOUBLE) - s.s / s.n)
                         / SQRT((s.ss - s.s * s.s / s.n) / (s.n - 1.0))
                         < 0.6745 THEN 'c'
                    ELSE 'd' END AS sym
        FROM hourly h JOIN stats s USING (event_type)),
    series AS (
        SELECT event_type,
               STRING_AGG(sym, '' ORDER BY hour) AS sax
        FROM syms GROUP BY event_type),
    grams AS (
        SELECT event_type, SUBSTR(sax, CAST(i AS INT), 3) AS motif
        FROM series, UNNEST(RANGE(1, LENGTH(sax) - 1)) AS t(i)),
    counted AS (
        SELECT event_type, motif, COUNT(*) AS n_occ,
               ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY COUNT(*) DESC, motif ASC) AS rn
        FROM grams GROUP BY event_type, motif)
    SELECT event_type, motif, n_occ, CAST(rn AS BIGINT) AS rank
    FROM counted WHERE rn <= 10
    ORDER BY event_type, rank
"""


def ts_stl_residual_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the DECOMPOSED series: residual = hourly
    mean - MA trend - seasonal index (the ``ts_seasonal_decompose_ma``
    components, per hour), scored by the robust MAD z-score
    (z = (r - median) / (1.4826 * MAD)) and the top-20 |z| hours
    surfaced — the standard "alert on what the trend and the daily
    cycle can't explain" detector, robust because one true anomaly
    can't inflate its own threshold the way it would a stddev.

    Exactness: residuals stay in long micro-units (the decompose
    contract), medians of longs are exact .0/.5 doubles in both
    engines, and the z arithmetic is the same IEEE tree; |z| is
    rounded BEFORE the presentation sort (the pagerank discipline).
    Scale: per-hour frames are calendar-bounded after the one
    (type, hour) aggregation; the median groupBys are |types|-keyed."""
    from pyspark.sql import Window as _W  # noqa: F401 (parity w/ module)

    ev = load_table(spark, "events", sf_dir)
    trended = _hourly_trended(ev)
    seasonal = trended.groupBy(
        "event_type", F.hour("hb").alias("hod")
    ).agg(
        F.floor(F.sum(F.col("m") - F.col("trend")) / F.count(F.lit(1)))
        .cast("long")
        .alias("sm")
    )
    resid = (
        trended.withColumn("hod", F.hour("hb"))
        .join(seasonal, ["event_type", "hod"])
        .select(
            "event_type",
            "hb",
            (F.col("m") - F.col("trend") - F.col("sm")).alias("r"),
        )
    )
    med = resid.groupBy("event_type").agg(F.median("r").alias("med"))
    mad = (
        resid.join(med, "event_type")
        .select("event_type", F.abs(F.col("r") - F.col("med")).alias("a"))
        .groupBy("event_type")
        .agg(F.median("a").alias("mad"))
    )
    z = (F.col("r") - F.col("med")) / (F.lit(1.4826) * F.col("mad"))
    scored = (
        resid.join(med, "event_type")
        .join(mad, "event_type")
        .filter(F.col("mad") > 0)
        .select(
            "event_type",
            "hb",
            F.round(F.col("r") / F.lit(1000000.0), 6).alias("residual"),
            F.round(z, 4).alias("z_mad"),
            F.round(F.abs(z), 4).alias("abs_z"),
        )
    )
    return (
        scored.orderBy(F.desc("abs_z"), "event_type", "hb")
        .limit(20)
        .select(
            "event_type",
            "hb",
            "residual",
            "z_mad",
            (F.col("abs_z") > F.lit(3.5)).cast("long").alias("is_anomaly"),
        )
    )


QUERIES["ts_stl_residual_outliers"] = ts_stl_residual_outliers
ORACLE_SQL["ts_stl_residual_outliers"] = f"""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS hb,
               SUM(CAST(SIGN(value) * FLOOR(ABS(value) * 1e6 + 0.5)
                        AS BIGINT)) AS t,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2),
    m AS (
        SELECT event_type, hb, CAST(FLOOR(t / c) AS BIGINT) AS m
        FROM hourly),
    trended AS (
        SELECT event_type, hb, m,
               CAST(FLOOR(ma_sum / {2 * _MA_HALF + 1}) AS BIGINT) AS trend
        FROM (
            SELECT event_type, hb, m,
                   SUM(m) OVER w AS ma_sum,
                   COUNT(*) OVER w AS ma_n
            FROM m
            WINDOW w AS (PARTITION BY event_type ORDER BY hb
                         ROWS BETWEEN {_MA_HALF} PRECEDING
                              AND {_MA_HALF} FOLLOWING))
        WHERE ma_n = {2 * _MA_HALF + 1}),
    seasonal AS (
        SELECT event_type, HOUR(hb) AS hod,
               CAST(FLOOR(SUM(m - trend) / COUNT(*)) AS BIGINT) AS sm
        FROM trended GROUP BY event_type, HOUR(hb)),
    resid AS (
        SELECT t.event_type, t.hb, t.m - t.trend - s.sm AS r
        FROM trended t
        JOIN seasonal s
          ON s.event_type = t.event_type AND s.hod = HOUR(t.hb)),
    med AS (
        SELECT event_type, MEDIAN(r) AS med FROM resid GROUP BY event_type),
    mad AS (
        SELECT r.event_type, MEDIAN(ABS(r.r - m.med)) AS mad
        FROM resid r JOIN med m USING (event_type)
        GROUP BY r.event_type),
    scored AS (
        SELECT r.event_type, r.hb,
               ROUND(r.r / 1000000.0, 6) AS residual,
               ROUND((r.r - m.med) / (1.4826 * d.mad), 4) AS z_mad,
               ROUND(ABS((r.r - m.med) / (1.4826 * d.mad)), 4) AS abs_z
        FROM resid r
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        WHERE d.mad > 0)
    SELECT event_type, hb, residual, z_mad,
           CAST(abs_z > 3.5 AS BIGINT) AS is_anomaly
    FROM scored
    ORDER BY abs_z DESC, event_type, hb
    LIMIT 20
"""


#: Candidate cycle lengths (hours) probed by the DFT periodogram:
#: quarter-day through weekly.  A fixed, calendar-motivated grid keeps
#: the spectrum oracle-expressible (one unpivot arm per period) and is
#: what a monitoring pipeline actually asks ("is there a daily cycle?"),
#: not a full FFT bin sweep.
PERIODOGRAM_PERIODS = (6, 8, 12, 24, 84, 168)
_TWO_PI = 6.283185307179586


def _periodogram_pf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of the hourly event-count series
    per event type at six calendar periods (6 h .. weekly): the
    frequency-domain twin of ``ts_acf_hourly``'s lag-domain seasonality
    probe.  For period P the spectral mass is
    ``power = C^2 + S^2`` with ``C = sum_t (x_t - mean) cos(2 pi t/P)``
    (and S the sine sum), presented as the FRACTION of total variance
    at that line, ``n (C/n)^2 + (S/n)^2) / sum (x-mean)^2`` — the
    quantity a seasonality detector thresholds.  The dominant period
    per series is flagged.

    Determinism: the trig sums are ORDER-SENSITIVE float folds, so both
    engines fold the SAME t-ordered array left-to-right
    (``F.aggregate`` here, ``LIST_REDUCE`` in the oracle — the Croston
    convention), normalize by n, and round to the 6-decimal canon grid
    BEFORE squaring; the variance denominator is assembled from exact
    BIGINT moments (n, s, q) by one fixed-order expression.  Remaining
    cross-engine risk is libm cos/sin ulps, ~1e-13 relative after the
    /n normalization — far inside the rounding grid.

    Scale: ONE data-sized aggregation (events -> hourly counts, map-side
    combinable); the dense grid and the per-type fold arrays are
    calendar-bounded (hours x types, never event-count-sized), exactly
    the ``ts_acf_hourly`` argument."""
    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            "h0",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = (
        grid.join(hourly, ["event_type", "h"], "left")
        .fillna(0, subset=["x"])
        .select(
            "event_type",
            F.expr("timestampdiff(HOUR, h0, h)").cast("long").alias("t"),
            "x",
        )
    )
    arr = dense.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("t").alias("t"), F.col("x").alias("x")))
        ).alias("sv"),
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    mean = F.col("s") / F.col("n")

    def _fold(trig, period):
        return F.round(
            F.aggregate(
                "sv",
                F.lit(0.0),
                lambda acc, e: acc
                + (e["x"].cast("double") - mean)
                * trig(
                    F.lit(_TWO_PI) * e["t"].cast("double") / F.lit(float(period))
                ),
            )
            / F.col("n"),
            6,
        )

    wide = arr.select(
        "event_type",
        "n",
        "s",
        "q",
        *[
            c
            for P in PERIODOGRAM_PERIODS
            for c in (
                _fold(F.cos, P).alias(f"c{P}"),
                _fold(F.sin, P).alias(f"s{P}"),
            )
        ],
    )
    # a constant series has zero variance: NULL the ratio (DuckDB's
    # native x/0 behavior) instead of raising under Spark ANSI mode
    varsum = F.nullif(F.col("q") - mean * F.col("s"), F.lit(0.0))
    pf = wide.select(
        "event_type",
        "n",
        *[
            F.round(
                (
                    F.col("n")
                    * (
                        F.col(f"c{P}") * F.col(f"c{P}")
                        + F.col(f"s{P}") * F.col(f"s{P}")
                    )
                )
                / varsum,
                6,
            ).alias(f"pf{P}")
            for P in PERIODOGRAM_PERIODS
        ],
    )
    return pf


def ts_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See the module docstring above ``_periodogram_pf`` (the pipeline
    was factored so ``ts_spectral_entropy`` reuses the identical pf
    frame); this presents the long per-(type, period) form with the
    dominant-period flag."""
    pf = _periodogram_pf(spark, sf_dir)
    stack_args = ", ".join(f"{P}, pf{P}" for P in PERIODOGRAM_PERIODS)
    long = pf.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.expr(
            f"stack({len(PERIODOGRAM_PERIODS)}, {stack_args})"
            " AS (period_hours, power_frac)"
        ),
    )
    from pyspark.sql import Window

    w_dom = Window.partitionBy("event_type").orderBy(
        F.desc("power_frac"), "period_hours"
    )
    return (
        long.select(
            "event_type",
            F.col("period_hours").cast("long").alias("period_hours"),
            "power_frac",
            (F.row_number().over(w_dom) == 1).cast("long").alias("is_dominant"),
            "n_hours",
        )
        .orderBy("event_type", "period_hours")
    )


QUERIES["ts_periodogram_dft"] = ts_periodogram_dft


def _periodogram_sql() -> str:
    """Mirror of ts_periodogram_dft: LIST_REDUCE left folds over the
    same t-ordered arrays, /n normalization and 6-dp rounding before
    squaring, exact-BIGINT variance denominator."""
    fold_cols = ",\n               ".join(
        f"ROUND(LIST_REDUCE(LIST_TRANSFORM(generate_series(1, LEN(xs)),"
        f" i -> (xs[i] - s * 1.0 / n) * {trig}("
        f"6.283185307179586 * ts_[i] / {P}.0)),"
        f" (a, b) -> a + b) / n, 6) AS {pre}{P}"
        for P in PERIODOGRAM_PERIODS
        for trig, pre in (("COS", "c"), ("SIN", "s"))
    )
    pf_cols = ",\n               ".join(
        f"ROUND((n * (c{P} * c{P} + s{P} * s{P}))"
        f" / NULLIF(q - (s * 1.0 / n) * s, 0.0), 6) AS pf{P}"
        for P in PERIODOGRAM_PERIODS
    )
    unpivot = "\n            UNION ALL\n            ".join(
        f"SELECT event_type, n, {P} AS period_hours, pf{P} AS power_frac"
        f" FROM pf"
        for P in PERIODOGRAM_PERIODS
    )
    return f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, b.h0,
                   UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN bnds b),
        dense AS (
            SELECT g.event_type,
                   CAST(DATE_DIFF('hour', g.h0, g.h) AS BIGINT) AS t,
                   COALESCE(hourly.x, 0) AS x
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h),
        arr AS (
            SELECT event_type,
                   LIST(CAST(t AS DOUBLE) ORDER BY t) AS ts_,
                   LIST(CAST(x AS DOUBLE) ORDER BY t) AS xs,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM dense GROUP BY 1),
        wide AS (
            SELECT event_type, n, s, q,
               {fold_cols}
            FROM arr),
        pf AS (
            SELECT event_type, n, s, q,
               {pf_cols}
            FROM wide),
        longf AS (
            {unpivot})
        SELECT event_type,
               CAST(period_hours AS BIGINT) AS period_hours,
               power_frac,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY power_frac DESC,
                                                period_hours) = 1
                    AS BIGINT) AS is_dominant,
               CAST(n AS BIGINT) AS n_hours
        FROM longf
        ORDER BY event_type, period_hours
    """


ORACLE_SQL["ts_periodogram_dft"] = _periodogram_sql()

#: Ljung-Box portmanteau lag span (consecutive 1..12 h) and the
#: chi-square 95th-percentile critical value at 12 degrees of freedom.
LB_MAX_LAG = 12
LB_CHI2_95_DF12 = 21.0261


def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau white-noise test on the hourly event-count
    series per event type: Q = n(n+2) sum_{k=1..12} r_k^2 / (n-k),
    the standard "is there ANY autocorrelation in the first m lags?"
    omnibus that complements ``ts_acf_hourly``'s per-lag view (and is
    the residual-whiteness gate a forecaster like ``ts_holt_linear``
    should pass before its intervals are trusted).  Rejection is
    against the fixed chi-square(12) 95% critical value, carried as a
    literal in both engines.

    Determinism: identical exact-BIGINT moment pipeline as
    ``ts_acf_hourly`` (per-lag P/A/B sums over the dense grid), each
    r_k rounded to the 6-dp canon grid first, then ONE fixed-order
    left-to-right chain of the twelve r_k^2/(n-k) terms — no unordered
    float aggregation anywhere.

    Scale: one data-sized groupBy to hourly counts; the 12-lag window
    and moment rollup run on the calendar-bounded grid, sharing a
    single per-type sort."""
    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").fillna(
        0, subset=["x"]
    )
    from pyspark.sql import Window

    lags = range(1, LB_MAX_LAG + 1)
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = dense.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in lags],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ]
    for k in lags:
        aggs += [
            F.sum(F.col("x") * F.col(f"l{k}")).alias(f"p{k}"),
            F.sum(F.when(F.col(f"l{k}").isNotNull(), F.col("x"))).alias(
                f"a{k}"
            ),
            F.sum(f"l{k}").alias(f"b{k}"),
        ]
    st = lagged.groupBy("event_type").agg(*aggs)
    mean = F.col("s") / F.col("n")
    den = F.nullif(F.col("q") - mean * F.col("s"), F.lit(0.0))
    rks = st.select(
        "event_type",
        "n",
        *[
            F.round(
                (
                    F.col(f"p{k}")
                    - mean * (F.col(f"a{k}") + F.col(f"b{k}"))
                    + (F.col("n") - F.lit(k)) * mean * mean
                )
                / den,
                6,
            ).alias(f"r{k}")
            for k in lags
        ],
    )
    chain = None
    for k in lags:
        term = (F.col(f"r{k}") * F.col(f"r{k}")) / F.nullif(
            (F.col("n") - F.lit(k)).cast("double"), F.lit(0.0)
        )
        chain = term if chain is None else chain + term
    q_stat = F.round((F.col("n") * (F.col("n") + F.lit(2))) * chain, 6)
    return (
        rks.select(
            "event_type",
            F.col("n").cast("long").alias("n_hours"),
            F.lit(LB_MAX_LAG).cast("long").alias("m_lags"),
            q_stat.alias("q_stat"),
            (q_stat > F.lit(LB_CHI2_95_DF12)).cast("long").alias(
                "white_noise_rejected"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["ts_ljung_box"] = ts_ljung_box


def _ljung_box_sql() -> str:
    """Mirror of ts_ljung_box: the ts_acf_hourly moment CTEs widened to
    twelve consecutive lags, each r_k rounded to 6 dp, then one
    left-to-right term chain — fixed evaluation order in both engines."""
    lags = range(1, LB_MAX_LAG + 1)
    lag_cols = ",\n                   ".join(
        f"LAG(x, {k}) OVER w AS l{k}" for k in lags
    )
    moment_cols = ",\n                   ".join(
        f"CAST(SUM(x * l{k}) AS BIGINT) AS p{k},\n"
        f"                   CAST(SUM(CASE WHEN l{k} IS NOT NULL "
        f"THEN x END) AS BIGINT) AS a{k},\n"
        f"                   CAST(SUM(l{k}) AS BIGINT) AS b{k}"
        for k in lags
    )
    rk_cols = ",\n                   ".join(
        f"ROUND((p{k} - (s * 1.0 / n) * (a{k} + b{k})"
        f" + (n - {k}) * (s * 1.0 / n) * (s * 1.0 / n))"
        f" / (q - (s * 1.0 / n) * s), 6) AS r{k}"
        for k in lags
    )
    chain = " + ".join(f"(r{k} * r{k}) / (n - {k})" for k in lags)
    return f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT UNNEST(generate_series(h0, h1,
                                      INTERVAL 1 HOUR)) AS h
                        FROM bnds) g),
        dense AS (
            SELECT grid.event_type, grid.h, COALESCE(hourly.x, 0) AS x
            FROM grid LEFT JOIN hourly
              ON hourly.event_type = grid.event_type
             AND hourly.h = grid.h),
        lagged AS (
            SELECT event_type, x,
                   {lag_cols}
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY h)),
        st AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q,
                   {moment_cols}
            FROM lagged GROUP BY 1),
        rks AS (
            SELECT event_type, n,
                   {rk_cols}
            FROM st)
        SELECT event_type,
               n AS n_hours,
               CAST({LB_MAX_LAG} AS BIGINT) AS m_lags,
               ROUND((n * (n + 2)) * ({chain}), 6) AS q_stat,
               CAST(ROUND((n * (n + 2)) * ({chain}), 6)
                    > {LB_CHI2_95_DF12} AS BIGINT) AS white_noise_rejected
        FROM rks
        ORDER BY event_type
    """


ORACLE_SQL["ts_ljung_box"] = _ljung_box_sql()


#: cross-correlation lags probed (hours; negative = x leads y)
XCORR_LAGS = (-24, -12, -6, -3, -1, 0, 1, 3, 6, 12, 24)
XCORR_X, XCORR_Y = "click", "purchase"


def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the hourly click and purchase
    count series: r_xy(k) over k in -24..+24 h — the LEAD-LAG detector
    ("do clicks lead purchases, and by how much?") that the
    single-series ACF (``ts_acf_hourly``) cannot answer, and the
    time-domain justification for attribution windows
    (``events_time_to_convert`` measures per-pair latency; this
    measures population-level phase shift).  The peak lag is flagged.

    Same exact-BIGINT moment discipline as the ACF: per lag,
    P_k = sum x_t y_{t+k} plus the overlap boundary sums A_k/B_k are
    exact integers over the dense grid; full-series means/variances
    come from exact n/Sx/Qx/Sy/Qy; every float op is one fixed-order
    expression per lag, identical in both engines.

    Scale: one data-sized groupBy to hourly counts; the lag windows
    and moment rollup run on the calendar-bounded two-column grid
    (one sort serves every lag)."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin(XCORR_X, XCORR_Y))
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("h")
        .agg(
            F.sum((F.col("event_type") == XCORR_X).cast("long")).alias("xr"),
            F.sum((F.col("event_type") == XCORR_Y).cast("long")).alias("yr"),
        )
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        global_bounds.select(
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
        )
    )
    dense = grid.join(hourly, ["h"], "left").fillna(0, subset=["xr", "yr"])
    w = Window.orderBy("h")
    shift_cols = []
    for k in XCORR_LAGS:
        yk = (
            F.lead("yr", k).over(w) if k >= 0 else F.lag("yr", -k).over(w)
        )
        shift_cols.append(yk.alias(f"y{k}"))
    lagged = dense.select("xr", "yr", *shift_cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("xr").alias("sx"),
        F.sum(F.col("xr") * F.col("xr")).alias("qx"),
        F.sum("yr").alias("sy"),
        F.sum(F.col("yr") * F.col("yr")).alias("qy"),
    ]
    for k in XCORR_LAGS:
        yc = F.col(f"y{k}")
        aggs += [
            F.sum(F.col("xr") * yc).alias(f"p{k}"),
            F.sum(F.when(yc.isNotNull(), F.col("xr"))).alias(f"a{k}"),
            F.sum(yc).alias(f"b{k}"),
        ]
    st = lagged.groupBy().agg(*aggs)
    mx = F.col("sx") / F.col("n")
    my = F.col("sy") / F.col("n")
    den = F.nullif(
        F.sqrt(
            (F.col("qx") - mx * F.col("sx"))
            * (F.col("qy") - my * F.col("sy"))
        ),
        F.lit(0.0),
    )
    def _suf(k: int) -> str:
        return f"m{-k}" if k < 0 else str(k)

    rks = st.select(
        "n",
        *[
            F.round(
                (
                    F.col(f"p{k}")
                    - mx * F.col(f"b{k}")
                    - my * F.col(f"a{k}")
                    + (F.col("n") - F.lit(abs(k))) * mx * my
                )
                / den,
                6,
            ).alias(f"r{_suf(k)}")
            for k in XCORR_LAGS
        ],
    )
    stack_args = ", ".join(f"{k}, r{_suf(k)}" for k in XCORR_LAGS)
    long = rks.select(
        F.col("n").cast("long").alias("n_hours"),
        F.expr(
            f"stack({len(XCORR_LAGS)}, {stack_args}) AS (lag_hours, xcorr)"
        ),
    )
    w_peak = Window.partitionBy().orderBy(
        F.desc("xcorr"), "lag_hours"
    )
    return (
        long.select(
            F.col("lag_hours").cast("long").alias("lag_hours"),
            "xcorr",
            (F.row_number().over(w_peak) == 1).cast("long").alias("is_peak"),
            "n_hours",
        )
        .orderBy("lag_hours")
    )


QUERIES["ts_cross_correlation"] = ts_cross_correlation


def _xcorr_sql() -> str:
    """Mirror of ts_cross_correlation: same exact-moment expansion per
    lag, same fixed-order float expressions."""
    shift_cols = ",\n                   ".join(
        (
            f"LEAD(yr, {k}) OVER w AS y{k}"
            if k >= 0
            else f"LAG(yr, {-k}) OVER w AS y{k}"
        ).replace("y-", "ym")
        for k in XCORR_LAGS
    )
    def yn(k):
        return f"ym{-k}" if k < 0 else f"y{k}"
    moment_cols = ",\n                   ".join(
        f"CAST(SUM(xr * {yn(k)}) AS BIGINT) AS p{('m'+str(-k)) if k<0 else k},\n"
        f"                   CAST(SUM(CASE WHEN {yn(k)} IS NOT NULL "
        f"THEN xr END) AS BIGINT) AS a{('m'+str(-k)) if k<0 else k},\n"
        f"                   CAST(SUM({yn(k)}) AS BIGINT) AS b{('m'+str(-k)) if k<0 else k}"
        for k in XCORR_LAGS
    )
    def suf(k):
        return f"m{-k}" if k < 0 else str(k)
    rk_cols = ",\n                   ".join(
        f"ROUND((p{suf(k)} - (sx * 1.0 / n) * b{suf(k)}"
        f" - (sy * 1.0 / n) * a{suf(k)}"
        f" + (n - {abs(k)}) * (sx * 1.0 / n) * (sy * 1.0 / n))"
        f" / SQRT((qx - (sx * 1.0 / n) * sx)"
        f" * (qy - (sy * 1.0 / n) * sy)), 6) AS r{suf(k)}"
        for k in XCORR_LAGS
    )
    unpivot = "\n            UNION ALL\n            ".join(
        f"SELECT n, {k} AS lag_hours, r{suf(k)} AS xcorr FROM rks"
        for k in XCORR_LAGS
    )
    return f"""
        WITH hourly AS (
            SELECT DATE_TRUNC('hour', ts) AS h,
                   CAST(SUM(CASE WHEN event_type = '{XCORR_X}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS xr,
                   CAST(SUM(CASE WHEN event_type = '{XCORR_Y}'
                            THEN 1 ELSE 0 END) AS BIGINT) AS yr
            FROM events
            WHERE event_type IN ('{XCORR_X}', '{XCORR_Y}')
            GROUP BY 1),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bnds),
        dense AS (
            SELECT g.h, COALESCE(hourly.xr, 0) AS xr,
                   COALESCE(hourly.yr, 0) AS yr
            FROM grid g LEFT JOIN hourly ON hourly.h = g.h),
        lagged AS (
            SELECT xr, yr,
                   {shift_cols}
            FROM dense
            WINDOW w AS (ORDER BY h)),
        st AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xr) AS BIGINT) AS sx,
                   CAST(SUM(xr * xr) AS BIGINT) AS qx,
                   CAST(SUM(yr) AS BIGINT) AS sy,
                   CAST(SUM(yr * yr) AS BIGINT) AS qy,
                   {moment_cols}
            FROM lagged),
        rks AS (
            SELECT n,
                   {rk_cols}
            FROM st),
        longf AS (
            {unpivot})
        SELECT CAST(lag_hours AS BIGINT) AS lag_hours,
               xcorr,
               CAST(ROW_NUMBER() OVER (ORDER BY xcorr DESC, lag_hours) = 1
                    AS BIGINT) AS is_peak,
               n AS n_hours
        FROM longf
        ORDER BY lag_hours
    """


ORACLE_SQL["ts_cross_correlation"] = _xcorr_sql()


#: Dickey-Fuller tau-mu 5% critical value (constant, no trend; large n)
ADF_TAU_MU_95 = -2.86


def ts_adf_unit_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dickey-Fuller unit-root test on the hourly event-count series
    per type: OLS of delta_x_t on x_{t-1} with a constant, the
    coefficient rho = phi - 1 and its t-statistic against the
    tau-mu 5% critical value — the STATIONARITY gate that decides
    whether level models (EMA/Holt, ``ts_acf_hourly``'s stationary
    ACF reading) apply or the series needs differencing first.  A
    stationary count series rejects the unit root (t << -2.86); a
    random-walk-like one does not.

    All OLS sufficient statistics (m, Sx, Sy, Sxx, Syy, Sxy over the
    m = n-1 lag pairs) are exact BIGINTs on the dense grid; rho, the
    regression SSE and the t-statistic are one fixed IEEE tree over
    those integers — engine-exact before the 6-dp round.  Zero-variance
    denominators NULL via nullif (the ANSI-mode convention).

    Scale: one data-sized groupBy to hourly counts; the lag pairing
    and moment rollup run on the calendar-bounded grid."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("xc"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").fillna(
        0, subset=["xc"]
    )
    w = Window.partitionBy("event_type").orderBy("h")
    pairs = dense.select(
        "event_type",
        F.lag("xc").over(w).alias("x"),
        (F.col("xc") - F.lag("xc").over(w)).alias("y"),
    ).where(F.col("x").isNotNull())
    g = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = F.col("m").cast("double")
    d_int = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    rho = (
        (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / F.nullif(d_int.cast("double"), F.lit(0.0))
    )
    cxx = F.col("sxx") - (F.col("sx") * F.col("sx")).cast("double") / m
    cxy = F.col("sxy") - (F.col("sx") * F.col("sy")).cast("double") / m
    cyy = F.col("syy") - (F.col("sy") * F.col("sy")).cast("double") / m
    sse = cyy - rho * cxy
    sigma2 = sse / F.nullif(m - F.lit(2.0), F.lit(0.0))
    t_stat = F.round(
        rho
        / F.nullif(
            F.sqrt(sigma2 / F.nullif(cxx, F.lit(0.0))), F.lit(0.0)
        ),
        6,
    )
    return (
        g.select(
            "event_type",
            F.col("m").cast("long").alias("n_obs"),
            F.round(rho, 6).alias("rho"),
            t_stat.alias("t_df"),
            (t_stat < F.lit(ADF_TAU_MU_95)).cast("long").alias(
                "unit_root_rejected_95"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["ts_adf_unit_root"] = ts_adf_unit_root

ORACLE_SQL["ts_adf_unit_root"] = f"""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS xc
        FROM events GROUP BY 1, 2),
    bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT UNNEST(generate_series(h0, h1,
                                  INTERVAL 1 HOUR)) AS h
                    FROM bnds) g),
    dense AS (
        SELECT grid.event_type, grid.h, COALESCE(hourly.xc, 0) AS xc
        FROM grid LEFT JOIN hourly
          ON hourly.event_type = grid.event_type AND hourly.h = grid.h),
    pairs AS (
        SELECT event_type,
               LAG(xc) OVER w AS x,
               xc - LAG(xc) OVER w AS y
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY h)),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM pairs WHERE x IS NOT NULL
        GROUP BY 1),
    est AS (
        SELECT event_type, m,
               CAST(m * sxy - sx * sy AS DOUBLE)
                   / NULLIF(CAST(m * sxx - sx * sx AS DOUBLE), 0.0) AS rho,
               sxx - CAST(sx * sx AS DOUBLE) / m AS cxx,
               sxy - CAST(sx * sy AS DOUBLE) / m AS cxy,
               syy - CAST(sy * sy AS DOUBLE) / m AS cyy
        FROM g),
    tt AS (
        SELECT event_type, m, rho,
               ROUND(rho / NULLIF(SQRT(((cyy - rho * cxy)
                                        / NULLIF(m - 2.0, 0.0))
                                       / NULLIF(cxx, 0.0)), 0.0), 6)
                   AS t_df
        FROM est)
    SELECT event_type,
           m AS n_obs,
           ROUND(rho, 6) AS rho,
           t_df,
           CAST(t_df < {ADF_TAU_MU_95} AS BIGINT)
               AS unit_root_rejected_95
    FROM tt
    ORDER BY event_type
"""


#: KPSS level-stationarity 5% critical value (Kwiatkowski et al. '92)
KPSS_CRIT_95 = 0.463


def ts_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test on the hourly event-count series
    per type: eta = sum_t S_t^2 / (n^2 sigma^2) with S_t the partial
    sums of deviations from the mean — the REVERSED-null complement to
    ``ts_adf_unit_root`` (ADF's null is a unit root, KPSS's null is
    stationarity; agreement of both is the textbook confirmation
    protocol).  Short-run variance form (lag-truncation l = 0, iid
    residuals) so the statistic is closed-form exact; rejection
    against the published 5% level-stationarity critical value 0.463.

    Exactness: S_t = cum_t - t*mean has the exact-integer numerator
    N_t = n*cum_t - t*s, so sum S_t^2 = sum N_t^2 / n^2 with the
    squares accumulated in DECIMAL(38,0) (the 4th-moment discipline —
    N_t^2 outgrows BIGINT on multi-year calendars); eta is then ONE
    fixed IEEE tree over exact inputs.  The cumulative sum itself is
    an ordered window fold — sequential in both engines.

    Scale: one data-sized groupBy to hourly counts; cumsum + moment
    rollup on the calendar-bounded grid."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("xc"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").fillna(
        0, subset=["xc"]
    )
    w_cum = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("event_type")
    staged = dense.select(
        "event_type",
        "xc",
        F.sum("xc").over(w_cum).alias("cum"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("h"))
        .alias("t"),
        F.sum("xc").over(w_all).alias("s"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    num = F.col("n") * F.col("cum") - F.col("t") * F.col("s")
    g = staged.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(F.col("xc") * F.col("xc")).alias("q"),
        F.sum(
            num.cast("decimal(19,0)") * num.cast("decimal(19,0)")
        ).alias("sumnum2"),
    )
    n = F.col("n")
    sigma2 = (
        F.col("q") - (F.col("s") / n.cast("double")) * F.col("s")
    ) / n.cast("double")
    n4 = (n * n) * (n * n)
    eta = F.round(
        F.col("sumnum2").cast("double")
        / F.nullif(n4.cast("double") * sigma2, F.lit(0.0)),
        6,
    )
    return (
        g.select(
            "event_type",
            n.cast("long").alias("n_hours"),
            eta.alias("kpss_eta"),
            (eta > F.lit(KPSS_CRIT_95)).cast("long").alias(
                "stationarity_rejected_95"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["ts_kpss_stationarity"] = ts_kpss_stationarity

ORACLE_SQL["ts_kpss_stationarity"] = f"""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS xc
        FROM events GROUP BY 1, 2),
    bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT UNNEST(generate_series(h0, h1,
                                  INTERVAL 1 HOUR)) AS h
                    FROM bnds) g),
    dense AS (
        SELECT grid.event_type, grid.h, COALESCE(hourly.xc, 0) AS xc
        FROM grid LEFT JOIN hourly
          ON hourly.event_type = grid.event_type AND hourly.h = grid.h),
    staged AS (
        SELECT event_type, xc,
               CAST(SUM(xc) OVER (PARTITION BY event_type ORDER BY h
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY h) AS BIGINT) AS t,
               CAST(SUM(xc) OVER (PARTITION BY event_type) AS BIGINT) AS s,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM dense),
    g AS (
        SELECT event_type,
               MAX(n) AS n,
               MAX(s) AS s,
               CAST(SUM(xc * xc) AS BIGINT) AS q,
               SUM(CAST(n * cum - t * s AS DECIMAL(19,0))
                   * CAST(n * cum - t * s AS DECIMAL(19,0))) AS sumnum2
        FROM staged GROUP BY 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           ROUND(CAST(sumnum2 AS DOUBLE)
                 / NULLIF(CAST((n * n) * (n * n) AS DOUBLE)
                          * ((q - (s / CAST(n AS DOUBLE)) * s)
                             / CAST(n AS DOUBLE)), 0.0), 6) AS kpss_eta,
           CAST(ROUND(CAST(sumnum2 AS DOUBLE)
                      / NULLIF(CAST((n * n) * (n * n) AS DOUBLE)
                               * ((q - (s / CAST(n AS DOUBLE)) * s)
                                  / CAST(n AS DOUBLE)), 0.0), 6)
                > {KPSS_CRIT_95} AS BIGINT) AS stationarity_rejected_95
    FROM g
    ORDER BY event_type
"""


#: F(1, large-df) 95% critical value for the one-extra-lag Granger F
GRANGER_F_95 = 3.8415


def ts_granger_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger-style predictive test between the hourly click
    and purchase series, BOTH directions: does adding x_{t-1} to an
    AR(1) of y reduce the residual sum of squares more than chance?
    F = (SSE_restricted - SSE_full) / (SSE_full / (m - 3)) — the
    PREDICTIVE upgrade of ``ts_cross_correlation``'s descriptive
    lead-lag (correlation says the series co-move; this says the lag
    of one helps forecast the other beyond its own history).  Both
    directions come from ONE moment row since the sufficient
    statistics are symmetric.

    All nine raw moments over the (y_t, y_{t-1}, x_{t-1}) triples are
    exact BIGINTs on the dense grid; centered moments, the Cramer
    2x2 solve (the ``ml_linreg_normal_eq`` convention), both SSEs and
    F are fixed IEEE trees with nullif zero guards.

    Scale: one data-sized groupBy to hourly counts; the lag window
    and one moment rollup on the calendar-bounded grid."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_type").isin(XCORR_X, XCORR_Y))
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("h")
        .agg(
            F.sum((F.col("event_type") == XCORR_X).cast("long")).alias("xr"),
            F.sum((F.col("event_type") == XCORR_Y).cast("long")).alias("yr"),
        )
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = global_bounds.select(
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h")
    )
    dense = grid.join(hourly, ["h"], "left").fillna(0, subset=["xr", "yr"])
    w = Window.orderBy("h")
    trip = dense.select(
        F.col("xr").alias("xc"),
        F.col("yr").alias("yc"),
        F.lag("xr").over(w).alias("xl"),
        F.lag("yr").over(w).alias("yl"),
    ).where(F.col("xl").isNotNull())
    mom = trip.groupBy().agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("xc").alias("sxc"),
        F.sum("yc").alias("syc"),
        F.sum("xl").alias("sxl"),
        F.sum("yl").alias("syl"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxcxc"),
        F.sum(F.col("yc") * F.col("yc")).alias("sycyc"),
        F.sum(F.col("xl") * F.col("xl")).alias("sxlxl"),
        F.sum(F.col("yl") * F.col("yl")).alias("sylyl"),
        F.sum(F.col("xl") * F.col("yl")).alias("sxlyl"),
        F.sum(F.col("yc") * F.col("yl")).alias("sycyl"),
        F.sum(F.col("yc") * F.col("xl")).alias("sycxl"),
        F.sum(F.col("xc") * F.col("xl")).alias("sxcxl"),
        F.sum(F.col("xc") * F.col("yl")).alias("sxcyl"),
    )

    m = F.col("m").cast("double")

    def centered(sa, sb, sab):
        return F.col(sab) - (F.col(sa) * F.col(sb)).cast("double") / m

    def f_stat(sy, syy, su, suu, syu, sv, svv, syv, suv):
        cyy = centered(sy, sy, syy)
        cuu = centered(su, su, suu)
        cvv = centered(sv, sv, svv)
        cyu = centered(sy, su, syu)
        cyv = centered(sy, sv, syv)
        cuv = centered(su, sv, suv)
        sse_r = cyy - (cyu * cyu) / F.nullif(cuu, F.lit(0.0))
        det = cuu * cvv - cuv * cuv
        b = (cyu * cvv - cyv * cuv) / F.nullif(det, F.lit(0.0))
        c = (cyv * cuu - cyu * cuv) / F.nullif(det, F.lit(0.0))
        sse_u = cyy - b * cyu - c * cyv
        return F.round(
            (sse_r - sse_u)
            / F.nullif(sse_u / (m - F.lit(3.0)), F.lit(0.0)),
            6,
        )

    f_xy = f_stat(
        "syc", "sycyc", "syl", "sylyl", "sycyl", "sxl", "sxlxl",
        "sycxl", "sxlyl",
    )
    f_yx = f_stat(
        "sxc", "sxcxc", "sxl", "sxlxl", "sxcxl", "syl", "sylyl",
        "sxcyl", "sxlyl",
    )
    one = mom.select(
        F.col("m").cast("long").alias("n_obs"),
        f_xy.alias("f_click_to_purchase"),
        f_yx.alias("f_purchase_to_click"),
    )
    return one.select(
        "n_obs",
        F.expr(
            "stack(2, 'click->purchase', f_click_to_purchase,"
            " 'purchase->click', f_purchase_to_click)"
            " AS (direction, f_stat)"
        ),
    ).select(
        "direction",
        "n_obs",
        "f_stat",
        (F.col("f_stat") > F.lit(GRANGER_F_95)).cast("long").alias(
            "predictive_95"
        ),
    ).orderBy("direction")


QUERIES["ts_granger_lead"] = ts_granger_lead

ORACLE_SQL["ts_granger_lead"] = f"""
    WITH hourly AS (
        SELECT DATE_TRUNC('hour', ts) AS h,
               CAST(SUM(CASE WHEN event_type = '{XCORR_X}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS xr,
               CAST(SUM(CASE WHEN event_type = '{XCORR_Y}'
                        THEN 1 ELSE 0 END) AS BIGINT) AS yr
        FROM events
        WHERE event_type IN ('{XCORR_X}', '{XCORR_Y}')
        GROUP BY 1),
    bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    grid AS (
        SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM bnds),
    dense AS (
        SELECT g.h, COALESCE(hourly.xr, 0) AS xr,
               COALESCE(hourly.yr, 0) AS yr
        FROM grid g LEFT JOIN hourly ON hourly.h = g.h),
    trip AS (
        SELECT xr AS xc, yr AS yc,
               LAG(xr) OVER (ORDER BY h) AS xl,
               LAG(yr) OVER (ORDER BY h) AS yl
        FROM dense),
    mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(xc) AS BIGINT) AS sxc,
               CAST(SUM(yc) AS BIGINT) AS syc,
               CAST(SUM(xl) AS BIGINT) AS sxl,
               CAST(SUM(yl) AS BIGINT) AS syl,
               CAST(SUM(xc * xc) AS BIGINT) AS sxcxc,
               CAST(SUM(yc * yc) AS BIGINT) AS sycyc,
               CAST(SUM(xl * xl) AS BIGINT) AS sxlxl,
               CAST(SUM(yl * yl) AS BIGINT) AS sylyl,
               CAST(SUM(xl * yl) AS BIGINT) AS sxlyl,
               CAST(SUM(yc * yl) AS BIGINT) AS sycyl,
               CAST(SUM(yc * xl) AS BIGINT) AS sycxl,
               CAST(SUM(xc * xl) AS BIGINT) AS sxcxl,
               CAST(SUM(xc * yl) AS BIGINT) AS sxcyl
        FROM trip WHERE xl IS NOT NULL),
    cen AS (
        SELECT m,
               sycyc - CAST(syc * syc AS DOUBLE) / m AS cyy_p,
               sxcxc - CAST(sxc * sxc AS DOUBLE) / m AS cyy_c,
               sylyl - CAST(syl * syl AS DOUBLE) / m AS cuu_p,
               sxlxl - CAST(sxl * sxl AS DOUBLE) / m AS cuu_c,
               sycyl - CAST(syc * syl AS DOUBLE) / m AS cyu_p,
               sxcxl - CAST(sxc * sxl AS DOUBLE) / m AS cyu_c,
               sycxl - CAST(syc * sxl AS DOUBLE) / m AS cyv_p,
               sxcyl - CAST(sxc * syl AS DOUBLE) / m AS cyv_c,
               sxlyl - CAST(sxl * syl AS DOUBLE) / m AS cuv
        FROM mom),
    fs AS (
        SELECT m,
               (cyy_p - (cyu_p * cyu_p) / NULLIF(cuu_p, 0.0)) AS sse_r_p,
               (cyy_p
                - ((cyu_p * cuu_c - cyv_p * cuv)
                   / NULLIF(cuu_p * cuu_c - cuv * cuv, 0.0)) * cyu_p
                - ((cyv_p * cuu_p - cyu_p * cuv)
                   / NULLIF(cuu_p * cuu_c - cuv * cuv, 0.0)) * cyv_p)
                   AS sse_u_p,
               (cyy_c - (cyu_c * cyu_c) / NULLIF(cuu_c, 0.0)) AS sse_r_c,
               (cyy_c
                - ((cyu_c * cuu_p - cyv_c * cuv)
                   / NULLIF(cuu_c * cuu_p - cuv * cuv, 0.0)) * cyu_c
                - ((cyv_c * cuu_c - cyu_c * cuv)
                   / NULLIF(cuu_c * cuu_p - cuv * cuv, 0.0)) * cyv_c)
                   AS sse_u_c
        FROM cen),
    both_dirs AS (
        SELECT 'click->purchase' AS direction, m AS n_obs,
               ROUND((sse_r_p - sse_u_p)
                     / NULLIF(sse_u_p / (m - 3.0), 0.0), 6) AS f_stat
        FROM fs
        UNION ALL
        SELECT 'purchase->click', m,
               ROUND((sse_r_c - sse_u_c)
                     / NULLIF(sse_u_c / (m - 3.0), 0.0), 6)
        FROM fs)
    SELECT direction, n_obs, f_stat,
           CAST(f_stat > {GRANGER_F_95} AS BIGINT) AS predictive_95
    FROM both_dirs
    ORDER BY direction
"""


#: R/S block sizes and the precomputed OLS-slope coefficients of
#: ln(R/S) on ln(size) (uniform ln-2 spacing -> fixed weights)
HURST_SIZES = (16, 32, 64, 128)
_HURST_COEF = {
    16: -0.432808512266689,
    32: -0.14426950408889622,
    64: 0.14426950408889638,
    128: 0.43280851226668915,
}


def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent via rescaled-range (R/S) analysis on the hourly
    event-count series per type: mean R/S over non-overlapping blocks
    of 16/32/64/128 hours, H = the log-log OLS slope — the LONG-MEMORY
    diagnostic completing the series-diagnostics shelf (ADF/KPSS test
    stationarity, Ljung-Box short-range correlation; Hurst reads
    persistence: H ~ 0.5 random walk increments, H > 0.5 trending,
    H < 0.5 mean-reverting).

    Exactness: within-block cumulative deviations have the exact
    integer numerator M_i = b*cum_i - i*s_block (the KPSS trick), so
    the range R = (max M - min M)/b is one exact-int difference and
    one division; S is the population std from exact block moments;
    per-(type, size) mean R/S is rounded to 6 dp BEFORE the log, and
    H is a fixed 4-term chain with PRECOMPUTED literal weights (the
    ln-spacing is uniform, so the OLS slope collapses to fixed
    coefficients shared by both engines).

    Scale: the dense grid fans out x|SIZES| (calendar-bounded); one
    window stack per size partition, tiny rollups after."""
    from pyspark.sql import Window

    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("xc"))
    )
    global_bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").fillna(
        0, subset=["xc"]
    )
    w_t = Window.partitionBy("event_type").orderBy("h")
    indexed = dense.select(
        "event_type",
        "xc",
        (F.row_number().over(w_t) - F.lit(1)).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    sized = indexed.select(
        "event_type",
        "xc",
        "t",
        "n",
        F.explode(
            F.array(*[F.lit(b) for b in HURST_SIZES])
        ).alias("b"),
    ).withColumn("g", F.expr("t div b")).filter(
        (F.col("g") + 1) * F.col("b") <= F.col("n")
    )
    w_blk = Window.partitionBy("event_type", "b", "g").orderBy("t")
    w_blk_all = Window.partitionBy("event_type", "b", "g")
    staged = sized.select(
        "event_type",
        "b",
        "g",
        F.sum("xc").over(
            w_blk.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        (F.col("t") - F.col("g") * F.col("b") + F.lit(1)).alias("i"),
        F.sum("xc").over(w_blk_all).alias("s"),
        F.sum(F.col("xc") * F.col("xc")).over(w_blk_all).alias("q"),
    )
    m_i = F.col("b") * F.col("cum") - F.col("i") * F.col("s")
    blocks = staged.groupBy("event_type", "b", "g").agg(
        F.max(m_i).alias("mx"),
        F.min(m_i).alias("mn"),
        F.max("s").alias("s"),
        F.max("q").alias("q"),
    )
    bD = F.col("b").cast("double")
    s_std = F.sqrt(
        F.col("q") / bD - (F.col("s") / bD) * (F.col("s") / bD)
    )
    rs = (
        (F.col("mx") - F.col("mn")).cast("double") / bD
    ) / F.nullif(s_std, F.lit(0.0))
    # Per-(type, size) mean R/S via a FIXED-ORDER fold (round-9
    # ADVICE): an unordered F.avg over doubles is partition-order-
    # dependent in Spark while DuckDB's AVG folds sequentially, so both
    # engines fold the g-ordered block list left-to-right (the
    # periodogram F.aggregate / LIST_REDUCE convention).  NULL R/S
    # (zero-std blocks) is excluded on both sides, matching AVG's
    # null-skipping semantics.
    rsv = blocks.select("event_type", "b", "g", rs.alias("rs")).filter(
        F.col("rs").isNotNull()
    )
    mrs = (
        rsv.groupBy("event_type", "b")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("g").alias("g"), F.col("rs").alias("rs"))
                )
            ).alias("sv"),
            F.count(F.lit(1)).alias("nb"),
        )
        .select(
            "event_type",
            "b",
            F.round(
                F.aggregate("sv", F.lit(0.0), lambda a, e: a + e["rs"])
                / F.col("nb"),
                6,
            ).alias("mrs"),
        )
    )
    wide = mrs.groupBy("event_type").agg(
        *[
            F.max(
                F.when(F.col("b") == b, F.col("mrs"))
            ).alias(f"m{b}")
            for b in HURST_SIZES
        ]
    )
    h_expr = None
    for b in HURST_SIZES:
        term = F.lit(_HURST_COEF[b]) * F.log(F.col(f"m{b}"))
        h_expr = term if h_expr is None else h_expr + term
    h = F.round(h_expr, 6)
    return (
        wide.select(
            "event_type",
            *[F.col(f"m{b}").alias(f"rs_{b}") for b in HURST_SIZES],
            h.alias("hurst_h"),
            (h > F.lit(0.5)).cast("long").alias("persistent"),
        )
        .orderBy("event_type")
    )


QUERIES["ts_hurst_rs"] = ts_hurst_rs


def _hurst_sql() -> str:
    coef = ", ".join(str(_HURST_COEF[b]) for b in HURST_SIZES)
    sizes_vals = ", ".join(f"({b})" for b in HURST_SIZES)
    m_cols = ",\n               ".join(
        f"MAX(CASE WHEN b = {b} THEN mrs END) AS m{b}"
        for b in HURST_SIZES
    )
    h_chain = " + ".join(
        f"{_HURST_COEF[b]} * LN(m{b})" for b in HURST_SIZES
    )
    out_cols = ",\n           ".join(
        f"m{b} AS rs_{b}" for b in HURST_SIZES
    )
    return f"""
    WITH hourly AS (
        SELECT event_type, DATE_TRUNC('hour', ts) AS h,
               CAST(COUNT(*) AS BIGINT) AS xc
        FROM events GROUP BY 1, 2),
    bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
    grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT UNNEST(generate_series(h0, h1,
                                  INTERVAL 1 HOUR)) AS h
                    FROM bnds) g),
    dense AS (
        SELECT grid.event_type, grid.h, COALESCE(hourly.xc, 0) AS xc
        FROM grid LEFT JOIN hourly
          ON hourly.event_type = grid.event_type AND hourly.h = grid.h),
    indexed AS (
        SELECT event_type, xc,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY h) - 1 AS BIGINT) AS t,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
        FROM dense),
    sized AS (
        SELECT i.event_type, i.xc, i.t, sz.b, i.t // sz.b AS g
        FROM indexed i
        CROSS JOIN (SELECT * FROM (VALUES {sizes_vals}) AS v(b)) sz
        WHERE (i.t // sz.b + 1) * sz.b <= i.n),
    staged AS (
        SELECT event_type, b, g,
               CAST(SUM(xc) OVER (PARTITION BY event_type, b, g
                                  ORDER BY t ROWS BETWEEN UNBOUNDED
                                  PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum,
               t - g * b + 1 AS i,
               CAST(SUM(xc) OVER (PARTITION BY event_type, b, g)
                    AS BIGINT) AS s,
               CAST(SUM(xc * xc) OVER (PARTITION BY event_type, b, g)
                    AS BIGINT) AS q
        FROM sized),
    blocks AS (
        SELECT event_type, b, g,
               CAST(MAX(b * cum - i * s) AS BIGINT) AS mx,
               CAST(MIN(b * cum - i * s) AS BIGINT) AS mn,
               CAST(MAX(s) AS BIGINT) AS s,
               CAST(MAX(q) AS BIGINT) AS q
        FROM staged GROUP BY 1, 2, 3),
    rsv AS (
        SELECT event_type, b, g,
               (CAST(mx - mn AS DOUBLE) / b)
                   / NULLIF(SQRT(q / CAST(b AS DOUBLE)
                                 - (s / CAST(b AS DOUBLE))
                                   * (s / CAST(b AS DOUBLE))), 0.0)
                   AS rs
        FROM blocks),
    mrs AS (
        SELECT event_type, b,
               ROUND(LIST_REDUCE(LIST(rs ORDER BY g), (a, x) -> a + x)
                     / COUNT(*), 6) AS mrs
        FROM rsv WHERE rs IS NOT NULL GROUP BY 1, 2),
    wide AS (
        SELECT event_type,
               {m_cols}
        FROM mrs GROUP BY 1)
    SELECT event_type,
           {out_cols},
           ROUND({h_chain}, 6) AS hurst_h,
           CAST(ROUND({h_chain}, 6) > 0.5 AS BIGINT) AS persistent
    FROM wide
    ORDER BY event_type
"""


ORACLE_SQL["ts_hurst_rs"] = _hurst_sql()


#: ln(len(PERIODOGRAM_PERIODS)) — spectral-entropy normalizer, one
#: shared literal (math.log(6), pinned so both engines fold the same
#: double)
_LN_N_PERIODS = 1.791759469228055


def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized SPECTRAL ENTROPY per event type over the registered
    periodogram's six calendar lines: renormalize the per-period power
    fractions to weights w_P, then H = -sum w ln w / ln(6) in [0, 1] —
    the one-number seasonality score (0 = all mass on one line, a pure
    metronome; 1 = flat spectrum, no usable period) that turns
    ``ts_periodogram_dft``'s six-row profile into a rankable gate, the
    same way entropy summarizes a histogram.

    Shares ``_periodogram_pf`` verbatim, so the 6-dp-rounded power
    fractions are the identical doubles in both engines; the entropy
    assembles in ONE fixed-order six-term chain (ascending period — no
    aggregate, no order ambiguity), with 0 ln 0 = 0 by CASE and a NULL
    passthrough for zero-variance series (the pf NULLs).

    Scale: inherits the periodogram's shape — one data-sized hourly
    groupBy, calendar-bounded folds."""
    pf = _periodogram_pf(spark, sf_dir)
    tot = None
    for P in PERIODOGRAM_PERIODS:
        tot = F.col(f"pf{P}") if tot is None else tot + F.col(f"pf{P}")
    w = {P: F.col(f"pf{P}") / F.nullif(tot, F.lit(0.0))
         for P in PERIODOGRAM_PERIODS}
    ent = None
    for P in PERIODOGRAM_PERIODS:
        term = F.when(w[P] > 0, w[P] * F.log(w[P])).otherwise(F.lit(0.0))
        ent = term if ent is None else ent + term
    h = F.when(
        tot.isNull(), F.lit(None).cast("double")
    ).otherwise(F.round(-ent / F.lit(_LN_N_PERIODS), 6))
    dom = F.greatest(*[F.col(f"pf{P}") for P in PERIODOGRAM_PERIODS])
    return pf.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        h.alias("spectral_entropy"),
        F.round(dom / F.nullif(tot, F.lit(0.0)), 6).alias(
            "dominant_frac"
        ),
    ).orderBy("event_type")


QUERIES["ts_spectral_entropy"] = ts_spectral_entropy


def _spectral_entropy_sql() -> str:
    """Mirror of ts_spectral_entropy over the SAME periodogram CTEs."""
    fold_cols = ",\n               ".join(
        f"ROUND(LIST_REDUCE(LIST_TRANSFORM(generate_series(1, LEN(xs)),"
        f" i -> (xs[i] - s * 1.0 / n) * {trig}("
        f"6.283185307179586 * ts_[i] / {P}.0)),"
        f" (a, b) -> a + b) / n, 6) AS {pre}{P}"
        for P in PERIODOGRAM_PERIODS
        for trig, pre in (("COS", "c"), ("SIN", "s"))
    )
    pf_cols = ",\n               ".join(
        f"ROUND((n * (c{P} * c{P} + s{P} * s{P}))"
        f" / NULLIF(q - (s * 1.0 / n) * s, 0.0), 6) AS pf{P}"
        for P in PERIODOGRAM_PERIODS
    )
    tot = None
    for P in PERIODOGRAM_PERIODS:
        tot = f"pf{P}" if tot is None else f"({tot} + pf{P})"
    ent = None
    for P in PERIODOGRAM_PERIODS:
        w = f"(pf{P} / NULLIF({tot}, 0.0))"
        term = f"CASE WHEN {w} > 0 THEN {w} * LN({w}) ELSE 0.0 END"
        ent = term if ent is None else f"{ent} + {term}"
    dom = "GREATEST(" + ", ".join(
        f"pf{P}" for P in PERIODOGRAM_PERIODS
    ) + ")"
    return f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, b.h0,
                   UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN bnds b),
        dense AS (
            SELECT g.event_type,
                   CAST(DATE_DIFF('hour', g.h0, g.h) AS BIGINT) AS t,
                   COALESCE(hourly.x, 0) AS x
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h),
        arr AS (
            SELECT event_type,
                   LIST(CAST(t AS DOUBLE) ORDER BY t) AS ts_,
                   LIST(CAST(x AS DOUBLE) ORDER BY t) AS xs,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM dense GROUP BY 1),
        wide AS (
            SELECT event_type, n, s, q,
               {fold_cols}
            FROM arr),
        pf AS (
            SELECT event_type, n, s, q,
               {pf_cols}
            FROM wide)
        SELECT event_type,
               CAST(n AS BIGINT) AS n_hours,
               CASE WHEN {tot} IS NULL THEN NULL
                    ELSE ROUND(-({ent}) / {_LN_N_PERIODS}, 6)
               END AS spectral_entropy,
               ROUND({dom} / NULLIF({tot}, 0.0), 6) AS dominant_frac
        FROM pf
        ORDER BY event_type
    """


ORACLE_SQL["ts_spectral_entropy"] = _spectral_entropy_sql()


#: PACF lag span — consecutive lags 1..5 over the dense daily series
_PACF_K = 5


class _SqlExpr:
    """Minimal SQL-string expression wrapper so the Durbin-Levinson
    recursion below builds the Spark Column tree and the DuckDB SQL
    text from ONE shared code path — structural parity by
    construction (same operator grouping, same literal placement)."""

    def __init__(self, s: str) -> None:
        self.s = s

    def __sub__(self, o: "_SqlExpr") -> "_SqlExpr":
        return _SqlExpr(f"({self.s} - {o.s})")

    def __mul__(self, o: "_SqlExpr") -> "_SqlExpr":
        return _SqlExpr(f"({self.s} * {o.s})")


def _durbin_levinson(rho, lit, nullif_div):
    """Unrolled Durbin-Levinson recursion: rho[0..K-1] are the lag-1..K
    autocorrelations (engine expressions); returns the K partial
    autocorrelations phi_kk.  Works over pyspark Columns AND _SqlExpr
    strings because it only uses -, *, the lit factory, and the guarded
    division callback."""
    phi_prev: list = []
    out: list = []
    for k in range(1, _PACF_K + 1):
        if k == 1:
            pkk = rho[0]
        else:
            num = rho[k - 1]
            den = lit(1.0)
            for j in range(1, k):
                num = num - phi_prev[j - 1] * rho[k - 1 - j]
                den = den - phi_prev[j - 1] * rho[j - 1]
            pkk = nullif_div(num, den)
        phi_prev = [
            phi_prev[j - 1] - pkk * phi_prev[k - 1 - j] for j in range(1, k)
        ] + [pkk]
        out.append(pkk)
    return out


def ts_pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL autocorrelations at lags 1..5 of the dense daily
    event-count series per type, via the Durbin-Levinson recursion
    over the biased-estimator ACF — the AR-order diagnostic the plain
    ACF (``ts_acf_hourly``) cannot give: ACF of an AR(1) decays
    geometrically forever, PACF cuts off sharply after the true order,
    which is what an auto-ARIMA order picker actually thresholds.

    Determinism: the lag-k autocorrelations assemble from exact BIGINT
    moments (the ts_acf_hourly discipline — n, s, q, and per-lag
    p/a/b boundary sums), so each rho is one fixed float expression;
    the D-L recursion is UNROLLED at build time by shared Python code
    that emits the Spark Column tree and the oracle SQL text from the
    same recursion (``_durbin_levinson``), so both engines evaluate
    structurally identical expression trees — ulps only, inside the
    6-dp round.  Degenerate denominators NULL through the guarded
    division.

    Scale: one data-sized (type, day) groupBy; the dense grid, lag
    windows, and the recursion run on the calendar-bounded daily
    frame (days x types rows, 5 lag columns)."""
    from pyspark.sql import Window as W

    daily = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.to_date("ts").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("x"))
        # THREE consumers (bounds agg, type grid, dense left join) each
        # replanned — and, with different downstream keys, re-executed —
        # the events scan + (type, day) groupBy, the only data-sized
        # stage of this query.  One cut materializes the tiny
        # types × days frame instead (round 12, guide §2.4).
        .localCheckpoint()
    )
    bounds = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("d"),
        )
    )
    dense = grid.join(daily, ["event_type", "d"], "left").fillna(
        0, subset=["x"]
    )
    w = W.partitionBy("event_type").orderBy("d")
    lags = range(1, _PACF_K + 1)
    lagged = dense.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in lags],
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ]
    for k in lags:
        aggs += [
            F.sum(F.col("x") * F.col(f"l{k}")).alias(f"p{k}"),
            F.sum(F.when(F.col(f"l{k}").isNotNull(), F.col("x"))).alias(
                f"a{k}"
            ),
            F.sum(f"l{k}").alias(f"b{k}"),
        ]
    st = lagged.groupBy("event_type").agg(*aggs)
    mean = F.col("s") / F.col("n")
    den0 = F.nullif((F.col("q") - mean * F.col("s")).cast("double"), F.lit(0.0))
    rhos = st.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        *[
            (
                (
                    F.col(f"p{k}")
                    - mean * (F.col(f"a{k}") + F.col(f"b{k}"))
                    + (F.col("n") - F.lit(k)) * mean * mean
                )
                / den0
            ).alias(f"rho{k}")
            for k in lags
        ],
    )
    pacf = _durbin_levinson(
        [F.col(f"rho{k}") for k in lags],
        F.lit,
        lambda num, den: num / F.nullif(den, F.lit(0.0)),
    )
    return rhos.select(
        "event_type",
        "n_days",
        *[F.round(F.col(f"rho{k}"), 6).alias(f"acf_{k}") for k in lags],
        *[
            F.round(pacf[k - 1], 6).alias(f"pacf_{k}")
            for k in lags
        ],
    ).orderBy("event_type")


QUERIES["ts_pacf_durbin_levinson"] = ts_pacf_durbin_levinson


def _pacf_sql() -> str:
    lags = range(1, _PACF_K + 1)
    lag_cols = ",\n               ".join(
        f"LAG(x, {k}) OVER (PARTITION BY event_type ORDER BY d) AS l{k}"
        for k in lags
    )
    mom_cols = ",\n               ".join(
        f"CAST(SUM(x * l{k}) AS BIGINT) AS p{k},\n               "
        f"CAST(SUM(CASE WHEN l{k} IS NOT NULL THEN x END) AS BIGINT)"
        f" AS a{k},\n               "
        f"CAST(SUM(l{k}) AS BIGINT) AS b{k}"
        for k in lags
    )
    rho_cols = ",\n               ".join(
        f"((p{k} - (s * 1.0 / n) * (a{k} + b{k})"
        f" + (n - {k}) * (s * 1.0 / n) * (s * 1.0 / n))"
        f" / NULLIF(CAST(q - (s * 1.0 / n) * s AS DOUBLE), 0.0)) AS rho{k}"
        for k in lags
    )
    pacf = _durbin_levinson(
        [_SqlExpr(f"rho{k}") for k in lags],
        lambda v: _SqlExpr(str(v)),
        lambda num, den: _SqlExpr(f"({num.s} / NULLIF({den.s}, 0.0))"),
    )
    out_cols = ",\n           ".join(
        [f"ROUND(rho{k}, 6) AS acf_{k}" for k in lags]
        + [f"ROUND({pacf[k - 1].s}, 6) AS pacf_{k}" for k in lags]
    )
    return f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
        grid AS (
            SELECT t.event_type,
                   CAST(UNNEST(generate_series(CAST(b.d0 AS TIMESTAMP),
                                               CAST(b.d1 AS TIMESTAMP),
                                               INTERVAL 1 DAY)) AS DATE)
                       AS d
            FROM (SELECT DISTINCT event_type FROM daily) t
            CROSS JOIN bnds b),
        dense AS (
            SELECT g.event_type, g.d, COALESCE(daily.x, 0) AS x
            FROM grid g LEFT JOIN daily
              ON daily.event_type = g.event_type AND daily.d = g.d),
        lagged AS (
            SELECT event_type, x,
               {lag_cols}
            FROM dense),
        st AS (
            SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(x * x) AS BIGINT) AS q,
               {mom_cols}
            FROM lagged GROUP BY 1),
        rhos AS (
            SELECT event_type, n AS n_days,
               {rho_cols}
            FROM st)
        SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           {out_cols}
        FROM rhos
        ORDER BY event_type
    """


ORACLE_SQL["ts_pacf_durbin_levinson"] = _pacf_sql()


#: Damped-trend smoothing (Gardner-McKenzie 1985): damping factor and
#: the 7-step-ahead multiplier sum(phi^i, i=1..7) — ONE precomputed
#: literal shared by both engines (the MMR shared-literal convention).
HOLT_DAMP_PHI = 0.9
HOLT_DAMP_SUM7 = 4.6953279000000006


def ts_holt_damped_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAMPED-trend exponential smoothing (Gardner & McKenzie 1985)
    per event type — the variant that wins most forecasting
    competitions over plain Holt (``ts_holt_linear``): the trend is
    multiplied by phi < 1 at every step, so long-horizon forecasts
    flatten toward level + phi/(1-phi) * trend instead of extrapolating
    a straight line off a cliff.

        l_t = a*y_t + (1-a)*(l_{t-1} + phi*b_{t-1})
        b_t = g*(l_t - l_{t-1}) + (1-g)*phi*b_{t-1}
        yhat_{t+7} = l_t + (phi + ... + phi^7) * b_t

    Unlike plain Holt there is no seed collapse at t=2 (phi scales the
    seeded trend), so the fold seeds (l_1, b_1) = (y_1, y_2 - y_1) and
    folds y_2..y_n — the pair-accumulator discipline, one more step
    than the linear twin, identical order both engines.  The 7-step
    multiplier is a precomputed shared literal.

    Scale: identical shape to ts_holt_linear — one (type, day)
    shuffle, per-type folds over day-sized arrays."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    arr = F.array_sort(F.collect_list(F.struct("day", "y")))
    vals = F.transform(F.col("arr"), lambda s: s["y"])
    a, ca = F.lit(HOLT_ALPHA), F.lit(HOLT_ONE_MINUS_ALPHA)
    g, cg = F.lit(HOLT_BETA), F.lit(HOLT_ONE_MINUS_BETA)
    ph = F.lit(HOLT_DAMP_PHI)

    def _step(acc: Column, x: Column) -> Column:
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        l_new = a * x + ca * (l_prev + ph * b_prev)
        return F.array(
            l_new, g * (l_new - l_prev) + cg * (ph * b_prev)
        )

    seed = F.array(
        F.element_at(vals, 1),
        F.element_at(vals, 2) - F.element_at(vals, 1),
    )
    lb = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))), seed, _step
    )
    return (
        daily.groupBy("event_type")
        .agg(arr.alias("arr"))
        .where(F.size(F.col("arr")) >= 3)
        .select(
            "event_type",
            F.size("arr").cast("long").alias("n_days"),
            F.round(F.element_at(lb, 1), 6).alias("level"),
            F.round(F.element_at(lb, 2), 6).alias("trend"),
            F.round(
                F.element_at(lb, 1)
                + F.lit(HOLT_DAMP_SUM7) * F.element_at(lb, 2),
                6,
            ).alias("forecast_7d_damped"),
        )
        .orderBy("event_type")
    )


QUERIES["ts_holt_damped_trend"] = ts_holt_damped_trend
ORACLE_SQL["ts_holt_damped_trend"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6)))
                          AS DOUBLE), 6) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    series AS (
        SELECT event_type, LIST(y ORDER BY day) AS vals
        FROM daily GROUP BY event_type),
    folded AS (
        SELECT event_type, LEN(vals) AS n_days,
               LIST_REDUCE(
                   [[vals[1], vals[2] - vals[1]]]
                       || LIST_TRANSFORM(vals[2:], y -> [y, 0.0]),
                   (acc, x) -> [
                       {HOLT_ALPHA} * x[1]
                           + {HOLT_ONE_MINUS_ALPHA}
                             * (acc[1] + {HOLT_DAMP_PHI} * acc[2]),
                       {HOLT_BETA} * (({HOLT_ALPHA} * x[1]
                           + {HOLT_ONE_MINUS_ALPHA}
                             * (acc[1] + {HOLT_DAMP_PHI} * acc[2]))
                           - acc[1])
                           + {HOLT_ONE_MINUS_BETA}
                             * ({HOLT_DAMP_PHI} * acc[2])]) AS lb
        FROM series WHERE LEN(vals) >= 3)
    SELECT event_type,
           CAST(n_days AS BIGINT) AS n_days,
           ROUND(lb[1], 6) AS level,
           ROUND(lb[2], 6) AS trend,
           ROUND(lb[1] + {HOLT_DAMP_SUM7} * lb[2], 6)
               AS forecast_7d_damped
    FROM folded ORDER BY event_type
"""


#: Theta-method smoothing constant (shared with the Holt family) and
#: forecast horizon.  THETA = 2 is the classic Assimakopoulos &
#: Nikolopoulos (2000) setting: the theta-2 line doubles local
#: curvature, its SES captures short-run level, and the theta-0 line
#: (the OLS trend) carries long-run drift; the forecast averages the
#: two, which is also why the method reduces to SES-with-drift b/2.
THETA_ALPHA = HOLT_ALPHA
THETA_H = 7


def ts_theta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    M3-competition winner) per event type over the daily value series:
    fit the OLS trend line (theta-0), build the theta-2 line
    z_t = 2*y_t - (a + b*t), run SES over z, and forecast
    0.5 * (a + b*(n+h)) + 0.5 * s_n at horizon h=7.  Completes the
    forecasting shelf: naive-seasonal (MAE baseline), Holt linear,
    damped, Holt-Winters, Croston — and now the drift-averaged method
    that beat all of them on M3.

    Exactness: daily y is decimal-summed then 6-rounded (Holt
    discipline); the OLS moment sums run in EXACT BIGINT micro-units
    (y * 1e6; bounded by n_days <= ~2.2k and |y| < 1e6, so
    n * sty < 2^62), and slope/intercept are derived from those exact
    integers through an identical double expression tree in both
    engines — deterministic, order-free.  The SES fold walks the
    day-sorted array with the same seed (s_1 = z_1) both engines.

    Scale: one (type, day) pre-aggregation shuffle, one per-type
    groupBy carrying exact integer moments plus the day-sized value
    array, folds per type — the ts_holt_linear shape with integer-exact
    regression moments riding the same aggregate."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    ym = F.round(F.col("y") * 1e6, 0).cast("long")
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        "day",
        "y",
        ym.alias("ym"),
        F.row_number().over(w).cast("long").alias("t"),
    )
    g = (
        idx.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("t").alias("st"),
            F.sum("ym").alias("sy"),
            F.sum(F.col("t") * F.col("ym")).alias("sty"),
            F.sum(F.col("t") * F.col("t")).alias("stt"),
            F.array_sort(
                F.collect_list(F.struct("day", "y"))
            ).alias("arr"),
        )
        .where(F.col("n") >= 3)
    )
    nd = F.col("n").cast("double")
    std = F.col("st").cast("double")
    syd = F.col("sy").cast("double")
    styd = F.col("sty").cast("double")
    sttd = F.col("stt").cast("double")
    slope = (
        (nd * styd - std * syd)
        / (nd * sttd - std * std)
        / F.lit(1e6)
    )
    intercept = syd / F.lit(1e6) / nd - slope * (std / nd)
    withline = g.select(
        "event_type",
        "n",
        "arr",
        slope.alias("b"),
        intercept.alias("a"),
    )
    zarr = F.transform(
        F.col("arr"),
        lambda s, i: F.lit(2.0) * s["y"]
        - (F.col("a") + F.col("b") * (i.cast("double") + F.lit(1.0))),
    )
    al, cal = F.lit(THETA_ALPHA), F.lit(1.0 - THETA_ALPHA)
    ses = F.aggregate(
        F.slice(
            F.col("z"), 2, F.greatest(F.size(F.col("z")) - 1, F.lit(0))
        ),
        F.element_at(F.col("z"), 1),
        lambda acc, x: al * x + cal * acc,
    )
    return (
        withline.withColumn("z", zarr)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.round(F.col("b"), 6).alias("slope"),
            F.round(F.col("a"), 6).alias("intercept"),
            F.round(ses, 6).alias("ses_level"),
            F.round(
                F.lit(0.5)
                * (
                    F.col("a")
                    + F.col("b")
                    * (F.col("n").cast("double") + F.lit(float(THETA_H)))
                )
                + F.lit(0.5) * ses,
                6,
            ).alias("forecast_7d_theta"),
        )
        .orderBy("event_type")
    )


QUERIES["ts_theta_method"] = ts_theta_method
ORACLE_SQL["ts_theta_method"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6)))
                          AS DOUBLE), 6) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    idx AS (
        SELECT event_type, day, y,
               CAST(ROUND(y * 1e6, 0) AS BIGINT) AS ym,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY day) AS BIGINT) AS t
        FROM daily),
    g AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(t) AS BIGINT) AS st,
               CAST(SUM(ym) AS BIGINT) AS sy,
               CAST(SUM(t * ym) AS BIGINT) AS sty,
               CAST(SUM(t * t) AS BIGINT) AS stt,
               LIST(y ORDER BY day) AS vals
        FROM idx GROUP BY event_type
        HAVING COUNT(*) >= 3),
    line AS (
        SELECT event_type, n, vals,
               (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                  - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
               / 1e6 AS b
        FROM g),
    ab AS (
        SELECT l.event_type, l.n, l.vals, l.b,
               CAST(g.sy AS DOUBLE) / 1e6 / CAST(l.n AS DOUBLE)
               - l.b * (CAST(g.st AS DOUBLE) / CAST(l.n AS DOUBLE)) AS a
        FROM line l JOIN g ON g.event_type = l.event_type),
    folded AS (
        SELECT event_type, n, a, b,
               LIST_REDUCE(
                   LIST_TRANSFORM(RANGE(1, n + 1),
                       t -> 2.0 * vals[CAST(t AS INT)]
                            - (a + b * CAST(t AS DOUBLE))),
                   (acc, x) -> {THETA_ALPHA} * x
                               + {1.0 - THETA_ALPHA} * acc) AS s
        FROM ab)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           ROUND(b, 6) AS slope,
           ROUND(a, 6) AS intercept,
           ROUND(s, 6) AS ses_level,
           ROUND(0.5 * (a + b * (CAST(n AS DOUBLE) + {float(THETA_H)}))
                 + 0.5 * s, 6) AS forecast_7d_theta
    FROM folded ORDER BY event_type
"""


#: Pinball evaluation: trailing-window length and quantile levels.
PINBALL_W = 7
PINBALL_TAUS = (0.1, 0.5, 0.9)


def forecast_pinball_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE-forecast evaluation with pinball (quantile) loss — the
    scoring rule behind the M5-Uncertainty competition and every
    quantile-regression service: per event type, forecast day t's
    value at tau in {0.1, 0.5, 0.9} as the interpolated tau-quantile
    of the trailing 7 FULL days (frame excludes t itself — no
    leakage), then score L_tau(y, q) = max(tau*(y-q), (tau-1)*(y-q))
    and report the mean loss plus empirical coverage P(y <= q) per
    (type, tau) — the calibration readout (coverage should track tau
    for a calibrated forecaster).  Completes the eval shelf: MAE
    (`forecast_seasonal_naive_mae`) grades point forecasts; this
    grades distributional ones.

    Exactness: the trailing quantile interpolates over an
    array_sort-ed 7-element frame list with h = (n-1)*tau — identical
    closed form both engines; per-day losses are 6-rounded then
    decimal-summed so the mean is order-free; coverage is an exact
    integer ratio.

    Scale: one (type, day) pre-aggregation, one per-type window pass
    whose frame list is bounded at 7 elements, a 3-row broadcast tau
    grid, one final groupBy — no data-sized arrays ever shuffle."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-PINBALL_W, -1)
    )
    framed = daily.select(
        "event_type",
        "day",
        "y",
        F.array_sort(F.collect_list("y").over(w)).alias("hist"),
    ).where(F.size("hist") == PINBALL_W)
    taus = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in PINBALL_TAUS])
        ).alias("tau")
    )
    j = framed.crossJoin(F.broadcast(taus))
    h = (F.lit(float(PINBALL_W - 1))) * F.col("tau")
    lo = F.floor(h).cast("int")
    frac = h - lo.cast("double")
    v_lo = F.element_at("hist", lo + 1)
    v_hi = F.element_at(
        "hist", F.least(lo + 2, F.lit(PINBALL_W)).cast("int")
    )
    q = v_lo + frac * (v_hi - v_lo)
    diff = F.col("y") - q
    loss = F.round(
        F.greatest(
            F.col("tau") * diff, (F.col("tau") - 1.0) * diff
        ),
        6,
    )
    scored = j.select(
        "event_type",
        "tau",
        loss.cast("decimal(28,6)").alias("loss"),
        (F.col("y") <= q).cast("long").alias("covered"),
    )
    return (
        scored.groupBy("event_type", "tau")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.round(
                (F.sum("loss") / F.count(F.lit(1))).cast("double"), 6
            ).alias("mean_pinball"),
            F.round(
                F.sum("covered").cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage"),
        )
        .orderBy("event_type", "tau")
    )


QUERIES["forecast_pinball_quantile"] = forecast_pinball_quantile
ORACLE_SQL["forecast_pinball_quantile"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6)))
                          AS DOUBLE), 6) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    framed AS (
        SELECT event_type, day, y,
               LIST_SORT(LIST(y) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {PINBALL_W} PRECEDING
                            AND 1 PRECEDING)) AS hist
        FROM daily),
    full_frames AS (
        SELECT * FROM framed WHERE LEN(hist) = {PINBALL_W}),
    taus AS (SELECT UNNEST([{', '.join(str(t) for t in PINBALL_TAUS)}]) AS tau),
    scored AS (
        SELECT event_type, tau,
               CAST(ROUND(
                   GREATEST(tau * (y - q), (tau - 1.0) * (y - q)),
                   6) AS DECIMAL(28, 6)) AS loss,
               CASE WHEN y <= q THEN 1 ELSE 0 END AS covered
        FROM (
            SELECT f.event_type, f.y, t.tau,
                   f.hist[CAST(FLOOR(({PINBALL_W - 1}.0) * t.tau) AS INT)
                          + 1]
                   + (({PINBALL_W - 1}.0) * t.tau
                      - FLOOR(({PINBALL_W - 1}.0) * t.tau))
                     * (f.hist[LEAST(
                            CAST(FLOOR(({PINBALL_W - 1}.0) * t.tau) AS INT)
                            + 2, {PINBALL_W})]
                        - f.hist[CAST(FLOOR(({PINBALL_W - 1}.0) * t.tau)
                                      AS INT) + 1]) AS q
            FROM full_frames f CROSS JOIN taus t))
    SELECT event_type, tau,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(loss) / COUNT(*) AS DOUBLE), 6) AS mean_pinball,
           ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scored
    GROUP BY event_type, tau
    ORDER BY event_type, tau
"""


#: subsequence search geometry: window length (days) and result size
SUBSEQ_W = 7
SUBSEQ_TOP_K = 10


def ts_subsequence_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TIME-SERIES SUBSEQUENCE SIMILARITY SEARCH (the
    UCR-suite primitive; cf. "Time Series Similarity Search for
    Streaming Data in Distributed Systems", EDBT 2019 — the retrieved
    corpus' motivating shape): take the lexicographically-first event
    type's LAST full 7-day window as the query pattern, z-normalize
    it, and rank EVERY 7-day sliding window of every type's daily
    series by z-normalized Euclidean distance — the scale-and-offset
    invariant "find me series segments shaped like this one" matcher
    that motif/anomaly pipelines run where raw-value distance would
    only find segments at the same level.  The query window itself
    scores 0 and is excluded; flat (zero-variance) windows carry no
    shape and are excluded via the NULLIF discipline.

    Determinism: window statistics and the distance fold walk each
    7-element frame list left-to-right identically in both engines
    (F.aggregate == LIST_REDUCE), the distance is 6-rounded BEFORE the
    ranking sort (the pagerank discipline), and ties break on
    (type, start_day).

    Scale: one (type, day) pre-aggregation, one per-type window pass
    with 7-element frame lists, a 1-row broadcast z-normed query
    pattern, and a TakeOrdered top-k — linear in windows, nothing
    pairwise (a full all-subsequence self-join would be windows^2;
    this is the one-query probe shape production search serves)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
        ).alias("y")
    )
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(0, SUBSEQ_W - 1)
    )
    wins = daily.select(
        "event_type",
        F.col("day").alias("start_day"),
        F.collect_list("y").over(w7).alias("xs"),
    ).where(F.size("xs") == SUBSEQ_W)

    nw = F.lit(float(SUBSEQ_W))

    def _mean(arr):
        return (
            F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x) / nw
        )

    def _sd(arr, m):
        return F.sqrt(
            F.aggregate(
                arr, F.lit(0.0), lambda acc, x: acc + (x - m) * (x - m)
            )
            / nw
        )

    type0 = wins.agg(F.min("event_type").alias("t0"))
    qrow = (
        wins.join(F.broadcast(type0), wins.event_type == F.col("t0"))
        .orderBy(F.desc("start_day"))
        .limit(1)
        .select(
            F.col("event_type").alias("q_type"),
            F.col("start_day").alias("q_start"),
            F.col("xs").alias("q_xs"),
        )
    )
    qm = _mean(F.col("q_xs"))
    qsd = F.nullif(_sd(F.col("q_xs"), qm), F.lit(0.0))
    qnorm = qrow.select(
        "q_type",
        "q_start",
        F.transform(F.col("q_xs"), lambda x: (x - qm) / qsd).alias("q"),
    )
    m = _mean(F.col("xs"))
    sd = F.nullif(_sd(F.col("xs"), m), F.lit(0.0))
    scored = (
        wins.crossJoin(F.broadcast(qnorm))
        .where(
            ~(
                (F.col("event_type") == F.col("q_type"))
                & (F.col("start_day") == F.col("q_start"))
            )
        )
        .select(
            "event_type",
            "start_day",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("xs"),
                            F.col("q"),
                            lambda x, q: ((x - m) / sd - q)
                            * ((x - m) / sd - q),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ),
                6,
            ).alias("znorm_dist"),
        )
        .where(F.col("znorm_dist").isNotNull())
    )
    return scored.orderBy(
        "znorm_dist", "event_type", "start_day"
    ).limit(SUBSEQ_TOP_K)


QUERIES["ts_subsequence_search_topk"] = ts_subsequence_search_topk
ORACLE_SQL["ts_subsequence_search_topk"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6)))
                          AS DOUBLE), 6) AS y
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    wins AS (
        SELECT event_type, day AS start_day,
               LIST(y) OVER (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN CURRENT ROW
                                      AND {SUBSEQ_W - 1} FOLLOWING) AS xs
        FROM daily
        QUALIFY LEN(xs) = {SUBSEQ_W}),
    qrow AS (
        SELECT event_type AS q_type, start_day AS q_start, xs AS q_xs
        FROM wins
        WHERE event_type = (SELECT MIN(event_type) FROM wins)
        ORDER BY start_day DESC LIMIT 1),
    qnorm AS (
        SELECT q_type, q_start,
               LIST_TRANSFORM(q_xs, x ->
                   (x - LIST_REDUCE(q_xs, (a, b) -> a + b) / {SUBSEQ_W}.0)
                   / NULLIF(SQRT(LIST_REDUCE(
                         LIST_TRANSFORM(q_xs, v ->
                             (v - LIST_REDUCE(q_xs, (a, b) -> a + b)
                                  / {SUBSEQ_W}.0)
                             * (v - LIST_REDUCE(q_xs, (a, b) -> a + b)
                                    / {SUBSEQ_W}.0)),
                         (a, b) -> a + b) / {SUBSEQ_W}.0), 0.0)) AS q
        FROM qrow),
    scored AS (
        SELECT w.event_type, w.start_day,
               ROUND(SQRT(LIST_REDUCE(
                   LIST_TRANSFORM(generate_series(1, {SUBSEQ_W}), i ->
                       ((w.xs[CAST(i AS INT)]
                         - LIST_REDUCE(w.xs, (a, b) -> a + b)
                           / {SUBSEQ_W}.0)
                        / NULLIF(SQRT(LIST_REDUCE(
                              LIST_TRANSFORM(w.xs, v ->
                                  (v - LIST_REDUCE(w.xs, (a, b) -> a + b)
                                       / {SUBSEQ_W}.0)
                                  * (v - LIST_REDUCE(w.xs,
                                         (a, b) -> a + b)
                                         / {SUBSEQ_W}.0)),
                              (a, b) -> a + b) / {SUBSEQ_W}.0), 0.0)
                        - n.q[CAST(i AS INT)])
                       * ((w.xs[CAST(i AS INT)]
                           - LIST_REDUCE(w.xs, (a, b) -> a + b)
                             / {SUBSEQ_W}.0)
                          / NULLIF(SQRT(LIST_REDUCE(
                                LIST_TRANSFORM(w.xs, v ->
                                    (v - LIST_REDUCE(w.xs,
                                         (a, b) -> a + b) / {SUBSEQ_W}.0)
                                    * (v - LIST_REDUCE(w.xs,
                                           (a, b) -> a + b)
                                           / {SUBSEQ_W}.0)),
                                (a, b) -> a + b) / {SUBSEQ_W}.0), 0.0)
                          - n.q[CAST(i AS INT)])),
                   (a, b) -> a + b)), 6) AS znorm_dist
        FROM wins w CROSS JOIN qnorm n
        WHERE NOT (w.event_type = n.q_type AND w.start_day = n.q_start))
    SELECT event_type, start_day, znorm_dist
    FROM scored
    WHERE znorm_dist IS NOT NULL
    ORDER BY znorm_dist, event_type, start_day
    LIMIT {SUBSEQ_TOP_K}
"""


#: seasonal-stability geometry: full-week segments, the two intraday
#: periods whose stability a seasonality monitor tracks.
PSTAB_SEG_HOURS = 168
PSTAB_PERIODS = (12, 24)


def ts_periodogram_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch-style SEGMENT-AVERAGED periodogram — the stability check
    the single full-series DFT (``ts_periodogram_dft``) cannot give:
    cut each type's hourly series into consecutive FULL 168-hour
    (weekly) segments, compute the variance-fraction spectral power at
    the 12 h and 24 h lines per segment (identical fold arithmetic to
    the registered periodogram), and report the across-segment mean,
    spread and range per (type, period).  A large mean with a small
    spread is a STABLE daily cycle; a large mean with a large spread
    is a transient burst masquerading as seasonality — the distinction
    an alerting pipeline needs before it trusts a seasonal baseline.
    Segment length is a multiple of both periods, so global-t phase
    cancels in C^2 + S^2 and segments are comparable.

    Determinism: per-segment folds walk the same t-ordered arrays
    left-to-right in both engines and the power fraction is 6-rounded
    (the _periodogram_pf canon); the across-segment moments then run
    on EXACT micro-unit integers (pf x 1e6 as BIGINT), so the
    mean/spread are order-free by construction.  Zero-variance
    segments yield NULL pf (NULLIF discipline) and are excluded, with
    n_segments reporting what remained.

    Scale: one data-sized aggregation (hourly counts); the dense grid,
    the per-(type, segment) fold arrays and the stability rollup are
    calendar-bounded — the ts_acf_hourly argument, segmented."""
    hourly = (
        load_table(spark, "events", sf_dir)
        .select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    global_bounds = hourly.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(global_bounds))
        .select(
            "event_type",
            "h0",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("h"),
        )
    )
    dense = (
        grid.join(hourly, ["event_type", "h"], "left")
        .fillna(0, subset=["x"])
        .select(
            "event_type",
            F.expr("timestampdiff(HOUR, h0, h)").cast("long").alias("t"),
            "x",
        )
        .withColumn(
            "seg", (F.col("t") / F.lit(PSTAB_SEG_HOURS)).cast("long")
        )
    )
    per_seg = (
        dense.groupBy("event_type", "seg")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("t").alias("t"), F.col("x").alias("x"))
                )
            ).alias("sv"),
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("q"),
        )
        .where(F.col("n") == PSTAB_SEG_HOURS)
    )
    mean = F.col("s") / F.col("n")

    def _fold(trig, period):
        return F.round(
            F.aggregate(
                "sv",
                F.lit(0.0),
                lambda acc, e: acc
                + (e["x"].cast("double") - mean)
                * trig(
                    F.lit(_TWO_PI)
                    * e["t"].cast("double")
                    / F.lit(float(period))
                ),
            )
            / F.col("n"),
            6,
        )

    wide = per_seg.select(
        "event_type",
        "seg",
        "n",
        "s",
        "q",
        *[
            c
            for P in PSTAB_PERIODS
            for c in (
                _fold(F.cos, P).alias(f"c{P}"),
                _fold(F.sin, P).alias(f"s{P}"),
            )
        ],
    )
    denom = F.nullif(
        F.col("q").cast("double") - mean * F.col("s").cast("double"),
        F.lit(0.0),
    )
    pfs = wide.select(
        "event_type",
        "seg",
        *[
            F.round(
                F.col("n").cast("double")
                * (
                    F.col(f"c{P}") * F.col(f"c{P}")
                    + F.col(f"s{P}") * F.col(f"s{P}")
                )
                / denom,
                6,
            ).alias(f"pf{P}")
            for P in PSTAB_PERIODS
        ],
    )
    stacked = pfs.select(
        "event_type",
        "seg",
        F.expr(
            f"stack({len(PSTAB_PERIODS)}, "
            + ", ".join(f"{P}, pf{P}" for P in PSTAB_PERIODS)
            + ") AS (period_hours, pf)"
        ),
    ).where(F.col("pf").isNotNull())
    m = F.round(F.col("pf") * 1e6, 0).cast("long")
    moments = stacked.select(
        "event_type", "period_hours", m.alias("m")
    ).groupBy("event_type", "period_hours").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("m").alias("sm"),
        F.sum(F.col("m") * F.col("m")).alias("sm2"),
        F.min("m").alias("mn"),
        F.max("m").alias("mx"),
    )
    k = F.col("n_segments").cast("double")
    mean_m = F.col("sm").cast("double") / k
    var_m = F.col("sm2").cast("double") / k - mean_m * mean_m
    return moments.select(
        "event_type",
        F.col("period_hours").cast("long").alias("period_hours"),
        "n_segments",
        F.round(mean_m / F.lit(1e6), 6).alias("mean_pf"),
        F.round(
            F.sqrt(F.greatest(var_m, F.lit(0.0))) / F.lit(1e6), 6
        ).alias("sd_pf"),
        F.round(F.col("mn").cast("double") / F.lit(1e6), 6).alias(
            "min_pf"
        ),
        F.round(F.col("mx").cast("double") / F.lit(1e6), 6).alias(
            "max_pf"
        ),
    ).orderBy("event_type", "period_hours")


QUERIES["ts_periodogram_stability"] = ts_periodogram_stability


def _pstab_sql() -> str:
    fold_cols = ",\n               ".join(
        f"ROUND(LIST_REDUCE(LIST_TRANSFORM(generate_series(1, LEN(xs)),"
        f" i -> (xs[i] - s * 1.0 / n) * {trig}("
        f"6.283185307179586 * ts_[i] / {P}.0)),"
        f" (a, b) -> a + b) / n, 6) AS {pre}{P}"
        for P in PSTAB_PERIODS
        for trig, pre in (("COS", "c"), ("SIN", "s"))
    )
    pf_cols = ",\n               ".join(
        f"ROUND((n * (c{P} * c{P} + s{P} * s{P}))"
        f" / NULLIF(q - (s * 1.0 / n) * s, 0.0), 6) AS pf{P}"
        for P in PSTAB_PERIODS
    )
    unpivot = "\n            UNION ALL\n            ".join(
        f"SELECT event_type, seg, {P} AS period_hours, pf{P} AS pf FROM pf"
        for P in PSTAB_PERIODS
    )
    return f"""
        WITH hourly AS (
            SELECT event_type, DATE_TRUNC('hour', ts) AS h,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2),
        bnds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, b.h0,
                   UNNEST(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN bnds b),
        dense AS (
            SELECT g.event_type,
                   CAST(DATE_DIFF('hour', g.h0, g.h) AS BIGINT) AS t,
                   COALESCE(hourly.x, 0) AS x,
                   CAST(DATE_DIFF('hour', g.h0, g.h) AS BIGINT)
                       // {PSTAB_SEG_HOURS} AS seg
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h),
        arr AS (
            SELECT event_type, seg,
                   LIST(x ORDER BY t) AS xs,
                   LIST(t ORDER BY t) AS ts_,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   CAST(SUM(x * x) AS BIGINT) AS q
            FROM dense GROUP BY event_type, seg
            HAVING COUNT(*) = {PSTAB_SEG_HOURS}),
        folded AS (
            SELECT event_type, seg, n, s, q,
               {fold_cols}
            FROM arr),
        pf AS (
            SELECT event_type, seg, n, s, q,
               {pf_cols}
            FROM folded),
        stacked AS (
            {unpivot}),
        mm AS (
            SELECT event_type, period_hours,
                   CAST(ROUND(pf * 1e6, 0) AS BIGINT) AS m
            FROM stacked WHERE pf IS NOT NULL),
        moments AS (
            SELECT event_type, period_hours,
                   CAST(COUNT(*) AS BIGINT) AS n_segments,
                   CAST(SUM(m) AS BIGINT) AS sm,
                   CAST(SUM(m * m) AS BIGINT) AS sm2,
                   CAST(MIN(m) AS BIGINT) AS mn,
                   CAST(MAX(m) AS BIGINT) AS mx
            FROM mm GROUP BY event_type, period_hours)
        SELECT event_type,
               CAST(period_hours AS BIGINT) AS period_hours,
               n_segments,
               ROUND((CAST(sm AS DOUBLE) / n_segments) / 1e6, 6)
                   AS mean_pf,
               ROUND(SQRT(GREATEST(
                   CAST(sm2 AS DOUBLE) / n_segments
                   - (CAST(sm AS DOUBLE) / n_segments)
                     * (CAST(sm AS DOUBLE) / n_segments), 0.0)) / 1e6, 6)
                   AS sd_pf,
               ROUND(CAST(mn AS DOUBLE) / 1e6, 6) AS min_pf,
               ROUND(CAST(mx AS DOUBLE) / 1e6, 6) AS max_pf
        FROM moments
        ORDER BY event_type, period_hours
"""


ORACLE_SQL["ts_periodogram_stability"] = _pstab_sql()
