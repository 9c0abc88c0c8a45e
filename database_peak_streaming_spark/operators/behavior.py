"""User-behavior analytics over the events stream at rest: ordered
funnel, batch sessionization, deterministic per-key mode.  The shapes a
product-analytics workload runs daily on an events warehouse, expressed
as pure window/aggregate plans (no UDFs).

Scale notes: every stage keys on ``user_id`` (or (user, session)) — the
natural partition key of an events table; funnel stages are four narrow
aggregations joined on user_id (AQE coalesces the tiny maps), and
sessionization is the classic lag-flag-cumsum window stack, one shuffle
on the partition key for the whole stack (windows share the key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table

#: sessionization gap: a pause longer than this starts a new session
SESSION_GAP_S = 1800


def events_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> click -> purchase:
    a user reaches stage N only with an event of that type strictly
    AFTER their stage-N-1 time (first-touch attribution).  Emits one row
    per stage with the surviving-user count — the monotone funnel."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")

    def first_after(df: DataFrame, etype: str, prev: DataFrame, prev_col: str, out: str) -> DataFrame:
        return (
            df.join(prev, "user_id")
            .filter((F.col("event_type") == etype) & (F.col("ts") > F.col(prev_col)))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    t1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    t2 = first_after(ev, "view", t1, "t_signup", "t_view")
    t3 = first_after(ev, "click", t2, "t_view", "t_click")
    t4 = first_after(ev, "purchase", t3, "t_click", "t_purchase")
    counts = [
        ("1_signup", t1),
        ("2_view", t2),
        ("3_click", t3),
        ("4_purchase", t4),
    ]
    out = None
    for stage, df in counts:
        row = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("stage")


def sessionize_gap_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per user, a gap > SESSION_GAP_S starts a new
    session (lag -> boundary flag -> running sum = session index), then a
    per-session summary.  The batch twin of the streaming
    ``session_window`` aggregation (``window_session_30m``), useful when
    the warehouse query needs session IDs joinable back to raw events —
    which the streaming window form does not expose."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "value")
    w_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), F.lit(1)).otherwise(F.lit(0)),
    )
    with_id = flagged.withColumn(
        "session_idx",
        F.sum("new_sess").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    from database_peak_streaming_spark.operators.common import dsum

    return (
        with_id.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            dsum("value", "total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


#: dynamic sessionization gaps: a purchase buys a longer inactivity
#: grace before the session closes (checkout/payment detours), any
#: other event keeps the standard 30 min.
SESSION_GAP_AFTER_PURCHASE_S = 7200


def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a DATA-DEPENDENT gap: the inactivity
    threshold that closes a session depends on the PREVIOUS event's
    type (purchase -> 2 h grace, else 30 min) — the dynamic-gap session
    semantics Spark's streaming ``session_window(ts, gap_expr)``
    supports and fixed-gap SQL sessionization can't express.  This is
    its batch twin with joinable session ids, same shape as
    ``sessionize_gap_ids`` (lag -> boundary flag -> running sum), the
    threshold just rides the lagged row.

    One shuffle on user_id; both window passes share the partitioning.
    Tie-break (ts, event_id) makes the lag total-ordered, so the
    session ids are engine-exact."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_user)
    prev_type = F.lag("event_type").over(w_user)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)
    allowed = F.when(
        prev_type == "purchase", F.lit(SESSION_GAP_AFTER_PURCHASE_S)
    ).otherwise(F.lit(SESSION_GAP_S))
    flagged = ev.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > allowed), F.lit(1)).otherwise(F.lit(0)),
    )
    with_id = flagged.withColumn(
        "session_idx",
        F.sum("new_sess")
        .over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    from database_peak_streaming_spark.operators.common import dsum_bounded

    return (
        with_id.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("n_purchases"),
            dsum_bounded("value", "total_value"),
        )
        .orderBy("user_id", "session_idx")
    )


def mode_event_type_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user modal event type: count per (user, type),
    rank by (count desc, type asc) — the explicit tie-break is the point
    (native ``mode()`` aggregates are tie-nondeterministic across
    engines and partitionings, so they cannot be differentially
    tested)."""
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
        .orderBy("user_id")
    )


def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the event log: each
    user's event_type acts as the tracked attribute; consecutive
    duplicates collapse and every VALUE CHANGE opens a versioned row
    with ``valid_from`` / ``valid_to`` (null = current) and a version
    number — the standard dimension-history construction a warehouse
    derives from a change stream.

    Plan: one shuffle on user_id serves the whole window stack (lag to
    find change points, lead for the closing timestamp, row_number for
    the version).  Ordering is (ts, event_id) so timestamp ties are
    deterministic — required for cross-engine differential testing, and
    the same discipline a production SCD2 job needs for idempotent
    rebuilds."""
    ev = load_table(spark, "events", sf_dir)
    return _scd2_history(ev).orderBy("user_id", "version")


def _scd2_history(ev: DataFrame) -> DataFrame:
    """The SCD2 dimension build shared by ``scd2_user_state_history``
    (which presents it) and ``join_scd2_point_in_time`` (which joins
    facts against it): collapse consecutive duplicates, open a
    versioned valid_from/valid_to row per value change.  One user_id
    shuffle serves the whole window stack."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.withColumn("valid_to", F.lead("ts").over(wc))
        .withColumn("version", F.row_number().over(wc))
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
            "version",
        )
    )


def user_state_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user latest state (count, last value, last ts) — the batch
    oracle form of the streaming KeyedUpsertStore (streaming/upsert.py):
    the store's incrementally-merged snapshot must equal this one
    aggregation over the full event log (tested stream==batch in
    tests/test_upsert_store.py).  ``max_by`` is well-defined here
    because (user_id, ts) is unique in the event log."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max_by("value", "ts"), 6).alias("last_value"),
            F.max("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen ISO week,
    counted as active per (cohort_week, week_offset) — the standard
    growth-analytics rollup.

    Plan: one groupBy for first-seen (min ts per user, then week
    truncation), broadcast back onto per-event activity weeks, distinct
    on (cohort, offset, user), final count — two shuffles on user_id
    then one on the tiny (cohort, offset) key.  date_trunc('week') is
    ISO Monday-start in both engines; offsets are whole-day diffs
    floor-divided by 7 so no timezone or DST arithmetic is involved."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    joined = active.join(F.broadcast(cohort), "user_id").select(
        "cohort_week",
        (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        "user_id",
    )
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with raw transition counts —
    the sequence-model summary behind next-action prediction and
    anomalous-flow detection.

    One shuffle on user_id for the lag window, then a groupBy on the
    tiny (prev, next) key; the row-conditional probability is a window
    sum over at most |event_types| rows.  Counts are exact longs, the
    probability is a ratio of those longs — identical in any engine."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wt = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wt), 6
        ).alias("prob"),
    ).orderBy("prev_type", "next_type")


def events_top_action_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining at the 3-gram level: the 20 most
    frequent ordered action triples across all per-user event
    sequences, with the share of all trigrams each captures — the
    order-aware step past the Markov pair matrix above (A->B->C flows
    that pair counts factor away), and the workhorse query behind
    journey mining / funnel discovery.

    Same shape as the Markov query: ONE shuffle on user_id feeds two
    lag exprs over one window sort, then a groupBy on the tiny
    (t1,t2,t3) key (|types|^3 max).  Counts are exact longs; the
    share divides by the exact global trigram total (broadcast
    scalar).  Top-20 tie-broken on the full triple."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).where(F.col("t1").isNotNull())
    grams = seq.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = grams.agg(F.sum("n").alias("n_total"))
    return (
        grams.crossJoin(F.broadcast(total))
        .select(
            "t1",
            "t2",
            "t3",
            "n",
            F.round(F.col("n") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(20)
    )


def orders_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue within each
    nation — the inequality/concentration measure behind "is our
    revenue dangerously whale-dependent?" panels (0 = uniform, ->1 =
    one customer is the book).  Uses the exact rank formula
    ``G = 2*sum(i*x_i) / (n*sum(x)) - (n+1)/n`` over revenue sorted
    ascending, fully tie-broken on (revenue, custkey) so ranks are
    engine-independent.

    Plan: fact collapses to per-customer revenue (one shuffle), nation
    broadcast onto customer, one rank window per nation, then a
    |nations|-key rollup.  Revenue and the i*x products are exact
    decimal sums — the division is the only float step."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev")
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "rev")
    )
    w = Window.partitionBy("n_name").orderBy("rev", "o_custkey")
    ranked = per_cust.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev").cast("double").alias("total_rev"),
            (
                (
                    F.lit(2.0)
                    * F.sum(F.col("i") * F.col("rev")).cast("double")
                )
                / (
                    F.count(F.lit(1))
                    * F.sum("rev").cast("double")
                )
                - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1))
            ).alias("_g"),
        )
        .select(
            "n_name",
            "n_customers",
            F.round("total_rev", 2).alias("total_rev"),
            F.round("_g", 6).alias("gini"),
        )
        .orderBy("n_name")
    )


def events_attribution_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch conversion attribution: for every user
    whose history contains a 'purchase', find the first event type in
    their history and the last event type strictly before their first
    purchase, then count converting users per (first_touch, last_touch)
    — the marketing-attribution rollup.

    Strictly-before is ordered by (ts, event_id) so simultaneous
    timestamps break ties identically in any engine.  Users whose first
    event IS the purchase attribute to 'none'.  Plan: one groupBy for
    the first conversion per user, a broadcast back, one more groupBy
    for the per-user first/last pre-conversion touch (min_by/max_by on
    the same composite key), and a final tiny-key count."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    okey = F.struct(F.col("ts"), F.col("event_id"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(okey).alias("conv_key"))
    )
    pre = ev.join(F.broadcast(conv), "user_id").where(okey < F.col("conv_key"))
    att = pre.groupBy("user_id").agg(
        F.min_by("event_type", okey).alias("first_touch"),
        F.max_by("event_type", okey).alias("last_touch"),
    )
    return (
        conv.join(att, "user_id", "left")
        .groupBy(
            F.coalesce("first_touch", F.lit("none")).alias("first_touch"),
            F.coalesce("last_touch", F.lit("none")).alias("last_touch"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("first_touch", "last_touch")
    )


def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped 40/20/40) conversion attribution: the
    multi-touch refinement of `events_attribution_first_last`.  For
    every user's pre-conversion touch sequence, credit 0.4 to the first
    and last touch and split the remaining 0.2 evenly across the
    middles (1 touch -> 1.0, 2 touches -> 0.5 each), then roll credit
    up per channel (event_type).

    Determinism: the touch order is the same (ts, event_id) composite
    key as first/last attribution, and the per-channel credit sum goes
    through `dsum` (exact fixed-point micro-units), so the total is
    independent of partitioning and row order — summing 0.2/(n-2)
    doubles in arbitrary order would otherwise wobble at the 1e-6
    rounding boundary between engines.

    Scale: one user-keyed window over the pre-conversion slice (same
    shuffle key as the conversion groupBy), then a tiny channel-keyed
    rollup — no step widens with anything but the events table."""
    from database_peak_streaming_spark.operators.common import dsum

    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    okey = F.struct(F.col("ts"), F.col("event_id"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(okey).alias("conv_key"))
    )
    pre = ev.join(F.broadcast(conv), "user_id").where(okey < F.col("conv_key"))
    w = Window.partitionBy("user_id")
    seq = pre.select(
        "event_type",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("pos"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    n = F.col("n")
    credit = F.when(n == 1, F.lit(1.0)).when(n == 2, F.lit(0.5)).when(
        (F.col("pos") == 1) | (F.col("pos") == n), F.lit(0.4)
    ).otherwise(F.lit(0.2) / (n - F.lit(2)))
    return (
        seq.select(F.col("event_type").alias("channel"), credit.alias("w"))
        .groupBy("channel")
        .agg(
            dsum("w", "total_credit"),
            F.count(F.lit(1)).cast("long").alias("n_touches"),
        )
        .orderBy("channel")
    )


#: Event-type domain for the KS drift test (the fixture's full
#: vocabulary; a type outside this set still counts toward the pooled
#: ECDF on both engines identically).
KS_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def stats_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic per event
    type: D_t = sup_x |F_t(x) - F_pool(x)| of the `value` distribution
    against the pooled corpus — the CONTINUOUS-distribution drift
    alarm beside the categorical chi-square
    (`source_lang_drift_chi2`).

    Scale design: the ECDF support is the DISTINCT value set, which is
    domain-bounded (2-decimal readings in a fixed range — ~18k points
    at sf0.1, capped by the value domain, NOT growing with the table),
    so the plan is: one groupBy(value) that reduces the table to the
    support with per-type counts pivoted as columns, one ordered
    cumulative window over that bounded support, a 5-way stack back to
    rows, and a tiny per-type max.  The single-task window is over the
    bounded support only — for a genuinely unbounded value domain the
    same query runs on bucketized values (the equi-depth histogram
    path) or a two-phase prefix sum.  All counts stay exact longs
    until the final division; the sup over identical doubles is
    deterministic."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    ev = ev.where(F.col("value").isNotNull())
    g = ev.groupBy("value").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"c_{t}")
            for t in KS_EVENT_TYPES
        ],
        F.count(F.lit(1)).alias("c_all"),
    )
    w = (
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.select(
        "value",
        *[F.sum(f"c_{t}").over(w).alias(f"cum_{t}") for t in KS_EVENT_TYPES],
        F.sum("c_all").over(w).alias("cum_all"),
    )
    stack_args = ", ".join(f"'{t}', cum_{t}" for t in KS_EVENT_TYPES)
    long = cum.select(
        "cum_all",
        F.expr(
            f"stack({len(KS_EVENT_TYPES)}, {stack_args}) AS (event_type, cum_t)"
        ),
    )
    nt = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    total = ev.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        long.join(nt, "event_type")
        .crossJoin(F.broadcast(total))
        .groupBy("event_type", "n_t")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_t") / F.col("n_t")
                        - F.col("cum_all") / F.col("n_all")
                    )
                ),
                6,
            ).alias("ks_d")
        )
        .select(
            "event_type",
            F.col("ks_d"),
            F.col("n_t").cast("long").alias("n_events"),
        )
        .orderBy("event_type")
    )


def stats_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth mover's) distance between the early-era and
    late-era `value` distributions per event type — the drift metric
    that weighs HOW FAR mass moved, not just whether it moved
    (completing the family: KS = sup gap, PSI = smoothed divergence,
    JSD = token mix, W1 = transport cost).  For 1-D distributions
    W1 = integral |F_a(x) - F_b(x)| dx, evaluated exactly on the
    discrete support as sum_i |F_a(v_i) - F_b(v_i)| * (v_{i+1} - v_i).

    Same era split and exactness discipline as `stats_psi_value_drift`
    (integer-epoch midpoint; exact BIGINT counts on the domain-bounded
    distinct-value support; one ordered cumulative window over that
    support only), structurally the KS plan with a lead() gap column
    and a weighted sum instead of a max."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "value", F.unix_timestamp("ts").alias("e"))
        .where(F.col("value").isNotNull())
    )
    global_bounds = ev.agg(
        F.min("e").alias("e_min"), F.max("e").alias("e_max")
    )
    split = ev.crossJoin(F.broadcast(global_bounds)).withColumn(
        "is_ref",
        (F.lit(2) * F.col("e") < F.col("e_min") + F.col("e_max")).cast(
            "long"
        ),
    )
    g = split.groupBy("value").agg(
        *[
            F.sum(
                F.when(F.col("event_type") == t, F.col("is_ref")).otherwise(
                    F.lit(0)
                )
            ).alias(f"r_{t}")
            for t in KS_EVENT_TYPES
        ],
        *[
            F.sum(
                F.when(
                    F.col("event_type") == t, F.lit(1) - F.col("is_ref")
                ).otherwise(F.lit(0))
            ).alias(f"c_{t}")
            for t in KS_EVENT_TYPES
        ],
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_lead = Window.orderBy("value")
    cum = g.select(
        "value",
        (F.lead("value", 1).over(w_lead) - F.col("value")).alias("gap"),
        *[F.sum(f"r_{t}").over(w).alias(f"cr_{t}") for t in KS_EVENT_TYPES],
        *[F.sum(f"c_{t}").over(w).alias(f"cc_{t}") for t in KS_EVENT_TYPES],
    ).fillna(0.0, subset=["gap"])
    stack_args = ", ".join(
        f"'{t}', cr_{t}, cc_{t}" for t in KS_EVENT_TYPES
    )
    long = cum.select(
        "gap",
        F.expr(
            f"stack({len(KS_EVENT_TYPES)}, {stack_args})"
            " AS (event_type, cum_ref, cum_cur)"
        ),
    )
    totals = split.groupBy("event_type").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
    )
    return (
        long.join(totals, "event_type")
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(
            F.round(
                F.sum(
                    F.abs(
                        F.col("cum_ref") / F.col("n_ref")
                        - F.col("cum_cur") / F.col("n_cur")
                    )
                    * F.col("gap")
                ),
                6,
            ).alias("w1_distance")
        )
        .select(
            "event_type",
            "w1_distance",
            F.col("n_ref").cast("long").alias("n_ref_events"),
            F.col("n_cur").cast("long").alias("n_cur_events"),
        )
        .orderBy("event_type")
    )


def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer Recency (days since last
    order, against the corpus max date), Frequency (order count) and
    Monetary (exact-decimal spend) quartiled into 4x4x4 segments — the
    classic CRM rollup, with every ordering fully tie-broken on the
    customer key so the ntile assignment is identical in any engine or
    partitioning.

    Plan: one groupBy collapses orders to a customer-sized table; the
    reference date rides as a broadcast scalar; three ntile windows run
    over that dimension-sized data (at 100 TB: range-partitioned global
    sort, same as any ranking); the final segment rollup is a 64-key
    groupBy."""
    o = load_table(spark, "orders", sf_dir)
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("spend"),
    )
    ref = o.agg(F.max(F.to_date("o_orderdate")).alias("ref_date"))
    scored = (
        per_cust.crossJoin(F.broadcast(ref))
        .withColumn(
            "recency_days", F.datediff("ref_date", "last_order")
        )
        .withColumn(
            "r_score",
            F.ntile(4).over(Window.orderBy("recency_days", "o_custkey")),
        )
        .withColumn(
            "f_score",
            F.ntile(4).over(
                Window.orderBy(F.desc("n_orders"), "o_custkey")
            ),
        )
        .withColumn(
            "m_score",
            F.ntile(4).over(Window.orderBy(F.desc("spend"), "o_custkey")),
        )
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                (F.sum("spend").cast("double") / F.count(F.lit(1))), 6
            ).alias("avg_spend"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for every user whose first click
    precedes their first purchase, the click->purchase latency,
    summarized per first-click hour-of-day (n converters, exact median
    and p90 seconds) — the funnel-latency rollup growth teams watch.

    Two tiny per-user aggregates (first click, first purchase) join on
    user_id; latencies are exact BIGINT epoch-second differences, so
    the percentile interpolation is over integers and engine-identical.
    One shuffle on user_id, then a 24-key rollup."""
    ev = load_table(spark, "events", sf_dir)
    first_by_type = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"))
    )
    clicks = first_by_type.where(F.col("event_type") == "click").select(
        "user_id", F.col("first_ts").alias("first_click")
    )
    buys = first_by_type.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("first_ts").alias("first_buy")
    )
    conv = (
        clicks.join(buys, "user_id")
        .where(F.col("first_buy") > F.col("first_click"))
        .select(
            F.hour("first_click").alias("click_hour"),
            (
                F.unix_timestamp("first_buy") - F.unix_timestamp("first_click")
            ).alias("latency_s"),
        )
    )
    return (
        conv.groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).alias("n_converters"),
            F.round(F.expr("percentile(latency_s, 0.5D)"), 6).alias(
                "median_latency_s"
            ),
            F.round(F.expr("percentile(latency_s, 0.9D)"), 6).alias(
                "p90_latency_s"
            ),
        )
        .orderBy("click_hour")
    )


def events_dau_wau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU: distinct active users per day, trailing 7 days
    and trailing 30 days, plus the WAU stickiness ratio — the growth
    dashboard every product pipeline materializes.

    The corpus collapses to distinct (day, user) FIRST (the only
    corpus-sized shuffle), then a day-spine range join fans each
    activity row onto the ≤30 spine days it supports, and conditional
    COUNT(DISTINCT CASE...) produces all three horizons in ONE
    aggregation pass.  At 100 TB the exact trailing distincts swap for
    the engine's mergeable sketches (agg_hll_sketch_merge) — daily HLL
    partials OR-merge into any horizon without re-touching events;
    this exact form is the oracle for that path."""
    ev = load_table(spark, "events", sf_dir)
    day_user = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    spine = day_user.select(F.col("d").alias("spine_d")).distinct()
    j = spine.join(
        day_user,
        (F.col("d") <= F.col("spine_d"))
        & (F.col("d") >= F.date_sub("spine_d", 29)),
    )
    out = j.groupBy("spine_d").agg(
        F.countDistinct(
            F.when(F.col("d") == F.col("spine_d"), F.col("user_id"))
        ).alias("dau"),
        F.countDistinct(
            F.when(F.col("d") >= F.date_sub("spine_d", 6), F.col("user_id"))
        ).alias("wau"),
        F.countDistinct("user_id").alias("mau"),
    )
    return (
        out.select(
            F.col("spine_d").alias("day"),
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("dau_wau_ratio"),
        )
        .orderBy("day")
    )


def ab_test_lift_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with a two-proportion z-test: users are
    assigned to arms by the deterministic hash bucketing real
    experiment platforms use (here ``user_id % 2``), the metric is
    user-level purchase conversion, and the output is the full
    readout — arm sizes, conversion rates, relative lift, pooled-
    variance z statistic and the |z| > 1.96 significance flag.

    Everything derives from four exact long counts, so rates, lift and
    z are bit-identical in any engine (pure double arithmetic on the
    same integers).  One shuffle to the per-user flag, one 2-key
    rollup, then scalar algebra on a single row."""
    ev = load_table(spark, "events", sf_dir)
    # conversion = a high-value purchase (max purchase value > 99): the
    # fixture's every-user-buys density makes raw "any purchase" a
    # degenerate 100% metric (z-test denominator 0); the value gate
    # yields mid-range rates at every fixture SF.
    per_user = ev.groupBy("user_id").agg(
        F.max(
            (
                (F.col("event_type") == "purchase") & (F.col("value") > 99)
            ).cast("int")
        ).alias("converted")
    )
    arms = (
        per_user.groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("converted").alias("conv"),
        )
    )
    # Single-row conditional rollup rather than a crossJoin of two
    # filtered arms (round-5 ADVICE): an inner crossJoin returns 0 rows
    # when either arm is empty while the oracle's scalar subqueries
    # return 1 row of NULLs — the conditional sums produce exactly that
    # NULL row on a degenerate corpus, so query and oracle agree.
    joined = arms.agg(
        F.sum(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.sum(F.when(F.col("arm") == 0, F.col("conv"))).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        p_pool * (1 - p_pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    )
    z = (p_b - p_a) / se
    return joined.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round((p_b - p_a) / p_a, 6).alias("relative_lift"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


def events_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral (Shannon) entropy over event types — the
    information-theoretic diversity score bot/anomaly detection ranks
    on (near-zero entropy = single-action scripts; maximal entropy =
    uniform random traffic).

    Two shuffles on user-sized keys: type counts per user, then the
    -sum(p ln p) fold.  The probabilities are exact long ratios, ln is
    applied identically on both engines, and the ~5-term per-user sum
    is rounded to 6dp — association noise is ~1e-15 against the grid.
    Output: per-user entropy with its type count, ordered by user."""
    ev = load_table(spark, "events", sf_dir)
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = tc.groupBy("user_id").agg(F.sum("n").alias("n_total"))
    p = tc.join(tot, "user_id").select(
        "user_id",
        (F.col("n") / F.col("n_total")).alias("p"),
    )
    return (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(-F.sum(F.col("p") * F.log("p")), 6).alias("entropy_nats"),
        )
        .orderBy("user_id")
    )


#: PSI value-bucket width (the fixture's readings live in (0, 500]; a
#: 50-unit bucket gives ~10 cells — the industry-standard 10-bucket PSI)
PSI_BUCKET_WIDTH = 50.0


def stats_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type: the `value`
    distribution of the LATE half of the time range scored against the
    EARLY half as reference — the standard model-monitoring drift
    metric (PSI = sum_b (p_cur - p_ref) * ln(p_cur / p_ref)) beside
    the hypothesis-test drift alarms (KS `stats_ks_drift_by_type`,
    chi-square).  Rule of thumb: < 0.1 stable, 0.1-0.25 moderate
    shift, > 0.25 action.

    Engine-portable by construction: the era split compares integer
    epoch SECONDS (2*e < e_min + e_max — Spark `unix_timestamp`
    truncates, the oracle uses FLOOR(EPOCH(...))), counts stay exact
    BIGINTs through the dense (type x bucket) grid, and the 0.5-Laplace
    smoothing keeps every log finite, so both engines sum identical
    doubles over an identical domain-bounded support.

    Scale design: one scan reduces the table to (type, bucket) cells —
    bounded by |types| x (value domain / bucket width), NOT the row
    count — and everything after the first groupBy is metadata-sized.
    The dense grid (a crossJoin of two domain-bounded distincts) is
    REQUIRED: a bucket the reference era populated but the current era
    missed still contributes its smoothed divergence term."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select("event_type", "value", "ts")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            F.floor(F.col("value") / F.lit(PSI_BUCKET_WIDTH))
            .cast("long")
            .alias("bucket"),
            F.unix_timestamp("ts").alias("e"),
        )
    )
    global_bounds = ev.agg(
        F.min("e").alias("e_min"), F.max("e").alias("e_max")
    )
    cells = (
        ev.crossJoin(F.broadcast(global_bounds))
        .withColumn(
            "era",
            F.when(
                F.lit(2) * F.col("e") < F.col("e_min") + F.col("e_max"),
                F.lit("ref"),
            ).otherwise(F.lit("cur")),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("era") == "ref", 1).otherwise(0)).alias(
                "n_ref"
            ),
            F.sum(F.when(F.col("era") == "cur", 1).otherwise(0)).alias(
                "n_cur"
            ),
        )
    )
    buckets = cells.select("bucket").distinct()
    types = cells.select("event_type").distinct()
    # n_buckets is ONE row (a count over the domain-bounded bucket set)
    n_buckets = buckets.agg(F.count(F.lit(1)).alias("n_b"))
    dense = (
        types.crossJoin(buckets)
        .join(cells, ["event_type", "bucket"], "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    totals = dense.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = (F.col("n_ref") + F.lit(0.5)) / (
        F.col("t_ref") + F.lit(0.5) * F.col("n_b")
    )
    p_cur = (F.col("n_cur") + F.lit(0.5)) / (
        F.col("t_cur") + F.lit(0.5) * F.col("n_b")
    )
    return (
        dense.join(totals, "event_type")
        .crossJoin(F.broadcast(n_buckets))
        .groupBy("event_type", "t_ref", "t_cur")
        .agg(
            F.round(
                F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6
            ).alias("psi")
        )
        .select(
            "event_type",
            "psi",
            F.col("t_ref").cast("long").alias("n_ref_events"),
            F.col("t_cur").cast("long").alias("n_cur_events"),
        )
        .orderBy("event_type")
    )


def stats_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the corpus's two categorical axes
    (document language x source): MI(nats), both marginal entropies,
    and the sqrt-normalized NMI — the dependence probe a curation
    pipeline runs to learn whether sources are language-skewed (NMI ~ 0
    means balanced sampling; ~1 means source determines language).

    Everything derives from exact BIGINT contingency counts — one
    groupBy(lang, source) bounded by the label-vocabulary product, two
    marginal rollups of THAT cell table (never a second scan), and a
    broadcast scalar N — so both engines evaluate identical doubles;
    the final sums run over tens of cells.  At 100 TB the single
    full-table aggregation is the only data-sized stage."""
    d = load_table(spark, "documents", sf_dir).select("lang", "source")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_xy"))
    nx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    ny = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    total = cells.agg(F.sum("n_xy").alias("n_docs"))
    mi = (
        cells.join(nx, "lang")
        .join(ny, "source")
        .crossJoin(F.broadcast(total))
        .agg(
            # the ratio is formed in doubles (never bigint x bigint —
            # n_xy * n_docs would overflow ANSI LONG at corpus scale),
            # in the same operation order as the oracle's `* 1.0` form
            F.sum(
                (F.col("n_xy") / F.col("n_docs"))
                * F.log(
                    (F.col("n_xy").cast("double") * F.col("n_docs"))
                    / (F.col("n_x").cast("double") * F.col("n_y"))
                )
            ).alias("mi_nats"),
            F.first("n_docs").alias("n_docs"),
        )
    )
    hx = (
        nx.crossJoin(F.broadcast(total))
        .agg(
            (-F.sum(
                (F.col("n_x") / F.col("n_docs"))
                * F.log(F.col("n_x") / F.col("n_docs"))
            )).alias("h_lang")
        )
    )
    hy = (
        ny.crossJoin(F.broadcast(total))
        .agg(
            (-F.sum(
                (F.col("n_y") / F.col("n_docs"))
                * F.log(F.col("n_y") / F.col("n_docs"))
            )).alias("h_source")
        )
    )
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .select(
            F.round("mi_nats", 6).alias("mi_nats"),
            F.round("h_lang", 6).alias("h_lang"),
            F.round("h_source", 6).alias("h_source"),
            F.round(
                F.col("mi_nats")
                / F.sqrt(F.col("h_lang") * F.col("h_source")),
                6,
            ).alias("nmi"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
    )


#: customers whose last order is within this many days of corpus end
#: are right-censored (possibly still active), not churned
KM_CENSOR_DAYS = 180


def orders_kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for customer lifetime (weeks between
    first and last order): the right-censoring-aware churn analysis a
    naive "average lifetime" silently biases (customers still ordering
    near corpus end haven't churned — dropping OR counting them as
    churned both distort).  A customer dies at t = duration_weeks if
    their last order predates corpus_end - 180 days; later last-orders
    are censored at their observed duration.  S(t) = prod_{s<=t}
    (1 - d_s / n_risk(s)), the standard product-limit estimator.

    Portability: the curve is computed on exact BIGINT (duration ->
    deaths, censored) cells — calendar-bounded, one groupBy from
    customer-sized data — and the product is exp of an ORDERED
    cumulative sum of ln factors, so both engines add identical
    doubles in the same order.  A terminal time where everyone at risk
    dies would put ln(0) in the chain (NULL in Spark, an error in
    DuckDB); such a row can only be the LAST one (no one survives past
    it), and both sides skip its factor and drop the row with the same
    n_risk > d guard."""
    o = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderdate")
    per_cust = o.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_ts"),
        F.max("o_orderdate").alias("last_ts"),
    )
    ref = o.agg(F.max("o_orderdate").alias("corpus_max"))
    lives = per_cust.crossJoin(F.broadcast(ref)).select(
        F.floor(
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts")) / F.lit(7)
        )
        .cast("long")
        .alias("duration_weeks"),
        (
            F.col("last_ts")
            < F.col("corpus_max") - F.expr(f"INTERVAL {KM_CENSOR_DAYS} DAYS")
        )
        .cast("long")
        .alias("churned"),
    )
    cells = lives.groupBy("duration_weeks").agg(
        F.sum("churned").alias("d_events"),
        F.sum(F.lit(1) - F.col("churned")).alias("c_censored"),
    )
    total = lives.agg(F.count(F.lit(1)).alias("n_custs"))
    w_prev = (
        Window.orderBy("duration_weeks")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.orderBy("duration_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risked = cells.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("n_custs")
        - F.coalesce(
            F.sum(F.col("d_events") + F.col("c_censored")).over(w_prev),
            F.lit(0),
        ),
    )
    # the ln factor is guarded (NULL, skipped by SUM) on the d == n_risk
    # terminal row — DuckDB raises on LN(0) and Spark yields NULL; the
    # row itself is dropped below, so the guard never changes a kept
    # survival value
    ln_factor = F.when(
        F.col("d_events") < F.col("n_risk"),
        F.log(F.lit(1.0) - F.col("d_events") / F.col("n_risk")),
    )
    surv = risked.withColumn(
        "survival", F.exp(F.sum(ln_factor).over(w_cum))
    )
    return (
        surv.where(F.col("n_risk") > F.col("d_events"))
        .select(
            "duration_weeks",
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d_events").cast("long").alias("d_events"),
            F.col("c_censored").cast("long").alias("c_censored"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("duration_weeks")
    )


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by their
    first-order quarter, each cohort's CUMULATIVE revenue per customer
    tracked by quarters-since-acquisition — the payback-period /
    retention-economics readout beside the count-based retention
    triangle (`events_retention_cohorts`) and the survival curve
    (`orders_kaplan_meier_churn`).

    Exactness: revenue aggregates through `dsum` (fixed-point
    micro-units) into exact decimals, and the cumulative is a decimal
    window sum over those exact cells, so every LTV value is
    partitioning-independent; the single division to per-customer
    happens once, at the end, in doubles.  Scale: one fact-sized join
    to the per-customer first-order table and one groupBy to
    (cohort, quarter) cells — calendar-bounded output, windows over
    cells only."""
    from database_peak_streaming_spark.operators.common import dsum

    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))

    def qnum(c: str):
        return F.year(c) * F.lit(4) + F.quarter(c) - F.lit(1)

    j = o.join(first, "o_custkey").select(
        qnum("first_dt").alias("cohort_q"),
        (qnum("o_orderdate") - qnum("first_dt")).alias("quarter_index"),
        "o_totalprice",
    )
    sizes = (
        first.select(qnum("first_dt").alias("cohort_q"))
        .groupBy("cohort_q")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    cells = j.groupBy("cohort_q", "quarter_index").agg(
        dsum("o_totalprice", "rev"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = (
        Window.partitionBy("cohort_q")
        .orderBy("quarter_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cells.withColumn("cum_rev", F.sum("rev").over(w))
    return (
        cum.join(sizes, "cohort_q")
        .select(
            F.concat(
                F.floor(F.col("cohort_q") / F.lit(4.0))
                .cast("long")
                .cast("string"),
                F.lit("-Q"),
                (F.col("cohort_q") % F.lit(4) + F.lit(1)).cast("string"),
            ).alias("cohort"),
            F.col("quarter_index").cast("long").alias("quarter_index"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_customers").cast("long").alias("n_customers"),
            # the two engines' DECIMAL->DOUBLE casts can differ by ~1
            # ulp at 8+ significant digits; the decimal is exactly
            # scale-6, so ROUND(cast, 6) collapses both casts onto the
            # identical grid-point double BEFORE any further arithmetic
            F.round(F.col("cum_rev").cast("double"), 6).alias(
                "cum_revenue"
            ),
            F.round(
                F.round(F.col("cum_rev").cast("double"), 6)
                / F.col("n_customers"),
                6,
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort", "quarter_index")
    )


def stats_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between the corpus's two categorical axes (document
    language x source) — the bounded [0, 1] effect-size companion to
    ``stats_mutual_information``'s NMI (chi-square answers "is there
    dependence?", V answers "how strong, on a scale comparable across
    table shapes?").  V = sqrt(chi2 / (N * (min(r, c) - 1))).

    Same scale discipline as the MI probe: one full-table groupBy to
    exact BIGINT contingency cells (bounded by the label-vocabulary
    product), marginals as rollups of the cell table, expected counts
    and chi-square contributions in doubles over tens of cells — the
    single data-sized stage is the first aggregation."""
    d = load_table(spark, "documents", sf_dir).select("lang", "source")
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n_xy"))
    nx = cells.groupBy("lang").agg(F.sum("n_xy").alias("n_x"))
    ny = cells.groupBy("source").agg(F.sum("n_xy").alias("n_y"))
    total = cells.agg(
        F.sum("n_xy").alias("n_docs"),
        F.count_distinct("lang").alias("n_r"),
        F.count_distinct("source").alias("n_c"),
    )
    chi2 = (
        cells.join(nx, "lang")
        .join(ny, "source")
        .crossJoin(F.broadcast(total))
        .agg(
            F.sum(
                F.pow(
                    F.col("n_xy")
                    - (F.col("n_x").cast("double") * F.col("n_y"))
                    / F.col("n_docs"),
                    F.lit(2.0),
                )
                / (
                    (F.col("n_x").cast("double") * F.col("n_y"))
                    / F.col("n_docs")
                )
            ).alias("chi2"),
            F.first("n_docs").alias("n_docs"),
            F.first("n_r").alias("n_r"),
            F.first("n_c").alias("n_c"),
        )
    )
    return chi2.select(
        F.round("chi2", 6).alias("chi2"),
        F.col("n_docs").cast("long").alias("n_docs"),
        ((F.col("n_r") * F.col("n_c")) - 1).cast("long").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n_docs")
                    * (F.least("n_r", "n_c").cast("double") - 1.0)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


def events_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of per-user activity, per event type — the
    continuous MLE (Clauset/Shalizi/Newman 2009, eq. 3.1 with the
    discrete -1/2 offset): ``alpha = 1 + n / sum ln(c_i / (x_min -
    1/2))`` over per-user event counts ``c_i`` with x_min = 1.  The
    one-number heavy-tail check a pipeline runs before trusting a
    mean: alpha <= 2 means the mean itself is tail-dominated.

    Shape: one (type, user) count aggregation (the only data-sized
    stage), then a per-type fold over user counts — exact BIGINT
    counts feed ln(2 * c), so every double input is bit-identical
    across engines and the sum runs over user-vocabulary-sized data."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("c").cast("long").alias("n_events"),
            F.sum(F.log(F.lit(2.0) * F.col("c"))).alias("_lnsum"),
        )
        .select(
            "event_type",
            "n_users",
            "n_events",
            F.round(
                F.lit(1.0) + F.col("n_users") / F.col("_lnsum"), 6
            ).alias("alpha_mle"),
        )
        .orderBy("event_type")
    )


def model_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration reliability table + Brier score — the
    evaluation pass run before trusting a quality/conversion classifier
    in a curation gate: scores bucketed into deciles, each reporting
    mean predicted probability vs the empirical positive rate (the two
    columns of a reliability diagram; a calibrated model tracks the
    diagonal), plus each bin's Brier contribution.

    The score is the same pinned sigmoid the UDF-matrix queries price
    (``functions/udfs._MODEL_A/_B`` over log1p(o_totalprice), here in
    its closed JVM form); the label is urgent/high order priority.
    Bins are FIXED-WIDTH score intervals [0, 0.1) .. [0.9, 1.0] — the
    standard reliability-diagram binning AND the scale-right one: bin
    assignment is a map-only expression on the rounded score (no
    global rank window), so the whole query is one scan plus a
    10-key rollup at any corpus size.  Bin membership compares
    identical rounded doubles in both engines."""
    from database_peak_streaming_spark.functions.udfs import (
        _MODEL_A,
        _MODEL_B,
    )

    o = load_table(spark, "orders", sf_dir)
    score = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.lit(_MODEL_A) * F.log1p("o_totalprice")
                    + F.lit(_MODEL_B)
                )
            )
        ),
        6,
    )
    label = (
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    )
    scored = o.select(score.alias("score"), label.alias("label"))
    bin_ = F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9))
    return (
        scored.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("score"), 6).alias("mean_predicted"),
            F.round(F.avg(F.col("label").cast("double")), 6).alias(
                "frac_positive"
            ),
            F.round(
                F.avg(
                    F.pow(F.col("score") - F.col("label"), F.lit(2.0))
                ),
                6,
            ).alias("brier"),
        )
        .orderBy("bin")
    )


def stats_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across the five event types' values — the
    "do these segments have the same mean?" omnibus test that precedes
    any per-segment drill-down, completing the hypothesis-test shelf
    beside the two-sample KS (``stats_ks_drift_by_type``), the
    proportion z (``ab_test_lift_ztest``) and the rank-sum U
    (``stats_mann_whitney``).  Emits N, k, the F statistic and the
    eta-squared effect size (SSB / SST).

    Hash-stability design: values are quantized onto the cent grid
    (``ROUND(value*100)`` — exact, the fixture's values are 2-decimal
    with <=4e-12 representation noise), so per-group n / sum(m) /
    sum(m^2) are exact BIGINTs.  The only doubles are the k=5
    per-group SSB/SSW terms, each computed from identical exact-int
    inputs by the identical IEEE expression in both engines; the final
    5-term sums carry ~1 ulp (~1e-8 at 1e8 magnitude) of order noise,
    far inside the 6-decimal canon grid.

    Scale: ONE data-sized aggregation (groupBy event_type over three
    partial-aggregable sums — map-side combine does almost all of it);
    everything after runs on k rows."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("m").alias("s1"),
        F.sum(F.col("m") * F.col("m")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("s1").alias("g1"),
        F.count(F.lit(1)).alias("k"),
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n", "k",
        (
            F.col("n_g")
            * F.pow(
                F.col("s1") / (F.lit(100.0) * F.col("n_g"))
                - F.col("g1") / (F.lit(100.0) * F.col("n")),
                F.lit(2.0),
            )
        ).alias("ssb_term"),
        (
            F.col("s2") / F.lit(10000.0)
            - (F.col("s1") * F.col("s1")) / (F.lit(10000.0) * F.col("n_g"))
        ).alias("ssw_term"),
    )
    return terms.agg(
        F.first("n").cast("long").alias("n_obs"),
        F.first("k").cast("long").alias("k_groups"),
        F.round(
            (F.sum("ssb_term") / (F.first("k") - F.lit(1)))
            / (F.sum("ssw_term") / (F.first("n") - F.first("k"))),
            6,
        ).alias("f_stat"),
        F.round(
            F.sum("ssb_term") / (F.sum("ssb_term") + F.sum("ssw_term")), 6
        ).alias("eta_sq"),
    )


def stats_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click vs purchase values) with the
    standard tie-corrected normal approximation — the distribution-free
    two-sample location test a pipeline reaches for when values are
    skewed enough that the t/z tests' mean is the wrong summary (cf.
    ``events_powerlaw_alpha``'s tail check).

    Exactness design: quantized values collapse to a VALUE-VOCABULARY
    table first (one groupBy: per distinct value, total count t and
    group-1 count t1), so midranks come from a window over ~50k rows
    max regardless of data size, as exact halves (cumulative exact
    count + (t+1)/2).  R1 = sum(t1 * midrank) sums half-grid doubles
    < 2^52 — EXACT in IEEE regardless of summation order — and the tie
    term sum(t^3 - t) is exact BIGINT, so U and z are identical
    doubles in both engines before the 6-decimal round.

    Scale: one data-sized groupBy (value vocabulary), one
    vocabulary-sized window, one fold."""
    ev = (
        load_table(spark, "events", sf_dir)
        .where(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("m"),
        )
    )
    vals = ev.groupBy("m").agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("t1"),
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "t",
        "t1",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0))
            + (F.col("t") + 1) / F.lit(2.0)
        ).alias("midrank"),
    )
    agg = ranked.agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * F.col("midrank")).alias("r1"),
        F.sum(
            F.col("t") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie3"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round(
            (u1 - F.col("n1") * F.col("n2") / F.lit(2.0))
            / F.sqrt(
                F.col("n1") * F.col("n2") / F.lit(12.0)
                * (
                    (F.col("n1") + F.col("n2") + 1)
                    - F.col("tie3")
                    / (
                        (F.col("n1") + F.col("n2"))
                        * (F.col("n1") + F.col("n2") - 1.0)
                    )
                )
            ),
            6,
        ).alias("z_stat"),
    )


QUERIES = {
    "events_funnel_ordered": events_funnel_ordered,
    "stats_anova_f": stats_anova_f,
    "stats_mann_whitney": stats_mann_whitney,
    "stats_cramers_v": stats_cramers_v,
    "events_powerlaw_alpha": events_powerlaw_alpha,
    "model_calibration_bins": model_calibration_bins,
    "events_top_action_trigrams": events_top_action_trigrams,
    "orders_revenue_gini": orders_revenue_gini,
    "ab_test_lift_ztest": ab_test_lift_ztest,
    "events_user_entropy": events_user_entropy,
    "orders_rfm_segmentation": orders_rfm_segmentation,
    "events_time_to_convert": events_time_to_convert,
    "events_dau_wau_mau": events_dau_wau_mau,
    "events_retention_cohorts": events_retention_cohorts,
    "events_markov_transitions": events_markov_transitions,
    "events_attribution_first_last": events_attribution_first_last,
    "events_attribution_position": events_attribution_position,
    "stats_ks_drift_by_type": stats_ks_drift_by_type,
    "stats_psi_value_drift": stats_psi_value_drift,
    "stats_wasserstein_drift": stats_wasserstein_drift,
    "stats_mutual_information": stats_mutual_information,
    "orders_kaplan_meier_churn": orders_kaplan_meier_churn,
    "orders_cohort_ltv": orders_cohort_ltv,
    "user_state_latest": user_state_latest,
    "sessionize_gap_ids": sessionize_gap_ids,
    "sessionize_dynamic_gap": sessionize_dynamic_gap,
    "mode_event_type_per_user": mode_event_type_per_user,
    "scd2_user_state_history": scd2_user_state_history,
}

ORACLE_SQL = {
    "events_top_action_trigrams": """
        WITH seq AS (
            SELECT LAG(event_type, 2) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS t1,
                   LAG(event_type, 1) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS t2,
                   event_type AS t3
            FROM events),
        grams AS (
            SELECT t1, t2, t3, COUNT(*) AS n
            FROM seq WHERE t1 IS NOT NULL
            GROUP BY t1, t2, t3),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM grams)
        SELECT t1, t2, t3, n,
               ROUND(n / n_total, 6) AS share
        FROM grams, tot
        ORDER BY n DESC, t1, t2, t3
        LIMIT 20
    """,
    "orders_revenue_gini": """
        WITH per_cust AS (
            SELECT n_name, o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name, o_custkey),
        ranked AS (
            SELECT n_name, rev,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                       ORDER BY rev, o_custkey) AS i
            FROM per_cust)
        SELECT n_name,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS total_rev,
               ROUND((2.0 * CAST(SUM(i * rev) AS DOUBLE))
                         / (COUNT(*) * CAST(SUM(rev) AS DOUBLE))
                     - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
        FROM ranked
        GROUP BY n_name
        ORDER BY n_name
    """,
    "ab_test_lift_ztest": """
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value > 99
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY user_id),
        arms AS (
            SELECT user_id % 2 AS arm, COUNT(*) AS n,
                   CAST(SUM(converted) AS BIGINT) AS conv
            FROM per_user GROUP BY 1),
        w AS (
            SELECT
                (SELECT n FROM arms WHERE arm = 0) AS n_a,
                (SELECT n FROM arms WHERE arm = 1) AS n_b,
                (SELECT conv FROM arms WHERE arm = 0) AS conv_a,
                (SELECT conv FROM arms WHERE arm = 1) AS conv_b)
        SELECT n_a, n_b, conv_a, conv_b,
               ROUND(conv_a / n_a, 6) AS rate_a,
               ROUND(conv_b / n_b, 6) AS rate_b,
               ROUND((conv_b / n_b - conv_a / n_a) / (conv_a / n_a), 6)
                   AS relative_lift,
               ROUND((conv_b / n_b - conv_a / n_a)
                     / SQRT(((conv_a + conv_b) / (n_a + n_b))
                            * (1 - (conv_a + conv_b) / (n_a + n_b))
                            * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score,
               ABS((conv_b / n_b - conv_a / n_a)
                   / SQRT(((conv_a + conv_b) / (n_a + n_b))
                          * (1 - (conv_a + conv_b) / (n_a + n_b))
                          * (1.0 / n_a + 1.0 / n_b))) > 1.96
                   AS significant_95
        FROM w
    """,
    "events_user_entropy": """
        WITH tc AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2),
        tot AS (SELECT user_id, SUM(n) AS n_total FROM tc GROUP BY 1),
        p AS (
            SELECT tc.user_id, tc.n / tot.n_total AS p
            FROM tc JOIN tot USING (user_id))
        SELECT user_id,
               COUNT(*) AS n_types,
               ROUND(-SUM(p * LN(p)), 6) AS entropy_nats
        FROM p
        GROUP BY user_id
        ORDER BY user_id
    """,
    "events_dau_wau_mau": """
        WITH day_user AS (
            SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
        spine AS (SELECT DISTINCT d AS spine_d FROM day_user),
        j AS (
            SELECT s.spine_d, du.d, du.user_id
            FROM spine s JOIN day_user du
              ON du.d <= s.spine_d AND du.d >= s.spine_d - 29)
        SELECT spine_d AS day,
               COUNT(DISTINCT CASE WHEN d = spine_d THEN user_id END) AS dau,
               COUNT(DISTINCT CASE WHEN d >= spine_d - 6 THEN user_id END)
                   AS wau,
               COUNT(DISTINCT user_id) AS mau,
               ROUND(COUNT(DISTINCT CASE WHEN d = spine_d THEN user_id END)
                     / COUNT(DISTINCT CASE WHEN d >= spine_d - 6
                                           THEN user_id END),
                     6) AS dau_wau_ratio
        FROM j
        GROUP BY spine_d
        ORDER BY spine_d
    """,
    "events_time_to_convert": """
        WITH fc AS (
            SELECT user_id, MIN(ts) AS first_click FROM events
            WHERE event_type = 'click' GROUP BY user_id),
        fb AS (
            SELECT user_id, MIN(ts) AS first_buy FROM events
            WHERE event_type = 'purchase' GROUP BY user_id),
        conv AS (
            SELECT hour(first_click) AS click_hour,
                   CAST(FLOOR(date_part('epoch', first_buy)) AS BIGINT)
                   - CAST(FLOOR(date_part('epoch', first_click)) AS BIGINT)
                       AS latency_s
            FROM fc JOIN fb USING (user_id)
            WHERE first_buy > first_click)
        SELECT click_hour,
               COUNT(*) AS n_converters,
               ROUND(QUANTILE_CONT(latency_s, 0.5), 6) AS median_latency_s,
               ROUND(QUANTILE_CONT(latency_s, 0.9), 6) AS p90_latency_s
        FROM conv
        GROUP BY click_hour
        ORDER BY click_hour
    """,
    "orders_rfm_segmentation": """
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(CAST(o_orderdate AS DATE)) AS last_order,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
            FROM orders GROUP BY o_custkey),
        rec AS (
            SELECT o_custkey, n_orders, spend,
                   date_diff('day', last_order,
                             (SELECT MAX(CAST(o_orderdate AS DATE))
                              FROM orders)) AS recency_days
            FROM per_cust),
        scored AS (
            SELECT o_custkey, n_orders, spend,
                   NTILE(4) OVER (ORDER BY recency_days, o_custkey)
                       AS r_score,
                   NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey)
                       AS f_score,
                   NTILE(4) OVER (ORDER BY spend DESC, o_custkey)
                       AS m_score
            FROM rec)
        SELECT r_score, f_score, m_score,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(spend) AS DOUBLE) / COUNT(*), 6) AS avg_spend
        FROM scored
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "events_attribution_first_last": """
        WITH conv AS (
            SELECT user_id, ts AS cts, event_id AS cid
            FROM (SELECT user_id, ts, event_id,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn
                  FROM events WHERE event_type = 'purchase')
            WHERE rn = 1),
        pre AS (
            SELECT e.user_id, e.event_type, e.ts, e.event_id
            FROM events e JOIN conv c USING (user_id)
            WHERE e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.cid)),
        att AS (
            SELECT user_id,
                   FIRST(event_type ORDER BY ts, event_id) AS first_touch,
                   LAST(event_type ORDER BY ts, event_id) AS last_touch
            FROM pre GROUP BY user_id)
        SELECT COALESCE(a.first_touch, 'none') AS first_touch,
               COALESCE(a.last_touch, 'none') AS last_touch,
               COUNT(*) AS n_users
        FROM conv c LEFT JOIN att a USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "orders_cohort_ltv": """
        WITH f AS (
            SELECT o_custkey, MIN(o_orderdate) AS first_dt
            FROM orders GROUP BY 1),
        j AS (
            SELECT (YEAR(f.first_dt) * 4 + QUARTER(f.first_dt) - 1)
                       AS cohort_q,
                   (YEAR(o.o_orderdate) * 4 + QUARTER(o.o_orderdate) - 1)
                   - (YEAR(f.first_dt) * 4 + QUARTER(f.first_dt) - 1)
                       AS quarter_index,
                   o.o_totalprice
            FROM orders o JOIN f USING (o_custkey)),
        sizes AS (
            SELECT (YEAR(first_dt) * 4 + QUARTER(first_dt) - 1)
                       AS cohort_q,
                   CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM f GROUP BY 1),
        cells AS (
            SELECT cohort_q, quarter_index,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM j GROUP BY 1, 2),
        cum AS (
            SELECT *, SUM(rev) OVER (
                PARTITION BY cohort_q ORDER BY quarter_index
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_rev
            FROM cells)
        SELECT CAST(CAST(FLOOR(cohort_q / 4.0) AS BIGINT) AS VARCHAR)
                   || '-Q' || CAST(cohort_q % 4 + 1 AS VARCHAR) AS cohort,
               CAST(quarter_index AS BIGINT) AS quarter_index,
               n_orders, n_customers,
               ROUND(CAST(cum_rev AS DOUBLE), 6) AS cum_revenue,
               ROUND(ROUND(CAST(cum_rev AS DOUBLE), 6) / n_customers, 6)
                   AS ltv_per_customer
        FROM cum JOIN sizes USING (cohort_q)
        ORDER BY cohort, quarter_index
    """,
    "orders_kaplan_meier_churn": """
        WITH pu AS (
            SELECT o_custkey, MIN(o_orderdate) AS first_ts,
                   MAX(o_orderdate) AS last_ts
            FROM orders GROUP BY 1),
        ref AS (SELECT MAX(o_orderdate) AS corpus_max FROM orders),
        lives AS (
            SELECT CAST(FLOOR(DATE_DIFF('day', CAST(first_ts AS DATE),
                                        CAST(last_ts AS DATE)) / 7.0)
                        AS BIGINT) AS duration_weeks,
                   CAST(CASE WHEN last_ts < corpus_max - INTERVAL 180 DAY
                             THEN 1 ELSE 0 END AS BIGINT) AS churned
            FROM pu CROSS JOIN ref),
        cells AS (
            SELECT duration_weeks,
                   CAST(SUM(churned) AS BIGINT) AS d_events,
                   CAST(SUM(1 - churned) AS BIGINT) AS c_censored
            FROM lives GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_custs FROM lives),
        risked AS (
            SELECT duration_weeks, d_events, c_censored,
                   n_custs - COALESCE(SUM(d_events + c_censored) OVER (
                       ORDER BY duration_weeks
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS n_risk
            FROM cells CROSS JOIN tot),
        surv AS (
            SELECT *,
                   EXP(SUM(CASE WHEN d_events < n_risk
                                THEN LN(1.0 - d_events / n_risk)
                                END) OVER (
                       ORDER BY duration_weeks
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)) AS survival
            FROM risked)
        SELECT duration_weeks,
               CAST(n_risk AS BIGINT) AS n_risk,
               d_events, c_censored,
               ROUND(survival, 6) AS survival
        FROM surv WHERE n_risk > d_events
        ORDER BY duration_weeks
    """,
    "stats_wasserstein_drift": """
        WITH ev AS (
            SELECT event_type, value,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e
            FROM events WHERE value IS NOT NULL),
        b AS (SELECT MIN(e) AS e_min, MAX(e) AS e_max FROM ev),
        sp AS (
            SELECT event_type, value,
                   CAST(CASE WHEN 2 * e < e_min + e_max
                             THEN 1 ELSE 0 END AS BIGINT) AS is_ref
            FROM ev CROSS JOIN b),
        g AS (
            SELECT value,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN is_ref ELSE 0 END) AS BIGINT) AS r_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN is_ref ELSE 0 END) AS BIGINT) AS r_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN is_ref ELSE 0 END) AS BIGINT) AS r_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN is_ref ELSE 0 END) AS BIGINT) AS r_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN is_ref ELSE 0 END) AS BIGINT) AS r_view,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 - is_ref ELSE 0 END) AS BIGINT) AS c_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 - is_ref ELSE 0 END) AS BIGINT) AS c_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 - is_ref ELSE 0 END) AS BIGINT) AS c_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 - is_ref ELSE 0 END) AS BIGINT) AS c_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 - is_ref ELSE 0 END) AS BIGINT) AS c_view
            FROM sp GROUP BY value),
        cum AS (
            SELECT value,
                   COALESCE(LEAD(value) OVER (ORDER BY value) - value, 0)
                       AS gap,
                   SUM(r_click) OVER w AS cr_click,
                   SUM(r_error) OVER w AS cr_error,
                   SUM(r_purchase) OVER w AS cr_purchase,
                   SUM(r_signup) OVER w AS cr_signup,
                   SUM(r_view) OVER w AS cr_view,
                   SUM(c_click) OVER w AS cc_click,
                   SUM(c_error) OVER w AS cc_error,
                   SUM(c_purchase) OVER w AS cc_purchase,
                   SUM(c_signup) OVER w AS cc_signup,
                   SUM(c_view) OVER w AS cc_view
            FROM g
            WINDOW w AS (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        longf AS (
            SELECT 'click' AS event_type, gap, cr_click AS cum_ref,
                   cc_click AS cum_cur FROM cum
            UNION ALL
            SELECT 'error', gap, cr_error, cc_error FROM cum
            UNION ALL
            SELECT 'purchase', gap, cr_purchase, cc_purchase FROM cum
            UNION ALL
            SELECT 'signup', gap, cr_signup, cc_signup FROM cum
            UNION ALL
            SELECT 'view', gap, cr_view, cc_view FROM cum),
        nt AS (
            SELECT event_type,
                   CAST(SUM(is_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(1 - is_ref) AS BIGINT) AS n_cur
            FROM sp GROUP BY event_type)
        SELECT l.event_type,
               ROUND(SUM(ABS(cum_ref * 1.0 / n_ref
                             - cum_cur * 1.0 / n_cur) * gap), 6)
                   AS w1_distance,
               n_ref AS n_ref_events,
               n_cur AS n_cur_events
        FROM longf l JOIN nt USING (event_type)
        GROUP BY l.event_type, n_ref, n_cur
        ORDER BY l.event_type
    """,
    "stats_psi_value_drift": """
        WITH ev AS (
            SELECT event_type,
                   CAST(FLOOR(value / 50.0) AS BIGINT) AS bucket,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS e
            FROM events WHERE value IS NOT NULL),
        b AS (SELECT MIN(e) AS e_min, MAX(e) AS e_max FROM ev),
        cells AS (
            SELECT event_type, bucket,
                   CAST(SUM(CASE WHEN 2 * e < e_min + e_max
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN 2 * e < e_min + e_max
                                 THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
            FROM ev CROSS JOIN b GROUP BY 1, 2),
        nb AS (SELECT CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_b
               FROM cells),
        dense AS (
            SELECT t.event_type, k.bucket,
                   COALESCE(c.n_ref, 0) AS n_ref,
                   COALESCE(c.n_cur, 0) AS n_cur
            FROM (SELECT DISTINCT event_type FROM cells) t
            CROSS JOIN (SELECT DISTINCT bucket FROM cells) k
            LEFT JOIN cells c
              ON c.event_type = t.event_type AND c.bucket = k.bucket),
        tot AS (
            SELECT event_type,
                   CAST(SUM(n_ref) AS BIGINT) AS t_ref,
                   CAST(SUM(n_cur) AS BIGINT) AS t_cur
            FROM dense GROUP BY 1)
        SELECT d.event_type,
               ROUND(SUM(
                   ((n_cur + 0.5) / (t_cur + 0.5 * n_b)
                    - (n_ref + 0.5) / (t_ref + 0.5 * n_b))
                   * LN(((n_cur + 0.5) / (t_cur + 0.5 * n_b))
                        / ((n_ref + 0.5) / (t_ref + 0.5 * n_b)))
               ), 6) AS psi,
               t_ref AS n_ref_events,
               t_cur AS n_cur_events
        FROM dense d JOIN tot USING (event_type) CROSS JOIN nb
        GROUP BY d.event_type, t_ref, t_cur
        ORDER BY d.event_type
    """,
    "stats_mutual_information": """
        WITH cells AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
            FROM documents GROUP BY 1, 2),
        nx AS (SELECT lang, CAST(SUM(n_xy) AS BIGINT) AS n_x
               FROM cells GROUP BY 1),
        ny AS (SELECT source, CAST(SUM(n_xy) AS BIGINT) AS n_y
               FROM cells GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_xy) AS BIGINT) AS n_docs FROM cells),
        mi AS (
            SELECT SUM((n_xy * 1.0 / n_docs)
                       * LN((n_xy * 1.0 * n_docs) / (n_x * 1.0 * n_y)))
                       AS mi_nats,
                   FIRST(n_docs) AS n_docs
            FROM cells JOIN nx USING (lang) JOIN ny USING (source)
            CROSS JOIN tot),
        hx AS (
            SELECT -SUM((n_x * 1.0 / n_docs)
                        * LN(n_x * 1.0 / n_docs)) AS h_lang
            FROM nx CROSS JOIN tot),
        hy AS (
            SELECT -SUM((n_y * 1.0 / n_docs)
                        * LN(n_y * 1.0 / n_docs)) AS h_source
            FROM ny CROSS JOIN tot)
        SELECT ROUND(mi_nats, 6) AS mi_nats,
               ROUND(h_lang, 6) AS h_lang,
               ROUND(h_source, 6) AS h_source,
               ROUND(mi_nats / SQRT(h_lang * h_source), 6) AS nmi,
               n_docs
        FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
    "stats_ks_drift_by_type": """
        WITH ev AS (
            SELECT event_type, value FROM events WHERE value IS NOT NULL),
        g AS (
            SELECT value,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       AS c_click,
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       AS c_error,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS c_purchase,
                   SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                       AS c_signup,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       AS c_view,
                   COUNT(*) AS c_all
            FROM ev GROUP BY value),
        cum AS (
            SELECT value,
                   SUM(c_click) OVER w AS cum_click,
                   SUM(c_error) OVER w AS cum_error,
                   SUM(c_purchase) OVER w AS cum_purchase,
                   SUM(c_signup) OVER w AS cum_signup,
                   SUM(c_view) OVER w AS cum_view,
                   SUM(c_all) OVER w AS cum_all
            FROM g
            WINDOW w AS (ORDER BY value
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        long AS (
            SELECT 'click' AS event_type, cum_click AS cum_t, cum_all FROM cum
            UNION ALL
            SELECT 'error', cum_error, cum_all FROM cum
            UNION ALL
            SELECT 'purchase', cum_purchase, cum_all FROM cum
            UNION ALL
            SELECT 'signup', cum_signup, cum_all FROM cum
            UNION ALL
            SELECT 'view', cum_view, cum_all FROM cum),
        nt AS (
            SELECT event_type, COUNT(*) AS n_t FROM ev GROUP BY event_type),
        tot AS (SELECT COUNT(*) AS n_all FROM ev)
        SELECT l.event_type,
               ROUND(MAX(ABS(l.cum_t * 1.0 / nt.n_t
                             - l.cum_all * 1.0 / tot.n_all)), 6) AS ks_d,
               nt.n_t AS n_events
        FROM long l JOIN nt USING (event_type) CROSS JOIN tot
        GROUP BY l.event_type, nt.n_t
        ORDER BY l.event_type
    """,
    "events_attribution_position": """
        WITH conv AS (
            SELECT user_id, ts AS cts, event_id AS cid
            FROM (SELECT user_id, ts, event_id,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS rn
                  FROM events WHERE event_type = 'purchase')
            WHERE rn = 1),
        pre AS (
            SELECT e.user_id, e.event_type,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id
                                      ORDER BY e.ts, e.event_id) AS pos,
                   COUNT(*) OVER (PARTITION BY e.user_id) AS n
            FROM events e JOIN conv c USING (user_id)
            WHERE e.ts < c.cts OR (e.ts = c.cts AND e.event_id < c.cid)),
        credit AS (
            SELECT event_type,
                   CASE WHEN n = 1 THEN 1.0
                        WHEN n = 2 THEN 0.5
                        WHEN pos = 1 OR pos = n THEN 0.4
                        ELSE 0.2 / (n - 2) END AS w
            FROM pre)
        SELECT event_type AS channel,
               ROUND(CAST(SUM(CAST(w AS DECIMAL(28, 6))) AS DOUBLE), 6)
                   AS total_credit,
               COUNT(*) AS n_touches
        FROM credit
        GROUP BY channel
        ORDER BY channel
    """,
    "events_markov_transitions": """
        WITH seq AS (
            SELECT event_type AS next_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events),
        t AS (
            SELECT prev_type, next_type, COUNT(*) AS n_transitions
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2)
        SELECT prev_type, next_type, n_transitions,
               ROUND(n_transitions / SUM(n_transitions)
                         OVER (PARTITION BY prev_type), 6) AS prob
        FROM t
        ORDER BY prev_type, next_type
    """,
    "events_retention_cohorts": """
        WITH cohort AS (
            SELECT user_id,
                   CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
            FROM events GROUP BY user_id),
        active AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events)
        SELECT c.cohort_week,
               CAST(date_diff('day', c.cohort_week, a.week) // 7 AS INT)
                   AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active_users
        FROM active a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "user_state_latest": """
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(ARG_MAX(value, ts), 6) AS last_value,
               MAX(ts) AS last_ts
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    "scd2_user_state_history": """
        WITH marked AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER w AS prev_type
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        changes AS (
            SELECT user_id, event_type, ts, event_id FROM marked
            WHERE prev_type IS NULL OR event_type <> prev_type)
        SELECT user_id,
               event_type AS state,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               (LEAD(ts) OVER w IS NULL) AS is_current,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
        FROM changes
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, version
    """,
    "events_funnel_ordered": """
        WITH t1 AS (
            SELECT user_id, MIN(ts) AS t_signup FROM events
            WHERE event_type = 'signup' GROUP BY user_id),
        t2 AS (
            SELECT e.user_id, MIN(e.ts) AS t_view
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'view' AND e.ts > t1.t_signup
            GROUP BY e.user_id),
        t3 AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = 'click' AND e.ts > t2.t_view
            GROUP BY e.user_id),
        t4 AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN t3 ON e.user_id = t3.user_id
            WHERE e.event_type = 'purchase' AND e.ts > t3.t_click
            GROUP BY e.user_id)
        SELECT '1_signup' AS stage, COUNT(*) AS n_users FROM t1
        UNION ALL SELECT '2_view', COUNT(*) FROM t2
        UNION ALL SELECT '3_click', COUNT(*) FROM t3
        UNION ALL SELECT '4_purchase', COUNT(*) FROM t4
        ORDER BY stage
    """,
    "sessionize_dynamic_gap": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type, value,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                                - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT)
                                > (CASE WHEN LAG(event_type) OVER w = 'purchase'
                                        THEN {SESSION_GAP_AFTER_PURCHASE_S}
                                        ELSE {SESSION_GAP_S} END)
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        with_id AS (
            SELECT user_id, ts, event_id, event_type, value,
                   CAST(SUM(new_sess) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_idx
            FROM flagged)
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6))) AS DOUBLE), 6)
                   AS total_value
        FROM with_id
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """,
    "sessionize_gap_ids": f"""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                             - CAST(FLOOR(EPOCH(LAG(ts) OVER w)) AS BIGINT)
                             > {SESSION_GAP_S}
                             OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        with_id AS (
            SELECT user_id, ts, value,
                   CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS session_idx
            FROM flagged)
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 6))) AS DOUBLE), 6)
                   AS total_value
        FROM with_id
        GROUP BY user_id, session_idx
        ORDER BY user_id, session_idx
    """,
    "mode_event_type_per_user": """
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY user_id, event_type),
        ranked AS (
            SELECT user_id, event_type, n,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY n DESC, event_type) AS rn
            FROM counts)
        SELECT user_id, event_type AS modal_type, n
        FROM ranked WHERE rn = 1 ORDER BY user_id
    """,
}

ORACLE_SQL["stats_cramers_v"] = """
    WITH cells AS (
        SELECT lang, source, COUNT(*) AS n_xy
        FROM documents GROUP BY lang, source),
    nx AS (SELECT lang, SUM(n_xy) AS n_x FROM cells GROUP BY lang),
    ny AS (SELECT source, SUM(n_xy) AS n_y FROM cells GROUP BY source),
    total AS (
        SELECT SUM(n_xy) AS n_docs,
               COUNT(DISTINCT lang) AS n_r,
               COUNT(DISTINCT source) AS n_c
        FROM cells),
    chi AS (
        SELECT SUM(POW(n_xy - (n_x * 1.0 * n_y) / n_docs, 2.0)
                   / ((n_x * 1.0 * n_y) / n_docs)) AS chi2,
               ANY_VALUE(n_docs) AS n_docs,
               ANY_VALUE(n_r) AS n_r,
               ANY_VALUE(n_c) AS n_c
        FROM cells
        JOIN nx USING (lang)
        JOIN ny USING (source)
        CROSS JOIN total)
    SELECT ROUND(chi2, 6) AS chi2,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_r * n_c - 1 AS BIGINT) AS dof,
           ROUND(SQRT(chi2 / (n_docs * (LEAST(n_r, n_c) * 1.0 - 1.0))), 6)
               AS cramers_v
    FROM chi
"""

ORACLE_SQL["events_powerlaw_alpha"] = """
    WITH per_user AS (
        SELECT event_type, user_id, COUNT(*) AS c
        FROM events GROUP BY event_type, user_id)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           ROUND(1.0 + COUNT(*) / SUM(LN(2.0 * c)), 6) AS alpha_mle
    FROM per_user
    GROUP BY event_type
    ORDER BY event_type
"""

ORACLE_SQL["model_calibration_bins"] = """
    WITH scored AS (
        SELECT ROUND(1.0 / (1.0 + EXP(-(0.35 * LN(1.0 + o_totalprice)
                                        + -2.0))), 6) AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label
        FROM orders),
    binned AS (
        SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
               score, label
        FROM scored)
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(AVG(score), 6) AS mean_predicted,
           ROUND(AVG(CAST(label AS DOUBLE)), 6) AS frac_positive,
           ROUND(AVG(POW(score - label, 2.0)), 6) AS brier
    FROM binned
    GROUP BY bin
    ORDER BY bin
"""

ORACLE_SQL["stats_anova_f"] = """
    WITH q AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    g AS (
        SELECT event_type, COUNT(*) AS n_g, SUM(m) AS s1, SUM(m * m) AS s2
        FROM q GROUP BY event_type),
    tot AS (SELECT SUM(n_g) AS n, SUM(s1) AS g1, COUNT(*) AS k FROM g),
    terms AS (
        SELECT n, k,
               n_g * POW(s1 / (100.0 * n_g) - g1 / (100.0 * n), 2.0)
                   AS ssb_term,
               s2 / 10000.0 - (s1 * s1) / (10000.0 * n_g) AS ssw_term
        FROM g CROSS JOIN tot)
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_obs,
           CAST(ANY_VALUE(k) AS BIGINT) AS k_groups,
           ROUND((SUM(ssb_term) / (ANY_VALUE(k) - 1))
                 / (SUM(ssw_term) / (ANY_VALUE(n) - ANY_VALUE(k))), 6)
               AS f_stat,
           ROUND(SUM(ssb_term) / (SUM(ssb_term) + SUM(ssw_term)), 6)
               AS eta_sq
    FROM terms
"""

ORACLE_SQL["stats_mann_whitney"] = """
    WITH ev AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events WHERE event_type IN ('click', 'purchase')),
    vals AS (
        SELECT m, COUNT(*) AS t,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t1
        FROM ev GROUP BY m),
    ranked AS (
        SELECT t, t1,
               COALESCE(SUM(t) OVER (ORDER BY m ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
        FROM vals),
    agg AS (
        SELECT CAST(SUM(t1) AS BIGINT) AS n1,
               CAST(SUM(t - t1) AS BIGINT) AS n2,
               SUM(t1 * midrank) AS r1,
               SUM(t * t * t - t) AS tie3
        FROM ranked)
    SELECT n1, n2,
           ROUND(r1 - n1 * (n1 + 1) / 2.0, 6) AS u1,
           ROUND(((r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0)
                 / SQRT(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - tie3 / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
               AS z_stat
    FROM agg
"""


def events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of CONSECUTIVE active days per user — the classic
    gaps-and-islands engagement metric (daily-active streaks), built
    from the textbook identity: within a user's sorted distinct active
    days, day_number - row_number is constant exactly along a
    consecutive run, so one window pass groups days into islands and
    one count per island measures every streak.  The islands form
    beside `sessionize_gap_ids` (time-gap islands) and
    `intervals_merge_spans` (interval islands); this is the calendar
    flavor retention dashboards actually report.

    Scale: distinct (user, day) is one data-sized groupBy; the window
    and island count run on user-day rows (bounded by users x calendar)
    keyed by user — no skew beyond a user's day count, which the
    calendar bounds.  Everything is exact integer arithmetic.

    Ties: the longest streak per user picks the EARLIEST start when two
    streaks tie, so the winner is engine-stable."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("g"),
    )
    streaks = islands.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start")
    )
    w_pick = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start").asc()
    )
    return (
        streaks.withColumn("rk", F.row_number().over(w_pick))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.max(F.when(F.col("rk") == 1, F.col("len"))).cast("long").alias(
                "longest_streak"
            ),
            F.max(F.when(F.col("rk") == 1, F.col("start"))).alias(
                "longest_start"
            ),
        )
        .orderBy("user_id")
    )


QUERIES["events_longest_streak"] = events_longest_streak
ORACLE_SQL["events_longest_streak"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    islands AS (
        SELECT user_id, day,
               CAST(day - DATE '1970-01-01' AS BIGINT)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                   AS g
        FROM days),
    streaks AS (
        SELECT user_id, g, COUNT(*) AS len, MIN(day) AS start
        FROM islands GROUP BY user_id, g),
    picked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY len DESC, start) AS rk
        FROM streaks)
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(CASE WHEN rk = 1 THEN len END) AS BIGINT)
               AS longest_streak,
           MAX(CASE WHEN rk = 1 THEN start END) AS longest_start
    FROM picked
    GROUP BY user_id
    ORDER BY user_id
"""


def events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWTH ACCOUNTING (the Social Capital / a16z weekly-active
    decomposition): every week's active users split into NEW (first
    week ever), RETAINED (also active the previous week) and
    RESURRECTED (active before, but not last week), plus the CHURNED
    count (active last week, gone this week) and the quick ratio
    (new + resurrected) / churned — the standard product-health
    decomposition a DAU/WAU/MAU rollup (`events_dau_wau_mau`) cannot
    answer because it never classifies the FLOW between states.

    Shape: distinct (user, week) once, then one per-user lag/lead
    window classifies every transition; churn is attributed to the
    week AFTER the last active week (the standard convention).  All
    counts are exact; weeks are ISO date_trunc boundaries identical in
    both engines.

    Scale: the groupBy and the user-keyed window are the only
    data-sized stages; the weekly rollup is calendar-bounded."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    uw = ev.select(
        "user_id",
        F.to_date(F.date_trunc("week", F.col("ts"))).alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    flagged = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_w"),
        F.lead("week").over(w).alias("next_w"),
        F.min("week").over(
            Window.partitionBy("user_id").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("first_w"),
    )
    states = flagged.select(
        "week",
        F.when(F.col("week") == F.col("first_w"), 1)
        .otherwise(0)
        .alias("is_new"),
        F.when(F.col("prev_w") == F.date_sub(F.col("week"), 7), 1)
        .otherwise(0)
        .alias("is_retained"),
        F.when(
            (F.col("week") != F.col("first_w"))
            & (
                F.col("prev_w").isNull()
                | (F.col("prev_w") < F.date_sub(F.col("week"), 7))
            ),
            1,
        )
        .otherwise(0)
        .alias("is_resurrected"),
    )
    weekly = states.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum("is_retained").cast("long").alias("n_retained"),
        F.sum("is_resurrected").cast("long").alias("n_resurrected"),
    )
    churn = (
        flagged.where(
            F.col("next_w").isNull()
            | (F.col("next_w") > F.date_add(F.col("week"), 7))
        )
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        weekly.join(churn, "week", "left")
        .select(
            "week",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("long")
            .alias("n_churned"),
            F.round(
                (F.col("n_new") + F.col("n_resurrected"))
                / F.nullif(
                    F.coalesce(F.col("n_churned"), F.lit(0)).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("quick_ratio"),
        )
        .orderBy("week")
    )


QUERIES["events_growth_accounting"] = events_growth_accounting
ORACLE_SQL["events_growth_accounting"] = """
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(DATE_TRUNC('week', ts) AS DATE) AS week
        FROM events),
    flagged AS (
        SELECT user_id, week,
               LAG(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS prev_w,
               LEAD(week) OVER (PARTITION BY user_id ORDER BY week)
                   AS next_w,
               MIN(week) OVER (PARTITION BY user_id) AS first_w
        FROM uw),
    weekly AS (
        SELECT week,
               CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN week = first_w THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(SUM(CASE WHEN prev_w = week - INTERVAL 7 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
               CAST(SUM(CASE WHEN week <> first_w
                              AND (prev_w IS NULL
                                   OR prev_w < week - INTERVAL 7 DAY)
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_resurrected
        FROM flagged GROUP BY week),
    churn AS (
        SELECT CAST(week + INTERVAL 7 DAY AS DATE) AS week,
               CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM flagged
        WHERE next_w IS NULL OR next_w > week + INTERVAL 7 DAY
        GROUP BY CAST(week + INTERVAL 7 DAY AS DATE))
    SELECT weekly.week, n_active, n_new, n_retained, n_resurrected,
           CAST(COALESCE(n_churned, 0) AS BIGINT) AS n_churned,
           ROUND((n_new + n_resurrected)
                 / NULLIF(CAST(COALESCE(n_churned, 0) AS DOUBLE), 0.0),
                 6) AS quick_ratio
    FROM weekly LEFT JOIN churn ON churn.week = weekly.week
    ORDER BY weekly.week
"""


def revenue_pvm_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRICE-VOLUME-MIX decomposition of the 1997 -> 1998 revenue change
    per part class — the FP&A variance-analysis standard: for each
    class, delta revenue splits into a PRICE effect ((p1 - p0) * q1), a
    VOLUME effect (p0 * q0 * (T1/T0 - 1): what scaling last year's
    quantities to this year's total volume would have done) and a MIX
    effect (p0 * (q1 - q0 * T1/T0): the shift of share between
    classes) — the three terms sum exactly to the revenue delta per
    class (pinned by test), which is what makes the decomposition an
    audit rather than a narrative.

    Scale: ONE (class, year) aggregation of exact quantities and
    dsum-exact revenue; the decomposition runs on |classes| x 2 cells.
    Every effect is the identical IEEE tree over exact inputs in both
    engines."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey",
        F.split(F.col("p_type"), " ").getItem(0).alias("part_class"),
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .where(F.year("l_shipdate").isin(1997, 1998))
        .select(
            "part_class",
            F.year("l_shipdate").alias("yr"),
            F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100,
                0,
            )
            .cast("long")
            .alias("rev_cents"),
        )
    )
    cells = j.groupBy("part_class", "yr").agg(
        F.sum("qty").alias("q"), F.sum("rev_cents").alias("rc")
    )
    c0 = cells.where(F.col("yr") == 1997).select(
        "part_class", F.col("q").alias("q0"), F.col("rc").alias("rc0")
    )
    c1 = cells.where(F.col("yr") == 1998).select(
        "part_class", F.col("q").alias("q1"), F.col("rc").alias("rc1")
    )
    tot = cells.groupBy("yr").agg(F.sum("q").alias("t"))
    t0 = tot.where(F.col("yr") == 1997).select(F.col("t").alias("t0"))
    t1 = tot.where(F.col("yr") == 1998).select(F.col("t").alias("t1"))
    b = (
        c0.join(c1, "part_class")
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
    )
    p0 = F.col("rc0") / (100.0 * F.col("q0"))
    p1 = F.col("rc1") / (100.0 * F.col("q1"))
    growth = F.col("t1").cast("double") / F.col("t0")
    price_eff = (p1 - p0) * F.col("q1")
    volume_eff = p0 * F.col("q0") * (growth - 1.0)
    mix_eff = p0 * (F.col("q1") - F.col("q0") * growth)
    return (
        b.select(
            "part_class",
            F.col("q0").cast("long").alias("qty_1997"),
            F.col("q1").cast("long").alias("qty_1998"),
            F.round(F.col("rc0") / 100.0, 6).alias("rev_1997"),
            F.round(F.col("rc1") / 100.0, 6).alias("rev_1998"),
            F.round(price_eff, 6).alias("price_effect"),
            F.round(volume_eff, 6).alias("volume_effect"),
            F.round(mix_eff, 6).alias("mix_effect"),
        )
        .orderBy("part_class")
    )


QUERIES["revenue_pvm_decomposition"] = revenue_pvm_decomposition
ORACLE_SQL["revenue_pvm_decomposition"] = """
    WITH j AS (
        SELECT STRING_SPLIT(p.p_type, ' ')[1] AS part_class,
               EXTRACT(YEAR FROM l.l_shipdate) AS yr,
               CAST(ROUND(l.l_quantity, 0) AS BIGINT) AS qty,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                    AS BIGINT) AS rev_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1997, 1998)),
    cells AS (
        SELECT part_class, yr, SUM(qty) AS q, SUM(rev_cents) AS rc
        FROM j GROUP BY part_class, yr),
    c0 AS (SELECT part_class, q AS q0, rc AS rc0 FROM cells
           WHERE yr = 1997),
    c1 AS (SELECT part_class, q AS q1, rc AS rc1 FROM cells
           WHERE yr = 1998),
    t0 AS (SELECT SUM(q) AS t0 FROM cells WHERE yr = 1997),
    t1 AS (SELECT SUM(q) AS t1 FROM cells WHERE yr = 1998),
    b AS (
        SELECT * FROM c0 JOIN c1 USING (part_class)
        CROSS JOIN t0 CROSS JOIN t1)
    SELECT part_class,
           CAST(q0 AS BIGINT) AS qty_1997,
           CAST(q1 AS BIGINT) AS qty_1998,
           ROUND(rc0 / 100.0, 6) AS rev_1997,
           ROUND(rc1 / 100.0, 6) AS rev_1998,
           ROUND((rc1 / (100.0 * q1) - rc0 / (100.0 * q0)) * q1, 6)
               AS price_effect,
           ROUND(rc0 / (100.0 * q0) * q0
                 * (CAST(t1 AS DOUBLE) / t0 - 1.0), 6) AS volume_effect,
           ROUND(rc0 / (100.0 * q0)
                 * (q1 - q0 * (CAST(t1 AS DOUBLE) / t0)), 6) AS mix_effect
    FROM b
    ORDER BY part_class
"""


def stats_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test — one-way ANOVA on |x - group MEDIAN| —
    the robust homogeneity-of-VARIANCE check that should precede
    ``stats_anova_f`` (classic ANOVA assumes equal variances; this is
    the test of that assumption that stays valid under non-normality,
    unlike Levene's mean-centred form).  Emits N, k and the BF F
    statistic over the five event types' value spreads.

    Hash-stability: values ride the cent grid (exact longs); the group
    median of longs interpolates to an exact .0/.5 double in both
    engines, so |m - med| is float-exact and only the final z-sums
    carry unordered-accumulation noise (~1e-12 relative, absorbed by
    6-decimal rounding).  Scale: one groupBy for medians (k-bounded
    output, broadcast back), one data-sized aggregation for the z
    moments — same two-pass shape as the robust-outlier window ops."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(m, 0.5)").alias("med")
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("m") - F.col("med")).alias("z")
    )
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        F.sum("s1").alias("g1"),
        F.count(F.lit(1)).alias("k"),
    )
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n", "k",
        (
            F.col("n_g")
            * F.pow(
                F.col("s1") / F.col("n_g") - F.col("g1") / F.col("n"),
                F.lit(2.0),
            )
        ).alias("ssb_term"),
        (
            F.col("s2") - (F.col("s1") * F.col("s1")) / F.col("n_g")
        ).alias("ssw_term"),
    )
    return terms.agg(
        F.first("n").cast("long").alias("n_obs"),
        F.first("k").cast("long").alias("k_groups"),
        F.round(
            (F.sum("ssb_term") / (F.first("k") - F.lit(1)))
            / (F.sum("ssw_term") / (F.first("n") - F.first("k"))),
            6,
        ).alias("bf_stat"),
    )


QUERIES["stats_brown_forsythe"] = stats_brown_forsythe
ORACLE_SQL["stats_brown_forsythe"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    med AS (
        SELECT event_type, MEDIAN(m) AS med FROM ev GROUP BY event_type),
    z AS (
        SELECT ev.event_type, ABS(ev.m - med.med) AS z
        FROM ev JOIN med USING (event_type)),
    g AS (
        SELECT event_type, COUNT(*) AS n_g, SUM(z) AS s1, SUM(z * z) AS s2
        FROM z GROUP BY event_type),
    tot AS (
        SELECT SUM(n_g) AS n, SUM(s1) AS g1, COUNT(*) AS k FROM g),
    terms AS (
        SELECT n, k,
               n_g * POW(s1 / n_g - g1 / n, 2) AS ssb_term,
               s2 - (s1 * s1) / n_g AS ssw_term
        FROM g CROSS JOIN tot)
    SELECT CAST(MAX(n) AS BIGINT) AS n_obs,
           CAST(MAX(k) AS BIGINT) AS k_groups,
           ROUND((SUM(ssb_term) / (MAX(k) - 1))
                 / (SUM(ssw_term) / (MAX(n) - MAX(k))), 6) AS bf_stat
    FROM terms
"""


def events_sequence_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex over per-user event SEQUENCES — the MATCH_RECOGNIZE /
    funnel-pattern primitive: encode each user's time-ordered event
    stream as a symbol string (one initial per event type) and run
    ordinary regular expressions over it.  Counts the exact
    view->click->purchase motif ('vcp'), the view->purchase adjacency
    ('vp'), and the loose funnel 'v.*c.*p' per user.  This is how
    sequence-pattern queries compile to a scan engine without a CEP
    operator: ORDER within user + string encode + regex, all engine-
    native.

    Scale: the only shuffle is the per-user groupBy; each user's
    symbol string is events-per-user bytes (bounded by session
    activity, NOT corpus size), so the regex stage is a map over
    ~|users| short strings.  The sort is per-group (array_sort on
    (ts, event_id, symbol) structs), never global.  Determinism:
    event_id breaks timestamp ties, so the encoded string is unique,
    and all outputs are integers."""
    ev = load_table(spark, "events", sf_dir)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("sym"),
            )
        )
    )
    per = (
        ev.groupBy("user_id")
        .agg(arr.alias("seq"))
        .select(
            "user_id",
            F.array_join(
                F.transform(F.col("seq"), lambda x: x["sym"]), ""
            ).alias("path"),
        )
    )
    return per.select(
        "user_id",
        F.length("path").cast("long").alias("path_len"),
        F.regexp_count(F.col("path"), F.lit("vcp")).cast("long").alias("n_vcp"),
        F.regexp_count(F.col("path"), F.lit("vp")).cast("long").alias("n_vp"),
        F.col("path").rlike("v.*c.*p").cast("long").alias("funnel_vcp"),
    ).orderBy(F.desc("n_vcp"), "user_id")


QUERIES["events_sequence_regex"] = events_sequence_regex
ORACLE_SQL["events_sequence_regex"] = """
    WITH per AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id)
    SELECT user_id,
           CAST(LENGTH(path) AS BIGINT) AS path_len,
           CAST(LEN(REGEXP_EXTRACT_ALL(path, 'vcp')) AS BIGINT) AS n_vcp,
           CAST(LEN(REGEXP_EXTRACT_ALL(path, 'vp')) AS BIGINT) AS n_vp,
           CAST(REGEXP_MATCHES(path, 'v.*c.*p') AS BIGINT) AS funnel_vcp
    FROM per
    ORDER BY n_vcp DESC, user_id
"""


def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join of a fact stream against the SCD2 dimension —
    the canonical warehouse join: each purchase fact picks up the
    dimension version that was valid AT its timestamp
    (valid_from <= ts < valid_to, open-ended current rows match
    everything after valid_from).  Facts that themselves opened a
    version match that version; a version closed exactly at the fact's
    ts loses to its successor (half-open intervals make the match
    unique and tie-free, even for zero-width versions created by
    same-timestamp changes).

    Scale shape: a hash EQUI-join on user_id with the interval
    predicate as a residual filter — per-user version counts are
    bounded by that user's change count, so the per-key compare volume
    is small and no range/theta join machinery is needed; the dimension
    build itself is ``_scd2_history``'s one user_id window stack.  At
    100 TB both sides co-locate on the same user_id hash exchange."""
    ev = load_table(spark, "events", sf_dir)
    dim = _scd2_history(ev)
    facts = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("fact_id"),
        F.col("user_id").alias("fu"),
        F.col("ts").alias("fact_ts"),
        F.col("value"),
    )
    j = facts.join(
        dim,
        (F.col("fu") == F.col("user_id"))
        & (F.col("valid_from") <= F.col("fact_ts"))
        & (F.col("valid_to").isNull() | (F.col("fact_ts") < F.col("valid_to"))),
    )
    return j.select(
        "fact_id",
        F.col("fu").alias("user_id"),
        "fact_ts",
        F.round(F.col("value"), 2).alias("fact_value"),
        "state",
        "version",
        F.col("is_current").cast("long").alias("joined_current"),
    ).orderBy("fact_id")


QUERIES["join_scd2_point_in_time"] = join_scd2_point_in_time
ORACLE_SQL["join_scd2_point_in_time"] = """
    WITH changes AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    hist AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               ROW_NUMBER() OVER w AS version
        FROM changes
        WHERE prev_type IS NULL OR event_type <> prev_type
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    facts AS (
        SELECT event_id AS fact_id, user_id, ts AS fact_ts, value
        FROM events WHERE event_type = 'purchase')
    SELECT f.fact_id,
           f.user_id,
           f.fact_ts,
           ROUND(f.value, 2) AS fact_value,
           h.state,
           h.version,
           CAST(h.valid_to IS NULL AS BIGINT) AS joined_current
    FROM facts f
    JOIN hist h
      ON f.user_id = h.user_id
     AND h.valid_from <= f.fact_ts
     AND (h.valid_to IS NULL OR f.fact_ts < h.valid_to)
    ORDER BY fact_id
"""


#: isotonic-calibration bin count (finer than the reliability table's
#: 10 so the pool-adjacent-violators step has structure to smooth)
ISO_BINS = 20


def model_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) probability calibration of the pinned sigmoid
    scorer against the urgent/high-priority label: scores are bucketed
    into 20 fixed-width bins and the empirical positive rate is
    replaced by its isotonic regression — the nonparametric calibrator
    (Zadrozny & Elkan KDD'02) that, unlike Platt scaling, cannot be
    mis-specified.  Emits the reliability table with the PAV-fitted
    monotone probability beside the raw rate.

    The pool-adjacent-violators solution is computed by the minimax
    identity  iso_b = max_{j<=b} min_{k>=b} mean(y, bins j..k)  over
    interval means from PREFIX SUMS — closed-form, no iterative
    pooling, so it is expressible identically in both engines.  Every
    interval mean is one division of exact BIGINT prefix-sum
    differences; min/max over exact doubles are order-free, so the
    fit is engine-exact before the 6-dp presentation round.

    Scale: ONE data-sized pass (bin assignment is a map-only
    expression, the rollup is a 20-key agg); the minimax enumeration
    is bins^3 = 8000 tuples of arithmetic on a broadcast-sized table —
    invariant to corpus size."""
    from database_peak_streaming_spark.functions.udfs import (
        _MODEL_A,
        _MODEL_B,
    )

    o = load_table(spark, "orders", sf_dir)
    score = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.lit(_MODEL_A) * F.log1p("o_totalprice")
                    + F.lit(_MODEL_B)
                )
            )
        ),
        6,
    )
    label = (
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    )
    scored = o.select(score.alias("score"), label.alias("label"))
    bin_ = F.least(
        F.floor(F.col("score") * ISO_BINS).cast("long"),
        F.lit(ISO_BINS - 1),
    )
    bins = (
        scored.withColumn("bin", bin_)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("w"),
            F.sum("label").alias("p"),
            F.round(F.avg("score"), 6).alias("mean_predicted"),
        )
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = bins.select(
        "bin", "w", "p", "mean_predicted",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("p").over(w_cum).alias("cp"),
    )
    j = cum.select(
        F.col("bin").alias("jb"),
        F.col("w").alias("jw"),
        F.col("p").alias("jp"),
        F.col("cw").alias("jcw"),
        F.col("cp").alias("jcp"),
    )
    k = cum.select(
        F.col("bin").alias("kb"),
        F.col("cw").alias("kcw"),
        F.col("cp").alias("kcp"),
    )
    pairs = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb",
        "kb",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jp"))
            / (F.col("kcw") - F.col("jcw") + F.col("jw"))
        ).alias("m"),
    )
    b = cum.select(F.col("bin").alias("bb"))
    trip = pairs.join(
        b, (F.col("jb") <= F.col("bb")) & (F.col("kb") >= F.col("bb"))
    )
    inner = trip.groupBy("bb", "jb").agg(F.min("m").alias("mn"))
    iso = inner.groupBy("bb").agg(F.max("mn").alias("iso"))
    return (
        cum.join(iso, cum["bin"] == iso["bb"])
        .select(
            "bin",
            F.col("w").cast("long").alias("n"),
            "mean_predicted",
            F.round(F.col("p") / F.col("w"), 6).alias("frac_positive"),
            F.round("iso", 6).alias("iso_prob"),
        )
        .orderBy("bin")
    )


QUERIES["model_isotonic_calibration"] = model_isotonic_calibration

ORACLE_SQL["model_isotonic_calibration"] = f"""
    WITH scored AS (
        SELECT ROUND(1.0 / (1.0 + EXP(-(0.35 * LN(1.0 + o_totalprice)
                                        + -2.0))), 6) AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label
        FROM orders),
    bins AS (
        SELECT LEAST(CAST(FLOOR(score * {ISO_BINS}) AS BIGINT),
                     {ISO_BINS - 1}) AS bin,
               CAST(COUNT(*) AS BIGINT) AS w,
               CAST(SUM(label) AS BIGINT) AS p,
               ROUND(AVG(score), 6) AS mean_predicted
        FROM scored GROUP BY 1),
    cum AS (
        SELECT bin, w, p, mean_predicted,
               CAST(SUM(w) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cw,
               CAST(SUM(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cp
        FROM bins),
    pairs AS (
        SELECT j.bin AS jb, k.bin AS kb,
               (k.cp - j.cp + j.p) / (k.cw - j.cw + j.w) AS m
        FROM cum j JOIN cum k ON j.bin <= k.bin),
    inner_min AS (
        SELECT b.bin AS bb, pr.jb, MIN(pr.m) AS mn
        FROM pairs pr JOIN cum b
          ON pr.jb <= b.bin AND pr.kb >= b.bin
        GROUP BY 1, 2),
    iso AS (SELECT bb, MAX(mn) AS iso FROM inner_min GROUP BY 1)
    SELECT c.bin,
           c.w AS n,
           c.mean_predicted,
           ROUND(c.p / c.w, 6) AS frac_positive,
           ROUND(i.iso, 6) AS iso_prob
    FROM cum c JOIN iso i ON i.bb = c.bin
    ORDER BY c.bin
"""


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the first-order Markov chain over per-user event
    sequences: H = -sum_i pi_i sum_j p_ij ln p_ij with the empirical
    prev-state distribution as pi — the one-number predictability
    summary of the transition matrix ``events_markov_transitions``
    materializes (H near 0 = deterministic flows, H near ln(k) =
    uniform wandering).  Emitted beside the stationary upper bound
    ln(k) and the normalized efficiency H/ln(k), the metric an
    anomaly-detection or session-model baseline reads first.

    Identity used:  H = -sum_ij (c_ij/C) ln(c_ij/c_i.)  over exact
    BIGINT transition counts (C = total transitions, c_i. = row
    marginal) — the ``stats_mutual_information`` contingency
    discipline; the <= k^2 = 25 float terms sum with ~1 ulp noise,
    far inside the 6-dp round.

    Scale: one user-keyed window shuffle for the lag pairs, one tiny
    (prev, next) rollup; the statistic assembles on k^2 rows."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    trans = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wr = Window.partitionBy("prev_type")
    wall = Window.partitionBy()
    terms = trans.select(
        F.col("c"),
        F.sum("c").over(wr).alias("ci"),
        F.sum("c").over(wall).alias("ctot"),
        F.count(F.col("c")).over(wall).alias("n_cells"),
    )
    agg = terms.groupBy().agg(
        F.max("ctot").alias("n_transitions"),
        F.max("n_cells").alias("n_cells"),
        F.sum(
            (F.col("c") / F.col("ctot"))
            * F.log(F.col("c") / F.col("ci"))
        ).alias("neg_h"),
    )
    keys = load_table(spark, "events", sf_dir).agg(
        F.countDistinct("event_type").alias("k")
    )
    h = -F.col("neg_h")
    hmax = F.log(F.col("k").cast("double"))
    return agg.crossJoin(F.broadcast(keys)).select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("k").cast("long").alias("k_states"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.round(h, 6).alias("entropy_rate_nats"),
        F.round(hmax, 6).alias("max_entropy_nats"),
        F.round(h / hmax, 6).alias("efficiency"),
    )


QUERIES["events_entropy_rate"] = events_entropy_rate

ORACLE_SQL["events_entropy_rate"] = """
    WITH seq AS (
        SELECT event_type AS next_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events),
    trans AS (
        SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2),
    terms AS (
        SELECT c,
               CAST(SUM(c) OVER (PARTITION BY prev_type) AS BIGINT) AS ci,
               CAST(SUM(c) OVER () AS BIGINT) AS ctot,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_cells
        FROM trans),
    agg AS (
        SELECT CAST(MAX(ctot) AS BIGINT) AS n_transitions,
               CAST(MAX(n_cells) AS BIGINT) AS n_cells,
               SUM((c / ctot) * LN(c / ci)) AS neg_h
        FROM terms),
    kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
           FROM events)
    SELECT a.n_transitions,
           kk.k AS k_states,
           a.n_cells,
           ROUND(-a.neg_h, 6) AS entropy_rate_nats,
           ROUND(LN(kk.k), 6) AS max_entropy_nats,
           ROUND(-a.neg_h / LN(kk.k), 6) AS efficiency
    FROM agg a CROSS JOIN kk
"""


def events_interarrival_gamma_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments Gamma fit of per-user inter-arrival times, per
    event type: shape k = mean^2/var, scale theta = var/mean over the
    pooled within-user gaps — the parametric companion to the Fano
    burstiness diagnostic (k < 1 = clumpier than Poisson, k = 1 =
    exponential/memoryless, k > 1 = more regular), and the
    distribution a capacity planner actually samples from.

    Determinism: gaps are exact integer seconds, so n / sum / sum-sq
    are exact BIGINTs; mean, variance (sample, n-1), k and theta are
    a fixed IEEE expression tree over those integers — engine-exact
    before the 6-dp round.

    Scale: one user-keyed window shuffle for the lag gaps, then one
    map-side-combinable moment aggregation per type."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap"),
    ).where(F.col("gap").isNotNull())
    g = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).alias("q"),
    )
    mean = F.col("s") / F.col("n")
    var = (F.col("q") - mean * F.col("s")) / F.nullif(
        (F.col("n") - F.lit(1)).cast("double"), F.lit(0.0)
    )
    return (
        g.select(
            "event_type",
            F.col("n").cast("long").alias("n_gaps"),
            F.round(mean, 6).alias("mean_gap_sec"),
            F.round(var, 6).alias("var_gap"),
            F.round((mean * mean) / F.nullif(var, F.lit(0.0)), 6).alias(
                "gamma_shape_k"
            ),
            F.round(var / F.nullif(mean, F.lit(0.0)), 6).alias(
                "gamma_scale_theta"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["events_interarrival_gamma_mom"] = events_interarrival_gamma_mom

ORACLE_SQL["events_interarrival_gamma_mom"] = """
    WITH gaps AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                   - CAST(FLOOR(EPOCH(LAG(ts) OVER (PARTITION BY user_id,
                                                    event_type
                                                    ORDER BY ts,
                                                             event_id)))
                          AS BIGINT) AS gap
        FROM events),
    g AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(gap) AS BIGINT) AS s,
               CAST(SUM(gap * gap) AS BIGINT) AS q
        FROM gaps WHERE gap IS NOT NULL
        GROUP BY 1)
    SELECT event_type,
           n AS n_gaps,
           ROUND(s * 1.0 / n, 6) AS mean_gap_sec,
           ROUND((q - (s * 1.0 / n) * s) / (n - 1), 6) AS var_gap,
           ROUND(((s * 1.0 / n) * (s * 1.0 / n))
                 / ((q - (s * 1.0 / n) * s) / (n - 1)), 6)
               AS gamma_shape_k,
           ROUND(((q - (s * 1.0 / n) * s) / (n - 1)) / (s * 1.0 / n), 6)
               AS gamma_scale_theta
    FROM g
    ORDER BY event_type
"""


#: path-deviation prefix length (events per user path signature)
PATH_PREFIX = 10


def events_path_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral PATH-DEVIATION distribution: encode each user's first
    ``PATH_PREFIX`` events (by time, event_id tie-break) as a compact
    action-initial string, find the corpus's MODAL path, and histogram
    the Levenshtein edit distance from every user's path to it — the
    funnel-deviation score product analytics uses to find users whose
    journey diverges from the canonical one (the sequence-level cousin
    of ``events_funnel_ordered``'s fixed-funnel check and
    ``events_markov_transitions``' one-step view; distinct from
    ``linkage_blocked_levenshtein``, which compares record PAIRS —
    here every path compares to ONE broadcast anchor, so the work is
    linear, never pairwise).

    Ties: the modal path breaks count ties lexicographically; the
    distance histogram is exact integer arithmetic end-to-end.

    Scale: per-user path assembly is one groupBy whose arrays are
    capped at PATH_PREFIX elements; the modal path is a 1-row
    aggregate broadcast to a linear map; the histogram is a
    distance-keyed groupBy bounded by PATH_PREFIX + 1 cells."""
    ev = load_table(spark, "events", sf_dir)
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                "ts", "event_id", F.substring("event_type", 1, 1).alias("ch")
            )
        )
    )
    paths = (
        ev.groupBy("user_id")
        .agg(arr.alias("arr"))
        .select(
            "user_id",
            F.array_join(
                F.transform(
                    F.slice("arr", 1, PATH_PREFIX), lambda s: s["ch"]
                ),
                "",
            ).alias("path"),
        )
    )
    modal = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(1)
        .select(F.col("path").alias("modal_path"))
    )
    scored = paths.crossJoin(F.broadcast(modal)).select(
        "modal_path",
        F.levenshtein("path", "modal_path").cast("long").alias(
            "edit_distance"
        ),
    )
    total = Window.partitionBy()
    return (
        scored.groupBy("modal_path", "edit_distance")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            "modal_path",
            "edit_distance",
            "n_users",
            F.round(
                F.col("n_users").cast("double")
                / F.sum("n_users").over(total) * 100,
                6,
            ).alias("pct_users"),
        )
        .orderBy("edit_distance")
    )


QUERIES["events_path_edit_distance"] = events_path_edit_distance
ORACLE_SQL["events_path_edit_distance"] = f"""
    WITH paths AS (
        SELECT user_id,
               ARRAY_TO_STRING(
                   (LIST(SUBSTRING(event_type, 1, 1)
                         ORDER BY ts, event_id))[1:{PATH_PREFIX}],
                   '') AS path
        FROM events GROUP BY user_id),
    modal AS (
        SELECT path AS modal_path
        FROM (SELECT path, COUNT(*) AS n FROM paths GROUP BY path)
        ORDER BY n DESC, path LIMIT 1),
    scored AS (
        SELECT m.modal_path,
               CAST(LEVENSHTEIN(p.path, m.modal_path) AS BIGINT)
                   AS edit_distance
        FROM paths p CROSS JOIN modal m),
    hist AS (
        SELECT modal_path, edit_distance,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM scored GROUP BY modal_path, edit_distance)
    SELECT modal_path, edit_distance, n_users,
           ROUND(CAST(n_users AS DOUBLE)
                 / SUM(n_users) OVER () * 100, 6) AS pct_users
    FROM hist
    ORDER BY edit_distance
"""


def events_cep_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH twin of the streaming CEP detector
    (streaming/stateful.py::PatternDetector): per user, run the same
    skip-till-next-match automaton over the time-ordered event trace
    (3-step pattern, 24 h per-step timeout, greedy non-overlapping
    restarts) as ONE ordered fold whose accumulator is the automaton
    state [stage, first, last, n, first_start, last_end] — exact
    BIGINT microseconds end-to-end.  Registered with a full DuckDB
    oracle, this closes the stream == batch == oracle triangle for the
    CEP semantics: the streamed detector equals this walk
    (tests/test_stateful.py), and this walk hash-matches the oracle.

    Scale: one (user)-keyed groupBy carrying a per-user event array —
    bounded by per-user trace length (the same bound every per-user
    sessionize/fold query in the registry carries; the streaming twin
    is the unbounded-trace form with O(1) state)."""
    from database_peak_streaming_spark.streaming.stateful import (
        CEP_GAP_US,
        CEP_PATTERN,
    )

    ev = load_table(spark, "events", sf_dir)
    p = (
        F.when(F.col("event_type") == CEP_PATTERN[0], F.lit(0))
        .when(F.col("event_type") == CEP_PATTERN[1], F.lit(1))
        .when(F.col("event_type") == CEP_PATTERN[2], F.lit(2))
        .otherwise(F.lit(-1))
        .cast("long")
    )
    base = ev.select(
        "user_id",
        # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP (the
        # joins.py:742 convention — container TZ is UTC, so the cast is
        # identity on the wall clock, matching DuckDB's epoch_us)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        "event_id",
        p.alias("p"),
    )
    g = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(F.collect_list(F.struct("t", "event_id", "p"))).alias(
            "arr"
        ),
    )
    xs = F.transform(F.col("arr"), lambda s: F.array(s["t"], s["p"]))
    gap = F.lit(CEP_GAP_US)
    final_stage = F.lit(len(CEP_PATTERN) - 1)

    def _step(acc, x):
        stage0 = F.when(
            (acc[0] > 0) & (x[0] - acc[2] > gap), F.lit(0)
        ).otherwise(acc[0])
        adv = x[1] == stage0
        comp = adv & (stage0 == final_stage)
        return F.array(
            F.when(comp, F.lit(0))
            .when(adv, stage0 + 1)
            .otherwise(stage0),
            F.when(adv & (stage0 == 0), x[0]).otherwise(acc[1]),
            F.when(adv, x[0]).otherwise(acc[2]),
            acc[3] + F.when(comp, F.lit(1)).otherwise(F.lit(0)),
            F.when(comp & (acc[3] == 0), acc[1]).otherwise(acc[4]),
            F.when(comp, x[0]).otherwise(acc[5]),
        )

    seed = F.array(*[F.lit(0).cast("long")] * 6)
    st = F.aggregate(xs, seed, _step)
    return g.select(
        "user_id",
        "n_events",
        F.element_at(st, 4).alias("n_matches"),
        F.when(
            F.element_at(st, 4) > 0,
            F.timestamp_micros(F.element_at(st, 5)).cast("timestamp_ntz"),
        ).alias("first_start_ts"),
        F.when(
            F.element_at(st, 4) > 0,
            F.timestamp_micros(F.element_at(st, 6)).cast("timestamp_ntz"),
        ).alias("last_end_ts"),
    ).orderBy("user_id")


QUERIES["events_cep_pattern_matches"] = events_cep_pattern_matches


def _cep_oracle_sql() -> str:
    from database_peak_streaming_spark.streaming.stateful import (
        CEP_GAP_US,
        CEP_PATTERN,
    )

    s0 = (
        f"(CASE WHEN acc[1] > 0 AND x[1] - acc[3] > {CEP_GAP_US} "
        "THEN 0 ELSE acc[1] END)"
    )
    adv = f"(x[2] = {s0})"
    comp = f"({adv} AND {s0} = {len(CEP_PATTERN) - 1})"
    step = f"""[
        CASE WHEN {comp} THEN 0
             WHEN {adv} THEN {s0} + 1
             ELSE {s0} END,
        CASE WHEN {adv} AND {s0} = 0 THEN x[1] ELSE acc[2] END,
        CASE WHEN {adv} THEN x[1] ELSE acc[3] END,
        acc[4] + CASE WHEN {comp} THEN 1 ELSE 0 END,
        CASE WHEN {comp} AND acc[4] = 0 THEN acc[2] ELSE acc[5] END,
        CASE WHEN {comp} THEN x[1] ELSE acc[6] END]"""
    return f"""
    WITH ev2 AS (
        SELECT user_id, epoch_us(ts) AS t, event_id,
               CASE event_type
                    WHEN '{CEP_PATTERN[0]}' THEN 0
                    WHEN '{CEP_PATTERN[1]}' THEN 1
                    WHEN '{CEP_PATTERN[2]}' THEN 2
                    ELSE -1 END AS p
        FROM events),
    g AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               LIST([t, CAST(p AS BIGINT)] ORDER BY t, event_id) AS arr
        FROM ev2 GROUP BY user_id),
    folded AS (
        SELECT user_id, n_events,
               LIST_REDUCE(
                   [[CAST(0 AS BIGINT), 0, 0, 0, 0, 0]] || arr,
                   (acc, x) -> {step}) AS st
        FROM g)
    SELECT user_id, n_events,
           st[4] AS n_matches,
           CASE WHEN st[4] > 0 THEN make_timestamp(st[5]) END
               AS first_start_ts,
           CASE WHEN st[4] > 0 THEN make_timestamp(st[6]) END
               AS last_end_ts
    FROM folded ORDER BY user_id
"""


ORACLE_SQL["events_cep_pattern_matches"] = _cep_oracle_sql()
