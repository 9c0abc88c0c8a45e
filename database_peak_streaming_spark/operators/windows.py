"""Window-function operators (SURVEY.md §2B window rows).

Reference parity: P12's ``iwl`` ("get data first row",
``analyze_data.py:35``) is ``first_value`` over a per-sensor window; P10's
``np.cumsum`` (``hyperion.py:442``) is a running sum frame.

Scale notes: a window spec shuffles once on ``partitionBy`` and sorts
within partitions; unbounded-partition windows (no partitionBy) are a
single-task bottleneck and are avoided — every window here partitions on
a real key.  Running sums use decimal accumulation for order-independent
exactness (see operators/common.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.common import DEC
from database_peak_streaming_spark.sources.batch import load_table


def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile over customers by balance
    within market segment.  row_number and ntile get a unique tiebreak
    (custkey) — without it they are nondeterministic under ties, which a
    distributed engine must never silently be."""
    c = load_table(spark, "customer", sf_dir)
    w_tie = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    w_val = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w_tie).alias("rn"),
            F.rank().over(w_val).alias("rnk"),
            F.dense_rank().over(w_val).alias("drnk"),
            F.ntile(4).over(w_tie).alias("quartile"),
        )
        .filter(F.col("rn") <= 10)
        .orderBy("c_mktsegment", "rn")
    )


def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value / last_value over each user's event
    stream (the P12 ``iwl`` first-row-baseline pattern)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.first("value").over(w_all).alias("first_value_all"),
            F.last("value").over(w_all).alias("last_value_all"),
        )
        .orderBy("user_id", "event_id")
    )


def win_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based aggregates: running sum (≙ reference cumsum P10) and
    3-row sliding mean per customer order history."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliding = w.rowsBetween(-2, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast(DEC))
            .over(running)
            .cast("double")
            .alias("running_spend"),
            F.round(F.avg("o_totalprice").over(sliding), 6).alias("sliding_avg_3"),
            F.count(F.lit(1)).over(running).alias("order_seq"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per order status by price (window + filter) — the
    scalable top-k: no global sort, per-group heaps via rank."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_orderstatus", "rn")
    )


def win_strain_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's strain formula (P12, ``analyze_data.py:30-41``)
    applied to the events fixture as a per-user series:

        iwl          = first value in the series         (analyze_data.py:35)
        total_strain = 1e6 * ((wl - iwl) / iwl / gf)     (analyze_data.py:37)

    with gf = .807 (``analyze_data.py:31``).  Demonstrates the window +
    arithmetic shape of the domain derivation on oracle-checkable data;
    the real sensor kernel lives in functions/sensor.py.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    gf = 0.807
    iwl = F.first("value").over(w_all)
    return (
        ev.select(
            "user_id",
            "event_id",
            iwl.alias("iwl"),
            F.round(F.lit(1e6) * ((F.col("value") - iwl) / iwl / F.lit(gf)), 4).alias(
                "total_strain"
            ),
        )
        # guard: zero baselines diverge cross-engine (Spark NULL vs
        # DuckDB inf on double div-by-zero); physically iwl>0 anyway
        .filter(F.col("iwl") != 0)
        .drop("iwl")
        .orderBy("user_id", "event_id")
    )


def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — distribution window functions."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


def win_zscore_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment z-score via built-in window avg/stddev — the JVM-side
    twin of ``udf_zscore_by_segment`` (same output contract).  Both are
    registered deliberately: this is the production form (whole-stage
    codegen, one shuffle on the segment key, no Python workers); the
    grouped-map UDF form exists to exercise and *price* the
    applyInPandas surface — the bench reports both so the UDF tax is a
    measured number, not the only implementation."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_samp(
        "c_acctbal"
    ).over(w)
    return c.select(
        "c_custkey", "c_mktsegment", F.round(z, 6).alias("zscore")
    ).orderBy("c_custkey")


def win_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling sum per user via a RANGE frame on event
    time (epoch seconds): every event sees the sum of its user's values
    in the preceding 3600 s — the time-based frame ROWS windows can't
    express when event spacing is irregular.

    The frame key is ``floor(epoch(ts))`` so both engines bucket
    fractional seconds identically, and the rolling sum runs in
    DECIMAL(28,6) (the win_frames discipline) so the result is exact —
    independent of the engine's within-frame float association order —
    before the final cast.  One shuffle on user_id; the RANGE frame is
    a single ordered pass per partition.  Output is re-aggregated per
    user (peak trailing-hour load) to keep the result compact."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", "value", F.unix_timestamp("ts").alias("sec")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3599, Window.currentRow)
    )
    # Quantize ONCE per row (the identical decimal(28,6) HALF_UP cast as
    # before, so the 6dp grid is unchanged) and run the RANGE frame on
    # exact LONG micro-units: the sliding frame pays a primitive add per
    # row instead of a JVM BigDecimal add (round 12, guide §2.3 narrower
    # types; the bootstrap_ci_mean cents precedent).  sum(micros)/1e6 as
    # double equals the decimal sum cast double while |sum| < 2^53
    # micros (fixture sums ~1e8; both are a single correct rounding of
    # m x 1e-6).
    micros = (F.col("value").cast("decimal(28,6)") * 1_000_000).cast("long")
    rolled = e.select(
        "user_id",
        (F.sum(micros).over(w).cast("double") / F.lit(1_000_000.0)).alias(
            "trailing_1h"
        ),
    )
    return (
        rolled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("trailing_1h"), 6).alias("peak_trailing_1h"),
        )
        .orderBy("user_id")
    )


def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto analysis: parts ranked by revenue, classified A
    (first 80% of cumulative revenue), B (next 15%), C (tail) — the
    inventory-analytics rollup behind "20% of SKUs drive 80% of volume".

    The fact table collapses to per-part revenue FIRST (one shuffle on
    partkey, exact decimal sums), so the global cumulative window runs
    over dimension-sized data — the same discipline as text_zipf_slope;
    the grand total rides in as a broadcast scalar (scans.py:64
    pattern).  Cumulative shares come from exact decimal partials
    divided as doubles, so the A/B/C boundary comparison is
    bit-identical in any engine and the classification is
    deterministic."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("rev")
    )
    total = rev.agg(F.sum("rev").alias("total"))
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classed = (
        rev.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "rev",
            (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
                "cum_share"
            ),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.80, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev").cast("double"), 6).alias("class_revenue"),
            F.round(F.max("cum_share"), 6).alias("cum_share_hi"),
        )
        .orderBy("abc_class")
    )


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) aggregates: which order carries the
    group's extreme price."""
    o = load_table(spark, "orders", sf_dir)
    # ordering key is (price, orderkey): price ties resolve by orderkey,
    # so argmin/argmax are deterministic under any partitioning
    ord_key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", ord_key).alias("max_price_orderkey"),
            F.min_by("o_orderkey", ord_key).alias("min_price_orderkey"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


def orders_xyz_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classification — ABC's companion axis
    (``abc_pareto_classification`` ranks parts by VALUE; XYZ ranks them
    by demand PREDICTABILITY): per part, the coefficient of variation
    of monthly shipped quantity over the corpus's full month horizon,
    classed X (cv <= 0.5, steady), Y (cv <= 1.0, fluctuating), Z
    (erratic).

    Zero-demand months count (a part shipping one huge month and
    nothing else is Z, not X), but NO dense part x month grid is ever
    built: population mean and variance over the N-month horizon come
    from sparse per-(part, month) cells via sum(m) and sum(m^2) with
    the global month count N as a broadcast scalar — absent months
    contribute zero to both sums by construction.  All sums are EXACT
    decimals (quantity cast to decimal(18,2); squares stay decimal),
    so the doubles feeding cv are single casts of exact values and the
    X/Y/Z boundary compares identically in both engines on the ROUNDED
    cv.  One fact-table shuffle; everything after is part-vocabulary
    sized."""
    li = load_table(spark, "lineitem", sf_dir)
    monthly = li.groupBy(
        "l_partkey", F.trunc("l_shipdate", "month").alias("month")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("m")
    )
    n_months = monthly.select("month").distinct().agg(
        F.count(F.lit(1)).alias("n_periods")
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_months_active"),
        F.sum("m").alias("sum_m"),
        F.sum(F.col("m") * F.col("m")).alias("sum_m2"),
    )
    mean = F.col("sum_m").cast("double") / F.col("n_periods")
    var = F.col("sum_m2").cast("double") / F.col("n_periods") - mean * mean
    cv = F.round(F.sqrt(var) / mean, 6)
    return (
        per_part.crossJoin(F.broadcast(n_months))
        .select(
            "l_partkey",
            "n_months_active",
            F.round(F.col("sum_m").cast("double"), 6).alias("total_qty"),
            cv.alias("cv"),
            F.when(cv <= 0.5, "X")
            .when(cv <= 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
        .orderBy("l_partkey")
    )


QUERIES = {
    "orders_xyz_classification": orders_xyz_classification,
    "win_ranking": win_ranking,
    "win_distribution": win_distribution,
    "agg_min_max_by": agg_min_max_by,
    "win_analytic": win_analytic,
    "win_frames": win_frames,
    "win_topk_per_group": win_topk_per_group,
    "win_strain_derivation": win_strain_derivation,
    "win_zscore_by_segment": win_zscore_by_segment,
    "win_time_range_rolling": win_time_range_rolling,
    "abc_pareto_classification": abc_pareto_classification,
}

ORACLE_SQL = {
    "win_distribution": """
        SELECT c_mktsegment, c_custkey,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        ORDER BY c_mktsegment, c_custkey
    """,
    "agg_min_max_by": """
        SELECT o_orderstatus,
               FIRST(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC)
                   AS max_price_orderkey,
               FIRST(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC)
                   AS min_price_orderkey,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "win_ranking": """
        SELECT * FROM (
            SELECT c_mktsegment, c_custkey, c_acctbal,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn,
                   RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
                   DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
                   NTILE(4) OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS quartile
            FROM customer) t
        WHERE rn <= 10 ORDER BY c_mktsegment, rn
    """,
    "win_analytic": """
        SELECT user_id, event_id, value,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value,
               FIRST_VALUE(value) OVER w_all AS first_value_all,
               LAST_VALUE(value) OVER w_all AS last_value_all
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
               w_all AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY user_id, event_id
    """,
    "win_frames": """
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER running AS DOUBLE)
                   AS running_spend,
               ROUND(AVG(o_totalprice) OVER sliding, 6) AS sliding_avg_3,
               COUNT(*) OVER running AS order_seq
        FROM orders
        WINDOW running AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               sliding AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
    """,
    "win_topk_per_group": """
        SELECT * FROM (
            SELECT o_orderstatus, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 3 ORDER BY o_orderstatus, rn
    """,
    "win_zscore_by_segment": """
        SELECT c_custkey, c_mktsegment,
               ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_mktsegment))
                     / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_mktsegment),
                     6) AS zscore
        FROM customer ORDER BY c_custkey
    """,
    "abc_pareto_classification": """
        WITH rev AS (
            SELECT l_partkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev
            FROM lineitem GROUP BY l_partkey),
        classed AS (
            SELECT l_partkey, rev,
                   CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS DOUBLE)
                   / CAST((SELECT SUM(rev) FROM rev) AS DOUBLE) AS cum_share
            FROM rev)
        SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               COUNT(*) AS n_parts,
               ROUND(CAST(SUM(rev) AS DOUBLE), 6) AS class_revenue,
               ROUND(MAX(cum_share), 6) AS cum_share_hi
        FROM classed
        GROUP BY 1
        ORDER BY 1
    """,
    "win_time_range_rolling": """
        WITH rolled AS (
            SELECT user_id,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
                        PARTITION BY user_id
                        ORDER BY CAST(FLOOR(date_part('epoch', ts)) AS BIGINT)
                        RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) AS trailing_1h
            FROM events)
        SELECT user_id,
               COUNT(*) AS n_events,
               ROUND(MAX(trailing_1h), 6) AS peak_trailing_1h
        FROM rolled
        GROUP BY user_id
        ORDER BY user_id
    """,
    "win_strain_derivation": """
        SELECT user_id, event_id,
               ROUND(1e6 * ((value - iwl) / iwl / 0.807), 4) AS total_strain
        FROM (SELECT user_id, event_id, value,
                     FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         AS iwl
              FROM events) t
        WHERE iwl <> 0
        ORDER BY user_id, event_id
    """,
}

ORACLE_SQL["orders_xyz_classification"] = """
    WITH monthly AS (
        SELECT l_partkey, DATE_TRUNC('month', l_shipdate) AS month,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m
        FROM lineitem GROUP BY l_partkey, DATE_TRUNC('month', l_shipdate)),
    n_months AS (
        SELECT COUNT(DISTINCT month) AS n_periods FROM monthly),
    per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n_months_active,
               SUM(m) AS sum_m,
               SUM(m * m) AS sum_m2
        FROM monthly GROUP BY l_partkey),
    stats AS (
        SELECT l_partkey, n_months_active,
               CAST(sum_m AS DOUBLE) AS sum_md,
               ROUND(SQRT(CAST(sum_m2 AS DOUBLE) / n_periods
                          - (CAST(sum_m AS DOUBLE) / n_periods)
                            * (CAST(sum_m AS DOUBLE) / n_periods))
                     / (CAST(sum_m AS DOUBLE) / n_periods), 6) AS cv
        FROM per_part CROSS JOIN n_months)
    SELECT l_partkey, n_months_active,
           ROUND(sum_md, 6) AS total_qty,
           cv,
           CASE WHEN cv <= 0.5 THEN 'X'
                WHEN cv <= 1.0 THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM stats ORDER BY l_partkey
"""


def orders_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC-XYZ inventory planning matrix: every part classified on
    BOTH axes — revenue concentration (``abc_pareto_classification``'s
    cumulative-share bands) and demand predictability
    (``orders_xyz_classification``'s coefficient-of-variation bands) —
    rolled up to the canonical 3x3 planning grid with part counts,
    cell revenue, and revenue share.  AX cells (high value, steady
    demand) get tight service levels; CZ cells (low value, erratic)
    get make-to-order — this matrix IS the inventory-policy input, and
    it is the audit-the-operator composition pattern: both axes reuse
    the registered classifiers' exact logic, and the oracle mirrors
    both registered oracles, so the matrix can never drift from its
    parents.

    Scale: the two part-keyed rollups are each one fact shuffle
    (already proven separately); the join and the 3x3 rollup are
    part-vocabulary sized."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("rev")
    )
    total = rev.agg(F.sum("rev").alias("total"))
    w = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    abc = (
        rev.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "rev",
            "total",
            (
                F.col("cum").cast("double") / F.col("total").cast("double")
            ).alias("cum_share"),
        )
        .withColumn(
            "abc_class",
            F.when(F.col("cum_share") <= 0.80, "A")
            .when(F.col("cum_share") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    xyz = orders_xyz_classification(spark, sf_dir).select(
        "l_partkey", "xyz_class"
    )
    joined = abc.join(xyz, "l_partkey")
    return (
        joined.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(F.sum("rev").cast("double"), 6).alias("cell_revenue"),
            F.round(
                F.sum("rev").cast("double") / F.max("total").cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


QUERIES["orders_abc_xyz_matrix"] = orders_abc_xyz_matrix

ORACLE_SQL["orders_abc_xyz_matrix"] = """
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS rev
        FROM lineitem GROUP BY l_partkey),
    classed AS (
        SELECT l_partkey, rev,
               CAST(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS DOUBLE)
               / CAST((SELECT SUM(rev) FROM rev) AS DOUBLE) AS cum_share
        FROM rev),
    abc AS (
        SELECT l_partkey, rev,
               CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM classed),
    monthly AS (
        SELECT l_partkey, DATE_TRUNC('month', l_shipdate) AS month,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m
        FROM lineitem GROUP BY l_partkey, DATE_TRUNC('month', l_shipdate)),
    n_months AS (
        SELECT COUNT(DISTINCT month) AS n_periods FROM monthly),
    per_part AS (
        SELECT l_partkey,
               SUM(m) AS sum_m,
               SUM(m * m) AS sum_m2
        FROM monthly GROUP BY l_partkey),
    xyz AS (
        SELECT l_partkey,
               CASE WHEN ROUND(SQRT(CAST(sum_m2 AS DOUBLE) / n_periods
                                    - (CAST(sum_m AS DOUBLE) / n_periods)
                                      * (CAST(sum_m AS DOUBLE)
                                         / n_periods))
                               / (CAST(sum_m AS DOUBLE) / n_periods), 6)
                         <= 0.5 THEN 'X'
                    WHEN ROUND(SQRT(CAST(sum_m2 AS DOUBLE) / n_periods
                                    - (CAST(sum_m AS DOUBLE) / n_periods)
                                      * (CAST(sum_m AS DOUBLE)
                                         / n_periods))
                               / (CAST(sum_m AS DOUBLE) / n_periods), 6)
                         <= 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM per_part CROSS JOIN n_months)
    SELECT a.abc_class, x.xyz_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(a.rev) AS DOUBLE), 6) AS cell_revenue,
           ROUND(CAST(SUM(a.rev) AS DOUBLE)
                 / CAST((SELECT SUM(rev) FROM rev) AS DOUBLE), 6)
               AS revenue_share
    FROM abc a JOIN xyz x USING (l_partkey)
    GROUP BY 1, 2
    ORDER BY 1, 2
"""
