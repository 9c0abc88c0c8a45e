"""Rank-statistics pack: Spearman rank correlation and ROC-AUC model
evaluation — the two order-based measures every feature-audit and
model-eval pipeline runs beside the moment-based ones (Pearson corr,
calibration bins) already in the surface.

Both reduce to AVERAGE ranks (the standard mid-rank tie convention),
which are exact multiples of 1/2: rank() is an exact integer, the tie
adjustment adds (tie_count - 1)/2, and every downstream sum of such
halves is exact in double far below 2^52 — so the statistics are
order-independent and hash-comparable across engines by construction.

Scale note (both operators): mid-ranks come from a per-group window
sort, a single-partition sort per group at the limit.  At 100 TB the
documented swap is binned ranks — approx-percentile boundaries
broadcast to a map-only bucketizer, ranks assigned per bin plus an
exact intra-bin pass only for the bins a tie spans (the
winsorize/equidepth pattern in aggregates.py); the rank algebra
downstream is unchanged.  Reference parity: the reference's analysis
surface stops at moment statistics (analyze_data.py:30-70's
mean/min/max scans); rank measures are part of this engine's
training-data audit extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def _mid_rank(part_cols: list[str], value_col: str) -> F.Column:
    """Average (mid) rank of ``value_col`` within the partition: the
    competition rank plus half the remaining tie block.  Exact halves,
    engine-identical."""
    w_rank = Window.partitionBy(*part_cols).orderBy(value_col)
    w_ties = Window.partitionBy(*part_cols, value_col)
    return (
        F.rank().over(w_rank)
        + (F.count(F.lit(1)).over(w_ties) - F.lit(1)) / F.lit(2.0)
    )


def stats_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price per
    return flag: Pearson correlation of the MID-RANKS of each column —
    the monotone-association measure that is robust to the price
    column's heavy tail, where Pearson (already surfaced as
    `agg_corr_covar`) is dominated by it.

    Ranks are computed with the standard average-rank tie convention,
    so the statistic equals the textbook tie-corrected Spearman rho.
    Both engines compute identical exact half-integer ranks; CORR's
    accumulation differs only at the ~1 ulp level, far inside the
    6-decimal round."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    ranked = li.select(
        "l_returnflag",
        _mid_rank(["l_returnflag"], "l_quantity").alias("rq"),
        _mid_rank(["l_returnflag"], "l_extendedprice").alias("rp"),
    )
    return (
        ranked.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.corr("rq", "rp"), 6).alias("spearman_rho"),
        )
        .orderBy("l_returnflag")
    )


def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC-AUC of the order-value score against the urgent-priority
    label, per market segment — the rank-sum (Mann-Whitney) identity:
    AUC = (sum of positive mid-ranks - n_pos(n_pos+1)/2) /
    (n_pos * n_neg), exactly the probability a random positive
    outscores a random negative with ties counted half.  This is the
    one-pass distributed AUC: no threshold sweep, no curve
    materialization — one rank window and one aggregation.

    All inputs to the final division are exact (integer counts,
    half-integer rank sums), so cross-engine agreement is exact up to
    the final rounded divide.  Gini = 2*AUC - 1 rides along."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment",
        F.col("o_totalprice").alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("pos"),
    )
    ranked = j.select(
        "c_mktsegment",
        "pos",
        _mid_rank(["c_mktsegment"], "score").alias("r"),
    )
    g = ranked.groupBy("c_mktsegment").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("pos") == 1, F.col("r")).otherwise(0.0)).alias(
            "r_pos"
        ),
    )
    auc = (
        F.col("r_pos")
        - F.col("n_pos").cast("double")
        * (F.col("n_pos") + F.lit(1)).cast("double")
        / F.lit(2.0)
    ) / F.nullif(
        F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
        F.lit(0.0),
    )
    return (
        g.select(
            "c_mktsegment",
            "n_pos",
            "n_neg",
            F.round(auc, 6).alias("auc"),
            F.round(auc * 2 - 1, 6).alias("gini"),
        )
        .orderBy("c_mktsegment")
    )


def stats_kendall_tau_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b (tie-corrected) between quantity and discount per
    return flag — the O(n^2)-pairs statistic made distributed-feasible
    by VOCABULARY COLLAPSE: both variables live on small integer grids
    (50 quantities x 11 discount points), so the table reduces to
    (x, y) cells with counts in one data-sized groupBy and every pair
    count is a product of cell counts.  Concordant/discordant sums run
    over cell PAIRS (vocab^2, never rows^2); the tie terms come from
    the x/y marginals.  This is the exact-Kendall recipe for 100 TB:
    work after the first shuffle is bounded by the value vocabulary,
    not the data.

    Everything through the final division is exact BIGINT (cell-count
    products bounded by (rows/cell)^2 — the decimal escalation for
    beyond ~1e9 rows/cell is the dsum discipline in common.py), so
    cross-engine agreement is exact up to one rounded divide."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.round(F.col("l_quantity"), 0).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
    )
    cells = li.groupBy("l_returnflag", "x", "y").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = cells.select(
        F.col("l_returnflag").alias("flag"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.col("n").alias("an"),
    )
    b = cells.select(
        F.col("l_returnflag").alias("flag"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("n").alias("bn"),
    )
    cd = (
        a.join(b, "flag")
        .where(F.col("ax") < F.col("bx"))
        .groupBy("flag")
        .agg(
            F.sum(
                F.when(
                    F.col("by") > F.col("ay"), F.col("an") * F.col("bn")
                ).otherwise(F.lit(0))
            ).alias("conc"),
            F.sum(
                F.when(
                    F.col("by") < F.col("ay"), F.col("an") * F.col("bn")
                ).otherwise(F.lit(0))
            ).alias("disc"),
        )
    )
    tot = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    tx = (
        cells.groupBy(F.col("l_returnflag").alias("flag"), "x")
        .agg(F.sum("n").alias("t"))
        .groupBy("flag")
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n1"))
    )
    ty = (
        cells.groupBy(F.col("l_returnflag").alias("flag"), "y")
        .agg(F.sum("n").alias("t"))
        .groupBy("flag")
        .agg(F.sum(F.expr("t * (t - 1) div 2")).alias("n2"))
    )
    n0 = F.expr("nr * (nr - 1) div 2")
    tau = (F.col("conc") - F.col("disc")).cast("double") / F.sqrt(
        (n0 - F.col("n1")).cast("double")
        * (n0 - F.col("n2")).cast("double")
    )
    return (
        cd.join(tot, "flag")
        .join(tx, "flag")
        .join(ty, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("nr").cast("long").alias("n_rows"),
            F.col("conc").cast("long").alias("concordant"),
            F.col("disc").cast("long").alias("discordant"),
            F.round(tau, 6).alias("kendall_tau_b"),
        )
        .orderBy("l_returnflag")
    )


def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (the area under the precision-recall curve in
    its step-wise TREC form) of the order-value score against the
    urgent-priority label, per market segment — the eval that matters
    when positives are rare and ROC-AUC (`eval_roc_auc`) flatters:
    AP = (1/n_pos) * sum over positive ranks k of precision@k.

    One total order per segment — (score DESC, order key) fully
    tie-broken so both engines walk the identical ranking — one
    cumulative-sum window, one aggregation.  precision@k = cum_pos/k is
    a ratio of exact integers; the sum of those doubles differs only at
    the 1e-11 level across engines, far inside the 6-decimal round."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment",
        F.col("o_totalprice").alias("score"),
        F.col("o_orderkey").alias("okey"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("pos"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("score").desc(), F.col("okey").asc()
    )
    ranked = j.select(
        "c_mktsegment",
        "pos",
        F.row_number().over(w).alias("k"),
        F.sum("pos")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_pos"),
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.sum("pos").cast("long").alias("n_pos"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(
                F.sum(
                    F.when(
                        F.col("pos") == 1,
                        F.col("cum_pos").cast("double") / F.col("k"),
                    ).otherwise(0.0)
                )
                / F.sum("pos"),
                6,
            ).alias("avg_precision"),
        )
        .select(
            "c_mktsegment",
            "n_pos",
            "n_rows",
            "avg_precision",
            F.round(
                F.col("avg_precision")
                - F.col("n_pos") / F.col("n_rows").cast("double"),
                6,
            ).alias("lift_over_prevalence"),
        )
        .orderBy("c_mktsegment")
    )


QUERIES = {
    "stats_spearman_corr": stats_spearman_corr,
    "eval_roc_auc": eval_roc_auc,
    "stats_kendall_tau_vocab": stats_kendall_tau_vocab,
    "eval_pr_auc": eval_pr_auc,
}

ORACLE_SQL = {
    "stats_spearman_corr": """
        WITH ranked AS (
            SELECT l_returnflag,
                   RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_quantity)
                   + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
                      - 1) / 2.0 AS rq,
                   RANK() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice)
                   + (COUNT(*) OVER (PARTITION BY l_returnflag,
                                     l_extendedprice) - 1) / 2.0 AS rp
            FROM lineitem)
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(CORR(rq, rp), 6) AS spearman_rho
        FROM ranked
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "eval_roc_auc": """
        WITH j AS (
            SELECT c.c_mktsegment,
                   o.o_totalprice AS score,
                   CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS pos
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        ranked AS (
            SELECT c_mktsegment, pos,
                   RANK() OVER (PARTITION BY c_mktsegment ORDER BY score)
                   + (COUNT(*) OVER (PARTITION BY c_mktsegment, score)
                      - 1) / 2.0 AS r
            FROM j),
        g AS (
            SELECT c_mktsegment,
                   CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
                   SUM(CASE WHEN pos = 1 THEN r ELSE 0.0 END) AS r_pos
            FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n_pos, n_neg,
               ROUND((r_pos - CAST(n_pos AS DOUBLE)
                               * CAST(n_pos + 1 AS DOUBLE) / 2.0)
                     / NULLIF(CAST(n_pos AS DOUBLE)
                              * CAST(n_neg AS DOUBLE), 0.0), 6) AS auc,
               ROUND(((r_pos - CAST(n_pos AS DOUBLE)
                               * CAST(n_pos + 1 AS DOUBLE) / 2.0)
                     / NULLIF(CAST(n_pos AS DOUBLE)
                              * CAST(n_neg AS DOUBLE), 0.0)) * 2 - 1, 6)
                   AS gini
        FROM g
        ORDER BY c_mktsegment
    """,
}

ORACLE_SQL["stats_kendall_tau_vocab"] = """
    WITH base AS (
        SELECT l_returnflag AS flag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
        FROM lineitem),
    cells AS (
        SELECT flag, x, y, COUNT(*) AS n FROM base GROUP BY flag, x, y),
    cd AS (
        SELECT a.flag,
               SUM(CASE WHEN b.y > a.y THEN a.n * b.n ELSE 0 END) AS conc,
               SUM(CASE WHEN b.y < a.y THEN a.n * b.n ELSE 0 END) AS disc
        FROM cells a JOIN cells b ON a.flag = b.flag AND a.x < b.x
        GROUP BY a.flag),
    tot AS (SELECT flag, COUNT(*) AS nr FROM base GROUP BY flag),
    tx AS (
        SELECT flag, SUM(t * (t - 1) // 2) AS n1
        FROM (SELECT flag, x, SUM(n) AS t FROM cells GROUP BY flag, x)
        GROUP BY flag),
    ty AS (
        SELECT flag, SUM(t * (t - 1) // 2) AS n2
        FROM (SELECT flag, y, SUM(n) AS t FROM cells GROUP BY flag, y)
        GROUP BY flag)
    SELECT flag AS l_returnflag,
           CAST(nr AS BIGINT) AS n_rows,
           CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           ROUND(CAST(conc - disc AS DOUBLE)
                 / SQRT(CAST(nr * (nr - 1) // 2 - n1 AS DOUBLE)
                        * CAST(nr * (nr - 1) // 2 - n2 AS DOUBLE)), 6)
               AS kendall_tau_b
    FROM cd JOIN tot USING (flag) JOIN tx USING (flag) JOIN ty USING (flag)
    ORDER BY l_returnflag
"""

ORACLE_SQL["eval_pr_auc"] = """
    WITH j AS (
        SELECT c.c_mktsegment,
               o.o_totalprice AS score,
               o.o_orderkey AS okey,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS pos
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    ranked AS (
        SELECT c_mktsegment, pos,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY score DESC, okey) AS k,
               SUM(pos) OVER (PARTITION BY c_mktsegment
                              ORDER BY score DESC, okey
                              ROWS UNBOUNDED PRECEDING) AS cum_pos
        FROM j),
    g AS (
        SELECT c_mktsegment,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(CASE WHEN pos = 1
                              THEN CAST(cum_pos AS DOUBLE) / k
                              ELSE 0.0 END) / SUM(pos), 6)
                   AS avg_precision
        FROM ranked GROUP BY c_mktsegment)
    SELECT c_mktsegment, n_pos, n_rows, avg_precision,
           ROUND(avg_precision - n_pos / CAST(n_rows AS DOUBLE), 6)
               AS lift_over_prevalence
    FROM g
    ORDER BY c_mktsegment
"""


def stats_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-SHAPE profile per event type: skewness g1 =
    m3/m2^1.5 and excess kurtosis g2 = m4/m2^2 - 3 expanded from exact
    integer power sums in ONE partial-aggregable pass — the moments
    that tell you whether the mean/stddev pair (`agg_stats`) is even a
    faithful summary, and the built-in-free form chosen deliberately:
    engines disagree on skewness/kurtosis conventions (sample vs
    population, excess vs raw), so the engine-portable contract is the
    explicit population-moment expansion both sides compute
    identically.

    Exactness: cents^4 sums are the binding constraint — |cents| <=
    ~1e5 gives 1e20 per row, beyond BIGINT at row counts, so the
    4th-power sum alone goes through DECIMAL(38,0) (exact, mergeable);
    everything else stays BIGINT.  All divisions are identical IEEE
    trees over exact inputs."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("c"),
    )
    cells = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("s3"),
        F.sum(
            (F.col("c") * F.col("c")).cast("decimal(38,0)")
            * (F.col("c") * F.col("c")).cast("decimal(38,0)")
        ).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / (100.0 * n)
    # central moments from raw power sums (cents -> dollars at entry)
    r1 = F.col("s1").cast("double") / 100.0
    r2 = F.col("s2").cast("double") / 10000.0
    r3 = F.col("s3").cast("double") / 1000000.0
    r4 = F.col("s4").cast("double") / 100000000.0
    m2 = r2 / n - mu * mu
    m3 = r3 / n - 3.0 * mu * (r2 / n) + 2.0 * mu * mu * mu
    m4 = (
        r4 / n
        - 4.0 * mu * (r3 / n)
        + 6.0 * mu * mu * (r2 / n)
        - 3.0 * mu * mu * mu * mu
    )
    return (
        cells.select(
            "event_type",
            F.col("n").cast("long").alias("n_rows"),
            F.round(mu, 6).alias("mean"),
            F.round(F.sqrt(m2), 6).alias("pop_stddev"),
            F.round(m3 / F.pow(m2, F.lit(1.5)), 6).alias("skewness"),
            F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
        )
        .orderBy("event_type")
    )


QUERIES["stats_skew_kurtosis"] = stats_skew_kurtosis
ORACLE_SQL["stats_skew_kurtosis"] = """
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS c
        FROM events),
    cells AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(c) AS s1, SUM(c * c) AS s2, SUM(c * c * c) AS s3,
               SUM(CAST(c * c AS DECIMAL(38,0))
                   * CAST(c * c AS DECIMAL(38,0))) AS s4
        FROM ev GROUP BY event_type),
    m AS (
        SELECT event_type, n,
               s1 / (100.0 * n) AS mu,
               CAST(s1 AS DOUBLE) / 100.0 AS r1,
               CAST(s2 AS DOUBLE) / 10000.0 AS r2,
               CAST(s3 AS DOUBLE) / 1000000.0 AS r3,
               CAST(s4 AS DOUBLE) / 100000000.0 AS r4
        FROM cells),
    cm AS (
        SELECT event_type, n, mu,
               r2 / n - mu * mu AS m2,
               r3 / n - 3.0 * mu * (r2 / n) + 2.0 * mu * mu * mu AS m3,
               r4 / n - 4.0 * mu * (r3 / n) + 6.0 * mu * mu * (r2 / n)
                   - 3.0 * mu * mu * mu * mu AS m4
        FROM m)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           ROUND(mu, 6) AS mean,
           ROUND(SQRT(m2), 6) AS pop_stddev,
           ROUND(m3 / POWER(m2, 1.5), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM cm
    ORDER BY event_type
"""


def stats_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (purchase vs click
    spend), with the Welch-Satterthwaite degrees of freedom — the
    default two-group mean comparison when variances can't be assumed
    equal (the A/B-testing companion to ``stats_mann_whitney``'s rank
    form and ``stats_brown_forsythe``'s variance-homogeneity check).

    Scale: ONE conditional-aggregation pass over events produces six
    exact integer moments (cents-grid counts/sums/sum-of-squares per
    arm, map-side combinable); the t statistic and df are a handful of
    double ops on that single row.  No shuffle wider than the 1-row
    global aggregate — the same sufficient-statistics discipline as
    ml_linreg_normal_eq.  Products of whole-arm sums go through doubles
    (exact inputs, correctly-rounded identical IEEE trees in both
    engines); the normal-approximation reject flag at |t| > 1.96 avoids
    shipping a t-CDF (df > 1000 here, where t and z agree to 3
    decimals)."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_p = F.col("event_type") == "purchase"
    m = ev.select(cents.alias("c"), is_p.alias("p")).agg(
        F.sum(F.when(F.col("p"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("p"), F.col("c")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("p"), F.col("c") * F.col("c")).otherwise(0)).alias(
            "ss1"
        ),
        F.sum(F.when(~F.col("p"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~F.col("p"), F.col("c")).otherwise(0)).alias("s2"),
        F.sum(
            F.when(~F.col("p"), F.col("c") * F.col("c")).otherwise(0)
        ).alias("ss2"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    m1 = d("s1") / d("n1")
    m2 = d("s2") / d("n2")
    v1 = (d("ss1") - d("s1") * d("s1") / d("n1")) / (d("n1") - 1.0)
    v2 = (d("ss2") - d("s2") * d("s2") / d("n2")) / (d("n2") - 1.0)
    se1 = v1 / d("n1")
    se2 = v2 / d("n2")
    t = (m1 - m2) / F.sqrt(se1 + se2)
    df = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (d("n1") - 1.0) + se2 * se2 / (d("n2") - 1.0)
    )
    return m.select(
        F.col("n1").alias("n_purchase"),
        F.col("n2").alias("n_click"),
        F.round(m1 / 100.0, 6).alias("mean_purchase"),
        F.round(m2 / 100.0, 6).alias("mean_click"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 3).alias("df_welch"),
        (F.abs(t) > F.lit(1.96)).cast("long").alias("reject_95"),
    )


QUERIES["stats_welch_ttest"] = stats_welch_ttest
ORACLE_SQL["stats_welch_ttest"] = """
    WITH m AS (
        SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS s1,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS ss1,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2,
            SUM(CASE WHEN event_type = 'click'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS s2,
            SUM(CASE WHEN event_type = 'click'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS ss2
        FROM events
        WHERE event_type IN ('purchase', 'click')),
    c AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / n1 AS m1,
               CAST(s2 AS DOUBLE) / n2 AS m2,
               ((CAST(ss1 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                / (n1 - 1.0)) / n1 AS se1,
               ((CAST(ss2 AS DOUBLE)
                 - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
                / (n2 - 1.0)) / n2 AS se2
        FROM m)
    SELECT CAST(n1 AS BIGINT) AS n_purchase,
           CAST(n2 AS BIGINT) AS n_click,
           ROUND(m1 / 100.0, 6) AS mean_purchase,
           ROUND(m2 / 100.0, 6) AS mean_click,
           ROUND((m1 - m2) / SQRT(se1 + se2), 6) AS t_stat,
           ROUND((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (n1 - 1.0) + se2 * se2 / (n2 - 1.0)), 3)
               AS df_welch,
           CAST(ABS((m1 - m2) / SQRT(se1 + se2)) > 1.96 AS BIGINT)
               AS reject_95
    FROM c
"""


def stats_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER ANALYSIS from observed arm variances: the
    minimum detectable effect (MDE) at alpha = 0.05 two-sided / 80%
    power for the purchase-vs-click comparison at CURRENT sample
    sizes, plus the per-arm n required to detect a 2% relative lift —
    the sizing table every A/B platform prints before a launch
    decision (completing the pack: CUPED reduces the variance this
    query turns into required-n, SRM checks the split, TOST reads the
    equivalence side).

    MDE = (z_{1-a/2} + z_{power}) * sqrt(v1/n1 + v2/n2); required
    n/arm = (z_{1-a/2} + z_{power})^2 * (v1 + v2) / delta^2.  The z
    constants are pinned literals (1.959964, 0.841621 — the normal
    quantiles; exact to 6dp, the same approximation the reject flag in
    ``stats_welch_ttest`` documents), so the whole query is ONE
    conditional-aggregation pass producing six exact cent-grid moments
    and a handful of identical double ops — no data-sized work beyond
    the single scan at any corpus size."""
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    is_p = F.col("event_type") == "purchase"
    m = ev.select(cents.alias("c"), is_p.alias("p")).agg(
        F.sum(F.when(F.col("p"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("p"), F.col("c")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("p"), F.col("c") * F.col("c")).otherwise(0)).alias(
            "ss1"
        ),
        F.sum(F.when(~F.col("p"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(~F.col("p"), F.col("c")).otherwise(0)).alias("s2"),
        F.sum(
            F.when(~F.col("p"), F.col("c") * F.col("c")).otherwise(0)
        ).alias("ss2"),
    )

    def d(c: str):
        return F.col(c).cast("double")

    z = F.lit(1.959964) + F.lit(0.841621)
    v1 = (d("ss1") - d("s1") * d("s1") / d("n1")) / (d("n1") - 1.0)
    v2 = (d("ss2") - d("s2") * d("s2") / d("n2")) / (d("n2") - 1.0)
    mde_cents = z * F.sqrt(v1 / d("n1") + v2 / d("n2"))
    m2 = d("s2") / d("n2")
    delta = F.lit(0.02) * m2
    n_req = z * z * (v1 + v2) / (delta * delta)
    return m.select(
        F.col("n1").alias("n_treat"),
        F.col("n2").alias("n_control"),
        F.round(mde_cents / 100.0, 6).alias("mde_abs"),
        F.round(mde_cents / m2, 6).alias("mde_rel"),
        F.round(F.ceil(n_req).cast("double"), 1).alias("n_per_arm_2pct"),
    )


QUERIES["stats_power_mde"] = stats_power_mde
ORACLE_SQL["stats_power_mde"] = """
    WITH m AS (
        SELECT
            SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n1,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS s1,
            SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS ss1,
            SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n2,
            SUM(CASE WHEN event_type = 'click'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS s2,
            SUM(CASE WHEN event_type = 'click'
                THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                   * CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
                AS ss2
        FROM events
        WHERE event_type IN ('purchase', 'click')),
    c AS (
        SELECT n1, n2,
               (CAST(ss1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               / (n1 - 1.0) AS v1,
               (CAST(ss2 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               / (n2 - 1.0) AS v2,
               CAST(s2 AS DOUBLE) / n2 AS m2
        FROM m)
    SELECT CAST(n1 AS BIGINT) AS n_treat,
           CAST(n2 AS BIGINT) AS n_control,
           ROUND((1.959964 + 0.841621)
                 * SQRT(v1 / n1 + v2 / n2) / 100.0, 6) AS mde_abs,
           ROUND((1.959964 + 0.841621)
                 * SQRT(v1 / n1 + v2 / n2) / m2, 6) AS mde_rel,
           ROUND(CAST(CEIL((1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * (v1 + v2) / ((0.02 * m2) * (0.02 * m2)))
                 AS DOUBLE), 1) AS n_per_arm_2pct
    FROM c
"""
