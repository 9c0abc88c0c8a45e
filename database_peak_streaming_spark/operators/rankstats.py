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
            F.round(
                m3 / F.nullif(F.pow(m2, F.lit(1.5)), F.lit(0.0)), 6
            ).alias("skewness"),
            F.round(
                m4 / F.nullif(m2 * m2, F.lit(0.0)) - 3.0, 6
            ).alias("excess_kurtosis"),
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
           ROUND(m3 / NULLIF(POWER(m2, 1.5), 0.0), 6) AS skewness,
           ROUND(m4 / NULLIF(m2 * m2, 0.0) - 3.0, 6) AS excess_kurtosis
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


#: chi-square 95th percentile at k-1 = 4 degrees of freedom
FRIEDMAN_CHI2_95_DF4 = 9.4877


def stats_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test across the five event types BLOCKED by day:
    the nonparametric repeated-measures ANOVA ("do the treatments
    differ, controlling for the day effect?") that completes the
    hypothesis-test shelf beside the unblocked one-way ANOVA
    (``stats_anova_f``) and the two-sample Mann-Whitney U.  Blocks are
    calendar days with all k types present; the response is the daily
    event count; ranks use the mid-rank tie convention.

    Tie-corrected statistic:  Q = (k-1) * sum_j (R_j - n(k+1)/2)^2 /
    (sum_ij r_ij^2 - n k (k+1)^2 / 4)  — with mid-ranks every quantity
    is an exact multiple of 1/4 in double, so all sums are exact and
    order-free; the single float division happens once at the end.
    Rejection is against the fixed chi-square(4) 95% critical value
    carried as a literal in both engines.

    Scale: one data-sized groupBy to (day, type) counts; everything
    downstream runs on the calendar-bounded block grid.  The per-block
    rank window sorts k=5 values per day — trivially parallel by
    block."""
    ev = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("x")
    )
    stats = daily.agg(F.countDistinct("event_type").alias("k"))
    present = daily.groupBy("day").agg(F.count(F.lit(1)).alias("present"))
    complete = (
        daily.join(present, "day")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("present") == F.col("k"))
    )
    ranked = complete.select(
        "day",
        "event_type",
        "k",
        _mid_rank(["day"], "x").alias("r"),
    )
    g = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rj"),
        F.sum(F.col("r") * F.col("r")).alias("rsqj"),
        F.count(F.lit(1)).alias("nb"),
        F.max("k").alias("k"),
    )
    total = g.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.max("nb").alias("n"),
        F.sum("rsqj").alias("rsq"),
    )
    d = F.col("rj") - (F.col("n") * (F.col("k") + F.lit(1))) / F.lit(2.0)
    terms = (
        g.drop("k")
        .crossJoin(F.broadcast(total))
        .select("k", "n", "rsq", (d * d).alias("term"))
    )
    agg = terms.groupBy("k", "n", "rsq").agg(F.sum("term").alias("num"))
    den = F.nullif(
        F.col("rsq")
        - (
            F.col("n")
            * F.col("k")
            * (F.col("k") + F.lit(1))
            * (F.col("k") + F.lit(1))
        )
        / F.lit(4.0),
        F.lit(0.0),
    )
    q_stat = F.round(((F.col("k") - F.lit(1)) * F.col("num")) / den, 6)
    return agg.select(
        F.col("n").cast("long").alias("n_blocks"),
        F.col("k").cast("long").alias("k_treatments"),
        q_stat.alias("q_stat"),
        (q_stat > F.lit(FRIEDMAN_CHI2_95_DF4)).cast("long").alias(
            "rejected_95"
        ),
    )


QUERIES["stats_friedman_test"] = stats_friedman_test
ORACLE_SQL["stats_friedman_test"] = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    kk AS (SELECT COUNT(DISTINCT event_type) AS k FROM daily),
    present AS (SELECT day, COUNT(*) AS present FROM daily GROUP BY 1),
    complete AS (
        SELECT d.day, d.event_type, d.x, kk.k
        FROM daily d JOIN present p USING (day) CROSS JOIN kk
        WHERE p.present = kk.k),
    ranked AS (
        SELECT day, event_type, k,
               RANK() OVER (PARTITION BY day ORDER BY x)
                   + (COUNT(*) OVER (PARTITION BY day, x) - 1) / 2.0 AS r
        FROM complete),
    g AS (
        SELECT event_type,
               SUM(r) AS rj,
               SUM(r * r) AS rsqj,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM ranked GROUP BY 1),
    t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(MAX(nb) AS BIGINT) AS n,
               SUM(rsqj) AS rsq
        FROM g),
    terms AS (
        SELECT t.k, t.n, t.rsq,
               (g.rj - (t.n * (t.k + 1)) / 2.0)
                   * (g.rj - (t.n * (t.k + 1)) / 2.0) AS term
        FROM g CROSS JOIN t),
    agg AS (
        SELECT k, n, rsq, SUM(term) AS num
        FROM terms GROUP BY 1, 2, 3)
    SELECT n AS n_blocks,
           k AS k_treatments,
           ROUND(((k - 1) * num)
                 / (rsq - (n * k * (k + 1) * (k + 1)) / 4.0), 6) AS q_stat,
           CAST(ROUND(((k - 1) * num)
                      / (rsq - (n * k * (k + 1) * (k + 1)) / 4.0), 6)
                > {FRIEDMAN_CHI2_95_DF4} AS BIGINT) AS rejected_95
    FROM agg
"""


def model_lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table of the pinned sigmoid scorer
    against the urgent/high-priority label: orders are ranked by score
    into deciles (NTILE over (score desc, key) — engine-identical
    bucket sizes and assignment) and each decile reports its positive
    count, the cumulative capture rate ("top 30% of scores captures
    G% of all positives") and the lift over random targeting — the
    campaign-planning view of the same ranking that
    ``eval_roc_auc``/``eval_pr_auc`` summarize to one number.

    Every presented ratio is a single division of exact BIGINT
    products (gain = cum_pos/total_pos; lift = (cum_pos * total_n) /
    (total_pos * cum_n)), so both engines agree exactly before the
    6-dp round.

    Scale note: the global NTILE is a full sort at the limit; the
    documented swap is approx-percentile score boundaries broadcast to
    a map-only bucketizer (the module-docstring binned-rank design) —
    decile populations then come from the same tiny rollup."""
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
    scored = o.select(
        "o_orderkey", score.alias("score"), label.alias("label")
    )
    w_rank = Window.orderBy(F.desc("score"), "o_orderkey")
    g = (
        scored.withColumn("decile", F.ntile(10).over(w_rank))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("n_pos"),
        )
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    c = g.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_cum).alias("cum_n"),
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
        F.sum("n").over(w_all).alias("tot_n"),
        F.sum("n_pos").over(w_all).alias("tot_pos"),
    )
    return c.select(
        F.col("decile").cast("long").alias("decile"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("cum_pos").cast("long").alias("cum_pos"),
        F.round(
            F.col("cum_pos") / F.nullif(F.col("tot_pos").cast("double"), F.lit(0.0)),
            6,
        ).alias("gain"),
        F.round(
            (F.col("cum_pos") * F.col("tot_n"))
            / F.nullif(
                (F.col("tot_pos") * F.col("cum_n")).cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("lift"),
    ).orderBy("decile")


QUERIES["model_lift_gains_deciles"] = model_lift_gains_deciles
ORACLE_SQL["model_lift_gains_deciles"] = """
    WITH scored AS (
        SELECT o_orderkey,
               ROUND(1.0 / (1.0 + EXP(-(0.35 * LN(1.0 + o_totalprice)
                                        + -2.0))), 6) AS score,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS label
        FROM orders),
    dec AS (
        SELECT NTILE(10) OVER (ORDER BY score DESC, o_orderkey) AS decile,
               label
        FROM scored),
    g AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(label) AS BIGINT) AS n_pos
        FROM dec GROUP BY 1),
    c AS (
        SELECT decile, n, n_pos,
               CAST(SUM(n) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_n,
               CAST(SUM(n_pos) OVER (ORDER BY decile ROWS BETWEEN
                                     UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_pos,
               CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
               CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
        FROM g)
    SELECT CAST(decile AS BIGINT) AS decile,
           n, n_pos, cum_pos,
           ROUND(cum_pos / tot_pos, 6) AS gain,
           ROUND((cum_pos * tot_n) / (tot_pos * cum_n), 6) AS lift
    FROM c ORDER BY decile
"""


#: two-sided normal 95% critical value (shared literal, both engines)
CA_Z_95 = 1.959964


def stats_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage test for a LINEAR TREND in proportions across
    ordered groups: is the purchase share drifting across the days of
    the month?  The ordered-alternative test that a plain chi-square
    homogeneity check (``source_lang_drift_chi2``) has no power for —
    the standard epidemiology/conversion-funnel dose-response check.

    With integer day scores s_i, positives r_i and totals n_i, the
    statistic is  Z = (A - R*B/N) / sqrt((R(N-R)/N) * (C - B^2/N))
    from five exact BIGINT moments (A = sum s_i r_i, B = sum s_i n_i,
    C = sum s_i^2 n_i) — both engines evaluate the identical IEEE
    expression tree on identical integers, and sqrt is
    correctly-rounded, so the result is engine-exact before the 6-dp
    round.

    Scale: ONE conditional-aggregation pass over events (map-side
    combinable, 31-key rollup); the statistic assembles on one row."""
    ev = load_table(spark, "events", sf_dir).select(
        F.dayofmonth("ts").alias("s"),
        (F.col("event_type") == "purchase").cast("long").alias("pos"),
    )
    g = ev.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_i"),
        F.sum("pos").alias("r_i"),
    )
    m = g.agg(
        F.sum("n_i").alias("n"),
        F.sum("r_i").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).alias("a"),
        F.sum(F.col("s") * F.col("n_i")).alias("b"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i")).alias("c"),
        F.count(F.lit(1)).alias("k_groups"),
    )
    t_num = F.col("a") - (F.col("r") * F.col("b")) / F.col("n")
    v1 = (F.col("r") * (F.col("n") - F.col("r"))) / F.col("n")
    v2 = F.col("c") - (F.col("b") * F.col("b")) / F.col("n")
    z = F.round(t_num / F.nullif(F.sqrt(v1 * v2), F.lit(0.0)), 6)
    return m.select(
        F.col("n").cast("long").alias("n_total"),
        F.col("r").cast("long").alias("n_pos"),
        F.col("k_groups").cast("long").alias("k_groups"),
        z.alias("z_trend"),
        (F.abs(z) > F.lit(CA_Z_95)).cast("long").alias("rejected_95"),
    )


QUERIES["stats_cochran_armitage_trend"] = stats_cochran_armitage_trend
ORACLE_SQL["stats_cochran_armitage_trend"] = f"""
    WITH ev AS (
        SELECT CAST(DAY(ts) AS BIGINT) AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
        FROM events),
    g AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS n_i,
               CAST(SUM(pos) AS BIGINT) AS r_i
        FROM ev GROUP BY 1),
    m AS (
        SELECT CAST(SUM(n_i) AS BIGINT) AS n,
               CAST(SUM(r_i) AS BIGINT) AS r,
               CAST(SUM(s * r_i) AS BIGINT) AS a,
               CAST(SUM(s * n_i) AS BIGINT) AS b,
               CAST(SUM(s * s * n_i) AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS k_groups
        FROM g)
    SELECT n AS n_total,
           r AS n_pos,
           k_groups,
           ROUND((a - (r * b) / n)
                 / SQRT(((r * (n - r)) / n) * (c - (b * b) / n)), 6)
               AS z_trend,
           CAST(ABS(ROUND((a - (r * b) / n)
                          / SQRT(((r * (n - r)) / n)
                                 * (c - (b * b) / n)), 6))
                > {CA_Z_95} AS BIGINT) AS rejected_95
    FROM m
"""


def stats_hodges_lehmann_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann pseudo-median of the per-type DAILY event volume:
    the median of all Walsh averages (x_i + x_j)/2 over day pairs
    i <= j — the robust location estimate associated with the Wilcoxon
    signed-rank test (~95% Gaussian efficiency vs the plain median's
    64%), presented beside the plain median as the level summary a
    volume monitor should alarm on.

    Determinism: daily counts are exact BIGINTs, Walsh averages exact
    half-integers, the median pick is a fully tie-broken order
    statistic (value, i, j), and an even pair count averages two exact
    halves — no float accumulation anywhere.

    Scale: the pair fan-out is over the CALENDAR (days^2 per type
    after the one data-sized daily rollup), the Theil-Sen bounding
    argument exactly."""
    ev = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("x")
    )
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    walsh = (
        a.join(b, "event_type")
        .where(F.col("d1") <= F.col("d2"))
        .select(
            "event_type",
            "d1",
            "d2",
            ((F.col("x1") + F.col("x2")) / F.lit(2.0)).alias("w"),
        )
    )
    w_rank = Window.partitionBy("event_type").orderBy("w", "d1", "d2")
    w_all = Window.partitionBy("event_type")
    ranked = walsh.select(
        "event_type",
        "w",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    )
    mids = ranked.where(
        (F.col("rn") == F.expr("(m + 1) div 2"))
        | (F.col("rn") == F.expr("m div 2 + 1"))
    )
    hl = mids.groupBy("event_type").agg(
        F.round(F.avg("w"), 6).alias("hl_center"),
        F.max("m").cast("long").alias("n_pairs"),
    )
    med = daily.groupBy("event_type").agg(
        F.round(F.median("x"), 6).alias("plain_median"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return (
        hl.join(med, "event_type")
        .select("event_type", "n_days", "n_pairs", "hl_center", "plain_median")
        .orderBy("event_type")
    )


QUERIES["stats_hodges_lehmann_daily"] = stats_hodges_lehmann_daily
ORACLE_SQL["stats_hodges_lehmann_daily"] = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    walsh AS (
        SELECT a.event_type, a.day AS d1, b.day AS d2,
               (a.x + b.x) / 2.0 AS w
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day <= b.day),
    ranked AS (
        SELECT event_type, w,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY w, d1, d2) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
        FROM walsh),
    hl AS (
        SELECT event_type,
               ROUND(AVG(w), 6) AS hl_center,
               CAST(MAX(m) AS BIGINT) AS n_pairs
        FROM ranked
        WHERE rn = (m + 1) // 2 OR rn = m // 2 + 1
        GROUP BY 1),
    med AS (
        SELECT event_type,
               ROUND(MEDIAN(x), 6) AS plain_median,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY 1)
    SELECT h.event_type, m.n_days, h.n_pairs, h.hl_center, m.plain_median
    FROM hl h JOIN med m USING (event_type)
    ORDER BY h.event_type
"""


def stats_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of the per-type daily
    volume series: days are signed above/below the per-type median
    (equal-to-median days excluded, the standard convention), R = the
    number of sign runs, and Z = (R - mu)/sigma with
    mu = 2 n1 n2/(n1+n2) + 1 and
    sigma^2 = 2 n1 n2 (2 n1 n2 - n1 - n2) / ((n1+n2)^2 (n1+n2-1)) —
    the serial-dependence check that complements Ljung-Box's
    magnitude-based view with a sign-based one (trend/clustering shows
    up as too FEW runs, oscillation as too MANY).

    Determinism: daily counts are exact BIGINTs, the median of longs
    is an exact .0/.5 double, sign comparisons and the run count are
    integers, and mu/sigma assemble from exact integers through one
    fixed IEEE expression tree per type (sqrt correctly rounded).

    Scale: one data-sized groupBy to (type, day); the sign/lag window
    and the closed-form statistic run on the calendar-bounded grid."""
    ev = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("x")
    )
    med = daily.groupBy("event_type").agg(F.median("x").alias("med"))
    signed = (
        daily.join(med, "event_type")
        .filter(F.col("x") != F.col("med"))
        .select(
            "event_type",
            "day",
            (F.col("x") > F.col("med")).cast("int").alias("sgn"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    flagged = signed.select(
        "event_type",
        "sgn",
        F.when(
            F.lag("sgn").over(w).isNull()
            | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    g = flagged.groupBy("event_type").agg(
        F.sum("new_run").alias("runs"),
        F.sum("sgn").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n2"),
    )
    n = F.col("n1") + F.col("n2")
    mu = (F.lit(2) * F.col("n1") * F.col("n2")) / n + F.lit(1)
    var = (
        F.lit(2)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2) * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
    ) / F.nullif((n * n * (n - F.lit(1))).cast("double"), F.lit(0.0))
    z = F.round((F.col("runs") - mu) / F.nullif(F.sqrt(var), F.lit(0.0)), 6)
    return (
        g.select(
            "event_type",
            F.col("runs").cast("long").alias("n_runs"),
            F.col("n1").cast("long").alias("n_above"),
            F.col("n2").cast("long").alias("n_below"),
            z.alias("z_runs"),
            (F.abs(z) > F.lit(CA_Z_95)).cast("long").alias("rejected_95"),
        )
        .orderBy("event_type")
    )


QUERIES["stats_runs_test"] = stats_runs_test
ORACLE_SQL["stats_runs_test"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    med AS (
        SELECT event_type, MEDIAN(x) AS med FROM daily GROUP BY 1),
    signed AS (
        SELECT d.event_type, d.day,
               CASE WHEN d.x > m.med THEN 1 ELSE 0 END AS sgn
        FROM daily d JOIN med m USING (event_type)
        WHERE d.x <> m.med),
    flagged AS (
        SELECT event_type, sgn,
               CASE WHEN LAG(sgn) OVER w IS NULL
                      OR LAG(sgn) OVER w <> sgn THEN 1 ELSE 0 END
                   AS new_run
        FROM signed
        WINDOW w AS (PARTITION BY event_type ORDER BY day)),
    g AS (
        SELECT event_type,
               CAST(SUM(new_run) AS BIGINT) AS runs,
               CAST(SUM(sgn) AS BIGINT) AS n1,
               CAST(SUM(1 - sgn) AS BIGINT) AS n2
        FROM flagged GROUP BY 1)
    SELECT event_type,
           runs AS n_runs,
           n1 AS n_above,
           n2 AS n_below,
           ROUND((runs - ((2 * n1 * n2) / (n1 + n2) + 1))
                 / SQRT((2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1))), 6)
               AS z_runs,
           CAST(ABS(ROUND((runs - ((2 * n1 * n2) / (n1 + n2) + 1))
                          / SQRT((2 * n1 * n2 * (2 * n1 * n2 - n1 - n2))
                                 / ((n1 + n2) * (n1 + n2)
                                    * (n1 + n2 - 1))), 6))
                > {CA_Z_95} AS BIGINT) AS rejected_95
    FROM g
    ORDER BY event_type
"""


def stats_g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-test (log-likelihood ratio) of independence between document
    language and source: G = 2 sum_ij O_ij ln(O_ij / E_ij) with
    E_ij = row_i * col_j / N — the information-theoretic twin of the
    Pearson chi-square already surfaced (``source_lang_drift_chi2`` /
    ``stats_cramers_v``); G = 2N * MI(nats), so this also cross-checks
    ``stats_mutual_information``.  Both statistics are emitted side by
    side: they agree asymptotically and diverge on sparse cells, which
    is itself diagnostic.

    Determinism: contingency cells and marginals are exact BIGINTs
    (one pass); the <= langs x sources float terms use LN over exact
    integer ratios (the MI discipline) and sum inside the 6-dp round.

    The Pearson statistic uses the identity chi2 = sum(O^2/E) - N
    (round-9 ADVICE): structurally-absent lang x source cells each
    contribute exactly E_ij to sum((O-E)^2/E), and sum_all(E) = N, so
    folding over OBSERVED cells with O^2/E and subtracting N yields
    the FULL-grid statistic — consistent with the (r-1)(c-1) dof
    emitted — without materializing empty cells.  (G's empty cells
    contribute 0 by the 0*ln(0) convention, so g_stat needs no such
    correction.)

    Scale: one data-sized groupBy to the contingency table; everything
    after runs on vocabulary-bounded cells."""
    d = load_table(spark, "documents", sf_dir)
    cells = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    wr = Window.partitionBy("lang")
    wc = Window.partitionBy("source")
    wall = Window.partitionBy()
    t = cells.select(
        "o",
        F.sum("o").over(wr).alias("ri"),
        F.sum("o").over(wc).alias("cj"),
        F.sum("o").over(wall).alias("n"),
    )
    e = (F.col("ri") * F.col("cj")) / F.col("n")
    terms = t.select(
        "o",
        "n",
        (F.col("o") * F.log(F.col("o") / e)).alias("g_term"),
        ((F.col("o") * F.col("o")) / e).alias("x2_term"),
    )
    sizes = cells.agg(
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    agg = terms.groupBy("n").agg(
        F.sum("g_term").alias("g_half"),
        F.sum("x2_term").alias("x2"),
    )
    return agg.crossJoin(F.broadcast(sizes)).select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("r").cast("long").alias("r_langs"),
        F.col("c").cast("long").alias("c_sources"),
        ((F.col("r") - F.lit(1)) * (F.col("c") - F.lit(1)))
        .cast("long")
        .alias("dof"),
        F.round(F.lit(2.0) * F.col("g_half"), 6).alias("g_stat"),
        F.round(F.col("x2") - F.col("n").cast("double"), 6).alias(
            "chi2_stat"
        ),
    )


QUERIES["stats_g_test_independence"] = stats_g_test_independence
ORACLE_SQL["stats_g_test_independence"] = """
    WITH cells AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        FROM documents GROUP BY 1, 2),
    t AS (
        SELECT o,
               CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS ri,
               CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS cj,
               CAST(SUM(o) OVER () AS BIGINT) AS n
        FROM cells),
    terms AS (
        SELECT o, n,
               o * LN(o / ((ri * cj) / n)) AS g_term,
               (o * o) / ((ri * cj) / n) AS x2_term
        FROM t),
    dims AS (
        SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS c
        FROM cells),
    agg AS (
        SELECT n, SUM(g_term) AS g_half, SUM(x2_term) AS x2
        FROM terms GROUP BY 1)
    SELECT n AS n_docs,
           dims.r AS r_langs,
           dims.c AS c_sources,
           (dims.r - 1) * (dims.c - 1) AS dof,
           ROUND(2.0 * g_half, 6) AS g_stat,
           ROUND(x2 - CAST(n AS DOUBLE), 6) AS chi2_stat
    FROM agg CROSS JOIN dims
"""


#: chi-square(2) 95th percentile — Jarque-Bera rejection bar
JB_CHI2_95_DF2 = 5.9915


def stats_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test per event type:
    JB = n/6 (g1^2 + g2^2/4) from the same exact-integer power-sum
    pipeline as ``stats_skew_kurtosis`` — the omnibus "is Gaussian
    even plausible?" gate that decides whether the parametric shelf
    (ANOVA, Welch t) or the rank shelf (Mann-Whitney, Friedman)
    applies.  Rejection against the fixed chi-square(2) 95% critical
    value, a shared literal.

    g1/g2 are rounded to the 6-dp canon grid FIRST (the published
    skew/kurtosis surface), then JB is one fixed expression of those
    rounded values — deterministic by construction.

    Scale: identical ONE-pass moment aggregation as the shape profile;
    the statistic assembles on k rows."""
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
    g1 = F.round(m3 / F.nullif(F.pow(m2, F.lit(1.5)), F.lit(0.0)), 6)
    g2 = F.round(m4 / F.nullif(m2 * m2, F.lit(0.0)) - 3.0, 6)
    jb = F.round((n / F.lit(6.0)) * (g1 * g1 + (g2 * g2) / F.lit(4.0)), 6)
    return (
        cells.select(
            "event_type",
            F.col("n").cast("long").alias("n_rows"),
            g1.alias("skewness"),
            g2.alias("excess_kurtosis"),
            jb.alias("jb_stat"),
            (jb > F.lit(JB_CHI2_95_DF2)).cast("long").alias(
                "normality_rejected_95"
            ),
        )
        .orderBy("event_type")
    )


QUERIES["stats_jarque_bera"] = stats_jarque_bera
ORACLE_SQL["stats_jarque_bera"] = f"""
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
        FROM m),
    g AS (
        SELECT event_type, n,
               ROUND(m3 / NULLIF(POWER(m2, 1.5), 0.0), 6) AS g1,
               ROUND(m4 / NULLIF(m2 * m2, 0.0) - 3.0, 6) AS g2
        FROM cm)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           g1 AS skewness,
           g2 AS excess_kurtosis,
           ROUND((n / 6.0) * (g1 * g1 + (g2 * g2) / 4.0), 6) AS jb_stat,
           CAST(ROUND((n / 6.0) * (g1 * g1 + (g2 * g2) / 4.0), 6)
                > {JB_CHI2_95_DF2} AS BIGINT) AS normality_rejected_95
    FROM g
    ORDER BY event_type
"""


def stats_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on the per-type daily volume:
    S = sum over day pairs i<j of sign(x_j - x_i), tie-corrected
    variance, and the continuity-corrected Z — the nonparametric
    SIGNIFICANCE companion to ``ts_theil_sen_trend``'s slope estimate
    (the standard pairing in environmental/monitoring statistics:
    Theil-Sen says how steep, Mann-Kendall says whether it's real).

    Everything through the final division is exact integers: S from
    sign comparisons, var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)]/18
    from the tie-group counts; Z applies the +/-1 continuity
    correction by exact CASE.

    Scale: pair fan-out over the CALENDAR (the Theil-Sen bounding
    argument); tie groups come from a value-vocabulary rollup."""
    ev = load_table(spark, "events", sf_dir).select(
        F.to_date("ts").alias("day"), "event_type"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("x")
    )
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("x").alias("x1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("x").alias("x2")
    )
    s_stat = (
        a.join(b, "event_type")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("x2") - F.col("x1")).cast("long")).alias(
                "s"
            ),
        )
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum("t").alias("n"),
        )
    )
    j = s_stat.join(ties, "event_type")
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    sd = F.nullif(F.sqrt(var_s), F.lit(0.0))
    z = F.round(
        F.when(F.col("s") > 0, (F.col("s") - 1) / sd)
        .when(F.col("s") < 0, (F.col("s") + 1) / sd)
        .otherwise(F.lit(0.0)),
        6,
    )
    return (
        j.select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            F.col("s").cast("long").alias("s_stat"),
            z.alias("z_mk"),
            (F.abs(z) > F.lit(CA_Z_95)).cast("long").alias("rejected_95"),
        )
        .orderBy("event_type")
    )


QUERIES["stats_mann_kendall_trend"] = stats_mann_kendall_trend
ORACLE_SQL["stats_mann_kendall_trend"] = f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2),
    s_stat AS (
        SELECT a.event_type,
               CAST(SUM(SIGN(b.x - a.x)) AS BIGINT) AS s
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
        GROUP BY 1),
    ties AS (
        SELECT event_type,
               CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t
              FROM daily GROUP BY 1, 2)
        GROUP BY 1),
    j AS (
        SELECT s_stat.event_type, s, tie_term, n,
               (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0 AS var_s
        FROM s_stat JOIN ties USING (event_type)),
    zz AS (
        SELECT event_type, n, s,
               ROUND(CASE WHEN s > 0
                          THEN (s - 1) / NULLIF(SQRT(var_s), 0.0)
                          WHEN s < 0
                          THEN (s + 1) / NULLIF(SQRT(var_s), 0.0)
                          ELSE 0.0 END, 6) AS z_mk
        FROM j)
    SELECT event_type,
           n AS n_days,
           s AS s_stat,
           z_mk,
           CAST(ABS(z_mk) > {CA_Z_95} AS BIGINT) AS rejected_95
    FROM zz
    ORDER BY event_type
"""


def stats_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the five event types' values — the
    k-sample rank ANOVA that completes the rank-test family:
    Mann-Whitney is its two-sample case, Friedman its blocked cousin,
    and it answers the one-way ANOVA question (``stats_anova_f``)
    without the normality assumption the Jarque-Bera gate may reject.
    Tie-corrected: H / (1 - sum(t^3 - t)/(N^3 - N)); rejection against
    chi-square(4) 95%.

    Mid-ranks over the pooled cent-quantized values are exact
    half-integers (the module's rank discipline), so every sum is
    order-free; the tie correction uses the value-vocabulary collapse;
    one float division chain at the end.

    Scale: the global rank window is the module-note single-sort
    bound, with the documented binned-rank swap; everything after the
    rank sums is k-bounded."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    ranked = ev.select(
        "event_type",
        _mid_rank([], "m").alias("r"),
    )
    g = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rj"),
        F.count(F.lit(1)).alias("nj"),
    )
    total = (
        ev.groupBy("m")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_sum"),
            F.sum("t").alias("n"),
        )
    )
    terms = g.crossJoin(F.broadcast(total)).select(
        "n",
        "tie_sum",
        ((F.col("rj") * F.col("rj")) / F.col("nj").cast("double")).alias(
            "term"
        ),
        F.lit(1).alias("one"),
    )
    agg = terms.groupBy("n", "tie_sum").agg(
        F.sum("term").alias("rsum"),
        F.count(F.lit(1)).alias("k"),
    )
    n = F.col("n")
    h_raw = (F.lit(12.0) / (n * (n + F.lit(1)))) * F.col("rsum") - F.lit(
        3.0
    ) * (n + F.lit(1))
    corr = F.lit(1.0) - F.col("tie_sum") / F.nullif(
        (n * n * n - n).cast("double"), F.lit(0.0)
    )
    h = F.round(h_raw / F.nullif(corr, F.lit(0.0)), 6)
    return agg.select(
        n.cast("long").alias("n_total"),
        F.col("k").cast("long").alias("k_groups"),
        h.alias("h_stat"),
        (h > F.lit(FRIEDMAN_CHI2_95_DF4)).cast("long").alias(
            "rejected_95"
        ),
    )


QUERIES["stats_kruskal_wallis"] = stats_kruskal_wallis
ORACLE_SQL["stats_kruskal_wallis"] = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    ranked AS (
        SELECT event_type,
               RANK() OVER (ORDER BY m)
                   + (COUNT(*) OVER (PARTITION BY m) - 1) / 2.0 AS r
        FROM ev),
    g AS (
        SELECT event_type, SUM(r) AS rj,
               CAST(COUNT(*) AS BIGINT) AS nj
        FROM ranked GROUP BY 1),
    ties AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT m, CAST(COUNT(*) AS BIGINT) AS t
              FROM ev GROUP BY 1)),
    agg AS (
        SELECT t.n, t.tie_sum,
               SUM((g.rj * g.rj) / CAST(g.nj AS DOUBLE)) AS rsum,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM g CROSS JOIN ties t
        GROUP BY 1, 2)
    SELECT n AS n_total,
           k AS k_groups,
           ROUND(((12.0 / (n * (n + 1))) * rsum - 3.0 * (n + 1))
                 / NULLIF(1.0 - tie_sum
                          / NULLIF(CAST(n * n * n - n AS DOUBLE), 0.0),
                          0.0), 6) AS h_stat,
           CAST(ROUND(((12.0 / (n * (n + 1))) * rsum - 3.0 * (n + 1))
                      / NULLIF(1.0 - tie_sum
                               / NULLIF(CAST(n * n * n - n AS DOUBLE),
                                        0.0), 0.0), 6)
                > {FRIEDMAN_CHI2_95_DF4} AS BIGINT) AS rejected_95
    FROM agg
"""


#: Bonferroni-adjusted two-sided 5% critical value for k=5 groups
#: (m = k(k-1)/2 = 10 comparisons -> alpha/2m = 0.0025 -> z = 2.807)
DUNN_Z_BONF_95 = 2.807


def stats_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after Kruskal-Wallis: for
    every pair of event types, z = (Rbar_i - Rbar_j) / SE with the
    tie-corrected pooled-rank standard error
    SE^2 = (N(N+1)/12 - sum(t^3 - t)/(12(N-1))) (1/n_i + 1/n_j),
    Bonferroni-gated — the "WHICH groups differ?" answer the omnibus H
    (``stats_kruskal_wallis``) deliberately doesn't give; the standard
    pairing in any stats package.

    Mid-rank sums are exact halves, group sizes and the tie term exact
    BIGINTs; each z is one fixed IEEE tree per pair.  Pairs are formed
    on the k-bounded group frame (k(k-1)/2 = 10 rows), every ordering
    lexicographic on the type names.

    Scale: shares Kruskal-Wallis's one global rank window (binned-rank
    swap documented in the module note); everything after is k^2."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    ranked = ev.select(
        "event_type",
        _mid_rank([], "m").alias("r"),
    )
    g = ranked.groupBy("event_type").agg(
        F.sum("r").alias("rj"),
        F.count(F.lit(1)).alias("nj"),
    )
    total = (
        ev.groupBy("m")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum(
                F.col("t") * F.col("t") * F.col("t") - F.col("t")
            ).alias("tie_sum"),
            F.sum("t").alias("n"),
        )
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("rj").alias("ra"),
        F.col("nj").alias("na"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("rj").alias("rb"),
        F.col("nj").alias("nb"),
    )
    pairs = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(total))
    )
    n = F.col("n").cast("double")
    se2 = (
        (F.col("n") * (F.col("n") + F.lit(1))).cast("double") / F.lit(12.0)
        - F.col("tie_sum").cast("double")
        / (F.lit(12.0) * (n - F.lit(1.0)))
    ) * (
        F.lit(1.0) / F.col("na").cast("double")
        + F.lit(1.0) / F.col("nb").cast("double")
    )
    z = F.round(
        (
            F.col("ra") / F.col("na").cast("double")
            - F.col("rb") / F.col("nb").cast("double")
        )
        / F.nullif(F.sqrt(se2), F.lit(0.0)),
        6,
    )
    return (
        pairs.select(
            "type_a",
            "type_b",
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            z.alias("z_dunn"),
            (F.abs(z) > F.lit(DUNN_Z_BONF_95)).cast("long").alias(
                "rejected_bonf_95"
            ),
        )
        .orderBy("type_a", "type_b")
    )


QUERIES["stats_dunn_posthoc"] = stats_dunn_posthoc
ORACLE_SQL["stats_dunn_posthoc"] = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    ranked AS (
        SELECT event_type,
               RANK() OVER (ORDER BY m)
                   + (COUNT(*) OVER (PARTITION BY m) - 1) / 2.0 AS r
        FROM ev),
    g AS (
        SELECT event_type, SUM(r) AS rj,
               CAST(COUNT(*) AS BIGINT) AS nj
        FROM ranked GROUP BY 1),
    total AS (
        SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum,
               CAST(SUM(t) AS BIGINT) AS n
        FROM (SELECT m, CAST(COUNT(*) AS BIGINT) AS t
              FROM ev GROUP BY 1)),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.rj AS ra, a.nj AS na, b.rj AS rb, b.nj AS nb,
               t.tie_sum, t.n
        FROM g a JOIN g b ON a.event_type < b.event_type
        CROSS JOIN total t)
    SELECT type_a, type_b,
           na AS n_a,
           nb AS n_b,
           ROUND((ra / CAST(na AS DOUBLE) - rb / CAST(nb AS DOUBLE))
                 / NULLIF(SQRT((CAST(n * (n + 1) AS DOUBLE) / 12.0
                                - CAST(tie_sum AS DOUBLE)
                                  / (12.0 * (CAST(n AS DOUBLE) - 1.0)))
                               * (1.0 / CAST(na AS DOUBLE)
                                  + 1.0 / CAST(nb AS DOUBLE))), 0.0),
                 6) AS z_dunn,
           CAST(ABS(ROUND((ra / CAST(na AS DOUBLE)
                           - rb / CAST(nb AS DOUBLE))
                          / NULLIF(SQRT((CAST(n * (n + 1) AS DOUBLE)
                                         / 12.0
                                         - CAST(tie_sum AS DOUBLE)
                                           / (12.0 * (CAST(n AS DOUBLE)
                                                      - 1.0)))
                                        * (1.0 / CAST(na AS DOUBLE)
                                           + 1.0 / CAST(nb AS DOUBLE))),
                                   0.0), 6))
                > {DUNN_Z_BONF_95} AS BIGINT) AS rejected_bonf_95
    FROM pairs
    ORDER BY type_a, type_b
"""


#: chi-square(1) 95th percentile — McNemar rejection bar
MCNEMAR_CHI2_95_DF1 = 3.8415


def stats_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for PAIRED binary outcomes per event type: each
    user is their own control — did they fire the type in the first
    half of the observation window vs the second (the before/after
    split at the global midpoint timestamp)?  Only the DISCORDANT
    cells carry information: b = active-before-only, c =
    active-after-only, chi2 = (b - c)^2 / (b + c) against
    chi-square(1).  The within-subject drift test the unpaired drift
    shelf (KS/PSI/chi2 by period) cannot answer, because it conditions
    on the same user appearing in both periods' risk set.

    Determinism: the half boundary is the exact integer-microsecond
    midpoint of (min ts, max ts), halved as a BIGINT shift (no double
    round-trip — ``shiftright(sum, 1)`` on the positive sum IS the
    oracle's ``// 2``); b and c are exact BIGINT user counts; one
    float division at the end.

    Scale: one (user, type, half) presence aggregation — data-sized,
    map-side combinable — then type-bounded cells."""
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        F.shiftright(
            F.unix_micros(F.min("ts").cast("timestamp"))
            + F.unix_micros(F.max("ts").cast("timestamp")),
            1,
        ).alias("mid_us")
    )
    pres = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) < F.col("mid_us"))
            .cast("int")
            .alias("h1"),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.max("h1").alias("before"),
            F.max(F.lit(1) - F.col("h1")).alias("after"),
        )
    )
    cells = pres.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(
            ((F.col("before") == 1) & (F.col("after") == 0)).cast("long")
        ).alias("b"),
        F.sum(
            ((F.col("before") == 0) & (F.col("after") == 1)).cast("long")
        ).alias("c"),
    )
    diff = (F.col("b") - F.col("c")).cast("double")
    chi2 = F.round(
        diff * diff
        / F.nullif((F.col("b") + F.col("c")).cast("double"), F.lit(0.0)),
        6,
    )
    return cells.select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        F.col("b").cast("long").alias("before_only"),
        F.col("c").cast("long").alias("after_only"),
        chi2.alias("chi2_mcnemar"),
        (chi2 > F.lit(MCNEMAR_CHI2_95_DF1)).cast("long").alias(
            "rejected_95"
        ),
    ).orderBy("event_type")


QUERIES["stats_mcnemar_paired"] = stats_mcnemar_paired
ORACLE_SQL["stats_mcnemar_paired"] = f"""
    WITH bounds AS (
        -- // (floor division) matches Spark's shiftright(sum, 1) —
        -- both are exact integer halving of the positive microsecond
        -- sum; a float / with CAST would ROUND and flip the boundary
        -- when the sum is odd
        SELECT CAST((EPOCH_US(MIN(ts)) + EPOCH_US(MAX(ts))) // 2
                    AS BIGINT) AS mid_us
        FROM events),
    pres AS (
        SELECT user_id, event_type,
               MAX(CASE WHEN EPOCH_US(ts) < mid_us THEN 1 ELSE 0 END)
                   AS before,
               MAX(CASE WHEN EPOCH_US(ts) < mid_us THEN 0 ELSE 1 END)
                   AS after
        FROM events CROSS JOIN bounds
        GROUP BY user_id, event_type),
    cells AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(CASE WHEN before = 1 AND after = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN before = 0 AND after = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM pres GROUP BY event_type)
    SELECT event_type,
           n_users,
           b AS before_only,
           c AS after_only,
           ROUND(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                 / NULLIF(CAST(b + c AS DOUBLE), 0.0), 6)
               AS chi2_mcnemar,
           CAST(ROUND(CAST(b - c AS DOUBLE) * CAST(b - c AS DOUBLE)
                      / NULLIF(CAST(b + c AS DOUBLE), 0.0), 6)
                > {MCNEMAR_CHI2_95_DF1} AS BIGINT) AS rejected_95
    FROM cells
    ORDER BY event_type
"""


def stats_mood_scale_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's two-sample SCALE test between the two lexicographically
    first event types' value distributions: rank the pooled
    cent-quantized values, score each sample-1 observation
    (r - (N+1)/2)^2, and compare T = sum of scores to its null moments
    E[T] = n1 (N^2 - 1) / 12, Var[T] = n1 n2 (N+1)(N^2-4)/180.  The
    dispersion counterpart of the location shelf: Mann-Whitney asks
    "did the center move?", Mood asks "did the SPREAD change?" —
    Brown-Forsythe answers it parametrically, this is the rank answer.

    Mid-ranks are exact half-integers, so each score is an exact
    multiple of 0.25 and the sum is order-free at any volume below
    2^53 quarter-units.  The null moments use the standard no-ties
    closed forms (ties exist on the cent grid, so z is the usual
    tie-approximate screen — same statistic both engines).

    Scale: one global rank window (module-note single-sort bound with
    the documented binned swap), one aggregation."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    two = (
        ev.select("event_type")
        .distinct()
        .orderBy("event_type")
        .limit(2)
    )
    sub = ev.join(F.broadcast(two), "event_type")
    first = two.agg(F.min("event_type").alias("t1"))
    ranked = sub.select(
        "event_type",
        _mid_rank([], "m").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    scored = ranked.crossJoin(F.broadcast(first)).select(
        "n",
        (F.col("event_type") == F.col("t1")).cast("int").alias("is1"),
        (
            (F.col("r") - (F.col("n") + F.lit(1)) / F.lit(2.0))
            * (F.col("r") - (F.col("n") + F.lit(1)) / F.lit(2.0))
        ).alias("sc"),
    )
    agg = scored.groupBy("n").agg(
        F.sum(F.when(F.col("is1") == 1, F.col("sc"))).alias("t_stat"),
        F.sum("is1").alias("n1"),
        F.sum(F.lit(1) - F.col("is1")).alias("n2"),
    )
    n = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    e_t = n1 * (n * n - F.lit(1.0)) / F.lit(12.0)
    v_t = (
        n1
        * n2
        * (n + F.lit(1.0))
        * (n * n - F.lit(4.0))
        / F.lit(180.0)
    )
    # NULLIF on the null-variance denominator (degenerate fixture:
    # one event type or n <= 2 makes v_t = 0) — DuckDB's IEEE float
    # division would emit inf/NaN where Spark emits NULL; the guard
    # makes both engines NULL, the module-wide discipline.
    z = F.round(
        (F.col("t_stat") - e_t)
        / F.nullif(F.sqrt(v_t), F.lit(0.0)),
        6,
    )
    return agg.select(
        F.col("n1").cast("long").alias("n_sample1"),
        F.col("n2").cast("long").alias("n_sample2"),
        F.round(F.col("t_stat"), 6).alias("t_stat"),
        F.round(e_t, 6).alias("t_expected"),
        z.alias("z_mood"),
        (F.abs(z) > F.lit(CA_Z_95)).cast("long").alias("rejected_95"),
    )


QUERIES["stats_mood_scale_test"] = stats_mood_scale_test
ORACLE_SQL["stats_mood_scale_test"] = f"""
    WITH ev AS (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    two AS (
        SELECT DISTINCT event_type FROM ev
        ORDER BY event_type LIMIT 2),
    first AS (SELECT MIN(event_type) AS t1 FROM two),
    sub AS (SELECT ev.* FROM ev JOIN two USING (event_type)),
    ranked AS (
        SELECT event_type,
               RANK() OVER (ORDER BY m)
                   + (COUNT(*) OVER (PARTITION BY m) - 1) / 2.0 AS r,
               COUNT(*) OVER () AS n
        FROM sub),
    scored AS (
        SELECT n,
               CASE WHEN event_type = first.t1 THEN 1 ELSE 0 END AS is1,
               (r - (n + 1) / 2.0) * (r - (n + 1) / 2.0) AS sc
        FROM ranked CROSS JOIN first),
    agg AS (
        SELECT n,
               SUM(CASE WHEN is1 = 1 THEN sc END) AS t_stat,
               CAST(SUM(is1) AS BIGINT) AS n1,
               CAST(SUM(1 - is1) AS BIGINT) AS n2
        FROM scored GROUP BY n)
    SELECT n1 AS n_sample1,
           n2 AS n_sample2,
           ROUND(t_stat, 6) AS t_stat,
           ROUND(n1 * (CAST(n AS DOUBLE) * n - 1.0) / 12.0, 6)
               AS t_expected,
           ROUND((t_stat - n1 * (CAST(n AS DOUBLE) * n - 1.0) / 12.0)
                 / NULLIF(SQRT(n1 * CAST(n2 AS DOUBLE) * (n + 1.0)
                               * (CAST(n AS DOUBLE) * n - 4.0) / 180.0),
                          0.0), 6)
               AS z_mood,
           CAST(ABS(ROUND((t_stat
                           - n1 * (CAST(n AS DOUBLE) * n - 1.0) / 12.0)
                          / NULLIF(SQRT(n1 * CAST(n2 AS DOUBLE)
                                        * (n + 1.0)
                                        * (CAST(n AS DOUBLE) * n - 4.0)
                                        / 180.0), 0.0), 6))
                > {CA_Z_95} AS BIGINT) AS rejected_95
    FROM agg
"""


def stats_cliffs_delta_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta EFFECT-SIZE matrix over every event-type pair —
    the magnitude companion the significance shelf is missing: Mann-
    Whitney / Kruskal-Wallis / Dunn say WHETHER distributions differ,
    Cliff's delta says HOW MUCH (delta = P(X > Y) - P(X < Y), the
    rank-biserial correlation), which is what a data-quality dashboard
    actually thresholds on at 100 TB where every test is "significant".
    Also ships the common-language effect size CL = P(X > Y) + 0.5 *
    P(X = Y) (Vargha-Delaney A), the tie-aware probability a random X
    beats a random Y.

    Computation is pairwise-free: per-type VALUE-VOCABULARY counts
    (one data-sized groupBy) explode into the T-1 pairs each type
    belongs to (a broadcast pair grid bounded by the event-type
    cardinality), and per pair the Mann-Whitney midrank identity gives
    U1 = R1 - n1(n1+1)/2 with delta = 2*U1/(n1*n2) - 1 — exact
    half-grid arithmetic, never an (x, y) pair materialized.

    Scale: one data-sized groupBy (type x value vocabulary), a
    broadcast join against the tiny pair grid, one vocabulary-sized
    window per pair, one fold — the stats_mann_whitney shape fanned
    across all pairs at once."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("m"),
    )
    vocab = ev.groupBy("event_type", "m").agg(
        F.count(F.lit(1)).alias("c")
    )
    types = ev.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    members = pairs.select(
        "type_a",
        "type_b",
        F.explode(F.array("type_a", "type_b")).alias("member"),
    )
    exploded = vocab.join(
        F.broadcast(members), vocab.event_type == members.member
    )
    per_val = exploded.groupBy("type_a", "type_b", "m").agg(
        F.sum("c").alias("t"),
        F.sum(
            F.when(F.col("event_type") == F.col("type_a"), F.col("c"))
            .otherwise(0)
        ).alias("t1"),
    )
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("m")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = per_val.select(
        "type_a",
        "type_b",
        "t",
        "t1",
        (
            F.coalesce(F.sum("t").over(w), F.lit(0))
            + (F.col("t") + 1) / F.lit(2.0)
        ).alias("midrank"),
    )
    agg = ranked.groupBy("type_a", "type_b").agg(
        F.sum("t1").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("t1")).cast("long").alias("n2"),
        F.sum(F.col("t1") * F.col("midrank")).alias("r1"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / F.lit(2.0)
    denom = F.nullif(
        (F.col("n1") * F.col("n2")).cast("double"), F.lit(0.0)
    )
    return agg.select(
        "type_a",
        "type_b",
        "n1",
        "n2",
        F.round(F.lit(2.0) * u1 / denom - F.lit(1.0), 6).alias(
            "cliffs_delta"
        ),
        F.round(u1 / denom, 6).alias("cl_effect"),
    ).orderBy("type_a", "type_b")


QUERIES["stats_cliffs_delta_matrix"] = stats_cliffs_delta_matrix
ORACLE_SQL["stats_cliffs_delta_matrix"] = """
    WITH ev AS (
        SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS m
        FROM events),
    vocab AS (
        SELECT event_type, m, COUNT(*) AS c
        FROM ev GROUP BY event_type, m),
    types AS (SELECT DISTINCT event_type FROM ev),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM types a JOIN types b ON a.event_type < b.event_type),
    exploded AS (
        SELECT p.type_a, p.type_b, v.event_type, v.m, v.c
        FROM vocab v
        JOIN pairs p
          ON v.event_type = p.type_a OR v.event_type = p.type_b),
    per_val AS (
        SELECT type_a, type_b, m,
               SUM(c) AS t,
               SUM(CASE WHEN event_type = type_a THEN c ELSE 0 END) AS t1
        FROM exploded GROUP BY type_a, type_b, m),
    ranked AS (
        SELECT type_a, type_b, t, t1,
               COALESCE(SUM(t) OVER (PARTITION BY type_a, type_b
                                     ORDER BY m
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
                   + (t + 1) / 2.0 AS midrank
        FROM per_val),
    agg AS (
        SELECT type_a, type_b,
               CAST(SUM(t1) AS BIGINT) AS n1,
               CAST(SUM(t - t1) AS BIGINT) AS n2,
               SUM(t1 * midrank) AS r1
        FROM ranked GROUP BY type_a, type_b)
    SELECT type_a, type_b, n1, n2,
           ROUND(2.0 * (r1 - n1 * (n1 + 1) / 2.0)
                 / NULLIF(CAST(n1 * n2 AS DOUBLE), 0.0) - 1.0, 6)
               AS cliffs_delta,
           ROUND((r1 - n1 * (n1 + 1) / 2.0)
                 / NULLIF(CAST(n1 * n2 AS DOUBLE), 0.0), 6) AS cl_effect
    FROM agg
    ORDER BY type_a, type_b
"""
