"""Causal-inference pack: the experiment-analysis operators a product /
data-science platform runs on top of the events warehouse —
difference-in-differences on observational panel data, CUPED variance
reduction for A/B tests, and stratified average-treatment-effect
estimation.

Like the classical-ML pack (operators/ml.py), every estimator here is
model math over sufficient statistics: ONE data-sized aggregation
produces exact integer cell counts / sums / cross-moments, and the
estimator arithmetic runs on a handful of rows.  At 100 TB each of
these is a single partial-aggregable pass over the metric table — the
estimators add nothing to the shuffle beyond the cells.

Hash-stability: metric values quantize to the cent/dollar grid, so all
moments are exact BIGINTs; every double expression downstream is the
identical IEEE tree over identical inputs in both engines (products of
whole-table sums go through doubles first, the ml.py overflow rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def _md5_of(col: str):
    """Cross-engine stable pseudo-random key (sampling.py convention)."""
    return F.md5(F.col(col).cast("string").cast("binary"))


def orders_promo_uplift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences (the two-period, two-group canonical
    form): did the PROMO part class's net revenue move differently
    across the 1998-07 boundary than everything else's?  DiD =
    (treated post - treated pre) - (control post - control pre), which
    cancels both the group level difference and the common time trend
    — the workhorse causal design when randomization wasn't available.
    A z score from the four cells' mean-variances (independent-cell
    normal approximation) accompanies the point estimate.

    Shape: broadcast part-class join, ONE (treated, post) aggregation
    over dollar-quantized revenue (n, sum, sum-of-squares — all exact
    BIGINT), then the estimator on a 4-row frame via conditional
    first() cells (exactly one non-null per cell, so the fold is
    deterministic)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("treated")
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "treated",
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-07-01"))).alias(
            "post"
        ),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 0)
        .cast("long")
        .alias("rev"),
    )
    cells = j.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("s"),
        F.sum(F.col("rev") * F.col("rev")).alias("ss"),
    )
    mean = F.col("s") / F.col("n").cast("double")
    var_mean = (
        (F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1.0)
        / F.col("n")
    )
    c2 = cells.select(
        "treated", "post", "n", mean.alias("m"), var_mean.alias("vm")
    )

    def cell(tr: bool, po: bool, col: str):
        return F.first(
            F.when(
                (F.col("treated") == tr) & (F.col("post") == po), F.col(col)
            ),
            ignorenulls=True,
        )

    agg = c2.agg(
        F.sum("n").cast("long").alias("n_rows"),
        cell(True, True, "m").alias("m_t_post"),
        cell(True, False, "m").alias("m_t_pre"),
        cell(False, True, "m").alias("m_c_post"),
        cell(False, False, "m").alias("m_c_pre"),
        (
            cell(True, True, "vm")
            + cell(True, False, "vm")
            + cell(False, True, "vm")
            + cell(False, False, "vm")
        ).alias("var_did"),
    )
    did = (F.col("m_t_post") - F.col("m_t_pre")) - (
        F.col("m_c_post") - F.col("m_c_pre")
    )
    return agg.select(
        "n_rows",
        F.round("m_t_post", 6).alias("mean_treated_post"),
        F.round("m_t_pre", 6).alias("mean_treated_pre"),
        F.round("m_c_post", 6).alias("mean_control_post"),
        F.round("m_c_pre", 6).alias("mean_control_pre"),
        F.round(did, 6).alias("did_estimate"),
        F.round(did / F.sqrt(F.col("var_did")), 6).alias("did_z"),
    )


def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. WSDM'13 — the industry
    standard for shipping faster A/B readouts): the post-period metric
    is adjusted by theta x the PRE-period covariate, theta =
    cov(X, Y) / var(X), which strips the variance the pre-period
    already explains.  Arms assigned by md5 parity (engine-portable);
    emits theta, the raw and CUPED-adjusted treatment deltas (equal in
    expectation — CUPED is unbiased) and the realized variance-
    reduction fraction 1 - var(Y - theta X)/var(Y).

    Exactness: X/Y are per-user PRE/POST cent SUMS (exact BIGINT), so
    the five cross-user moments are exact BIGINT in one aggregation —
    no order-dependent double summation anywhere before the final
    identical-IEEE estimator row."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        (F.col("ts") < F.to_timestamp(F.lit("2024-01-16"))).alias("pre"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("pre"), F.col("cents")).otherwise(0)).alias(
                "x"
            ),
            F.sum(F.when(~F.col("pre"), F.col("cents")).otherwise(0)).alias(
                "y"
            ),
        )
        .select(
            "x",
            "y",
            (
                F.conv(F.substring(_md5_of("user_id"), 1, 2), 16, 10).cast(
                    "long"
                )
                % 2
            ).alias("arm"),
        )
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).alias(
            "sy1"
        ),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).alias(
            "sx1"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).alias(
            "sy0"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).alias(
            "sx0"
        ),
    )
    n = F.col("n").cast("double")
    cxy = F.col("sxy") - F.col("sx").cast("double") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx").cast("double") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy").cast("double") * F.col("sy") / n
    theta = cxy / cxx
    n1 = F.col("n1").cast("double")
    n0 = n - n1
    raw = F.col("sy1") / n1 - F.col("sy0") / n0
    adj = (F.col("sy1") / n1 - theta * F.col("sx1") / n1) - (
        F.col("sy0") / n0 - theta * F.col("sx0") / n0
    )
    return mom.select(
        F.col("n").cast("long").alias("n_users"),
        F.col("n1").cast("long").alias("n_treat"),
        F.round(theta / 1.0, 6).alias("theta"),
        F.round(raw / 100.0, 6).alias("raw_delta"),
        F.round(adj / 100.0, 6).alias("cuped_delta"),
        F.round(1.0 - (cyy - theta * cxy) / cyy, 6).alias("var_reduction"),
    )


def causal_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified average-treatment-effect estimation (post-
    stratification): users bucketed into activity quartiles (NTILE on
    a fully tie-broken order), arms by md5 parity, per-stratum effect
    = treated mean - control mean of total value, and the
    population-weighted terms whose sum is the stratified ATE — the
    estimator that removes confounding carried by the stratification
    variable, and the variance-reducing analysis even under pure
    randomization.

    One per-user aggregation (data-sized), one user-vocabulary NTILE,
    one 4-row cell frame.  The same NTILE caveat as feature_woe_iv
    applies at extreme scale: swap in broadcast percentile boundaries
    for the global sort."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"), F.sum("cents").alias("tot")
    )
    strat = per_user.select(
        "user_id",
        "tot",
        F.ntile(4).over(Window.orderBy("n_ev", "user_id")).alias("stratum"),
        (
            F.conv(F.substring(_md5_of("user_id"), 1, 2), 16, 10).cast("long")
            % 2
        ).alias("arm"),
    )
    cells = strat.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_s"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("tot")).otherwise(0)).alias(
            "s1"
        ),
        F.sum(F.when(F.col("arm") == 0, F.col("tot")).otherwise(0)).alias(
            "s0"
        ),
    )
    tot = cells.agg(F.sum("n_s").alias("n")).select("n")
    diff = F.col("s1") / (F.lit(100.0) * F.col("n1")) - F.col("s0") / (
        F.lit(100.0) * (F.col("n_s") - F.col("n1"))
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("stratum").cast("long").alias("stratum"),
            F.col("n_s").cast("long").alias("n_users"),
            F.col("n1").cast("long").alias("n_treat"),
            F.round(diff, 6).alias("stratum_effect"),
            F.round(diff * F.col("n_s") / F.col("n"), 6).alias(
                "weighted_term"
            ),
        )
        .orderBy("stratum")
    )


def stats_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d standardized effect size between the two md5
    experiment arms, per event type — the magnitude number the
    significance tests in this pack (z, U, F) deliberately don't give:
    d = (mean_t - mean_c) / pooled SD, with Hedges' small-sample g
    correction alongside.  The reporting standard for "significant,
    but does it matter?".

    One (type, arm) aggregation of exact cent moments; the estimator
    runs on |types| x 2 cells.  Variances expand from exact BIGINT
    n/sum/sum-of-squares, so both engines divide identical doubles."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (
            F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast(
                "long"
            )
            % 2
        ).alias("arm"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cells = ev.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    t = cells.where(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("nt"),
        F.col("s").alias("st"),
        F.col("ss").alias("sst"),
    )
    c = cells.where(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("nc"),
        F.col("s").alias("sc"),
        F.col("ss").alias("ssc"),
    )
    nt = F.col("nt").cast("double")
    nc = F.col("nc").cast("double")
    mt = F.col("st") / (100.0 * nt)
    mc = F.col("sc") / (100.0 * nc)
    vt = (F.col("sst") / 10000.0 - nt * mt * mt) / (nt - 1)
    vc = (F.col("ssc") / 10000.0 - nc * mc * mc) / (nc - 1)
    sp = F.sqrt(((nt - 1) * vt + (nc - 1) * vc) / (nt + nc - 2))
    d = (mt - mc) / sp
    g = d * (1.0 - 3.0 / (4.0 * (nt + nc) - 9.0))
    return (
        t.join(c, "event_type")
        .select(
            "event_type",
            F.col("nt").cast("long").alias("n_treat"),
            F.col("nc").cast("long").alias("n_control"),
            F.round(mt - mc, 6).alias("mean_diff"),
            F.round(sp, 6).alias("pooled_sd"),
            F.round(d, 6).alias("cohens_d"),
            F.round(g, 6).alias("hedges_g"),
        )
        .orderBy("event_type")
    )


def ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) check of the md5 bucketing itself —
    the FIRST gate of any experiment readout (Fabijan et al. KDD'19
    diagnoses SRM in ~6% of real experiments; a mismatched split
    invalidates every downstream estimator in this pack): chi-square
    of observed arm counts against the expected 50/50 under the
    assignment rule, per event type, flagged at the conventional
    chi2 > 3.841 (p < 0.05, 1 dof) bar.

    One tiny-key aggregation; chi-square expands from exact BIGINT
    counts — the cheapest query in the pack guards all the others."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (
            F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast(
                "long"
            )
            % 2
        ).alias("arm"),
    )
    g = ev.groupBy("event_type").agg(
        F.sum(F.col("arm")).alias("n_treat"),
        F.sum(F.lit(1) - F.col("arm")).alias("n_control"),
    )
    n = (F.col("n_treat") + F.col("n_control")).cast("double")
    exp = n / 2.0
    chi2 = (
        (F.col("n_treat") - exp) * (F.col("n_treat") - exp) / exp
        + (F.col("n_control") - exp) * (F.col("n_control") - exp) / exp
    )
    return (
        g.select(
            "event_type",
            F.col("n_treat").cast("long").alias("n_treat"),
            F.col("n_control").cast("long").alias("n_control"),
            F.round(chi2, 6).alias("chi2"),
            (chi2 > 3.841).alias("srm_flag"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "orders_promo_uplift_did": orders_promo_uplift_did,
    "ab_test_cuped": ab_test_cuped,
    "causal_stratified_ate": causal_stratified_ate,
    "stats_cohens_d": stats_cohens_d,
    "ab_srm_check": ab_srm_check,
}

ORACLE_SQL = {
    "orders_promo_uplift_did": """
        WITH j AS (
            SELECT (p.p_type = 'PROMO') AS treated,
                   (l.l_shipdate >= TIMESTAMP '1998-07-01') AS post,
                   CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 0)
                        AS BIGINT) AS rev
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        cells AS (
            SELECT treated, post, COUNT(*) AS n, SUM(rev) AS s,
                   SUM(rev * rev) AS ss
            FROM j GROUP BY treated, post),
        c2 AS (
            SELECT treated, post, n,
                   s / CAST(n AS DOUBLE) AS m,
                   (ss - CAST(s AS DOUBLE) * s / n) / (n - 1.0) / n AS vm
            FROM cells),
        agg AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   MAX(CASE WHEN treated AND post THEN m END) AS m_t_post,
                   MAX(CASE WHEN treated AND NOT post THEN m END) AS m_t_pre,
                   MAX(CASE WHEN NOT treated AND post THEN m END) AS m_c_post,
                   MAX(CASE WHEN NOT treated AND NOT post THEN m END)
                       AS m_c_pre,
                   MAX(CASE WHEN treated AND post THEN vm END)
                   + MAX(CASE WHEN treated AND NOT post THEN vm END)
                   + MAX(CASE WHEN NOT treated AND post THEN vm END)
                   + MAX(CASE WHEN NOT treated AND NOT post THEN vm END)
                       AS var_did
            FROM c2)
        SELECT n_rows,
               ROUND(m_t_post, 6) AS mean_treated_post,
               ROUND(m_t_pre, 6) AS mean_treated_pre,
               ROUND(m_c_post, 6) AS mean_control_post,
               ROUND(m_c_pre, 6) AS mean_control_pre,
               ROUND((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)
                   AS did_estimate,
               ROUND(((m_t_post - m_t_pre) - (m_c_post - m_c_pre))
                     / SQRT(var_did), 6) AS did_z
        FROM agg
    """,
    "ab_test_cuped": """
        WITH ev AS (
            SELECT user_id, (ts < TIMESTAMP '2024-01-16') AS pre,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
            FROM events),
        per_user AS (
            SELECT user_id,
                   SUM(CASE WHEN pre THEN cents ELSE 0 END) AS x,
                   SUM(CASE WHEN NOT pre THEN cents ELSE 0 END) AS y,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                       ::BIGINT % 2 AS arm
            FROM ev GROUP BY user_id),
        mom AS (
            SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy,
                   SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
                   SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS sy1,
                   SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS sx1,
                   SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS sy0,
                   SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS sx0
            FROM per_user),
        c AS (
            SELECT n, n1, sy1, sx1, sy0, sx0,
                   sxy - CAST(sx AS DOUBLE) * sy / n AS cxy,
                   sxx - CAST(sx AS DOUBLE) * sx / n AS cxx,
                   syy - CAST(sy AS DOUBLE) * sy / n AS cyy
            FROM mom)
        SELECT CAST(n AS BIGINT) AS n_users,
               CAST(n1 AS BIGINT) AS n_treat,
               ROUND(cxy / cxx, 6) AS theta,
               ROUND((sy1 / CAST(n1 AS DOUBLE)
                      - sy0 / CAST(n - n1 AS DOUBLE)) / 100.0, 6)
                   AS raw_delta,
               ROUND(((sy1 / CAST(n1 AS DOUBLE)
                       - (cxy / cxx) * sx1 / CAST(n1 AS DOUBLE))
                      - (sy0 / CAST(n - n1 AS DOUBLE)
                         - (cxy / cxx) * sx0 / CAST(n - n1 AS DOUBLE)))
                     / 100.0, 6) AS cuped_delta,
               ROUND(1.0 - (cyy - (cxy / cxx) * cxy) / cyy, 6)
                   AS var_reduction
        FROM c
    """,
    "causal_stratified_ate": """
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS n_ev,
                   SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS tot
            FROM events GROUP BY user_id),
        strat AS (
            SELECT user_id, tot,
                   NTILE(4) OVER (ORDER BY n_ev, user_id) AS stratum,
                   ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
                       ::BIGINT % 2 AS arm
            FROM per_user),
        cells AS (
            SELECT stratum, COUNT(*) AS n_s,
                   SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
                   SUM(CASE WHEN arm = 1 THEN tot ELSE 0 END) AS s1,
                   SUM(CASE WHEN arm = 0 THEN tot ELSE 0 END) AS s0
            FROM strat GROUP BY stratum),
        tot AS (SELECT SUM(n_s) AS n FROM cells)
        SELECT CAST(stratum AS BIGINT) AS stratum,
               CAST(n_s AS BIGINT) AS n_users,
               CAST(n1 AS BIGINT) AS n_treat,
               ROUND(s1 / (100.0 * n1) - s0 / (100.0 * (n_s - n1)), 6)
                   AS stratum_effect,
               ROUND((s1 / (100.0 * n1) - s0 / (100.0 * (n_s - n1)))
                     * n_s / n, 6) AS weighted_term
        FROM cells CROSS JOIN tot
        ORDER BY stratum
    """,
}

ORACLE_SQL["stats_cohens_d"] = """
    WITH ev AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS arm,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    cells AS (
        SELECT event_type, arm, COUNT(*) AS n, SUM(cents) AS s,
               SUM(cents * cents) AS ss
        FROM ev GROUP BY event_type, arm),
    t AS (SELECT event_type, n AS nt, s AS st, ss AS sst
          FROM cells WHERE arm = 1),
    c AS (SELECT event_type, n AS nc, s AS sc, ss AS ssc
          FROM cells WHERE arm = 0),
    est AS (
        SELECT event_type, nt, nc,
               st / (100.0 * nt) AS mt,
               sc / (100.0 * nc) AS mc,
               (sst / 10000.0 - nt * (st / (100.0 * nt))
                                   * (st / (100.0 * nt))) / (nt - 1)
                   AS vt,
               (ssc / 10000.0 - nc * (sc / (100.0 * nc))
                                   * (sc / (100.0 * nc))) / (nc - 1)
                   AS vc
        FROM t JOIN c USING (event_type)),
    fin AS (
        SELECT event_type, nt, nc, mt, mc,
               SQRT(((nt - 1) * vt + (nc - 1) * vc) / (nt + nc - 2))
                   AS sp
        FROM est)
    SELECT event_type,
           CAST(nt AS BIGINT) AS n_treat,
           CAST(nc AS BIGINT) AS n_control,
           ROUND(mt - mc, 6) AS mean_diff,
           ROUND(sp, 6) AS pooled_sd,
           ROUND((mt - mc) / sp, 6) AS cohens_d,
           ROUND((mt - mc) / sp
                 * (1.0 - 3.0 / (4.0 * (nt + nc) - 9.0)), 6) AS hedges_g
    FROM fin
    ORDER BY event_type
"""

ORACLE_SQL["ab_srm_check"] = """
    WITH ev AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS arm
        FROM events),
    g AS (
        SELECT event_type,
               SUM(arm) AS n_treat,
               SUM(1 - arm) AS n_control
        FROM ev GROUP BY event_type)
    SELECT event_type,
           CAST(n_treat AS BIGINT) AS n_treat,
           CAST(n_control AS BIGINT) AS n_control,
           ROUND((n_treat - (n_treat + n_control) / 2.0)
                 * (n_treat - (n_treat + n_control) / 2.0)
                 / ((n_treat + n_control) / 2.0)
                 + (n_control - (n_treat + n_control) / 2.0)
                 * (n_control - (n_treat + n_control) / 2.0)
                 / ((n_treat + n_control) / 2.0), 6) AS chi2,
           ((n_treat - (n_treat + n_control) / 2.0)
            * (n_treat - (n_treat + n_control) / 2.0)
            / ((n_treat + n_control) / 2.0)
            + (n_control - (n_treat + n_control) / 2.0)
            * (n_control - (n_treat + n_control) / 2.0)
            / ((n_treat + n_control) / 2.0)) > 3.841 AS srm_flag
    FROM g
    ORDER BY event_type
"""

#: Permutation-test replicate count: 200 re-randomizations give a
#: p-value resolution of ~1/201 — the readout granularity experiment
#: platforms actually report at; B scales the fan-out linearly.
PERM_B = 200


def stats_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PERMUTATION TEST (Fisher's exact-randomization
    logic) for the arm difference in mean event value: the observed
    md5 split's mean difference is compared against PERM_B fresh
    md5-derived re-randomizations, p = (1 + #{|diff_r| >= |diff_obs|})
    / (B + 1) — the assumption-free twin of the z/U/F tests in this
    pack (no normality, no variance pooling), and with
    `bootstrap_ci_mean` it completes the resampling family: bootstrap
    for uncertainty, permutation for the null.

    Shape: ONE B-way map-side fan-out of narrow (replicate, arm, cents)
    rows — replicate arms derive from md5(r:id), so no shuffle of the
    data happens per replicate and the whole test is one groupBy on
    (r, arm) with exact BIGINT sums; the estimator compares B+1 exact
    ratios.  B*N rows is the honest cost of an exact-logic test at
    100 TB — and it is a MAP fan, not a join."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    obs_arm = (
        F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast("long")
        % 2
    )
    obs = ev.select(obs_arm.alias("arm"), "cents").groupBy().agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.sum(F.when(F.col("arm") == 1, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("arm") == 1, 1)))
            - F.sum(F.when(F.col("arm") == 0, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("arm") == 0, 1)))
        ).alias("diff_obs"),
    )
    reps = ev.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(PERM_B))).alias("r"),
    ).select(
        "r",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("event_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    diffs = reps.groupBy("r").agg(
        (
            F.sum(F.when(F.col("arm") == 1, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("arm") == 1, 1)))
            - F.sum(F.when(F.col("arm") == 0, F.col("cents")))
            / (100.0 * F.sum(F.when(F.col("arm") == 0, 1)))
        ).alias("diff_r")
    )
    return (
        diffs.crossJoin(F.broadcast(obs))
        .groupBy("n_rows", "diff_obs")
        .agg(
            F.count(F.lit(1)).cast("long").alias("b_reps"),
            F.sum(
                F.when(
                    F.abs(F.col("diff_r")) >= F.abs(F.col("diff_obs")), 1
                ).otherwise(0)
            ).alias("n_extreme"),
        )
        .select(
            F.col("n_rows").cast("long").alias("n_rows"),
            "b_reps",
            F.round("diff_obs", 6).alias("diff_obs"),
            F.col("n_extreme").cast("long").alias("n_extreme"),
            F.round(
                (F.col("n_extreme") + 1)
                / (F.col("b_reps").cast("double") + 1),
                6,
            ).alias("p_value"),
        )
    )


QUERIES["stats_permutation_test"] = stats_permutation_test
ORACLE_SQL["stats_permutation_test"] = f"""
    WITH ev AS (
        SELECT event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    obs AS (
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN arm = 1 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 1 THEN 1 END))
               - SUM(CASE WHEN arm = 0 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 0 THEN 1 END)) AS diff_obs
        FROM (SELECT cents,
                     ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                         ::BIGINT % 2 AS arm
              FROM ev)),
    reps AS (
        SELECT r.r, cents,
               ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                                   || CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS arm
        FROM ev CROSS JOIN
             (SELECT UNNEST(RANGE(1, {PERM_B + 1})) AS r) r),
    diffs AS (
        SELECT r,
               SUM(CASE WHEN arm = 1 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 1 THEN 1 END))
               - SUM(CASE WHEN arm = 0 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 0 THEN 1 END)) AS diff_r
        FROM reps GROUP BY r)
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS b_reps,
           ROUND(diff_obs, 6) AS diff_obs,
           CAST(SUM(CASE WHEN ABS(diff_r) >= ABS(diff_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
           ROUND((SUM(CASE WHEN ABS(diff_r) >= ABS(diff_obs)
                           THEN 1 ELSE 0 END) + 1)
                 / (COUNT(*) + 1.0), 6) AS p_value
    FROM diffs CROSS JOIN obs
    GROUP BY n_rows, diff_obs
"""

#: Replicates for the per-type permutation p-values feeding the BH
#: correction; smaller than PERM_B because the fan-out multiplies by
#: |types| and the BH demo needs p-resolution ~1/100, not 1/200.
FDR_B = 100
FDR_ALPHA = 0.1


def stats_fdr_bh_permutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over a FAMILY of permutation
    tests — the multiple-testing discipline an experimentation platform
    applies when one readout reports many metrics: a per-event-type
    permutation p-value (same Fisher-randomization machinery as
    `stats_permutation_test`, run per type in the SAME fan-out), then
    the BH step-up — order the m p-values, find the largest k with
    p_(k) <= k*alpha/m, reject 1..k — which controls the expected
    fraction of false discoveries at alpha, where per-test thresholds
    silently inflate it m-fold.

    Everything stays exact: p-values are ratios of exact counts, the
    BH boundary compare is the identical double expression in both
    engines, and the step-up's running max is one window over m rows."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    obs_arm = (
        F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast("long")
        % 2
    )
    diff = (
        F.sum(F.when(F.col("arm") == 1, F.col("cents")))
        / (100.0 * F.sum(F.when(F.col("arm") == 1, 1)))
        - F.sum(F.when(F.col("arm") == 0, F.col("cents")))
        / (100.0 * F.sum(F.when(F.col("arm") == 0, 1)))
    )
    obs = (
        ev.select("event_type", obs_arm.alias("arm"), "cents")
        .groupBy("event_type")
        .agg(diff.alias("diff_obs"))
    )
    reps = ev.select(
        "event_type",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(FDR_B))).alias("r"),
        "event_id",
    ).select(
        "event_type",
        "r",
        "cents",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("event_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    2,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    diffs = reps.groupBy("event_type", "r").agg(diff.alias("diff_r"))
    pvals = (
        diffs.join(F.broadcast(obs), "event_type")
        .groupBy("event_type", "diff_obs")
        .agg(
            (
                (
                    F.sum(
                        F.when(
                            F.abs(F.col("diff_r"))
                            >= F.abs(F.col("diff_obs")),
                            1,
                        ).otherwise(0)
                    )
                    + 1
                )
                / (F.count(F.lit(1)).cast("double") + 1)
            ).alias("p")
        )
    )
    w_rank = Window.orderBy("p", "event_type")
    w_all = Window.partitionBy()
    w_suffix = Window.orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = pvals.select(
        "event_type",
        "diff_obs",
        "p",
        F.row_number().over(w_rank).alias("k"),
        F.count(F.lit(1)).over(w_all).alias("m"),
    ).withColumn(
        "bh_ok",
        F.col("p") <= F.col("k") * FDR_ALPHA / F.col("m"),
    )
    # step-up: reject everything at or below the LARGEST passing k —
    # a suffix running max of the pass flag
    stepped = ranked.withColumn(
        "rejected", F.max(F.when(F.col("bh_ok"), 1).otherwise(0)).over(w_suffix) == 1
    )
    return stepped.select(
        F.col("k").cast("int").alias("rank"),
        "event_type",
        F.round("diff_obs", 6).alias("diff_obs"),
        F.round("p", 6).alias("p_value"),
        F.round(F.col("k") * FDR_ALPHA / F.col("m"), 6).alias(
            "bh_threshold"
        ),
        "rejected",
    ).orderBy("rank")


QUERIES["stats_fdr_bh_permutation"] = stats_fdr_bh_permutation
ORACLE_SQL["stats_fdr_bh_permutation"] = f"""
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    obs AS (
        SELECT event_type,
               SUM(CASE WHEN arm = 1 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 1 THEN 1 END))
               - SUM(CASE WHEN arm = 0 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 0 THEN 1 END)) AS diff_obs
        FROM (SELECT event_type, cents,
                     ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                         ::BIGINT % 2 AS arm
              FROM ev)
        GROUP BY event_type),
    reps AS (
        SELECT event_type, r.r, cents,
               ('0x' || substr(md5(CAST(r.r AS VARCHAR) || ':'
                                   || CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS arm
        FROM ev CROSS JOIN
             (SELECT UNNEST(RANGE(1, {FDR_B + 1})) AS r) r),
    diffs AS (
        SELECT event_type, r,
               SUM(CASE WHEN arm = 1 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 1 THEN 1 END))
               - SUM(CASE WHEN arm = 0 THEN cents END)
               / (100.0 * SUM(CASE WHEN arm = 0 THEN 1 END)) AS diff_r
        FROM reps GROUP BY event_type, r),
    pvals AS (
        SELECT diffs.event_type, diff_obs,
               (SUM(CASE WHEN ABS(diff_r) >= ABS(diff_obs)
                         THEN 1 ELSE 0 END) + 1)
               / (COUNT(*) + 1.0) AS p
        FROM diffs JOIN obs ON obs.event_type = diffs.event_type
        GROUP BY diffs.event_type, diff_obs),
    ranked AS (
        SELECT event_type, diff_obs, p,
               ROW_NUMBER() OVER (ORDER BY p, event_type) AS k,
               COUNT(*) OVER () AS m
        FROM pvals),
    stepped AS (
        SELECT *,
               p <= k * {FDR_ALPHA} / m AS bh_ok,
               MAX(CASE WHEN p <= k * {FDR_ALPHA} / m THEN 1 ELSE 0 END)
                   OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) = 1
                   AS rejected
        FROM ranked)
    SELECT CAST(k AS INT) AS rank, event_type,
           ROUND(diff_obs, 6) AS diff_obs,
           ROUND(p, 6) AS p_value,
           ROUND(k * {FDR_ALPHA} / m, 6) AS bh_threshold,
           rejected
    FROM stepped
    ORDER BY rank
"""

#: TOST equivalence margin: +/-2% of the control mean — the "no
#: meaningful difference" band a do-no-harm launch review uses.
TOST_MARGIN_FRAC = 0.02
#: one-sided z critical value at alpha = 0.05
TOST_Z_CRIT = 1.645


def ab_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO ONE-SIDED TESTS (TOST, Schuirmann '87) for EQUIVALENCE of
    the md5 arms per event type — the inverted question the rest of
    the pack cannot ask: not "is there a difference?" but "can we
    RULE OUT a meaningful one?" (the do-no-harm launch gate; a
    non-significant difference test is NOT evidence of equivalence).
    Equivalence at margin m holds iff z_lower = (delta + m)/se >
    z_crit AND z_upper = (delta - m)/se < -z_crit.

    One (type, arm) pass of exact cent moments gives means and
    variances; the margin derives from the control mean so it scales
    with the metric.  All estimator arithmetic is the identical IEEE
    tree over exact BIGINT inputs in both engines."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (
            F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast(
                "long"
            )
            % 2
        ).alias("arm"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cells = ev.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    t = cells.where(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("nt"),
        F.col("s").alias("st"),
        F.col("ss").alias("sst"),
    )
    c = cells.where(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("nc"),
        F.col("s").alias("sc"),
        F.col("ss").alias("ssc"),
    )
    nt = F.col("nt").cast("double")
    nc = F.col("nc").cast("double")
    mt = F.col("st") / (100.0 * nt)
    mc = F.col("sc") / (100.0 * nc)
    vt = (F.col("sst") / 10000.0 - nt * mt * mt) / (nt - 1)
    vc = (F.col("ssc") / 10000.0 - nc * mc * mc) / (nc - 1)
    se = F.sqrt(vt / nt + vc / nc)
    delta = mt - mc
    margin = F.abs(mc) * TOST_MARGIN_FRAC
    z_lo = (delta + margin) / se
    z_hi = (delta - margin) / se
    return (
        t.join(c, "event_type")
        .select(
            "event_type",
            (F.col("nt") + F.col("nc")).cast("long").alias("n_rows"),
            F.round(delta, 6).alias("delta"),
            F.round(margin, 6).alias("margin"),
            F.round(se, 6).alias("std_err"),
            F.round(z_lo, 6).alias("z_lower"),
            F.round(z_hi, 6).alias("z_upper"),
            (
                (z_lo > TOST_Z_CRIT) & (z_hi < -TOST_Z_CRIT)
            ).alias("equivalent"),
        )
        .orderBy("event_type")
    )


QUERIES["ab_tost_equivalence"] = ab_tost_equivalence
ORACLE_SQL["ab_tost_equivalence"] = f"""
    WITH ev AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                   ::BIGINT % 2 AS arm,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    cells AS (
        SELECT event_type, arm, COUNT(*) AS n, SUM(cents) AS s,
               SUM(cents * cents) AS ss
        FROM ev GROUP BY event_type, arm),
    t AS (SELECT event_type, n AS nt, s AS st, ss AS sst
          FROM cells WHERE arm = 1),
    c AS (SELECT event_type, n AS nc, s AS sc, ss AS ssc
          FROM cells WHERE arm = 0),
    est AS (
        SELECT event_type, nt, nc,
               st / (100.0 * nt) AS mt,
               sc / (100.0 * nc) AS mc,
               SQRT(((sst / 10000.0 - nt * (st / (100.0 * nt))
                                         * (st / (100.0 * nt)))
                     / (nt - 1)) / nt
                    + ((ssc / 10000.0 - nc * (sc / (100.0 * nc))
                                           * (sc / (100.0 * nc)))
                       / (nc - 1)) / nc) AS se
        FROM t JOIN c USING (event_type))
    SELECT event_type,
           CAST(nt + nc AS BIGINT) AS n_rows,
           ROUND(mt - mc, 6) AS delta,
           ROUND(ABS(mc) * {TOST_MARGIN_FRAC}, 6) AS margin,
           ROUND(se, 6) AS std_err,
           ROUND((mt - mc + ABS(mc) * {TOST_MARGIN_FRAC}) / se, 6)
               AS z_lower,
           ROUND((mt - mc - ABS(mc) * {TOST_MARGIN_FRAC}) / se, 6)
               AS z_upper,
           ((mt - mc + ABS(mc) * {TOST_MARGIN_FRAC}) / se > {TOST_Z_CRIT}
            AND (mt - mc - ABS(mc) * {TOST_MARGIN_FRAC}) / se
                < -{TOST_Z_CRIT}) AS equivalent
    FROM est
    ORDER BY event_type
"""


def ab_bandit_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-armed-bandit arm summary: per-arm UCB1 exploration bound
    (Auer '02, mean + sqrt(2 ln N / n)) and the Beta posterior a
    Thompson sampler would draw from (alpha = 1 + successes,
    beta = 1 + failures) — the allocation table an adaptive experiment
    reads each epoch, beside the fixed-horizon tests (CUPED/SRM/MDE)
    this pack already carries.  Arms are event types; reward is the
    conversion proxy value > $100.

    One conditional-aggregation pass produces exact (pulls, successes)
    per arm; UCB/posterior math is |arms| rows of identical double
    ops (ln over exact integers).  Ranking sorts the 6dp-rounded UCB
    with the arm name as tie-break."""
    ev = load_table(spark, "events", sf_dir)
    arms = ev.groupBy(F.col("event_type").alias("arm")).agg(
        F.count(F.lit(1)).alias("n_pulls"),
        F.sum(F.when(F.col("value") > 100.0, 1).otherwise(0)).alias(
            "n_success"
        ),
    )
    total = arms.agg(F.sum("n_pulls").alias("n_total"))
    mean = F.col("n_success").cast("double") / F.col("n_pulls")
    ucb = mean + F.sqrt(
        F.lit(2.0)
        * F.log(F.col("n_total").cast("double"))
        / F.col("n_pulls")
    )
    post_mean = (F.col("n_success") + 1).cast("double") / (
        F.col("n_pulls") + 2
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("ucb1"), F.asc("arm"))
    return (
        arms.crossJoin(F.broadcast(total))
        .select(
            "arm",
            "n_pulls",
            "n_success",
            F.round(mean, 6).alias("mean_reward"),
            F.round(ucb, 6).alias("ucb1"),
            (F.col("n_success") + 1).alias("post_alpha"),
            (F.col("n_pulls") - F.col("n_success") + 1).alias("post_beta"),
            F.round(post_mean, 6).alias("post_mean"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .orderBy("rank")
    )


QUERIES["ab_bandit_ucb"] = ab_bandit_ucb
ORACLE_SQL["ab_bandit_ucb"] = """
    WITH arms AS (
        SELECT event_type AS arm,
               COUNT(*) AS n_pulls,
               SUM(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS n_success
        FROM events GROUP BY event_type),
    t AS (SELECT SUM(n_pulls) AS n_total FROM arms),
    scored AS (
        SELECT arm,
               CAST(n_pulls AS BIGINT) AS n_pulls,
               CAST(n_success AS BIGINT) AS n_success,
               ROUND(CAST(n_success AS DOUBLE) / n_pulls, 6) AS mean_reward,
               ROUND(CAST(n_success AS DOUBLE) / n_pulls
                     + SQRT(2.0 * LN(CAST(n_total AS DOUBLE)) / n_pulls),
                     6) AS ucb1,
               CAST(n_success + 1 AS BIGINT) AS post_alpha,
               CAST(n_pulls - n_success + 1 AS BIGINT) AS post_beta,
               ROUND(CAST(n_success + 1 AS DOUBLE) / (n_pulls + 2), 6)
                   AS post_mean
        FROM arms CROSS JOIN t)
    SELECT arm, n_pulls, n_success, mean_reward, ucb1,
           post_alpha, post_beta, post_mean,
           CAST(ROW_NUMBER() OVER (ORDER BY ucb1 DESC, arm ASC) AS BIGINT)
               AS rank
    FROM scored
    ORDER BY rank
"""
