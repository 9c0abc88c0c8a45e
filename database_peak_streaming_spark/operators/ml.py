"""Classical-ML-on-Spark pack: the model-adjacent table operators a
training pipeline runs beside the feature store — one-pass OLS via
normal equations, leakage-safe out-of-fold target encoding, WOE/IV
predictive binning, and split-conformal interval calibration.

These four share one design rule: the MODEL math runs on a handful of
sufficient statistics; only computing those statistics is data-sized.
That is exactly the 100 TB shape — a single partial-aggregable pass
(or one bounded groupBy) produces exact integer moments/counts, and
the solve/encode/calibrate step happens on vocabulary-sized frames.

Hash-stability follows the repo-wide discipline (FIXTURES.md): inputs
quantize onto an exact integer grid (cents / dollars / basis points),
every data-sized sum is therefore exact BIGINT, and the few double
operations that follow are identical IEEE expression trees over
identical inputs in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def _md5_of(col: str):
    """Cross-engine stable pseudo-random key (sampling.py convention)."""
    return F.md5(F.col(col).cast("string").cast("binary"))


def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression (price ~ quantity + discount) fit by
    the NORMAL EQUATIONS in one distributed pass — the closed-form
    trainer for low-dimensional models: X^T X and X^T y reduce to ten
    sufficient moments, computed map-side-combinable in ONE aggregation,
    and the 2x2 solve (Cramer's rule on the centered system) runs on a
    single row.  This is how you fit a linear probe / calibration model
    over 100 TB without an iteration loop: the data is touched once,
    the solve is O(d^3) on d=2.

    Exactness: inputs quantize to integer grids (quantity units,
    discount percent points, price dollars), so all ten moments are
    exact BIGINTs (y^2 sums bounded: 1e5-dollar max price squared is
    1e10/row — BIGINT holds to ~1e9 rows/partition-merge; the decimal
    escalation for beyond is documented in common.py).  Centering
    conditions the solve; products of whole-table sums go through
    doubles FIRST (an exact-integer sy*sy would overflow ANSI BIGINT
    at this scale; the IEEE product of the exact doubles is correctly
    rounded and engine-identical).

    Emits betas, intercept and in-sample R^2."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.round(F.col("l_quantity"), 0).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice"), 0).cast("long").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")

    def d(c: str):
        return F.col(c).cast("double")

    c11 = F.col("sx1x1") - d("sx1") * d("sx1") / n
    c12 = F.col("sx1x2") - d("sx1") * d("sx2") / n
    c22 = F.col("sx2x2") - d("sx2") * d("sx2") / n
    c1y = F.col("sx1y") - d("sx1") * d("sy") / n
    c2y = F.col("sx2y") - d("sx2") * d("sy") / n
    cyy = F.col("syy") - d("sy") * d("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c1y * c22 - c2y * c12) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    ess = b1 * c1y + b2 * c2y
    return m.select(
        F.col("n").cast("long").alias("n_rows"),
        F.round(b1, 6).alias("beta_quantity"),
        F.round(b2, 6).alias("beta_discount_pct"),
        F.round(
            F.col("sy") / n - b1 * F.col("sx1") / n - b2 * F.col("sx2") / n,
            6,
        ).alias("intercept"),
        F.round(ess / cyy, 6).alias("r_squared"),
    )


def feature_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe OUT-OF-FOLD target encoding of the market segment
    against order value — the categorical-feature workhorse: each
    (category, fold) cell is encoded with the target mean computed over
    the OTHER folds, so no row's own target leaks into its feature.
    Folds derive from md5(order key) mod 5 (the engine-portable split
    convention, sampling.py), so the encoding is reproducible across
    engines, re-shardings and appends.

    The leave-one-fold-out mean needs NO per-fold re-scan: one
    (category, fold) aggregation gives cell sums/counts, the category
    rollup gives totals, and OOF mean = (total - own fold) / (n_total
    - n_fold) — subtraction on exact cent-grid BIGINTs.  One data-sized
    shuffle total, category-vocabulary-sized everything after."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment",
        (
            F.conv(F.substring(_md5_of("o_orderkey"), 1, 2), 16, 10).cast(
                "long"
            )
            % 5
        ).alias("fold"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    cell = j.groupBy("c_mktsegment", "fold").agg(
        F.count(F.lit(1)).alias("n_cf"), F.sum("cents").alias("s_cf")
    )
    seg = cell.groupBy("c_mktsegment").agg(
        F.sum("n_cf").alias("n_c"), F.sum("s_cf").alias("s_c")
    )
    return (
        cell.join(seg, "c_mktsegment")
        .select(
            "c_mktsegment",
            "fold",
            F.col("n_cf").cast("long").alias("n_rows"),
            F.round(
                (F.col("s_c") - F.col("s_cf"))
                / (F.lit(100.0) * (F.col("n_c") - F.col("n_cf"))),
                6,
            ).alias("oof_encoding"),
        )
        .orderBy("c_mktsegment", "fold")
    )


def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning: order value cut
    into deciles (NTILE over a (price, key)-tie-broken total order, so
    the binning is engine-identical), label = urgent-or-high priority;
    per decile WOE = ln((pos share)/(neg share)) and the IV term whose
    sum ranks the feature's predictive power — the credit-scoring
    feature-selection standard, and the audit that catches a feature
    whose signal lives in one tail.

    Scale note: NTILE over a global order is a single-partition sort at
    the limit; at 100 TB swap the decile assignment for approx
    percentile boundaries broadcast to a map-only bucketizer (the
    winsorize/equidepth pattern in aggregates.py) — the WOE math
    downstream is identical.  Counts are exact BIGINT; shares and ln
    run over 10 rows."""
    o = load_table(spark, "orders", sf_dir).select(
        F.ntile(10)
        .over(Window.orderBy("o_totalprice", "o_orderkey"))
        .alias("decile"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("pos"),
    )
    cells = o.groupBy("decile").agg(
        F.sum("pos").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).alias("n_neg"),
    )
    tot = cells.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg")
    )
    woe = F.log(
        (F.col("n_pos") / F.col("t_pos")) / (F.col("n_neg") / F.col("t_neg"))
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            F.round(woe, 6).alias("woe"),
            F.round(
                (
                    F.col("n_pos") / F.col("t_pos")
                    - F.col("n_neg") / F.col("t_neg")
                )
                * woe,
                6,
            ).alias("iv_term"),
        )
        .orderBy("decile")
    )


def model_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk; Lei et al. JASA'18)
    for a per-type mean-value predictor: md5 buckets carve
    train/calibration/test (50/25/25), the calibration set's absolute
    residuals yield the finite-sample quantile q_hat = the
    ceil(0.9(n+1))-th order statistic, and the held-out test fraction
    inside ±q_hat is the measured coverage (≈90% by the conformal
    guarantee, exactly distribution-free).  This is the calibration
    pass that turns any point model into intervals with a guarantee —
    run here entirely as joins + one ranked window.

    Determinism: the order statistic is picked by ROW_NUMBER over
    (residual, event_id) — fully tie-broken; residuals are identical
    doubles in both engines (cent-grid values minus an
    exact-int-ratio mean).  Scale: residual ranking partitions by
    event type (bounded groups at any scale); train means broadcast."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (
            F.conv(F.substring(_md5_of("event_id"), 1, 2), 16, 10).cast(
                "long"
            )
            % 4
        ).alias("bucket"),
    )
    train = ev.where(F.col("bucket") <= 1)
    mean = train.groupBy("event_type").agg(
        (F.sum("cents") / (F.lit(100.0) * F.count(F.lit(1)))).alias("pred")
    )
    cal = (
        ev.where(F.col("bucket") == 2)
        .join(mean, "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("cents") / F.lit(100.0) - F.col("pred")).alias(
                "resid"
            ),
        )
    )
    ncal = cal.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_cal"))
    w = Window.partitionBy("event_type").orderBy("resid", "event_id")
    qhat = (
        cal.select("event_type", "resid", F.row_number().over(w).alias("rk"))
        .join(ncal, "event_type")
        .where(
            F.col("rk") == F.ceil(F.lit(0.9) * (F.col("n_cal") + 1)).cast("int")
        )
        .select("event_type", F.col("resid").alias("qhat"), "n_cal")
    )
    return (
        ev.where(F.col("bucket") == 3)
        .join(mean, "event_type")
        .join(qhat, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_cal").cast("long").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(F.first("qhat"), 6).alias("qhat"),
            F.round(
                F.avg(
                    (
                        F.abs(F.col("cents") / F.lit(100.0) - F.col("pred"))
                        <= F.col("qhat")
                    ).cast("double")
                ),
                6,
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


def ml_logreg_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (returned-flag ~ quantity + discount) fit by
    ONE exact Newton/IRLS step from the zero initialization — the
    distributed GLM trainer in miniature.  At beta = 0 every predicted
    probability is 1/2, so the IRLS working response collapses to the
    constant-weight least-squares problem z = 4(y - 1/2): the step is
    EXACTLY the `ml_linreg_normal_eq` machinery on a +/-2 target, nine
    exact-BIGINT moments and a Cramer solve on one row.  A full GLM
    fit is this operator iterated — each step one data pass, the solve
    always vocabulary-sized; one step is already the standard
    large-scale approximation (and the score test's direction).

    A second broadcast pass scores the step: mean log-loss of the
    one-step model, ln(1+exp(a)) - y*a with a the linear predictor —
    the number you compare against the 0-step baseline ln 2 to see the
    step helped.  Betas are identical IEEE expression trees over exact
    integer moments in both engines; log-loss differs only by libm
    ulps, far inside the 6-decimal round of the mean."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.round(F.col("l_quantity"), 0).cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    z = (F.col("y") * 4 - 2).alias("z")
    rows = li.select("x1", "x2", "y", z)
    m = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx1x1"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx1x2"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx2x2"),
        F.sum(F.col("x1") * F.col("z")).alias("sx1z"),
        F.sum(F.col("x2") * F.col("z")).alias("sx2z"),
    )
    n = F.col("n").cast("double")

    def d(c: str):
        return F.col(c).cast("double")

    c11 = F.col("sx1x1") - d("sx1") * d("sx1") / n
    c12 = F.col("sx1x2") - d("sx1") * d("sx2") / n
    c22 = F.col("sx2x2") - d("sx2") * d("sx2") / n
    c1z = F.col("sx1z") - d("sx1") * d("sz") / n
    c2z = F.col("sx2z") - d("sx2") * d("sz") / n
    det = c11 * c22 - c12 * c12
    betas = m.select(
        F.col("n").cast("long").alias("n_rows"),
        ((c1z * c22 - c2z * c12) / det).alias("b1"),
        ((c11 * c2z - c12 * c1z) / det).alias("b2"),
        "sx1",
        "sx2",
        "sz",
    ).select(
        "n_rows",
        "b1",
        "b2",
        (
            F.col("sz") / F.col("n_rows")
            - F.col("b1") * F.col("sx1") / F.col("n_rows")
            - F.col("b2") * F.col("sx2") / F.col("n_rows")
        ).alias("b0"),
    )
    a = (
        F.col("b0")
        + F.col("b1") * F.col("x1")
        + F.col("b2") * F.col("x2")
    )
    return (
        rows.crossJoin(F.broadcast(betas))
        .groupBy("n_rows")
        .agg(
            F.round(F.first("b0"), 6).alias("beta0"),
            F.round(F.first("b1"), 6).alias("beta_quantity"),
            F.round(F.first("b2"), 6).alias("beta_discount_pct"),
            F.round(
                F.avg(F.log(F.lit(1.0) + F.exp(a)) - F.col("y") * a), 6
            ).alias("avg_logloss"),
        )
        .select(
            "n_rows", "beta0", "beta_quantity", "beta_discount_pct",
            "avg_logloss",
        )
    )


def feature_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION of the per-type event-value distributions
    onto the pooled distribution (the microarray-era standard, Bolstad
    et al. Bioinformatics'03, now the cross-source feature-alignment
    step): each value is replaced by the pooled value at its
    within-group quantile, so every group ends up with an identical
    marginal distribution while preserving within-group order.

    The mapping is EXACT INTEGER arithmetic end to end: within-group
    rank r of n_g maps to pooled position
    ceil((2r-1) * N / (2*n_g)) = ((2r-1)*N + 2*n_g - 1) div (2*n_g)
    (the midpoint-quantile convention), and the pooled value is looked
    up by an equi-join on that position — no interpolation doubles, so
    both engines pick the identical pooled cent value for every row.
    Emits the per-type audit (raw vs normalized means, normalized
    range) that shows the marginals converged.

    Scale note: both row_number passes are window sorts (the pooled one
    global) — at 100 TB swap in broadcast approx-percentile boundaries
    for the pooled CDF and bin-local ranks (the winsorize pattern);
    the position algebra is unchanged."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    w_g = Window.partitionBy("event_type").orderBy("cents", "event_id")
    w_gc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(w_g).alias("r"),
        F.count(F.lit(1)).over(w_gc).alias("ng"),
    )
    w_p = Window.orderBy("cents", "event_id")
    pooled = ev.select(
        F.row_number().over(w_p).alias("pos"),
        F.col("cents").alias("pooled_cents"),
    )
    tot = ev.agg(F.count(F.lit(1)).alias("n_total"))
    norm = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "pos",
            F.expr(
                "((2 * r - 1) * n_total + 2 * ng - 1) div (2 * ng)"
            ),
        )
        .join(pooled, "pos")
    )
    return (
        norm.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum("cents") / (100.0 * F.count(F.lit(1))), 6).alias(
                "mean_raw"
            ),
            F.round(
                F.sum("pooled_cents") / (100.0 * F.count(F.lit(1))), 6
            ).alias("mean_norm"),
            F.round(F.min("pooled_cents") / 100.0, 6).alias("min_norm"),
            F.round(F.max("pooled_cents") / 100.0, 6).alias("max_norm"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "ml_logreg_irls_step": ml_logreg_irls_step,
    "feature_quantile_normalize": feature_quantile_normalize,
    "ml_linreg_normal_eq": ml_linreg_normal_eq,
    "feature_target_encode_oof": feature_target_encode_oof,
    "feature_woe_iv": feature_woe_iv,
    "model_conformal_interval": model_conformal_interval,
}

ORACLE_SQL = {
    "ml_logreg_irls_step": """
        WITH rows_ AS (
            SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS x1,
                   CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
                   CASE WHEN l_returnflag = 'R' THEN 2 ELSE -2 END AS z
            FROM lineitem),
        m AS (
            SELECT COUNT(*) AS n, SUM(x1) AS sx1, SUM(x2) AS sx2,
                   SUM(z) AS sz,
                   SUM(x1 * x1) AS sx1x1, SUM(x1 * x2) AS sx1x2,
                   SUM(x2 * x2) AS sx2x2, SUM(x1 * z) AS sx1z,
                   SUM(x2 * z) AS sx2z
            FROM rows_),
        c AS (
            SELECT n, sx1, sx2, sz,
                   sx1x1 - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c11,
                   sx1x2 - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c12,
                   sx2x2 - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c22,
                   sx1z - CAST(sx1 AS DOUBLE) * CAST(sz AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c1z,
                   sx2z - CAST(sx2 AS DOUBLE) * CAST(sz AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c2z
            FROM m),
        b AS (
            SELECT n,
                   (c1z * c22 - c2z * c12) / (c11 * c22 - c12 * c12) AS b1,
                   (c11 * c2z - c12 * c1z) / (c11 * c22 - c12 * c12) AS b2,
                   sx1, sx2, sz
            FROM c),
        bb AS (
            SELECT n, b1, b2,
                   CAST(sz AS DOUBLE) / n - b1 * sx1 / CAST(n AS DOUBLE)
                       - b2 * sx2 / CAST(n AS DOUBLE) AS b0
            FROM b)
        SELECT CAST(bb.n AS BIGINT) AS n_rows,
               ROUND(ANY_VALUE(b0), 6) AS beta0,
               ROUND(ANY_VALUE(b1), 6) AS beta_quantity,
               ROUND(ANY_VALUE(b2), 6) AS beta_discount_pct,
               ROUND(AVG(LN(1.0 + EXP(b0 + b1 * x1 + b2 * x2))
                         - y * (b0 + b1 * x1 + b2 * x2)), 6)
                   AS avg_logloss
        FROM rows_ CROSS JOIN bb
        GROUP BY bb.n
    """,
    "ml_linreg_normal_eq": """
        WITH q AS (
            SELECT CAST(ROUND(l_quantity, 0) AS BIGINT) AS x1,
                   CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS x2,
                   CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS y
            FROM lineitem),
        m AS (
            SELECT COUNT(*) AS n, SUM(x1) AS sx1, SUM(x2) AS sx2,
                   SUM(y) AS sy,
                   SUM(x1 * x1) AS sx1x1, SUM(x1 * x2) AS sx1x2,
                   SUM(x2 * x2) AS sx2x2, SUM(x1 * y) AS sx1y,
                   SUM(x2 * y) AS sx2y, SUM(y * y) AS syy
            FROM q),
        c AS (
            SELECT n,
                   sx1x1 - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c11,
                   sx1x2 - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c12,
                   sx2x2 - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c22,
                   sx1y - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c1y,
                   sx2y - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE) AS c2y,
                   syy - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                           / CAST(n AS DOUBLE) AS cyy,
                   sx1, sx2, sy
            FROM m),
        s AS (
            SELECT n, sx1, sx2, sy, c1y, c2y, cyy,
                   (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
                   (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
            FROM c)
        SELECT CAST(n AS BIGINT) AS n_rows,
               ROUND(b1, 6) AS beta_quantity,
               ROUND(b2, 6) AS beta_discount_pct,
               ROUND(sy / CAST(n AS DOUBLE) - b1 * sx1 / CAST(n AS DOUBLE)
                      - b2 * sx2 / CAST(n AS DOUBLE), 6) AS intercept,
               ROUND((b1 * c1y + b2 * c2y) / cyy, 6) AS r_squared
        FROM s
    """,
    "feature_target_encode_oof": """
        WITH j AS (
            SELECT c.c_mktsegment,
                   ('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 2))
                       ::BIGINT % 5 AS fold,
                   CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        cell AS (
            SELECT c_mktsegment, fold, COUNT(*) AS n_cf, SUM(cents) AS s_cf
            FROM j GROUP BY c_mktsegment, fold),
        seg AS (
            SELECT c_mktsegment, SUM(n_cf) AS n_c, SUM(s_cf) AS s_c
            FROM cell GROUP BY c_mktsegment)
        SELECT cell.c_mktsegment, fold,
               CAST(n_cf AS BIGINT) AS n_rows,
               ROUND((s_c - s_cf) / (100.0 * (n_c - n_cf)), 6)
                   AS oof_encoding
        FROM cell JOIN seg USING (c_mktsegment)
        ORDER BY c_mktsegment, fold
    """,
    "feature_woe_iv": """
        WITH o AS (
            SELECT NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey)
                       AS decile,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS pos
            FROM orders),
        cells AS (
            SELECT decile, SUM(pos) AS n_pos, SUM(1 - pos) AS n_neg
            FROM o GROUP BY decile),
        tot AS (SELECT SUM(n_pos) AS t_pos, SUM(n_neg) AS t_neg FROM cells)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(n_pos AS BIGINT) AS n_pos,
               CAST(n_neg AS BIGINT) AS n_neg,
               ROUND(LN((n_pos * 1.0 / t_pos) / (n_neg * 1.0 / t_neg)), 6)
                   AS woe,
               ROUND((n_pos * 1.0 / t_pos - n_neg * 1.0 / t_neg)
                     * LN((n_pos * 1.0 / t_pos) / (n_neg * 1.0 / t_neg)), 6)
                   AS iv_term
        FROM cells CROSS JOIN tot
        ORDER BY decile
    """,
    "model_conformal_interval": """
        WITH ev AS (
            SELECT event_id, event_type,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
                   ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                       ::BIGINT % 4 AS bucket
            FROM events),
        mean AS (
            SELECT event_type, SUM(cents) / (100.0 * COUNT(*)) AS pred
            FROM ev WHERE bucket <= 1 GROUP BY event_type),
        cal AS (
            SELECT ev.event_type, event_id,
                   ABS(cents / 100.0 - pred) AS resid
            FROM ev JOIN mean USING (event_type) WHERE bucket = 2),
        ncal AS (
            SELECT event_type, COUNT(*) AS n_cal FROM cal
            GROUP BY event_type),
        qhat AS (
            SELECT event_type, resid AS qhat, n_cal
            FROM (SELECT event_type, resid,
                         ROW_NUMBER() OVER (PARTITION BY event_type
                                            ORDER BY resid, event_id) AS rk
                  FROM cal) r
            JOIN ncal USING (event_type)
            WHERE rk = CAST(CEIL(0.9 * (n_cal + 1)) AS INT))
        SELECT ev.event_type,
               CAST(ANY_VALUE(n_cal) AS BIGINT) AS n_cal,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               ROUND(ANY_VALUE(qhat), 6) AS qhat,
               ROUND(AVG(CASE WHEN ABS(cents / 100.0 - pred) <= qhat
                              THEN 1.0 ELSE 0.0 END), 6) AS coverage
        FROM ev JOIN mean USING (event_type) JOIN qhat USING (event_type)
        WHERE bucket = 3
        GROUP BY ev.event_type
        ORDER BY ev.event_type
    """,
}

ORACLE_SQL["feature_quantile_normalize"] = """
    WITH ev AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events),
    ranked AS (
        SELECT event_type, cents,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS r,
               COUNT(*) OVER (PARTITION BY event_type) AS ng
        FROM ev),
    pooled AS (
        SELECT ROW_NUMBER() OVER (ORDER BY cents, event_id) AS pos,
               cents AS pooled_cents
        FROM ev),
    tot AS (SELECT COUNT(*) AS n_total FROM ev),
    norm AS (
        SELECT event_type, cents, pooled_cents
        FROM ranked CROSS JOIN tot
        JOIN pooled
          ON pooled.pos = ((2 * r - 1) * n_total + 2 * ng - 1) // (2 * ng))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(cents) / (100.0 * COUNT(*)), 6) AS mean_raw,
           ROUND(SUM(pooled_cents) / (100.0 * COUNT(*)), 6) AS mean_norm,
           ROUND(MIN(pooled_cents) / 100.0, 6) AS min_norm,
           ROUND(MAX(pooled_cents) / 100.0, 6) AS max_norm
    FROM norm
    GROUP BY event_type
    ORDER BY event_type
"""


def ml_gbdt_histogram_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-based best-split finding — the inner loop of every
    distributed gradient-boosted-tree trainer (XGBoost's approx/hist
    mode, LightGBM's feature histograms): bucket each feature, reduce
    the corpus to per-(feature, bin) gradient/hessian sums, and scan
    bin boundaries for the split maximizing the regularized gain
        0.5 * (GL^2/(HL+lambda) + GR^2/(HR+lambda) - G^2/(H+lambda)).

    This is the 100 TB shape for tree training: the ONLY data-sized
    work is one map-side-combinable groupBy producing
    |features| x |bins| rows (30 here); every candidate split is then a
    window cumsum over that tiny frame.  Deepening the tree repeats the
    same pass with a node-id column in the key — the histogram table
    stays bounded by nodes x features x bins, never by rows.

    Task: one root-node split for label y = (l_returnflag = 'R') at
    base score p = 0.5, so per-row grad g = p - y and hess h = p(1-p)
    = 0.25 are RATIONALS on the integer grid: 2*sum(g) = cnt - 2*sum(y)
    and 4*sum(h) = cnt are exact BIGINTs, and the gain arithmetic runs
    on doubles derived from identical exact integers in both engines.
    Features: quantity (10 bins of width 5), discount percent (11
    bins), ship month (12 bins)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("dpct"),
        (F.month("l_shipdate") - 1).cast("long").alias("mbin"),
        F.when(F.col("l_returnflag") == "R", F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )
    binned = li.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("quantity").alias("feature"),
                    F.expr("(q - 1) div 5").alias("bin"),
                ),
                F.struct(
                    F.lit("discount_pct").alias("feature"),
                    F.col("dpct").alias("bin"),
                ),
                F.struct(
                    F.lit("ship_month").alias("feature"),
                    F.col("mbin").alias("bin"),
                ),
            )
        ).alias("fb"),
        "y",
    ).select(F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin"), "y")
    hist = binned.groupBy("feature", "bin").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("sy")
    )
    w_cum = (
        Window.partitionBy("feature")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        "bin",
        F.sum("cnt").over(w_cum).alias("cnt_l"),
        F.sum("sy").over(w_cum).alias("sy_l"),
        F.sum("cnt").over(w_all).alias("cnt_t"),
        F.sum("sy").over(w_all).alias("sy_t"),
    ).filter(F.col("cnt_l") < F.col("cnt_t"))

    def _gh(cnt, sy):
        g = (cnt - 2 * sy).cast("double") / F.lit(2.0)
        h = cnt.cast("double") / F.lit(4.0)
        return g, h

    gl, hl = _gh(F.col("cnt_l"), F.col("sy_l"))
    gr, hr = _gh(F.col("cnt_t") - F.col("cnt_l"), F.col("sy_t") - F.col("sy_l"))
    gt, ht = _gh(F.col("cnt_t"), F.col("sy_t"))
    gain = F.lit(0.5) * (
        gl * gl / (hl + F.lit(1.0))
        + gr * gr / (hr + F.lit(1.0))
        - gt * gt / (ht + F.lit(1.0))
    )
    w_best = Window.partitionBy("feature").orderBy(
        F.desc("gain"), F.asc("bin")
    )
    return (
        cum.withColumn("gain", gain)
        .withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select(
            "feature",
            F.col("bin").alias("split_after_bin"),
            F.col("cnt_l").alias("n_left"),
            (F.col("cnt_t") - F.col("cnt_l")).alias("n_right"),
            F.col("sy_l").alias("pos_left"),
            F.round("gain", 6).alias("gain"),
        )
        .orderBy("feature")
    )


QUERIES["ml_gbdt_histogram_split"] = ml_gbdt_histogram_split
ORACLE_SQL["ml_gbdt_histogram_split"] = """
    WITH rows_fb AS (
        SELECT 'quantity' AS feature,
               (CAST(l_quantity AS BIGINT) - 1) // 5 AS bin,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
        UNION ALL
        SELECT 'discount_pct',
               CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM lineitem
        UNION ALL
        SELECT 'ship_month',
               CAST(MONTH(l_shipdate) - 1 AS BIGINT),
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
        FROM lineitem),
    hist AS (
        SELECT feature, bin, COUNT(*) AS cnt, SUM(y) AS sy
        FROM rows_fb GROUP BY feature, bin),
    cum AS (
        SELECT feature, bin,
               SUM(cnt) OVER (PARTITION BY feature ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS cnt_l,
               SUM(sy) OVER (PARTITION BY feature ORDER BY bin
                   ROWS UNBOUNDED PRECEDING) AS sy_l,
               SUM(cnt) OVER (PARTITION BY feature) AS cnt_t,
               SUM(sy) OVER (PARTITION BY feature) AS sy_t
        FROM hist),
    gains AS (
        SELECT feature, bin, cnt_l, sy_l, cnt_t, sy_t,
               0.5 * (
                 (CAST(cnt_l - 2 * sy_l AS DOUBLE) / 2.0)
               * (CAST(cnt_l - 2 * sy_l AS DOUBLE) / 2.0)
               / (CAST(cnt_l AS DOUBLE) / 4.0 + 1.0)
               + (CAST((cnt_t - cnt_l) - 2 * (sy_t - sy_l) AS DOUBLE) / 2.0)
               * (CAST((cnt_t - cnt_l) - 2 * (sy_t - sy_l) AS DOUBLE) / 2.0)
               / (CAST(cnt_t - cnt_l AS DOUBLE) / 4.0 + 1.0)
               - (CAST(cnt_t - 2 * sy_t AS DOUBLE) / 2.0)
               * (CAST(cnt_t - 2 * sy_t AS DOUBLE) / 2.0)
               / (CAST(cnt_t AS DOUBLE) / 4.0 + 1.0)) AS gain
        FROM cum WHERE cnt_l < cnt_t),
    best AS (
        SELECT feature, bin, cnt_l, sy_l, cnt_t, gain,
               ROW_NUMBER() OVER (PARTITION BY feature
                   ORDER BY gain DESC, bin ASC) AS rn
        FROM gains)
    SELECT feature,
           bin AS split_after_bin,
           CAST(cnt_l AS BIGINT) AS n_left,
           CAST(cnt_t - cnt_l AS BIGINT) AS n_right,
           CAST(sy_l AS BIGINT) AS pos_left,
           ROUND(gain, 6) AS gain
    FROM best WHERE rn = 1
    ORDER BY feature
"""


#: Pinned 2-component 1-D GMM initialization for the EM step: means in
#: dollars at the order-total distribution's rough thirds, one shared
#: sigma, equal weights.  Literals shared verbatim with the oracle.
GMM_MU1, GMM_MU2 = 100000.0, 350000.0
GMM_SIGMA = 80000.0
GMM_W1, GMM_W2 = 0.5, 0.5
#: responsibility quantization grid (micro-units) — E-step outputs are
#: rounded onto it so every M-step sum is an exact integer
GMM_R_SCALE = 1_000_000


def ml_em_gmm_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE exact EM iteration of a two-component 1-D Gaussian mixture
    over order totals, from pinned initial parameters — the
    soft-assignment sibling of ``ml_kmeans_lloyd_step`` (hard argmin ->
    posterior responsibilities) and the last member of the
    one-distributed-pass trainer-step family (IRLS, Lloyd, GBDT split,
    power iteration): a full EM fit is this operator iterated, one
    corpus pass per step — the 100 TB shape.

    E-step: r_i = w1 phi(x_i; mu1, s) / (w1 phi1 + w2 phi2), computed
    as one fixed float expression and ROUNDED to the micro-unit grid
    (the Lloyd quantization discipline) so the M-step's weighted sums
    (sum r, sum r x, sum r x^2 — x in exact cents) are exact
    DECIMAL(38,0) integers on both engines regardless of partitioning.
    M-step closed forms assemble from those exact moments: w_k' =
    sum r / n, mu_k' = sum r x / sum r, sigma_k'^2 = sum r x^2 / sum r
    - mu_k'^2.

    Scale: one scan computes responsibilities map-side; one 2 x 3-cell
    aggregation; no shuffle wider than the component count."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    xd = cents.cast("double") / F.lit(100.0)
    s2 = F.lit(2.0) * F.lit(GMM_SIGMA) * F.lit(GMM_SIGMA)
    p1 = F.lit(GMM_W1) * F.exp(
        -((xd - F.lit(GMM_MU1)) * (xd - F.lit(GMM_MU1))) / s2
    )
    p2 = F.lit(GMM_W2) * F.exp(
        -((xd - F.lit(GMM_MU2)) * (xd - F.lit(GMM_MU2))) / s2
    )
    r1 = F.round(p1 / (p1 + p2), 6)
    base = o.select(
        cents.alias("x"),
        F.round(r1 * F.lit(GMM_R_SCALE), 0).cast("long").alias("r1u"),
    ).select(
        "x",
        "r1u",
        (F.lit(GMM_R_SCALE) - F.col("r1u")).alias("r2u"),
    )
    dec = "decimal(38,0)"
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("r1u").cast(dec)).alias("sr1"),
        F.sum((F.col("r1u") * F.col("x")).cast(dec)).alias("srx1"),
        F.sum(
            F.col("r1u").cast(dec) * (F.col("x") * F.col("x")).cast(dec)
        ).alias("srxx1"),
        F.sum(F.col("r2u").cast(dec)).alias("sr2"),
        F.sum((F.col("r2u") * F.col("x")).cast(dec)).alias("srx2"),
        F.sum(
            F.col("r2u").cast(dec) * (F.col("x") * F.col("x")).cast(dec)
        ).alias("srxx2"),
    )
    rows = []
    for k, srk, srxk, srxxk, mu0 in (
        (1, "sr1", "srx1", "srxx1", GMM_MU1),
        (2, "sr2", "srx2", "srxx2", GMM_MU2),
    ):
        sr = F.col(srk).cast("double")
        srx = F.col(srxk).cast("double")
        srxx = F.col(srxxk).cast("double")
        n_eff = sr / F.lit(float(GMM_R_SCALE))
        mu = srx / sr / F.lit(100.0)
        var = srxx / sr / F.lit(10000.0) - mu * mu
        rows.append(
            agg.select(
                F.lit(k).cast("long").alias("component"),
                F.col("n").cast("long").alias("n_rows"),
                F.round(n_eff, 6).alias("n_effective"),
                F.round(n_eff / F.col("n"), 6).alias("weight_new"),
                F.round(mu, 6).alias("mu_new"),
                F.round(F.sqrt(var), 6).alias("sigma_new"),
                F.round(mu - F.lit(mu0), 6).alias("mu_shift"),
            )
        )
    return rows[0].unionAll(rows[1]).orderBy("component")


QUERIES["ml_em_gmm_step"] = ml_em_gmm_step
ORACLE_SQL["ml_em_gmm_step"] = f"""
    WITH base0 AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS x
        FROM orders),
    resp AS (
        SELECT x,
               CAST(ROUND({GMM_R_SCALE} * ROUND(
                   ({GMM_W1} * EXP(-((x / 100.0 - {GMM_MU1})
                                     * (x / 100.0 - {GMM_MU1}))
                                   / (2.0 * {GMM_SIGMA} * {GMM_SIGMA})))
                   / (({GMM_W1} * EXP(-((x / 100.0 - {GMM_MU1})
                                        * (x / 100.0 - {GMM_MU1}))
                                      / (2.0 * {GMM_SIGMA} * {GMM_SIGMA})))
                      + ({GMM_W2} * EXP(-((x / 100.0 - {GMM_MU2})
                                          * (x / 100.0 - {GMM_MU2}))
                                        / (2.0 * {GMM_SIGMA}
                                           * {GMM_SIGMA})))), 6), 0)
                    AS BIGINT) AS r1u
        FROM base0),
    base AS (
        SELECT x, r1u, {GMM_R_SCALE} - r1u AS r2u FROM resp),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(r1u AS DECIMAL(38,0))) AS sr1,
               SUM(CAST(r1u * x AS DECIMAL(38,0))) AS srx1,
               SUM(CAST(r1u AS DECIMAL(38,0))
                   * CAST(x * x AS DECIMAL(38,0))) AS srxx1,
               SUM(CAST(r2u AS DECIMAL(38,0))) AS sr2,
               SUM(CAST(r2u * x AS DECIMAL(38,0))) AS srx2,
               SUM(CAST(r2u AS DECIMAL(38,0))
                   * CAST(x * x AS DECIMAL(38,0))) AS srxx2
        FROM base),
    u AS (
        SELECT 1 AS component, n,
               CAST(sr1 AS DOUBLE) AS sr, CAST(srx1 AS DOUBLE) AS srx,
               CAST(srxx1 AS DOUBLE) AS srxx, {GMM_MU1} AS mu0
        FROM agg
        UNION ALL
        SELECT 2, n, CAST(sr2 AS DOUBLE), CAST(srx2 AS DOUBLE),
               CAST(srxx2 AS DOUBLE), {GMM_MU2}
        FROM agg)
    SELECT CAST(component AS BIGINT) AS component,
           n AS n_rows,
           ROUND(sr / {GMM_R_SCALE}.0, 6) AS n_effective,
           ROUND(sr / {GMM_R_SCALE}.0 / n, 6) AS weight_new,
           ROUND(srx / sr / 100.0, 6) AS mu_new,
           ROUND(SQRT(srxx / sr / 10000.0
                      - (srx / sr / 100.0) * (srx / sr / 100.0)), 6)
               AS sigma_new,
           ROUND(srx / sr / 100.0 - mu0, 6) AS mu_shift
    FROM u
    ORDER BY component
"""
