"""Invariant tests for the round-7 second-batch operators (bigram LM,
position attribution, k-core peel, KS/JSD drift, Theil-Sen, SQL
shorthand surfaces).

Hash-vs-DuckDB equivalence for every query here is covered by
tests/test_differential.py; these pin the *semantics* the value hash
hides — credit conservation, statistic bounds, core monotonicity —
so a future refactor that stays hash-consistent on the fixture but
breaks an invariant class still fails loudly.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_attribution_position_conserves_credit(spark):
    """Total credit across channels equals the number of converting
    users that have at least one pre-conversion touch — each such
    user's weights (1.0 / 0.5+0.5 / 0.4+0.4+n*0.2/(n-2)) sum to 1."""
    rows = QUERIES["events_attribution_position"](spark, SF_DIR).collect()
    assert rows, "no attributed channels"
    total_credit = sum(r.total_credit for r in rows)
    fl = QUERIES["events_attribution_first_last"](spark, SF_DIR).collect()
    # first/last attribution buckets users with no pre-touch as 'none'
    n_touched = sum(r.n_users for r in fl if r.first_touch != "none")
    assert abs(total_credit - n_touched) < 1e-4, (total_credit, n_touched)
    assert all(r.total_credit > 0 for r in rows)


def test_bigram_surprisal_bounds_and_counts(spark):
    """Laplace smoothing keeps every conditional probability in (0, 1],
    so mean surprisal is >= 0; n_bigrams is n_tokens - 1 per doc."""
    bs = {
        r.doc_id: r
        for r in QUERIES["text_bigram_surprisal"](spark, SF_DIR).collect()
    }
    assert bs, "no documents scored"
    ts = {
        r.doc_id: r.n_tokens
        for r in QUERIES["text_token_stats"](spark, SF_DIR).collect()
    }
    for doc_id, r in bs.items():
        assert r.mean_bigram_surprisal >= 0, r
        assert r.n_bigrams == ts[doc_id] - 1, (r, ts[doc_id])


def test_kcore_peel_is_subgraph_with_reduced_degrees(spark):
    """Survivors are a subset of the initial node set and their in-core
    degree never exceeds their initial degree (edge removal is
    monotone)."""
    core = {
        r.node: r.deg for r in QUERIES["graph_kcore_peel"](spark, SF_DIR).collect()
    }
    assert core, "core collapsed to empty on the fixture"
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", SF_DIR)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg0 = {
        r.node: r.deg
        for r in und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .collect()
    }
    for node, deg in core.items():
        assert node in deg0
        assert deg <= deg0[node], (node, deg, deg0[node])
    # the peel did real work on the fixture: strictly fewer survivors
    assert len(core) < len(deg0)


def test_ks_drift_statistic_bounds(spark):
    """KS D is a sup of absolute ECDF differences: 0 <= D <= 1, and the
    per-type counts sum to the event total."""
    rows = QUERIES["stats_ks_drift_by_type"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.ks_d <= 1.0, r
    from database_peak_streaming_spark.sources.batch import load_table

    n = (
        load_table(spark, "events", SF_DIR)
        .where(F.col("value").isNotNull())
        .count()
    )
    assert sum(r.n_events for r in rows) == n


def test_jsd_drift_bounds(spark):
    """Jensen-Shannon divergence in nats is bounded by ln 2, and a
    source can never diverge negatively."""
    rows = QUERIES["text_jsd_source_drift"](spark, SF_DIR).collect()
    assert rows, "no sources"
    for r in rows:
        assert 0.0 <= r.jsd_nats <= math.log(2.0) + 1e-9, r


def test_theil_sen_pair_counts(spark):
    """n_pairs per type is exactly C(days, 2) of that type's active-day
    count — the fan-out is calendar-bounded by construction."""
    rows = QUERIES["ts_theil_sen_trend"](spark, SF_DIR).collect()
    assert rows, "no event types"
    from database_peak_streaming_spark.sources.batch import load_table

    days = {
        r.event_type: r.n_days
        for r in load_table(spark, "events", SF_DIR)
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("n_days"))
        .collect()
    }
    for r in rows:
        d = days[r.event_type]
        assert r.n_pairs == d * (d - 1) // 2, (r, d)


def test_sql_shorthand_surfaces_match_dataframe_twins(spark):
    """GROUP BY ALL resolves to the explicit grouping, and UNPIVOT
    row-count is exactly 3 metrics x nations."""
    gba = QUERIES["sql_group_by_all"](spark, SF_DIR)
    assert gba.columns == [
        "o_orderstatus",
        "o_orderpriority",
        "n_orders",
        "total_price",
        "avg_price",
    ]
    unp = QUERIES["sql_unpivot_metrics"](spark, SF_DIR).collect()
    nations = {r.n_name for r in unp}
    assert len(unp) == 3 * len(nations)


def test_psi_value_drift_bounds_and_totals(spark):
    """PSI is non-negative (every (p-q)ln(p/q) term shares its sign),
    the era split partitions the non-null values exactly, and every
    event type is scored."""
    rows = QUERIES["stats_psi_value_drift"](spark, SF_DIR).collect()
    assert rows, "no event types scored"
    from database_peak_streaming_spark.sources.batch import load_table

    want = {
        r.event_type: r.n
        for r in load_table(spark, "events", SF_DIR)
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.event_type for r in rows} == set(want)
    for r in rows:
        assert r.psi >= 0.0, r
        assert r.n_ref_events + r.n_cur_events == want[r.event_type], r
        # the midpoint split cannot put everything on one side of a
        # time range that actually spans the fixture
        assert r.n_ref_events > 0 and r.n_cur_events > 0, r


def test_mutual_information_bounds(spark):
    """0 <= MI <= min(H_lang, H_source) (Shannon), entropies are
    non-negative, NMI is in [0, 1], and n_docs is the table count."""
    (r,) = QUERIES["stats_mutual_information"](spark, SF_DIR).collect()
    assert r.h_lang >= 0 and r.h_source >= 0
    eps = 2e-6  # both sides independently rounded to 6 decimals
    assert -eps <= r.mi_nats <= min(r.h_lang, r.h_source) + eps, r
    assert -eps <= r.nmi <= 1 + eps, r
    from database_peak_streaming_spark.sources.batch import load_table

    assert r.n_docs == load_table(spark, "documents", SF_DIR).count()


def test_benford_distributions_sum_to_one(spark):
    """Both the observed and the Benford-expected first-digit
    distributions are probability vectors (the Benford one
    telescopes: sum log10((d+1)/d) = log10(10) = 1), chi-square terms
    are non-negative, and the digit column is exactly 1..9."""
    rows = QUERIES["dq_benford_first_digit"](spark, SF_DIR).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.p_obs for r in rows) - 1.0) < 5e-6
    assert abs(sum(r.p_benford for r in rows) - 1.0) < 5e-6
    assert all(r.chi2_term >= 0 for r in rows)
    from database_peak_streaming_spark.sources.batch import load_table

    n = (
        load_table(spark, "orders", SF_DIR)
        .where(F.col("o_totalprice") >= 1)
        .count()
    )
    assert sum(r.n_obs for r in rows) == n


def test_acf_hourly_bounds_and_grid(spark):
    """|r_k| <= 1 (Cauchy-Schwarz on the biased estimator), every
    (type, lag) cell is present, and the dense grid gives every type
    the same calendar-bounded hour count."""
    rows = QUERIES["ts_acf_hourly"](spark, SF_DIR).collect()
    assert rows, "no series scored"
    types = {r.event_type for r in rows}
    lags = {r.lag_hours for r in rows}
    assert lags == {1, 2, 3, 6, 12, 24}
    assert len(rows) == len(types) * len(lags)
    assert len({r.n_hours for r in rows}) == 1, "grid is not shared"
    for r in rows:
        assert r.acf is not None and abs(r.acf) <= 1 + 1e-6, r


def test_lateral_topk_matches_window_recompute(spark):
    """The LATERAL-with-LIMIT surface selects exactly the window-ranked
    top-3 customers per nation, fully tie-broken."""
    got = [
        (r.n_name, r.c_custkey)
        for r in QUERIES["sql_lateral_topk_per_nation"](spark, SF_DIR).collect()
    ]
    from pyspark.sql import Window

    from database_peak_streaming_spark.sources.batch import load_table

    c = load_table(spark, "customer", SF_DIR)
    n = load_table(spark, "nation", SF_DIR)
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    want = [
        (r.n_name, r.c_custkey)
        for r in c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .orderBy("n_name", F.col("c_acctbal").desc(), "c_custkey")
        .collect()
    ]
    assert got == want
    per_nation = {}
    for name, _ in got:
        per_nation[name] = per_nation.get(name, 0) + 1
    assert all(v <= 3 for v in per_nation.values())


def test_bigram_pmi_ranking_invariants(spark):
    """Ranks are contiguous from 1, PMI is non-increasing down the
    list, every kept bigram clears the min-count bar, and unigram
    counts dominate the co-occurrence count."""
    rows = QUERIES["text_bigram_pmi"](spark, SF_DIR).collect()
    assert rows, "no collocations found"
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(rows[i].pmi >= rows[i + 1].pmi for i in range(len(rows) - 1))
    from database_peak_streaming_spark.operators.text import (
        PMI_MIN_COUNT,
        PMI_TOP_K,
    )

    assert len(rows) <= PMI_TOP_K
    for r in rows:
        assert r.c_xy >= PMI_MIN_COUNT, r
        assert r.c1 >= r.c_xy and r.c2 >= r.c_xy, r


def test_kaplan_meier_monotone_and_conserving(spark):
    """S(t) starts <= 1 and never increases, n_risk starts at the full
    cohort and never increases, and every customer leaves the risk set
    exactly once (deaths + censored across the curve = cohort)."""
    rows = QUERIES["orders_kaplan_meier_churn"](spark, SF_DIR).collect()
    assert len(rows) > 10, "curve degenerated"
    from database_peak_streaming_spark.sources.batch import load_table

    n_custs = (
        load_table(spark, "orders", SF_DIR)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert rows[0].n_risk == n_custs
    assert all(
        rows[i].n_risk >= rows[i + 1].n_risk for i in range(len(rows) - 1)
    )
    assert all(
        rows[i].survival >= rows[i + 1].survival - 1e-9
        for i in range(len(rows) - 1)
    )
    assert all(0.0 < r.survival <= 1.0 + 1e-9 for r in rows)
    # conservation: the terminal n_risk>d guard can drop at most the
    # final row, whose departures are its own n_risk
    departed = sum(r.d_events + r.c_censored for r in rows)
    assert departed == n_custs or (
        departed < n_custs and rows[-1].n_risk > rows[-1].d_events
    )


def test_sql_udf_inlines_and_keeps_empty_domain_rows(spark):
    """The SQL-defined scalar/table UDFs resolve inside the plan (no
    Python stage) and the table-UDF domain keeps zero-order statuses
    visible with NULL charge."""
    df = QUERIES["sql_udf_scalar_and_table"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    rows = {r.o_orderstatus: r for r in df.collect()}
    assert set(rows) == {"F", "O", "P", "X"}
    assert rows["X"].n_orders == 0 and rows["X"].total_charge is None
    assert rows["O"].n_orders > 0 and rows["O"].total_charge > 0


def test_rolling_median_is_robust_order_statistic(spark):
    """Every rolling median lies within the user's own value range,
    row count equals the number of full 50-event frames, and the
    median filter is insensitive to a single spike (the defining
    robustness property a moving mean lacks)."""
    rows = QUERIES["win_rolling_median"](spark, SF_DIR).collect()
    assert rows, "no full frames at this SF"
    from database_peak_streaming_spark.sources.batch import load_table

    ev = (
        load_table(spark, "events", SF_DIR)
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )
    stats = {r.user_id: r for r in ev.collect()}
    per_user = {}
    for r in rows:
        s = stats[r.user_id]
        assert s.lo - 1e-9 <= r.rolling_med <= s.hi + 1e-9, r
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    want = {u: s.n - 49 for u, s in stats.items() if s.n >= 50}
    assert per_user == want
    # robustness: replacing one in-frame value with a huge spike moves
    # the median by at most one order-statistic step, never to the spike
    import statistics

    base = sorted(range(50))
    spiked = sorted(base[:-1] + [10_000_000])
    m0 = statistics.median(base)
    m1 = statistics.median(spiked)
    assert abs(m1 - m0) <= 1.0 and m1 < 100


def test_cohort_ltv_monotone_and_conserving(spark):
    """Cumulative LTV never decreases within a cohort, cohort sizes sum
    to the distinct customer count, per-cohort order counts sum to the
    table count, and ltv_per_customer is cum/size."""
    rows = QUERIES["orders_cohort_ltv"](spark, SF_DIR).collect()
    assert rows, "no cohorts"
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort].append(r)
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", SF_DIR)
    assert sum(c[0].n_customers for c in by_cohort.values()) == (
        o.select("o_custkey").distinct().count()
    )
    assert sum(r.n_orders for r in rows) == o.count()
    for curve in by_cohort.values():
        curve.sort(key=lambda r: r.quarter_index)
        assert curve[0].quarter_index == 0  # acquisition quarter present
        for a, b in zip(curve, curve[1:]):
            assert b.cum_revenue >= a.cum_revenue - 1e-6
        for r in curve:
            assert (
                abs(r.ltv_per_customer - r.cum_revenue / r.n_customers)
                < 1e-4
            )


def test_wasserstein_drift_bounds_and_split(spark):
    """W1 is non-negative and bounded by the value range, the era split
    partitions each type's rows exactly, and all five types are
    scored."""
    rows = QUERIES["stats_wasserstein_drift"](spark, SF_DIR).collect()
    assert len(rows) == 5
    from database_peak_streaming_spark.sources.batch import load_table

    ev = load_table(spark, "events", SF_DIR).where(
        F.col("value").isNotNull()
    )
    lohi = ev.agg(F.min("value"), F.max("value")).collect()[0]
    value_range = lohi[1] - lohi[0]
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert 0.0 <= r.w1_distance <= value_range + 1e-6, r
        assert r.n_ref_events + r.n_cur_events == want[r.event_type], r
        assert r.n_ref_events > 0 and r.n_cur_events > 0, r


def test_asof_nearest_dominates_both_directions(spark):
    """The nearest click's gap never exceeds the backward OR forward
    as-of gap for the same purchase, ties resolve backward, and the
    row set is exactly the purchase set."""
    near = {
        r.event_id: r
        for r in QUERIES["join_asof_nearest"](spark, SF_DIR).collect()
    }
    back = {
        r.event_id: r.last_click_ts
        for r in QUERIES["join_asof_purchase_click"](spark, SF_DIR).collect()
    }
    assert set(near) == set(back)
    assert near, "no purchases"
    n_with = 0
    for eid, r in near.items():
        b = back[eid]
        if r.nearest_click_ts is None:
            assert b is None
            assert r.direction == "none"
            continue
        n_with += 1
        assert r.gap_us >= 0
        if b is not None:
            back_gap = (r.ts - b).total_seconds() * 1e6
            assert r.gap_us <= back_gap + 0.5, (eid, r.gap_us, back_gap)
            if abs(r.gap_us - back_gap) < 0.5:
                # equal gap must resolve to the backward candidate
                assert r.direction in ("backward",) or r.gap_us == 0
    assert n_with > 0


def test_pca_power_iteration_matches_numpy(spark):
    """The declarative power iteration reproduces the same three numpy
    power steps to rounding precision, the loading vector is unit-norm,
    and the eigenvalue estimate is positive and consistent with
    ||X^T X v_2||."""
    import numpy as np

    rows = QUERIES["embeddings_pca_power_iteration"](spark, SF_DIR).collect()
    assert [r.dim for r in rows] == list(range(64))
    loadings = np.array([r.loading for r in rows])
    assert abs(float(loadings @ loadings) - 1.0) < 1e-4
    lam = rows[0].eigenvalue_est
    assert lam > 0 and all(r.eigenvalue_est == lam for r in rows)

    from database_peak_streaming_spark.sources.batch import load_table

    X = np.array(
        [
            r.embedding
            for r in load_table(spark, "embeddings", SF_DIR)
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    v = np.full(64, 0.125)
    for _ in range(3):
        w = X.T @ (X @ v)
        n = float(np.sqrt(w @ w))
        v = w / n
    assert abs(n - lam) < 1e-3 * max(1.0, lam)
    assert np.max(np.abs(v - loadings)) < 1e-5


def test_link_prediction_excludes_edges_and_bounds_jaccard(spark):
    """Predicted pairs are NON-edges with >= MIN_CN shared neighbors,
    Jaccard is in (0, 1], common neighbors never exceed either degree,
    and ranks are contiguous with non-increasing scores."""
    rows = QUERIES["graph_link_prediction_jaccard"](spark, SF_DIR).collect()
    assert rows, "no predictions on the fixture"
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    assert all(
        rows[i].jaccard >= rows[i + 1].jaccard for i in range(len(rows) - 1)
    )
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", SF_DIR)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = {
        (r.u, r.v)
        for r in a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .collect()
    }
    for r in rows:
        assert (r.u, r.v) not in edges, r
        assert r.cn >= 2
        assert r.cn <= min(r.deg_u, r.deg_v), r
        assert 0.0 < r.jaccard <= 1.0


def test_robust_outliers_are_true_deviants(spark):
    """Every flagged row genuinely deviates: |value - med| exceeds
    3 x 1.4826 x mad with mad > 0, and the flagged set is a strict
    subset of the full-frame rows (the median filter's output keys)."""
    rows = QUERIES["win_robust_outliers"](spark, SF_DIR).collect()
    assert rows, "no outliers flagged at this SF"
    frames = {
        (r.user_id, r.event_id)
        for r in QUERIES["win_rolling_median"](spark, SF_DIR).collect()
    }
    for r in rows:
        assert (r.user_id, r.event_id) in frames, r
        assert r.mad > 0
        assert r.robust_z > 3.0
        assert abs(r.value - r.med) > 3.0 * 1.4826 * r.mad * 0.999, r
    assert len(rows) < len(frames)


def test_skyline_is_exact_pareto_frontier(spark):
    """Brute-force dominance check: no returned point is dominated by
    ANY customer, and every non-returned customer is dominated by at
    least one returned point (the frontier is complete and minimal)."""
    sky = QUERIES["skyline_customers"](spark, SF_DIR).collect()
    assert sky, "empty frontier"
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", SF_DIR)
    pc = (
        o.groupBy("o_custkey")
        .agg(
            F.round(
                F.round(
                    F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
                    .cast("double"),
                    6,
                )
                / F.count(F.lit(1)),
                6,
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    )
    pts = {r.o_custkey: (r.avg_value, r.n_orders) for r in pc}

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and (a[0] > b[0] or a[1] > b[1])

    sky_keys = {r.o_custkey for r in sky}
    for r in sky:
        me = pts[r.o_custkey]
        assert not any(dominates(p, me) for k, p in pts.items()), r
    for k, p in pts.items():
        if k not in sky_keys:
            assert any(
                dominates(pts[s], p) for s in sky_keys
            ), (k, p)


def test_fano_factor_moments_are_exact(spark):
    """Fano recomputed from an independent dense-grid numpy pass must
    match to rounding precision; active minutes never exceed the
    calendar span, and mean * n_minutes = event count exactly."""
    import numpy as np

    rows = {
        r.event_type: r
        for r in QUERIES["events_burstiness_fano"](spark, SF_DIR).collect()
    }
    assert len(rows) == 5
    from database_peak_streaming_spark.sources.batch import load_table

    ev = (
        load_table(spark, "events", SF_DIR)
        .select("event_type", F.expr("unix_timestamp(ts) div 60").alias("m"))
        .collect()
    )
    m0 = min(r.m for r in ev)
    m1 = max(r.m for r in ev)
    n = m1 - m0 + 1
    for t, r in rows.items():
        xs = np.zeros(n)
        for e in ev:
            if e.event_type == t:
                xs[e.m - m0] += 1
        mean = xs.mean()
        fano = xs.var() / mean
        assert abs(r.fano - fano) < 1e-4, (t, r.fano, fano)
        assert r.n_minutes == n
        assert r.n_active_minutes <= n
        assert abs(r.mean_per_minute * n - xs.sum()) < 0.5


def test_sql_pivot_matches_unpivoted_totals(spark):
    """The PIVOT surface conserves counts: per-priority pivot cells sum
    to the orders row count, and every (priority x status) cell is
    populated on the fixture."""
    rows = QUERIES["sql_pivot_clause"](spark, SF_DIR).collect()
    assert len(rows) == 5
    from database_peak_streaming_spark.sources.batch import load_table

    total = load_table(spark, "orders", SF_DIR).count()
    s = sum(r.f_n + r.o_n + r.p_n for r in rows)
    assert s == total
    for r in rows:
        assert min(r.f_n, r.o_n, r.p_n) > 0
        assert r.f_avg_price > 0 and r.o_avg_price > 0 and r.p_avg_price > 0


def test_weighted_median_matches_numpy_and_halves_weight(spark):
    """The weighted median recomputed independently in numpy must match,
    and at least half the total weight lies at-or-below it while at
    least half lies at-or-above (the defining property)."""
    import numpy as np

    rows = QUERIES["agg_weighted_median"](spark, SF_DIR).collect()
    assert len(rows) == 3
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", SF_DIR)
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    for r in rows:
        sub = sorted(
            (x.l_extendedprice, int(x.l_quantity))
            for x in li
            if x.l_returnflag == r.l_returnflag
        )
        prices = np.array([p for p, _ in sub])
        weights = np.array([w for _, w in sub])
        W = weights.sum()
        assert r.total_weight == W
        cum = np.cumsum(weights)
        want = prices[np.argmax(2 * cum >= W)]
        assert r.weighted_median_price == want, (r, want)
        at_or_below = weights[prices <= r.weighted_median_price].sum()
        at_or_above = weights[prices >= r.weighted_median_price].sum()
        assert 2 * at_or_below >= W and 2 * at_or_above >= W
