"""Property/invariant tests for the round-6 operators, beyond the
differential gate: each pins the MATHEMATICAL contract (textbook
recursion identity, brute-force completeness, range bounds,
conservation) that a hash-match alone cannot localize when it breaks.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_ema_fold_matches_textbook_recursion(spark):
    """The declarative fold must equal the explicit Python recursion
    ema_t = a*v_t + (1-a)*ema_{t-1} over the same ts-ordered values —
    bit-identical before rounding, same fold order."""
    from database_peak_streaming_spark.operators.time_windows import (
        EMA_FOLD_ALPHA,
        ema_batch_fold,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = {
        r.event_type: (r.n_events, r.final_ema)
        for r in ema_batch_fold(spark, SF_DIR).collect()
    }
    pdf = (
        load_table(spark, "events", SF_DIR)
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    for etype, grp in pdf.groupby("event_type"):
        ema = None
        for v in grp["value"]:
            v = float(v)
            ema = (
                v
                if ema is None
                else EMA_FOLD_ALPHA * v + (1.0 - EMA_FOLD_ALPHA) * ema
            )
        n, final = got[etype]
        assert n == len(grp)
        assert abs(final - round(ema, 6)) < 1e-9, etype


def test_triangle_count_matches_bruteforce_on_tiny_graph(spark):
    """Degree-ordered orientation must count exactly the triangles a
    brute-force itertools enumeration finds on the sf0.001 edge set."""
    from database_peak_streaming_spark.operators.graph import (
        graph_triangle_count,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", SF_DIR)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(grp["l_partkey"]), 2):
            edges.add((u, v))
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    brute = 0
    for u, v in edges:
        # count closing nodes w > v with u<v<w ordering to count once
        brute += sum(
            1 for w in adj[u] & adj[v] if w > v
        )
    row = graph_triangle_count(spark, SF_DIR).collect()[0]
    assert row.n_triangles == brute
    assert row.n_edges == len(edges)
    assert row.n_nodes == len(adj)


def test_interval_binning_is_lossless_vs_naive(spark):
    """Grid binning must find EXACTLY the pairs the naive all-pairs
    check finds (superset-exact candidates: cell size >= interval
    length guarantees no overlap escapes its cells)."""
    from database_peak_streaming_spark.operators.joins import (
        join_interval_binned,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = {
        (r.custkey, r.okey_a, r.okey_b): r.overlap_days
        for r in join_interval_binned(spark, SF_DIR).collect()
    }
    o = (
        load_table(spark, "orders", SF_DIR)
        .select("o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .toPandas()
    )
    want = {}
    for ck, grp in o.groupby("o_custkey"):
        rows = list(grp.itertuples())
        for a, b in itertools.combinations(rows, 2):
            a, b = (a, b) if a.o_orderkey < b.o_orderkey else (b, a)
            delta = abs((a.d - b.d).days)
            if delta < 14:
                want[(ck, a.o_orderkey, b.o_orderkey)] = 14 - delta
    assert got == want


def test_gini_bounds_and_uniform_zero(spark):
    """Gini must land in [0, 1) for every nation; a hand-built uniform
    distribution must score exactly 0."""
    from database_peak_streaming_spark.operators.behavior import (
        orders_revenue_gini,
    )

    for r in orders_revenue_gini(spark, SF_DIR).collect():
        assert 0.0 <= r.gini < 1.0, r
    # uniform revenue -> G = 2*(sum i*x)/(n*sum x) - (n+1)/n = 0
    n, x = 7, 100.0
    g = 2.0 * sum((i + 1) * x for i in range(n)) / (n * (n * x)) - (n + 1.0) / n
    assert abs(g) < 1e-12


def test_cdf_diff_conservation(spark):
    """The CDC diff's class counts must equal their derivations: one
    delete per %97==3 key, one insert per %250==0 key, updates =
    %50==0 keys still present in v1."""
    from database_peak_streaming_spark.operators.storage import table_diff_cdf
    from database_peak_streaming_spark.sources.batch import load_table

    diff = table_diff_cdf(spark, SF_DIR).collect()
    by_type: dict[str, int] = {}
    for r in diff:
        by_type[r.change_type] = by_type.get(r.change_type, 0) + 1
    keys = [
        r.c_custkey
        for r in load_table(spark, "customer", SF_DIR)
        .select("c_custkey")
        .collect()
    ]
    n_del = sum(1 for k in keys if k % 97 == 3)
    n_ins = sum(1 for k in keys if k % 250 == 0)
    n_upd = sum(1 for k in keys if k % 50 == 0 and k % 97 != 3)
    assert by_type.get("delete", 0) == n_del
    assert by_type.get("insert", 0) == n_ins
    assert by_type.get("update", 0) == n_upd
    # updates carry both sides; inserts/deletes exactly one
    for r in diff:
        if r.change_type == "update":
            assert r.old_acctbal is not None and r.new_acctbal is not None
            assert abs(r.new_acctbal - r.old_acctbal - 1000.0) < 1e-6
        elif r.change_type == "insert":
            assert r.old_acctbal is None and r.new_acctbal == 0.0
        else:
            assert r.new_acctbal is None and r.old_acctbal is not None


def test_feature_hashing_conserves_tokens(spark):
    """Bucket totals must conserve the corpus token count (every token
    lands in exactly one bucket) and buckets stay in [0, 64)."""
    from database_peak_streaming_spark.operators.text import (
        HASH_FEATURES,
        text_feature_hashing,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    rows = text_feature_hashing(spark, SF_DIR).collect()
    assert all(0 <= r.bucket < HASH_FEATURES for r in rows)
    d = load_table(spark, "documents", SF_DIR)
    n_tokens = d.select(
        F.explode(F.split("text", " ")).alias("t")
    ).where(F.col("t") != "").count()
    assert sum(r.n_occurrences for r in rows) == n_tokens


def test_incremental_rollup_equals_full_rollup(spark):
    """merge(rollup(on_time), rollup(late)) == rollup(all): the n_late
    audit must also sum to the late cohort's size."""
    from database_peak_streaming_spark.operators.storage import (
        incremental_rollup_merge,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    ev = load_table(spark, "events", SF_DIR)
    merged = incremental_rollup_merge(spark, SF_DIR).collect()
    assert sum(r.n_events for r in merged) == ev.count()
    assert (
        sum(r.n_late for r in merged)
        == ev.where(F.col("event_id") % 10 == 0).count()
    )


def test_rolling_corr_in_unit_interval(spark):
    """Pearson correlation is bounded: every full-frame rolling corr
    extremum must sit in [-1, 1]."""
    from database_peak_streaming_spark.operators.time_windows import (
        win_rolling_corr,
    )

    for r in win_rolling_corr(spark, SF_DIR).collect():
        assert -1.0 <= r.min_corr <= r.max_corr <= 1.0, r
        assert 0 <= r.n_trending <= r.n_frames


def test_regression_slope_consistent_with_corr(spark):
    """regr_slope and corr must share a sign, and R^2 must equal the
    squared correlation (per-group, against Spark's own corr)."""
    from database_peak_streaming_spark.operators.aggregates import (
        agg_regression_by_group,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = {
        r.event_type: r for r in agg_regression_by_group(spark, SF_DIR).collect()
    }
    ev = load_table(spark, "events", SF_DIR)
    x = (F.unix_timestamp("ts") - F.lit(1_704_067_200)) / F.lit(86_400.0)
    corr = {
        r.event_type: r.c
        for r in ev.select("event_type", F.col("value").alias("y"), x.alias("x"))
        .groupBy("event_type")
        .agg(F.corr("y", "x").alias("c"))
        .collect()
    }
    for etype, r in got.items():
        c = corr[etype]
        assert abs(r.r2 - round(c * c, 6)) < 2e-6, etype
        if abs(c) > 1e-3:
            assert (r.slope_per_day > 0) == (c > 0), etype


def test_banded_join_equals_theta_join(spark):
    """Banding is pure plan strategy: join_range_banded must return
    exactly join_range_theta's rows."""
    from database_peak_streaming_spark.operators.joins import (
        join_range_banded,
        join_range_theta,
    )

    banded = {
        (r.s_suppkey, r.n_cust_in_band)
        for r in join_range_banded(spark, SF_DIR).collect()
    }
    theta = {
        (r.s_suppkey, r.n_cust_in_band)
        for r in join_range_theta(spark, SF_DIR).collect()
    }
    assert banded == theta and len(theta) > 0


def test_dq_suite_all_pass_on_fixture(spark):
    """The fixture satisfies every expectation (violation counts 0) —
    a failing row here means the fixture or an expectation drifted."""
    from database_peak_streaming_spark.operators.checks import (
        dq_expectation_suite,
    )

    rows = dq_expectation_suite(spark, SF_DIR).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.passed and r.observed == 0, r


def test_sql_script_median_equals_builtin(spark):
    """The bisected lower-median element must equal Spark's own
    percentile(value, 0.5) lower element computed via sort."""
    from database_peak_streaming_spark.operators.storage import (
        sql_script_median_bisect,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = sql_script_median_bisect(spark, SF_DIR).collect()[0]
    ev = load_table(spark, "events", SF_DIR)
    n = ev.count()
    target = (n + 1) // 2
    want = (
        ev.orderBy("value").limit(target).orderBy(F.desc("value")).limit(1)
    ).collect()[0].value
    assert got.n_rows == n
    assert abs(got.median_disc - want) < 1e-12


def test_interval_grid_mixed_is_lossless_vs_naive(spark):
    """The quantile-cell grid on HEAVY-TAILED lengths must find exactly
    the pairs the naive all-pairs check finds — the superset-exactness
    argument (two overlapping intervals both touch the cell of
    max(start), for ANY cell width) and the cell-ownership exactly-once
    rule, verified against brute force on the mixed-width workload."""
    from database_peak_streaming_spark.operators.joins import (
        join_interval_grid_mixed,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = {
        (r.custkey, r.okey_a, r.okey_b): r.overlap_days
        for r in join_interval_grid_mixed(spark, SF_DIR).collect()
    }
    o = (
        load_table(spark, "orders", SF_DIR)
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
        )
        .toPandas()
    )

    def length(okey: int) -> int:
        return 3 + (okey % 11) + (180 if okey % 50 == 0 else 0)

    want = {}
    for ck, grp in o.groupby("o_custkey"):
        rows = list(grp.itertuples())
        for a, b in itertools.combinations(rows, 2):
            a, b = (a, b) if a.o_orderkey < b.o_orderkey else (b, a)
            sa, ea = a.d.toordinal(), a.d.toordinal() + length(a.o_orderkey)
            sb, eb = b.d.toordinal(), b.d.toordinal() + length(b.o_orderkey)
            if sa < eb and sb < ea:
                want[(ck, a.o_orderkey, b.o_orderkey)] = min(ea, eb) - max(
                    sa, sb
                )
    assert got == want


def test_interval_dispatcher_band_and_grid_agree(spark):
    """The dispatcher's two kernels are interchangeable on any
    workload: forcing the band (length_bound given) and forcing the
    grid (direct kernel call) over the same bounded-width intervals
    must produce identical pair sets — the plan choice is performance,
    never semantics."""
    from database_peak_streaming_spark.operators.joins import (
        _interval_pairs_grid,
        interval_overlap_pairs,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", SF_DIR).select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").cast("date").alias("start_d"),
    )
    iv = o.withColumn("end_d", F.date_add("start_d", 14))
    band = {
        (r.custkey, r.okey_a, r.okey_b): r.overlap_days
        for r in interval_overlap_pairs(iv, length_bound=14).collect()
    }
    ivg = iv.withColumn(
        "sd", F.datediff("start_d", F.lit("1970-01-01").cast("date"))
    ).withColumn("ed", F.col("sd") + 14)
    for cell_days in (5, 14, 45):
        grid = {
            (r.custkey, r.okey_a, r.okey_b): r.overlap_days
            for r in _interval_pairs_grid(ivg, cell_days).collect()
        }
        assert grid == band, f"cell_days={cell_days}"


def test_holt_winters_matches_textbook_recursion(spark):
    """The vector-fold Holt-Winters must equal the explicit Python
    recursion (level/trend/rotating seasonal dict) over the same
    day-ordered series — same seeding, same coefficients, bit-identical
    before the 6dp rounding."""
    from database_peak_streaming_spark.operators.time_windows import (
        HW_A,
        HW_CA,
        HW_CD,
        HW_CG,
        HW_D,
        HW_G,
        HW_SEASON,
        ts_holt_winters_additive,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    got = {
        r.event_type: (r.level, r.trend, r.forecast_1d, r.forecast_3d)
        for r in ts_holt_winters_additive(spark, SF_DIR).collect()
    }
    daily = (
        load_table(spark, "events", SF_DIR)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double"), 6
            ).alias("y")
        )
        .orderBy("event_type", "day")
        .collect()
    )
    series: dict[str, list[float]] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append(r.y)
    m = HW_SEASON
    for et, ys in series.items():
        if len(ys) < 2 * m:
            assert et not in got
            continue
        l = sum(ys[:m]) / float(m)
        b = (sum(ys[m : 2 * m]) / float(m) - sum(ys[:m]) / float(m)) / float(m)
        s = [y - l for y in ys[:m]]  # s[0] oldest
        for y in ys[m:]:
            s_old = s.pop(0)
            l_new = HW_A * (y - s_old) + HW_CA * (l + b)
            b = HW_G * (l_new - l) + HW_CG * b
            s.append(HW_D * (y - l_new) + HW_CD * s_old)
            l = l_new
        want = (
            round(l, 6),
            round(b, 6),
            round(l + 1.0 * b + s[0], 6),
            round(l + 3.0 * b + s[2], 6),
        )
        assert got[et] == pytest.approx(want, abs=1e-9), (et, got[et], want)
