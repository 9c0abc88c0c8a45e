"""Invariant tests for the round-5 analytics-rollup operators — the
mathematical properties (bounds, monotonicity, conservation) that the
value-hash differential can't articulate on its own.  Hash equivalence
vs DuckDB for every query here is covered by tests/test_differential.py.
"""

from __future__ import annotations

import math

from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_dau_wau_mau_monotone(spark):
    rows = QUERIES["events_dau_wau_mau"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.dau <= r.wau <= r.mau, r
        assert 0 < r.dau_wau_ratio <= 1, r


def test_market_basket_probability_bounds(spark):
    rows = QUERIES["orders_market_basket_lift"](spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r.support <= r.confidence_a_b <= 1, r
        assert r.lift > 0, r
        assert r.part_a < r.part_b, r


def test_ab_ztest_internal_consistency(spark):
    [r] = QUERIES["ab_test_lift_ztest"](spark, SF_DIR).collect()
    assert 0 < r.conv_a <= r.n_a and 0 < r.conv_b <= r.n_b
    assert abs(r.rate_a - r.conv_a / r.n_a) < 1e-6
    assert abs(r.rate_b - r.conv_b / r.n_b) < 1e-6
    # the significance flag must agree with the reported z
    assert r.significant_95 == (abs(r.z_score) > 1.96)


def test_user_entropy_bounds(spark):
    rows = QUERIES["events_user_entropy"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 0 <= H <= ln(k) for a k-outcome distribution (1e-6 slack for
        # the query's output rounding)
        assert -1e-6 <= r.entropy_nats <= math.log(r.n_types) + 1e-6, r


def test_yoy_growth_null_exactly_first_year(spark):
    rows = QUERIES["orders_yoy_growth"](spark, SF_DIR).collect()
    years = sorted({r.yr for r in rows})
    first = years[0]
    for r in rows:
        if r.yr == first:
            assert r.yoy_growth is None, r
        else:
            assert r.yoy_growth is not None, r
        assert r.revenue > 0 and r.n_orders > 0


def test_chi2_nonnegative_and_grid_complete(spark):
    rows = QUERIES["source_lang_drift_chi2"](spark, SF_DIR).collect()
    assert rows
    dfs = {r.df for r in rows}
    assert len(dfs) == 1, "every source sees the same language grid"
    for r in rows:
        assert r.chi2 >= 0, r


def test_maxsim_bounded_by_token_count(spark):
    rows = QUERIES["sim_maxsim_late_interaction"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # each per-token max cosine is <= 1, so the sum is <= n tokens
        assert r.maxsim_score <= r.n_query_tokens + 1e-6, r


def test_rfm_quartiles_partition_customers(spark):
    rows = QUERIES["orders_rfm_segmentation"](spark, SF_DIR).collect()
    total = sum(r.n_customers for r in rows)
    from database_peak_streaming_spark.sources.batch import load_table

    n_cust = (
        load_table(spark, "orders", SF_DIR)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert total == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4


def test_minute_load_percentile_ordering(spark):
    rows = QUERIES["events_minute_load_percentiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.p50_per_min <= r.p95_per_min <= r.max_per_min, r
