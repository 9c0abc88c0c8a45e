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
