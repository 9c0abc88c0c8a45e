"""Invariant and plan-shape tests for the round-5 sketch / graph /
robust-stats / layout operators — the properties the top-k or
aggregated query surfaces hide, plus the shuffle/broadcast budgets that
make the plans survive a 100x scale-up.

The hash-vs-DuckDB equivalence for every one of these queries is
covered by tests/test_differential.py; these tests pin the *semantics*
(CMS never under-counts, bitmaps are exact, Bloom never misses,
PageRank conserves mass, the Z-curve actually clusters both axes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from database_peak_streaming_spark.plans import explain as E
from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_cms_never_underestimates(spark):
    rows = QUERIES["sketch_cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 15
    for r in rows:
        assert r.cms_estimate >= r.exact_count, r
    # deterministic ordering contract: exact_count desc, token asc
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bitmap_distinct_is_exact(spark):
    rows = QUERIES["agg_bitmap_exact_distinct"](spark, SF_DIR).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.n_users_bitmap == r.n_users_exact, r


def test_bloom_never_misses_and_bounds_false_positives(spark):
    [r] = QUERIES["join_bloom_prefilter"](spark, SF_DIR).collect()
    # no false negatives: every exact match passes the filter
    assert r.n_bloom_pass >= r.n_exact
    assert r.n_false_pos == r.n_bloom_pass - r.n_exact
    # m=4096, k=3 over a small key set: fp rate should be far below 50%
    assert 0.0 <= r.fp_rate < 0.5
    # the filter must actually prune (pass set is a strict subset)
    assert r.n_bloom_pass < r.n_fact_rows


def test_pagerank_conserves_rank_mass(spark):
    from database_peak_streaming_spark.operators.graph import pagerank_ranks

    ranks = pagerank_ranks(spark, SF_DIR)
    total = ranks.agg(F.sum("rank").alias("s")).collect()[0].s
    # undirected graph, no dangling nodes -> power iteration conserves
    # total rank mass exactly (up to float addition order)
    assert abs(total - 1.0) < 1e-6, total
    assert ranks.where(F.col("rank") <= 0).count() == 0


def test_pagerank_topk_is_deterministic_and_positive(spark):
    rows = QUERIES["graph_pagerank_bipartite"](spark, SF_DIR).collect()
    assert len(rows) == 20
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert ranks[-1] > 0


def test_zorder_buckets_cluster_both_axes(spark):
    rows = QUERIES["zorder_cluster_stats"](spark, SF_DIR).collect()
    assert rows
    # 1024 consecutive Morton codes span at most a 64x64 box (a 32x32
    # tile when range-aligned, up to 2x per axis when straddling)
    for r in rows:
        assert r.bbox_area <= 64 * 64, r
    # and clustering must beat the unpartitioned 256x256 domain by far
    avg_area = sum(r.bbox_area for r in rows) / len(rows)
    assert avg_area < 256 * 256 / 16, avg_area


def test_mad_outliers_sane(spark):
    rows = QUERIES["agg_mad_outliers"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_events
        assert r.scaled_mad >= 0


def test_retention_offset_zero_counts_whole_cohort(spark):
    rows = QUERIES["events_retention_cohorts"](spark, SF_DIR).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_active_users
    for cohort, offsets in by_cohort.items():
        # every user is active in their own first week by definition,
        # and later weeks can never exceed the cohort's size
        assert 0 in offsets, (cohort, offsets)
        assert all(n <= offsets[0] for n in offsets.values()), (cohort, offsets)


# -- plan shape: budgets that keep these viable at 100 TB ----------------


def test_bloom_prefilter_broadcasts_filter_and_keys(spark):
    df = QUERIES["join_bloom_prefilter"](spark, SF_DIR)
    assert E.has_broadcast_join(df), "bloom bits + key set must broadcast"
    # the fact side is scanned once and never shuffled on a data key:
    # every exchange in the plan carries dim-side keys/positions or the
    # single summary row (measured: 5 exchanges, all tiny)
    assert E.shuffle_count(df) <= 6, E.formatted_plan(df)


def test_pagerank_iteration_shuffle_budget(spark):
    df = QUERIES["graph_pagerank_bipartite"](spark, SF_DIR)
    # edges distinct + degree + 3 x (join+agg) + top-k sort; each
    # iteration must stay ~2 exchanges (join on src, aggregate on dst)
    assert E.shuffle_count(df) <= 14, E.formatted_plan(df)


def test_cms_grid_aggregation_stays_narrow(spark):
    df = QUERIES["sketch_cms_heavy_hitters"](spark, SF_DIR)
    # token counts, (d,cell) grid, estimate join, top-k: bounded
    assert E.shuffle_count(df) <= 8, E.formatted_plan(df)


def test_time_range_rolling_single_partition_pass(spark):
    df = QUERIES["win_time_range_rolling"](spark, SF_DIR)
    # one shuffle on user_id feeds BOTH the RANGE frame and the re-agg
    # (same key); plus the output sort
    assert E.shuffle_count(df) <= 3, E.formatted_plan(df)


def test_mg_heavy_hitters_exact_and_partition_invariant(spark):
    """Two properties of the Misra-Gries two-pass design:

    * EXACTNESS: the result equals the plain GROUP BY/HAVING answer
      (every token with count * k > N, exact counts) — the candidate
      pass may vary with partitioning but can only produce a superset,
      and pass 2 recounts exactly.
    * the threshold actually bites: some tokens exist below it (the
      candidate stage isn't vacuously returning the whole vocabulary).
    """
    from database_peak_streaming_spark.operators.sketches import MG_K

    got = {
        (r.token, r.exact_count)
        for r in QUERIES["sketch_mg_heavy_hitters"](spark, SF_DIR).collect()
    }
    tok = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    n = tok.count()
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    want = {
        (r.token, r.c)
        for r in exact.where(F.col("c") * MG_K > n).collect()
    }
    assert got == want and len(want) > 0
    assert exact.where(F.col("c") * MG_K <= n).count() > 0
