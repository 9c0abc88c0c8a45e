"""Registry-order contract: external drivers oracle-check a bounded
prefix of the registry (the first 50 names in iteration order).  The
prefix ROTATES per round (round 3 VERDICT: make each round's checked
set disjoint from the last so the union converges on the full
registry), so the coverage contract is on the UNION of the windows
already driver-verified: every operator category must appear there, and
every current-prefix query must carry a SQL oracle — otherwise whole
categories ship with only the local gate (the round-1 failure mode:
65/115 queries never saw the hard correctness signal).
"""

from __future__ import annotations

from database_peak_streaming_spark import registry

CHECK_WINDOW = 50

#: the round-2 driver window (CORRECTNESS_r02: 50/50 green) — part of
#: the union-coverage contract now that the prefix rotates.
R2_WINDOW = [
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "filter_predicates",
    "agg_approx_distinct",
    "join_asof_purchase_click",
    "win_topk_per_group",
    "win_strain_derivation",
    "sort_limit_topn",
    "agg_salted_hot_key",
    "setop_union_all",
    "sessionize_gap_ids",
    "null_semantics",
    "dedup_drop_duplicates",
    "str_funcs",
    "date_funcs",
    "try_funcs",
    "multimodal_payload_fingerprint",
    "binary_peaks_decode",
    "array_funcs",
    "array_explode_pos",
    "array_transform_filter",
    "json_extract_events",
    "map_funcs",
    "pivot_wide",
    "melt_stack",
    "grouping_sets_explicit",
    "window_tumbling_1h",
    "window_sliding_1h_30m",
    "window_session_30m",
    "window_downsample_1min",
    "resample_gap_fill_locf",
    "resample_gap_fill_locf_per_key",
    "text_token_stats",
    "text_quality_score",
    "text_langid_heuristic",
    "dedup_exact_group",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_clusters_cc",
    "dedup_embedding_cosine",
    "cosine_topk_bruteforce",
    "cosine_pairs_threshold",
    "ann_ivf_bucketed",
    "udf_zscore_by_segment",
    "csv_roundtrip",
    "jsonl_roundtrip",
    "sample_systematic_mod",
    "split_train_test_md5",
    "balance_by_class_topk",
    "curate_corpus_pipeline",
]


def test_priority_is_the_registry_prefix():
    assert list(registry.QUERIES)[: len(registry._PRIORITY)] == registry._PRIORITY
    assert len(registry._PRIORITY) == CHECK_WINDOW


def test_priority_names_unique():
    assert len(set(registry._PRIORITY)) == len(registry._PRIORITY)


def test_every_category_represented_in_checked_union():
    """Union-coverage: every module has a representative in SOME
    driver-verified window (r2's 50/50-green set + the current prefix)."""
    union = set(R2_WINDOW) | set(list(registry.QUERIES)[:CHECK_WINDOW])
    for mod in registry._MODULES:
        names = set(mod.QUERIES)
        assert names & union, (
            f"{mod.__name__} has no representative in any driver-checked "
            f"correctness window"
        )


def test_r2_window_names_still_registered():
    """Rotation must not silently drop previously-verified queries."""
    missing = [n for n in R2_WINDOW if n not in registry.QUERIES]
    assert not missing, f"r2-verified queries vanished: {missing}"


def test_current_window_disjoint_from_r2():
    """The rotation's point: this round's driver window re-checks as few
    already-green names as possible (the union converges on the full
    registry).  Fully disjoint today; loosen only deliberately."""
    overlap = set(R2_WINDOW) & set(list(registry.QUERIES)[:CHECK_WINDOW])
    assert not overlap, f"window wastes slots on r2-green queries: {overlap}"


def test_check_window_is_fully_oracled():
    """Every slot in the bounded check window must carry a SQL oracle —
    a rows-only check would waste the slot."""
    for name in list(registry.QUERIES)[:CHECK_WINDOW]:
        assert name in registry.ORACLE_SQL, f"{name} has no oracle"


def test_registry_complete():
    """Every registered query is reachable and every oracle maps to a
    registered query (guards against dict-merge regressions)."""
    assert len(registry.QUERIES) == len(registry._ALL_QUERIES)
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)
