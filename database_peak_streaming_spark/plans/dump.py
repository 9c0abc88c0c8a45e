"""Regenerate PLANS.md: physical-plan trees + commentary for the
headline queries, as graded evidence that each plan has the shape the
plan-quality tests (tests/test_plans.py) pin.

Usage: ``python -m database_peak_streaming_spark.plans.dump [sf_dir]``
"""

from __future__ import annotations

import sys
from pathlib import Path

#: query -> one-line reading of why this plan is the right one at scale
PICKS = {
    "q1_pricing_summary": (
        "one partial->final agg exchange + output sort; filter pushed to "
        "parquet, 7/11 columns read"
    ),
    "q5_local_supplier_volume": (
        "6-way star: every dim broadcast, single shuffle pair on the fact spine"
    ),
    "q18_large_volume_customers": (
        "lineitem collapses to (orderkey, qty) before any join; AQE picks "
        "the join strategy (no stale broadcast hint)"
    ),
    "join_asof_purchase_click": (
        "as-of via union + last() over (user, ts) — one shuffle, no "
        "range-join fan-out"
    ),
    "dedup_minhash_lsh": (
        "banded-signature equi-join on (band, band_hash); no cartesian anywhere"
    ),
    "dedup_ngram_jaccard": (
        "lossless prefix-filter candidates: equi-join on (block, prefix token)"
    ),
    "ann_ivf_kmeans": (
        "pinned-centroid bucket probe: broadcast query set, corpus side "
        "shuffle-free to the join"
    ),
    "multimodal_payload_fingerprint": (
        "single MapInPandas stage fed straight from the scan (payloads "
        "never shuffle)"
    ),
    "curate_corpus_pipeline": (
        "the whole funnel is ONE Catalyst plan: quality gate prunes before "
        "dedup joins"
    ),
    "dedup_substring_spans": (
        "stride-1 gram explode -> md5 -> two hash-keyed aggs; only "
        "(16-byte hash, doc_id) rows ever shuffle, documents never do"
    ),
    "sample_weighted_ares": (
        "TakeOrderedAndProject: per-partition k + driver k-merge — zero "
        "exchanges, no global sort"
    ),
    "agg_hll_sketch_merge": (
        "distinct pairs shuffle computed once (AQE ReusedExchange) and "
        "shared by sketch, exact and union consumers; no expand "
        "(graded as an AUDIT since round 11 — the sketch operator's "
        "own shape is agg_hll_sketch_only)"
    ),
    "agg_hll_sketch_only": (
        "raw rows -> one map-side-combinable 3-key groupBy (HLL absorbs "
        "duplicates; no pre-distinct, no Expand, no l_orderkey-keyed "
        "aggregate anywhere) -> broadcast union/sum scalars"
    ),
    "graph_adamic_adar_hubcap": (
        "deg <= 100 semi-join prunes adj BEFORE the wedge self-join — "
        "hub wedges are never enumerated; kept middles keep true-degree "
        "1/ln weights; top-k via row_number window"
    ),
    "chunk_documents_overlap": (
        "scan -> sequence-explode -> slice projection: map-only, the sole "
        "exchange is the deterministic output sort"
    ),
    "join_bucketed_colocated": (
        "SortMergeJoin consumes bucket i vs bucket i directly (Bucketed: "
        "true on both scans, zero join-side exchange)"
    ),
    "cusum_drift_flags": (
        "two window exprs share ONE per-key sort; exact long micro-unit "
        "running sums, then a 5-row summary agg"
    ),
    "graph_pagerank_bipartite": (
        "edges/degrees localCheckpointed once; each iteration is one "
        "join-on-src + agg-on-dst exchange pair over the cut lineage; "
        "N rides as a broadcast scalar"
    ),
    "sketch_cms_heavy_hitters": (
        "vocabulary collapses to a fixed depth x width cell grid; only "
        "(token, count) and (d, cell) rows shuffle, never corpus rows"
    ),
    "join_bloom_prefilter": (
        "fact side scans once with zero data-key exchange — the bit-set "
        "and key set ride broadcast; all exchanges carry dim/summary rows"
    ),
    "win_time_range_rolling": (
        "one shuffle on user_id feeds BOTH the RANGE frame and the "
        "per-user re-aggregation (same key, no second exchange)"
    ),
    "linkage_blocked_levenshtein": (
        "candidate pairs come from a block equi-join (no cartesian); "
        "levenshtein runs only inside blocks"
    ),
    "profile_table_summary": (
        "every column's null/distinct/range stats in ONE scan; the melt "
        "is a projection, not a shuffle"
    ),
    "text_novelty_vs_train": (
        "train side collapses to a distinct gram set probed by LeftSemi "
        "— membership never multiplies by train-doc frequency"
    ),
    "abc_pareto_classification": (
        "fact collapses to per-part revenue before the global cumulative "
        "window; the grand total rides as a broadcast scalar"
    ),
    "forecast_seasonal_naive_mae": (
        "both scans push the split-timestamp filter to parquet; the "
        "120-cell profile broadcasts onto the holdout"
    ),
    "sim_maxsim_late_interaction": (
        "query tokens broadcast; per-pair cosines map-side; only "
        "|labels| x |tokens| max rows shuffle"
    ),
    "dedup_ngram_containment": (
        "prefix-block equi-join bounds candidates; the containment "
        "verifier is two row-local array HOFs, no gram explode"
    ),
    "graph_triangle_count": (
        "degree-ordered orientation: wedges enumerated from O(sqrt(m))-"
        "bounded out-neighbor lists, closed by one equi-join on the "
        "undirected edge set — no cartesian at any skew"
    ),
    "join_interval_binned": (
        "round 8: the dispatcher routes this bounded-width workload to "
        "the band kernel — one exchange feeds the RANGE window and the "
        "pair explode, no join operator; candidates ~= output"
    ),
    "join_interval_grid_mixed": (
        "heavy-tailed interval lengths: stats probe picks p95-sized day "
        "cells; grid equi-join with cell-ownership exactly-once, "
        "ShuffledHashJoin + ReusedExchange (one shuffle of binned rows)"
    ),
    "partition_prune_dynamic": (
        "dynamicpruningexpression on the fact scan: the filtered dim "
        "side selects which event_type directories are read at runtime"
    ),
    "ema_batch_fold": (
        "sequential recurrence as a declarative fold: one shuffle to "
        "per-key sorted arrays, then a JVM aggregate HOF — no Python, "
        "no iteration"
    ),
    "join_range_banded": (
        "large x large range join as a band-bucket equi-join: 3-cell "
        "explode on one side, shuffle-hash on the band key, exact "
        "predicate post-filter — no nested loop, no broadcast"
    ),
    "training_data_build": (
        "gate -> fingerprint dedup -> split -> 8-gram decontamination "
        "-> packing budget in ONE plan; gram table lineage-cut at the "
        "join boundary (codegen-heavy stages stay live)"
    ),
    "dq_expectation_suite": (
        "eight schema contracts as one union of narrow aggregates; FK "
        "expectations are anti-joins with broadcast-able key sets"
    ),
    "join_interval_window_band": (
        "fixed-length intervals: overlap collapses to a per-customer "
        "RANGE-window collect + explode — candidate volume equals "
        "output volume, ONE shuffle, no join operator in the plan"
    ),
    "sketch_mg_heavy_hitters": (
        "per-partition Misra-Gries summaries (O(k) state in one "
        "stateful mapInPandas) -> tiny candidate broadcast -> exact "
        "semi-join recount; vocabulary-sized groupBy only over "
        "candidate rows"
    ),
    "training_shard_layout": (
        "md5 shard bucket map-side; intra-shard rank is a shard-local "
        "window; only 16 manifest rows leave the final aggregation"
    ),
    "bootstrap_ci_mean": (
        "40-replicate fan-out map-side, ONE 40-key aggregation, a "
        "40-row order-statistic sort; exact decimal sums then a single "
        "double division"
    ),
    "graph_kcore_peel": (
        "iterative peel with per-round lineage cuts: the plan shown is "
        "the FINAL round's degree agg + two semi-joins over the "
        "checkpointed (shrunken) edge list; identity rounds early-exit"
    ),
    "stats_ks_drift_by_type": (
        "ECDF support bounded by the value domain: groupBy(value) "
        "reduces the table BEFORE the single ordered cumulative "
        "window; per-type counts ride as pivoted columns"
    ),
    "text_jsd_source_drift": (
        "observed (source, token) pairs only — the missing-support "
        "mass is a closed form, so no dense source x vocabulary grid; "
        "token- and source-keyed counts + one token join"
    ),
    "stats_psi_value_drift": (
        "one scan reduces to domain-bounded (type, bucket) cells with "
        "era counts as pivoted columns; the dense grid, totals and the "
        "PSI sum all run over that metadata-sized table"
    ),
    "ts_acf_hourly": (
        "the data-sized stage is ONE groupBy to hourly counts; the "
        "dense calendar grid, 6-lag window (one shared per-type sort) "
        "and exact-moment rollup run on hours x types rows"
    ),
    "text_bigram_pmi": (
        "bigram formation is scan-side zip_with (no self-join); the "
        "min-count filter shrinks candidates BEFORE the two "
        "vocabulary-keyed joins; top-K ranks candidate rows only"
    ),
    "embeddings_pca_power_iteration": (
        "matrix-free: each unrolled step broadcasts a 64-double "
        "direction, dots fold map-side, only 64-row w vectors shuffle "
        "— X^T X is never materialized"
    ),
    "join_asof_nearest": (
        "one union + ONE per-user sort carries both directional window "
        "arms; no per-purchase fan-out, no range join"
    ),
    "orders_kaplan_meier_churn": (
        "one groupBy collapses orders to customers, one to "
        "calendar-bounded duration cells; the survival windows run on "
        "cells only"
    ),
    "skyline_customers": (
        "Pareto frontier WITHOUT the O(n^2) pair scan: one "
        "customer-sized groupBy, one ordered window over avg-value "
        "LEVELS, a level-keyed join — no cartesian, no NOT-EXISTS loop"
    ),
    "ann_pq_adc": (
        "codebook and LUT both broadcast (64/512 rows); the encode "
        "fan-out prunes to (id, m, code) before any exchange; "
        "WindowGroupLimit pushes the per-(vec, m) argmin below its "
        "shuffle"
    ),
    "stats_kendall_tau_vocab": (
        "vocabulary collapse makes the pair stage a BROADCAST "
        "self-join of (x, y) cells — rows never pair; everything "
        "after the first groupBy is vocab-bounded"
    ),
    "intervals_active_count_daily": (
        "sweep line: two map-side-combinable groupBys + one "
        "calendar-bounded running sum — the interval operator with "
        "zero pairing work"
    ),
    "text_trigram_backoff_lm": (
        "n-gram formation is scan-side nested zip_with; the five "
        "count-table joins are hash joins on vocabulary-bounded "
        "tables; N enters as a 1-row broadcast"
    ),
    "stats_permutation_test": (
        "all B re-randomizations ride ONE map-side explode (no "
        "per-replicate shuffle of the data); the observed statistic "
        "is a 1-row broadcast against B replicate rows"
    ),
    "win_max_drawdown": (
        "running sum, running peak, and the trough argmax share one "
        "ordered window pass per type — the two-prefix-scan shape, "
        "no self-join"
    ),
    "dedup_incremental_minhash": (
        "vocabulary-hashed signatures; the candidate join is "
        "batch-bands x base-bands only — neither side ever pairs "
        "with itself"
    ),
    "geo_grid_radius_join": (
        "the radius theta-join compiles to ONE hash equi-join on the "
        "grid-cell key (3x3 neighborhood explode on the probe side); "
        "distance is a residual filter — no nested loop, no cartesian"
    ),
    "join_scd2_point_in_time": (
        "facts hash-join the SCD2 dimension on user_id; the half-open "
        "interval predicate rides as a residual filter — per-key "
        "compare volume bounded by per-user change counts"
    ),
    "ml_gbdt_histogram_split": (
        "one map-side-combinable groupBy reduces the corpus to "
        "|features| x |bins| grad/hess cells; every split candidate "
        "is a window cumsum over that tiny frame"
    ),
    "graph_clustering_coefficient": (
        "triangle count's degree-ordered orientation with the wedge apex "
        "kept: hash equi-joins only, per-node credit via one 3-arm explode"
    ),
    "graph_hits_hub_authority": (
        "two HITS iterations = four equi-join+agg half-steps on the reused "
        "edge key, all integer arithmetic; no normalization until the "
        "presented per-role max"
    ),
    "ts_periodogram_dft": (
        "ONE data-sized agg (events -> hourly counts); trig folds run over "
        "calendar-bounded per-type arrays, never event rows"
    ),
    "model_isotonic_calibration": (
        "bin assignment is map-only, the rollup is 20 keys; the PAV "
        "minimax enumerates bins^3 tuples on broadcast-sized frames"
    ),
    "dedup_threshold_sweep": (
        "round-10 co-occurrence rewrite: tokens explode once, ONE "
        "within-block equi-join on the token key counts |A intersect B| "
        "directly — no array ever enters a shuffle; the 9-threshold fan "
        "is a map-only explode on the verified pair set"
    ),
    "graph_adamic_adar_linkpred": (
        "same wedge-enumeration spine as the Jaccard twin (equi-joins "
        "on the middle key only); the 1/ln(deg) weights fold per pair "
        "in mid-sorted order — nothing all-pairs, candidates gated by "
        "cn >= 2 before the ranking window"
    ),
    "corpus_dsir_importance": (
        "tokens explode once; raw and target unigram tables are "
        "vocabulary-bounded; the probe join keys are tokens and the "
        "per-doc fold is document-length-bounded; top-K is TakeOrdered"
    ),
    "ts_pacf_durbin_levinson": (
        "one (type, day) groupBy is the only data-sized stage; lag "
        "windows + the unrolled D-L recursion run on the calendar-"
        "bounded daily frame — rho from exact BIGINT moments"
    ),
}


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    from database_peak_streaming_spark import get_spark
    from database_peak_streaming_spark.plans import explain as E
    from database_peak_streaming_spark.registry import QUERIES

    spark = get_spark("plans-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence for headline queries",
        "",
        "Generated by `python -m database_peak_streaming_spark.plans.dump`"
        f" (this file: at {Path(sf_dir).name}).",
        "Each plan is the one the plan-quality tests (tests/test_plans.py) pin —",
        "pushdown, pruning, broadcast strategy, shuffle budgets, codegen spans.",
        "",
    ]
    # the raw xxhash64 LSH form left the driver registry in round 6 but
    # stays plan-documented as a library function
    from database_peak_streaming_spark.operators.dedup import dedup_minhash_lsh

    lib_fns = {"dedup_minhash_lsh": dedup_minhash_lsh}
    for name, note in PICKS.items():
        fn = QUERIES.get(name) or lib_fns[name]
        tree = E.formatted_plan(fn(spark, sf_dir)).split("\n\n")[0]
        out += [f"## {name}", "", f"*{note}*", "", "```", tree, "```", ""]
    Path(__file__).parents[2].joinpath("PLANS.md").write_text("\n".join(out))


if __name__ == "__main__":
    main(*sys.argv[1:])
