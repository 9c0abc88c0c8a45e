"""Driver-facing property checks for the hash-dependent queries.

Four registry queries have no ANSI-SQL oracle because their outputs
depend on xxhash64 permutations DuckDB cannot reproduce
(``dedup_minhash_lsh``, ``dedup_clusters_cc_lsh``,
``dedup_minhash_keepers``, ``curate_corpus_pipeline_lsh``;
``dedup_simhash`` graduated to a full md5-based oracle in round 5 but
keeps its structural check).  Without an
oracle the driver's correctness gate degrades to rows>0.  Each
``check_*`` query here recomputes the operator's *invariants* —
properties that hold for every dataset, pinned locally in
tests/test_llm_ops.py — entirely in Spark (no collect), and emits one
``(invariant, ok)`` row per property.  The expected output is a
constant all-true relation, so the oracle is a literal ``VALUES`` list
and the driver's value-hash compare becomes a real gate: if banding,
signatures, clustering, or the keeper rule regress, an invariant row
flips to false and the hash mismatches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.dedup import (
    LSH_VERIFY_THRESHOLD,
    _distinct_tokens,
    _minhash_sparse_drop_ids,
    dedup_clusters_cc,
    dedup_clusters_cc_lsh,
    dedup_minhash_keepers,
    dedup_minhash_lsh,
    dedup_simhash,
)
from database_peak_streaming_spark.sources.batch import load_table


def _inv(name: str, df: DataFrame) -> DataFrame:
    """Tag a 1-row boolean frame (column ``ok``) with its invariant name.

    NULL ``ok`` coalesces to FALSE: a NULL here means the invariant's
    aggregate ran over an EMPTY input (``bool_and``/``max`` over zero
    rows), and every fixture these checks run on is nonempty — so an
    empty input is itself a regression (e.g., a both-outputs-empty
    clustering would otherwise satisfy refinement vacuously) and must
    flip the row to false, mismatching the all-true oracle."""
    return df.select(
        F.lit(name).alias("invariant"),
        F.coalesce(F.col("ok"), F.lit(False)).alias("ok"),
    )


def _stack(parts: list[DataFrame]) -> DataFrame:
    return reduce(DataFrame.unionAll, parts).orderBy("invariant")


def check_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariants of the banded-LSH pair query:

    * ``pairs_ordered_verified`` — every emitted pair is (low, high) by
      doc_id and its *recomputed* exact Jaccard clears the verify
      threshold (catches a broken verify stage or column swap);
    * ``exact_dup_pairs_covered`` — every pair of documents with
      identical text appears: identical text gives identical signatures,
      hence identical bands, hence a mandatory candidate — a guaranteed
      (not probabilistic) recall floor;
    * ``nonempty`` — the fixture corpus contains near-dups, the query
      must find some.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir)
    d = load_table(spark, "documents", sf_dir)
    t = d.select("doc_id", _distinct_tokens().alias("toks"))
    inter = F.size(F.array_intersect(F.col("ta.toks"), F.col("tb.toks")))
    jac = inter.cast("double") / (
        F.size(F.col("ta.toks")) + F.size(F.col("tb.toks")) - inter
    )
    verified = (
        pairs.join(t.alias("ta"), pairs.doc_a == F.col("ta.doc_id"))
        .join(t.alias("tb"), pairs.doc_b == F.col("tb.doc_id"))
        .agg(
            F.bool_and(
                (F.col("doc_a") < F.col("doc_b"))
                & (F.round(jac, 6) >= LSH_VERIFY_THRESHOLD)
            ).alias("ok")
        )
    )
    exact_dups = (
        d.alias("x")
        .join(d.alias("y"), (F.col("x.text") == F.col("y.text")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    covered = (
        exact_dups.join(pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("ok"))
    )
    nonempty = pairs.agg((F.count(F.lit(1)) > 0).alias("ok"))
    return _stack(
        [
            _inv("exact_dup_pairs_covered", covered),
            _inv("nonempty", nonempty),
            _inv("pairs_ordered_verified", verified),
        ]
    )


def check_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariants of the 64-bit SimHash fingerprint query:

    * ``one_row_per_doc`` — exactly one fingerprint per document;
    * ``chunks_reassemble`` — each 16-bit chunk equals the matching slice
      of the fingerprint under *logical* shift (the emit path uses
      arithmetic shift + mask; equality proves the mask discipline);
    * ``identical_text_same_fp`` — the fingerprint is a pure function of
      text.
    """
    s = dedup_simhash(spark, sf_dir)
    d = load_table(spark, "documents", sf_dir)
    chunk_ok = reduce(
        lambda a, c: a
        & (
            F.col(f"chunk_{c}")
            == F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(
                F.lit(0xFFFF)
            )
        ),
        range(4),
        F.lit(True),
    )
    reassemble = s.agg(F.bool_and(chunk_ok).alias("ok"))
    per_doc = s.join(d.select("doc_id"), "doc_id").agg(
        (
            (F.count(F.lit(1)) == F.count_distinct(F.col("doc_id")))
        ).alias("ok")
    )
    row_counts = (
        s.agg(F.count(F.lit(1)).alias("n_s"))
        .crossJoin(d.agg(F.count(F.lit(1)).alias("n_d")))
        .select((F.col("n_s") == F.col("n_d")).alias("ok"))
    )
    one_per_doc = per_doc.crossJoin(
        row_counts.select(F.col("ok").alias("ok2"))
    ).select((F.col("ok") & F.col("ok2")).alias("ok"))
    pure_fn = (
        s.join(d.select("doc_id", "text"), "doc_id")
        .groupBy("text")
        .agg(F.count_distinct(F.col("simhash")).alias("n_fp"))
        .agg(F.bool_and(F.col("n_fp") == 1).alias("ok"))
    )
    return _stack(
        [
            _inv("chunks_reassemble", reassemble),
            _inv("identical_text_same_fp", pure_fn),
            _inv("one_row_per_doc", one_per_doc),
        ]
    )


def check_dedup_clusters_cc_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariants of the LSH-fed connected-components clustering, vs the
    exact (lossless prefix-filter) clustering:

    * ``refines_exact`` — every LSH cluster sits inside ONE exact
      cluster: LSH edges verify at 0.7 >= the exact graph's 0.5, so LSH
      may split clusters (missed s-curve edges) but must never merge
      docs the exact closure keeps apart;
    * ``same_doc_set`` — both variants label every document exactly once;
    * ``has_nonsingleton`` — the clustering is not degenerate.
    """
    lsh = dedup_clusters_cc_lsh(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("lsh_cluster")
    )
    exact = dedup_clusters_cc(spark, sf_dir).select(
        "doc_id", F.col("cluster_id").alias("exact_cluster")
    )
    joined = lsh.join(exact, "doc_id")
    refines = (
        joined.groupBy("lsh_cluster")
        .agg(F.count_distinct(F.col("exact_cluster")).alias("n_exact"))
        .agg(F.bool_and(F.col("n_exact") == 1).alias("ok"))
    )
    same_set = (
        lsh.agg(F.count(F.lit(1)).alias("n_l"))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_e")))
        .crossJoin(joined.agg(F.count(F.lit(1)).alias("n_j")))
        .select(
            ((F.col("n_l") == F.col("n_e")) & (F.col("n_e") == F.col("n_j"))).alias(
                "ok"
            )
        )
    )
    nonsingleton = (
        lsh.groupBy("lsh_cluster")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg((F.max("sz") >= 2).alias("ok"))
    )
    return _stack(
        [
            _inv("has_nonsingleton", nonsingleton),
            _inv("refines_exact", refines),
            _inv("same_doc_set", same_set),
        ]
    )


def check_dedup_minhash_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Invariants tying the keeper summary to its drop-id set:

    * ``summary_consistent`` — the registered query's (n_docs,
      n_dropped) equals count(documents) / count(drop ids);
    * ``drops_subset`` — every dropped id is a real document id;
    * ``min_id_kept`` — the globally minimum doc_id can never verify
      against a lower id, so it must survive.
    """
    d = load_table(spark, "documents", sf_dir)
    drops = _minhash_sparse_drop_ids(spark, sf_dir)
    summary = dedup_minhash_keepers(spark, sf_dir)
    consistent = (
        summary.crossJoin(d.agg(F.count(F.lit(1)).alias("n_real")))
        .crossJoin(drops.agg(F.count(F.lit(1)).alias("n_drop_real")))
        .select(
            (
                (F.col("n_docs") == F.col("n_real"))
                & (F.col("n_dropped") == F.col("n_drop_real"))
            ).alias("ok")
        )
    )
    subset = drops.join(d.select("doc_id"), "doc_id", "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("ok")
    )
    min_kept = (
        d.agg(F.min("doc_id").alias("doc_id"))
        .join(drops, "doc_id", "left_semi")
        .agg((F.count(F.lit(1)) == 0).alias("ok"))
    )
    return _stack(
        [
            _inv("drops_subset", subset),
            _inv("min_id_kept", min_kept),
            _inv("summary_consistent", consistent),
        ]
    )


def check_curate_corpus_pipeline_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel-level invariants of the LSH curation pipeline vs the exact
    one (tests/test_llm_ops.py::test_lsh_funnel_keepers_superset_of_exact):

    * ``exact_keepers_subset`` — cluster refinement means the exact
      pipeline's keeper set is a subset of the LSH pipeline's: LSH may
      keep extra near-dups, never drop a doc the exact pipeline keeps;
    * ``summary_matches_keepers`` — the registered query's total n_docs
      equals the recomputed LSH keeper count (ties the public summary to
      the document-level decision).
    """
    from database_peak_streaming_spark.operators.curation import (
        QUALITY_CUTOFF,
        _funnel_summary,
        quality_score_col,
    )
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir)
    passed = d.filter(quality_score_col() > QUALITY_CUTOFF).select("doc_id")

    def keepers(clusters: DataFrame) -> DataFrame:
        w = Window.partitionBy("cluster_id")
        return (
            passed.join(clusters, "doc_id")
            .withColumn("keep_id", F.min("doc_id").over(w))
            .filter(F.col("doc_id") == F.col("keep_id"))
            .select("doc_id")
        )

    exact_k = keepers(dedup_clusters_cc(spark, sf_dir))
    # ONE clustering run shared by the keeper recomputation and the
    # funnel summary (round 12, guide §2.4): ``curate_corpus_pipeline_lsh``
    # is exactly ``_funnel_summary`` over ``dedup_clusters_cc_lsh``, and
    # calling it separately re-ran the whole LSH pipeline + CC fixpoint
    # (per-round ACTIONS — never deduplicated across jobs) a second time.
    lsh_clusters = dedup_clusters_cc_lsh(spark, sf_dir)
    lsh_k = keepers(lsh_clusters)
    subset = exact_k.join(lsh_k, "doc_id", "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("ok")
    )
    summary_total = (
        _funnel_summary(spark, sf_dir, lsh_clusters)
        .agg(F.sum("n_docs").alias("n_summary"))
        .crossJoin(lsh_k.agg(F.count(F.lit(1)).alias("n_keep")))
        .select((F.col("n_summary") == F.col("n_keep")).alias("ok"))
    )
    return _stack(
        [
            _inv("exact_keepers_subset", subset),
            _inv("summary_matches_keepers", summary_total),
        ]
    )


#: embedding dimensionality the fixture contracts (embeddings.parquet)
DQ_EMB_DIM = 64


def dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Great-Expectations /
    dbt-tests pattern as ONE query): schema-level contracts —
    primary-key uniqueness, non-null measures, categorical domains,
    timestamp ranges, referential integrity across tables, text
    non-emptiness, embedding dimensionality — each emitted as a row
    (expectation, observed violation count, passed).  The observed
    counts are exact and engine-portable, so unlike the all-true
    ``check_*`` gates the oracle here recomputes the COUNTS too — a
    regression shows the violation volume, not just a flipped flag.

    One narrow aggregate per expectation (anti-joins for the FK
    contracts — broadcast-able key sets at any fact scale); the union
    is rows = |expectations|, the cheapest possible publication of a
    nightly contract run."""
    ev = load_table(spark, "events", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    d = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)

    def expect(name: str, observed: DataFrame) -> DataFrame:
        return observed.select(
            F.lit(name).alias("expectation"),
            F.col("observed").cast("long").alias("observed"),
            (F.col("observed") == 0).alias("passed"),
        )

    # All four events expectations share ONE scan+aggregate (they were
    # four independent full scans of the fact table) and unpivot to rows
    # afterwards; the final orderBy("expectation") makes union order
    # irrelevant, so the observed counts — and the result — are
    # unchanged (round 12, guide §2.4).
    ev_agg = ev.agg(
        (F.count(F.lit(1)) - F.count_distinct("event_id")).alias("_pk"),
        F.sum(F.col("value").isNull().cast("long")).alias("_nn"),
        F.sum(
            (~F.col("event_type").isin(
                "click", "error", "purchase", "signup", "view"
            )).cast("long")
        ).alias("_dom"),
        F.sum(
            (
                (F.col("ts") < F.lit("2024-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2024-02-01").cast("timestamp"))
            ).cast("long")
        ).alias("_rng"),
    )
    ev_checks = (
        ev_agg.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("events_pk_unique").alias("expectation"),
                        F.col("_pk").cast("long").alias("observed"),
                    ),
                    F.struct(
                        F.lit("events_value_nonnull").alias("expectation"),
                        F.col("_nn").cast("long").alias("observed"),
                    ),
                    F.struct(
                        F.lit("events_type_in_domain").alias("expectation"),
                        F.col("_dom").cast("long").alias("observed"),
                    ),
                    F.struct(
                        F.lit("events_ts_in_month").alias("expectation"),
                        F.col("_rng").cast("long").alias("observed"),
                    ),
                )
            ).alias("e")
        )
        .select(
            F.col("e.expectation").alias("expectation"),
            F.col("e.observed").alias("observed"),
            (F.col("e.observed") == 0).alias("passed"),
        )
    )

    parts = [
        ev_checks,
        expect(
            "orders_fk_customer",
            o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti").agg(
                F.count(F.lit(1)).alias("observed")
            ),
        ),
        expect(
            "lineitem_fk_orders",
            li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti").agg(
                F.count(F.lit(1)).alias("observed")
            ),
        ),
        expect(
            "documents_text_nonempty",
            d.agg(
                F.sum((F.length("text") == 0).cast("long")).alias("observed")
            ),
        ),
        expect(
            "embeddings_dim_consistent",
            emb.agg(
                F.sum(
                    (F.size("embedding") != DQ_EMB_DIM).cast("long")
                ).alias("observed")
            ),
        ),
    ]
    return _stack_dq(parts)


def _stack_dq(parts: list[DataFrame]) -> DataFrame:
    return reduce(DataFrame.unionAll, parts).orderBy("expectation")


def _dq_sql() -> str:
    return f"""
        SELECT * FROM (
          SELECT 'documents_text_nonempty' AS expectation,
                 CAST(SUM(CASE WHEN LENGTH(text) = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS observed,
                 SUM(CASE WHEN LENGTH(text) = 0 THEN 1 ELSE 0 END) = 0
                     AS passed
          FROM documents
          UNION ALL
          SELECT 'embeddings_dim_consistent',
                 CAST(SUM(CASE WHEN LEN(embedding) <> {DQ_EMB_DIM}
                          THEN 1 ELSE 0 END) AS BIGINT),
                 SUM(CASE WHEN LEN(embedding) <> {DQ_EMB_DIM}
                     THEN 1 ELSE 0 END) = 0
          FROM embeddings
          UNION ALL
          SELECT 'events_pk_unique',
                 CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT),
                 COUNT(*) = COUNT(DISTINCT event_id)
          FROM events
          UNION ALL
          SELECT 'events_ts_in_month',
                 CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
                               OR ts >= TIMESTAMP '2024-02-01'
                          THEN 1 ELSE 0 END) AS BIGINT),
                 SUM(CASE WHEN ts < TIMESTAMP '2024-01-01'
                          OR ts >= TIMESTAMP '2024-02-01'
                     THEN 1 ELSE 0 END) = 0
          FROM events
          UNION ALL
          SELECT 'events_type_in_domain',
                 CAST(SUM(CASE WHEN event_type NOT IN
                          ('click','error','purchase','signup','view')
                          THEN 1 ELSE 0 END) AS BIGINT),
                 SUM(CASE WHEN event_type NOT IN
                     ('click','error','purchase','signup','view')
                     THEN 1 ELSE 0 END) = 0
          FROM events
          UNION ALL
          SELECT 'events_value_nonnull',
                 CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT),
                 SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) = 0
          FROM events
          UNION ALL
          SELECT 'lineitem_fk_orders',
                 CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
                 COUNT(*) FILTER (WHERE o_orderkey IS NULL) = 0
          FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
          UNION ALL
          SELECT 'orders_fk_customer',
                 CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
                 COUNT(*) FILTER (WHERE c_custkey IS NULL) = 0
          FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        ) ORDER BY expectation
    """


def _all_true_sql(names: list[str]) -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{n}' AS invariant, TRUE AS ok" for n in sorted(names)
    )
    return f"SELECT * FROM ({rows}) ORDER BY invariant"


def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law fraud/DQ screen over order totals: the observed
    first-significant-digit distribution vs the Benford expectation
    p(d) = log10(1 + 1/d), with the per-digit chi-square contribution —
    the forensic-accounting check a warehouse runs on any money column
    (synthetic uniform-ish fixtures will FAIL the law loudly; the
    value of the query is the exact, portable per-digit diagnostics,
    not a pass verdict).

    The first digit is extracted through exact integer/string ops
    (FLOOR -> BIGINT -> leading character), never float log10 of the
    value, so 10^k boundaries cannot misclassify.  One scan reduces to
    9 digit cells; the dense 1..9 grid keeps never-observed digits in
    the output with their full expected-count penalty."""
    o = load_table(spark, "orders", sf_dir).where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("long")
    obs = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").alias("n_total"))
    digits = spark.range(1, 10).select(F.col("id").alias("digit"))
    p_ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    expected = F.col("n_total") * p_ben
    dev = F.col("n_obs") - expected
    return (
        digits.join(obs, "digit", "left")
        .fillna(0, subset=["n_obs"])
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.col("n_obs").cast("long").alias("n_obs"),
            F.round(F.col("n_obs") / F.col("n_total"), 6).alias("p_obs"),
            F.round(p_ben, 6).alias("p_benford"),
            F.round(dev * dev / expected, 6).alias("chi2_term"),
        )
        .orderBy("digit")
    )


QUERIES = {
    "dq_expectation_suite": dq_expectation_suite,
    "dq_benford_first_digit": dq_benford_first_digit,
    "check_dedup_minhash_lsh": check_dedup_minhash_lsh,
    "check_dedup_simhash": check_dedup_simhash,
    "check_dedup_clusters_cc_lsh": check_dedup_clusters_cc_lsh,
    "check_dedup_minhash_keepers": check_dedup_minhash_keepers,
    "check_curate_corpus_pipeline_lsh": check_curate_corpus_pipeline_lsh,
}

ORACLE_SQL = {
    "dq_expectation_suite": _dq_sql(),
    "dq_benford_first_digit": """
        WITH obs AS (
            SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS BIGINT)
                       AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n_obs
            FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
        dense AS (
            SELECT d.digit, COALESCE(obs.n_obs, 0) AS n_obs
            FROM generate_series(1, 9) d(digit)
            LEFT JOIN obs ON obs.digit = d.digit)
        SELECT digit, n_obs,
               ROUND(n_obs / n_total, 6) AS p_obs,
               ROUND(LOG10(1.0 + 1.0 / digit), 6) AS p_benford,
               ROUND((n_obs - n_total * LOG10(1.0 + 1.0 / digit))
                     * (n_obs - n_total * LOG10(1.0 + 1.0 / digit))
                     / (n_total * LOG10(1.0 + 1.0 / digit)), 6)
                   AS chi2_term
        FROM dense CROSS JOIN tot
        ORDER BY digit
    """,
    "check_dedup_minhash_lsh": _all_true_sql(
        ["exact_dup_pairs_covered", "nonempty", "pairs_ordered_verified"]
    ),
    "check_dedup_simhash": _all_true_sql(
        ["chunks_reassemble", "identical_text_same_fp", "one_row_per_doc"]
    ),
    "check_dedup_clusters_cc_lsh": _all_true_sql(
        ["has_nonsingleton", "refines_exact", "same_doc_set"]
    ),
    "check_dedup_minhash_keepers": _all_true_sql(
        ["drops_subset", "min_id_kept", "summary_consistent"]
    ),
    "check_curate_corpus_pipeline_lsh": _all_true_sql(
        ["exact_keepers_subset", "summary_matches_keepers"]
    ),
}


#: k-anonymity audit thresholds: groups smaller than K_ANON_K put their
#: rows "at risk"; the sensitive attribute is the account-balance
#: thousand-band.
K_ANON_K = 5


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity PRIVACY audit over the customer
    quasi-identifier (nation, market segment) — the release-gate check
    a training-data pipeline runs before shipping a table with
    person-adjacent columns (the privacy sibling of
    ``text_redact_scan``'s content-level sweep): per market segment,
    report the k-anonymity level (the SMALLEST quasi-identifier
    equivalence-class size — an attacker's best re-identification
    odds are 1/k), how many rows sit in classes below ``K_ANON_K``,
    and the l-diversity floor (minimum distinct sensitive values —
    balance thousand-bands — per class; a class can be k-anonymous
    yet leak its sensitive value when l = 1).

    Everything is exact integer arithmetic — no float enters before
    the single percentage division.

    Scale: two map-side-combinable groupBys (QI classes, then
    segment rollup); class count is bounded by the QI domain
    (|nations| x |segments|), so the second stage is trivially small
    at any row count."""
    cu = load_table(spark, "customer", sf_dir)
    classes = (
        cu.select(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
        )
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("band").alias("l_div"),
        )
    )
    return (
        classes.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("n_rows").cast("long").alias("k_level"),
            F.sum(
                F.when(F.col("n_rows") < K_ANON_K, F.col("n_rows"))
                .otherwise(0)
            ).cast("long").alias("rows_at_risk"),
            F.min("l_div").cast("long").alias("l_floor"),
        )
        .select(
            "c_mktsegment",
            "n_classes",
            "n_rows",
            "k_level",
            "rows_at_risk",
            F.round(
                F.col("rows_at_risk").cast("double")
                / F.col("n_rows") * 100,
                6,
            ).alias("pct_at_risk"),
            "l_floor",
        )
        .orderBy("c_mktsegment")
    )


QUERIES["dq_k_anonymity"] = dq_k_anonymity
ORACLE_SQL["dq_k_anonymity"] = f"""
    WITH classes AS (
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n_rows,
               COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
                   AS l_div
        FROM customer
        GROUP BY c_mktsegment, c_nationkey)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(MIN(n_rows) AS BIGINT) AS k_level,
           CAST(SUM(CASE WHEN n_rows < {K_ANON_K} THEN n_rows
                         ELSE 0 END) AS BIGINT) AS rows_at_risk,
           ROUND(CAST(SUM(CASE WHEN n_rows < {K_ANON_K} THEN n_rows
                              ELSE 0 END) AS DOUBLE)
                 / SUM(n_rows) * 100, 6) AS pct_at_risk,
           CAST(MIN(l_div) AS BIGINT) AS l_floor
    FROM classes
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""
