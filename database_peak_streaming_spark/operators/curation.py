"""End-to-end corpus curation — the training-data pipeline composed as
ONE declarative plan: quality filter -> transitive near-dup removal ->
stable train/test split -> per-cut summary (BASELINE.json north star;
the composition is the point — each stage is an already-oracled operator
and Catalyst plans the whole chain together, so the quality filter
prunes before dedup's joins and nothing materializes between stages).

Scale shape: quality scoring is a narrow projection (codegen, no
shuffle); clustering is the CC fixpoint (operators/dedup.py) whose pair
graph comes from the lossless prefix-filter candidate equi-join (narrow
token/id keys, sub-quadratic — never a block-quadratic self-join);
keeper election is one window over cluster_id; split + summary is a
small-key groupBy.  On 100 TB the expensive stage is pair generation —
bounded by prefix-bucket occupancy — and everything downstream touches
only the surviving rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    dedup_clusters_cc,
    dedup_clusters_cc_lsh,
)
from database_peak_streaming_spark.operators.text import _STOP_SQL, STOPWORDS, _tokens
from database_peak_streaming_spark.sources.batch import load_table

#: selects quality scores {0.7, 1.0} with no float-boundary equality
QUALITY_CUTOFF = 0.65


def quality_score_col() -> Column:
    """The C4/Gopher-style composed quality heuristic over ``text`` —
    length band + mean word length + stopword ratio — as a pure column
    expression, shared by the batch funnel and the streaming ingest
    (streaming/corpus.py) so both gates are one definition."""
    toks = _tokens()
    n_tok = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tok
    )
    mean_wl = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tok
    return (
        F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(stop_ratio > 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    )


def curate_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation funnel, summarized per (split, lang): doc count,
    char volume, and an id checksum of exactly which docs survived.

    Stages (all reusing the registry's tested operators):
      1. quality gate — C4/Gopher-style composed heuristic > 0.65
         (length band + mean word length + stopword ratio);
      2. near-dup removal — transitive clusters from
         ``dedup_clusters_cc``; the keeper is the minimum-id
         QUALITY-PASSING member of each cluster (a cluster whose
         canonical doc failed quality still keeps its best remaining
         member);
      3. split — md5-stable train/test assignment (content-keyed,
         rerun/engine/partitioning-invariant).
    """
    clusters = dedup_clusters_cc(spark, sf_dir)
    return _funnel_summary(spark, sf_dir, clusters)


def _funnel_summary(spark: SparkSession, sf_dir: str, clusters: DataFrame) -> DataFrame:
    """Stages 1+3+summary of the funnel over a given clustering (the
    clustering is the only stage the two pipeline variants differ in)."""
    d = load_table(spark, "documents", sf_dir)
    passed = d.filter(quality_score_col() > QUALITY_CUTOFF).select(
        "doc_id", "lang", "n_chars"
    )
    w = Window.partitionBy("cluster_id")
    keepers = (
        passed.join(clusters, "doc_id")
        .withColumn("keep_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("keep_id"))
    )

    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1).isin(
            "0", "1"
        ),
        F.lit("test"),
    ).otherwise(F.lit("train"))
    return (
        keepers.select("doc_id", "lang", "n_chars", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split", "lang")
    )


def curate_corpus_pipeline_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel with the PROBABILISTIC clustering stage
    (``dedup_clusters_cc_lsh``) — the form a 100 TB run would choose when
    LSH candidate volume undercuts prefix-bucket volume.  Cluster
    refinement (LSH splits, never merges — property-tested) gives the
    funnel-level invariant the tests pin: the exact pipeline's keeper
    set is a SUBSET of this one's, so LSH trades a few extra near-dup
    survivors for cheaper candidates — it never drops a document the
    exact pipeline keeps.
    Library function only (NOT driver-registered): the LSH edges are
    xxhash64-seeded so no portable SQL oracle exists — the subset
    invariant test + ``check_curate_corpus_pipeline_lsh``
    (operators/checks.py) gate it instead (round-5 VERDICT #3)."""
    clusters = dedup_clusters_cc_lsh(spark, sf_dir)
    return _funnel_summary(spark, sf_dir, clusters)


QUERIES = {
    "curate_corpus_pipeline": curate_corpus_pipeline,
}

ORACLE_SQL = {
    "curate_corpus_pipeline": f"""
        WITH RECURSIVE tok AS (
            SELECT doc_id, source, lang,
                   LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS toks
            FROM documents),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM tok a JOIN tok b
              ON a.source = b.source AND a.lang = b.lang
             AND a.doc_id < b.doc_id
            WHERE CAST(LEN(LIST_INTERSECT(a.toks, b.toks)) AS DOUBLE)
                  / LEN(LIST_DISTINCT(LIST_CONCAT(a.toks, b.toks)))
                  >= {JACCARD_THRESHOLD}),
        edges AS (
            SELECT doc_a AS es, doc_b AS et FROM pairs
            UNION ALL
            SELECT doc_b AS es, doc_a AS et FROM pairs),
        reach(src, dst) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT r.src, e.et FROM reach r JOIN edges e ON r.dst = e.es),
        clusters AS (
            SELECT src AS doc_id, MIN(dst) AS cluster_id
            FROM reach GROUP BY src),
        quality AS (
            SELECT doc_id, lang, n_chars
            FROM (
                SELECT doc_id, lang, n_chars,
                       LEN(STRING_SPLIT(text, ' ')) AS n_tok,
                       LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                           x -> x IN {_STOP_SQL})) AS stop_hits,
                       CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                           / LEN(STRING_SPLIT(text, ' ')) AS mean_wl
                FROM documents)
            WHERE (CASE WHEN n_tok BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END)
                + (CASE WHEN mean_wl BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END)
                + (CASE WHEN CAST(stop_hits AS DOUBLE) / n_tok > 0.01
                        THEN 0.3 ELSE 0.0 END) > {QUALITY_CUTOFF}),
        keepers AS (
            SELECT q.doc_id, q.lang, q.n_chars
            FROM quality q JOIN clusters c ON q.doc_id = c.doc_id
            QUALIFY q.doc_id = MIN(q.doc_id) OVER (PARTITION BY c.cluster_id))
        SELECT CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                    THEN 'test' ELSE 'train' END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM keepers
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
}
