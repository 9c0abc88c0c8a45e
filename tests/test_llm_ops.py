"""Structural tests for the non-SQL-expressible LLM-data operators
(MinHash-LSH, SimHash) — the ops the driver can only rows-check.

Strategy (SURVEY.md §5): verify the *properties* the constructions
guarantee — LSH output precision is 1.0 by construction (every emitted
pair is exact-verified), recall on very-high-similarity pairs follows
the banding s-curve, SimHash is deterministic and locality-sensitive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _exact_pairs(spark, threshold: float):
    """Corpus-wide exact token-set Jaccard pairs (the oracle)."""
    from database_peak_streaming_spark.operators.dedup import _distinct_tokens
    from database_peak_streaming_spark.sources.batch import load_table

    d = load_table(spark, "documents", SF_DIR)
    t = d.select("doc_id", _distinct_tokens().alias("toks"))
    jac = (
        F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks"))).cast("double")
        / F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    )
    return (
        t.alias("a")
        .join(t.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def test_lsh_pairs_are_verified_above_threshold(spark):
    from database_peak_streaming_spark.operators.dedup import (
        LSH_VERIFY_THRESHOLD,
        dedup_minhash_lsh,
    )

    rows = dedup_minhash_lsh(spark, SF_DIR).collect()
    assert len(rows) > 0, "fixture corpus is dense; LSH must find pairs"
    assert all(r.jaccard >= LSH_VERIFY_THRESHOLD for r in rows)
    # precision 1.0 by construction: every pair also in the exact oracle
    exact = {
        (r.doc_a, r.doc_b)
        for r in _exact_pairs(spark, LSH_VERIFY_THRESHOLD).collect()
    }
    assert all((r.doc_a, r.doc_b) in exact for r in rows)


def test_lsh_recall_on_high_similarity(spark):
    """At jaccard >= 0.9 the 4x4 banding detects with p ~ 0.99; assert a
    conservative 0.8 recall on the fixture."""
    from database_peak_streaming_spark.operators.dedup import dedup_minhash_lsh

    found = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_DIR).collect()
    }
    high = {(r.doc_a, r.doc_b) for r in _exact_pairs(spark, 0.9).collect()}
    assert high, "fixture should contain jaccard>=0.9 pairs"
    recall = len(high & found) / len(high)
    assert recall >= 0.8, f"LSH recall {recall:.3f} below 0.8"


def test_simhash_deterministic_and_chunked(spark):
    from database_peak_streaming_spark.operators.dedup import dedup_simhash

    a = dedup_simhash(spark, SF_DIR).collect()
    b = dedup_simhash(spark, SF_DIR).collect()
    assert a == b, "simhash must be deterministic"
    for r in a[:50]:
        reassembled = sum(getattr(r, f"chunk_{c}") << (16 * c) for c in range(4))
        # chunks reassemble the unsigned low 64 bits
        assert reassembled == r.simhash & 0xFFFFFFFFFFFFFFFF
    # locality: fingerprints are not all identical and not all distinct-free
    distinct = {r.simhash for r in a}
    assert len(distinct) > len(a) // 2


def test_ann_is_subset_of_bruteforce_corpus(spark):
    """Every ANN result is a real corpus vector with correctly computed
    cosine: cross-check ANN rows against brute-force scores."""
    from database_peak_streaming_spark.operators.similarity import (
        ann_ivf_bucketed,
        cosine_topk_bruteforce,
    )

    brute = {
        (r.q_id, r.vec_id): r.cosine
        for r in cosine_topk_bruteforce(spark, SF_DIR).collect()
    }
    ann = ann_ivf_bucketed(spark, SF_DIR).collect()
    assert len(ann) > 0
    for r in ann:
        if (r.q_id, r.vec_id) in brute:
            assert abs(brute[(r.q_id, r.vec_id)] - r.cosine) < 1e-9


def test_lsh_cc_refines_exact_cc(spark):
    """The LSH-fed transitive clustering must REFINE the exact one:
    every LSH edge is verified at a higher Jaccard threshold (0.7) than
    the exact pair graph's (0.5), so two docs the LSH variant clusters
    together must also share an exact cluster — LSH may split clusters
    (missed s-curve edges), never merge ones the exact graph keeps
    apart.  And it must not be degenerate: some real (non-singleton)
    cluster exists."""
    from database_peak_streaming_spark.operators.dedup import (
        dedup_clusters_cc,
        dedup_clusters_cc_lsh,
    )

    exact = {
        r.doc_id: r.cluster_id for r in dedup_clusters_cc(spark, SF_DIR).collect()
    }
    lsh_rows = dedup_clusters_cc_lsh(spark, SF_DIR).collect()
    lsh_clusters: dict[int, list[int]] = {}
    for r in lsh_rows:
        lsh_clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    assert len(lsh_rows) == len(exact), "variants disagree on the doc set"
    assert any(len(m) > 1 for m in lsh_clusters.values()), "no non-singleton cluster"
    for cid, members in lsh_clusters.items():
        exact_ids = {exact[m] for m in members}
        assert len(exact_ids) == 1, (
            f"LSH cluster {cid} spans exact clusters {exact_ids}"
        )


def test_kmeans_ivf_buckets_and_recall(spark):
    """The trained-quantizer IVF: (a) every pinned-centroid bucket
    assignment equals a numpy argmin over the same literals; (b) its
    cosines agree with brute force; (c) it finds at least one true
    top-k neighbor per query on the fixture (nonzero recall — the
    Voronoi cells are cosine-local)."""
    import numpy as np

    from database_peak_streaming_spark.operators.similarity import (
        _KMEANS_CENTROIDS,
        _kmeans_bucket,
        ann_ivf_kmeans,
        cosine_topk_bruteforce,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    e = load_table(spark, "embeddings", SF_DIR)
    got = (
        e.select("vec_id", "embedding", _kmeans_bucket(F.col("embedding")).alias("b"))
        .limit(100)
        .collect()
    )
    C = np.array(_KMEANS_CENTROIDS)
    for r in got:
        x = np.array(r.embedding, dtype=np.float64)
        want = int(((C - x) ** 2).sum(1).argmin()) + 1  # 1-based like array_position
        assert r.b == want, f"vec {r.vec_id}: bucket {r.b} != numpy {want}"

    brute = {
        (r.q_id, r.vec_id): r.cosine
        for r in cosine_topk_bruteforce(spark, SF_DIR).collect()
    }
    ann = ann_ivf_kmeans(spark, SF_DIR).collect()
    assert ann
    hits = 0
    for r in ann:
        if (r.q_id, r.vec_id) in brute:
            assert abs(brute[(r.q_id, r.vec_id)] - r.cosine) < 1e-9
            hits += 1
    assert hits > 0, "trained IVF found no true top-k neighbor at all"


def test_train_ivf_centroids_distributed(spark):
    """The pyspark.ml training path runs and yields k centroids of the
    right dimensionality with every vector assigned (the step whose
    pinned output is _KMEANS_CENTROIDS)."""
    from database_peak_streaming_spark.operators.similarity import (
        train_ivf_centroids,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    e = load_table(spark, "embeddings", SF_DIR)
    cents = train_ivf_centroids(e, k=4, max_iter=5)
    assert len(cents) == 4
    assert all(len(c) == 64 for c in cents)
    flat = [v for c in cents for v in c]
    assert any(abs(v) > 0 for v in flat)


def test_dedup_clusters_cc_matches_union_find(spark):
    """The distributed hash-min label propagation must equal a
    single-node union-find over the same pair graph — an oracle
    independent of both Spark and DuckDB."""
    from database_peak_streaming_spark.operators.dedup import (
        dedup_clusters_cc,
        dedup_ngram_jaccard,
    )

    pairs = dedup_ngram_jaccard(spark, SF_DIR).select("doc_a", "doc_b").collect()
    from database_peak_streaming_spark.sources.batch import load_table

    docs = [r.doc_id for r in load_table(spark, "documents", SF_DIR).select("doc_id").collect()]
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r.doc_a), find(r.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {d: find(d) for d in docs}
    # canonicalize to min-of-component (find() already returns the min
    # root because unions always point the larger root at the smaller)
    got = {r.doc_id: r.cluster_id for r in dedup_clusters_cc(spark, SF_DIR).collect()}
    assert got == expect
    assert any(v != k for k, v in got.items())  # fixture has real dup groups


def test_prefix_filter_lossless_on_random_corpus(spark):
    """The Bayardo prefix filter must admit EVERY pair with Jaccard >=
    threshold — losslessness is what lets the transitive CC path use it
    without recall loss.  Random 150-doc corpus with planted near-dups;
    candidates from the filter, truth from brute-force all-pairs."""
    import itertools
    import random

    from database_peak_streaming_spark.operators.dedup import (
        _distinct_tokens,
        _prefix_filter_candidates,
    )

    rng = random.Random(20260813)
    vocab = [f"w{i}" for i in range(120)]
    docs = []
    for i in range(100):
        toks = rng.sample(vocab, rng.randint(5, 25))
        docs.append((i, "s0", "en", " ".join(toks)))
    # planted near-dups: copy an earlier doc, drop/add a token or two
    for j in range(50):
        base_id = rng.randrange(len(docs))
        toks = docs[base_id][3].split(" ")
        if len(toks) > 6 and rng.random() < 0.7:
            toks = toks[:-1]
        toks = toks + [rng.choice(vocab)]
        docs.append((100 + j, "s0", "en", " ".join(sorted(set(toks)))))

    df = spark.createDataFrame(docs, "doc_id long, source string, lang string, text string")
    t = df.select("doc_id", "source", "lang", _distinct_tokens().alias("toks"))
    threshold = 0.5
    cand = {
        (r.doc_a, r.doc_b)
        for r in _prefix_filter_candidates(t, threshold).collect()
    }

    tok_sets = {i: set(text.split(" ")) for i, _, _, text in docs}
    missed = []
    n_true = 0
    for a, b in itertools.combinations(sorted(tok_sets), 2):
        sa, sb = tok_sets[a], tok_sets[b]
        jac = len(sa & sb) / len(sa | sb)
        if jac >= threshold:
            n_true += 1
            if (a, b) not in cand:
                missed.append((a, b, jac))
    assert n_true > 20, "fixture too easy — not enough true pairs planted"
    assert not missed, f"prefix filter MISSED qualifying pairs: {missed[:5]}"


def test_lsh_funnel_keepers_superset_of_exact(spark):
    """Funnel-level consequence of cluster refinement: the exact
    pipeline's keeper set must be a subset of the LSH pipeline's — an
    exact cluster's keeper is the min quality-passing member of the
    whole cluster, hence also of whichever LSH sub-cluster it fell into.
    LSH curation may keep extra near-dups (split clusters), never drop a
    document the exact pipeline keeps."""
    from pyspark.sql import Window

    from database_peak_streaming_spark.operators.curation import (
        QUALITY_CUTOFF,
        quality_score_col,
    )
    from database_peak_streaming_spark.operators.dedup import (
        dedup_clusters_cc,
        dedup_clusters_cc_lsh,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    d = load_table(spark, "documents", SF_DIR)
    passed = d.filter(quality_score_col() > QUALITY_CUTOFF).select("doc_id")

    def keepers(clusters):
        w = Window.partitionBy("cluster_id")
        return {
            r.doc_id
            for r in (
                passed.join(clusters, "doc_id")
                .withColumn("keep_id", F.min("doc_id").over(w))
                .filter(F.col("doc_id") == F.col("keep_id"))
                .collect()
            )
        }

    exact = keepers(dedup_clusters_cc(spark, SF_DIR))
    lsh = keepers(dedup_clusters_cc_lsh(spark, SF_DIR))
    assert exact <= lsh, f"exact keepers missing from LSH funnel: {sorted(exact - lsh)[:5]}"
    assert len(lsh) >= len(exact)


def test_funnel_counts_monotone(spark):
    """Ordered-funnel sanity: each stage's survivor count must be <= the
    previous stage's (strictly-after gating can only lose users)."""
    from database_peak_streaming_spark.operators.behavior import (
        events_funnel_ordered,
    )

    rows = {r.stage: r.n_users for r in events_funnel_ordered(spark, SF_DIR).collect()}
    order = ["1_signup", "2_view", "3_click", "4_purchase"]
    assert set(rows) == set(order)
    assert rows["1_signup"] > 0
    for a, b in zip(order, order[1:]):
        assert rows[b] <= rows[a], f"{b} ({rows[b]}) > {a} ({rows[a]})"


def test_substring_spans_position_independent(spark, tmp_path):
    """Planted-passage sensitivity: a SPAN_N-word passage copied into two
    documents at DIFFERENT word offsets must be flagged in both (the
    stride-1 gram construction is alignment-independent — the property a
    fixed-stride window would not have), and a third document sharing no
    span stays clean."""
    from database_peak_streaming_spark.operators.dedup import (
        SPAN_N,
        dedup_substring_spans,
    )

    shared = " ".join(f"shared{i}" for i in range(SPAN_N))
    docs = [
        # passage at word offset 3
        (0, "a b c " + shared + " tail0 tail1"),
        # same passage at word offset 5 — different alignment
        (1, "p q r s t " + shared),
        # no shared span, long enough to emit spans
        (2, " ".join(f"solo{i}" for i in range(SPAN_N + 4))),
    ]
    spark.createDataFrame(
        [(i, t, "en", "srcX", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r.doc_id: r
        for r in dedup_substring_spans(spark, str(tmp_path)).collect()
    }
    assert got[0].n_dup_spans >= 1
    assert got[1].n_dup_spans >= 1
    assert got[2].n_dup_spans == 0
    # the planted passage is exactly one shared gram per doc
    assert got[0].n_dup_spans == 1
    assert got[1].n_dup_spans == 1


def test_weighted_sample_biases_toward_weight(spark):
    """A-Res sanity: sampling with weight = n_chars must overrepresent
    long documents — the sample's mean length exceeds the corpus mean
    (deterministic given the md5 uniforms, so this is a fixed fact of
    the fixture, not a flaky statistical assertion)."""
    from database_peak_streaming_spark.operators.sampling import (
        sample_weighted_ares,
    )
    from database_peak_streaming_spark.sources.batch import load_table

    sample = sample_weighted_ares(spark, SF_DIR)
    s_mean = sample.agg(F.avg("n_chars")).first()[0]
    c_mean = (
        load_table(spark, "documents", SF_DIR).agg(F.avg("n_chars")).first()[0]
    )
    assert s_mean > c_mean, (s_mean, c_mean)


def test_bm25_semantics(spark):
    """BM25 invariants on the fixture: every returned doc contains at
    least one query term; scores are positive and non-increasing; and a
    doc matching MORE distinct query terms than another doc of the same
    length profile never scores zero."""
    from database_peak_streaming_spark.operators.text import (
        BM25_TERMS,
        text_bm25_topk,
    )

    rows = text_bm25_topk(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 10
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.bm25 > 0 for r in rows)
    assert all(1 <= r.n_terms_hit <= len(BM25_TERMS) for r in rows)


def test_quantize_int8_error_bounds(spark):
    """Symmetric int8 quantization contract: reconstruction error is
    bounded by half a quantization step (max|err| <= scale/2, so
    max_err_over_scale <= 0.5 + float slack), and RMSE never exceeds the
    max error."""
    from database_peak_streaming_spark.operators.similarity import (
        embedding_quantize_int8,
    )

    rows = embedding_quantize_int8(spark, SF_DIR).collect()
    assert len(rows) == 500
    for r in rows:
        assert r.scale > 0
        assert r.max_err_over_scale <= 0.500001, r
        assert r.rmse_over_scale <= r.max_err_over_scale + 1e-9, r


def test_mixture_weights_reshape_to_target(spark):
    """The defining property of the mixture computation: resampling each
    language slice by its weight yields EXACTLY the target shares
    (weight * actual_share == target_share by construction), and the
    weights are a valid resampling plan (all positive, finite)."""
    from database_peak_streaming_spark.operators.sampling import (
        MIXTURE_TARGET,
        corpus_mixture_weights,
    )

    rows = corpus_mixture_weights(spark, SF_DIR).collect()
    target = dict(MIXTURE_TARGET)
    assert {r.lang for r in rows} == set(target)
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert r.sampling_weight > 0
        achieved = r.sampling_weight * r.n_tokens / total
        assert abs(achieved - target[r.lang]) < 1e-5, r
        assert r.needs_oversample == (r.sampling_weight > 1.0)


def test_novelty_complements_decontamination(spark):
    """Cross-operator coherence: a test-split doc has novelty < 1 iff
    decontaminate_test_overlap flags it (both derive from the same
    8-gram/md5-split definitions), and every test doc long enough to
    have grams appears exactly once in the novelty output."""
    from database_peak_streaming_spark.operators.sampling import (
        decontaminate_test_overlap,
        text_novelty_vs_train,
    )

    nov = {
        r.doc_id: r for r in text_novelty_vs_train(spark, SF_DIR).collect()
    }
    flagged = {
        r.test_doc_id
        for r in decontaminate_test_overlap(spark, SF_DIR).collect()
    }
    assert flagged <= set(nov), "flagged doc missing from novelty output"
    for doc_id, r in nov.items():
        assert (r.novelty < 1.0) == (doc_id in flagged), (doc_id, r)
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_seen <= r.n_grams
