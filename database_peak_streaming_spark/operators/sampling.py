"""Deterministic sampling / splitting / balancing — the selection ops a
training-data pipeline runs before anything else touches the corpus
(BASELINE.json north star; no reference analogue — the reference's only
selection is the strided downsample at database_peak_streaming.py:52-56,
generalized here from "every Nth row" to content-keyed selections).

Every op here is DETERMINISTIC BY CONTENT, not by RNG: assignment is a
pure function of a stable key (modulus or md5), so it is reproducible
across engines (DuckDB-oracled — md5 is bit-identical everywhere, unlike
each engine's native hash or sampler), across cluster sizes, and across
reruns — the property a training pipeline actually needs from a split
("this doc is ALWAYS in test") that ``df.sample(seed=...)`` cannot give
across engines or partitionings.

Scale notes: all three ops are embarrassingly parallel — a narrow
per-row projection (mod / md5) followed by either a pushed-down filter
(systematic sample), a small-key groupBy (split summary), or a
per-group top-k window (balancing, one shuffle on the class key, state
bounded by k per class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def _md5_of(col: str):
    """Cross-engine stable pseudo-random key: md5 of the decimal string
    form of an integer key.  Spark md5() takes binary; cast via string so
    both engines hash the same bytes."""
    return F.md5(F.col(col).cast("string").cast("binary"))


def sample_systematic_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-20 systematic sample keyed on the order key.  The modulus
    predicate is a row-local projection — no shuffle, no state, and the
    sample of a 100 TB table is a single filtered scan.  Keying on
    l_orderkey (not row position) keeps whole orders together: every
    lineitem of a sampled order is sampled, which is what a pipeline
    sampling *entities* (not rows) wants."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


def split_train_test_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/test split of the document corpus: a doc lands in
    'test' iff the first hex digit of md5(doc_id) is 0 or 1 (expected
    2/16 = 12.5%).  Content-keyed, so the assignment survives re-sharding,
    re-ingestion, and engine changes — no leakage drift between runs.
    Returns the per-doc assignment (the artifact downstream jobs join
    against)."""
    d = load_table(spark, "documents", sf_dir)
    split = F.when(
        F.substring(_md5_of("doc_id"), 1, 1).isin("0", "1"), F.lit("test")
    ).otherwise(F.lit("train"))
    return (
        d.select("doc_id", split.alias("split"), "lang", "n_chars")
        .orderBy("doc_id")
    )


#: cross-validation fold count for ``sample_kfold_assign``
KFOLDS = 5


def sample_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    (first two md5 hex digits of doc_id) mod 5 — the k-way
    generalization of ``split_train_test_md5``'s content-keyed split,
    with the same property that matters at scale: assignment is a pure
    function of the KEY, so folds survive re-sharding, re-ingestion,
    incremental appends, and engine changes (a random split leaks
    between reruns; a partition-id split leaks on every repartition).

    Output is the per-(fold, lang) balance audit a pipeline checks
    before training k models: row counts, char volume, and an exact
    id checksum that makes fold membership itself hash-verifiable —
    plus each fold's share of the corpus (256 % 5 != 0 gives folds
    0-1 a ~0.4% edge; the audit is where that skew becomes visible).

    Scale: one scan, one bounded groupBy (folds x languages); the
    per-doc assignment is a map-only column any downstream join can
    recompute instead of storing."""
    d = load_table(spark, "documents", sf_dir)
    fold = (
        F.conv(F.substring(_md5_of("doc_id"), 1, 2), 16, 10).cast("long")
        % KFOLDS
    )
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        d.select(fold.alias("fold"), "lang", "n_chars", "doc_id")
        .groupBy("fold", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "fold",
            "lang",
            "n_docs",
            "total_chars",
            "id_checksum",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
        )
        .orderBy("fold", "lang")
    )


#: decontamination n-gram width — the standard 8-13 window; 8 fits the
#: fixture's ~54-token docs while matching real pipelines' lower bound.
DECON_NGRAM = 8


def decontaminate_test_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: test-split documents that share at
    least one word 8-gram with any train-split document (the GPT-3 /
    PaLM-style n-gram collision rule), with the evidence counts a
    pipeline reports before dropping or flagging them.

    Shape: per-doc distinct 8-grams (P11 re-slice, no quadratic work)
    -> explode -> test-grams equi-join train-grams on the gram ->
    per-test-doc counts.  The join is a plain shuffle on the gram key,
    so the contamination check over a 100 TB corpus is one
    hash-partitioned join; boilerplate mega-grams skew the key — AQE
    skew-join handles the fixture, and a production run first drops
    grams above a document-frequency cap (they flag everything anyway).
    At scale the join key would be xxhash64(gram) (8-byte shuffle
    width); the oracle keeps the string form so DuckDB joins the same
    values.  (Round 12 measured the hashed-gram + checkpointed-gram-
    table variant at 1.25x WORSE wall and CPU at sf0.1 — the string
    build is cheaper than the per-gram hash fold at fixture row widths
    and the double-scan is cheaper than the materialization — so the
    string form stays; see OPTIMIZATION_r12.md.)"""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    n = DECON_NGRAM
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda j: F.concat_ws(" ", *[toks[j + i] for i in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    split = F.when(
        F.substring(_md5_of("doc_id"), 1, 1).isin("0", "1"), F.lit("test")
    ).otherwise(F.lit("train"))
    # (Round 12 also probed a gram-keyed repartition to share one
    # exchange between the two sides — the PLAN shows why it can't help:
    # the split predicate pushes below the explode, so each side builds
    # grams for a DISJOINT half of the corpus already.  There is no
    # duplicated subtree to deduplicate; the repartition only added
    # exchanges.  Left as the plain filtered join.)
    e = d.select(
        "doc_id",
        split.alias("split"),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )
    te = e.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "gram"
    )
    tr = e.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc_id"), "gram"
    )
    return (
        te.join(tr, "gram")
        .groupBy("test_doc_id")
        .agg(
            F.count_distinct(F.col("train_doc_id")).alias("n_train_docs"),
            F.count_distinct(F.col("gram")).alias("n_shared_ngrams"),
        )
        .orderBy("test_doc_id")
    )


def split_summary_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate view of the md5 split: doc counts and char volume per
    (split, lang) — the sanity check a pipeline materializes next to the
    split itself (class balance across the cut).  Small-key groupBy: one
    shuffle over at most |splits| x |langs| groups."""
    assigned = split_train_test_md5(spark, sf_dir)
    return (
        assigned.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split", "lang")
    )


def balance_by_class_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class balancing: keep exactly 50 customers per market segment,
    chosen by md5 order (deterministic pseudo-random, unbiased w.r.t.
    any business attribute) with the key as tie-break.  One shuffle on
    the class key; the rank-then-filter window keeps O(k) rows per class
    regardless of skew — downsampling a dominant class at 100 TB costs
    the same shuffle as a balanced one."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(_md5_of("c_custkey"), "c_custkey")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("c_mktsegment", "c_custkey", "rn")
        .orderBy("c_mktsegment", "rn")
    )


#: A-Res weighted sampling: 52 bits of md5 as the uniform, sample size k.
ARES_BITS_M = float(16**13)
ARES_K = 50


def sample_weighted_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via A-Res (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row draws u ~ U(0,1) and the k rows with the largest u^(1/w) — here
    ranked by the equivalent key -ln(u)/w ascending, largest-weight-
    favored — form an exact weighted sample.  Weight = n_chars, so
    selection probability tracks document volume (the "sample
    proportional to tokens" draw a data-mixing pipeline uses to build a
    training blend).

    Determinism by content: u derives from 52 bits of md5(doc_id), not
    an RNG, so the SAME sample comes out on any engine, any partitioning
    and any rerun — and the oracle can recompute it exactly.

    Scale: the per-row key is a narrow projection; top-k by key is
    Spark's TakeOrdered pattern (per-partition k, then a k-sized merge
    on the driver) — no global sort materializes, state is O(k)."""
    d = load_table(spark, "documents", sf_dir)
    u = (
        F.conv(F.substring(_md5_of("doc_id"), 1, 13), 16, 10).cast("double")
        + 1.0
    ) / (ARES_BITS_M + 1.0)
    key = -F.log(u) / F.col("n_chars").cast("double")
    return (
        d.select("doc_id", "n_chars", key.alias("k"))
        .orderBy(F.col("k").asc(), "doc_id")
        .limit(ARES_K)
        .select("doc_id", "n_chars", F.round("k", 6).alias("ares_key"))
        .orderBy("doc_id")
    )


def sample_stratified_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: keep ceil(f * n) documents per
    language stratum, chosen by md5 order — every stratum is
    represented at EXACTLY the target fraction (rounded up), unlike
    ``df.sampleBy`` whose per-stratum counts are binomial draws.  The
    deterministic md5 order makes the selection content-keyed: stable
    across engines, partitionings, and reruns.

    The cutoff ceil(n/5) is computed in INTEGER arithmetic
    ((n + 4) div 5), never as ceil(0.2 * n): 0.2 has no exact binary
    representation, so float engines and decimal engines disagree at
    exact-multiple boundaries (0.2 * 35 = 7.000000000000001 -> ceil 8).

    Scale: one shuffle on the stratum key; both window functions
    (row_number, count) share the single partitioning, and the filter
    keeps O(f * n_stratum) rows flowing to the sink."""
    d = load_table(spark, "documents", sf_dir)
    w = Window.partitionBy("lang").orderBy(_md5_of("doc_id"), "doc_id")
    wc = Window.partitionBy("lang")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") <= F.expr("(_n + 4) div 5"))
        .select("doc_id", "lang", "rn")
        .orderBy("lang", "rn")
    )


#: Target language mix for the training blend (shares sum to 1).  Pinned
#: literals — the mix is a data-governance decision made offline, and
#: pinning it keeps the query fully oracle-able.
MIXTURE_TARGET = (
    ("de", 0.15),
    ("en", 0.35),
    ("es", 0.15),
    ("fr", 0.15),
    ("zh", 0.2),
)


#: Temperature for ``corpus_temperature_mixture``: alpha = 0.3 is the
#: XLM-R / mT5 published setting — small enough to visibly up-weight
#: tail sources, large enough that head sources still dominate.
MIX_TEMPERATURE_ALPHA = 0.3


def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled sampling weights per source (Conneau et al.
    XLM-R '19; Xue et al. mT5 '21): q_i proportional to p_i^alpha with
    p_i the source's token share — the standard low-resource-boost
    alternative to `corpus_mixture_weights`' pinned target blend:
    instead of declaring shares, flatten the natural distribution by
    alpha < 1 so tail sources are oversampled smoothly.  Emits the
    natural share, the temperature weight, and the boost factor
    q_i/p_i a sampler applies per source.

    Scale: one tiny-key groupBy over the corpus (map-side combined),
    then window sums over the source vocabulary — the corpus is read
    once.  POWER differs by libm ulps across engines; every published
    double is rounded to 6 decimals, orders of magnitude above that
    noise."""
    d = load_table(spark, "documents", sf_dir)
    by_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    p = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w_all)
    scored = by_src.select(
        "source",
        "n_docs",
        "n_tokens",
        p.alias("p"),
        F.pow(p, F.lit(MIX_TEMPERATURE_ALPHA)).alias("w_raw"),
    )
    q = F.col("w_raw") / F.sum("w_raw").over(w_all)
    return (
        scored.select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("p"), 6).alias("natural_share"),
            F.round(q, 6).alias("temperature_share"),
            F.round(q / F.col("p"), 6).alias("boost_factor"),
        )
        .orderBy("source")
    )


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction: per-language token counts -> the
    per-language sampling weight that reshapes the corpus into a pinned
    target blend (weight = target_share / actual_token_share; weight>1
    means the slice must be oversampled/repeated, <1 downsampled).
    This is the step that turns "we crawled X" into "we train on Y" —
    the DoReMi/Pile-style domain-mixture computation at its simplest.

    Scale: one groupBy on a tiny key (languages) with map-side partial
    counts, one broadcast of the 1-row total — the corpus is read once,
    no wide shuffle.  All shares derive from exact long token counts,
    divided in double with a parenthesization mirrored by the oracle,
    so the output hash-matches bit-for-bit.
    """
    d = load_table(spark, "documents", sf_dir)
    by_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    total = by_lang.agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    target = F.create_map(
        *[x for k, v in MIXTURE_TARGET for x in (F.lit(k), F.lit(v))]
    )
    share = F.col("n_tokens").cast("double") / F.col("total_tokens")
    tgt = F.coalesce(target[F.col("lang")], F.lit(0.0))
    return (
        by_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(share, 6).alias("token_share"),
            tgt.alias("target_share"),
            F.round(tgt / share, 6).alias("sampling_weight"),
            (tgt / share > 1.0).alias("needs_oversample"),
        )
        .orderBy("lang")
    )


def text_novelty_vs_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-test-document n-gram NOVELTY against the train split: the
    fraction of a doc's distinct word 8-grams that appear in NO train
    document — the complement of decontaminate_test_overlap's collision
    counts, and the metric eval-set curation actually thresholds on
    (novelty 1.0 = clean held-out; low novelty = leaked/boilerplate).

    Shape: the same per-doc distinct-gram explode, but the train side
    collapses to a DISTINCT gram SET first and the membership test is a
    left-SEMI join — the probe never multiplies by train-side document
    frequency, so a boilerplate gram shared by a million train docs
    costs one match, not a million rows (the decontaminate query keeps
    the per-train-doc fan-out deliberately, for its evidence counts).
    Zero-overlap docs are preserved by the left join (novelty 1.0)."""
    d = load_table(spark, "documents", sf_dir)
    toks = F.split(F.col("text"), " ")
    n = DECON_NGRAM
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda j: F.concat_ws(" ", *[toks[j + i] for i in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    split = F.when(
        F.substring(_md5_of("doc_id"), 1, 1).isin("0", "1"), F.lit("test")
    ).otherwise(F.lit("train"))
    e = d.select(
        "doc_id",
        split.alias("split"),
        F.explode(F.array_distinct(grams)).alias("gram"),
    )
    test_g = e.filter(F.col("split") == "test").select("doc_id", "gram")
    train_set = (
        e.filter(F.col("split") == "train").select("gram").distinct()
    )
    seen = (
        test_g.join(train_set, "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_seen"))
    )
    totals = test_g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return (
        totals.join(seen, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
            F.round(
                1.0 - F.coalesce("n_seen", F.lit(0)) / F.col("n_grams"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


def source_lang_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of each source's language mix against
    the corpus-wide distribution — the drift detector a multi-feed
    ingest pipeline alarms on (a source whose chi2 jumps started
    sending different-language content).

    Expected cell counts need the FULL source x lang grid (a language a
    source never emits still contributes its expected mass), so the
    grid is a crossJoin of the two tiny dimension tables with observed
    counts left-joined on.  Every input is an exact long; chi2 is a
    5-term double fold per source, rounded to 6dp.  Output: per-source
    doc count, degrees of freedom, and the statistic."""
    d = load_table(spark, "documents", sf_dir).select("source", "lang")
    n_total = d.agg(F.count(F.lit(1)).cast("double").alias("n_corpus"))
    lang_n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    src_n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    obs = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_obs"))
    grid = (
        src_n.crossJoin(F.broadcast(lang_n))
        .crossJoin(F.broadcast(n_total))
        .join(obs, ["source", "lang"], "left")
        .select(
            "source",
            "n_src",
            (
                (F.col("n_src") * F.col("n_lang")) / F.col("n_corpus")
            ).alias("expected"),
            F.coalesce("n_obs", F.lit(0)).alias("observed"),
        )
    )
    return (
        grid.groupBy("source")
        .agg(
            F.min("n_src").alias("n_docs"),
            (F.count(F.lit(1)) - 1).cast("int").alias("df"),
            F.round(
                F.sum(
                    (F.col("observed") - F.col("expected"))
                    * (F.col("observed") - F.col("expected"))
                    / F.col("expected")
                ),
                6,
            ).alias("chi2"),
        )
        .orderBy("source")
    )


#: Poisson(1) bootstrap: replicate count and the inverse-CDF ladder
#: (cumulative e^-1 / k! partial sums as exact double literals — both
#: engines compare the SAME uniform against the SAME thresholds, so the
#: replicate weights are bit-identical).  40 reps puts the 2.5%/97.5%
#: order statistics at clean ranks (2 and 39).
BOOT_REPS = 40
_POISSON_CDF = [
    0.36787944117144233,  # P(X <= 0)
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,  # P(X <= 5); tail mass 5.9e-4 -> w = 6
]

#: The same ladder as exact u32 thresholds: ``u = c / 2^32 < cdf_k``
#: (c the raw 32-bit draw, an exact double) is equivalent to
#: ``c < ceil(cdf_k * 2^32)`` because c is an integer and the product
#: is never one (each cdf_k double keeps fraction bits below 2^-32).
#: Comparing the long directly removes a per-row division + double
#: compare from the 6M-row fan-out without moving a single weight.
def _u32_thresholds(cdf: list[float]) -> list[int]:
    from fractions import Fraction

    out = []
    for t in cdf:
        exact = Fraction(t) * (1 << 32)
        assert exact.denominator > 1, "threshold landed on an integer"
        out.append(int(exact) + 1)  # ceil of a non-integer rational
    return out


_POISSON_CDF_U32 = _u32_thresholds(_POISSON_CDF)


def bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for the mean order value —
    THE distributed bootstrap (Chamandy et al., "Estimating uncertainty
    for massive data streams", Google 2012; resampling n rows with
    replacement is impossible at 100 TB, but Binomial(n, 1/n) ->
    Poisson(1) per-row replicate weights stream in one pass).

    Every (row, replicate) weight derives from md5 through the Poisson
    inverse-CDF ladder — content-keyed like every sampler here, so the
    interval is identical on any engine/partitioning and the oracle
    recomputes it exactly.  Replicate sums use exact decimal
    accumulation (the operators/common.py float discipline); the final
    mean is ONE double division of identical numerator/denominator, so
    no cross-engine float drift exists anywhere.

    Hashing is amortized 4-to-1: one md5 per (row, rep-GROUP) yields
    four independent 32-bit uniforms (8 hex digits each), so 40
    replicates cost 10 digests per row, not 40 — md5 dominated the
    profile (6 s of 13.9 s at sf0.1), and the uniform is additionally
    MATERIALIZED in a projection before the CASE ladder so the digest
    is computed once, not once per WHEN branch (Catalyst does not CSE
    across conditional branches).  32-bit granularity (2^-32) is far
    below the ladder thresholds' resolution and identical in both
    engines.  Together: 13.9 s -> ~3.5 s at sf0.1.

    Round-12 per-task-work cuts (guide §1.2 step 2), both provably
    bit-identical to the decimal/double form the oracle evaluates:

    * weights compare the RAW 32-bit integer against precomputed
      integer thresholds ``ceil(cdf_k * 2^32)`` instead of dividing
      every row by 2^32 first — ``c / 2^32 < cdf_k  <=>  c <
      ceil(cdf_k * 2^32)`` exactly (c integer, the product never an
      integer), so 6M divisions + double compares become long
      compares;
    * replicate sums accumulate EXACT LONG CENTS instead of
      decimal(28,6) (BigDecimal addition per row, off the codegen
      fast path).  The fixture prices are 2-decimal-place values
      (pinned by test), so cents are exact; ``sum(w*x_cents) <=
      6 * 5e7 * n_rows`` stays under 2^53 through ~3e6 rows per
      replicate, where cast-to-double is EXACT, and the final
      ``(cents as double) / 100.0 / sw`` is the same correctly-
      rounded double as ``(decimal as double) / sw``.  Beyond 2^53
      cents per replicate a production run switches the sum back to
      decimal; the crossover is noted, not silently wrong (the cast
      itself stays correctly rounded — only double-vs-single
      rounding of the /100 differs out there).

    Plan: one fan-out of REPS rows per order (map-side), one 40-key
    aggregation, a 40-row sort for the order statistics — the heavy
    part is embarrassingly parallel and the state is O(REPS)."""
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(28,6)") * 100)
        .cast("long")
        .alias("xc"),
    )
    # two-level fan-out: the digest is a column of the 10-rows-per-order
    # intermediate, so each md5 is COMPUTED once and replicated by the
    # second explode (a single 40-way explode would re-evaluate the
    # digest expression on all 40 rows — measured 6.8 s vs 4.8 s)
    g = o.select(
        "o_orderkey",
        "xc",
        F.explode(
            F.sequence(F.lit(0), F.lit(BOOT_REPS // 4 - 1))
        ).alias("rg"),
    ).withColumn(
        "h",
        F.md5(
            F.concat(
                F.lit("boot#"),
                F.col("rg").cast("string"),
                F.lit("#"),
                F.col("o_orderkey").cast("string"),
            ).cast("binary")
        ),
    )
    r = (
        g.select(
            "o_orderkey",
            "xc",
            "rg",
            "h",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
        )
        .withColumn("rep", F.col("rg") * 4 + F.col("j"))
        .withColumn(
            "c",
            F.conv(
                F.substr(F.col("h"), F.col("j") * 8 + 1, F.lit(8)), 16, 10
            ).cast("long"),
        )
    )
    c = F.col("c")
    w = F.lit(len(_POISSON_CDF))
    for k in range(len(_POISSON_CDF) - 1, -1, -1):
        w = F.when(c < F.lit(_POISSON_CDF_U32[k]), F.lit(k)).otherwise(w)
    means = (
        r.withColumn("w", w.cast("long"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("w") * F.col("xc")).alias("swxc"),
            F.sum("w").alias("sw"),
        )
        .select(
            "rep",
            (
                F.col("swxc").cast("double") / F.lit(100.0) / F.col("sw")
            ).alias("m"),
        )
    )
    ranked = means.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "rep"))
    )
    ci = ranked.agg(
        F.count(F.lit(1)).alias("n_reps"),
        F.round(F.sum(F.when(F.col("rn") == 2, F.col("m"))), 6).alias(
            "ci_lo"
        ),
        F.round(
            F.sum(F.when(F.col("rn") == BOOT_REPS - 1, F.col("m"))), 6
        ).alias("ci_hi"),
    )
    full = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(
            F.sum("xc").cast("double") / F.lit(100.0) / F.count(F.lit(1)), 6
        ).alias("mean_full"),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n_rows", "mean_full", "n_reps", "ci_lo", "ci_hi"
    )


QUERIES = {
    "bootstrap_ci_mean": bootstrap_ci_mean,
    "source_lang_drift_chi2": source_lang_drift_chi2,
    "sample_systematic_mod": sample_systematic_mod,
    "sample_weighted_ares": sample_weighted_ares,
    "sample_stratified_fraction": sample_stratified_fraction,
    "split_train_test_md5": split_train_test_md5,
    "sample_kfold_assign": sample_kfold_assign,
    "split_summary_md5": split_summary_md5,
    "balance_by_class_topk": balance_by_class_topk,
    "decontaminate_test_overlap": decontaminate_test_overlap,
    "text_novelty_vs_train": text_novelty_vs_train,
    "corpus_mixture_weights": corpus_mixture_weights,
    "corpus_temperature_mixture": corpus_temperature_mixture,
}

_MIX_TGT_SQL = (
    "CASE lang "
    + " ".join(
        f"WHEN '{k}' THEN CAST({v} AS DOUBLE)" for k, v in MIXTURE_TARGET
    )
    + " ELSE CAST(0.0 AS DOUBLE) END"
)

_DECON_GRAM_SQL = " || ' ' || ".join(
    f"t[i + {k}]" for k in range(DECON_NGRAM)
)

#: Poisson inverse-CDF ladder rendered as SQL (same double literals the
#: Spark plan compares against, so weights match bit-for-bit).
_POISSON_LADDER_SQL = (
    "CASE "
    + " ".join(
        f"WHEN u < {c!r} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    + f" ELSE {len(_POISSON_CDF)} END"
)


ORACLE_SQL = {
    "bootstrap_ci_mean": f"""
        WITH r AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(28,6)) AS x,
                   UNNEST(RANGE(0, {BOOT_REPS})) AS rep
            FROM orders),
        wtd AS (
            SELECT rep, x,
                   {_POISSON_LADDER_SQL} AS w
            FROM (
                SELECT rep, x,
                       ('0x' || SUBSTR(
                            MD5('boot#' || CAST(CAST(FLOOR(rep / 4) AS INT)
                                 AS VARCHAR)
                                 || '#' || CAST(o_orderkey AS VARCHAR)),
                            CAST((rep % 4) * 8 + 1 AS INT), 8)
                       )::BIGINT / 4294967296.0 AS u
                FROM r)),
        means AS (
            SELECT rep,
                   CAST(SUM(w * x) AS DOUBLE) / SUM(w) AS m
            FROM wtd GROUP BY rep),
        ranked AS (
            SELECT m, ROW_NUMBER() OVER (ORDER BY m, rep) AS rn
            FROM means),
        ci AS (
            SELECT COUNT(*) AS n_reps,
                   ROUND(SUM(CASE WHEN rn = 2 THEN m END), 6) AS ci_lo,
                   ROUND(SUM(CASE WHEN rn = {BOOT_REPS - 1} THEN m END), 6)
                       AS ci_hi
            FROM ranked),
        whole AS (
            SELECT COUNT(*) AS n_rows,
                   ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                              AS DOUBLE) / COUNT(*), 6) AS mean_full
            FROM orders)
        SELECT n_rows, mean_full, n_reps, ci_lo, ci_hi
        FROM whole CROSS JOIN ci
    """,
    "source_lang_drift_chi2": """
        WITH d AS (SELECT source, lang FROM documents),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_corpus FROM d),
        ln_ AS (SELECT lang, COUNT(*) AS n_lang FROM d GROUP BY lang),
        sn AS (SELECT source, COUNT(*) AS n_src FROM d GROUP BY source),
        obs AS (SELECT source, lang, COUNT(*) AS n_obs
                FROM d GROUP BY source, lang),
        grid AS (
            SELECT sn.source, sn.n_src,
                   (sn.n_src * ln_.n_lang) / (SELECT n_corpus FROM n)
                       AS expected,
                   COALESCE(o.n_obs, 0) AS observed
            FROM sn CROSS JOIN ln_
            LEFT JOIN obs o ON o.source = sn.source AND o.lang = ln_.lang)
        SELECT source,
               MIN(n_src) AS n_docs,
               CAST(COUNT(*) - 1 AS INT) AS df,
               ROUND(SUM((observed - expected) * (observed - expected)
                         / expected), 6) AS chi2
        FROM grid
        GROUP BY source
        ORDER BY source
    """,
    "text_novelty_vs_train": f"""
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0', '1')
                        THEN 'test' ELSE 'train' END AS split,
                   LIST_DISTINCT(
                       CASE WHEN LEN(t) >= {DECON_NGRAM}
                            THEN LIST_TRANSFORM(
                                RANGE(1, LEN(t) - {DECON_NGRAM - 2}),
                                i -> {_DECON_GRAM_SQL})
                            ELSE [] END) AS grams
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
                  FROM documents)),
        e AS (SELECT doc_id, split, UNNEST(grams) AS gram FROM g),
        train_set AS (SELECT DISTINCT gram FROM e WHERE split = 'train'),
        test_g AS (SELECT doc_id, gram FROM e WHERE split = 'test'),
        seen AS (
            SELECT doc_id, COUNT(*) AS n_seen
            FROM test_g WHERE gram IN (SELECT gram FROM train_set)
            GROUP BY doc_id),
        totals AS (
            SELECT doc_id, COUNT(*) AS n_grams FROM test_g GROUP BY doc_id)
        SELECT t.doc_id, t.n_grams,
               COALESCE(s.n_seen, 0) AS n_seen,
               ROUND(1.0 - COALESCE(s.n_seen, 0) / t.n_grams, 6) AS novelty
        FROM totals t LEFT JOIN seen s USING (doc_id)
        ORDER BY t.doc_id
    """,
    "decontaminate_test_overlap": f"""
        WITH g AS (
            SELECT doc_id,
                   CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1)
                             IN ('0', '1')
                        THEN 'test' ELSE 'train' END AS split,
                   LIST_DISTINCT(
                       CASE WHEN LEN(t) >= {DECON_NGRAM}
                            THEN LIST_TRANSFORM(
                                RANGE(1, LEN(t) - {DECON_NGRAM - 2}),
                                i -> {_DECON_GRAM_SQL})
                            ELSE [] END) AS grams
            FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS t
                  FROM documents)),
        e AS (SELECT doc_id, split, UNNEST(grams) AS gram FROM g)
        SELECT te.doc_id AS test_doc_id,
               COUNT(DISTINCT tr.doc_id) AS n_train_docs,
               COUNT(DISTINCT te.gram) AS n_shared_ngrams
        FROM e te
        JOIN e tr ON te.gram = tr.gram
        WHERE te.split = 'test' AND tr.split = 'train'
        GROUP BY te.doc_id
        ORDER BY te.doc_id
    """,
    "sample_weighted_ares": f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        ::UBIGINT + 1.0) / ({ARES_BITS_M} + 1.0))
                   / CAST(n_chars AS DOUBLE) AS k
            FROM documents),
        top AS (
            SELECT doc_id, n_chars, round(k, 6) AS ares_key
            FROM keyed ORDER BY k ASC, doc_id LIMIT {ARES_K})
        SELECT doc_id, n_chars, ares_key FROM top ORDER BY doc_id
    """,
    "sample_stratified_fraction": """
        WITH k AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
                   count(*) OVER (PARTITION BY lang) AS n
            FROM documents)
        SELECT doc_id, lang, rn FROM k
        WHERE rn <= (n + 4) // 5
        ORDER BY lang, rn
    """,
    "sample_systematic_mod": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_orderkey % 20 = 0
        ORDER BY l_orderkey, l_linenumber
    """,
    "split_train_test_md5": """
        SELECT doc_id,
               CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                    THEN 'test' ELSE 'train' END AS split,
               lang, n_chars
        FROM documents
        ORDER BY doc_id
    """,
    "split_summary_md5": """
        SELECT CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                    THEN 'test' ELSE 'train' END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        FROM documents
        GROUP BY 1, 2
        ORDER BY split, lang
    """,
    "balance_by_class_topk": """
        SELECT c_mktsegment, c_custkey, rn
        FROM (
            SELECT c_mktsegment, c_custkey,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY MD5(CAST(c_custkey AS VARCHAR)), c_custkey
                   ) AS INTEGER) AS rn
            FROM customer
        )
        WHERE rn <= 50
        ORDER BY c_mktsegment, rn
    """,
    # Mirrors corpus_mixture_weights arithmetic (exact long counts; the
    # double divisions keep the same parenthesization).
    "corpus_mixture_weights": f"""
        WITH by_lang AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY lang),
        tot AS (
            SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM by_lang)
        SELECT lang, n_docs, n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE) / total_tokens, 6)
                   AS token_share,
               {_MIX_TGT_SQL} AS target_share,
               ROUND(({_MIX_TGT_SQL})
                     / (CAST(n_tokens AS DOUBLE) / total_tokens), 6)
                   AS sampling_weight,
               (({_MIX_TGT_SQL})
                / (CAST(n_tokens AS DOUBLE) / total_tokens)) > 1.0
                   AS needs_oversample
        FROM by_lang CROSS JOIN tot ORDER BY lang
    """,
}

ORACLE_SQL["sample_kfold_assign"] = f"""
    WITH assigned AS (
        SELECT ((STRPOS('0123456789abcdef',
                        SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                    * 16
                + (STRPOS('0123456789abcdef',
                          SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
               % {KFOLDS} AS fold,
               lang, n_chars, doc_id
        FROM documents),
    total AS (SELECT COUNT(*) AS n_total FROM documents)
    SELECT fold, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
           ROUND(COUNT(*) * 1.0 / ANY_VALUE(n_total), 6) AS share
    FROM assigned CROSS JOIN total
    GROUP BY fold, lang
    ORDER BY fold, lang
"""

ORACLE_SQL["corpus_temperature_mixture"] = f"""
    WITH by_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source),
    scored AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p,
               POWER(CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER (),
                     {MIX_TEMPERATURE_ALPHA}) AS w_raw
        FROM by_src)
    SELECT source, n_docs, n_tokens,
           ROUND(p, 6) AS natural_share,
           ROUND(w_raw / SUM(w_raw) OVER (), 6) AS temperature_share,
           ROUND((w_raw / SUM(w_raw) OVER ()) / p, 6) AS boost_factor
    FROM scored
    ORDER BY source
"""

#: Survey budget for the Neyman allocation demo: the n a pipeline can
#: afford to label/inspect; allocation shares are budget-independent.
NEYMAN_BUDGET = 1000


def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION of a labeling/inspection budget across
    strata (Neyman 1934 — the survey-sampling result): for a fixed
    total n, the variance-minimizing stratified sample takes
    n_h proportional to N_h * S_h, so big AND volatile strata get more
    budget — versus proportional allocation's N_h only.  This is how a
    data-quality team sizes per-source audit samples; the emitted
    ratio n_neyman / n_proportional is the per-stratum correction.

    One (stratum) pass of exact cent moments (n, sum, sum-of-squares)
    gives N_h and S_h; allocation arithmetic runs over the stratum
    vocabulary with window totals.  S_h expands from exact BIGINTs so
    both engines divide identical doubles."""
    ev = load_table(spark, "events", sf_dir).select(
        F.col("event_type").alias("stratum"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cells = ev.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("ss"),
    )
    nh = F.col("nh").cast("double")
    mean = F.col("s") / (100.0 * nh)
    var = (F.col("ss") / 10000.0 - nh * mean * mean) / (nh - 1)
    scored = cells.select(
        "stratum", "nh", F.sqrt(var).alias("sd")
    ).select("stratum", "nh", "sd", (F.col("nh") * F.col("sd")).alias("w"))
    w_all = Window.partitionBy()
    neyman = F.lit(NEYMAN_BUDGET) * F.col("w") / F.sum("w").over(w_all)
    prop = (
        F.lit(NEYMAN_BUDGET)
        * F.col("nh").cast("double")
        / F.sum("nh").over(w_all)
    )
    return (
        scored.select(
            "stratum",
            F.col("nh").cast("long").alias("n_stratum"),
            F.round(F.col("sd"), 6).alias("stddev"),
            F.round(neyman, 6).alias("n_neyman"),
            F.round(prop, 6).alias("n_proportional"),
            F.round(neyman / prop, 6).alias("allocation_ratio"),
        )
        .orderBy("stratum")
    )


QUERIES["sample_neyman_allocation"] = sample_neyman_allocation
ORACLE_SQL["sample_neyman_allocation"] = f"""
    WITH cells AS (
        SELECT event_type AS stratum, COUNT(*) AS nh,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s,
               SUM(CAST(ROUND(value * 100, 0) AS BIGINT)
                   * CAST(ROUND(value * 100, 0) AS BIGINT)) AS ss
        FROM events GROUP BY event_type),
    scored AS (
        SELECT stratum, nh,
               SQRT((ss / 10000.0
                     - nh * (s / (100.0 * nh)) * (s / (100.0 * nh)))
                    / (nh - 1)) AS sd
        FROM cells),
    wsum AS (
        SELECT *, nh * sd AS w,
               SUM(nh * sd) OVER () AS tw,
               SUM(nh) OVER () AS tn
        FROM scored)
    SELECT stratum,
           CAST(nh AS BIGINT) AS n_stratum,
           ROUND(sd, 6) AS stddev,
           ROUND({NEYMAN_BUDGET} * w / tw, 6) AS n_neyman,
           ROUND({NEYMAN_BUDGET} * CAST(nh AS DOUBLE) / tn, 6)
               AS n_proportional,
           ROUND(({NEYMAN_BUDGET} * w / tw)
                 / ({NEYMAN_BUDGET} * CAST(nh AS DOUBLE) / tn), 6)
               AS allocation_ratio
    FROM wsum
    ORDER BY stratum
"""
