"""Bit-level / probabilistic data-structure operators: count-min sketch,
exact-distinct bitmaps, and Bloom-filter join pre-filtering.

These are the three workhorse "small state, big data" structures a
100 TB pipeline leans on:

* A **count-min sketch** bounds heavy-hitter counting state to a fixed
  ``depth x width`` grid no matter how large the vocabulary is; the grid
  is mergeable across partitions (cell-wise ``+``), so frequency
  estimation over 100 TB of text is one map-side partial aggregation
  into ``d*w`` cells instead of a vocabulary-sized shuffle.
* A **bitmap index** gives *exact* distinct counts with mergeable state
  (cell-wise ``OR``): 64 user ids per long.  This is the
  Doris/ClickHouse ``bitmap_union`` pattern — unlike HLL it is exact,
  and unlike ``COUNT(DISTINCT)`` its partials combine associatively, so
  re-aggregation across time slices or rollup levels needs no re-scan.
* A **Bloom filter** built from a selective dim-side key set prunes the
  fact-side scan before the join shuffle — the manual form of Spark's
  runtime row-level filtering (``spark.sql.optimizer.runtime
  .bloomFilter.enabled``).  At 100 TB the pruned rows never enter the
  shuffle, which is the whole game.

All hashes derive from md5 (bit-identical across engines), so every
query here carries a full DuckDB oracle — same cells, same bits, same
false positives.  No Python UDFs; everything stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: CMS geometry: small width on purpose at fixture scale so collisions
#: (over-estimates) actually occur and the est >= exact invariant is
#: exercised, not vacuous.  At production scale width ~2^20 keeps the
#: relative error under 1e-4 for billions of tokens in ~32 MB of state.
CMS_DEPTH = 3
CMS_WIDTH = 256

#: Bloom geometry for the prefilter demo (m bits, k probes).
BLOOM_M = 4096
BLOOM_K = 3


def _md5_mod(s, modulus: int):
    """Cross-engine stable hash: first 13 hex digits of md5(s) (52 bits,
    exact in a long) mod ``modulus``.  ``s`` is a string Column; mirrors
    the sampling/dedup md5 convention (sampling.py:_md5_of)."""
    return (
        F.conv(F.substring(F.md5(s.cast("binary")), 1, 13), 16, 10)
        .cast("bigint")
        % modulus
    )


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters over document tokens via a count-min sketch, with
    the exact count alongside so the over-estimate is visible.

    Plan shape (all codegen, no UDFs):
      1. exact token counts — one explode + groupBy (the thing CMS
         replaces at scale; kept here as ground truth),
      2. the sketch — token counts folded into a fixed (depth, cell)
         grid: ``d*w`` rows TOTAL regardless of vocabulary size,
      3. estimate = min over depth rows of the token's cell totals,
      4. top-15 by exact count (deterministic tie-break on token).

    At 100 TB step 1 disappears and step 2 becomes a map-side partial
    into 3x2^20 cells; the grid broadcasts back for estimation.  The
    CMS guarantee (estimate >= exact, always) holds by construction —
    cell totals only ever add counts."""
    from database_peak_streaming_spark.sources.batch import load_table

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))

    depths = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("d")
    token_cells = exact.select("token", "exact_count", depths).withColumn(
        "cell",
        _md5_mod(
            F.concat(F.col("token"), F.lit("#"), F.col("d").cast("string")),
            CMS_WIDTH,
        ),
    )
    cells = token_cells.groupBy("d", "cell").agg(
        F.sum("exact_count").alias("cell_total")
    )
    est = (
        token_cells.select("token", "d", "cell")
        .join(cells, ["d", "cell"])
        .groupBy("token")
        .agg(F.min("cell_total").alias("cms_estimate"))
    )
    return (
        exact.join(est, "token")
        .select("token", "exact_count", "cms_estimate")
        .orderBy(F.desc("exact_count"), "token")
        .limit(15)
    )


def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type via a mergeable bitmap: user
    ids packed 64-per-long (word = id div 64, bit = id mod 64), words
    combined with BIT_OR, cardinality = sum of popcounts.

    Two-level aggregation — (type, word) then (type) — is the scale
    design: the first level is a map-side combine onto at most
    ``max_id/64`` words per type; the second sums popcounts.  Partials
    re-combine associatively (OR), so daily bitmaps roll up to monthly
    without re-scanning raw events — the property COUNT(DISTINCT)
    fundamentally lacks.  ``n_users_exact`` (a plain count-distinct) is
    emitted alongside as the in-query ground truth."""
    from database_peak_streaming_spark.sources.batch import load_table

    ev = load_table(spark, "events", sf_dir).select("event_type", "user_id")
    # SQL-function form: the Python F.shiftleft wrapper takes a literal
    # bit count, but the underlying expression accepts a per-row column.
    word_bit = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT))")
    words = ev.groupBy(
        "event_type", F.expr("user_id DIV 64").alias("word")
    ).agg(F.bit_or(word_bit).alias("mask"))
    bitmap = words.groupBy("event_type").agg(
        F.sum(F.bit_count("mask")).alias("n_users_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return (
        bitmap.join(exact, "event_type")
        .select("event_type", "n_users_bitmap", "n_users_exact")
        .orderBy("event_type")
    )


def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter fact-scan pruning before a selective join, measured:
    suppliers with ``s_acctbal >= 9000`` define the key set; lineitem
    rows are pre-filtered by k=3 md5-derived bit probes into an m=4096
    filter; the query reports exact matches, Bloom passes, false
    positives, and the realized false-positive rate.

    The filter is built as the distinct set of set-bit positions
    (<= k*|keys| ints), collected into ONE sorted array and broadcast —
    at 100 TB that is a few KB riding the task closure while the fact
    scan drops non-matching rows before the join shuffle (the manual
    twin of Spark's runtime bloomFilter rewrite, usable when the
    planner can't inject one, e.g. across a non-equi or pre-aggregated
    boundary).  Bloom filters never miss (every exact match passes by
    construction), so the interesting measured quantity is the false-
    positive cost the pruning pays."""
    from database_peak_streaming_spark.sources.batch import load_table

    sup = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") >= 9000)
    keys = sup.select(F.col("s_suppkey").alias("key")).distinct()

    probes = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("i")
    positions = (
        keys.select("key", probes)
        .withColumn(
            "p",
            _md5_mod(
                F.concat(
                    F.col("key").cast("string"),
                    F.lit("#b"),
                    F.col("i").cast("string"),
                ),
                BLOOM_M,
            ),
        )
        .select("p")
        .distinct()
    )
    filt = positions.agg(F.sort_array(F.collect_list("p")).alias("bits"))
    # Densify ONCE on the 1-row build side: a BLOOM_M-slot boolean array
    # makes each probe an O(1) element_at instead of an O(set bits)
    # array_contains linear scan — at k=3 probes x |fact| rows the scan
    # was ~k * m_set * |fact| comparisons (~2e9 at sf0.1), the dominant
    # cost of the whole query (guide §1.2 step 2: per-task work).  The
    # dense form is what a real Bloom filter broadcasts anyway (a
    # bitmask, not a position list).
    dense = filt.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(BLOOM_M - 1)),
            lambda i: F.array_contains(F.col("bits"), i),
        ).alias("dense")
    )

    # Probe positions are a pure function of the JOIN KEY, so hash the
    # DISTINCT key domain, not every fact row: the fact side collapses
    # to (suppkey, row count) with one map-side-combinable groupBy, and
    # the k digests run once per key instead of once per row (guide §8:
    # decide on small rows, weight the decision back onto the volume —
    # every reported count is a sum of per-key booleans x row counts,
    # so the result is identical term by term).  At sf0.1 this is
    # 1.8M md5 calls -> 3k.
    li = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    probed = li.crossJoin(F.broadcast(dense))
    for i in range(BLOOM_K):
        probed = probed.withColumn(
            f"_p{i}",
            _md5_mod(
                F.concat(F.col("l_suppkey").cast("string"), F.lit(f"#b{i}")),
                BLOOM_M,
            ),
        )
    pass_cond = None
    for i in range(BLOOM_K):
        c = F.element_at(F.col("dense"), F.col(f"_p{i}").cast("int") + 1)
        pass_cond = c if pass_cond is None else (pass_cond & c)

    # exact membership via broadcast left join (the join the filter guards)
    marked = probed.withColumn("bloom_pass", pass_cond).join(
        F.broadcast(keys.withColumn("exact", F.lit(True))),
        probed["l_suppkey"] == F.col("key"),
        "left",
    )
    n = F.col("n_rows")
    return marked.agg(
        F.sum(n).alias("n_fact_rows"),
        F.sum(F.when(F.col("exact"), n).otherwise(0)).alias("n_exact"),
        F.sum(F.when(F.col("bloom_pass"), n).otherwise(0)).alias(
            "n_bloom_pass"
        ),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("exact").isNull(), n).otherwise(
                0
            )
        ).alias("n_false_pos"),
    ).select(
        "n_fact_rows",
        "n_exact",
        "n_bloom_pass",
        "n_false_pos",
        F.round(
            F.col("n_false_pos")
            / F.greatest(F.col("n_fact_rows") - F.col("n_exact"), F.lit(1)),
            6,
        ).alias("fp_rate"),
    )


#: Misra-Gries capacity: guarantees every token with global frequency
#: > N/MG_K survives candidate generation (small on purpose at fixture
#: scale so the summaries actually evict; production k ~ 10^5 keeps the
#: per-partition dict in L2 while bounding the candidate set).
MG_K = 50


def sketch_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (all tokens with frequency > N/k) via the
    two-pass Misra-Gries design — the other classic frequency sketch
    beside the CMS above, and the one whose answer is exact, not an
    over-estimate.

    Pass 1 (candidates): each partition folds its token stream through
    a k-counter Misra-Gries summary inside ONE ``mapInPandas`` iterator
    — state lives across the partition's Arrow batches, output is
    <= k rows per partition no matter the vocabulary.  The averaging
    argument makes the union of partition summaries a SUPERSET of every
    global heavy hitter: count(t) > N/k implies count_p(t) > N_p/k on
    at least one partition, and a locally-(>N_p/k)-frequent token always
    survives local MG.  This is one of the few operators where Python
    state is the right tool: MG's decrement step is inherently
    imperative, and the Arrow batching keeps it off the row-at-a-time
    path.

    Pass 2 (exact): candidates (tiny) broadcast back and the token
    stream is re-counted ONLY for them, then filtered by the exact
    threshold ``count * k > N`` — so partitioning never shows in the
    answer and the DuckDB oracle is a plain GROUP BY/HAVING.

    Scale: pass-1 state is O(k) per task and its output O(k x tasks);
    pass 2 shuffles only candidate-token rows.  The vocabulary-sized
    groupBy the naive form needs never happens."""
    from typing import Iterator

    import pandas as pd

    from database_peak_streaming_spark.sources.batch import load_table

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # WEIGHTED Misra-Gries: each Arrow batch collapses to
        # (token, count) via C-speed value_counts, and the fold ingests
        # weighted arrivals — the per-token Python loop (the round-12
        # measured hot spot, guide §4.2) becomes a per-DISTINCT-token
        # loop.  The superset guarantee is untouched: every overflow
        # subtracts mass m from k+1 counters, so total subtracted mass
        # <= N_p/(k+1) < N_p/k, and any locally-heavy token still
        # survives.  Pass 2 recounts candidates EXACTLY, so the declared
        # result never depends on which superset pass 1 emits.
        counters: dict[str, int] = {}
        for pdf in batches:
            for token, c in pdf["token"].value_counts().items():
                if token in counters:
                    counters[token] += int(c)
                else:
                    counters[token] = int(c)
                    if len(counters) > MG_K:
                        m = min(counters.values())
                        dead = []
                        for t in counters:
                            counters[t] -= m
                            if counters[t] <= 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        yield pd.DataFrame({"token": list(counters.keys())})

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    candidates = (
        tok.mapInPandas(_mg, schema="token string").distinct()
    )
    # total token count WITHOUT a third explode of the corpus: the
    # exploded row count equals the sum of per-doc split sizes
    n_df = docs.select(
        F.size(F.split("text", " ")).cast("long").alias("_sz")
    ).agg(F.sum("_sz").alias("_n"))
    return (
        tok.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .crossJoin(F.broadcast(n_df))
        .where(F.col("exact_count") * MG_K > F.col("_n"))
        .select(
            "token",
            "exact_count",
            F.col("_n").alias("n_tokens_total"),
        )
        .orderBy(F.desc("exact_count"), "token")
    )


def sketch_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4.1 ``approx_top_k`` aggregate (the built-in mergeable
    frequent-items sketch) over the brand column — the engine-native
    sibling of the hand-built Misra-Gries above.  Exercised in its
    EXACT regime: ``maxItemsTracked`` (10k) exceeds the brand
    vocabulary (25), so the sketch never evicts and every returned
    count is the true frequency — which is what makes a full
    cross-engine oracle possible (the oracle is a plain GROUP BY).
    The result is exploded to rows and re-ranked by (freq DESC, item)
    so the sketch's internal tie order never reaches the output.

    Scale: at 100 TB the sketch's state is O(maxItemsTracked) per
    partial, merged tree-wise — the exact regime holds whenever the
    tracked vocabulary is bounded (brands, countries, status codes),
    and degrades gracefully to approximate counts beyond it."""
    from pyspark.sql import Window

    from database_peak_streaming_spark.sources.batch import load_table

    part = load_table(spark, "part", sf_dir).select("p_brand")
    sk = part.agg(F.expr("approx_top_k(p_brand, 100, 10000)").alias("topk"))
    ex = sk.select(F.explode("topk").alias("e")).select(
        F.col("e.item").alias("brand"),
        F.col("e.count").cast("long").alias("freq"),
    )
    w = Window.orderBy(F.desc("freq"), F.asc("brand"))
    return ex.select(
        F.row_number().over(w).cast("long").alias("rank"), "brand", "freq"
    ).orderBy("rank")


QUERIES = {
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "sketch_approx_top_k": sketch_approx_top_k,
    "sketch_mg_heavy_hitters": sketch_mg_heavy_hitters,
    "agg_bitmap_exact_distinct": agg_bitmap_exact_distinct,
    "join_bloom_prefilter": join_bloom_prefilter,
}

_CMS_CELL = (
    "('0x' || substr(md5({expr} || '#' || CAST({d} AS VARCHAR)), 1, 13))"
    "::BIGINT % " + str(CMS_WIDTH)
)

ORACLE_SQL = {
    "sketch_mg_heavy_hitters": f"""
        WITH tok AS (
            SELECT t.token AS token
            FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        ),
        n AS (SELECT COUNT(*) AS n FROM tok)
        SELECT token,
               COUNT(*) AS exact_count,
               CAST(MAX(n.n) AS BIGINT) AS n_tokens_total
        FROM tok, n
        GROUP BY token
        HAVING COUNT(*) * {MG_K} > MAX(n.n)
        ORDER BY exact_count DESC, token
    """,
    "sketch_cms_heavy_hitters": f"""
        WITH tok AS (
            SELECT t.token AS token
            FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
        ),
        exact AS (
            SELECT token, COUNT(*) AS exact_count FROM tok GROUP BY token
        ),
        tc AS (
            SELECT e.token, e.exact_count, d.d,
                   ('0x' || substr(md5(e.token || '#' || CAST(d.d AS VARCHAR)),
                                   1, 13))::BIGINT % {CMS_WIDTH} AS cell
            FROM exact e
            CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS d) d
        ),
        cells AS (
            SELECT d, cell, SUM(exact_count) AS cell_total
            FROM tc GROUP BY d, cell
        ),
        est AS (
            SELECT tc.token, MIN(c.cell_total) AS cms_estimate
            FROM tc JOIN cells c ON c.d = tc.d AND c.cell = tc.cell
            GROUP BY tc.token
        )
        SELECT e.token,
               CAST(e.exact_count AS BIGINT) AS exact_count,
               CAST(est.cms_estimate AS BIGINT) AS cms_estimate
        FROM exact e JOIN est ON e.token = est.token
        ORDER BY e.exact_count DESC, e.token
        LIMIT 15
    """,
    "agg_bitmap_exact_distinct": """
        WITH words AS (
            -- bit 63 special-cased: DuckDB checks signed overflow on
            -- 1<<63 where Spark's shiftleft wraps to min-long; the
            -- intended 64th bit pattern is the same either way.
            SELECT event_type,
                   user_id // 64 AS word,
                   BIT_OR(CASE WHEN user_id % 64 = 63
                               THEN -9223372036854775808
                               ELSE 1::BIGINT << CAST(user_id % 64 AS INT)
                          END) AS mask
            FROM events GROUP BY event_type, user_id // 64
        ),
        bitmap AS (
            SELECT event_type, SUM(bit_count(mask)) AS n_users_bitmap
            FROM words GROUP BY event_type
        ),
        exact AS (
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact
            FROM events GROUP BY event_type
        )
        SELECT b.event_type,
               CAST(b.n_users_bitmap AS BIGINT) AS n_users_bitmap,
               CAST(e.n_users_exact AS BIGINT) AS n_users_exact
        FROM bitmap b JOIN exact e USING (event_type)
        ORDER BY event_type
    """,
    "join_bloom_prefilter": f"""
        WITH keys AS (
            SELECT DISTINCT s_suppkey AS key FROM supplier
            WHERE s_acctbal >= 9000
        ),
        positions AS (
            SELECT DISTINCT
                ('0x' || substr(md5(CAST(key AS VARCHAR) || '#b'
                                    || CAST(i.i AS VARCHAR)), 1, 13))::BIGINT
                % {BLOOM_M} AS p
            FROM keys CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS i) i
        ),
        probed AS (
            SELECT l_suppkey,
                   (('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || '#b0'),
                                    1, 13))::BIGINT % {BLOOM_M}
                        IN (SELECT p FROM positions)
                    AND ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || '#b1'),
                                    1, 13))::BIGINT % {BLOOM_M}
                        IN (SELECT p FROM positions)
                    AND ('0x' || substr(md5(CAST(l_suppkey AS VARCHAR) || '#b2'),
                                    1, 13))::BIGINT % {BLOOM_M}
                        IN (SELECT p FROM positions)) AS bloom_pass,
                   l_suppkey IN (SELECT key FROM keys) AS exact
            FROM lineitem
        )
        SELECT COUNT(*) AS n_fact_rows,
               CAST(SUM(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
               CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_bloom_pass,
               CAST(SUM(CASE WHEN bloom_pass AND NOT exact THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_false_pos,
               ROUND(SUM(CASE WHEN bloom_pass AND NOT exact THEN 1 ELSE 0 END)
                     / GREATEST(COUNT(*) - SUM(CASE WHEN exact THEN 1 ELSE 0 END),
                                1)::DOUBLE, 6) AS fp_rate
        FROM probed
    """,
}

ORACLE_SQL["sketch_approx_top_k"] = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_brand)
                AS BIGINT) AS rank,
           p_brand AS brand, COUNT(*) AS freq
    FROM part GROUP BY p_brand ORDER BY rank
"""
