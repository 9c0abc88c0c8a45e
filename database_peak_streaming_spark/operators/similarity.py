"""Similarity search over embeddings (SURVEY.md §2B LLM-data rows;
north-star mandated): brute-force cosine top-k as the exact baseline, and
a bucketed (IVF-style) ANN variant as the scale path.

Embeddings table: (vec_id, embedding array<float> len 64, label).

Scale design:
* Dot products are ``zip_with`` + ``aggregate`` column expressions —
  JVM-side, no Python, no UDF.
* Brute force is O(Q x N): fine when the query set broadcasts (Q small);
  the N-side streams through map tasks, top-k folds through a window.
* The ANN path buckets vectors by a deterministic coarse quantizer
  (argmax dimension here; k-means centroids in production) so each query
  probes ~N/buckets vectors — the IVF trade: recall for a 64x cost cut.
* Norms are precomputed once per side, not per pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table

TOP_K = 5
N_QUERIES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < N_QUERIES (broadcast), ranked
    against the full corpus.  Rank key is (rounded cosine desc, vec_id)
    so ordering is deterministic across engines and partitionings."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("q_id", "rnk")
    )


def _rp_banded_base(e: DataFrame) -> DataFrame:
    """(vec_id, label, embedding, norm, b1, b2): the per-vector state every
    banded pairwise query starts from — norms and band signatures computed
    once per vector, never per pair."""
    return e.select(
        "vec_id",
        "label",
        "embedding",
        _norm(F.col("embedding")).alias("norm"),
        _rp_band(F.col("embedding"), RP_BANDS[0]).alias("b1"),
        _rp_band(F.col("embedding"), RP_BANDS[1]).alias("b2"),
    )


def _banded_pairs(base: DataFrame, band: str, threshold: float) -> DataFrame:
    """Same-label pairs colliding in ``band`` with cosine >= threshold.
    The join key is (label, band) — a bounded LSH bucket, NOT the raw
    label — so pairwise work scales with bucket occupancy.  Cosine is
    computed inside the band join (embeddings are already co-located);
    the cross-band union dedups on the deterministic rounded value."""
    a, b = base.alias("a"), base.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col(f"a.{band}") == F.col(f"b.{band}"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate embedding pairs (cosine >= PAIR_COS_THRESHOLD)
    within the same label, blocked by RP-LSH bands: a pair is examined
    only when it collides in one of the two 2-plane band signatures
    (OR-construction, union of two equi-joins).  A label is NOT a
    bounded block at corpus scale — the band key is, and more planes
    shrink buckets exponentially.  Recall follows the sign-LSH s-curve
    (band match p², either band 1-(1-p²)², p = 1 - angle/pi); the exact
    variant is the brute-force path (``cosine_topk_bruteforce``).  The
    oracle applies the identical fixed-plane band condition, so the
    result is engine-independent."""
    e = load_table(spark, "embeddings", sf_dir)
    base = _rp_banded_base(e)
    return (
        _banded_pairs(base, "b1", PAIR_COS_THRESHOLD)
        .unionByName(_banded_pairs(base, "b2", PAIR_COS_THRESHOLD))
        .distinct()
        .orderBy("vec_a", "vec_b")
    )


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: coarse-quantize every vector to its argmax
    dimension (deterministic stand-in for k-means centroids), then each
    query scans only its own bucket.  Returns top-3 in-bucket neighbors
    per query — the recall/cost trade is visible against
    ``cosine_topk_bruteforce`` in tests."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    bucket = F.array_position(
        F.col("embedding"), F.array_max(F.col("embedding"))
    ).cast("long")
    base = e.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        _norm(F.col("embedding")).alias("norm"),
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    )


#: Random-hyperplane LSH planes: fixed-seed, embedded as literals in both
#: the Spark plan and the SQL oracle, so bucketing is engine-independent.
_N_PLANES = 4
_PLANE_SEED = 20240813

#: The two OR-ed band signatures used to block pairwise cosine work
#: (``cosine_pairs_threshold``, ``dedup_embedding_cosine``): planes are
#: split into bands of 2; a pair is a candidate when it collides in ANY
#: band (the classic LSH OR-construction — band match P = p^2 with
#: p = 1 - angle/pi, either-band P = 1-(1-p^2)^2).
RP_BANDS = ((0, 1), (2, 3))

#: Near-dup pair threshold for ``cosine_pairs_threshold``.  Production
#: corpora use ~0.95; the fixture's max within-label cosine is ~0.475
#: (synthetic vectors, no true dups), so the demonstration threshold
#: sits below that to keep the checked result non-empty.
PAIR_COS_THRESHOLD = 0.35


def _planes() -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(_PLANE_SEED)
    return [[round(float(x), 6) for x in rng.normal(0, 1, 64)] for _ in range(_N_PLANES)]


def _rp_band(col: Column, idxs: tuple[int, ...]) -> Column:
    """Sign-bit band signature of ``col`` over the fixed planes ``idxs`` —
    a pure column expression (JVM-side), identical to ``_rp_band_sql``."""
    planes = _planes()
    return sum(
        (
            F.when(
                _dot(col, F.array(*[F.lit(v) for v in planes[i]])) > 0,
                F.lit(1 << k),
            ).otherwise(F.lit(0))
        )
        for k, i in enumerate(idxs)
    ).cast("long")


def ann_rp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket = sign bits of 4 fixed
    hyperplane projections (a 16-bucket cosine-locality partition of the
    sphere); each query probes only its own bucket.

    The sketch family behind SimHash, applied to dense vectors: P(same
    bit) = 1 - angle/pi, so co-bucket probability decays with angular
    distance.  Scale path: buckets are a plain groupBy key — the probe
    is an equi-join, and more planes = exponentially smaller buckets.
    """
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    bucket = _rp_band(F.col("embedding"), tuple(range(_N_PLANES)))
    base = e.select(
        "vec_id", "embedding", bucket.alias("bucket"), _norm(F.col("embedding")).alias("norm")
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_norm") * F.col("norm"))
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("q_bucket"))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("q_id", "rnk")
    )


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector norm + normalization check — the unit-norm projection every
    cosine pipeline precomputes once."""
    e = load_table(spark, "embeddings", sf_dir)
    norm = _norm(F.col("embedding"))
    return (
        e.select(
            "vec_id",
            "label",
            F.round(norm, 6).alias("l2_norm"),
            F.round(
                _dot(F.col("embedding"), F.col("embedding")) / (norm * norm), 6
            ).alias("self_cosine"),
        )
        .orderBy("vec_id")
    )


QUERIES = {
    "cosine_topk_bruteforce": cosine_topk_bruteforce,
    "cosine_pairs_threshold": cosine_pairs_threshold,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "ann_rp_lsh": ann_rp_lsh,
    "embedding_norms": embedding_norms,
}


def _rp_band_sql(col: str, idxs: tuple[int, ...]) -> str:
    """DuckDB form of ``_rp_band`` — same fixed-plane literals, same
    signature arithmetic, so buckets agree bit-for-bit across engines."""
    planes = _planes()
    terms = []
    for k, i in enumerate(idxs):
        lit = "[" + ", ".join(f"{v}" for v in planes[i]) + "]"
        dot = _DOT.format(a=col, b=lit)
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << k} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _rp_bucket_sql() -> str:
    return _rp_band_sql("embedding", tuple(range(_N_PLANES)))

_DOT = """LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"""


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"SQRT({_DOT.format(a=a, b=a)})"
    nb = f"SQRT({_DOT.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


ORACLE_SQL = {
    "cosine_topk_bruteforce": f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
                   WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   ROUND({_cos_sql('q.q_emb', 'e.embedding')}, 6) AS cosine
            FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
        ranked AS (
            SELECT q_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM scored)
        SELECT q_id, vec_id, cosine, rnk FROM ranked
        WHERE rnk <= {TOP_K} ORDER BY q_id, rnk
    """,
    "cosine_pairs_threshold": f"""
        WITH base AS (
            SELECT vec_id, label, embedding,
                   {_rp_band_sql('embedding', RP_BANDS[0])} AS b1,
                   {_rp_band_sql('embedding', RP_BANDS[1])} AS b2
            FROM embeddings)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
        FROM base a JOIN base b
          ON a.label = b.label AND a.vec_id < b.vec_id
         AND (a.b1 = b.b1 OR a.b2 = b.b2)
        WHERE ROUND({_cos_sql('a.embedding', 'b.embedding')}, 6)
              >= {PAIR_COS_THRESHOLD}
        ORDER BY vec_a, vec_b
    """,
    "ann_ivf_bucketed": f"""
        WITH base AS (
            SELECT vec_id, embedding,
                   CAST(LIST_POSITION(embedding, LIST_MAX(embedding)) AS BIGINT)
                       AS bucket
            FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
              FROM base WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   ROUND({_cos_sql('q.q_emb', 'e.embedding')}, 6) AS cosine
            FROM q JOIN base e ON e.bucket = q.q_bucket
            WHERE e.vec_id <> q.q_id),
        ranked AS (
            SELECT q_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM scored)
        SELECT q_id, vec_id, cosine, rnk FROM ranked
        WHERE rnk <= 3 ORDER BY q_id, rnk
    """,
    "ann_rp_lsh": f"""
        WITH base AS (
            SELECT vec_id, embedding, {_rp_bucket_sql()} AS bucket
            FROM embeddings),
        q AS (SELECT vec_id AS q_id, embedding AS q_emb, bucket AS q_bucket
              FROM base WHERE vec_id < {N_QUERIES}),
        scored AS (
            SELECT q.q_id, e.vec_id,
                   ROUND({_cos_sql('q.q_emb', 'e.embedding')}, 6) AS cosine
            FROM q JOIN base e ON e.bucket = q.q_bucket
            WHERE e.vec_id <> q.q_id),
        ranked AS (
            SELECT q_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, vec_id) AS rnk
            FROM scored)
        SELECT q_id, vec_id, cosine, rnk FROM ranked
        WHERE rnk <= 3 ORDER BY q_id, rnk
    """,
    "embedding_norms": f"""
        SELECT vec_id, label,
               ROUND(SQRT({_DOT.format(a='embedding', b='embedding')}), 6) AS l2_norm,
               ROUND({_DOT.format(a='embedding', b='embedding')}
                     / (SQRT({_DOT.format(a='embedding', b='embedding')})
                        * SQRT({_DOT.format(a='embedding', b='embedding')})), 6)
                   AS self_cosine
        FROM embeddings ORDER BY vec_id
    """,
}
