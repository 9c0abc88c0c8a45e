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


def ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING for contrastive training (the DPR /
    Contriever recipe): for one anchor per label, the top-5 most
    similar vectors with a DIFFERENT label — maximally confusable
    negatives, the pairs that actually move an embedding model (random
    negatives are trivially separable).

    Same exact-bruteforce shape as ``cosine_topk_bruteforce`` (tiny
    broadcast anchor set, corpus streams through the scan, rounded-
    cosine + id rank so ordering is engine-exact); the label filter is
    the only difference — at production scale the anchor set is still
    small per batch and the corpus side would swap in the IVF/LSH
    bucketed probe exactly as the ANN family does."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    w0 = Window.partitionBy("label").orderBy("vec_id")
    anchors = (
        base.withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("label").alias("q_label"),
            F.col("embedding").alias("q_emb"),
            F.col("norm").alias("q_norm"),
        )
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id")
    )
    return (
        base.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("q_label"))
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(cos, 6).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("q_label", "rnk")
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


def _bucket_probe_topk(
    e: DataFrame, bucket: Column, k: int = 3, checkpoint: bool = False
) -> DataFrame:
    """The IVF probe join every bucketed ANN variant shares: assign each
    vector a ``bucket``, broadcast the query set, equi-join on bucket
    equality (each query scans only its own cell), rank by cosine.  The
    quantizer is the only thing that varies — argmax dim, RP-LSH sign
    bits, or trained k-means centroids.

    ``checkpoint=True`` localCheckpoints the assigned base (round 12,
    guide §2.4/§4.4 analogue): ``bucket`` is the probe join's equi-key,
    so Catalyst infers ``isnotnull(bucket)`` and pushes the WHOLE
    quantizer expression below the scan's repartition — for the k-means
    variant that re-evaluated all 8 zip_with dot products per row a
    second time, single-threaded in the one-row-group scan stage, and
    copied the 8x64 literal matrix into five plan nodes (planning
    cost).  After the cut, assignment runs exactly once post-fan-out,
    the inferred filter tests a materialized column, and the query side
    reads the checkpoint instead of re-scanning parquet.  Rows are
    narrow (id, DIM floats, bucket, norm) — corpus-scan-sized, never
    pair-sized.  Paired A/B at sf0.1: 0.79x wall / 0.78x CPU for the
    k-means quantizer, but 1.04x/1.33x for argmax and 0.95x/1.27x for
    RP-LSH — the cheap quantizers lose (materialization costs more
    than their duplicated expression), so the cut is opt-in and only
    the trained-centroid variant takes it."""
    from pyspark.sql import Window

    base = e.select(
        "vec_id",
        "embedding",
        bucket.alias("bucket"),
        _norm(F.col("embedding")).alias("norm"),
    )
    if checkpoint:
        base = base.localCheckpoint()
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
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def ann_ivf_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style bucketed ANN: coarse-quantize every vector to its argmax
    dimension (deterministic stand-in; ``ann_ivf_kmeans`` is the trained
    form), then each query scans only its own bucket.  Returns top-3
    in-bucket neighbors per query — the recall/cost trade is visible
    against ``cosine_topk_bruteforce`` in tests."""
    e = load_table(spark, "embeddings", sf_dir)
    bucket = F.array_position(
        F.col("embedding"), F.array_max(F.col("embedding"))
    ).cast("long")
    return _bucket_probe_topk(e, bucket)


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
    e = load_table(spark, "embeddings", sf_dir)
    bucket = _rp_band(F.col("embedding"), tuple(range(_N_PLANES)))
    return _bucket_probe_topk(e, bucket)


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@3 of every bucketed ANN quantizer against the
    exact brute-force ranking — the audit that turns "approximate"
    into a number before a pipeline swaps the cheap probe in (the
    recall/cost trade each ANN docstring claims, here measured in one
    query).  One row per quantizer: hits over the 8 queries x top-3
    and the recall they imply.

    Shape: each variant is the SAME probe join as its own registered
    query (broadcast query block, bucket equi-join), intersected with
    the brute-force top-3 on (q_id, vec_id) — three 1-row aggregates
    unioned, all exact integer counts."""
    e = load_table(spark, "embeddings", sf_dir)
    bf = (
        cosine_topk_bruteforce(spark, sf_dir)
        .filter(F.col("rnk") <= 3)
        .select("q_id", "vec_id")
    )
    argmax_bucket = F.array_position(
        F.col("embedding"), F.array_max(F.col("embedding"))
    ).cast("long")
    variants = [
        ("ivf_argmax", argmax_bucket),
        ("ivf_kmeans", _kmeans_bucket(F.col("embedding"))),
        ("rp_lsh", _rp_band(F.col("embedding"), tuple(range(_N_PLANES)))),
    ]
    out = None
    for name, bucket in variants:
        # No checkpoint here even for the k-means variant (round 12,
        # measured): the audit's wall is dominated by the brute-force
        # arm, so the cut that wins 0.79x in ann_ivf_kmeans measured
        # exactly neutral in this composition (0.999x wall, 1.006x CPU).
        ann = _bucket_probe_topk(e, bucket)
        row = (
            ann.join(bf, ["q_id", "vec_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            .select(
                F.lit(name).alias("variant"),
                "n_hits",
                F.round(
                    F.col("n_hits") / F.lit(float(N_QUERIES * 3)), 6
                ).alias("recall_at_3"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("variant")


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



# -- IVF with a trained coarse quantizer (the production path) -----------

#: 8 k-means centroids for the IVF coarse quantizer, trained OFFLINE on
#: the 500-vector corpus sample (Lloyd's algorithm, seed 20260813, run
#: to convergence — max centroid shift 0 after 14 iterations; bucket
#: occupancy 53-71 of 500, balanced).  Pinning trained centroids as
#: literals IS the production IVF pattern: the quantizer is trained once
#: on a sample (see :func:`train_ivf_centroids` for the distributed
#: form), then applied to the full corpus as a pure column expression —
#: retraining cadence is a corpus-drift decision, not per-query.  Pinned
#: literals also make assignment engine-independent, so the query is
#: fully oracle-able.
_KMEANS_CENTROIDS: list[list[float]] = [
    [
        -0.052467, 0.028241, -0.052728, -0.014218, -0.011683, -0.003376,
        0.017188, 0.038193, -0.032457, -0.05517, 0.02212, -0.03595, -0.0594,
        -0.055015, 0.025233, -0.013831, 0.030539, -0.035316, -0.059123,
        0.001616, -0.078081, 0.024037, 0.002173, -0.084888, 0.011945, 0.020917,
        -0.015218, -0.038351, -0.011078, -0.002939, -0.032455, 0.001707,
        -0.053817, -0.025259, -0.032309, -0.027588, 0.009138, 1.4e-05, 0.025123,
        0.039307, 0.074806, -0.008194, 0.017298, 0.001333, -0.063509, 0.017575,
        -0.009482, 0.001661, -0.063683, -0.022578, 0.009375, -0.014952,
        -0.018889, 0.018111, 0.001512, 0.004547, 0.009213, 0.002577, 0.017053,
        0.027584, -0.015364, -0.018472, 0.011787, -0.052063
    ],
    [
        0.034414, -0.015742, 0.052667, -0.016685, 0.004377, 0.058298, 0.033792,
        0.057024, -0.005253, -0.05096, 0.031998, 0.039249, 0.053573, 0.02233,
        0.012997, 0.016855, -0.005405, -0.00537, -0.01773, 0.030419, -0.050258,
        0.00465, -0.039094, -0.061937, 0.018839, -0.049951, 0.028441, 0.039396,
        0.013841, -0.005725, -0.008516, 0.035983, 0.026007, 0.029713, -0.089774,
        -0.005031, 0.006505, 0.047199, 0.01451, 0.042015, -0.019591, -0.025837,
        -0.025081, 0.038831, 0.010972, -0.045732, -0.010156, 0.0487, 0.026455,
        -0.007223, 0.014682, 0.023305, 0.051002, -0.000346, 0.035281, -0.001289,
        -0.010041, -0.03707, -0.012595, -0.011694, -0.013661, 0.012477,
        -0.017862, 0.017351
    ],
    [
        -0.026783, 0.039788, 0.065063, -0.023381, 0.028429, 0.023912, 0.035874,
        -0.00278, -0.055555, 0.020257, 0.037662, -0.013853, 0.032873, -0.013007,
        -0.009034, -0.02147, 0.021745, -0.065532, -0.013928, 0.041143, 0.048372,
        0.050902, 0.000255, 0.031384, 0.013031, -0.030618, 0.000684, 0.041438,
        -0.016388, -0.004712, 0.018256, -0.078884, -3.9e-05, 0.058492, 0.037269,
        -0.027148, -0.023443, 0.024162, -0.03083, -0.023183, 0.006451,
        -0.036991, 0.0016, 0.001078, -0.02328, -0.002084, -0.025164, 0.001962,
        0.027223, -0.017896, 0.026726, -0.049704, -0.042633, -0.024309,
        0.002344, -0.077358, 0.007411, 0.058792, 0.00398, -0.001601, 0.020951,
        -0.037377, -0.056914, -0.015183
    ],
    [
        -0.006636, -0.061897, -0.011374, 0.025052, 0.022769, 0.012288,
        -0.046334, -0.080976, 0.032484, 0.079039, 0.000839, 0.012212, -0.04049,
        0.023858, 0.02139, 0.000894, 0.019543, -0.034195, -0.004742, -0.038874,
        -0.044996, 0.005513, 0.057035, -0.007331, -0.041495, 0.038802,
        -0.045256, -0.023149, -0.070349, 0.018789, -0.034902, 0.021993,
        -0.018849, -0.003922, -0.013579, -0.00126, -0.006139, 0.001783,
        -0.013426, -0.003874, -0.055511, 0.049068, -0.013757, -0.02727,
        0.005025, 0.017151, 0.052348, -0.062464, 0.013556, 0.03171, -0.041965,
        -0.071732, 0.061148, 0.055181, -0.023505, 0.032611, 0.02598, -0.023639,
        0.004817, -0.021349, -0.081514, 0.038882, -0.057459, 0.015901
    ],
    [
        -0.032782, -0.065457, 0.025959, 0.057874, 0.001673, -0.032483,
        -0.045462, 0.01461, 0.023169, -0.026538, 0.00602, -0.002061, -0.025647,
        -0.020862, 0.050938, 0.021265, 0.02108, 0.031607, -0.028842, -0.053808,
        0.008852, -0.05351, -0.045056, -0.012783, -0.048838, -0.043095,
        -0.005084, 0.036607, 0.047868, -0.013548, -0.000911, 0.001447, 0.108644,
        -0.031816, 0.028995, -0.000288, -0.017036, -0.027009, -0.042663,
        -0.028842, -0.00197, -0.015368, 0.041668, -0.006272, 0.022587,
        -0.024628, 0.0013, 0.057639, 0.020701, -0.004318, -0.002522, 0.042875,
        -0.049167, -0.004673, 0.035864, -0.005776, 0.028461, 0.055864,
        -0.049533, -0.020254, 0.005528, 0.024486, -0.038961, 0.073132
    ],
    [
        0.023925, 0.006767, -0.030361, 0.020712, -0.01589, -0.077618, -0.018342,
        -0.008583, -0.000997, 0.013577, -0.027577, -0.029866, 0.069471,
        0.010022, -0.001875, 0.003177, -0.028127, 0.041502, 0.05141, 0.020792,
        0.01229, 0.004249, 0.004291, -0.001844, 0.036239, 0.028738, 0.006144,
        -0.002641, -0.025036, -0.000696, -0.053697, -0.05788, -0.000795,
        0.01879, 0.036085, 0.056803, 0.021111, -0.01326, -0.022304, -0.001346,
        -0.009046, -0.003389, 0.034246, -0.018383, 0.053113, -0.001502,
        -0.007792, -0.018932, -0.036233, 0.061851, 0.012603, -0.013309,
        0.028951, -0.011016, -0.033845, 0.068895, -0.039851, -0.071832,
        -0.015705, -0.015222, 0.025032, -0.005487, 0.033169, 0.021483
    ],
    [
        0.018582, 0.030976, -0.025565, 0.045315, 0.003423, 0.035763, 0.017973,
        -0.011005, -0.009879, 0.00086, -0.007287, -0.014354, -0.043993, 0.0474,
        -0.032274, -0.062397, -0.02198, 0.034839, 0.043241, -0.051113, 0.002524,
        -0.030497, 0.028908, 0.09734, -0.038386, 0.034828, -0.00302, 0.022342,
        0.028767, -0.063542, 0.033614, 0.083092, -0.014857, -0.010428,
        -0.000669, -0.034424, 0.013239, -0.010952, 0.022351, 0.043924,
        -0.019937, -0.014175, 0.002511, 0.006815, -0.002425, -0.003571,
        0.061041, -0.03096, -0.02987, -0.003439, 0.007959, 0.031778, -0.028525,
        0.042748, 0.072766, -0.036098, 0.037351, 0.000864, -0.033237, 0.02018,
        0.006724, 0.035293, 0.066285, 0.021075
    ],
    [
        0.011061, 0.007937, -0.010473, -0.011566, -0.042732, -0.036722,
        -0.010278, -0.10286, -0.030359, 0.001984, -0.004498, -0.026427,
        -0.012169, 0.028488, -0.025408, 0.030554, -0.026787, 0.021464, 0.012577,
        -0.014827, 0.059262, -0.031939, 0.031825, -0.030232, 0.001219,
        -0.021458, 0.01689, -0.100145, -0.008115, 0.045851, 0.002508, 0.006832,
        -0.017792, -0.007421, 0.023246, 0.068359, -0.002579, -0.034778,
        -0.033085, -0.001062, -0.017056, -0.002324, -0.030503, 0.019388,
        -0.051751, -0.047526, -0.044301, -0.02312, 0.0729, -0.029395, -0.042834,
        0.033634, 0.017283, -0.009475, -0.005789, 0.008134, -0.012312, 0.053523,
        0.028128, 0.036593, 0.016357, -0.026286, 0.013697, -0.06048
    ],
]


def _kmeans_bucket(col: Column) -> Column:
    """Nearest-centroid assignment as a pure column expression:
    ``argmin_j ||x - c_j||^2 = argmin_j (|c_j|^2 - 2 x.c_j)`` — the
    row-constant ``|x|^2`` is dropped, so each centroid costs exactly one
    ``zip_with`` dot product, all JVM-side, no UDF."""
    dists = F.array(
        *[
            F.lit(round(sum(v * v for v in c), 9))
            - 2.0 * _dot(col, F.array(*[F.lit(v) for v in c]))
            for c in _KMEANS_CENTROIDS
        ]
    )
    return F.array_position(dists, F.array_min(dists)).cast("long")


def train_ivf_centroids(
    df: DataFrame, k: int = 8, seed: int = 20260813, max_iter: int = 20
) -> list[list[float]]:
    """Distributed form of the offline step that produced
    ``_KMEANS_CENTROIDS``: k-means over the ``embedding`` column via
    ``pyspark.ml`` on a corpus sample.  At 100 TB the training sample
    still fits a single executor and the cost is negligible next to one
    corpus scan; the output is pinned (as above) so that assignment —
    the per-row hot path — never depends on training nondeterminism."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.select(
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(vecs)
    return [[round(float(v), 6) for v in c] for c in model.clusterCenters()]


def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with the TRAINED coarse quantizer (``ann_ivf_bucketed``'s
    argmax rule is the untrained stand-in): every vector goes to its
    nearest pinned k-means centroid; each query probes only its own
    Voronoi cell.  Identical probe-join shape — broadcast query set,
    bucket equi-join — so swapping quantizers changes recall, not the
    plan."""
    e = load_table(spark, "embeddings", sf_dir)
    return _bucket_probe_topk(
        e, _kmeans_bucket(F.col("embedding")), checkpoint=True
    )


#: Product-quantization geometry: 64-dim vectors cut into PQ_M
#: subspaces of PQ_SUB dims, PQ_K codes per subspace codebook — the
#: 8-bits-per-subvector compression regime (Jegou et al. TPAMI'11).
PQ_M, PQ_SUB, PQ_K = 4, 16, 16


def _dist2(a: Column, b: Column) -> Column:
    """Squared L2 distance with the repo's fixed left-fold order, so
    both engines accumulate bit-identical doubles."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with ASYMMETRIC DISTANCE (ADC — Jegou et
    al. TPAMI'11), the compression side of the ANN toolbox beside the
    bucketed IVF/LSH probes: each vector is encoded as PQ_M=4 one-byte
    codes (nearest codebook entry per 16-dim subspace), and a query
    scores a candidate WITHOUT touching the original vector — it sums
    4 precomputed query-to-centroid distances looked up by the
    candidate's codes.  At 100 TB this is why PQ exists: the scan
    reads 4 bytes + id per vector instead of 256 bytes, and the
    distance work per candidate is M table lookups.

    Everything is in-plan and data-derived (no pinned literals): the
    codebook is the PQ_K lowest-id vectors' subslices (the
    deterministic seeding a k-means refinement would start from —
    swapping in trained centroids changes recall, not the plan),
    broadcast at 64 rows; encoding is the corpus x (M x K) narrow
    fan-out every PQ encoder pays (O(N*M*K) multiply-adds), pruned to
    (id, m, code) before any shuffle; the LUT is queries x 64 rows
    broadcast; ADC assembly folds the 4 per-subspace terms in fixed m
    order so the ranking doubles are bit-identical across engines.

    Returns the top-TOP_K ADC neighbors per query (self excluded),
    with the reconstruction-side distance — compare against
    `cosine_topk_bruteforce` for the recall trade, exactly how
    `ann_recall_audit` treats the bucketed quantizers."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    ms = F.sequence(F.lit(0), F.lit(PQ_M - 1))

    def _sub(col: str):
        return F.slice(F.col(col), F.col("m") * PQ_SUB + 1, PQ_SUB)

    cb = (
        e.where(F.col("vec_id") < PQ_K)
        .select(
            F.col("vec_id").cast("int").alias("j"),
            F.explode(ms).alias("m"),
            "embedding",
        )
        .select("m", "j", _sub("embedding").alias("c"))
    )
    xs = e.select(
        "vec_id", F.explode(ms).alias("m"), "embedding"
    ).select("vec_id", "m", _sub("embedding").alias("x"))
    # Encode argmin IN-ROW (round 12, guide §2.4 — remove shuffles
    # outright): the old row_number window evaluated the N x M x K
    # fan-out (K=64 rows per (vector, subspace)) and then had to sort
    # it per group (WindowGroupLimit still sorts map-side; a
    # min(struct) aggregation plans as SortAggregate and sorts too).
    # Instead the codebook collapses to M rows of K-entry arrays
    # (sorted by j), broadcast at 4 rows, and each vector's code is
    # array_min over struct(d2, j) — lexicographic struct comparison
    # IS the window's ORDER BY d2, j rank-1 row (ties take the lower
    # j), and _dist2 is the identical fold, so the chosen code is
    # bit-for-bit the same.  The encode stage becomes map-only: no
    # exchange, no sort, no K-way row fan-out.
    cb_arr = cb.groupBy("m").agg(
        F.array_sort(F.collect_list(F.struct("j", "c"))).alias("cents")
    )
    # Per-row distances land in ONE materialized array column (no
    # struct allocs); the winner is the FIRST index reaching the
    # minimum — cents is sorted by j, so first occurrence == lowest j
    # on exact ties, the window's tie-break.  d2 is a sum of squares
    # (never NaN/-0.0), so array_position's equality test against
    # array_min is exact.
    codes = (
        xs.join(F.broadcast(cb_arr), "m")
        .select(
            "vec_id",
            "m",
            "cents",
            F.transform(
                F.col("cents"), lambda ent: _dist2(F.col("x"), ent["c"])
            ).alias("ds"),
        )
        .select(
            "vec_id",
            "m",
            F.element_at(
                F.col("cents"),
                F.array_position(F.col("ds"), F.array_min(F.col("ds"))).cast(
                    "int"
                ),
            )["j"].alias("code"),
        )
    )
    lut = (
        e.where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("q_id"),
            F.explode(ms).alias("m"),
            "embedding",
        )
        .select("q_id", "m", _sub("embedding").alias("qx"))
        .join(F.broadcast(cb), "m")
        .select(
            "q_id", "m", "j", _dist2(F.col("qx"), F.col("c")).alias("qd2")
        )
    )
    lut_k = lut.select(
        "q_id",
        F.col("m").alias("lm"),
        F.col("j").alias("lj"),
        "qd2",
    )
    parts = (
        codes.join(
            F.broadcast(lut_k),
            (F.col("m") == F.col("lm")) & (F.col("code") == F.col("lj")),
        )
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "m", "qd2")
    )
    assembled = (
        parts.groupBy("q_id", "vec_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("m", "qd2"))).alias(
                "terms"
            )
        )
        .select(
            "q_id",
            "vec_id",
            F.aggregate(
                F.transform(F.col("terms"), lambda s: s["qd2"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("adc"),
        )
    )
    w_rank = Window.partitionBy("q_id").orderBy("adc", "vec_id")
    return (
        assembled.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", "rnk", F.round("adc", 6).alias("adc"))
        .orderBy("q_id", "rnk")
    )


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the standard
    4x-compression storage transform for embedding corpora (scale =
    max|x|/127, q = round(x/scale) in [-127, 127]) — plus the
    reconstruction-error audit every quantized index ships with.

    Scale design: pure array HOFs (transform/zip_with/aggregate) per
    row — no shuffle at all except the final presentation sort; at
    100 TB this is a map-only pass that rewrites the vector column at
    scan speed.  Quantization uses ``floor(x/scale + 0.5)`` (identical
    half-up semantics in both engines — double ``round`` ties differ
    engine-to-engine) and fixed fold order, so the audit doubles are
    bit-identical with the oracle.
    """
    e = load_table(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(F.col("amax") > 0.0, F.col("amax") / 127.0).otherwise(
        F.lit(1.0)
    )
    q = F.transform(
        F.col("v"),
        lambda x: F.greatest(
            F.lit(-127.0),
            F.least(F.lit(127.0), F.floor(x / F.col("scale") + 0.5)),
        ),
    )
    err = F.zip_with(
        F.col("v"), F.col("q"), lambda x, qi: x - qi * F.col("scale")
    )
    sum_sq = F.aggregate(
        F.transform(F.col("err"), lambda r: r * r),
        F.lit(0.0),
        lambda acc, r: acc + r,
    )
    return (
        e.select("vec_id", "label", v.alias("v"), amax.alias("amax"))
        .withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn("err", err)
        .select(
            "vec_id",
            "label",
            F.round(F.col("scale"), 9).alias("scale"),
            F.aggregate(
                F.col("q"), F.lit(0.0), lambda acc, x: acc + x
            )
            .cast("long")
            .alias("q_checksum"),
            F.round(
                F.sqrt(sum_sq / F.size(F.col("q"))) / F.col("scale"), 6
            ).alias("rmse_over_scale"),
            F.round(
                F.array_max(F.transform(F.col("err"), F.abs))
                / F.col("scale"),
                6,
            ).alias("max_err_over_scale"),
        )
        .orderBy("vec_id")
    )


def rag_retrieve_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval (the RAG read path): exact cosine top-k over
    the embedding corpus, then the score list joins BACK to the
    documents table to fetch the snippet a prompt builder splices in —
    retrieval is only half a RAG query; the content fetch is the other
    half, and it must stay a narrow keyed join, never a second scan of
    document text into the similarity stage.

    Plan shape: the top-k result is TOP_K x N_QUERIES rows, so the
    content join broadcasts it against the documents scan; documents
    without an embedding simply never surface (inner join) — partial
    embedding coverage is the normal production state (sf0.1: 2000
    vectors over 5000 docs)."""
    topk = cosine_topk_bruteforce(spark, sf_dir)
    d = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 12), " ").alias(
            "snippet"
        ),
        F.col("n_chars"),
    )
    return (
        d.join(F.broadcast(topk), d["doc_id"] == topk["vec_id"])
        .select("q_id", "rnk", "doc_id", "cosine", "snippet", "n_chars")
        .orderBy("q_id", "rnk")
    )


def sim_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction scoring: the first ``N_QUERIES``
    vectors act as one multi-vector query (its "token embeddings"); each
    label group is a multi-vector document; score(doc) = sum over query
    tokens of the MAX cosine against any of the doc's vectors — the
    MaxSim operator behind late-interaction retrieval, which single-
    vector cosine top-k (cosine_topk_bruteforce) cannot express.

    Plan: query tokens broadcast; one scan of the corpus computes all
    (query token, vector) cosines JVM-side; two tiny-key aggregations
    (max per (label, token), then sum per label).  At 100 TB the
    per-pair stage streams map-side against the broadcast tokens and
    only |labels| x |tokens| rows ever shuffle.  Scores are rounded
    BEFORE the final ordering so ranking is reproducible across
    engines' float-sum orders."""
    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    qtok = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    per_tok = (
        base.crossJoin(F.broadcast(qtok))
        .select("label", "q_id", cos.alias("c"))
        .groupBy("label", "q_id")
        .agg(F.max("c").alias("m"))
    )
    return (
        per_tok.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_query_tokens"),
            F.round(F.sum("m"), 6).alias("maxsim_score"),
        )
        .orderBy(F.desc("maxsim_score"), "label")
    )


def feature_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dimension) min-max feature scaling of the embedding
    columns — the normalization step feature pipelines run before any
    distance-based model, verified by its defining invariants (each
    scaled dimension spans exactly [0, 1] within its group and the
    group mean is preserved under the affine map).

    Plan: posexplode to narrow (label, dim, value) rows — at 100 TB
    this is the columnar long-form a feature store keeps anyway — one
    groupBy for the per-(label, dim) band, broadcast back, re-aggregate
    the scaled stats.  Constant dimensions (max == min) are reported
    with NULL scaled stats rather than a divide-by-zero.  Sums run in
    DECIMAL so the verification stats are association-order-exact."""
    e = load_table(spark, "embeddings", sf_dir)
    long = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    band = long.groupBy("label", "dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    scaled = long.join(F.broadcast(band), ["label", "dim"]).select(
        "label",
        "dim",
        F.when(
            F.col("hi") > F.col("lo"),
            (F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo")),
        ).alias("s"),
    )
    return (
        scaled.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("s"), 6).alias("s_min"),
            F.round(F.max("s"), 6).alias("s_max"),
            F.round(
                (
                    F.sum(F.col("s").cast("decimal(28,12)")).cast("double")
                    / F.count("s")
                ),
                6,
            ).alias("s_mean"),
        )
        .orderBy("label", "dim")
    )


def embedding_label_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label cluster compactness: the label centroid (exact decimal
    per-dimension means) and the mean/max L2 distance of members to it
    — the intra-class dispersion diagnostic that predicts whether
    label-bucketed semantic dedup (dedup_semdedup_kmeans) will find
    anything, and the first quality gate on any labeled embedding set.

    Plan: long-form posexplode (the feature-store layout), one groupBy
    for the per-(label, dim) centroid with DECIMAL sums (means are
    engine-exact), broadcast back, per-(vec, label) squared-error fold,
    then the per-label rollup.  Distances are doubles rounded to 6dp;
    the decimal centroid keeps the only accumulation that spans many
    rows exact."""
    e = load_table(spark, "embeddings", sf_dir)
    long = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "v")
    ).withColumn("v", F.col("v").cast("double"))
    centroid = long.groupBy("label", "dim").agg(
        (
            F.sum(F.col("v").cast("decimal(28,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    sq = (
        long.join(F.broadcast(centroid), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("sq"))
        .select("label", F.sqrt("sq").alias("dist"))
    )
    return (
        sq.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("dist"), 6).alias("mean_dist"),
            F.round(F.max("dist"), 6).alias("max_dist"),
        )
        .orderBy("label")
    )


#: power-iteration geometry: embedding dim (fixture contract) and the
#: unrolled iteration count — 3 steps from the exact-representable
#: 1/sqrt(64) = 0.125 seed separate the top eigenvalue decisively on
#: any non-degenerate spectrum
PCA_DIM = 64
PCA_ITERS = 3


def embeddings_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus via matrix-free
    power iteration — the first step of PCA whitening / dimensionality
    reduction an embedding pipeline runs before ANN indexing, expressed
    entirely as declarative plans (the iterative-linear-algebra sibling
    of PageRank's fixpoint): v_{k+1} = normalize(X^T (X v_k)), three
    unrolled steps from the constant seed v_0 = [1/sqrt(64)] * 64
    (exactly 0.125 — float-representable, so both engines start from
    the identical vector).

    Each step is matrix-free: one broadcast of the 64-double direction,
    per-row dot products as JVM fold expressions (never materializing
    X^T X — at 100 TB the corpus streams through map tasks, only
    64-row w vectors shuffle), a per-dimension sum, and a
    normalization over 64 values.  Determinism: dots fold
    left-to-right identically in both engines; the per-dim row-sum is
    the only unordered float accumulation (noise ~1e-12 relative,
    absorbed by output rounding).  Sign is pinned by the positive
    seed.  Returns one row per dimension: (dim, loading,
    eigenvalue_est = ||X^T X v_2||, the operator-norm estimate)."""
    e = load_table(spark, "embeddings", sf_dir).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("x")
    )
    pc = spark.range(1).select(
        F.array(*[F.lit(0.125)] * PCA_DIM).alias("v")
    )
    w = norm = None
    for _ in range(PCA_ITERS):
        d = e.crossJoin(F.broadcast(pc)).withColumn(
            "dot", _dot(F.col("x"), F.col("v"))
        )
        w = (
            d.select(F.posexplode("x").alias("pos", "xi"), "dot")
            .select("pos", (F.col("xi") * F.col("dot")).alias("c"))
            .groupBy("pos")
            .agg(F.sum("c").alias("w"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nn"))
        pc = (
            w.crossJoin(F.broadcast(norm))
            .select("pos", (F.col("w") / F.col("nn")).alias("comp"))
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "comp"))
                ).alias("s")
            )
            .select(F.transform("s", lambda t: t.comp).alias("v"))
        )
    return (
        w.crossJoin(F.broadcast(norm))
        .select(
            F.col("pos").cast("long").alias("dim"),
            F.round(F.col("w") / F.col("nn"), 6).alias("loading"),
            F.round("nn", 4).alias("eigenvalue_est"),
        )
        .orderBy("dim")
    )


def _pca_sql() -> str:
    """Mirror of embeddings_pca_power_iteration: the same three power
    steps unrolled as MATERIALIZED CTEs (non-materialized CTE chains
    re-expand exponentially in DuckDB), dots folded left-to-right via
    list_reduce exactly like the Spark aggregate fold."""
    dims = PCA_DIM
    parts = [
        "WITH e AS MATERIALIZED (",
        "    SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings),",
        f"v0 AS (SELECT list_transform(range({dims}), i -> 0.125) AS v),",
    ]
    for k in range(1, PCA_ITERS + 1):
        parts += [
            f"d{k} AS MATERIALIZED (",
            f"    SELECT x, list_reduce(list_transform(range(1, {dims + 1}),",
            "                           i -> x[i] * v[i]),",
            "                           (a, b) -> a + b) AS dot",
            f"    FROM e CROSS JOIN v{k - 1}),",
            f"w{k} AS MATERIALIZED (",
            "    SELECT pos, SUM(x[pos] * dot) AS w",
            f"    FROM d{k} CROSS JOIN (SELECT UNNEST(range(1, {dims + 1}))"
            " AS pos) p",
            "    GROUP BY pos),",
            f"n{k} AS (SELECT SQRT(SUM(w * w)) AS nn FROM w{k}),",
        ]
        if k < PCA_ITERS:
            parts += [
                f"v{k} AS (SELECT LIST(w / nn ORDER BY pos) AS v",
                f"         FROM w{k} CROSS JOIN n{k}),",
            ]
    parts[-1] = parts[-1].rstrip(",")
    parts += [
        "SELECT CAST(pos - 1 AS BIGINT) AS dim,",
        "       ROUND(w / nn, 6) AS loading,",
        "       ROUND(nn, 4) AS eigenvalue_est",
        f"FROM w{PCA_ITERS} CROSS JOIN n{PCA_ITERS}",
        "ORDER BY dim",
    ]
    return "\n".join(parts)


#: Matryoshka truncation width (dims kept) and RRF rank constant (the
#: standard k = 60 from Cormack/Clarke/Buettcher SIGIR'09).
MATRYOSHKA_DIMS = 16
RRF_K = 60
RRF_TOP = 10


def embed_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation quality (Kusupati et al. 2022): for each
    query vector, top-k neighbors by FULL 64-dim cosine vs top-k by
    cosine in the TRUNCATED first-16-dim space, reporting the overlap
    (recall@k of the cheap index) — the measurement that decides
    whether a pipeline can serve ANN from 4x-smaller vectors and
    re-rank the survivors at full precision.

    One pass computes both rankings: the corpus scan carries full and
    sliced norms, the broadcast query set joins once, and the two
    row_number windows share one exchange (same partition key,
    different order).  Both ranks use (rounded cosine desc, vec_id) so
    the overlap count is engine-deterministic."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    head = F.slice(F.col("embedding"), 1, MATRYOSHKA_DIMS)
    base = e.select(
        "vec_id",
        "embedding",
        head.alias("emb16"),
        _norm(F.col("embedding")).alias("norm"),
        _norm(head).alias("norm16"),
    )
    queries = base.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("emb16").alias("q_emb16"),
        F.col("norm").alias("q_norm"),
        F.col("norm16").alias("q_norm16"),
    )
    cos_full = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    cos_trunc = _dot(F.col("q_emb16"), F.col("emb16")) / (
        F.col("q_norm16") * F.col("norm16")
    )
    w_full = Window.partitionBy("q_id").orderBy(
        F.col("cos_full").desc(), F.col("vec_id")
    )
    w_trunc = Window.partitionBy("q_id").orderBy(
        F.col("cos_trunc").desc(), F.col("vec_id")
    )
    ranked = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(cos_full, 6).alias("cos_full"),
            F.round(cos_trunc, 6).alias("cos_trunc"),
        )
        .withColumn("rnk_full", F.row_number().over(w_full))
        .withColumn("rnk_trunc", F.row_number().over(w_trunc))
    )
    return (
        ranked.groupBy("q_id")
        .agg(
            F.sum(
                (
                    (F.col("rnk_full") <= TOP_K)
                    & (F.col("rnk_trunc") <= TOP_K)
                ).cast("long")
            ).alias("n_overlap")
        )
        .select(
            "q_id",
            "n_overlap",
            F.round(F.col("n_overlap") / F.lit(float(TOP_K)), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("q_id")
    )


def rag_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack/Clarke/
    Buettcher SIGIR'09): the BM25 lexical ranking (``text_bm25_topk``,
    pinned term set) and a dense cosine ranking (query = document 0's
    embedding; vec_id == doc_id in the fixtures, the
    ``rag_retrieve_snippets`` contract) fuse by ``sum 1/(60 + rank)``
    over whichever lists a doc appears in — the zero-tuning hybrid
    that beats either arm alone and is what production RAG stacks run
    before a cross-encoder re-rank.

    Shape: both arms end as top-10 lists (dimension-sized), so the
    fusion is a full-outer join of two tiny frames — the data-sized
    work is each arm's own scan, already proven separately; absent
    ranks contribute 0 via coalesce, never NULL arithmetic."""
    from database_peak_streaming_spark.operators.text import text_bm25_topk
    from pyspark.sql import Window

    lex = text_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), F.col("doc_id")))
        .alias("r_lex"),
    )
    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    qrow = base.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    # global top-10 via sort+limit (TakeOrderedAndProject — distributed
    # partial top-k per task), NEVER a partition-less window over the
    # corpus; the rank window then runs on the 10 survivors only
    dense = (
        base.crossJoin(F.broadcast(qrow))
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"), F.round(cos, 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), "doc_id")
        .limit(RRF_TOP)
        .withColumn(
            "r_dense",
            F.row_number().over(
                Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
            ),
        )
        .select("doc_id", "r_dense")
    )
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("r_lex")), F.lit(0.0))
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("r_dense")), F.lit(0.0)
        ),
        6,
    )
    return (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("r_lex", F.lit(0)).cast("long").alias("r_lex"),
            F.coalesce("r_dense", F.lit(0)).cast("long").alias("r_dense"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(RRF_TOP)
    )


#: bitext mining: bounded English query block, top-k for the margin
#: normalizer (Artetxe/Schwenk ACL'19 use k=4), and the block bound.
BITEXT_SRC_MAX = 64
BITEXT_TOPK = 4


def embeddings_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe/Schwenk ACL'19; the
    CCMatrix/LASER recipe): for each English document's embedding,
    the best non-English candidate by MARGIN — cosine normalized by
    the average of both sides' top-4 cosines — rather than raw cosine,
    which global hubness makes unrankable across queries.  This is the
    alignment pass that builds parallel corpora for translation
    training data.

    Both normalizers come from ONE pair table (the bounded en query
    block broadcast against the non-en corpus scan): k_s is each
    source's top-4 mean over targets, k_t each target's top-4 mean
    over the source block.  Top-4 means are ORDERED folds over
    (cosine DESC, id DESC) slices — identical addition order in both
    engines (the ema-fold discipline), so margins are bit-identical
    before rounding.  Scale: the dense block is the exact
    hard-negatives shape — broadcast queries, corpus never shuffles
    until the two narrow (id, k) aggregations; production swaps the
    IVF probe in for the full cross block."""
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    e = load_table(spark, "embeddings", sf_dir)
    base = e.join(d, e["vec_id"] == d["doc_id"]).select(
        "vec_id", "lang", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    src = base.filter(
        (F.col("lang") == "en") & (F.col("vec_id") < BITEXT_SRC_MAX)
    ).select(
        F.col("vec_id").alias("s_id"),
        F.col("embedding").alias("s_emb"),
        F.col("norm").alias("s_norm"),
    )
    tgt = base.filter(F.col("lang") != "en").select(
        F.col("vec_id").alias("t_id"),
        F.col("lang").alias("t_lang"),
        "embedding",
        "norm",
    )
    cos = _dot(F.col("s_emb"), F.col("embedding")) / (
        F.col("s_norm") * F.col("norm")
    )
    pairs = tgt.crossJoin(F.broadcast(src)).select(
        "s_id", "t_id", "t_lang", F.round(cos, 6).alias("cosine")
    )

    def top4_mean(id_col: str) -> DataFrame:
        lst = F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("cosine"),
                        F.col("t_id" if id_col == "s_id" else "s_id").alias(
                            "oid"
                        ),
                    )
                )
            )
        )
        mean4 = (
            F.aggregate(
                F.slice(lst, 1, BITEXT_TOPK),
                F.lit(0.0),
                lambda acc, x: acc + x["cosine"],
            )
            / float(BITEXT_TOPK)
        )
        return pairs.groupBy(id_col).agg(mean4.alias(f"k_{id_col[0]}"))

    per_s = top4_mean("s_id")
    per_t = top4_mean("t_id")
    scored = (
        pairs.join(F.broadcast(per_s), "s_id")
        .join(per_t, "t_id")
        .select(
            "s_id",
            "t_id",
            "t_lang",
            "cosine",
            F.round(
                F.col("cosine")
                / ((F.col("k_s") + F.col("k_t")) / F.lit(2.0)),
                6,
            ).alias("margin"),
        )
    )
    w = Window.partitionBy("s_id").orderBy(F.desc("margin"), F.col("t_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_id", "t_id", "t_lang", "cosine", "margin")
        .orderBy("s_id")
    )


QUERIES = {
    "embeddings_pca_power_iteration": embeddings_pca_power_iteration,
    "embed_matryoshka_recall": embed_matryoshka_recall,
    "rag_rrf_fusion": rag_rrf_fusion,
    "embeddings_bitext_margin": embeddings_bitext_margin,
    "sim_maxsim_late_interaction": sim_maxsim_late_interaction,
    "feature_minmax_scale": feature_minmax_scale,
    "embedding_label_dispersion": embedding_label_dispersion,
    "cosine_topk_bruteforce": cosine_topk_bruteforce,
    "ann_hard_negatives": ann_hard_negatives,
    "rag_retrieve_snippets": rag_retrieve_snippets,
    "cosine_pairs_threshold": cosine_pairs_threshold,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "ann_ivf_kmeans": ann_ivf_kmeans,
    "ann_rp_lsh": ann_rp_lsh,
    "embedding_norms": embedding_norms,
    "embedding_quantize_int8": embedding_quantize_int8,
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


def _kmeans_dists_sql(col: str) -> str:
    """DuckDB form of ``_kmeans_bucket``'s distance array — same pinned
    centroid literals, same ``|c|^2 - 2 x.c`` arithmetic, so the argmin
    bucket agrees across engines."""
    terms = []
    for c in _KMEANS_CENTROIDS:
        n2 = round(sum(v * v for v in c), 9)
        lit = "[" + ", ".join(f"{v}" for v in c) + "]"
        terms.append(f"({n2} - 2*({_DOT.format(a=col, b=lit)}))")
    return "LIST_VALUE(" + ",\n                   ".join(terms) + ")"

_DOT = """LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"""


def _cos_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = f"SQRT({_DOT.format(a=a, b=a)})"
    nb = f"SQRT({_DOT.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


ORACLE_SQL = {
    "embeddings_pca_power_iteration": _pca_sql(),
    "embedding_label_dispersion": """
        WITH long AS (
            SELECT vec_id, label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings),
        centroid AS (
            SELECT label, dim,
                   CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE)
                   / COUNT(*) AS c
            FROM long GROUP BY 1, 2),
        sq AS (
            SELECT l.vec_id, l.label,
                   SQRT(SUM((l.v - ct.c) * (l.v - ct.c))) AS dist
            FROM long l JOIN centroid ct USING (label, dim)
            GROUP BY 1, 2)
        SELECT label,
               COUNT(*) AS n_vectors,
               ROUND(AVG(dist), 6) AS mean_dist,
               ROUND(MAX(dist), 6) AS max_dist
        FROM sq
        GROUP BY label
        ORDER BY label
    """,
    "feature_minmax_scale": """
        WITH long AS (
            SELECT vec_id, label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings),
        band AS (
            SELECT label, dim, MIN(v) AS lo, MAX(v) AS hi
            FROM long GROUP BY 1, 2),
        scaled AS (
            SELECT l.label, l.dim,
                   CASE WHEN b.hi > b.lo
                        THEN (l.v - b.lo) / (b.hi - b.lo) END AS s
            FROM long l JOIN band b USING (label, dim))
        SELECT label, dim,
               COUNT(*) AS n,
               ROUND(MIN(s), 6) AS s_min,
               ROUND(MAX(s), 6) AS s_max,
               ROUND(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE)
                     / COUNT(s), 6) AS s_mean
        FROM scaled
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "sim_maxsim_late_interaction": f"""
        WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
                   WHERE vec_id < {N_QUERIES}),
        cos AS (
            SELECT e.label, q.q_id,
                   {_cos_sql('q.q_emb', 'e.embedding')} AS c
            FROM embeddings e CROSS JOIN q),
        mx AS (SELECT label, q_id, MAX(c) AS m FROM cos GROUP BY 1, 2)
        SELECT label,
               COUNT(*) AS n_query_tokens,
               ROUND(SUM(m), 6) AS maxsim_score
        FROM mx
        GROUP BY label
        ORDER BY ROUND(SUM(m), 6) DESC, label
    """,
    "rag_retrieve_snippets": f"""
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
            FROM scored),
        topk AS (SELECT * FROM ranked WHERE rnk <= {TOP_K})
        SELECT t.q_id, t.rnk, d.doc_id, t.cosine,
               ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(d.text, ' '), 1, 12),
                               ' ') AS snippet,
               d.n_chars
        FROM topk t JOIN documents d ON d.doc_id = t.vec_id
        ORDER BY q_id, rnk
    """,
    "ann_hard_negatives": f"""
        WITH anchors AS (
            SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
            FROM embeddings
            QUALIFY ROW_NUMBER() OVER (PARTITION BY label
                                       ORDER BY vec_id) = 1),
        scored AS (
            SELECT a.q_id, a.q_label, e.vec_id AS neg_id,
                   e.label AS neg_label,
                   ROUND({_cos_sql('a.q_emb', 'e.embedding')}, 6) AS cosine
            FROM anchors a CROSS JOIN embeddings e
            WHERE e.label <> a.q_label),
        ranked AS (
            SELECT q_id, q_label, neg_id, neg_label, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                                      ORDER BY cosine DESC, neg_id) AS rnk
            FROM scored)
        SELECT q_id, q_label, neg_id, neg_label, cosine, rnk
        FROM ranked WHERE rnk <= {TOP_K}
        ORDER BY q_label, rnk
    """,
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
    "ann_ivf_kmeans": f"""
        WITH d AS (
            SELECT vec_id, embedding, {_kmeans_dists_sql('embedding')} AS dists
            FROM embeddings),
        base AS (
            SELECT vec_id, embedding,
                   CAST(LIST_POSITION(dists, LIST_MIN(dists)) AS BIGINT)
                       AS bucket
            FROM d),
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
    # Mirrors embedding_quantize_int8 step-for-step (same fold order,
    # same floor(x/s + 0.5) half-up rule) so the audit doubles are
    # bit-identical.
    "embedding_quantize_int8": """
        WITH base AS (
            SELECT vec_id, label,
                   LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
        s AS (
            SELECT vec_id, label, v,
                   LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS amax
            FROM base),
        sc AS (
            SELECT *, CASE WHEN amax > 0.0 THEN amax / 127.0 ELSE 1.0 END
                          AS scale
            FROM s),
        qq AS (
            SELECT *, LIST_TRANSFORM(v, x ->
                          GREATEST(-127.0, LEAST(127.0,
                              FLOOR(x / scale + 0.5)))) AS q
            FROM sc),
        ee AS (
            SELECT *, LIST_TRANSFORM(LIST_ZIP(v, q),
                          p -> p[1] - p[2] * scale) AS err
            FROM qq)
        SELECT vec_id, label,
               ROUND(scale, 9) AS scale,
               CAST(LIST_SUM(q) AS BIGINT) AS q_checksum,
               ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(err, r -> r * r))
                          / LEN(q)) / scale, 6) AS rmse_over_scale,
               ROUND(LIST_MAX(LIST_TRANSFORM(err, r -> ABS(r))) / scale, 6)
                   AS max_err_over_scale
        FROM ee ORDER BY vec_id
    """,
}

ORACLE_SQL["embed_matryoshka_recall"] = f"""
    WITH base AS (
        SELECT vec_id, embedding,
               embedding[1:{MATRYOSHKA_DIMS}] AS emb16
        FROM embeddings),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb, emb16 AS q_emb16
          FROM base WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.q_id, b.vec_id,
               ROUND({_cos_sql('q.q_emb', 'b.embedding')}, 6) AS cos_full,
               ROUND({_cos_sql('q.q_emb16', 'b.emb16')}, 6) AS cos_trunc
        FROM q CROSS JOIN base b WHERE b.vec_id <> q.q_id),
    ranked AS (
        SELECT q_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_full DESC, vec_id)
                   AS rnk_full,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_trunc DESC, vec_id)
                   AS rnk_trunc
        FROM scored)
    SELECT q_id,
           CAST(SUM(CASE WHEN rnk_full <= {TOP_K} AND rnk_trunc <= {TOP_K}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
           ROUND(SUM(CASE WHEN rnk_full <= {TOP_K} AND rnk_trunc <= {TOP_K}
                          THEN 1 ELSE 0 END) / {float(TOP_K)}, 6)
               AS recall_at_k
    FROM ranked GROUP BY q_id ORDER BY q_id
"""


def _rrf_sql() -> str:
    from database_peak_streaming_spark.operators.text import (
        ORACLE_SQL as _TEXT_ORACLE,
    )

    bm25 = _TEXT_ORACLE["text_bm25_topk"]
    return f"""
    WITH lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
        FROM ({bm25})),
    base AS (SELECT vec_id, embedding FROM embeddings),
    q AS (SELECT embedding AS q_emb FROM base WHERE vec_id = 0),
    scored AS (
        SELECT b.vec_id AS doc_id,
               ROUND({_cos_sql('q.q_emb', 'b.embedding')}, 6) AS cosine
        FROM base b CROSS JOIN q WHERE b.vec_id <> 0),
    dense AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_dense
        FROM (SELECT * FROM scored
              ORDER BY cosine DESC, doc_id LIMIT {RRF_TOP})),
    fused AS (
        SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
               CAST(COALESCE(r_lex, 0) AS BIGINT) AS r_lex,
               CAST(COALESCE(r_dense, 0) AS BIGINT) AS r_dense,
               ROUND(COALESCE(1.0 / ({RRF_K} + r_lex), 0.0)
                     + COALESCE(1.0 / ({RRF_K} + r_dense), 0.0), 6)
                   AS rrf_score
        FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
    SELECT doc_id, r_lex, r_dense, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {RRF_TOP}
    """


ORACLE_SQL["rag_rrf_fusion"] = _rrf_sql()

ORACLE_SQL["embeddings_bitext_margin"] = f"""
    WITH base AS (
        SELECT e.vec_id, d.lang, e.embedding
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    src AS (
        SELECT vec_id AS s_id, embedding AS s_emb
        FROM base WHERE lang = 'en' AND vec_id < {BITEXT_SRC_MAX}),
    tgt AS (
        SELECT vec_id AS t_id, lang AS t_lang, embedding
        FROM base WHERE lang <> 'en'),
    pairs AS (
        SELECT s_id, t_id, t_lang,
               ROUND({_cos_sql('s_emb', 'embedding')}, 6) AS cosine
        FROM tgt CROSS JOIN src),
    per_s AS (
        SELECT s_id,
               LIST_REDUCE(
                   (LIST(cosine ORDER BY cosine DESC, t_id DESC))
                       [1:{BITEXT_TOPK}],
                   (acc, x) -> acc + x) / {float(BITEXT_TOPK)} AS k_s
        FROM pairs GROUP BY s_id),
    per_t AS (
        SELECT t_id,
               LIST_REDUCE(
                   (LIST(cosine ORDER BY cosine DESC, s_id DESC))
                       [1:{BITEXT_TOPK}],
                   (acc, x) -> acc + x) / {float(BITEXT_TOPK)} AS k_t
        FROM pairs GROUP BY t_id),
    scored AS (
        SELECT p.s_id, p.t_id, p.t_lang, p.cosine,
               ROUND(p.cosine / ((ps.k_s + pt.k_t) / 2.0), 6) AS margin
        FROM pairs p
        JOIN per_s ps USING (s_id)
        JOIN per_t pt USING (t_id)),
    best AS (
        SELECT s_id, t_id, t_lang, cosine, margin,
               ROW_NUMBER() OVER (PARTITION BY s_id
                                  ORDER BY margin DESC, t_id) AS rn
        FROM scored)
    SELECT s_id, t_id, t_lang, cosine, margin
    FROM best WHERE rn = 1 ORDER BY s_id
"""


def _ann_recall_sql() -> str:
    """Composes the audit from the registered ANN oracles themselves
    (each already returns its variant's top-3 per query), so the audit
    and the per-variant queries can never drift apart."""
    bf3 = f"""
        SELECT q_id, vec_id FROM ({ORACLE_SQL['cosine_topk_bruteforce']})
        WHERE rnk <= 3"""
    arms = []
    for name, key in (
        ("ivf_argmax", "ann_ivf_bucketed"),
        ("ivf_kmeans", "ann_ivf_kmeans"),
        ("rp_lsh", "ann_rp_lsh"),
    ):
        arms.append(f"""
        SELECT '{name}' AS variant,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               ROUND(COUNT(*) / {float(N_QUERIES * 3)}, 6) AS recall_at_3
        FROM ({ORACLE_SQL[key]}) a
        JOIN ({bf3}) b USING (q_id, vec_id)""")
    u = "\n        UNION ALL\n".join(arms)
    return f"SELECT * FROM ({u}) ORDER BY variant"


ORACLE_SQL["ann_recall_audit"] = _ann_recall_sql()
QUERIES["ann_recall_audit"] = ann_recall_audit

_PQ_D2 = """LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),
          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
               * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"""

ORACLE_SQL["ann_pq_adc"] = f"""
    WITH ms AS (SELECT UNNEST(RANGE(0, {PQ_M})) AS m),
    cb AS (
        SELECT m, CAST(vec_id AS INT) AS j,
               embedding[m * {PQ_SUB} + 1 : m * {PQ_SUB} + {PQ_SUB}] AS c
        FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_K}),
    xs AS (
        SELECT vec_id, m,
               embedding[m * {PQ_SUB} + 1 : m * {PQ_SUB} + {PQ_SUB}] AS x
        FROM embeddings CROSS JOIN ms),
    cand AS (
        SELECT vec_id, m, j, {_PQ_D2.format(a='x', b='c')} AS d2
        FROM xs JOIN cb USING (m)),
    codes AS (
        SELECT vec_id, m, j AS code
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                           ORDER BY d2, j) AS rk
              FROM cand)
        WHERE rk = 1),
    qs AS (
        SELECT vec_id AS q_id, m,
               embedding[m * {PQ_SUB} + 1 : m * {PQ_SUB} + {PQ_SUB}] AS qx
        FROM embeddings CROSS JOIN ms WHERE vec_id < {N_QUERIES}),
    lut AS (
        SELECT q_id, qs.m, j, {_PQ_D2.format(a='qx', b='c')} AS qd2
        FROM qs JOIN cb ON cb.m = qs.m),
    parts AS (
        SELECT q_id, vec_id, codes.m, qd2
        FROM codes JOIN lut ON lut.m = codes.m AND lut.j = codes.code
        WHERE vec_id <> q_id),
    assembled AS (
        SELECT q_id, vec_id, LIST_SUM(LIST(qd2 ORDER BY m)) AS adc
        FROM parts GROUP BY q_id, vec_id),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY adc, vec_id) AS rnk
        FROM assembled)
    SELECT q_id, vec_id, CAST(rnk AS INT) AS rnk, ROUND(adc, 6) AS adc
    FROM ranked WHERE rnk <= {TOP_K}
    ORDER BY q_id, rnk
"""
QUERIES["ann_pq_adc"] = ann_pq_adc

#: Quantization grid for the Lloyd step: micro-units keep every
#: cross-row sum (per-dimension centroid sums, inertia) an exact
#: BIGINT.  |x| <= ~0.2 in the fixture, so q fits easily; the squared
#: micro-distance sum is bounded ~2.6e17 per bucket at sf0.1-scale —
#: inside BIGINT with two orders of headroom.
_LLOYD_SCALE = 1_000_000


def ml_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE exact Lloyd iteration of k-means from the pinned centroids —
    the distributed trainer step behind `ann_ivf_kmeans`'s quantizer
    (which uses the pinned OUTPUT; this operator is the in-plan form of
    producing the next one): assign every vector to its nearest
    centroid (the existing argmin column expression, no UDF), then
    re-estimate each centroid as the per-dimension member mean, and
    report per cluster the membership count, the centroid SHIFT
    (distance between old and new centroid — the convergence monitor)
    and the mean squared distance (inertia).  A full k-means fit is
    this operator iterated; one step per corpus pass is exactly the
    100 TB shape (same discipline as `ml_logreg_irls_step` and the PCA
    power iteration).

    Exactness: embeddings quantize to the micro-unit grid, so the
    per-dimension sums and the inertia are exact BIGINTs (both engines
    compute the identical IEEE double product before the identical
    half-up round); means and the 64-term shift sum are then identical
    expression trees, with the final 6-decimal round absorbing the
    ~1 ulp noise of the 64-double fold.

    Plan shape: assignment + inertia are scan-side HOFs (zero fan-out);
    the per-dimension sums use ONE 64x posexplode of narrow (bucket,
    dim, q) rows; everything after is k x 64 cells."""
    e = load_table(spark, "embeddings", sf_dir)
    cint = [
        [int(round(v * _LLOYD_SCALE)) for v in c] for c in _KMEANS_CENTROIDS
    ]
    c_arrays = F.array(
        *[F.array(*[F.lit(v) for v in c]) for c in cint]
    )
    q_arr = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * _LLOYD_SCALE, 0).cast("long"),
    )
    assigned = e.select(
        _kmeans_bucket(F.col("embedding")).alias("bucket"),
        q_arr.alias("q"),
    ).withColumn(
        "dist2_int",
        F.aggregate(
            F.zip_with(
                F.col("q"),
                F.element_at(c_arrays, F.col("bucket").cast("int")),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    per_bucket = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dist2_int").alias("sd2"),
    )
    dims = assigned.select(
        "bucket", F.posexplode(F.col("q")).alias("pos", "qv")
    )
    cells = dims.groupBy("bucket", "pos").agg(F.sum("qv").alias("s"))
    old_c = F.element_at(
        F.element_at(c_arrays, F.col("bucket").cast("int")),
        F.col("pos") + 1,
    )
    shift = (
        cells.join(per_bucket.select("bucket", "n"), "bucket")
        .select(
            "bucket",
            (
                (
                    F.col("s").cast("double") / F.col("n")
                    - old_c.cast("double")
                )
                / F.lit(float(_LLOYD_SCALE))
            ).alias("dmean"),
        )
        .groupBy("bucket")
        .agg(F.sum(F.col("dmean") * F.col("dmean")).alias("shift2"))
    )
    scale2 = float(_LLOYD_SCALE) * float(_LLOYD_SCALE)
    return (
        per_bucket.join(shift, "bucket")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n").cast("long").alias("n_members"),
            F.round(F.sqrt(F.col("shift2")), 6).alias("centroid_shift"),
            F.round(
                F.col("sd2").cast("double") / (F.col("n") * scale2), 6
            ).alias("mean_sq_dist"),
        )
        .orderBy("bucket")
    )

def _lloyd_sql() -> str:
    """Oracle for ``ml_kmeans_lloyd_step``: same pinned-centroid argmin,
    same micro-unit quantization, unrolled per-dimension re-estimation."""
    cint = [
        [int(round(v * _LLOYD_SCALE)) for v in c] for c in _KMEANS_CENTROIDS
    ]
    c_lit = (
        "LIST_VALUE("
        + ", ".join("[" + ", ".join(str(v) for v in c) + "]" for c in cint)
        + ")"
    )
    dim = len(cint[0])
    return f"""
    WITH assigned AS (
        SELECT CAST(LIST_POSITION(dists, LIST_MIN(dists)) AS BIGINT)
                   AS bucket,
               LIST_TRANSFORM(embedding,
                   x -> CAST(ROUND(CAST(x AS DOUBLE) * {_LLOYD_SCALE}, 0)
                             AS BIGINT)) AS q
        FROM (SELECT embedding,
                     {_kmeans_dists_sql('embedding')} AS dists
              FROM embeddings)),
    with_d AS (
        SELECT bucket, q,
               LIST_SUM(LIST_TRANSFORM(RANGE(1, {dim + 1}),
                   i -> (q[i] - {c_lit}[bucket][i])
                        * (q[i] - {c_lit}[bucket][i]))) AS dist2_int
        FROM assigned),
    per_bucket AS (
        SELECT bucket, COUNT(*) AS n, SUM(dist2_int) AS sd2
        FROM with_d GROUP BY bucket),
    dims AS (
        SELECT bucket, i.pos AS pos, q[i.pos + 1] AS qv
        FROM assigned
        CROSS JOIN (SELECT UNNEST(RANGE(0, {dim})) AS pos) i),
    cells AS (
        SELECT bucket, pos, SUM(qv) AS s
        FROM dims GROUP BY bucket, pos),
    shift AS (
        SELECT cells.bucket,
               SUM(((CAST(s AS DOUBLE) / n
                     - CAST({c_lit}[cells.bucket][pos + 1] AS DOUBLE))
                    / {float(_LLOYD_SCALE)})
                   * ((CAST(s AS DOUBLE) / n
                       - CAST({c_lit}[cells.bucket][pos + 1] AS DOUBLE))
                      / {float(_LLOYD_SCALE)})) AS shift2
        FROM cells JOIN per_bucket ON per_bucket.bucket = cells.bucket
        GROUP BY cells.bucket)
    SELECT CAST(per_bucket.bucket AS BIGINT) AS bucket,
           CAST(n AS BIGINT) AS n_members,
           ROUND(SQRT(shift2), 6) AS centroid_shift,
           ROUND(CAST(sd2 AS DOUBLE)
                 / (n * {float(_LLOYD_SCALE) ** 2}), 6) AS mean_sq_dist
    FROM per_bucket JOIN shift ON shift.bucket = per_bucket.bucket
    ORDER BY bucket
"""


QUERIES["ml_kmeans_lloyd_step"] = ml_kmeans_lloyd_step
ORACLE_SQL["ml_kmeans_lloyd_step"] = _lloyd_sql()


def embeddings_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension moment profile of the embedding corpus — the
    whitening / dead-dimension audit an ANN pipeline runs before
    choosing PQ sub-spaces or Matryoshka truncation points: a dimension
    with near-zero variance carries no ranking signal and wastes
    codebook bits.  Emits per-dim mean, population variance, and a
    zero-variance flag.

    Scale: posexplode fans each row into DIM narrow (dim, val) pairs
    and ONE groupBy on dim reduces them — output is DIM-bounded (64
    rows) at any corpus size, partial aggregation collapses the fan
    map-side, and no row ever carries the full vector past the scan.
    Exactness: sums accumulate in double (unordered float noise
    ~1e-12 relative, absorbed by 6-decimal rounding); variance uses
    the one-pass E[x^2] - E[x]^2 form on the SAME two sums in both
    engines, so the expressions agree to ulps."""
    e = load_table(spark, "embeddings", sf_dir)
    vals = e.select(F.posexplode("embedding").alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum("v")
    sxx = F.sum(F.col("v") * F.col("v"))
    return (
        vals.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(sx / n, 6).alias("mean_v"),
            F.round(sxx / n - (sx / n) * (sx / n), 6).alias("var_v"),
            (F.round(sxx / n - (sx / n) * (sx / n), 6) == 0.0)
            .cast("int")
            .alias("is_dead"),
        )
        .orderBy("dim")
    )


QUERIES["embeddings_dim_variance"] = embeddings_dim_variance
ORACLE_SQL["embeddings_dim_variance"] = """
    WITH vals AS (
        SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
        FROM (SELECT embedding,
                     UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
              FROM embeddings))
    SELECT CAST(dim AS INT) AS dim,
           COUNT(*) AS n,
           ROUND(SUM(v) / COUNT(*), 6) AS mean_v,
           ROUND(SUM(v * v) / COUNT(*)
                 - (SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*)), 6) AS var_v,
           CAST(ROUND(SUM(v * v) / COUNT(*)
                 - (SUM(v) / COUNT(*)) * (SUM(v) / COUNT(*)), 6) = 0.0
                AS INT) AS is_dead
    FROM vals
    GROUP BY dim
    ORDER BY dim
"""


def embeddings_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal-Mahalanobis embedding outlier audit: score each vector
    by sum_i (x_i - mu_i)^2 / var_i against the corpus's per-dimension
    mean/variance, and surface the top 20 — the standard pre-training
    vector-quality gate (mis-embedded, truncated, or out-of-domain
    vectors land in the tail; a full-covariance Mahalanobis needs the
    O(d^2) covariance the diagonal form deliberately skips at d=64+).

    Scale: two bounded passes.  Pass 1 is ``embeddings_dim_variance``'s
    shape — posexplode to (dim, val) and ONE groupBy(dim) producing a
    DIM-row stats frame (exact integer moments on a 1e-4 grid, so mu
    and var are identical doubles in both engines).  Pass 2 broadcasts
    that frame (64 rows, F.broadcast bounded by the embedding
    dimension) and scores each vector map-side with a FIXED-ORDER
    left fold over the dims — both engines fold dim 0..63 left to
    right, so the score doubles are bit-identical, not merely close.
    No shuffle touches the vectors themselves."""
    e = load_table(spark, "embeddings", sf_dir)
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5)).cast("long"),
    )
    base = e.select("vec_id", "label", q.alias("q"))
    vals = base.select(F.posexplode("q").alias("dim", "v"))
    n = F.count(F.lit(1)).cast("double")
    s = F.sum("v")
    ss = F.sum(F.col("v") * F.col("v"))
    per_dim = vals.groupBy("dim").agg(
        (s.cast("double") / n).alias("mu"),
        (
            (ss.cast("double") - s.cast("double") * s.cast("double") / n)
            / (n - F.lit(1.0))
        ).alias("var"),
    )
    stats = per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mu", "var"))
        ).alias("dims")
    ).select(
        F.transform("dims", lambda x: x["mu"]).alias("mu_arr"),
        F.transform("dims", lambda x: x["var"]).alias("var_arr"),
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.size("q") - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + F.when(
            F.element_at(F.col("var_arr"), i + 1) > 0.0,
            (
                F.element_at(F.col("q"), i + 1).cast("double")
                - F.element_at(F.col("mu_arr"), i + 1)
            )
            * (
                F.element_at(F.col("q"), i + 1).cast("double")
                - F.element_at(F.col("mu_arr"), i + 1)
            )
            / F.element_at(F.col("var_arr"), i + 1),
        ).otherwise(F.lit(0.0)),
    )
    return (
        base.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "label",
            F.round(score, 4).alias("maha_score"),
        )
        .orderBy(F.desc("maha_score"), "vec_id")
        .limit(20)
    )


QUERIES["embeddings_mahalanobis_outliers"] = embeddings_mahalanobis_outliers
ORACLE_SQL["embeddings_mahalanobis_outliers"] = """
    WITH base AS (
        SELECT vec_id, label,
               LIST_TRANSFORM(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000 + 0.5)
                             AS BIGINT)) AS q
        FROM embeddings),
    vals AS (
        SELECT i - 1 AS dim, q[i] AS v
        FROM (SELECT q, UNNEST(RANGE(1, LEN(q) + 1)) AS i FROM base)),
    per_dim AS (
        SELECT dim,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu,
               (CAST(SUM(v * v) AS DOUBLE)
                - CAST(SUM(v) AS DOUBLE) * CAST(SUM(v) AS DOUBLE)
                  / COUNT(*))
               / (COUNT(*) - 1.0) AS var
        FROM vals GROUP BY dim),
    stats AS (
        SELECT LIST(mu ORDER BY dim) AS mu_arr,
               LIST(var ORDER BY dim) AS var_arr
        FROM per_dim),
    scored AS (
        SELECT b.vec_id, b.label,
               LIST_REDUCE(
                   LIST_PREPEND(0.0, LIST_TRANSFORM(
                       RANGE(1, LEN(b.q) + 1),
                       i -> CASE WHEN s.var_arr[i] > 0.0 THEN
                             (CAST(b.q[i] AS DOUBLE) - s.mu_arr[i])
                           * (CAST(b.q[i] AS DOUBLE) - s.mu_arr[i])
                           / s.var_arr[i]
                            ELSE 0.0 END)),
                   (a, x) -> a + x) AS score
        FROM base b, stats s)
    SELECT vec_id, label, ROUND(score, 4) AS maha_score
    FROM scored
    ORDER BY maha_score DESC, vec_id
    LIMIT 20
"""


#: leave-one-out k-NN eval: pinned query block and neighborhood size
KNN_LOO_QUERIES = 16
KNN_LOO_K = 5


def sim_knn_loo_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN leave-one-out label prediction over the embedding corpus:
    for each of the first 16 vectors, the 5 nearest neighbors by
    cosine (self excluded) vote on its label — the standard
    embedding-quality smoke test (a good representation should be
    locally label-pure; cf. the linear/knn probes used to audit
    representation collapse).  Complements ``ann_recall_audit`` (which
    audits the INDEX against brute force) by auditing the EMBEDDINGS
    against their labels.

    Determinism: rank key is (rounded cosine desc, vec_id); the vote
    is (count desc, label asc) — every tie broken on an integer.

    Scale: the query block broadcasts (bounded by construction); the
    corpus side streams through the scan exactly as
    ``cosine_topk_bruteforce`` — and at production scale the corpus arm
    swaps to the registered IVF/LSH probe joins, which is what
    ``ann_recall_audit`` prices."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "label", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    queries = base.filter(F.col("vec_id") < KNN_LOO_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    cos = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    neighbors = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "q_label", "label", "vec_id",
            F.round(cos, 6).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= KNN_LOO_K)
    )
    votes = neighbors.groupBy("q_id", "q_label", "label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w_vote = Window.partitionBy("q_id").orderBy(
        F.desc("votes"), F.col("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(w_vote))
        .filter(F.col("vr") == 1)
        .select(
            "q_id",
            F.col("q_label").cast("long").alias("label_true"),
            F.col("label").cast("long").alias("label_pred"),
            F.col("votes").cast("long").alias("votes"),
            (F.col("label") == F.col("q_label")).cast("long").alias("correct"),
        )
        .orderBy("q_id")
    )


QUERIES["sim_knn_loo_classify"] = sim_knn_loo_classify

ORACLE_SQL["sim_knn_loo_classify"] = f"""
    WITH q AS (
        SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
        FROM embeddings WHERE vec_id < {KNN_LOO_QUERIES}),
    scored AS (
        SELECT q.q_id, q.q_label, e.label, e.vec_id,
               ROUND({_cos_sql('q.q_emb', 'e.embedding')}, 6) AS cosine
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
    ranked AS (
        SELECT q_id, q_label, label,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored),
    votes AS (
        SELECT q_id, q_label, label, CAST(COUNT(*) AS BIGINT) AS votes
        FROM ranked WHERE rnk <= {KNN_LOO_K}
        GROUP BY 1, 2, 3),
    pick AS (
        SELECT q_id, q_label, label, votes,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY votes DESC, label) AS vr
        FROM votes)
    SELECT q_id,
           CAST(q_label AS BIGINT) AS label_true,
           CAST(label AS BIGINT) AS label_pred,
           votes,
           CAST(label = q_label AS BIGINT) AS correct
    FROM pick WHERE vr = 1
    ORDER BY q_id
"""


#: MMR re-ranking: trade-off weight, candidate pool, selected count.
#: The (1-lambda) multiplier is a SHARED literal (round-9 ADVICE): the
#: computed ``1.0 - 0.7`` double is 0.30000000000000004 — one ulp above
#: the parsed literal 0.3 — and MMR scores on 6-dp grids can land
#: exactly on 1e-7 round half-boundaries, so both engines must use the
#: SAME double verbatim (the repo's shared-literal convention for
#: critical values).
MMR_LAMBDA = 0.7
MMR_ONE_MINUS_LAMBDA = 0.3
MMR_POOL = 20
MMR_K = 5


def rag_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    SIGIR'98) of the dense top-20: greedily select 5 results maximizing
    ``lambda * sim(q,d) - (1-lambda) * max_{s in S} sim(d,s)`` — the
    diversity-aware selection every production RAG stack applies after
    retrieval so the context window isn't five near-duplicates of the
    same passage.  Completes the retrieval shelf: recall (ANN), fusion
    (RRF), and now redundancy control.

    The greedy loop is UNROLLED to MMR_K deterministic steps (the
    PageRank fixed-iteration convention): each step is an anti-join of
    the 20-candidate pool against the selected set, a max-similarity
    fold, and a fully tie-broken argmax — all on broadcast-sized
    frames, so plan depth is fixed and the oracle expresses the same
    five steps as chained CTEs.  All similarities are 6-dp rounded
    BEFORE any comparison; every tie breaks on vec_id.

    Scale: the data-sized stage is the one top-20 TakeOrdered over the
    corpus (swap: the registered IVF/LSH probe); everything after
    operates on pool^2 = 400 rows regardless of corpus size."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir)
    base = e.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("norm")
    )
    qrow = base.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm")
    )
    cos_q = _dot(F.col("q_emb"), F.col("embedding")) / (
        F.col("q_norm") * F.col("norm")
    )
    topk = (
        base.crossJoin(F.broadcast(qrow))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "embedding",
            "norm",
            F.round(cos_q, 6).alias("simq"),
        )
        .orderBy(F.desc("simq"), "vec_id")
        .limit(MMR_POOL)
        .localCheckpoint()
    )
    a = topk.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("a_emb"),
        F.col("norm").alias("a_norm"),
    )
    pool_b = topk.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("b_emb"),
        F.col("norm").alias("b_norm"),
    )
    sim_ab = _dot(F.col("a_emb"), F.col("b_emb")) / (
        F.col("a_norm") * F.col("b_norm")
    )
    sims = (
        a.crossJoin(F.broadcast(pool_b))
        .filter(F.col("a") != F.col("b"))
        .select("a", "b", F.round(sim_ab, 6).alias("sim"))
        .localCheckpoint()
    )
    cand = topk.select("vec_id", "simq")
    lam, one_m = F.lit(MMR_LAMBDA), F.lit(MMR_ONE_MINUS_LAMBDA)
    selected = (
        cand.orderBy(F.desc("simq"), "vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("long").alias("rank"),
            "vec_id",
            "simq",
            F.round(lam * F.col("simq"), 6).alias("mmr_score"),
        )
    )
    for step in range(2, MMR_K + 1):
        sel_ids = selected.select(F.col("vec_id").alias("b"))
        remaining = cand.join(
            selected.select("vec_id"), "vec_id", "left_anti"
        )
        red = (
            sims.join(sel_ids, "b")
            .groupBy(F.col("a").alias("vec_id"))
            .agg(F.max("sim").alias("red"))
        )
        scored = remaining.join(red, "vec_id").select(
            "vec_id",
            "simq",
            F.round(lam * F.col("simq") - one_m * F.col("red"), 6).alias(
                "mmr_score"
            ),
        )
        pick = (
            scored.orderBy(F.desc("mmr_score"), "vec_id")
            .limit(1)
            .select(
                F.lit(step).cast("long").alias("rank"),
                "vec_id",
                "simq",
                "mmr_score",
            )
        )
        selected = selected.unionAll(pick)
    return selected.orderBy("rank")


QUERIES["rag_mmr_rerank"] = rag_mmr_rerank


def _mmr_sql() -> str:
    """Mirror of rag_mmr_rerank: the same five greedy steps as chained
    CTEs over the same rounded similarities."""
    lam, om = MMR_LAMBDA, MMR_ONE_MINUS_LAMBDA
    steps = []
    steps.append(
        f"""s1 AS (
        SELECT CAST(1 AS BIGINT) AS rank, vec_id, simq,
               ROUND({lam} * simq, 6) AS mmr_score
        FROM cand ORDER BY simq DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id FROM s1)"""
    )
    for i in range(2, MMR_K + 1):
        steps.append(
            f"""p{i} AS (
        SELECT c.vec_id, c.simq,
               ROUND({lam} * c.simq - {om} * (
                   SELECT MAX(s.sim) FROM sims s
                   JOIN sel{i-1} t ON s.b = t.vec_id
                   WHERE s.a = c.vec_id), 6) AS mmr_score
        FROM cand c
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i-1})),
    s{i} AS (
        SELECT CAST({i} AS BIGINT) AS rank, vec_id, simq, mmr_score
        FROM p{i} ORDER BY mmr_score DESC, vec_id LIMIT 1),
    sel{i} AS (SELECT vec_id FROM sel{i-1}
               UNION ALL SELECT vec_id FROM s{i})"""
        )
    union = "\n        UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(1, MMR_K + 1)
    )
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH q AS (
        SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
    topk AS (
        SELECT e.vec_id, e.embedding,
               ROUND({_cos_sql('q.q_emb', 'e.embedding')}, 6) AS simq
        FROM embeddings e CROSS JOIN q
        WHERE e.vec_id <> 0
        ORDER BY simq DESC, vec_id LIMIT {MMR_POOL}),
    cand AS (SELECT vec_id, simq FROM topk),
    sims AS (
        SELECT x.vec_id AS a, y.vec_id AS b,
               ROUND({_cos_sql('x.embedding', 'y.embedding')}, 6) AS sim
        FROM topk x JOIN topk y ON x.vec_id <> y.vec_id),
    {steps_sql}
    SELECT rank, vec_id, simq, mmr_score FROM (
        {union})
    ORDER BY rank
"""


ORACLE_SQL["rag_mmr_rerank"] = _mmr_sql()


#: k-means++ seeding: number of seeds, micro-unit grid, and the
#: md5-derived uniforms — PURE functions of the literal round tag
#: (md5("kmpp|r"), 52 bits), precomputed here in Python and embedded
#: as the SAME double literal in both engines (the HOLT_DAMP_SUM7
#: shared-literal discipline; no engine-side RNG anywhere).
KMPP_K = 4
KMPP_SCALE = 1_000_000


def _kmpp_uniform(r: int) -> float:
    import hashlib

    h = hashlib.md5(f"kmpp|{r}".encode()).hexdigest()[:13]
    return (int(h, 16) + 1.0) / (2.0**52 + 1.0)


def ml_kmeanspp_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC k-means++ seeding (Arthur & Vassilvitskii 2007)
    over the embedding corpus — the initialization primitive the
    cluster shelf was missing: `ml_kmeans_lloyd_step` iterates FROM
    centroids, `dedup_semdedup_kmeans` and `ann_ivf_kmeans` consume
    pinned ones; this operator PRODUCES them with the D^2-weighted
    seeding that gives k-means its O(log k) approximation guarantee.
    Round 1 picks uniformly; each later round computes every vector's
    squared distance to its nearest chosen seed (exact BIGINT on the
    micro-unit grid) and picks the first vector (in vec_id order)
    whose cumulative D^2 weight crosses u_r x total — inverse-CDF
    sampling with md5-derived uniforms, so the SAME seeds come out on
    any engine, partitioning, or rerun, and the oracle replays the
    draw exactly.

    Emitted per round: the chosen vec_id, its D^2 weight at selection
    (0 for the uniform first pick) and the round's total weight — the
    trace a seeding audit wants (weights collapse toward 0 as seeds
    cover the space).

    Scale: each round is one narrow pass (distances to <= k broadcast
    seeds, exact longs) plus a cumulative-sum selection.  The cumsum
    runs in ONE vec_id-ordered window — the rank-stats module-note
    single-sort bound; the documented 100 TB swap is the two-level
    prefix sum (per-partition totals broadcast as offsets), which
    changes no arithmetic.  k is a constant, so the unrolled plan and
    the oracle stay finite."""
    from pyspark.sql import Window

    e = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * KMPP_SCALE, 0).cast(
                "long"
            ),
        ).alias("q"),
    )
    w = Window.orderBy("vec_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)

    # round 1: uniform pick by row index
    u1 = _kmpp_uniform(1)
    tot1 = e.agg(F.count(F.lit(1)).alias("n_vec"))
    pick1 = (
        e.crossJoin(F.broadcast(tot1))
        .select(
            "vec_id",
            "q",
            "n_vec",
            F.row_number().over(w).alias("rn"),
        )
        .where(
            F.col("rn")
            == F.floor(F.lit(u1) * F.col("n_vec")).cast("int") + 1
        )
        .limit(1)
        .select("vec_id", "q", F.col("n_vec").cast("long").alias("totw"))
        .localCheckpoint()
    )

    def _d2(qcol, ccol):
        return F.aggregate(
            F.zip_with(qcol, ccol, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    picks = [pick1]
    summaries = [
        pick1.select(
            F.lit(1).alias("round"),
            "vec_id",
            F.lit(0).cast("long").alias("d2_at_pick"),
            F.col("totw").alias("total_weight"),
        )
    ]
    centers = pick1.select(F.col("q").alias("c_1"))
    for r in range(2, KMPP_K + 1):
        u_r = _kmpp_uniform(r)
        # Materialized ONCE per round (round 12, guide §2.4): the
        # round's pick job consumed ``scored`` twice — under the totr
        # broadcast AND under the cumsum window — with no shared
        # exchange between them, so the corpus x (r-1) distance-kernel
        # pass ran twice per round.  Rows are the same narrow
        # (vec_id, q, w_i) payload the global window shuffles anyway.
        scored = e.crossJoin(F.broadcast(centers)).select(
            "vec_id",
            "q",
            (
                _d2(F.col("q"), F.col("c_1"))
                if r == 2
                else F.least(
                    *[
                        _d2(F.col("q"), F.col(f"c_{j}"))
                        for j in range(1, r)
                    ]
                )
            ).alias("w_i"),
        ).localCheckpoint()
        totr = scored.agg(F.sum("w_i").alias("totw"))
        pick_r = (
            scored.crossJoin(F.broadcast(totr))
            .select(
                "vec_id",
                "q",
                "w_i",
                "totw",
                F.sum("w_i").over(wcum).alias("cum"),
            )
            .where(
                F.col("cum").cast("double")
                >= F.lit(u_r) * F.col("totw").cast("double")
            )
            .orderBy("vec_id")
            .limit(1)
            .localCheckpoint()
        )
        picks.append(pick_r)
        summaries.append(
            pick_r.select(
                F.lit(r).alias("round"),
                "vec_id",
                F.col("w_i").alias("d2_at_pick"),
                F.col("totw").alias("total_weight"),
            )
        )
        centers = centers.crossJoin(
            F.broadcast(pick_r.select(F.col("q").alias(f"c_{r}")))
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("round")


QUERIES["ml_kmeanspp_init"] = ml_kmeanspp_init


def _kmpp_sql() -> str:
    q = (
        "LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE)"
        f" * {KMPP_SCALE}, 0) AS BIGINT))"
    )

    def d2(c_cte: str) -> str:
        # bound derived from the actual vector length (not a bare 64) so
        # the oracle cannot silently desync from the Spark side's
        # zip_with if the fixture dimension ever changes (r11 ADVICE)
        return (
            "LIST_REDUCE(LIST_TRANSFORM(generate_series(1, LEN(e.q)), i -> "
            f"(e.q[CAST(i AS INT)] - {c_cte}.c[CAST(i AS INT)])"
            f" * (e.q[CAST(i AS INT)] - {c_cte}.c[CAST(i AS INT)])), "
            "(a, b) -> a + b)"
        )

    parts = [
        f"""
    ev AS (
        SELECT vec_id, {q} AS q FROM embeddings),
    tot1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vec FROM ev),
    idx1 AS (
        SELECT vec_id, q,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM ev),
    pick1 AS (
        SELECT i.vec_id, i.q, t.n_vec AS totw
        FROM idx1 i CROSS JOIN tot1 t
        WHERE i.rn = CAST(FLOOR({_kmpp_uniform(1)!r} * t.n_vec) AS BIGINT)
                     + 1
        LIMIT 1),
    c1 AS (SELECT q AS c FROM pick1)"""
    ]
    for r in range(2, KMPP_K + 1):
        mins = ", ".join(d2(f"c{j}") for j in range(1, r))
        least = f"LEAST({mins})" if r > 2 else mins
        joins = " ".join(f"CROSS JOIN c{j}" for j in range(1, r))
        parts.append(f"""
    sc{r} AS (
        SELECT e.vec_id, e.q, {least} AS w_i
        FROM ev e {joins}),
    tot{r} AS (SELECT CAST(SUM(w_i) AS BIGINT) AS totw FROM sc{r}),
    cum{r} AS (
        SELECT vec_id, q, w_i,
               SUM(w_i) OVER (ORDER BY vec_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum
        FROM sc{r}),
    pick{r} AS (
        SELECT s.vec_id, s.q, s.w_i, t.totw
        FROM cum{r} s CROSS JOIN tot{r} t
        WHERE CAST(s.cum AS DOUBLE)
              >= {_kmpp_uniform(r)!r} * CAST(t.totw AS DOUBLE)
        ORDER BY s.vec_id LIMIT 1),
    c{r} AS (SELECT q AS c FROM pick{r})""")
    unions = "\n    UNION ALL ".join(
        [
            "SELECT 1 AS round, vec_id, CAST(0 AS BIGINT) AS d2_at_pick,"
            " totw AS total_weight FROM pick1"
        ]
        + [
            f"SELECT {r}, vec_id, CAST(w_i AS BIGINT), totw FROM pick{r}"
            for r in range(2, KMPP_K + 1)
        ]
    )
    return (
        "\n    WITH "
        + ",".join(parts)
        + f"\n    {unions}\n    ORDER BY round\n"
    )


ORACLE_SQL["ml_kmeanspp_init"] = _kmpp_sql()
