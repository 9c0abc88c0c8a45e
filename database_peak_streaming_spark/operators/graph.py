"""Graph analytics over relational edge lists: fixed-iteration PageRank.

The engine already has the other canonical distributed-graph kernel —
transitive closure / connected components (operators/dedup.py, label
propagation with localCheckpoint lineage cuts).  This module adds the
power-iteration family: rank flows along edges via join + groupBy, the
exact shape a 100 TB web/citation graph runs (GraphX's and GraphFrames'
PageRank lower to the same join-aggregate loop over an edge DataFrame).

Scale design: each iteration is ONE shuffle (edges join ranks on src,
aggregate on dst).  The edge list is the big table and its partitioning
on ``src`` is reusable across iterations; degrees are precomputed once.
A fixed iteration count keeps the plan finite and oracle-expressible
(the DuckDB oracle unrolls the same three iterations as CTEs — same
arithmetic, same damping, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 3
TOP_K = 20


def graph_pagerank_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85) on the customer—supplier
    bipartite graph induced by orders x lineitem: an undirected edge
    links a customer to every supplier that filled one of their orders.

    Node set = customers U suppliers (prefixed ids so the two key
    spaces can't collide); undirected = each edge materialized in both
    directions, so every node has out-degree >= 1 and there is no
    dangling-mass term.  rank'(v) = (1-d)/N + d * sum over in-edges
    (u,v) of rank(u)/deg(u).

    Plan: edges built once (distinct pairs — one shuffle), degrees once,
    then 3x [join on src + groupBy dst] — the per-iteration shuffle is
    on the same key each time, so a real cluster reuses the exchange.
    N enters the plan as a broadcast scalar (crossJoin of a 1-row agg,
    the scans.py:64 pattern — nothing pulled to the driver).  Output:
    top-20 nodes by rank rounded to 6dp (rounded BEFORE the sort so the
    order is reproducible across engines' float summation orders),
    tie-broken on node id."""
    ranks = pagerank_ranks(spark, sf_dir)
    return (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(TOP_K)
    )


def bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected customer—supplier edge list (src, dst), each edge in
    both directions, node ids prefixed 'c:'/'s:' so the key spaces
    can't collide.  Shared by PageRank and the degree histogram."""
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("cnode"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("snode"),
        )
        .distinct()
    )
    return pairs.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionAll(pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst")))


def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the bipartite graph, split by side — the
    first diagnostic run on any production graph (skew in this
    histogram is what breaks naive PageRank/CC partitioning; a
    power-law tail here motivates the salting in operators/skew.py).
    Two narrow shuffles: degree per node, then count per (side,
    degree)."""
    edges = bipartite_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy(
            F.substring("src", 1, 1).alias("side"), "degree"
        )
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("side", "degree")
    )


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the PART co-occurrence graph (an edge links
    two parts bought in the same order) — the clustering /
    community-density primitive the bipartite modules above can't have
    (bipartite graphs are triangle-free by construction).  Parts, not
    suppliers, because the part key space is large enough that the
    graph stays sparse (~0.1% density at sf0.1) — the supplier
    co-occurrence graph saturates to near-complete, where triangle
    counting degenerates to C(n,3).

    Algorithm: degree-ordered edge orientation (the standard
    distributed-triangle design, cf. Suri & Vassilvitskii "Counting
    triangles and the curse of the last reducer", WWW'11): orient every
    undirected edge from its (degree, id)-smaller endpoint to the
    larger, enumerate wedges from each node's out-neighbors, and close
    them against the undirected edge set.  Orientation bounds every
    node's out-degree by O(sqrt(m)) regardless of how skewed the raw
    degree distribution is — the wedge explosion a hub node causes in
    the naive a<b<c formulation cannot happen, which is exactly the
    100 TB concern.  Three narrow shuffles (edges, degrees, wedge
    join) + the closing equi-join; nothing all-pairs.

    The ORACLE counts the same triangles with the naive id-ordered
    a<b<c SQL (triangle count is orientation-invariant, so the simple
    form is the right cross-engine check even though its worst-case
    shuffle volume is worse)."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        # edge list is consumed FOUR times (degrees, both orientation
        # joins, the closing join) — materialize once and cut lineage,
        # exactly the pagerank_ranks pattern, or the static plan
        # repeats the order-pair build under every consumer
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # Shuffled-hash for both orientation joins (round 12, guide §3.1 —
    # the closing-join precedent): SMJ would sort the |E|-row und stream
    # against each |V|-row degree table; hashing the degree side leaves
    # the edge stream unsorted (|E| >= |V| structurally).
    ranked = und.join(du.hint("shuffle_hash"), "u").join(
        dv.hint("shuffle_hash"), "v"
    )
    # total order on nodes: (degree, id); orient small -> large
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias(
            "dst_deg"
        ),
    )
    e1 = oriented.select("src", F.col("dst").alias("b"), F.col("dst_deg").alias("deg_b"))
    e2 = oriented.select("src", F.col("dst").alias("c"), F.col("dst_deg").alias("deg_c"))
    # Pair-keyed repartition at the core/shuffle width before the
    # closing join (round 13, guide §2.2 — the proven linkpred/adamic-
    # adar treatment): the wedge stream is two longs per row, so AQE's
    # byte-based coalescing collapsed the closing join — the query's
    # dominant CPU stage — to the configured shuffle width regardless
    # of cores.  Keyed (u, v) so the join reuses this exchange and no
    # extra shuffle appears; shuffle_hash on the |E|-row edge side so
    # the wedge stream is never sorted (SMJ would sort the big side).
    from database_peak_streaming_spark.sources.batch import compute_width

    n_part = compute_width(spark)
    wedges = (
        e1.join(e2, "src")
        .where(
            (F.col("deg_b") < F.col("deg_c"))
            | ((F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c")))
        )
        .select(
            F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")
        )
        .repartition(n_part, "u", "v")
    )
    tri = wedges.join(und.hint("shuffle_hash"), ["u", "v"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    stats = und.agg(F.count(F.lit(1)).alias("n_edges"))
    total = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        tri.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(stats))
        .select("n_triangles", "n_nodes", "n_edges")
    )


#: Bounded round count the k-core oracle unrolls, and the adaptive
#: coreness threshold k = floor(KCORE_MEAN_FRAC x mean initial degree).
#: Adaptive because a fixture-shaped co-occurrence graph has mean
#: degree ~116 at sf0.01: any small fixed k peels nothing (the query
#: would be a degree scan in disguise).  The fraction is calibrated,
#: not arbitrary: at 1.0x mean the peel CASCADES TO EMPTY on every
#: fixture SF (removing the below-mean half guts the survivors'
#: degrees too), at 0.9x likewise, while 0.75x extracts a genuine
#: dense core everywhere (187/200, 1516/2000, 14459/20000 survivors at
#: sf0.001/0.01/0.1) and keeps self-tuning with corpus growth.  A
#: FIXED round count is what keeps the query oracle-able as plain
#: unrolled SQL; the early-exit below never changes the result, only
#: skips identity rounds.
KCORE_ROUNDS = 4
KCORE_MEAN_FRAC = 0.75


#: link-prediction output size and evidence floor
LINKPRED_TOP_K = 20
LINKPRED_MIN_CN = 2


def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor Jaccard on the sparse PART
    co-occurrence graph: the top-K NON-adjacent part pairs most likely
    to co-occur next, scored J(u,v) = |N(u) ∩ N(v)| /
    (deg(u) + deg(v) - |N(u) ∩ N(v)|) — the classic
    recommend-the-missing-edge primitive (frequently-bought-together
    candidates the basket rules miss because the pair never co-occurred
    yet).

    Plan: wedges enumerate from each middle node's adjacency (volume
    sum_m C(deg(m), 2) — bounded on this deliberately sparse graph;
    at heavy skew the same degree-ordered orientation as
    `graph_triangle_count` or a degree cap applies), one groupBy
    counts common neighbors, an anti-join removes existing edges, and
    the K-row ranking runs on candidates with >= MIN_CN shared
    neighbors only.  Jaccard is an exact small-denominator rational
    evaluated identically by both engines; ranking uses the rounded
    score with a full (u, v) tie-break."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    adj = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("mid"), F.col("v").alias("nbr"))
    deg = adj.groupBy(F.col("mid").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    w1 = adj.select("mid", F.col("nbr").alias("x"))
    w2 = adj.select("mid", F.col("nbr").alias("y"))
    # Same explicit pair-keyed repartition as the Adamic-Adar twin
    # (round 12, guide §2.5): ~101M distinct pairs from ~148M wedges at
    # sf0.1 means map-side combining reduces almost nothing, and the
    # configured shuffle width capped the dominant aggregation's
    # parallelism; the groupBy reuses this exchange (same keys).
    from database_peak_streaming_spark.sources.batch import compute_width

    n_part = compute_width(spark)
    cn = (
        w1.join(w2, "mid")
        .where(F.col("x") < F.col("y"))
        .select(F.col("x").alias("u"), F.col("y").alias("v"))
        .repartition(n_part, "u", "v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"))
        .where(F.col("cn") >= LINKPRED_MIN_CN)
        .join(und, ["u", "v"], "left_anti")
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    scored = cn.join(du, "u").join(dv, "v").select(
        "u",
        "v",
        F.col("cn").cast("long").alias("cn"),
        F.col("deg_u").cast("long").alias("deg_u"),
        F.col("deg_v").cast("long").alias("deg_v"),
        F.round(
            F.col("cn")
            / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
            6,
        ).alias("jaccard"),
    )
    wnd = Window.orderBy(F.col("jaccard").desc(), "u", "v")
    return (
        scored.withColumn("rnk", F.row_number().over(wnd).cast("long"))
        .where(F.col("rnk") <= LINKPRED_TOP_K)
        .select("rnk", "u", "v", "cn", "deg_u", "deg_v", "jaccard")
        .orderBy("rnk")
    )


def graph_adamic_adar_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by ADAMIC-ADAR (Adamic & Adar 2003) on the same
    part co-occurrence graph as ``graph_link_prediction_jaccard``:
    AA(u,v) = sum over common neighbors m of 1/ln(deg(m)) — the
    standard refinement that discounts promiscuous hubs (a shared
    neighbor of degree 200 is weak evidence; one of degree 3 is
    strong), which plain common-neighbor counts and Jaccard both miss.
    Emitted beside cn so the two rankings are directly comparable.

    Determinism: each wedge's weight is 1/LN over an exact BIGINT
    degree (the MI discipline — libm ulps only); per-(u,v) weights SUM
    via the fixed-order fold convention (mid-sorted array,
    ``F.aggregate`` / LIST_REDUCE) since float addition is not
    associative.  deg(m) >= 2 for every wedge middle by construction
    (a wedge needs two distinct neighbors), so LN never sees 1.

    Scale: identical wedge enumeration and candidate anti-join as the
    Jaccard twin — sum_m C(deg(m), 2) wedges, one groupBy, nothing
    all-pairs.  That wedge volume is intrinsic to EXACT middle-based
    pair scoring; the production lever when hubs make it prohibitive
    is ``graph_adamic_adar_hubcap`` below."""
    return _adamic_adar(spark, sf_dir, max_mid_deg=None)


#: Hub cap for ``graph_adamic_adar_hubcap``: wedge middles with degree
#: above this are skipped.  Bounded loss: every skipped wedge's weight
#: is 1/ln(deg) < 1/ln(CAP) (deg > CAP), so a pair that loses k wedges
#: loses < k/ln(CAP) score — the standard production trade (hubs carry
#: the least Adamic-Adar evidence per wedge BY CONSTRUCTION of the
#: 1/ln discount, and contribute the most wedges: C(deg, 2) each).
#: 100 cuts the sf0.1 wedge volume 147.8M -> 17.2M (8.6x) while
#: 672k candidate pairs survive; under the bench's copy scaling the
#: per-copy degree distribution is invariant (disjoint graph copies),
#: so the cap's selectivity is scale-stable.  At true 100 TB scale the
#: cap would be set from the degree distribution (e.g. p99) — a cheap
#: pre-aggregation — but the constant keeps the oracle static.
ADAMIC_ADAR_HUB_CAP = 100


def graph_adamic_adar_hubcap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction with the HUB-CAPPED wedge
    enumeration: middles with deg > ``ADAMIC_ADAR_HUB_CAP`` contribute
    no wedges.  Same candidate anti-join, same fixed-order weight fold,
    same top-k as the exact twin; ``cn`` counts CAPPED wedges, so the
    min-cn gate is on surviving evidence.  The loss bound (each
    skipped wedge < 1/ln(CAP) score) is pinned numerically by
    tests/test_round11_ops.py::test_adamic_adar_hubcap_loss_bound.

    Scale: wedge volume drops from sum_m C(deg(m), 2) to the same sum
    over deg <= CAP middles only — the term that explodes (hubs are
    quadratic in their own degree) is exactly the term removed, and
    the filter lands BEFORE the wedge self-join, so the blow-up never
    materializes."""
    return _adamic_adar(spark, sf_dir, max_mid_deg=ADAMIC_ADAR_HUB_CAP)


def _adamic_adar(
    spark: SparkSession, sf_dir: str, max_mid_deg: int | None
) -> DataFrame:
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    adj = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).select(F.col("u").alias("mid"), F.col("v").alias("nbr"))
    deg = adj.groupBy(F.col("mid").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if max_mid_deg is not None:
        # Cap BEFORE the wedge self-join: the kept-middle set is a
        # semi-join on the (node-sized) degree table, so hub wedges
        # are never enumerated, not enumerated-then-filtered.
        deg = deg.where(F.col("deg") <= F.lit(max_mid_deg))
        adj = adj.join(
            deg.select(F.col("node").alias("mid")), "mid"
        )
    w1 = adj.select("mid", F.col("nbr").alias("x"))
    w2 = adj.select("mid", F.col("nbr").alias("y"))
    # The per-(u,v) weight fold must replay in mid order (float addition
    # is not associative; the oracle LIST_REDUCEs a mid-sorted list), so
    # every wedge's (mid, deg) rides the groupBy shuffle into a
    # collect_list.  Round 12 (guide §2.3 — narrower types): pack the
    # pair into ONE long, ``mid * 2^32 + deg`` — sorting the packed
    # longs IS the mid sort (deg is constant per mid), and the fold
    # recovers deg with a mask and recomputes w = 1/ln(deg) from the
    # same exact integer, so every partial sum is bit-identical to the
    # struct form's.  vs struct<mid,w>: ~3x fewer shuffled bytes for
    # the wedge-volume exchange (the query's dominant stage: 1.88 GB ->
    # ~0.6 GB at sf0.1) and no per-wedge struct alloc.  Bounds: deg <
    # 2^32 always (it counts neighbors); mid < 2^31 is REQUIRED for the
    # pack to preserve sort order (the sign bit flips above it) and is
    # enforced at runtime below (round-13, ADVICE ask): the guard rides
    # the |V|-sized degree projection — one integer compare per node,
    # nothing wedge-volume — and fails the job loudly instead of
    # silently corrupting aa_score.  A deployment with wider ids would
    # widen the pack to (mid, deg) structs again or renumber ids first.
    packed = (F.col("mid") * F.lit(4294967296)) + F.col("deg")
    mid_checked = F.when(
        F.assert_true(
            F.col("node") < F.lit(2147483648),
            F.lit(
                "adamic-adar packed-long fold requires node ids < 2^31; "
                "widen the pack to struct<mid,deg> or renumber ids"
            ),
        ).isNull(),
        F.col("node"),
    ).alias("mid")
    # Explicit pair-keyed repartition at the core/shuffle width (round
    # 12, guide §2.5): the wedge aggregation is the query's dominant
    # stage and collect_list gets no map-side reduction (avg wedges per
    # pair ~1.5 at sf0.1), so the partial/final split buys nothing
    # while the configured shuffle width caps its parallelism.  The
    # groupBy below reuses this exchange (same keys), so the plan still
    # shuffles the wedge stream exactly once.
    from database_peak_streaming_spark.sources.batch import compute_width

    n_part = compute_width(spark)
    wedges = (
        w1.join(w2, "mid")
        .where(F.col("x") < F.col("y"))
        .join(deg.select(mid_checked, "deg"), "mid")
        .select(
            F.col("x").alias("u"),
            F.col("y").alias("v"),
            packed.alias("mw"),
        )
        .repartition(n_part, "u", "v")
    )
    el_w = lambda e: F.lit(1.0) / F.log(  # noqa: E731 — w from packed deg
        e.bitwiseAND(F.lit(4294967295)).cast("double")
    )
    cn = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.array_sort(F.collect_list("mw")).alias("sv"),
        )
        .where(F.col("cn") >= LINKPRED_MIN_CN)
        .join(und, ["u", "v"], "left_anti")
        .select(
            "u",
            "v",
            F.col("cn").cast("long").alias("cn"),
            F.round(
                F.aggregate("sv", F.lit(0.0), lambda acc, e: acc + el_w(e)),
                6,
            ).alias("aa_score"),
        )
    )
    wnd = Window.orderBy(F.col("aa_score").desc(), "u", "v")
    return (
        cn.withColumn("rnk", F.row_number().over(wnd).cast("long"))
        .where(F.col("rnk") <= LINKPRED_TOP_K)
        .select("rnk", "u", "v", "cn", "aa_score")
        .orderBy("rnk")
    )


def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core extraction by iterative peeling on the sparse
    part co-occurrence graph: k = floor(KCORE_MEAN_FRAC x mean initial
    degree — see the calibration note on the constants), then repeat
    ``KCORE_ROUNDS`` times { compute degrees, drop nodes with
    degree < k, drop their edges }; return each surviving node with its
    within-core degree — the fourth distributed graph kernel beside
    connected components (operators/dedup.py), PageRank, and triangle
    counting.

    Scale design: each round is one node-keyed degree aggregation plus
    two semi-joins of the (shrinking) edge list against the (shrinking)
    keep set — the textbook distributed peel, nothing all-pairs, and
    the edge list is localCheckpointed per round so the static plan
    doesn't re-derive round i-1 under every round-i consumer (the same
    lineage-cut pattern as the CC fixpoint and pagerank_ranks).  The
    threshold is a 1-row broadcast scalar (never a driver pull); its
    long/long division is IEEE double division of identical exact
    operands on both engines, so the floored k is bit-identical."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    deg0 = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Materialized ONCE (round 12 — the k-truss ``thr`` twin): every
    # round's broadcast re-derived this 1-row scalar, and broadcast
    # exchanges are not reused ACROSS the per-round count() jobs, so
    # the full |E|-sized deg0 aggregation re-ran every peel round.
    threshold = deg0.agg(
        F.floor(F.sum("deg") * F.lit(KCORE_MEAN_FRAC) / F.count(F.lit(1))).alias(
            "k"
        )
    ).localCheckpoint()
    # Early exit when a round removes no edge: peeling is monotone, so
    # a no-change round makes every later round an identity — the
    # result is EXACTLY the full KCORE_ROUNDS unroll the oracle runs,
    # minus the dead rounds.  The count() is a cheap job over the
    # just-materialized checkpoint partitions (the same bounded
    # driver-side convergence probe as the CC fixpoint).
    prev_edges = edges.count()
    for _ in range(KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = (
            deg.crossJoin(F.broadcast(threshold))
            .where(F.col("deg") >= F.col("k"))
            .select("node")
        )
        edges = (
            edges.join(keep, edges["u"] == keep["node"], "left_semi")
            .join(keep, F.col("v") == keep["node"], "left_semi")
            .localCheckpoint()
        )
        n_edges = edges.count()
        if n_edges == prev_edges:
            break
        prev_edges = n_edges
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .orderBy("node")
    )


def _kcore_sql() -> str:
    """Unrolled bounded-peel oracle: the mean-degree threshold CTE,
    then one (degree, keep, edge) CTE trio per round, generated to stay
    literally in lockstep with ``KCORE_ROUNDS``.  MATERIALIZED is
    load-bearing: inlined, each round references the previous one
    several times and the plan grows exponentially across rounds
    (measured 103 s -> 0.5 s at sf0.01)."""
    parts = [
        f"""
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        d1 AS MATERIALIZED (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT u AS node FROM e0
                UNION ALL SELECT v FROM e0)
            GROUP BY node),
        kthr AS MATERIALIZED (
            SELECT CAST(FLOOR(SUM(deg) * {KCORE_MEAN_FRAC} / COUNT(*))
                        AS BIGINT) AS k
            FROM d1)"""
    ]
    for i in range(1, KCORE_ROUNDS + 1):
        if i > 1:
            parts.append(
                f""",
        d{i} AS MATERIALIZED (
            SELECT node, COUNT(*) AS deg FROM (
                SELECT u AS node FROM e{i - 1}
                UNION ALL SELECT v FROM e{i - 1})
            GROUP BY node)"""
            )
        parts.append(
            f""",
        k{i} AS MATERIALIZED (
            SELECT node FROM d{i}, kthr WHERE deg >= kthr.k),
        e{i} AS MATERIALIZED (
            SELECT u, v FROM e{i - 1}
            WHERE u IN (SELECT node FROM k{i})
              AND v IN (SELECT node FROM k{i}))"""
        )
    parts.append(
        f"""
        SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM e{KCORE_ROUNDS}
            UNION ALL SELECT v FROM e{KCORE_ROUNDS})
        GROUP BY node
        ORDER BY node"""
    )
    return "".join(parts)


def pagerank_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (node, rank) table after ITERATIONS power steps — exposed
    separately so tests can assert the global invariants (rank mass sums
    to 1, every node present) that the top-k query surface hides."""
    edges = bipartite_edges(spark, sf_dir)
    # Materialize the loop-invariant inputs ONCE and cut lineage (the
    # dedup.py:305 CC discipline): without this, iteration k's plan
    # re-embeds the whole edge-build subtree k times over — ~40
    # exchanges in the physical plan at 3 iterations vs ~8 with the
    # cut.  On a cluster with executor loss in scope, swap for a
    # reliable checkpoint(dir); same contract.
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=False)
    # edges ⋈ deg is LOOP-INVARIANT (round 12, guide §2.4): joining it
    # inside the loop re-ran the same |E|-row equi-join every iteration.
    # Materialize (src, dst, deg) once; each iteration is then a single
    # join with the current ranks + the dst groupBy.  The per-row
    # arithmetic stays rank/deg (NOT a precomputed 1/deg weight — that
    # would change the float rounding vs the oracle's SUM(rank/deg)).
    edeg = edges.join(deg, "src").localCheckpoint(eager=False)

    n_df = deg.agg(F.count(F.lit(1)).cast("double").alias("n"))
    ranks = deg.select("src").withColumnRenamed("src", "node").crossJoin(
        F.broadcast(n_df)
    ).select("node", (F.lit(1.0) / F.col("n")).alias("rank"))

    for _ in range(ITERATIONS):
        # Shuffled-hash, not sort-merge, for the power-step join (round
        # 12, guide §3.1 — the graph_clustering_coefficient closing-join
        # precedent): SMJ re-SORTED the |E|-row edeg stream every
        # iteration; hashing the |V|-row ranks side leaves the big side
        # unsorted at every scale (|E| >= |V| structurally — every node
        # has degree >= 1).  (A repartition("src") of edeg before its
        # checkpoint was probed too: the checkpoint does not carry the
        # partitioning into the plan, so it only added an exchange —
        # dropped.)
        contrib = (
            edeg.join(
                ranks.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("inflow"))
        )
        ranks = (
            contrib.crossJoin(F.broadcast(n_df))
            .select(
                F.col("dst").alias("node"),
                (
                    (1.0 - DAMPING) / F.col("n") + DAMPING * F.col("inflow")
                ).alias("rank"),
            )
        )

    return ranks


def _pagerank_sql() -> str:
    """Unrolled 3-iteration oracle: same formula, same rounding-then-
    sorting discipline as the Spark plan."""
    it = """
        r{k} AS (
            SELECT e.dst AS node,
                   (1 - 0.85) / (SELECT n FROM n)
                   + 0.85 * SUM(r.rank / d.deg) AS rank
            FROM edges e
            JOIN deg d ON d.src = e.src
            JOIN r{prev} r ON r.node = e.src
            GROUP BY e.dst
        )"""
    iters = ",".join(
        it.format(k=k, prev=k - 1) for k in range(1, ITERATIONS + 1)
    )
    return f"""
        WITH pairs AS (
            SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cnode,
                            's:' || CAST(l_suppkey AS VARCHAR) AS snode
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        edges AS (
            SELECT cnode AS src, snode AS dst FROM pairs
            UNION ALL
            SELECT snode AS src, cnode AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
        n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        r0 AS (
            SELECT src AS node, 1.0 / (SELECT n FROM n) AS rank FROM deg
        ),{iters}
        SELECT node, ROUND(rank, 6) AS rank
        FROM r{ITERATIONS}
        ORDER BY ROUND(rank, 6) DESC, node
        LIMIT {TOP_K}
    """


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman PRL'02, eq. 4) of the part
    co-occurrence graph — the one-number structural summary that says
    whether hubs link to hubs (r > 0, social-network-like) or to leaves
    (r < 0, hub-and-spoke): the Pearson correlation of endpoint degrees
    over edges.  The diagnostic a pipeline runs BEFORE the triangle /
    k-core passes above, because it predicts their cost profile (a
    disassortative hub graph concentrates wedges).

    Same edge spine as ``graph_triangle_count`` (distinct co-order part
    pairs).  Both directions of each undirected edge enter the sums via
    the symmetric closed form (sum da+db, da^2+db^2, da*db over each
    edge once), so no edge-doubling union is materialized.  Degrees are
    exact BIGINTs; the five cross-edge sums are exact BIGINT (bounded
    by m * max_deg^2); r is computed from them in one identical IEEE
    expression.  Shuffles: the pair build, the degree count, the two
    narrow degree joins — nothing all-pairs."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        # consumed three times (both degree unions + the ends join):
        # materialize once, as in graph_triangle_count
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("da"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("db"))
    ends = und.join(du, "u").join(dv, "v")
    m = ends.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("da") + F.col("db")).alias("s1"),
        F.sum(F.col("da") * F.col("da") + F.col("db") * F.col("db")).alias(
            "s2"
        ),
        F.sum(F.col("da") * F.col("db")).alias("sprod"),
    )
    mm = F.col("m").cast("double")
    mu = F.col("s1") / (2 * mm)
    return m.select(
        F.col("m").cast("long").alias("n_edges"),
        F.round(
            (F.col("sprod") / mm - mu * mu)
            / (F.col("s2") / (2 * mm) - mu * mu),
            6,
        ).alias("assortativity"),
    )


QUERIES = {
    "graph_pagerank_bipartite": graph_pagerank_bipartite,
    "graph_degree_histogram": graph_degree_histogram,
    "graph_triangle_count": graph_triangle_count,
    "graph_kcore_peel": graph_kcore_peel,
    "graph_link_prediction_jaccard": graph_link_prediction_jaccard,
    "graph_adamic_adar_linkpred": graph_adamic_adar_linkpred,
    "graph_adamic_adar_hubcap": graph_adamic_adar_hubcap,
    "graph_degree_assortativity": graph_degree_assortativity,
}
ORACLE_SQL = {
    "graph_adamic_adar_hubcap": f"""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        und AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey),
        adj0 AS MATERIALIZED (
            SELECT u AS mid, v AS nbr FROM und
            UNION ALL
            SELECT v AS mid, u AS nbr FROM und),
        -- deg is the TRUE degree; the cap only excludes middles, it
        -- never changes a kept middle's 1/LN(deg) weight
        deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
                FROM adj0 GROUP BY 1
                HAVING COUNT(*) <= {ADAMIC_ADAR_HUB_CAP}),
        adj AS (SELECT adj0.* FROM adj0
                JOIN deg ON deg.node = adj0.mid),
        wedges AS (
            SELECT w1.nbr AS u, w2.nbr AS v, w1.mid,
                   1.0 / LN(CAST(d.deg AS DOUBLE)) AS w
            FROM adj w1
            JOIN adj w2 USING (mid)
            JOIN deg d ON d.node = w1.mid
            WHERE w1.nbr < w2.nbr),
        cn AS (
            SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
                   ROUND(LIST_REDUCE(LIST(w ORDER BY mid),
                                     (a, x) -> a + x), 6) AS aa_score
            FROM wedges GROUP BY u, v
            HAVING COUNT(*) >= 2),
        cand AS (
            SELECT cn.* FROM cn
            LEFT JOIN und ON und.u = cn.u AND und.v = cn.v
            WHERE und.u IS NULL),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY aa_score DESC, u, v)
                       AS rnk
            FROM cand)
        SELECT CAST(rnk AS BIGINT) AS rnk, u, v, cn, aa_score
        FROM ranked WHERE rnk <= 20 ORDER BY rnk
    """,
    "graph_adamic_adar_linkpred": """
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        und AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey),
        adj AS MATERIALIZED (
            SELECT u AS mid, v AS nbr FROM und
            UNION ALL
            SELECT v AS mid, u AS nbr FROM und),
        deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
                FROM adj GROUP BY 1),
        wedges AS (
            SELECT w1.nbr AS u, w2.nbr AS v, w1.mid,
                   1.0 / LN(CAST(d.deg AS DOUBLE)) AS w
            FROM adj w1
            JOIN adj w2 USING (mid)
            JOIN deg d ON d.node = w1.mid
            WHERE w1.nbr < w2.nbr),
        cn AS (
            SELECT u, v, CAST(COUNT(*) AS BIGINT) AS cn,
                   ROUND(LIST_REDUCE(LIST(w ORDER BY mid),
                                     (a, x) -> a + x), 6) AS aa_score
            FROM wedges GROUP BY u, v
            HAVING COUNT(*) >= 2),
        cand AS (
            SELECT cn.* FROM cn
            LEFT JOIN und ON und.u = cn.u AND und.v = cn.v
            WHERE und.u IS NULL),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY aa_score DESC, u, v)
                       AS rnk
            FROM cand)
        SELECT CAST(rnk AS BIGINT) AS rnk, u, v, cn, aa_score
        FROM ranked WHERE rnk <= 20 ORDER BY rnk
    """,
    "graph_link_prediction_jaccard": """
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        und AS MATERIALIZED (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM li a JOIN li b USING (l_orderkey)
            WHERE a.l_partkey < b.l_partkey),
        adj AS MATERIALIZED (
            SELECT u AS mid, v AS nbr FROM und
            UNION ALL
            SELECT v AS mid, u AS nbr FROM und),
        deg AS (SELECT mid AS node, CAST(COUNT(*) AS BIGINT) AS deg
                FROM adj GROUP BY 1),
        cn AS (
            SELECT w1.nbr AS u, w2.nbr AS v,
                   CAST(COUNT(*) AS BIGINT) AS cn
            FROM adj w1 JOIN adj w2 USING (mid)
            WHERE w1.nbr < w2.nbr
            GROUP BY 1, 2
            HAVING COUNT(*) >= 2),
        cand AS (
            SELECT cn.* FROM cn
            LEFT JOIN und ON und.u = cn.u AND und.v = cn.v
            WHERE und.u IS NULL),
        scored AS (
            SELECT c.u, c.v, c.cn, du.deg AS deg_u, dv.deg AS deg_v,
                   ROUND(c.cn / (du.deg + dv.deg - c.cn), 6) AS jaccard
            FROM cand c
            JOIN deg du ON du.node = c.u
            JOIN deg dv ON dv.node = c.v),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY jaccard DESC, u, v)
                       AS rnk
            FROM scored)
        SELECT CAST(rnk AS BIGINT) AS rnk, u, v, cn, deg_u, deg_v, jaccard
        FROM ranked WHERE rnk <= 20 ORDER BY rnk
    """,
    "graph_pagerank_bipartite": _pagerank_sql(),
    "graph_kcore_peel": _kcore_sql(),
    "graph_triangle_count": """
        WITH und AS (
            SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
            JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM und e1
            JOIN und e2 ON e1.v = e2.u
            JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        nodes AS (
            SELECT COUNT(*) AS n_nodes FROM (
                SELECT u AS node FROM und UNION SELECT v FROM und)),
        edges AS (SELECT COUNT(*) AS n_edges FROM und)
        SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges
        FROM tri, nodes, edges
    """,
    "graph_degree_histogram": """
        WITH pairs AS (
            SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS cnode,
                            's:' || CAST(l_suppkey AS VARCHAR) AS snode
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        ),
        edges AS (
            SELECT cnode AS src, snode AS dst FROM pairs
            UNION ALL
            SELECT snode AS src, cnode AS dst FROM pairs
        ),
        deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
        SELECT substr(src, 1, 1) AS side, degree, COUNT(*) AS n_nodes
        FROM deg
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

ORACLE_SQL["graph_degree_assortativity"] = """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey),
    deg AS (
        SELECT node, COUNT(*) AS deg FROM (
            SELECT u AS node FROM und UNION ALL SELECT v FROM und)
        GROUP BY node),
    ends AS (
        SELECT da.deg AS da, db.deg AS db
        FROM und JOIN deg da ON und.u = da.node
                 JOIN deg db ON und.v = db.node),
    m AS (
        SELECT COUNT(*) AS m, SUM(da + db) AS s1,
               SUM(da * da + db * db) AS s2, SUM(da * db) AS sprod
        FROM ends)
    SELECT CAST(m AS BIGINT) AS n_edges,
           ROUND((sprod / CAST(m AS DOUBLE) - POW(s1 / (2.0 * m), 2.0))
                 / (s2 / (2.0 * m) - POW(s1 / (2.0 * m), 2.0)), 6)
               AS assortativity
    FROM m
"""

#: Label-propagation rounds for ``graph_label_propagation``: 3
#: synchronous rounds is the standard near-convergence budget on
#: small-diameter graphs (LPA converges in a handful of sweeps —
#: Raghavan et al. PRE'07), and a FIXED count keeps the operator
#: deterministic and oracle-expressible (unrolled CTEs).
LP_ITERS = 3


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous LABEL PROPAGATION (Raghavan
    et al. PRE'07) on the customer—supplier bipartite graph: every node
    starts as its own community; each round it adopts the most frequent
    label among its neighbors (ties -> lexicographically smallest, so
    every round is deterministic); after LP_ITERS rounds the label
    groups are the communities.  This is the near-linear-time community
    operator beside `dedup_clusters_cc` (which finds CONNECTED
    components — LPA splits a connected graph into dense regions, a
    strictly finer structure).

    Scale design: each round is ONE join (edges x labels, both keyed by
    node id) + one (node, label) count + one per-node argmax window —
    all shuffles on the node key, reusable across rounds; label state
    is one row per node.  `localCheckpoint` cuts lineage per round
    (the pagerank_ranks discipline) so the plan doesn't nest.  Output
    is the community-size leaderboard (top 20 by size), the shape a
    100 TB run actually materializes.

    Oracle: the same three rounds unrolled as CTEs with the identical
    (count DESC, label ASC) argmax."""
    from pyspark.sql import Window

    edges = bipartite_edges(spark, sf_dir).localCheckpoint()
    labels = _lp_final_labels(edges)
    w_rank = Window.orderBy(F.col("n_members").desc(), F.col("label").asc())
    return (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .withColumn("community_rank", F.row_number().over(w_rank))
        .where(F.col("community_rank") <= 20)
        .select("community_rank", F.col("label").alias("community"), "n_members")
        .orderBy("community_rank")
    )


def _lp_final_labels(edges: DataFrame) -> DataFrame:
    """The synchronous LPA rounds shared by ``graph_label_propagation``
    (community leaderboard) and ``graph_modularity`` (partition-quality
    score): LP_ITERS deterministic (count DESC, label ASC) argmax
    rounds; one (node, label) count + one per-node window per round,
    ``localCheckpoint`` cutting lineage between rounds."""
    from pyspark.sql import Window

    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    )
    w_pick = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(LP_ITERS):
        labels = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(F.col("src").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("rk", F.row_number().over(w_pick))
            .where(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels


def _lp_rounds_cte() -> str:
    """The shared WITH-prefix of the LPA oracles: bipartite edges, l0,
    and the LP_ITERS unrolled rounds (final labels in ``l{LP_ITERS}``)."""
    round_tpl = """
    l{k} AS (
        SELECT node, label FROM (
            SELECT e.src AS node, l.label, COUNT(*) AS c,
                   ROW_NUMBER() OVER (PARTITION BY e.src
                                      ORDER BY COUNT(*) DESC, l.label)
                       AS rk
            FROM edges e JOIN l{p} l ON l.node = e.dst
            GROUP BY e.src, l.label)
        WHERE rk = 1)"""
    rounds = ",".join(
        round_tpl.format(k=k, p=k - 1) for k in range(1, LP_ITERS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cnode,
               's:' || CAST(l.l_suppkey AS VARCHAR) AS snode
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (
        SELECT cnode AS src, snode AS dst FROM pairs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM pairs),
    l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges),{rounds}"""


def _lp_sql() -> str:
    """Unrolled 3-round LPA oracle over the same bipartite edge CTE."""
    return f"""{_lp_rounds_cte()},
    sized AS (
        SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members
        FROM l{LP_ITERS} GROUP BY label),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_members DESC, community)
                   AS community_rank
        FROM sized)
    SELECT CAST(community_rank AS INT) AS community_rank, community,
           n_members
    FROM ranked WHERE community_rank <= 20
    ORDER BY community_rank
"""


QUERIES["graph_label_propagation"] = graph_label_propagation
ORACLE_SQL["graph_label_propagation"] = _lp_sql()

#: BFS hop budget for ``graph_bfs_distance``: 3 rounds reaches most of
#: a small-diameter bipartite graph while keeping the operator a FIXED
#: unrolled plan (each extra hop is one more join round).
BFS_HOPS = 3


def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first search from the HUB (highest-degree node,
    ties to the smallest id): exact shortest-path distances within
    BFS_HOPS hops, reported as the reachability histogram
    (distance -> node count, plus the beyond-horizon remainder) — the
    connectivity probe behind "how many suppliers sit within two
    relationships of our biggest customer", and the unweighted
    single-source shortest-path primitive beside the label/community
    operators.

    Each hop is one frontier join (edges keyed by src) + an anti-join
    against the reached set + a distinct — all node-keyed shuffles, no
    per-node state beyond (node, dist); `localCheckpoint` cuts lineage
    per round.  The source is selected IN-PLAN (degree argmax via one
    aggregation + row_number), never collected."""
    from pyspark.sql import Window

    edges = bipartite_edges(spark, sf_dir).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    w = Window.orderBy(F.col("d").desc(), F.col("src").asc())
    source = (
        deg.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(F.col("src").alias("node"))
    )
    # Materialized ONCE (round 12 — the k-core threshold twin): the
    # 1-row source sits under every hop's eager checkpoint job via the
    # accumulated ``reached`` union, and its degree aggregation + global
    # argmax window re-ran per hop (exchange reuse never crosses jobs).
    reached = source.select("node", F.lit(0).alias("dist")).localCheckpoint()
    frontier = reached
    for k in range(1, BFS_HOPS + 1):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .select("node", F.lit(k).alias("dist"))
            .localCheckpoint()
        )
        reached = reached.unionAll(nxt)
        frontier = nxt
    total = edges.select(F.col("src").alias("node")).distinct().count()
    hist = reached.groupBy("dist").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    reached_total = reached.count()
    beyond = spark.createDataFrame(
        [(BFS_HOPS + 1, total - reached_total)], "dist int, n_nodes long"
    ).select(F.col("dist"), F.col("n_nodes"))
    return (
        hist.unionByName(beyond)
        .select(F.col("dist").cast("int").alias("dist"), "n_nodes")
        .orderBy("dist")
    )


def _bfs_sql() -> str:
    hop_tpl = """
    f{k} AS (
        SELECT DISTINCT e.dst AS node
        FROM edges e JOIN f{p} ON e.src = f{p}.node
        WHERE e.dst NOT IN (SELECT node FROM r{p})),
    r{k} AS (SELECT node FROM r{p} UNION ALL
             SELECT node FROM f{k})"""
    hops = ",".join(hop_tpl.format(k=k, p=k - 1) for k in range(1, BFS_HOPS + 1))
    dists = "\n        UNION ALL\n".join(
        f"SELECT {k} AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM f{k}"
        for k in range(1, BFS_HOPS + 1)
    )
    return f"""
    WITH pairs AS (
        SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS cnode,
               's:' || CAST(l.l_suppkey AS VARCHAR) AS snode
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    edges AS (
        SELECT cnode AS src, snode AS dst FROM pairs
        UNION ALL
        SELECT snode AS src, cnode AS dst FROM pairs),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src),
    f0 AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 1),
    r0 AS (SELECT node FROM f0),{hops},
    hist AS (
        SELECT 0 AS dist, CAST(1 AS BIGINT) AS n_nodes
        UNION ALL
        {dists}
        UNION ALL
        SELECT {BFS_HOPS + 1} AS dist,
               CAST((SELECT COUNT(DISTINCT src) FROM edges)
                    - (SELECT COUNT(*) FROM r{BFS_HOPS}) AS BIGINT))
    SELECT CAST(dist AS INT) AS dist, n_nodes FROM hist ORDER BY dist
"""


QUERIES["graph_bfs_distance"] = graph_bfs_distance
ORACLE_SQL["graph_bfs_distance"] = _bfs_sql()


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman MODULARITY of the label-propagation partition — the
    quality score that tells you whether the communities the LPA rounds
    found are real structure or noise (Q near 0: no better than random;
    the audit-the-operator pattern of ``ann_recall_audit`` and
    ``dedup_minhash_recall_audit`` applied to graph clustering).
    Q = sum_c [ w_c/(2m) - (d_c/(2m))^2 ] over communities, with w_c
    the directed within-community edge count (2x the undirected), d_c
    the community degree sum, and 2m the directed edge total — so
    every term is a ratio of EXACT integers and the doubles agree
    across engines without rounding tricks.

    Emits the 10 largest communities with their contribution terms
    plus the partition-wide Q (computed from the exact integer sums
    W = sum w_c and D2 = sum d_c^2 — one extra 1-row broadcast, never
    a float accumulation over communities).  Scale: reuses the LPA
    rounds (node-keyed joins); the modularity stage adds two
    label-keyed joins and |communities|-sized aggregations."""
    edges = bipartite_edges(spark, sf_dir).localCheckpoint()
    labels = _lp_final_labels(edges)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    a = labels.select(F.col("node").alias("src"), F.col("label").alias("la"))
    b = labels.select(F.col("node").alias("dst"), F.col("label").alias("lb"))
    within = (
        edges.join(a, "src")
        .join(b, "dst")
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    comm = (
        labels.join(deg, labels["node"] == deg["node"])
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("deg").alias("d"),
        )
        .join(within, "label", "left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(0)))
    )
    n = edges.agg(F.count(F.lit(1)).alias("m2"))
    tot = comm.agg(
        F.sum("w").alias("big_w"),
        F.sum(F.col("d") * F.col("d")).alias("d2"),
    )
    m2 = F.col("m2").cast("double")
    q_contrib = F.col("w").cast("double") / m2 - (
        F.col("d") * F.col("d")
    ).cast("double") / (m2 * m2)
    q_total = F.col("big_w").cast("double") / m2 - F.col("d2").cast(
        "double"
    ) / (m2 * m2)
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.desc("n_members"), F.asc("label"))
    return (
        comm.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(tot))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 10)
        .select(
            F.col("rk").cast("long").alias("community_rank"),
            F.col("label").alias("community"),
            "n_members",
            (F.col("w") / 2).cast("long").alias("internal_edges"),
            F.col("d").alias("degree_sum"),
            F.round(q_contrib, 6).alias("q_contrib"),
            F.round(q_total, 6).alias("q_total"),
        )
        .orderBy("community_rank")
    )


QUERIES["graph_modularity"] = graph_modularity
ORACLE_SQL["graph_modularity"] = f"""{_lp_rounds_cte()},
    deg AS (
        SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src),
    within_c AS (
        SELECT a.label, COUNT(*) AS w
        FROM edges e
        JOIN l{LP_ITERS} a ON a.node = e.src
        JOIN l{LP_ITERS} b ON b.node = e.dst
        WHERE a.label = b.label
        GROUP BY a.label),
    comm AS (
        SELECT l.label,
               COUNT(*) AS n_members,
               SUM(d.deg) AS d,
               COALESCE(ANY_VALUE(w.w), 0) AS w
        FROM l{LP_ITERS} l
        JOIN deg d ON d.node = l.node
        LEFT JOIN within_c w ON w.label = l.label
        GROUP BY l.label),
    n AS (SELECT COUNT(*) AS m2 FROM edges),
    tot AS (
        SELECT SUM(w) AS big_w, SUM(d * d) AS d2 FROM comm),
    ranked AS (
        SELECT c.*, n.m2, t.big_w, t.d2,
               ROW_NUMBER() OVER (ORDER BY n_members DESC, label ASC)
                   AS rk
        FROM comm c CROSS JOIN n CROSS JOIN tot t)
    SELECT CAST(rk AS BIGINT) AS community_rank,
           label AS community,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(w // 2 AS BIGINT) AS internal_edges,
           CAST(d AS BIGINT) AS degree_sum,
           ROUND(CAST(w AS DOUBLE) / CAST(m2 AS DOUBLE)
                 - CAST(d * d AS DOUBLE)
                   / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6)
               AS q_contrib,
           ROUND(CAST(big_w AS DOUBLE) / CAST(m2 AS DOUBLE)
                 - CAST(d2 AS DOUBLE)
                   / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 6)
               AS q_total
    FROM ranked WHERE rk <= 10
    ORDER BY community_rank
"""


#: presentation cap for the per-node clustering-coefficient table
LCC_TOP_K = 20


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient on the part co-occurrence graph:
    per node, cc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1)) — the
    neighborhood-density measure that turns the global
    ``graph_triangle_count`` into a per-node community signal (Watts &
    Strogatz '98), presented as the top-20 most-triangled parts.

    Same degree-ordered edge orientation as ``graph_triangle_count``
    (Suri & Vassilvitskii WWW'11 — out-degrees bounded O(sqrt(m)), no
    hub wedge explosion); the only addition is keeping the wedge APEX
    through the closing join, so each closed triangle credits its
    three vertices via one 3-arm explode and a node-keyed count.  All
    presented ratios are single divisions of exact BIGINTs — engine-
    exact before the 6-dp round.

    The ORACLE enumerates the same triangles with the naive id-ordered
    a<b<c SQL (per-node credit is orientation-invariant)."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint()
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
    # Shuffled-hash for both orientation joins (round 12, guide §3.1 —
    # the closing-join precedent): SMJ would sort the |E|-row und stream
    # against each |V|-row degree table; hashing the degree side leaves
    # the edge stream unsorted (|E| >= |V| structurally).
    ranked = und.join(du.hint("shuffle_hash"), "u").join(
        dv.hint("shuffle_hash"), "v"
    )
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    # Materialized ONCE (round 12): both wedge arms read this ~|E|-row
    # table, and without the cut the whole und JOIN deg JOIN deg chain
    # (3 SMJs, 6 exchanges at 2 longs + a degree each) is planned — and
    # absent a runtime ReusedExchange hit, executed — twice (guide
    # §2.4: remove shuffles outright; the before/after plans are in
    # plans/r12/).  O(|E|) rows of three integer columns, so the
    # materialization is cheap at any scale.
    oriented = ranked.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias(
            "dst_deg"
        ),
    ).localCheckpoint()
    e1 = oriented.select(
        "src", F.col("dst").alias("b"), F.col("dst_deg").alias("deg_b")
    )
    e2 = oriented.select(
        "src", F.col("dst").alias("c"), F.col("dst_deg").alias("deg_c")
    )
    wedges = (
        e1.join(e2, "src")
        .where(
            (F.col("deg_b") < F.col("deg_c"))
            | ((F.col("deg_b") == F.col("deg_c")) & (F.col("b") < F.col("c")))
        )
        .select(
            "src",
            F.least("b", "c").alias("u"),
            F.greatest("b", "c").alias("v"),
        )
    )
    # Shuffled-hash, not sort-merge, for the closing join (guide §3.1):
    # the streamed side is the O(sum deg^2) wedge set — orders of
    # magnitude larger than the O(|E|) build side — and SMJ would SORT
    # that stream; hashing the edge side skips the wedge sort at every
    # scale (the asymmetry wedges >> edges is structural, not a fixture
    # artifact).
    closed = wedges.join(und.hint("shuffle_hash"), ["u", "v"]).select(
        F.explode(F.array("src", "u", "v")).alias("node")
    )
    tri = closed.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
    cc = (F.lit(2.0) * F.col("n_tri")) / (
        F.col("deg") * (F.col("deg") - F.lit(1))
    )
    return (
        deg.join(tri, "node")
        .select(
            F.col("node").alias("partkey"),
            F.col("deg").cast("long").alias("degree"),
            F.col("n_tri").cast("long").alias("n_triangles"),
            F.round(cc, 6).alias("local_cc"),
        )
        .orderBy(F.desc("n_triangles"), "partkey")
        .limit(LCC_TOP_K)
    )


QUERIES["graph_clustering_coefficient"] = graph_clustering_coefficient

ORACLE_SQL["graph_clustering_coefficient"] = f"""
    WITH und AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tris AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM und e1
        JOIN und e2 ON e1.v = e2.u
        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
    credit AS (
        SELECT a AS node FROM tris
        UNION ALL SELECT b FROM tris
        UNION ALL SELECT c FROM tris),
    tri AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri
        FROM credit GROUP BY 1),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node FROM und
            UNION ALL SELECT v FROM und) GROUP BY 1)
    SELECT deg.node AS partkey,
           deg AS degree,
           n_tri AS n_triangles,
           ROUND((2.0 * n_tri) / (deg * (deg - 1)), 6) AS local_cc
    FROM deg JOIN tri ON tri.node = deg.node
    ORDER BY n_triangles DESC, partkey
    LIMIT {LCC_TOP_K}
"""


#: HITS presentation cap per role
HITS_TOP_K = 20


def graph_hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg JACM'99), two unnormalized
    iterations on the directed customer->supplier purchase graph:
    customers are hubs (they point at suppliers), suppliers are
    authorities.  With h_0 = 1 the recursion a = A^T h, h = A a stays
    in EXACT BIGINT arithmetic (a_1 = indegree, h_1 = sum of neighbor
    a_1, a_2 = sum of neighbor h_1, h_2 = sum of neighbor a_2) — the
    eigenvector direction emerges without any float accumulation, and
    scores are normalized by the per-role max only at presentation
    (one exact division, 6-dp round).  The power-iteration companion
    to the PageRank module: same join+agg-per-iteration shape, same
    reused edge partitioning, no damping teleport.

    Scale: the edge list is built once (one distinct); each half-step
    is one equi-join + groupBy on a reusable key — identical cost
    profile to ``graph_pagerank_bipartite``."""
    from database_peak_streaming_spark.sources.batch import load_table

    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    a1 = edges.groupBy("s").agg(F.count(F.lit(1)).alias("a1"))
    h1 = (
        edges.join(a1, "s")
        .groupBy("c")
        .agg(F.sum("a1").alias("h1"))
    )
    a2 = (
        edges.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h1").alias("a2"))
    )
    h2 = (
        edges.join(a2, "s")
        .groupBy("c")
        .agg(F.sum("a2").alias("h2"))
    )
    hubs = h2.select(
        F.lit("hub").alias("role"),
        F.col("c").alias("node"),
        F.col("h2").alias("raw_score"),
    )
    auth = a2.select(
        F.lit("authority").alias("role"),
        F.col("s").alias("node"),
        F.col("a2").alias("raw_score"),
    )
    both = hubs.unionAll(auth)
    w_rank = Window.partitionBy("role").orderBy(
        F.desc("raw_score"), "node"
    )
    w_max = Window.partitionBy("role")
    return (
        both.select(
            "role",
            "node",
            F.col("raw_score").cast("long").alias("raw_score"),
            F.row_number().over(w_rank).alias("rank"),
            F.round(
                F.col("raw_score") / F.max("raw_score").over(w_max), 6
            ).alias("score"),
        )
        .filter(F.col("rank") <= HITS_TOP_K)
        .select("role", "rank", "node", "raw_score", "score")
        .orderBy("role", "rank")
    )


QUERIES["graph_hits_hub_authority"] = graph_hits_hub_authority

ORACLE_SQL["graph_hits_hub_authority"] = f"""
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    a1 AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS a1 FROM edges GROUP BY 1),
    h1 AS (
        SELECT e.c, CAST(SUM(a1.a1) AS BIGINT) AS h1
        FROM edges e JOIN a1 USING (s) GROUP BY 1),
    a2 AS (
        SELECT e.s, CAST(SUM(h1.h1) AS BIGINT) AS a2
        FROM edges e JOIN h1 USING (c) GROUP BY 1),
    h2 AS (
        SELECT e.c, CAST(SUM(a2.a2) AS BIGINT) AS h2
        FROM edges e JOIN a2 USING (s) GROUP BY 1),
    both_roles AS (
        SELECT 'hub' AS role, c AS node, h2 AS raw_score FROM h2
        UNION ALL
        SELECT 'authority' AS role, s AS node, a2 AS raw_score FROM a2),
    ranked AS (
        SELECT role, node, raw_score,
               ROW_NUMBER() OVER (PARTITION BY role
                                  ORDER BY raw_score DESC, node) AS rank,
               MAX(raw_score) OVER (PARTITION BY role) AS mx
        FROM both_roles)
    SELECT role, CAST(rank AS INT) AS rank, node, raw_score,
           ROUND(raw_score / mx, 6) AS score
    FROM ranked WHERE rank <= {HITS_TOP_K}
    ORDER BY role, rank
"""

#: k-truss peeling: the support threshold is ADAPTIVE — min_support =
#: floor(TRUSS_MEAN_FRAC x mean round-1 edge support) — because a
#: fixed small k peels NOTHING on a co-occurrence fixture (mean edge
#: support is ~42 at sf0.001, ~11 at sf0.01: every edge clears k-2=2;
#: the KCORE_MEAN_FRAC lesson, measured the same way).  At 0.75x mean
#: the round-1 peel drops a real fraction and keeps a dense core at
#: every fixture SF, and the threshold self-tunes with corpus growth.
#: Two rounds are unrolled (fixed, oracle-expressible as plain SQL);
#: the SAME round-1 threshold gates both rounds, as a production peel
#: toward a chosen k would.
TRUSS_ROUNDS = 2
TRUSS_MEAN_FRAC = 0.75


def graph_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-TRUSS peeling on the part co-occurrence graph — the
    EDGE-support community primitive between triangle counting (global
    density) and k-core (node degrees): each round computes every
    edge's triangle SUPPORT (how many triangles it closes among
    surviving edges) and drops edges below the adaptive threshold
    (see TRUSS_MEAN_FRAC); what survives is the dense-community
    skeleton (Cohen 2008, "Trusses: cohesive subgraphs for social
    network analysis").  Reported per round: the threshold, edge
    counts in/surviving/dropped, and the surviving triangle count —
    the convergence trace a production peel monitors.

    Support enumeration reuses the degree-ordered orientation of
    ``graph_triangle_count`` (out-degrees bounded O(sqrt m) — no hub
    wedge explosion) but emits ALL THREE edges of each closed
    triangle, so support is one (edge)-keyed count over 3x the
    triangle volume — still linear in triangles, never all-pairs.
    The oracle recounts with the naive id-ordered form per round
    (support is orientation-invariant).

    Scale: per round, three narrow shuffles (degrees, wedge join,
    support count) on co-located edge keys; lineage cut between
    rounds (the iterative-join discipline of pagerank/label-prop);
    round count fixed so the plan and the oracle stay finite."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()
    )

    def _support(und: DataFrame) -> DataFrame:
        """(u, v, support) for every edge of ``und`` (u < v), support =
        triangles the edge closes within ``und``."""
        deg = (
            und.select(F.col("u").alias("node"))
            .unionAll(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        du = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u"))
        dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v"))
        # Shuffled-hash orientation joins (see graph_triangle_count).
        ranked = und.join(du.hint("shuffle_hash"), "u").join(
            dv.hint("shuffle_hash"), "v"
        )
        u_first = (F.col("deg_u") < F.col("deg_v")) | (
            (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
        )
        oriented = ranked.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias(
                "dst_deg"
            ),
        )
        e1 = oriented.select(
            "src", F.col("dst").alias("b"), F.col("dst_deg").alias("deg_b")
        )
        e2 = oriented.select(
            "src", F.col("dst").alias("c"), F.col("dst_deg").alias("deg_c")
        )
        wedges = (
            e1.join(e2, "src")
            .where(
                (F.col("deg_b") < F.col("deg_c"))
                | (
                    (F.col("deg_b") == F.col("deg_c"))
                    & (F.col("b") < F.col("c"))
                )
            )
            .select(
                "src",
                F.least("b", "c").alias("u"),
                F.greatest("b", "c").alias("v"),
            )
        )
        # Shuffled-hash for the closing join (round 12 — the
        # graph_clustering_coefficient precedent): the streamed side is
        # the O(sum deg^2) wedge set, orders of magnitude larger than
        # the O(|E|) build side; SMJ would sort the wedge stream.
        closed = wedges.join(und.hint("shuffle_hash"), ["u", "v"])
        tri_edges = (
            closed.select(
                F.least("src", "u").alias("eu"),
                F.greatest("src", "u").alias("ev"),
            )
            .unionAll(
                closed.select(
                    F.least("src", "v").alias("eu"),
                    F.greatest("src", "v").alias("ev"),
                )
            )
            .unionAll(
                closed.select(
                    F.col("u").alias("eu"), F.col("v").alias("ev")
                )
            )
        )
        return tri_edges.groupBy("eu", "ev").agg(
            F.count(F.lit(1)).alias("support")
        )

    summaries = []
    current = edges
    thr: DataFrame | None = None
    for rnd in range(1, TRUSS_ROUNDS + 1):
        sup = _support(current)
        # Materialized ONCE per round (round 12, guide §2.4): ``gated``
        # below feeds BOTH the surviving-edge set and the round summary,
        # so without the cut the whole _support triangle enumeration —
        # the query's dominant work — executed TWICE per round.  Rows
        # are narrow (u, v, support) at |E| cardinality.
        scored = (
            current.join(
                sup,
                (F.col("u") == F.col("eu")) & (F.col("v") == F.col("ev")),
                "left",
            )
            .select(
                "u", "v", F.coalesce("support", F.lit(0)).alias("support")
            )
            .localCheckpoint()
        )
        if thr is None:
            # adaptive threshold from the ROUND-1 support distribution,
            # a 1-row broadcast scalar (never driver-side)
            thr = scored.agg(
                F.floor(F.avg("support") * F.lit(TRUSS_MEAN_FRAC))
                .cast("long")
                .alias("min_sup")
            ).localCheckpoint()
        gated = scored.crossJoin(F.broadcast(thr))
        surviving = (
            gated.where(F.col("support") >= F.col("min_sup"))
            .select("u", "v")
            .localCheckpoint()
        )
        summaries.append(
            gated.groupBy("min_sup")
            .agg(
                F.lit(rnd).alias("round"),
                F.count(F.lit(1)).cast("long").alias("n_edges"),
                F.sum(
                    (F.col("support") >= F.col("min_sup")).cast("long")
                ).alias("n_surviving"),
                F.sum(
                    (F.col("support") < F.col("min_sup")).cast("long")
                ).alias("n_dropped"),
                # integer DIV, not double /: the sum is always a
                # multiple of 3 (each triangle emits 3 edges), but the
                # McNemar-midpoint ADVICE discipline says keep the
                # floor-division exact by construction, not by range
                F.expr("sum(support) div 3").cast("long").alias(
                    "n_triangles"
                ),
            )
            .select(
                "round",
                F.col("min_sup").cast("long").alias("min_support"),
                "n_edges",
                "n_surviving",
                "n_dropped",
                "n_triangles",
            )
        )
        current = surviving
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("round")


QUERIES["graph_ktruss_peel"] = graph_ktruss_peel


def _truss_support_sql(src: str, rnd: int) -> str:
    """Naive id-ordered support CTEs over edge CTE ``src`` — emitted
    per unrolled round by the oracle below (the shared-generator
    discipline of _durbin_levinson: one function writes the SQL both
    rounds use, so the rounds cannot drift)."""
    return f"""
    tri{rnd} AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM {src} e1
        JOIN {src} e2 ON e2.u = e1.v
        JOIN {src} e3 ON e3.u = e1.u AND e3.v = e2.v),
    tedges{rnd} AS (
        SELECT a AS eu, b AS ev FROM tri{rnd}
        UNION ALL SELECT a, c FROM tri{rnd}
        UNION ALL SELECT b, c FROM tri{rnd}),
    sup{rnd} AS (
        SELECT eu, ev, COUNT(*) AS support
        FROM tedges{rnd} GROUP BY eu, ev),
    scored{rnd} AS (
        SELECT e.u, e.v, COALESCE(s.support, 0) AS support
        FROM {src} e
        LEFT JOIN sup{rnd} s ON s.eu = e.u AND s.ev = e.v)"""


def _truss_gate_sql(rnd: int) -> str:
    """Survivor + summary CTEs for one round, gated on the shared
    round-1 threshold CTE ``thr``."""
    return f"""
    surv{rnd} AS (
        SELECT u, v FROM scored{rnd} CROSS JOIN thr
        WHERE support >= min_sup),
    summary{rnd} AS (
        SELECT {rnd} AS round,
               CAST(min_sup AS BIGINT) AS min_support,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN support >= min_sup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
               CAST(SUM(CASE WHEN support < min_sup
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
               CAST(SUM(support) // 3 AS BIGINT) AS n_triangles
        FROM scored{rnd} CROSS JOIN thr
        GROUP BY min_sup)"""


ORACLE_SQL["graph_ktruss_peel"] = f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey),
    {_truss_support_sql("und", 1)},
    thr AS (
        SELECT CAST(FLOOR(AVG(support) * {TRUSS_MEAN_FRAC}) AS BIGINT)
            AS min_sup
        FROM scored1),
    {_truss_gate_sql(1)},
    {_truss_support_sql("surv1", 2)},
    {_truss_gate_sql(2)}
    SELECT * FROM summary1
    UNION ALL SELECT * FROM summary2
    ORDER BY round
"""
