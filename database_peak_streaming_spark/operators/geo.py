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


def geo_grid_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All customer pairs within 25 km, closest ``TOP_PAIRS`` first.

    Plan shape: one side explodes to its 9 neighbor cells (map-only
    3x fan — 9 cells but the key is 2 small longs), the other keeps its
    home cell; a single hash equi-join on (cx, cy) produces candidates;
    the exact distance predicate verifies.  Each qualifying pair
    surfaces exactly once (only the lower doc id expands, and a point
    within the radius is within one cell step, in exactly one neighbor
    cell), so no distinct is needed — the dedup is free, by
    construction.  The final ordering sorts the rounded distance so
    presentation order never hinges on sub-ulp float differences."""
    pts = _points(spark, sf_dir)
    off = F.expr(
        "explode(flatten(transform(sequence(-1,1), dx ->"
        " transform(sequence(-1,1), dy -> struct(dx, dy)))))"
    )
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
        (F.col("cx") + F.col("o.dx")).alias("gx"),
        (F.col("cy") + F.col("o.dy")).alias("gy"),
    )
    build = pts.select(
        F.col("cust_id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("gx"),
        F.col("cy").alias("gy"),
    )
    dx = (F.col("lon_b") - F.col("lon_a")) * F.lit(KM_PER_DEG_LON)
    dy = (F.col("lat_b") - F.col("lat_a")) * F.lit(KM_PER_DEG_LAT)
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        probe.join(build, ["gx", "gy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dist, 3).alias("dist_km"),
        )
        .filter(F.col("dist_km") <= F.lit(RADIUS_KM))
        .orderBy("dist_km", "id_a", "id_b")
        .limit(TOP_PAIRS)
    )


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
                   cx + dx.x AS gx, cy + dy.y AS gy
            FROM cells,
                 (SELECT UNNEST([-1, 0, 1]) AS x) dx,
                 (SELECT UNNEST([-1, 0, 1]) AS y) dy),
        pairs AS (
            SELECT p.id_a, b.cust_id AS id_b,
                   ROUND(SQRT(
                       ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     * ((b.lon - p.lon_a) * {KM_PER_DEG_LON})
                     + ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})
                     * ((b.lat - p.lat_a) * {KM_PER_DEG_LAT})), 3)
                   AS dist_km
            FROM probe p
            JOIN cells b
              ON p.gx = b.cx AND p.gy = b.cy AND p.id_a < b.cust_id)
        SELECT id_a, id_b, dist_km
        FROM pairs
        WHERE dist_km <= {RADIUS_KM}
        ORDER BY dist_km, id_a, id_b
        LIMIT {TOP_PAIRS}
    """,
}
