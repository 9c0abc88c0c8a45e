"""Array / map / JSON operators (SURVEY.md §2B array & map/json rows).

Reference parity: the ragged per-channel peak arrays (P3/P10/P11,
``hyperion.py:442-453``) map to ArrayType higher-order functions —
``transform``/``filter``/``aggregate``/``slice``/``sequence`` — all
JVM-side expressions, no Python in the loop.  The events fixture's
``props`` JSON column exercises the JSON path.

Scale notes: higher-order array functions run inside whole-stage codegen;
``explode`` multiplies rows (64x here) — at 100 TB explode only after
filtering to the slice you need, never before.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from database_peak_streaming_spark.sources.batch import load_table


def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element/slice/array_max/aggregate/sequence over embeddings.

    The ``aggregate``-based dot-product-style reduction here is the same
    kernel the similarity operators use (operators/similarity.py).
    """
    e = load_table(spark, "embeddings", sf_dir)
    return (
        e.select(
            "vec_id",
            F.size("embedding").cast("long").alias("emb_len"),
            F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
            F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
            F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
            F.round(
                F.aggregate(
                    F.slice("embedding", 1, 8),
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double"),
                ),
                6,
            ).alias("head8_sum"),
            F.aggregate(
                F.sequence(F.lit(1), F.col("label") + 1),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x.cast("long"),
            ).alias("label_tri"),
            F.array_contains(
                F.sequence(F.lit(0), F.lit(9)), F.col("label")
            ).alias("label_in_range"),
            F.size(
                F.flatten(F.array(F.slice("embedding", 1, 2), F.slice("embedding", 3, 2)))
            ).cast("long").alias("flat4_len"),
        )
        .orderBy("vec_id")
    )


def array_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: long-form (vec_id, pos, val) for the first vectors —
    the wide->long melt of the reference's flat peak arrays (P11)."""
    e = load_table(spark, "embeddings", sf_dir)
    return (
        e.filter(F.col("vec_id") < 4)
        .select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .select(
            "vec_id",
            F.col("pos").cast("long").alias("pos"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


def array_transform_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform + filter + zip_with higher-order functions; the
    linear-calibration shape of the reference (P7: ``counts * inv_scale
    + offset``, ``hyperion.py:533-540``) as a pure array expression."""
    e = load_table(spark, "embeddings", sf_dir)
    scaled = F.transform(
        F.slice("embedding", 1, 6), lambda x: x.cast("double") * 2.0 + 1.0
    )
    positives = F.filter(
        F.slice("embedding", 1, 16), lambda x: x.cast("double") > 0
    )
    return (
        e.select(
            "vec_id",
            F.round(F.aggregate(scaled, F.lit(0.0), lambda a, x: a + x), 6).alias(
                "cal_sum6"
            ),
            F.size(positives).cast("long").alias("n_pos_head16"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.slice("embedding", 1, 4),
                        F.slice("embedding", 5, 4),
                        lambda a, b: a.cast("double") * b.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("dot_head4"),
        )
        .orderBy("vec_id")
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from events.props (get_json_object +
    from_json into a typed struct/map)."""
    ev = load_table(spark, "events", sf_dir)
    # Parse ONCE into a typed map, derive the typed outputs from it;
    # get_json_object kept for the JSON-path API surface.  (One parse per
    # JSON function call is the common anti-pattern — at 100 TB, N parses
    # of the same column N-tuples the CPU cost of the scan stage.)
    parsed = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return (
        ev.withColumn("_m", parsed)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_path"),
            F.element_at("_m", "k").alias("k_typed"),
            F.map_keys("_m")[0].alias("first_key"),
        )
        .orderBy("event_id")
    )


def json_corrupt_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record ingest surface: parse a JSON column where every
    50th record is syntactically broken (truncated brace — the classic
    dirty-feed shape), classify rows good/bad WITHOUT failing the job,
    and report the dead-letter audit a pipeline materializes next to
    the parsed table: counts, an exact id checksum of the bad rows
    (so the dead-letter queue itself is hash-verifiable), and the
    recovered value total from the good rows.

    Spark surface: ``from_json`` in its default PERMISSIVE behavior —
    malformed input never throws; Jackson even PARTIALLY RECOVERS the
    truncated record (the id field survives, the unterminated rest is
    null) — which is exactly why production dead-letter rules gate on
    the SCHEMA CONTRACT, not on "did the parser throw": a row is bad
    iff the required field is absent after parsing.  That contract is
    expressible identically in both engines (Spark: parsed field IS
    NULL; DuckDB: not valid JSON or the path extracts nothing), so
    the audit hash-matches.

    Scale: map-only parse + one global aggregate — scan speed; the
    dead-letter checksum is the same composite-injective discipline as
    dataset_manifest."""
    d = load_table(spark, "documents", sf_dir)
    payload = F.when(
        F.col("doc_id") % 50 == 0,
        # truncated: opening brace and key but no close — malformed
        F.concat(F.lit('{"id": '), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat(
            F.lit('{"id": '),
            F.col("doc_id").cast("string"),
            F.lit(', "n": '),
            F.col("n_chars").cast("string"),
            F.lit("}"),
        )
    )
    parsed = F.from_json(
        payload, T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("n", T.LongType()),
            ]
        )
    )
    rows = d.select(
        "doc_id",
        parsed.alias("_p"),
    ).select(
        "doc_id",
        F.col("_p")["n"].isNull().cast("int").alias("is_bad"),
        F.col("_p")["n"].alias("n_parsed"),
    )
    return rows.agg(
        F.sum(F.lit(1) - F.col("is_bad")).cast("long").alias("n_good"),
        F.sum("is_bad").cast("long").alias("n_bad"),
        F.sum(
            F.when(F.col("is_bad") == 1, F.col("doc_id")).otherwise(0)
        ).cast("long").alias("bad_id_checksum"),
        F.sum(F.coalesce(F.col("n_parsed"), F.lit(0))).cast("long").alias(
            "good_n_total"
        ),
    )


def map_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — transform_keys / transform_values /
    map_filter / map_concat — completing the HOF surface next to the
    array family (array_transform_filter).  The map is built row-side
    from customer columns, every HOF output is projected back to
    scalars, so the whole query is one codegen stage and the oracle can
    verify each HOF's value without a map type of its own."""
    c = load_table(spark, "customer", sf_dir)
    m = F.create_map(
        F.lit("seg"), F.col("c_mktsegment"),
        F.lit("nat"), F.col("c_nationkey").cast("string"),
        F.lit("key"), F.col("c_custkey").cast("string"),
    )
    mv = F.transform_values(m, lambda k, v: F.upper(v))
    mk = F.transform_keys(m, lambda k, v: F.concat(k, F.lit("_x")))
    mf = F.map_filter(m, lambda k, v: F.length(v) > 5)
    mc = F.map_concat(m, F.create_map(F.lit("extra"), F.lit("1")))
    return (
        c.select(
            "c_custkey",
            F.element_at(mv, "seg").alias("seg_upper"),
            F.element_at(mk, "seg_x").alias("seg_renamed"),
            F.size(mf).cast("long").alias("n_long_vals"),
            F.size(mc).cast("long").alias("n_concat"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


def json_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4's VARIANT type: ``props``
    parsed ONCE into the binary variant encoding, fields extracted with
    ``variant_get`` path expressions — the engine-native successor to
    string-JSON round-trips (no re-parse per extraction, pushdown-able
    shredding on recent runtimes), plus a per-event-type aggregate over
    the extracted value.  Oracle extracts the same paths with DuckDB's
    JSON functions — VARIANT is an encoding choice, the VALUES are
    engine-independent."""
    ev = load_table(spark, "events", sf_dir)
    v = F.parse_json("props")
    base = ev.withColumn("_v", v).select(
        "event_type",
        F.variant_get("_v", "$.k", "long").alias("k"),
        F.try_variant_get("_v", "$.missing", "long").alias("missing"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("missing").alias("n_missing_present"),
        )
        .orderBy("event_type")
    )


def map_build_zip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map CONSTRUCTION + two-map combination, completing the map HOF
    family beside ``map_hof_funcs`` (transform/filter/concat):
    per-returnflag count and quantity maps are BUILT from aggregation
    output with ``map_from_entries(array_sort(collect_list(struct)))``
    (the sorted-entries build keeps key order deterministic), then
    combined key-wise with ``map_zip_with`` into an average-per-status
    map — the "join two dictionaries without exploding them" pattern a
    feature store uses for per-key metric bundles.

    The result is stringified as sorted ``k:v`` pairs (MAP result
    columns are banned by the oracle-type gate, tests/test_oracle_types
    — engines disagree on map rendering); the oracle computes the same
    pairs relationally with an ordered STRING_AGG.  All values derive
    from exact BIGINT counts/sums; one (flag, status) aggregation is
    the only data-sized stage."""
    li = load_table(spark, "lineitem", sf_dir)
    per = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("qty"),
    )
    maps = per.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_linestatus", "n")))
        ).alias("n_map"),
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("l_linestatus", "qty")))
        ).alias("qty_map"),
    )
    zipped = maps.select(
        "l_returnflag",
        F.map_zip_with(
            "n_map", "qty_map", lambda k, n, q: q / n.cast("double")
        ).alias("avg_map"),
    )
    return (
        zipped.select(
            "l_returnflag",
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.map_entries("avg_map")),
                    lambda e: F.concat(
                        e["key"],
                        F.lit(":"),
                        F.round(e["value"], 6).cast("string"),
                    ),
                ),
            ).alias("avg_qty_by_status"),
        )
        .orderBy("l_returnflag")
    )


QUERIES = {
    "json_corrupt_handling": json_corrupt_handling,
    "map_build_zip_funcs": map_build_zip_funcs,
    "array_funcs": array_funcs,
    "array_explode_pos": array_explode_pos,
    "array_transform_filter": array_transform_filter,
    "json_extract_events": json_extract_events,
    "json_variant_events": json_variant_events,
    "map_hof_funcs": map_hof_funcs,
}

ORACLE_SQL = {
    # Verifies the HOF VALUES with scalar expressions: the map entries
    # are ('seg', mktsegment), ('nat', nationkey), ('key', custkey), so
    # each output is directly computable without a map type.
    "map_hof_funcs": """
        SELECT c_custkey,
               UPPER(c_mktsegment) AS seg_upper,
               c_mktsegment AS seg_renamed,
               CAST((CASE WHEN LENGTH(c_mktsegment) > 5 THEN 1 ELSE 0 END)
                    + (CASE WHEN LENGTH(CAST(c_nationkey AS VARCHAR)) > 5
                            THEN 1 ELSE 0 END)
                    + (CASE WHEN LENGTH(CAST(c_custkey AS VARCHAR)) > 5
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_long_vals,
               CAST(4 AS BIGINT) AS n_concat
        FROM customer
        ORDER BY c_custkey
        LIMIT 100
    """,
    "json_variant_events": """
        SELECT event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
               MIN(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(JSON_EXTRACT(props, '$.k') AS BIGINT)) AS max_k,
               COUNT(CAST(JSON_EXTRACT(props, '$.missing') AS BIGINT))
                   AS n_missing_present
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "array_funcs": """
        SELECT vec_id,
               CAST(LEN(embedding) AS BIGINT) AS emb_len,
               ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
               ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS max_val,
               ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 6) AS min_val,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:8],
                     x -> CAST(x AS DOUBLE))), 6) AS head8_sum,
               CAST(LIST_SUM(GENERATE_SERIES(1, label + 1)) AS BIGINT) AS label_tri,
               LIST_CONTAINS(GENERATE_SERIES(0, 9), label) AS label_in_range,
               CAST(LEN(FLATTEN([embedding[1:2], embedding[3:4]])) AS BIGINT)
                   AS flat4_len
        FROM embeddings ORDER BY vec_id
    """,
    "array_explode_pos": """
        SELECT vec_id, CAST(pos - 1 AS BIGINT) AS pos,
               ROUND(CAST(embedding[pos] AS DOUBLE), 6) AS val
        FROM embeddings, GENERATE_SERIES(1, 64) AS g(pos)
        WHERE vec_id < 4 AND pos <= LEN(embedding)
        ORDER BY vec_id, pos
    """,
    "array_transform_filter": """
        SELECT vec_id,
               ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:6],
                     x -> CAST(x AS DOUBLE) * 2.0 + 1.0)), 6) AS cal_sum6,
               CAST(LEN(LIST_FILTER(embedding[1:16],
                    x -> CAST(x AS DOUBLE) > 0)) AS BIGINT) AS n_pos_head16,
               ROUND(CAST(embedding[1] AS DOUBLE) * CAST(embedding[5] AS DOUBLE)
                   + CAST(embedding[2] AS DOUBLE) * CAST(embedding[6] AS DOUBLE)
                   + CAST(embedding[3] AS DOUBLE) * CAST(embedding[7] AS DOUBLE)
                   + CAST(embedding[4] AS DOUBLE) * CAST(embedding[8] AS DOUBLE),
                     6) AS dot_head4
        FROM embeddings ORDER BY vec_id
    """,
    "json_extract_events": """
        SELECT event_id,
               CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_path,
               CAST(REGEXP_EXTRACT(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k_typed,
               REGEXP_EXTRACT(props, '"(\\w+)":', 1) AS first_key
        FROM events ORDER BY event_id
    """,
}


ORACLE_SQL["json_corrupt_handling"] = """
    WITH payload AS (
        SELECT doc_id,
               CASE WHEN doc_id % 50 = 0
                    THEN '{"id": ' || CAST(doc_id AS VARCHAR)
                    ELSE '{"id": ' || CAST(doc_id AS VARCHAR)
                         || ', "n": ' || CAST(n_chars AS VARCHAR) || '}'
               END AS s
        FROM documents)
    SELECT CAST(SUM(CASE WHEN json_valid(s)
                              AND (s ->> '$.n') IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN json_valid(s)
                              AND (s ->> '$.n') IS NOT NULL
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_bad,
           CAST(SUM(CASE WHEN json_valid(s)
                              AND (s ->> '$.n') IS NOT NULL
                         THEN 0 ELSE doc_id END) AS BIGINT)
               AS bad_id_checksum,
           CAST(SUM(CASE WHEN json_valid(s)
                              AND (s ->> '$.n') IS NOT NULL
                         THEN CAST((s ->> '$.n') AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS good_n_total
    FROM payload
"""

ORACLE_SQL["map_build_zip_funcs"] = """
    WITH per AS (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS qty
        FROM lineitem GROUP BY 1, 2)
    SELECT l_returnflag,
           STRING_AGG(l_linestatus || ':'
                      || CAST(ROUND(qty / CAST(n AS DOUBLE), 6) AS VARCHAR),
                      '|' ORDER BY l_linestatus) AS avg_qty_by_status
    FROM per GROUP BY l_returnflag ORDER BY l_returnflag
"""
