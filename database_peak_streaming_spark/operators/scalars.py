"""Scalar-function packs: string / date / math / conditional
(SURVEY.md §2B scalar-* rows; reference P6/P7/P13 arithmetic).

All built-in column expressions — JVM-side, whole-stage-codegen'd, never
Python.  Cross-engine cast discipline: double->int casts are expressed as
explicit FLOOR/ROUND (Spark truncates, DuckDB rounds — we never rely on
implicit cast rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/substr/upper/lower/trim/length/split/regexp over part."""
    p = load_table(spark, "part", sf_dir)
    return (
        p.select(
            "p_partkey",
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.upper(F.col("p_name")).alias("name_upper"),
            F.lower(F.col("p_type")).alias("type_lower"),
            F.substring(F.col("p_name"), 1, 5).alias("name_pfx"),
            F.length(F.col("p_name")).cast("long").alias("name_len"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
                "brand_trim"
            ),
            F.regexp_extract(F.col("p_brand"), r"#(\d+)", 1).alias("brand_num"),
            F.regexp_replace(F.col("p_type"), r"[aeiou]", "_").alias("type_devowel"),
            F.size(F.split(F.col("p_name"), " ")).cast("long").alias("name_words"),
            F.col("p_name").like("%a%").alias("has_a"),
        )
        .orderBy("p_partkey")
    )


def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/interval arith/datediff/epoch (P4/P6)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            F.dayofmonth("o_orderdate").cast("long").alias("dom"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 5 DAYS")).alias("plus5d"),
            F.datediff(
                F.to_date(F.lit("2000-01-01")), F.to_date("o_orderdate")
            ).cast("long").alias("days_to_y2k"),
            F.to_date("o_orderdate").alias("order_date"),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/pow/sqrt/log/exp/mod (P7/P13 arithmetic)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_orderkey") <= 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice"), 1).alias("price_r1"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.ceil(F.col("l_quantity")).cast("long").alias("qty_ceil"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
            F.round(F.pow(F.col("l_discount") + 1.0, 2), 6).alias("disc_sq"),
            F.round(F.sqrt(F.col("l_extendedprice")), 6).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
            (F.col("l_linenumber") % 3).alias("line_mod3"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-evaluation scalar pack: ``try_divide`` / ``try_cast`` /
    ``try_element_at`` return NULL where ANSI mode (Spark 4 default)
    would raise — division by zero, unparseable cast, out-of-bounds
    index.  The null-not-fail contract is what lets a 100 TB batch job
    survive the one malformed row in shard 9,000 instead of dying at
    98%; the oracle uses DuckDB's equivalents (x/0 -> NULL, TRY_CAST,
    out-of-bounds list index -> NULL)."""
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") < 200)
    mixed = F.when(
        F.col("l_linenumber") % 2 == 0, F.col("l_orderkey").cast("string")
    ).otherwise(F.col("l_returnflag"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") % 3), 6
            ).alias("safe_div"),
            F.try_element_at(
                F.array(F.col("l_quantity")), F.col("l_linenumber")
            ).alias("maybe_qty"),
            mixed.try_cast("int").alias("parsed"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / explicit casts."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 300_000, "high")
            .when(F.col("o_totalprice") > 100_000, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
            .alias("status_coalesced"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
            F.floor(F.col("o_totalprice")).cast("long").alias("price_floor_int"),
            (F.col("o_orderstatus") == "F").cast("int").cast("long").alias("is_final"),
        )
        .orderBy("o_orderkey")
    )


def str_funcs_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string pack: initcap/pad/reverse/replace/levenshtein/
    position — fuzzy-matching and formatting primitives."""
    p = load_table(spark, "part", sf_dir)
    return (
        p.select(
            "p_partkey",
            F.initcap(F.col("p_type")).alias("type_title"),
            F.lpad(F.col("p_brand"), 12, "_").alias("brand_lpad"),
            F.rpad(F.col("p_brand"), 12, ".").alias("brand_rpad"),
            F.reverse(F.col("p_brand")).alias("brand_rev"),
            F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#10")).cast("long").alias(
                "lev_to_b10"
            ),
            F.instr(F.col("p_name"), "a").cast("long").alias("first_a_pos"),
        )
        .orderBy("p_partkey")
    )


def date_funcs_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date pack: quarter/weekofyear/dayofweek/last_day/months."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
            F.dayofweek("o_orderdate").cast("long").alias("dow_1sun"),
            F.last_day("o_orderdate").alias("month_end"),
            F.add_months(F.to_date("o_orderdate"), 3).alias("plus_3mo"),
        )
        .orderBy("o_orderkey")
    )


QUERIES = {
    "str_funcs": str_funcs,
    "str_funcs_extra": str_funcs_extra,
    "date_funcs": date_funcs,
    "date_funcs_extra": date_funcs_extra,
    "math_funcs": math_funcs,
    "cond_funcs": cond_funcs,
    "try_funcs": try_funcs,
}

ORACLE_SQL = {
    "str_funcs": r"""
        SELECT p_partkey,
               p_brand || ':' || p_type AS brand_type,
               UPPER(p_name) AS name_upper,
               LOWER(p_type) AS type_lower,
               SUBSTRING(p_name, 1, 5) AS name_pfx,
               CAST(LENGTH(p_name) AS BIGINT) AS name_len,
               TRIM('  ' || p_brand || '  ') AS brand_trim,
               REGEXP_EXTRACT(p_brand, '#(\d+)', 1) AS brand_num,
               REGEXP_REPLACE(p_type, '[aeiou]', '_', 'g') AS type_devowel,
               CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS BIGINT)
                   AS name_words,
               p_name LIKE '%a%' AS has_a
        FROM part ORDER BY p_partkey
    """,
    "date_funcs": """
        SELECT o_orderkey,
               CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
               CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
               CAST(DAY(o_orderdate) AS BIGINT) AS dom,
               CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
               o_orderdate + INTERVAL 5 DAY AS plus5d,
               CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                    AS BIGINT) AS days_to_y2k,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders ORDER BY o_orderkey
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 1) AS price_r1,
               ABS(l_discount - 0.05) AS disc_dev,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               ROUND(POW(l_discount + 1.0, 2), 6) AS disc_sq,
               ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
               ROUND(LN(l_extendedprice), 6) AS price_ln,
               ROUND(EXP(l_discount), 6) AS disc_exp,
               l_linenumber % 3 AS line_mod3
        FROM lineitem WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber
    """,
    "str_funcs_extra": """
        SELECT p_partkey,
               LIST_AGGREGATE(LIST_TRANSFORM(STRING_SPLIT(LOWER(p_type), ' '),
                   w -> UPPER(w[1]) || w[2:]), 'string_agg', ' ') AS type_title,
               LPAD(p_brand, 12, '_') AS brand_lpad,
               RPAD(p_brand, 12, '.') AS brand_rpad,
               REVERSE(p_brand) AS brand_rev,
               REPLACE(p_brand, '#', '-') AS brand_dash,
               CAST(LEVENSHTEIN(p_brand, 'Brand#10') AS BIGINT) AS lev_to_b10,
               CAST(STRPOS(p_name, 'a') AS BIGINT) AS first_a_pos
        FROM part ORDER BY p_partkey
    """,
    "date_funcs_extra": """
        SELECT o_orderkey,
               CAST(QUARTER(o_orderdate) AS BIGINT) AS qtr,
               CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS iso_week,
               CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow_1sun,
               LAST_DAY(o_orderdate) AS month_end,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo
        FROM orders ORDER BY o_orderkey
    """,
    "try_funcs": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice / (l_linenumber % 3), 6) AS safe_div,
               ([l_quantity])[l_linenumber] AS maybe_qty,
               TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                             THEN CAST(l_orderkey AS VARCHAR)
                             ELSE l_returnflag END AS INTEGER) AS parsed
        FROM lineitem
        WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber
    """,
    "cond_funcs": """
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 300000 THEN 'high'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'low' END AS price_band,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_coalesced,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor_int,
               CAST(CAST(o_orderstatus = 'F' AS INT) AS BIGINT) AS is_final
        FROM orders ORDER BY o_orderkey
    """,
}
