"""Sort / limit / set-operation operators (SURVEY.md §2B).

Reference parity: A6 (``LIMIT 1`` first-row at
``database_peak_streaming.py:68``) generalizes to explicit-order
sort+limit — the reference leaned on SQLite insertion order, which a
distributed engine must replace with declared ordering.

Scale notes: global sort is a range-partitioned shuffle (Spark samples
key ranges); sort+limit(k) is optimized to per-partition top-k + single
merge (TakeOrderedAndProject), so `sort_limit` never materializes a full
global sort.  Set operations hash-shuffle both sides on the full row;
union-all is shuffle-free concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.batch import load_table


def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (desc, asc) + LIMIT with unique tiebreak.
    Plans as TakeOrderedAndProject — O(n) scan with a k-heap per
    partition, not a global sort."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .limit(50)
    )


def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST / NULLS LAST control (nulls synthesized via NULLIF —
    the fixtures carry none)."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.select(
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status_or_null"),
        )
        .orderBy(
            F.col("status_or_null").asc_nulls_first(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET/LIMIT pagination over a total order."""
    c = load_table(spark, "customer", sf_dir)
    return (
        c.orderBy("c_custkey")
        .select("c_custkey", "c_name")
        .offset(20)
        .limit(10)
    )


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two typed projections, then aggregate."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    u = c.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("kind")
    ).unionAll(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("kind"))
    )
    return (
        u.groupBy("nationkey", "kind")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey", "kind")
    )


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): nation keys present among customers or suppliers."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
        .orderBy("nationkey")
    )


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nation keys with both customers and suppliers."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: nation keys with customers but no suppliers."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(s.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union regardless of column order —
    positional unionAll silently mismatches when projections differ in
    order; by-name is the safe default for evolving pipelines."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    left = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    # deliberately different column order: unionByName must realign
    right = s.select(
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return (
        left.unionByName(right)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("acctbal").cast("decimal(28,6)")).cast("double"), 6)
            .alias("sum_bal"),
        )
        .orderBy("kind")
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling contract: count(*) vs count(col), null-skipping
    aggregates, null-safe equality (<=>), and null propagation in
    arithmetic — over a column with synthesized nulls."""
    o = load_table(spark, "orders", sf_dir)
    with_null = o.withColumn(
        "price_or_null",
        F.when(F.col("o_orderstatus") == "P", None).otherwise(F.col("o_totalprice")),
    )
    return (
        with_null.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("price_or_null").alias("n_nonnull"),
            F.round(F.avg("price_or_null"), 6).alias("avg_skipnull"),
            F.sum(
                F.col("price_or_null").eqNullSafe(F.lit(None).cast("double")).cast("int")
            ).cast("long").alias("n_nullsafe_eq_null"),
            F.sum(F.isnull(F.col("price_or_null") + 1).cast("int"))
            .cast("long")
            .alias("n_null_arith"),
        )
        .orderBy("o_orderstatus")
    )


def dedup_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset, made deterministic: keep the row
    with the smallest unique key per group (plain ``dropDuplicates``
    keeps an arbitrary row — unacceptable for reproducible pipelines, so
    the engine's canonical dedup is rank-then-filter)."""
    from pyspark.sql import Window

    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderstatus", "o_orderkey")
        .orderBy("o_custkey", "o_orderstatus")
    )


def skyline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-optimal / maximal-vector) operator: the
    customers no other customer dominates on (avg order value, order
    count) — "best tradeoff" queries the classic Borzsony/Kossmann/
    Stocker ICDE'01 operator answers, which plain ORDER BY + LIMIT
    cannot (the frontier, not a ranking).  y dominates x iff y >= x on
    both dimensions and > on at least one.  The dimensions are AVG
    order value x order count — anti-correlated enough that a real
    frontier exists (total spend x count degenerates: spend grows with
    count, so one whale dominates everything).

    Scale design: the naive NOT EXISTS is the oracle; the engine runs
    the 2-D sort-scan form as windows — collapse customers to distinct
    avg-value LEVELS with the level's max count, take the running max
    of counts over strictly-higher levels (one ordered window over the
    level table, which is at most customer-sized and typically far
    smaller), and keep x iff no higher level reaches its count and no
    same-level customer exceeds it.  One customer-sized groupBy + one
    level-sized window — O(n log n) work vs the oracle's O(n^2) pair
    scan.  Avg value goes through the cast-stable ROUND(cast, 6)
    boundary before the one division, so both engines compare
    identical doubles."""
    o = load_table(spark, "orders", sf_dir)
    # decimal -> ROUND(cast, 6) -> ONE double division -> round: the
    # cast-stable boundary (engines' decimal->double casts can differ
    # by 1 ulp; the scale-6 round collapses them before arithmetic)
    per_cust = o.groupBy("o_custkey").agg(
        F.round(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast(
                    "double"
                ),
                6,
            )
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    lvl = per_cust.groupBy("avg_value").agg(F.max("n_orders").alias("mf"))
    w = Window.orderBy(F.col("avg_value").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lvl = lvl.withColumn("m_higher", F.max("mf").over(w))
    return (
        per_cust.join(lvl, "avg_value")
        .where(
            (
                F.col("m_higher").isNull()
                | (F.col("m_higher") < F.col("n_orders"))
            )
            & (F.col("mf") == F.col("n_orders"))
        )
        .select(
            "o_custkey",
            "avg_value",
            F.col("n_orders").cast("long").alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


QUERIES = {
    "sort_limit_topn": sort_limit_topn,
    "skyline_customers": skyline_customers,
    "sort_nulls_ordering": sort_nulls_ordering,
    "limit_offset_page": limit_offset_page,
    "setop_union_all": setop_union_all,
    "setop_union_distinct": setop_union_distinct,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "setop_union_by_name": setop_union_by_name,
    "null_semantics": null_semantics,
    "dedup_drop_duplicates": dedup_drop_duplicates,
}

ORACLE_SQL = {
    "skyline_customers": """
        WITH pc AS (
            SELECT o_custkey,
                   ROUND(ROUND(CAST(SUM(CAST(o_totalprice
                                             AS DECIMAL(28,6)))
                                    AS DOUBLE), 6)
                         / COUNT(*), 6) AS avg_value,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1)
        SELECT x.o_custkey, x.avg_value, x.n_orders
        FROM pc x
        WHERE NOT EXISTS (
            SELECT 1 FROM pc y
            WHERE y.avg_value >= x.avg_value
              AND y.n_orders >= x.n_orders
              AND (y.avg_value > x.avg_value
                   OR y.n_orders > x.n_orders))
        ORDER BY x.o_custkey
    """,
    "sort_limit_topn": """
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    "sort_nulls_ordering": """
        SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
        FROM orders
        ORDER BY status_or_null ASC NULLS FIRST, o_orderkey ASC
        LIMIT 100
    """,
    "limit_offset_page": """
        SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey LIMIT 10 OFFSET 20
    """,
    "setop_union_all": """
        SELECT nationkey, kind, COUNT(*) AS n FROM (
            SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
        ) u GROUP BY nationkey, kind ORDER BY nationkey, kind
    """,
    "setop_union_distinct": """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "setop_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "setop_except": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier
        ORDER BY nationkey
    """,
    "setop_union_by_name": """
        SELECT kind, COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(acctbal AS DECIMAL(28,6))) AS DOUBLE), 6)
                   AS sum_bal
        FROM (
            SELECT c_nationkey AS nationkey, c_acctbal AS acctbal,
                   'customer' AS kind FROM customer
            UNION ALL
            SELECT s_nationkey, s_acctbal, 'supplier' FROM supplier
        ) u GROUP BY kind ORDER BY kind
    """,
    "null_semantics": """
        SELECT o_orderstatus,
               COUNT(*) AS n_rows,
               COUNT(price_or_null) AS n_nonnull,
               ROUND(AVG(price_or_null), 6) AS avg_skipnull,
               CAST(SUM(CAST(price_or_null IS NOT DISTINCT FROM NULL AS INT))
                    AS BIGINT) AS n_nullsafe_eq_null,
               CAST(SUM(CAST(price_or_null + 1 IS NULL AS INT)) AS BIGINT)
                   AS n_null_arith
        FROM (SELECT o_orderstatus,
                     CASE WHEN o_orderstatus = 'P' THEN NULL
                          ELSE o_totalprice END AS price_or_null
              FROM orders) t
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "dedup_drop_duplicates": """
        SELECT o_custkey, o_orderstatus, o_orderkey FROM (
            SELECT o_custkey, o_orderstatus, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                      ORDER BY o_orderkey) AS rn
            FROM orders) t
        WHERE rn = 1 ORDER BY o_custkey, o_orderstatus
    """,
}
