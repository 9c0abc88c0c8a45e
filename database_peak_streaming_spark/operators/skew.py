"""Skew-mitigation operators (SURVEY.md §4 "hard parts": salted keys for
skewed groupBy; AQE skew-join is on in session.py for the join side).

A 100 TB aggregation with a hot key (one channel misbehaving at 1000x
rate, one user generating half the events) funnels the hot key's entire
volume through one reduce task.  Salting splits the hot key into N
sub-keys for the expensive first-stage aggregation, then merges the N
partials — two cheap shuffles instead of one stuck straggler.

These helpers are *semantically transparent*: tests assert salted ==
unsalted == oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {sum, dsum, count, min, max} (the algebraic aggregates that
    re-combine; ``dsum`` is the engine's order-independent decimal sum,
    cast back to double — see operators/common.dsum; avg = sum/count
    composed by the caller — non-algebraic aggregates like median cannot
    be salted and must use AQE instead).

    Phase 1 groups by (keys..., salt) — hot keys spread over
    ``salt_buckets`` tasks; phase 2 re-aggregates the partials by keys.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1_exprs = []
    phase2_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "dsum":
            phase1_exprs.append(
                F.sum(F.col(col).cast("decimal(28,6)")).alias(f"_p_{out}")
            )
            phase2_exprs.append(F.sum(f"_p_{out}").cast("double").alias(out))
        elif fn == "count":
            phase1_exprs.append(F.count(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate cannot be salted: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_sum_decimal(
    df: DataFrame, keys: list[str], col: str, out: str, salt_buckets: int = DEFAULT_SALT
) -> DataFrame:
    """Salted exact (decimal) sum — composes the engine's
    order-independent summation (operators/common.dsum) with salting, so
    the result is identical to the unsalted plan bit-for-bit."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.sum(F.col(col).cast("decimal(28,6)")).alias("_p")
    )
    return partial.groupBy(*keys).agg(F.sum("_p").cast("double").alias(out))


# -- registered (oracle-checked) form ------------------------------------

def agg_salted_hot_key(spark, sf_dir: str):
    """The skew pattern as a driver-checked query: lineitem aggregated by
    its 3-value return flag — exactly the hot-key shape (600M rows over 3
    reduce keys at sf100) that funnels a naive groupBy through 3
    stragglers.  Salting spreads phase 1 over (key, salt) buckets; the
    decimal re-sum makes the two-phase result bit-identical to the
    single-phase plan, which is why the plain GROUP BY is a valid oracle:
    the strategy changes the shuffle layout, never the answer."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir)
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "n_items": ("l_quantity", "count"),
            "total_price": ("l_extendedprice", "dsum"),
        },
    )
    return out.select(
        "l_returnflag", "n_items", F.round("total_price", 6).alias("total_price")
    ).orderBy("l_returnflag")


def join_salted_skew(spark, sf_dir: str):
    """The skew-JOIN pattern as a driver-checked query: fact rows are
    salted into ``DEFAULT_SALT`` sub-keys and the dim side is replicated
    once per salt, so a hot join key (one part appearing in half the
    lineitems at 100 TB) spreads over N tasks instead of one straggler.

    ``shuffle_hash`` hint pins the demonstration to a shuffled join
    (broadcast would hide the salting; AQE's skew-join split is the
    engine-native alternative and is enabled in session.py — this is
    the explicit form for when runtime splitting isn't available, e.g.
    a skewed OUTER side).  Semantically transparent: the salt is an
    arbitrary row-deterministic value, every fact row still meets
    exactly its one dim row, so the plain join is a valid oracle."""
    from database_peak_streaming_spark.sources.batch import load_table

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    fact = li.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64("l_partkey", "l_quantity", "l_extendedprice"),
            F.lit(DEFAULT_SALT),
        ).cast("int"),
    )
    dim = p.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(DEFAULT_SALT - 1)))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact["l_partkey"] == dim["p_partkey"])
        & (fact["_salt"] == dim["_salt"]),
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .select("p_brand", "n_items", F.round("total_price", 6).alias("total_price"))
        .orderBy("p_brand")
    )


QUERIES = {
    "agg_salted_hot_key": agg_salted_hot_key,
    "join_salted_skew": join_salted_skew,
}

ORACLE_SQL = {
    "join_salted_skew": """
        SELECT p_brand,
               COUNT(*) AS n_items,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                          AS DOUBLE), 6) AS total_price
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    "agg_salted_hot_key": """
        SELECT l_returnflag,
               COUNT(l_quantity) AS n_items,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6)))
                          AS DOUBLE), 6) AS total_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}
