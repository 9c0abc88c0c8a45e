"""TPC-H-shaped multi-join analytic queries over the fixture star schema
(SURVEY.md §2B join/agg composition; the workloads a user of a general
analytic engine actually runs).

Q3/Q5/Q10 analogues adapted to the fixture columns.  Scale notes: these
are the plans where Catalyst's join ordering + broadcast selection earn
their keep — dims (region/nation/customer/supplier) broadcast, the
orders⋈lineitem spine sort-merges on orderkey with AQE skew handling;
each query's output is bounded (top-k or group-by-small-key), so the
driver transfer is O(k) regardless of input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.operators.common import (
    DEC,
    dsum,
    dsum_bounded,
    merge_micros_checked,
    micros_partial,
    r6,
)
from database_peak_streaming_spark.sources.batch import load_table

def _revenue():
    # built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem,
    revenue per order, top 10 by revenue."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-01-01"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # customer scales with SF: AQE decides
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # per-order revenue: bounded lineitem count per order -> the
        # long micro-unit partial is overflow-safe at any SF
        .agg(dsum_bounded(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: revenue by nation where customer and supplier share the
    nation, within one region and a date range — the 6-way star join."""
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    n = load_table(spark, "nation", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer and supplier scale with SF (15 M / 1 M rows at sf100):
        # no hint — AQE broadcasts at fixture scale, shuffles at warehouse
        # scale.  Only the bounded dims (nation 25, region 5) are pinned.
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        # nation groups grow with SF -> two-phase exact sum: primitive
        # long micro-units per (nation, partition), decimal merge above
        # (the q1 pattern; the merge moves only 25 x P rows)
        .groupBy("n_name", F.spark_partition_id().alias("_pid"))
        .agg(
            micros_partial(_revenue(), "_m_rev"),
            F.count(F.lit(1)).alias("_n"),
        )
        .groupBy("n_name")
        .agg(
            merge_micros_checked("_m_rev", "revenue"),
            F.sum("_n").alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: revenue lost to returned items per customer, top 20."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority counts for 1996 orders that have at least
    one returned lineitem — EXISTS rewritten as a left-semi join.  At
    scale the semi-join shuffles only (orderkey) pairs, never payload."""
    o = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: single-row revenue-change forecast — three conjunctive
    range predicates that should ALL reach the parquet scan as pushed
    filters (min/max row-group pruning does the work at 100 TB)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_discount").between(0.02, 0.06))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations by ship year.
    Both nation dims broadcast; the disjunctive pair predicate prunes
    before the groupBy so the shuffle carries two nations' rows only."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_0") & (F.col("cust_nation") == "NATION_1")
    ) | ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_0"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)  # scales with SF: AQE decides
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's share of PROMO-part revenue sold into ASIA,
    by order year.  The share is a conditional-sum / sum ratio computed
    in one aggregation pass (no second scan, no self-join)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    cn = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    sn = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    rev = _revenue().cast(DEC)
    nation_rev = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0).cast(DEC))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)  # scales with SF: AQE decides
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                nation_rev.cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share"),
            dsum(_revenue(), "total_revenue"),
        )
        .orderBy("o_year")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percent of 1997 revenue from PROMO parts — conditional
    aggregation over the part join, single output row.

    Broadcast-hint policy (applies to every query in this module): hints
    are pinned only on bounded dims (region=5, nation=25 rows at every
    SF) and on filtered-small build sides; any table that scales with SF
    (customer, unfiltered supplier/part) is left to AQE, which broadcasts
    at fixture scale and switches to a shuffle join at warehouse scale —
    a pinned hint would instead OOM the driver at 100 TB."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    p = load_table(spark, "part", sf_dir)
    rev = _revenue().cast(DEC)
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # unfiltered part: AQE decides
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: average yearly revenue lost if small-quantity orders
    (below 40% of the part's mean quantity) moved to bulk.  The per-part
    mean is a first aggregation re-joined on l_partkey — both sides
    shuffle on the same key, so AQE coalesces them into one exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    # exact decimal sum / count (not F.avg): the threshold compare below
    # must be byte-identical with the single-node oracle at any partitioning
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 6
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers whose single orders exceed 300 units.  The
    HAVING subquery is a pre-aggregation of lineitem alone — the big
    table collapses to (orderkey, qty) before any join touches it.

    No broadcast hint on customer: it scales with SF (15 M rows at
    sf100), so the join strategy is left to AQE, which broadcasts at
    fixture scale and shuffles at warehouse scale.  Hints are reserved
    for tables that stay small under scale-up (region/nation, filtered
    part/supplier).

    The HAVING aggregate DOES carry a broadcast hint: ``> 300 units``
    keeps ~0.3% of orders, so the aggregate is two orders of magnitude
    smaller than either fact at every SF — and without the hint the
    size-blind planner picks the WRONG build side (measured at 30x
    sf0.1: the pruned orders scan estimates just under the broadcast
    threshold, so Spark built a 4.5M-row hashed relation from orders
    against the 14k-row aggregate probe — 2.9 s of the query's 4.5 s
    wall).  Narrow (orderkey, qty) rows at 0.3% selectivity stay
    broadcastable far past sf1000; beyond that, drop the hint and AQE
    shuffles both sides."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    # exact sum in long micro-units: an order has a bounded lineitem
    # count, so the per-group long partial cannot overflow at any SF —
    # and the 18M-row hot path sums primitives, not BigDecimals
    oq = (
        li.groupBy("l_orderkey")
        .agg(dsum_bounded("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        F.broadcast(oq).join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity branches.
    The disjunction sits on the join output; each branch alone is
    sargable, and Catalyst extracts the common l_partkey join key so the
    broadcast hash join still applies."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # unfiltered part: AQE decides
        .filter(cond)
        .agg(dsum(_revenue(), "revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per-segment count + balance of above-average-balance
    customers with no orders since 2000 — scalar subquery threshold plus
    an anti-join.  The scalar stays IN the plan as a broadcast 1-row
    cross join (same pattern as ``filter_scalar_subquery``): no eager
    driver job, one composed Catalyst plan; the anti-join shuffles only
    custkeys."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier per part — the correlated-MIN
    subquery.  The fixture has no partsupp, so the supply relation is
    derived from lineitem history: per (part, supplier) the best unit
    price ever quoted.  The correlated ``cost = (SELECT MIN ...)`` is a
    single window-min over l_partkey: one shuffle, no join-back, and the
    window key is the same as the derivation groupBy key so AQE reuses
    the exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 15)
    )
    # Prune BEFORE aggregating: the part filter and the EU-supplier set
    # are both broadcastable dims, so they cut the groupBy input at the
    # scan (at 100 TB this is the difference between aggregating every
    # (part, supplier) pair and only the filtered family's).  The
    # correlated MIN is per-part, and both filters are part-/supplier-
    # level, so pruning first leaves the min unchanged.
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    supply = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name",
                 "p_partkey", "p_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        supply.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            r6(F.col("unit_cost"), "unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier nation and order year over a
    name-matched part family.  No partsupp, so supply cost is modeled as
    10% of p_retailprice — the plan shape (4-way join, LIKE filter on the
    dim, two-key groupBy) is what's being exercised."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("%bolt%"))
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)  # scales with SF: AQE decides
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum(amount, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value held by one region's suppliers, kept
    only where it exceeds a fraction of the global total — the
    scalar-subquery HAVING.  The scalar stays in the plan as a broadcast
    1-row cross join (no driver pull); both sums are decimal-exact so
    the threshold compare is partitioning-independent."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    base = (
        li.join(s, li.l_suppkey == s.s_suppkey)  # scales with SF: AQE decides
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    total = base.agg(dsum(value, "t"))
    return (
        base.groupBy("l_partkey")
        .agg(dsum(value, "part_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(0.0005) * F.col("t"))
        .drop("t")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional aggregation over late shipments.  The
    fixture has no shipmode/commit/receipt dates, so "late" = shipped
    more than 90 days after the order date, bucketed by linestatus with
    urgent-vs-other priority counts.  The CASE/COUNT pair stays inside
    one whole-stage-codegen agg — no extra pass per branch."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: histogram of customers by order count — LEFT OUTER join
    with a join-time filter (so zero-order customers survive), then a
    second aggregation over the first.  Both groupBys are small-key;
    the only wide shuffle is the outer join on custkey."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: the supplier(s) with maximum quarterly revenue — a
    grouped view compared against its own MAX.  Revenue sums are
    decimal-exact, so the equality against the max is safe on any
    partitioning; the max stays in the plan as a broadcast 1-row
    cross join (no driver pull)."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    s = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy("l_suppkey").agg(dsum(_revenue(), "total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .drop("max_revenue")
        .join(s, F.col("l_suppkey") == s.s_suppkey)  # scales with SF: AQE decides
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier counts per part attribute bucket,
    excluding a supplier denylist (NOT IN → broadcast anti-join).  The
    supply relation is the distinct (part, supplier) pairs observed in
    lineitem; countDistinct shuffles only after the dimension filter
    has pruned parts."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = load_table(spark, "supplier", sf_dir).filter(F.col("s_acctbal") < 0)
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers who dominate a part's supply — nested
    aggregation feeding a semi-join.  A supplier qualifies if it shipped
    >40% of a 'small%' part's 1996 volume; the per-part total is a
    window sum over the same key as the groupBy (exchange reused), and
    only qualifying suppkeys reach the supplier dim."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").like("small%"))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    from pyspark.sql import Window

    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum(F.col("qty").cast(DEC)).over(w).cast("double")
        )
        .filter(F.col("qty") > F.lit(0.4) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        # dominant is bounded by |suppliers| — broadcast the semi-join
        # build side so the supplier dim never shuffles
        s.join(F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who alone held up multi-supplier orders.
    "Late" = shipped >60 days after the order date (no receipt/commit
    dates in the fixture) on a finished ('F') order.

    The textbook EXISTS / NOT-EXISTS pair (another supplier exists in
    the order; no OTHER supplier was late) is algebraically the per-order
    predicate: #distinct suppliers >= 2 AND #distinct late suppliers = 1
    — computed as ONE aggregation over the order, replacing two
    self-joins of lineitem with a single shuffle.  The oracle states the
    EXISTS form; results are identical."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    from pyspark.sql import Window

    flagged = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    )
    # Per-order supplier counts as window aggregates over the join's own
    # orderkey partitioning — the sort-merge join already partitioned
    # (and sorted) by orderkey, so these add NO exchange, and the
    # lineitem⋈orders subtree is evaluated once instead of twice
    # (groupBy + join-back would plan the join under both branches).
    w = Window.partitionBy("l_orderkey")
    return (
        flagged.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)  # scales with SF: AQE decides
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q12_late_shipment_priority": q12_late_shipment_priority,
    "q13_customer_order_distribution": q13_customer_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q20_dominant_part_suppliers": q20_dominant_part_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q10_returned_items": q10_returned_items,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_dormant_customers": q22_dormant_customers,
}

ORACLE_SQL = {
    "q2_min_cost_supplier": """
        WITH supply AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ), eu AS (
            SELECT supply.*, s_acctbal, s_name, n_name
            FROM supply
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               ROUND(unit_cost, 6) AS unit_cost
        FROM eu
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 15
          AND unit_cost = (SELECT MIN(e2.unit_cost) FROM eu e2
                           WHERE e2.l_partkey = eu.l_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q9_product_type_profit": f"""
        SELECT n_name AS nation,
               CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             - 0.1 * p_retailprice * l_quantity AS {DEC}))
                    AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY n_name, YEAR(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
    "q11_important_stock": f"""
        WITH base AS (
            SELECT l_partkey, l_extendedprice * (1 - l_discount) AS value
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        )
        SELECT l_partkey,
               CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) AS part_value
        FROM base
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(value AS {DEC})) AS DOUBLE) >
               0.0005 * (SELECT CAST(SUM(CAST(value AS {DEC})) AS DOUBLE)
                         FROM base)
        ORDER BY part_value DESC, l_partkey
    """,
    "q12_late_shipment_priority": """
        SELECT l_linestatus,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                          THEN 1 END) AS low_line_count
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
    "q13_customer_order_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH revenue0 AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                        AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, s_acctbal, total_revenue
        FROM revenue0
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
        ORDER BY s_suppkey
    """,
    "q16_supplier_part_count": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q20_dominant_part_suppliers": f"""
        WITH shipped AS (
            SELECT l_partkey, l_suppkey,
                   CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ), tot AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(qty AS {DEC})) AS DOUBLE) AS total_qty
            FROM shipped GROUP BY l_partkey
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (SELECT l_suppkey FROM shipped
                            JOIN tot USING (l_partkey)
                            WHERE qty > 0.4 * total_qty)
        ORDER BY s_name
    """,
    "q21_waiting_suppliers": """
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1996-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q6_forecast_revenue": f"""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS {DEC}))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
           OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0')
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q8_market_share": f"""
        SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
               ROUND(
                 CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                               THEN CAST(l_extendedprice * (1 - l_discount)
                                         AS {DEC})
                               ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                        AS DOUBLE), 6) AS mkt_share,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        GROUP BY o_year
        ORDER BY o_year
    """,
    "q14_promo_revenue": f"""
        SELECT ROUND(
                 100.0
                 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                 THEN CAST(l_extendedprice * (1 - l_discount)
                                           AS {DEC})
                                 ELSE CAST(0 AS {DEC}) END) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                        AS DOUBLE), 6) AS promo_revenue_pct,
               COUNT(*) AS n_rows
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
    """,
    "q17_small_quantity_revenue": f"""
        WITH part_avg AS (
            SELECT l_partkey AS pa_partkey,
                   CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) / COUNT(*)
                       AS avg_qty
            FROM lineitem GROUP BY l_partkey)
        SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS DOUBLE) / 7.0,
                     6) AS avg_yearly,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part_avg ON l_partkey = pa_partkey
        WHERE l_quantity < 0.4 * avg_qty
    """,
    "q18_large_volume_customers": f"""
        WITH oq AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM(CAST(l_quantity AS {DEC})) AS DOUBLE) > 300)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               total_qty
        FROM oq
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
    """,
    "q19_disjunctive_revenue": f"""
        SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {DEC}))
                    AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 20 AND 40)
    """,
    "q22_dormant_customers": f"""
        SELECT c_mktsegment, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS {DEC})) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
}
