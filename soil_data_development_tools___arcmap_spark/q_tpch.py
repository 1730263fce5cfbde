"""TPC-H-shaped benchmark queries over the driver tables."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import (
    RatingSpec,
    agg_dcd,
    agg_dcp,
    agg_hz_dcp_wta,
    agg_limiting,
    agg_maxmin,
    agg_pp_sum,
    agg_wta,
    month_collapse,
)
from .operators.horizon_agg import _member_sums, clipped_thickness

from ._qcore import _t, cents



# ------------------------------------------------- TPC-H bench classics


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    dbp = cents("l_discount")
    pc = cents("l_extendedprice")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(pc).alias("sum_base_price_c"),
            F.sum(pc * (100 - dbp)).alias("sum_disc_price_c2"),
            F.sum(pc * (100 - dbp) * (100 + cents("l_tax"))).alias("sum_charge_c3"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price_c",
            "sum_disc_price_c2",
            "sum_charge_c3",
            F.floor((F.col("sum_qty") / F.col("count_order")) * 10000)
            .cast("long")
            .alias("avg_qty_e4"),
            F.floor((F.col("sum_base_price_c") / F.col("count_order")) * 10000)
            .cast("long")
            .alias("avg_price_e4"),
            "count_order",
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    rev = F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
        "revenue_c2"
    )
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(orders.where(F.col("o_orderdate") < cutoff),
              li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev)
        .orderBy(F.col("revenue_c2").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue_c2",
        )
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
        "revenue_c2"
    )
    # dimension chain broadcasts; the only shuffle is lineitem⨝orders.
    dim = (
        nation.join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                    nation["n_regionkey"] == region["r_regionkey"])
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(
            F.broadcast(cust),
            (orders["o_custkey"] == cust["c_custkey"])
            & (cust["c_nationkey"] == supp["s_nationkey"]),
        )
        .join(F.broadcast(dim), supp["s_nationkey"] == dim["n_nationkey"])
        .groupBy("n_name")
        .agg(rev)
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6 — the pure filter-aggregate anchor: every predicate
    must reach the parquet scan (PushedFilters), ReadSchema carries
    only the 4 referenced columns, and the whole query is one scan +
    one partial/final aggregate pair (no shuffle of raw rows)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(cents("l_extendedprice") * cents("l_discount")).alias(
        "revenue_c2"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(rev)
    )


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 — promotion revenue share: conditional aggregation
    over the lineitem⨝part join, one month of shipdates pushed to the
    scan, part broadcast. Output in exact integer cent² units
    (numerator and denominator separately — the ratio is the consumer's
    one float op)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-09-01"))
            & (F.col("l_shipdate") < F.lit("1995-10-01"))
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
                    F.lit(0)
                )
            ).alias("promo_c2"),
            F.sum(rev).alias("total_c2"),
        )
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 — large-volume customers: the HAVING-aggregate
    semi-join anchor. The qualifying-order set comes from one
    map-side-combined groupBy; it semi-joins (left_semi, no row
    multiplication) back onto orders BEFORE the customer broadcast and
    the final aggregation, so the big lineitem table is scanned twice
    but never joined unfiltered. Top-100 with a full deterministic
    ordering (totalprice, orderdate, orderkey)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .where(F.col("__q") > 250)
        .select("l_orderkey")
    )
    o = orders.join(
        big, orders["o_orderkey"] == big["l_orderkey"], "left_semi"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate"
        )
        .agg(
            F.max(cents("o_totalprice")).alias("totalprice_c"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy(
            F.col("totalprice_c").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 — customer order-count distribution: LEFT OUTER join
    so zero-order customers survive with count 0 (adapted filter:
    exclude 1-URGENT orders in place of the comment LIKE the slim
    schema lacks), then a histogram groupBy over the per-customer
    counts. Two shuffles: custkey, then the (tiny-domain) count."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_c = (
        cust.join(
            orders, cust["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_c.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22-shaped global sales opportunity: customers in a
    nation set, above the positive-balance average (scalar-subquery
    broadcast), with no URGENT orders (left_anti against the filtered
    order set — the synthetic data gives every customer some order, so
    q22's bare NOT EXISTS would be vacuous). Balance average compared
    in exact cents·count cross-multiplication — no float division in
    the predicate. (c_nationkey plays q22's phone country code; the
    slim schema has no c_phone.)"""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nations = [1, 3, 5, 7, 9, 11, 13]
    pool = cust.where(F.col("c_nationkey").isin(nations))
    avg_row = pool.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("k")
    )
    qual = pool.crossJoin(F.broadcast(avg_row)).where(
        cents("c_acctbal") * F.col("k") > F.col("s")
    )
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    no_orders = qual.join(
        urgent, qual["c_custkey"] == urgent["o_custkey"], "left_anti"
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(cents("c_acctbal")).alias("totacctbal_c"),
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 volume shipping: revenue between two nation pairs
    (supplier nation x customer nation, both directions) by ship
    year. lineitem⨝orders is the only fact-fact shuffle; supplier,
    customer and nation are broadcast dims; the pair predicate
    applies post-join on the two broadcast-sourced keys."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["s_nk"])
        .join(F.broadcast(n2), cust["c_nationkey"] == n2["c_nk"])
        .where(
            ((n1["s_nk"] == 1) & (n2["c_nk"] == 2))
            | ((n1["s_nk"] == 2) & (n2["c_nk"] == 1))
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
                "revenue_c2"
            )
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10 returned-item reporting: lost revenue per customer
    from 'R'-flag lineitems of Q1-1995 orders, top 20 (deterministic
    tiebreak on custkey — plain LIMIT after a revenue sort is
    ambiguous under ties and would flap the oracle hash)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
        "revenue_c2"
    )
    per_c = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(rev)
    )
    return (
        per_c.join(cust, per_c["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            "c_custkey",
            "c_name",
            "revenue_c2",
            cents("c_acctbal").alias("acctbal_c"),
            "n_name",
        )
        .orderBy(F.col("revenue_c2").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12-shaped priority-by-lateness matrix (adapted: the slim
    schema has no l_shipmode/commitdate, so the bucket is shipdate
    lateness vs orderdate + 30 days): per bucket, how many lines came
    from high-priority (URGENT/HIGH) vs lower-priority orders. One
    fact-fact join, one tiny groupBy — the conditional counts fold
    into the aggregate, no pivot pass."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    orders = _t(spark, sf_dir, "orders")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30), "late"
    ).otherwise("ontime")
    return (
        j.select(bucket.alias("ship_bucket"), high.alias("high"))
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.col("high").cast("long")).alias("high_line_count"),
            F.sum((~F.col("high")).cast("long")).alias("low_line_count"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 top supplier: per-supplier revenue over Q1-1996, keep
    the supplier(s) achieving the maximum. The max is a one-row
    aggregate broadcast back over the per-supplier table (the scalar
    subquery shape) — revenue is exact integer cents so 'equals max'
    is well-defined cross-engine, no float-equality hazard."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                cents("l_extendedprice") * (100 - cents("l_discount"))
            ).alias("total_revenue_c2")
        )
    )
    mx = rev.agg(F.max("total_revenue_c2").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue_c2") == F.col("mx"))
        .join(F.broadcast(supp), rev["l_suppkey"] == supp["s_suppkey"])
        .select(
            F.col("s_suppkey"), F.col("s_name"), F.col("total_revenue_c2")
        )
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17 small-quantity-order revenue: lines of Brand#1 parts
    whose quantity is below 20% of that part's average quantity. The
    per-part average is a groupBy re-joined on partkey (both sides
    share the partkey shuffle); the 0.2x threshold compares as qty * 5
    * n < sum_qty — integer cross-multiplication, no float average.
    Output: total extended price (cents) of qualifying lines and its
    /7 'yearly' figure as exact integer division."""
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    qty = F.col("l_quantity").cast("long")
    stats = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sum_qty"), F.count(F.lit(1)).alias("n_lines")
    )
    j = li.join(stats, "l_partkey").where(
        qty * 5 * F.col("n_lines") < F.col("sum_qty")
    )
    return j.agg(
        F.sum(cents("l_extendedprice")).alias("total_c"),
        F.count(F.lit(1)).alias("n_small"),
    ).select(
        "total_c",
        "n_small",
        F.expr("total_c div 7").alias("avg_yearly_c"),
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21-shaped waiting-supplier census (adapted lateness:
    l_shipdate > o_orderdate + 60 days stands in for the missing
    receipt/commit dates): suppliers whose line was late on a
    finished multi-supplier order where EVERY OTHER supplier was on
    time. The textbook form is a correlated EXISTS + NOT EXISTS pair
    (the oracle keeps that spelling); the Spark-first rewrite is a
    grouped aggregation — per (order, supplier) collapse, then an
    order-level count/late-count window: 'exists another supplier' is
    n_supp >= 2 and 'no OTHER late supplier' is n_late == 1 for a late
    row. One scan of the joined lines and 3 exchanges instead of the
    three distinct passes + semi/anti joins (11 exchanges measured) of
    the literal translation."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).alias(
            "late"
        ),
    )
    per_supp = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("late")
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
    )
    return (
        waiting.join(
            F.broadcast(supp), waiting["l_suppkey"] == supp["s_suppkey"]
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- TPC-H completion batch: the 7 partsupp/column-adapted anchors ---
# The slim synthetic schema has no partsupp table (and no container /
# shipmode / comment columns), so q2/q9/q11/q16/q20 re-derive the
# part-supplier relation from lineitem — grouping (l_partkey,
# l_suppkey) IS the partsupp surrogate — and q8/q19 swap the missing
# attribute filters for p_type/p_size/p_brand equivalents. Every
# adaptation keeps the reference query's join/subquery SHAPE (that is
# what the plan audit grades); all arithmetic stays integer-exact per
# the module determinism contract.


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 minimum-cost supplier (adapted): the offer table is
    lineitem collapsed to (partkey, suppkey) -> min price-in-cents;
    for STANDARD parts of size 10-20 find the EUROPE supplier(s)
    matching the per-part minimum. The per-part min is a groupBy
    re-joined on partkey (the correlated-subquery shape); region and
    nation dims broadcast; top-100 by exact acctbal cents with a full
    tiebreak chain so the limit is deterministic cross-engine."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name", cents("s_acctbal").alias("s_acctbal_c"))
    )
    offers = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal_c")
        .agg(F.min(cents("l_extendedprice")).alias("cost_c"))
    )
    best = offers.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("cost_c").alias("min_cost_c")
    )
    return (
        offers.join(
            best,
            (offers["p_partkey"] == best["bp"])
            & (offers["cost_c"] == best["min_cost_c"]),
        )
        .select("s_acctbal_c", "s_name", "n_name", "p_partkey", "min_cost_c")
        .orderBy(
            F.col("s_acctbal_c").desc(),
            "n_name",
            "s_name",
            "p_partkey",
        )
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 national market share (adapted: p_type = 'ECONOMY'
    stands in for 'ECONOMY ANODIZED STEEL'): of ECONOMY-part revenue
    sold to AMERICA customers in 1995-1996, what fraction came from
    NATION_5 suppliers, per order year. Share is exact integer
    cross-multiplication (floor(1e4 * nation / total)); the one big
    join is lineitem-orders, everything else broadcasts."""
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    vol = cents("l_extendedprice") * (100 - cents("l_discount"))
    return (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0))).alias("nation_vol_c2"),
            F.sum(vol).alias("total_vol_c2"),
        )
        .select(
            "o_year",
            "nation_vol_c2",
            "total_vol_c2",
            F.floor(F.col("nation_vol_c2") * 10000 / F.col("total_vol_c2"))
            .cast("long")
            .alias("mkt_share_e4"),
        )
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 product-type profit (adapted: no ps_supplycost, so
    cost = p_retailprice * quantity — the same profit = revenue - cost
    shape over the same 6-table join): per supplier nation and order
    year, sum of line profit for parts named 'red ...'. Profit stays
    in exact c2 units (cents x bp): revenue_c2 - retail_c*qty*100."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red "))
    nation = _t(spark, sf_dir, "nation")
    supp_nat = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "n_name")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = cents("l_extendedprice") * (100 - cents("l_discount")) - cents(
        "p_retailprice"
    ) * F.col("l_quantity").cast("long") * 100
    return (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).alias("sum_profit_c2"))
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 important stock (adapted: part value = total
    extended-price cents shipped by NATION_3 suppliers, standing in
    for supplycost*availqty): keep parts whose value exceeds 0.1% of
    the national total. The scalar-subquery threshold is a one-row
    aggregate broadcast back (crossJoin); the comparison is integer
    cross-multiplied (value*1000 > total), no float fraction."""
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    value = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("value_c"))
    )
    total = value.agg(F.sum("value_c").alias("total_c"))
    return (
        value.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * 1000 > F.col("total_c"))
        .select("l_partkey", "value_c")
    )


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 supplier count by part spec (adapted: the
    part-supplier relation comes from lineitem; 'complaint' suppliers
    are proxied by negative account balance since the slim schema has
    no s_comment): distinct suppliers per (brand, type, size) for
    non-Brand#1, non-PROMO parts of seven square sizes."""
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 three-branch discounted revenue (adapted: the
    container/shipmode legs become p_size bands, the quantity bands
    stay): one broadcast hash join part-lineitem with the OR-of-ANDs
    predicate evaluated post-join, exactly the reference's shape. One
    output row of exact c2 revenue."""
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & qty.between(20, 30)
        )
    )
    return j.where(branch).agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
            "revenue_c2"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 potential part promotion (adapted: 'availqty > half
    of shipped' becomes '1996 shipments exceed half of all-time
    shipments of that part by that supplier' — same aggregate-filter
    subquery feeding a supplier semi-join): NATION_7 suppliers with at
    least 10 'hot ...' parts whose 1996 shipments exceed 75% of their
    all-time shipments. Integer comparison 4*qty96 > 3*qty_total; the
    >=10 floor makes the supplier-level cut discriminating (4 of 6
    NATION_7 suppliers qualify at sf0.01 — a bare exists would keep
    all 6, the vacuous-threshold trap). Part filter broadcasts; the
    semi-join keys are tiny."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("hot "))
    qual = (
        _t(spark, sf_dir, "lineitem")
        .join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("qty_total"),
            F.sum(
                F.when(
                    F.year("l_shipdate") == 1996,
                    F.col("l_quantity").cast("long"),
                ).otherwise(F.lit(0))
            ).alias("qty_96"),
        )
        .where(F.col("qty_96") * 4 > F.col("qty_total") * 3)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_frontloaded"))
        .where(F.col("n_frontloaded") >= 10)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape (adapted to the reduced schema: the EXISTS
    correlate is 'some line shipped after the order date', standing in
    for commit<receipt): per-priority count of orders in a quarter
    with at least one late-shipping line — the left-semi-join anchor.
    Catalyst plans the EXISTS as a shuffle semi-join on orderkey;
    the quarter filter pushes to the orders scan."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape (returnflag plays shipmode in the reduced
    schema): per-flag counts of high- vs low-priority orders among
    lines shipped in 1995 — the conditional-aggregation-after-join
    anchor. One fact-fact shuffle join on orderkey, map-side CASE
    counts."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: revenue from three OR'd brand/size/quantity
    brackets — the disjunctive-predicate pushdown anchor (the OR of
    ANDs must not defeat the join pushdown: the common
    part-join stays a single equi-join with the brackets evaluated as
    a residual filter). Exact cents, one broadcast of part."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    qty = F.col("l_quantity")
    br = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15)
           & qty.between(20, 30))
    )
    return j.where(br).agg(
        F.sum(cents("l_extendedprice") * (100 - cents("l_discount"))).alias(
            "revenue_c2"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
