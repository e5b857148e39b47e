"""TPC-H-style composite analytics over the star-schema fixture.

The reference has no multi-operator relational pipelines at all (its only
"query" is the DARIMA map-reduce, /root/reference/darima.py:143-169); the
FULL 22-query suite exercises the engine end-to-end — scan pushdown →
multi-way joins (broadcast dims + shuffled facts) → partial/final hash
aggregation → decorrelated subqueries → top-k — the shapes a 100 TB
warehouse runs all day. Adapted to the fixture columns (FIXTURES.md §2:
no partsupp/commitdate/shipmode/container, so Q2/9/11/16/20 derive the
part⋈supplier supply relation from lineitem's (l_partkey, l_suppkey),
Q4/Q12/Q21 substitute date-lag lateness predicates, and Q22's country
code is nationkey mod 10); aggregate aliases
match the oracles exactly. Revenue sums ride EXACT INTEGER CENTS wherever
a group can span many lines — double sums are summation-order-dependent
and a last-ulp difference vs the oracle's order eventually flips a
2-decimal rounding (first seen on Q10).

Scale notes (verified via .explain, PLANS.md):

* Q1 is a single scan + partial/final hash agg — filter and the 7-column
  projection reach the parquet reader (PushedFilters/ReadSchema); zero
  joins, one exchange of 6 rows.
* Q3/Q5 join facts on their natural keys and broadcast only the bounded
  dims (region/nation/supplier); orders⋈lineitem is a shuffled join on
  l_orderkey that AQE can re-plan. No join reads a column it doesn't use.
* Q3's top-10 is TakeOrderedAndProject (per-partition heaps + driver
  merge of 10 rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_darima_spark.queries import QuerySpec, load

_Q1_CUTOFF = "1998-09-02"
_Q3_DATE = "1998-03-15"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"


def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 pricing summary: the canonical scan→filter→hash-agg.
    Every aggregate is computed map-side first (partial agg), so the
    exchange carries |groups| rows regardless of input size."""
    li = load(spark, sf, "lineitem").where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


def q_tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shipping priority: segment-filtered customer ⋈ orders ⋈
    lineitem, revenue per order, top 10. Deterministic tie-break on
    o_orderkey so LIMIT is stable across engines."""
    cust = load(spark, sf, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf, "orders").where(
        F.col("o_orderdate") < F.lit(_Q3_DATE)
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf, "lineitem").where(
        F.col("l_shipdate") > F.lit(_Q3_DATE)
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        # exact integer cents (the Q10 lesson, applied fleet-wide after
        # Q5 tripped a rounding tie at the sf1 probe volume)
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: six-table star join. The three
    bounded dims (region, nation, supplier) are explicitly broadcast;
    the customer⋈orders⋈lineitem chain shuffles on its join keys."""
    region = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf, "nation")
    supplier = load(spark, sf, "supplier")
    cust = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit(_Q5_LO))
        & (F.col("o_orderdate") < F.lit(_Q5_HI))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dims = F.broadcast(
        supplier.join(
            nation, supplier.s_nationkey == nation.n_nationkey
        ).join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            dims,
            (li.l_suppkey == dims.s_suppkey)
            & (cust.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        # revenue as EXACT integer cents (the Q10 lesson — a raw double
        # sum tripped a 2nd-decimal rounding tie at the sf1 probe volume)
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                    ).cast("bigint")
                )
                / 100.0,
                2,
            ).alias("revenue")
        )
    )


def q_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 forecasting-revenue change: the minimal selective-scan
    aggregate — THREE pushed predicates (date range, discount band,
    quantity cap) reach the parquet reader, then a single 1-row global
    agg. At 100 TB this is the shape where row-group min/max statistics
    skip most of the table before a single value is decoded."""
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def q_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: HAVING over a fact aggregate
    (orders whose lineitems sum past 200 units) joined back to orders and
    customer, top-20 by price. The having-aggregate is computed FIRST so
    only qualifying orderkeys (≈6 % here) enter the joins — at scale the
    pre-aggregation is the difference between joining 100 TB of lineitem
    and joining a keys table; top-20 is TakeOrderedAndProject, never a
    global sort."""
    li = load(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 200)
    )
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_price"),
            "total_qty",
        )
        .orderBy(F.desc("o_price"), F.asc("o_orderkey"))
        .limit(20)
    )


def q_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 order-priority checking, adapted to the fixture (no
    l_commitdate/l_receiptdate): orders with ANY lineitem shipped > 90
    days after the order date, counted per priority. The EXISTS becomes a
    LEFT-SEMI join whose condition spans both sides (equi key + date
    inequality) — the probe side never duplicates orders however many
    lineitems are late, so the aggregate input stays |orders|-bounded."""
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


def q_tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: customers ranked by revenue on
    returned lineitems in one quarter. Two shuffled fact joins + one
    broadcast dim (nation), revenue per customer, top-20 via
    TakeOrderedAndProject with a unique tie-break."""
    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").where(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = F.broadcast(
        load(spark, sf, "nation").select("n_nationkey", "n_name")
    )
    # Per-customer revenue summed as EXACT integer cents (each line's
    # double product rounded once, then integer addition): double sums
    # are summation-order-dependent, and with enough lines per group a
    # last-ulp difference vs the oracle's own order eventually lands on a
    # rounding boundary (observed at sf0.01: 3e-8 relative → a flipped
    # 2nd decimal). Line-level rounding is deterministic on both engines.
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority, adapted (no l_shipmode): lines
    bucketed by ship latency class (days from order to ship), with the
    Q12 conditional aggregation — urgent/high orders counted separately
    from the rest inside one pass. One join, one CASE-heavy hash agg."""
    orders = load(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_shipdate")
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    ship_class = (
        F.when(lag_days <= 30, "FAST")
        .when(lag_days <= 90, "NORMAL")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("ship_class", ship_class)
        .groupBy("ship_class")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 promotion effect: share of one month's revenue from
    promo parts. part is a broadcast dim; the whole query is one
    broadcast join + a single 1-row conditional aggregate — the
    numerator/denominator never require two passes."""
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = F.broadcast(
        load(spark, sf, "part").select("p_partkey", "p_type")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_lines"),
        )
    )


def q_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: the OR-of-ANDs shape, written in SQL
    with the join key repeated INSIDE every disjunct exactly as the spec
    does — Catalyst must extract the common ``p_partkey = l_partkey``
    conjunct out of the OR to plan an equi-join at all (otherwise this is
    a cartesian product with a residual filter). The plan is asserted in
    tests/test_tpch_plans.py; the per-disjunct brand/size/quantity bands
    are adapted to the fixture's domains."""
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf, "part").createOrReplaceTempView("part")
    return spark.sql(
        """SELECT round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) / 100.0, 2)
                      AS revenue,
                  count(*) AS n_lines
           FROM lineitem, part
           WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
                  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
              OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
                  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
              OR (p_partkey = l_partkey AND p_brand = 'Brand#14'
                  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)"""
    )


def q_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations, by direction and
    ship year: the two-dimension star where BOTH fact sides carry a
    nation attribute (supplier's via lineitem, customer's via orders).
    The nation dims broadcast; the OR-of-directions filter rides the
    joined row, revenue summed as exact cents (the Q10 lesson)."""
    # The pair predicate implies BOTH nation attributes lie in the
    # two-name set, so the dims pre-filter to 2 rows each — the
    # supplier⋈nation and customer⋈nation composites stay tiny, broadcast
    # into the facts, and cut lineitem to the two nations' suppliers
    # BEFORE any fact shuffle (the Q5 dims-first pattern; the cross-dim
    # OR itself can only be applied after both sides are attached).
    nations = ("NATION_1", "NATION_2")
    nat = load(spark, sf, "nation").where(F.col("n_name").isin(*nations))
    sn = F.broadcast(
        load(spark, sf, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(nat, F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = F.broadcast(
        load(spark, sf, "customer")
        .select("c_custkey", "c_nationkey")
        .join(nat, F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    pair = (
        (F.col("supp_nation") == nations[0]) & (F.col("cust_nation") == nations[1])
    ) | (
        (F.col("supp_nation") == nations[1]) & (F.col("cust_nation") == nations[0])
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cn, orders.o_custkey == cn.c_custkey)
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))
    )


def q_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT OUTER join with
    the filter ON THE JOIN CONDITION (not a post-filter — customers with
    only excluded orders must still appear with count 0), then a
    two-level aggregate: orders per customer, customers per order-count.
    Pure-integer outputs — no rounding concerns at all."""
    cust = load(spark, sf, "customer").select("c_custkey")
    orders = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    j = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = j.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


def q_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: the correlated-average
    shape — lineitems below 20 % of their OWN part's average quantity.
    Written as the decorrelated plan Catalyst would produce anyway: the
    per-part average is a fact aggregate joined back on partkey (never a
    per-row subquery re-execution); part filters to a brand slice first
    so the avg aggregate runs only over candidate parts' lineitems."""
    part = F.broadcast(
        load(spark, sf, "part")
        .where((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(part, F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.join(avg_q, li.l_partkey == avg_q.ak)
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(cents) / 100.0 / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, adapted (no partsupp table in the
    fixture): the part⋈supplier supply relation is DERIVED from lineitem
    — per (partkey, suppkey), cost = the minimum unit price ever charged.
    The spec's correlated MIN subquery is written as its decorrelated
    plan: per-part min over the region's supply rows, joined back on
    (partkey, cost). Equality on the min is safe cross-engine because
    the unit-price division and min() are bit-identical binary64 ops —
    no summation-order exposure. Scale: both dims (brand-sliced part,
    region-sliced supplier composite) broadcast; the supply aggregation
    shuffles on the (partkey, suppkey) pair and the min-join-back reuses
    the partkey partitioning."""
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    supp = load(spark, sf, "supplier")
    sn = F.broadcast(
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = F.broadcast(
        load(spark, sf, "part")
        .where((F.col("p_size") <= 25) & (F.col("p_type") == "SMALL"))
        .select("p_partkey", "p_name")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    supply = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_cost = supply.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        supply.join(
            min_cost,
            (supply.p_partkey == min_cost.mk) & (supply.cost == min_cost.min_cost),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("cost", 4).alias("cost"),
        )
        .orderBy(F.desc("s_acctbal"), F.asc("s_name"), F.asc("p_partkey"))
        .limit(100)
    )


def q_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 national market share: one nation's suppliers' share of
    PROMO-part revenue sold into one region's customers, by order year.
    The share's numerator and denominator ride ONE conditional aggregate
    pass as exact integer cents, so the final division is a single
    deterministic op. Part and the supplier⋈nation composite broadcast;
    orders⋈lineitem shuffles on the orderkey; the customer side carries
    only (custkey, nationkey) into its join."""
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").where(F.col("r_name") == "ASIA")
    part = F.broadcast(
        load(spark, sf, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    sn = F.broadcast(
        load(spark, sf, "supplier")
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cn = (
        load(spark, sf, "customer")
        .join(
            F.broadcast(
                nation.join(region, nation.n_regionkey == region.r_regionkey)
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    orders = load(spark, sf, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    target = F.when(F.col("supp_nation") == "NATION_3", cents).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cn, orders.o_custkey == cn.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(cents).cast("double"), 4
            ).alias("mkt_share"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_revenue"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 product-type profit, adapted (no ps_supplycost): cost is
    proxied as 60 % of the part's retail price per unit, so profit =
    cents(revenue) − cents(0.6·retail·qty), each term rounded ONCE at
    line level and subtracted as integers (the Q10 lesson applied to a
    two-term measure). Name-sliced part and the supplier⋈nation
    composite broadcast; the only fact shuffle is lineitem⋈orders on the
    orderkey, then one hash agg on (nation, year)."""
    part = F.broadcast(
        load(spark, sf, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    sn = F.broadcast(
        load(spark, sf, "supplier")
        .join(
            load(spark, sf, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cost_cents = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 60
    ).cast("bigint")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(rev_cents - cost_cents) / 100.0, 2).alias("sum_profit"))
    )


def q_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 important stock, adapted (no partsupp): per-part supply
    value from one region's suppliers' lineitems, kept where the part's
    value exceeds 0.1 % of the region total. The HAVING-vs-global-scalar
    compare is EXACT integer arithmetic — value_cents · 1000 >
    total_cents — so no floating fraction ever touches the cut. The
    scalar total is a 1-row broadcast; the per-part agg shuffles once on
    partkey."""
    sn = F.broadcast(
        load(spark, sf, "supplier")
        .join(
            load(spark, sf, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            load(spark, sf, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    slice_ = li.join(sn, li.l_suppkey == sn.s_suppkey).select(
        "l_partkey", cents.alias("val_cents")
    )
    per_part = slice_.groupBy("l_partkey").agg(
        F.sum("val_cents").alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            "l_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


def q_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 top supplier: the revenue view over one quarter, then
    the supplier(s) achieving the global max. Revenue is exact integer
    cents so the max-equality join-back cannot miss on a ulp; the max is
    a 1-row broadcast against the |suppliers|-sized aggregate — never a
    global sort."""
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("rev_cents"))
    mx = rev.agg(F.max("rev_cents").alias("max_cents"))
    supp = F.broadcast(
        load(spark, sf, "supplier").select("s_suppkey", "s_name")
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("rev_cents") == F.col("max_cents"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, adapted (no partsupp): the
    relation is the DISTINCT (partkey, suppkey) pairs lineitem has ever
    shipped. Excluded-supplier NOT IN becomes a LEFT-ANTI hash join
    (negative-balance suppliers stand in for the spec's complaint
    filter); supplier_cnt is count_distinct per (brand, type, size).
    Pure-integer outputs. Scale: the distinct-pair agg is the only fact
    shuffle; part broadcasts; the anti join's build side (excluded
    suppliers) is tiny."""
    pairs = (
        load(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = F.broadcast(
        load(spark, sf, "part")
        .where(
            (F.col("p_brand") != "Brand#1")
            & (~F.col("p_type").like("PROMO%"))
            & (F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    excluded = F.broadcast(
        load(spark, sf, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        pairs.join(part, pairs.l_partkey == part.p_partkey)
        .join(excluded, pairs.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(20)
    )


def q_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, adapted (no ps_availqty): a
    supplier qualifies when, for some name-sliced part it supplies, its
    1997 shipped quantity EXCEEDS half its 1996 shipped quantity (the
    spec's half-of-annual-volume compare re-anchored on the two years
    the fixture has). Quantities are integer-valued doubles, so the
    sums and the 0.5× compare are exact. The qualifying-pair set reaches
    suppliers as a LEFT-SEMI join — supplier rows never duplicate
    however many parts qualify; part broadcasts into the pair agg."""
    part = F.broadcast(
        load(spark, sf, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load(spark, sf, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    ).select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    y97 = F.col("l_shipdate") >= F.lit("1997-01-01")
    pair_qty = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(y97, F.col("l_quantity")).otherwise(0.0)).alias("qty97"),
            F.sum(F.when(~y97, F.col("l_quantity")).otherwise(0.0)).alias("qty96"),
        )
        .where((F.col("qty96") > 0) & (F.col("qty97") > 0.5 * F.col("qty96")))
    )
    sn = (
        load(spark, sf, "supplier")
        .join(
            F.broadcast(
                load(spark, sf, "nation").join(
                    load(spark, sf, "region").where(F.col("r_name") == "ASIA"),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        sn.join(pair_qty, sn.s_suppkey == pair_qty.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


def q_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting, adapted (no
    commit/receipt dates): a line is LATE when shipped > 60 days after
    the order date. The spec's EXISTS (another supplier in the order) +
    NOT EXISTS (another LATE supplier) pair is decorrelated into ONE
    per-order aggregate — count_distinct suppliers and count_distinct
    late suppliers — joined back to the late lines: n_supp ≥ 2 ∧
    n_late_supp = 1 reproduces both quantifiers exactly (the late line's
    own supplier is the unique late one). Counting stays line-level to
    match EXISTS semantics. Region-sliced supplier composite broadcasts;
    the per-order agg reuses the orderkey partitioning of the join."""
    orders = load(spark, sf, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("po_key")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sn = F.broadcast(
        load(spark, sf, "supplier")
        .join(
            load(spark, sf, "nation").join(
                load(spark, sf, "region").where(F.col("r_name") == "ASIA"),
                F.col("n_regionkey") == F.col("r_regionkey"),
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        lines.where(F.col("is_late"))
        .join(
            per_order,
            (F.col("l_orderkey") == F.col("po_key"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_late_supp") == 1),
        )
        .join(sn, F.col("l_suppkey") == sn.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


def q_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity, adapted (no c_phone): the
    country code is c_nationkey mod 10, restricted to the odd codes.
    The positive-balance average threshold is applied as EXACT integer
    arithmetic — bal_cents · n > sum_cents — so no double division ever
    decides a boundary row (the scalar avg lands as a 1-row broadcast).
    Every fixture customer has SOME order, so the spec's "no orders"
    becomes "no orders since 1999" (lapsed customers — the same anti-join
    shape with a date-filtered build side, and a non-vacuous result);
    outputs are a count and a cents-exact balance sum per code."""
    cust = (
        load(spark, sf, "customer")
        .withColumn("cntrycode", F.col("c_nationkey") % 10)
        .where(F.col("cntrycode").isin(1, 3, 5, 7, 9))
        .withColumn(
            "bal_cents", F.round(F.col("c_acctbal") * 100).cast("bigint")
        )
    )
    thr = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum("bal_cents").alias("sum_cents"), F.count("*").alias("n_pos")
    )
    orders = load(spark, sf, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01")
    ).select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .crossJoin(F.broadcast(thr))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


QUERIES = {
    "q_tpch_q1": QuerySpec(
        q_tpch_q1,
        f"""SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                       AS sum_charge,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_extendedprice), 4) AS avg_price,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
            GROUP BY l_returnflag, l_linestatus""",
    ),
    "q_tpch_q3": QuerySpec(
        q_tpch_q3,
        f"""SELECT o_orderkey, o_orderdate, o_orderpriority,
                   round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100) AS BIGINT)) / 100.0, 2)
                       AS revenue
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
              AND l_shipdate > TIMESTAMP '{_Q3_DATE}'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10""",
    ),
    "q_tpch_q5": QuerySpec(
        q_tpch_q5,
        f"""SELECT n_name,
                   round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100) AS BIGINT)) / 100.0, 2)
                       AS revenue
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
              AND o_orderdate < TIMESTAMP '{_Q5_HI}'
            GROUP BY n_name""",
    ),
    "q_tpch_q6": QuerySpec(
        q_tpch_q6,
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                  count(*) AS n_items
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1995-01-01'
             AND l_shipdate < TIMESTAMP '1996-01-01'
             AND l_discount BETWEEN 0.05 AND 0.07
             AND l_quantity < 24""",
    ),
    "q_tpch_q18": QuerySpec(
        q_tpch_q18,
        """WITH big AS (
             SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
             FROM lineitem GROUP BY l_orderkey
             HAVING round(sum(l_quantity), 2) > 200
           )
           SELECT c_custkey, c_name, o_orderkey, o_orderdate,
                  round(o_totalprice, 2) AS o_price, total_qty
           FROM orders
           JOIN big ON o_orderkey = l_orderkey
           JOIN customer ON o_custkey = c_custkey
           ORDER BY o_price DESC, o_orderkey
           LIMIT 20""",
    ),
    "q_tpch_q4": QuerySpec(
        q_tpch_q4,
        """SELECT o_orderpriority, count(*) AS order_count
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1997-01-01'
             AND EXISTS (
               SELECT 1 FROM lineitem
               WHERE l_orderkey = o_orderkey
                 AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
           GROUP BY o_orderpriority""",
    ),
    "q_tpch_q10": QuerySpec(
        q_tpch_q10,
        """SELECT c_custkey, c_name, n_name,
                  round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) / 100.0, 2)
                      AS revenue
           FROM customer
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN nation ON c_nationkey = n_nationkey
           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1996-04-01'
             AND l_returnflag = 'R'
           GROUP BY c_custkey, c_name, n_name
           ORDER BY revenue DESC, c_custkey
           LIMIT 20""",
    ),
    "q_tpch_q12": QuerySpec(
        q_tpch_q12,
        """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                       THEN 'FAST'
                       WHEN date_diff('day', o_orderdate, l_shipdate) <= 90
                       THEN 'NORMAL'
                       ELSE 'SLOW' END AS ship_class,
                  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1""",
    ),
    "q_tpch_q14": QuerySpec(
        q_tpch_q14,
        """SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0.0 END)
                  / sum(l_extendedprice * (1 - l_discount)), 4)
                      AS promo_revenue_pct,
                  count(*) AS n_lines
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-09-01'
             AND l_shipdate < TIMESTAMP '1996-10-01'""",
    ),
    "q_tpch_q7": QuerySpec(
        q_tpch_q7,
        """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                  year(l_shipdate) AS l_year,
                  round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) / 100.0, 2)
                      AS revenue
           FROM lineitem
           JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
             AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           GROUP BY 1, 2, 3""",
    ),
    "q_tpch_q13": QuerySpec(
        q_tpch_q13,
        """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
           FROM (
             SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             FROM customer
             LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey
           )
           GROUP BY c_count""",
    ),
    "q_tpch_q17": QuerySpec(
        q_tpch_q17,
        """WITH cand AS (
             SELECT l_partkey, l_quantity, l_extendedprice
             FROM lineitem
             JOIN part ON p_partkey = l_partkey
             WHERE p_brand = 'Brand#23' AND p_size <= 10
           ), avgs AS (
             SELECT l_partkey AS ak, avg(l_quantity) AS avg_qty
             FROM cand GROUP BY 1
           )
           SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        / 100.0 / 7.0, 2) AS avg_yearly,
                  CAST(count(*) AS BIGINT) AS n_lines
           FROM cand JOIN avgs ON l_partkey = ak
           WHERE l_quantity < 0.2 * avg_qty""",
    ),
    "q_tpch_q19": QuerySpec(
        q_tpch_q19,
        """SELECT round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) / 100.0, 2)
                      AS revenue,
                  count(*) AS n_lines
           FROM lineitem, part
           WHERE (p_partkey = l_partkey AND p_brand = 'Brand#12'
                  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
              OR (p_partkey = l_partkey AND p_brand = 'Brand#23'
                  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
              OR (p_partkey = l_partkey AND p_brand = 'Brand#14'
                  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""",
    ),
    "q_tpch_q2": QuerySpec(
        q_tpch_q2,
        """WITH supply AS (
             SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
                    min(l_extendedprice / l_quantity) AS cost
             FROM lineitem
             JOIN part ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE p_size <= 25 AND p_type = 'SMALL' AND r_name = 'ASIA'
             GROUP BY 1, 2, 3, 4, 5, 6
           ), mins AS (
             SELECT p_partkey AS mk, min(cost) AS min_cost
             FROM supply GROUP BY 1
           )
           SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
                  p_partkey, p_name, round(cost, 4) AS cost
           FROM supply
           JOIN mins ON p_partkey = mk AND cost = min_cost
           ORDER BY s_acctbal DESC, s_name, p_partkey
           LIMIT 100""",
    ),
    "q_tpch_q8": QuerySpec(
        q_tpch_q8,
        """SELECT year(o_orderdate) AS o_year,
                  round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                                 THEN CAST(round(l_extendedprice * (1 - l_discount)
                                                 * 100) AS BIGINT)
                                 ELSE 0 END) AS DOUBLE)
                        / CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                              * 100) AS BIGINT)) AS DOUBLE), 4)
                      AS mkt_share,
                  round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)) / 100.0, 2)
                      AS total_revenue
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation n1 ON s_nationkey = n1.n_nationkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation n2 ON c_nationkey = n2.n_nationkey
           JOIN region ON n2.n_regionkey = r_regionkey
           WHERE p_type = 'PROMO' AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY 1""",
    ),
    "q_tpch_q9": QuerySpec(
        q_tpch_q9,
        """SELECT n_name AS nation, year(o_orderdate) AS o_year,
                  round(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100) AS BIGINT)
                            - CAST(round(p_retailprice * l_quantity * 60)
                                   AS BIGINT)) / 100.0, 2) AS sum_profit
           FROM lineitem
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN orders ON o_orderkey = l_orderkey
           WHERE p_name LIKE '%widget%'
           GROUP BY 1, 2""",
    ),
    "q_tpch_q11": QuerySpec(
        q_tpch_q11,
        """WITH slice AS (
             SELECT l_partkey,
                    CAST(round(l_extendedprice * 100) AS BIGINT) AS val_cents
             FROM lineitem
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             JOIN region ON n_regionkey = r_regionkey
             WHERE r_name = 'ASIA'
           ), per_part AS (
             SELECT l_partkey, CAST(sum(val_cents) AS BIGINT) AS value_cents
             FROM slice GROUP BY 1
           ), tot AS (
             SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents
             FROM per_part
           )
           SELECT l_partkey, round(value_cents / 100.0, 2) AS value
           FROM per_part, tot
           WHERE value_cents * 1000 > total_cents
           ORDER BY value DESC, l_partkey""",
    ),
    "q_tpch_q15": QuerySpec(
        q_tpch_q15,
        """WITH rev AS (
             SELECT l_suppkey,
                    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                        * 100) AS BIGINT)) AS BIGINT)
                        AS rev_cents
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1996-04-01'
             GROUP BY 1
           )
           SELECT s_suppkey, s_name,
                  round(rev_cents / 100.0, 2) AS total_revenue
           FROM rev JOIN supplier ON s_suppkey = l_suppkey
           WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
           ORDER BY s_suppkey""",
    ),
    "q_tpch_q16": QuerySpec(
        q_tpch_q16,
        """SELECT p_brand, p_type, p_size,
                  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
           JOIN part ON p_partkey = l_partkey
           WHERE p_brand <> 'Brand#1'
             AND p_type NOT LIKE 'PROMO%'
             AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             AND l_suppkey NOT IN (
               SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           GROUP BY 1, 2, 3
           ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
           LIMIT 20""",
    ),
    "q_tpch_q20": QuerySpec(
        q_tpch_q20,
        """SELECT s_suppkey, s_name, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND s_suppkey IN (
               SELECT l_suppkey
               FROM lineitem
               JOIN part ON p_partkey = l_partkey
               WHERE p_name LIKE 'small%'
                 AND l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1998-01-01'
               GROUP BY l_partkey, l_suppkey
               HAVING sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01'
                               THEN l_quantity ELSE 0 END) > 0
                  AND sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                               THEN l_quantity ELSE 0 END)
                      > 0.5 * sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01'
                                       THEN l_quantity ELSE 0 END))
           ORDER BY s_suppkey""",
    ),
    "q_tpch_q21": QuerySpec(
        q_tpch_q21,
        """SELECT s_name, count(*) AS numwait
           FROM lineitem l1
           JOIN orders ON o_orderkey = l1.l_orderkey
           JOIN supplier ON s_suppkey = l1.l_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
             AND o_orderstatus = 'F'
             AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
             AND EXISTS (
               SELECT 1 FROM lineitem l2
               WHERE l2.l_orderkey = l1.l_orderkey
                 AND l2.l_suppkey <> l1.l_suppkey)
             AND NOT EXISTS (
               SELECT 1 FROM lineitem l3
               WHERE l3.l_orderkey = l1.l_orderkey
                 AND l3.l_suppkey <> l1.l_suppkey
                 AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
           GROUP BY s_name
           ORDER BY numwait DESC, s_name
           LIMIT 20""",
    ),
    "q_tpch_q22": QuerySpec(
        q_tpch_q22,
        """WITH cust AS (
             SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal,
                    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
             FROM customer
             WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)
           ), thr AS (
             SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_cents,
                    count(*) AS n_pos
             FROM cust WHERE c_acctbal > 0
           )
           SELECT cntrycode, count(*) AS numcust,
                  round(sum(bal_cents) / 100.0, 2) AS totacctbal
           FROM cust, thr
           WHERE bal_cents * n_pos > sum_cents
             AND NOT EXISTS (
               SELECT 1 FROM orders
               WHERE o_custkey = c_custkey
                 AND o_orderdate >= TIMESTAMP '1999-01-01')
           GROUP BY cntrycode
           ORDER BY cntrycode""",
    ),
}
