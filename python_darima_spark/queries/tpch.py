"""TPC-H-style composite analytics over the star-schema fixture.

The reference has no multi-operator relational pipelines at all (its only
"query" is the DARIMA map-reduce, /root/reference/darima.py:143-169); these
three classics exercise the engine end-to-end — scan pushdown → multi-way
joins (broadcast dims + shuffled facts) → partial/final hash aggregation →
top-k — the shapes a 100 TB warehouse runs all day. Adapted to the fixture
columns (FIXTURES.md §2); aggregate aliases match the oracles exactly.

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
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
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
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
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
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
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
}
