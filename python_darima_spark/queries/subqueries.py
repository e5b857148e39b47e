"""SQL subquery surface: scalar, correlated-scalar, and EXISTS forms.

The reference has no SQL layer at all (SURVEY.md §3: its "queries" are
Python method calls), but any engine claiming its query capabilities plus a
warehouse surface needs the subquery family — and these run through
``spark.sql`` on purpose: the point is Catalyst's decorrelation, not a
hand-built join. What Catalyst does with each (verified via .explain,
asserted in tests/test_subquery_plans.py):

* uncorrelated scalar  → subquery executes once, result injected as a
  literal into the filter (one extra 1-row job, zero per-row cost);
* correlated scalar    → decorrelated into an aggregate on the correlation
  key + an equi-join (RewriteCorrelatedScalarSubquery) — never a per-row
  re-execution;
* EXISTS / NOT EXISTS  → left-semi / left-anti hash joins.

At 100 TB the rewrite target is exactly the plan you would hand-write, so
the SQL form costs nothing over the DataFrame form — the fixture queries
assert that by sharing oracle shapes with the join family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_darima_spark.queries import QuerySpec, load


def _register(spark: SparkSession, sf: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf, t).createOrReplaceTempView(t)


def q_agg_group_by_all(spark: SparkSession, sf: str) -> DataFrame:
    """``GROUP BY ALL`` — the modern shorthand (DuckDB popularized it;
    Spark adopted it in 3.4): grouping keys inferred as every
    non-aggregate select item, removing the classic drift bug where a
    column added to SELECT is forgotten in GROUP BY. Both engines parse
    the identical statement; Catalyst resolves it to the same hash
    aggregate as the explicit form. (QUALIFY, the other modern
    shorthand, is NOT in open-source Spark — documented here so the
    surface map is honest.)"""
    _register(spark, sf, "orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority,
                  date_trunc('month', o_orderdate) AS month,
                  count(*) AS n,
                  round(sum(o_totalprice), 2) AS revenue
           FROM orders GROUP BY ALL"""
    )


def q_join_lateral(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL join — top-2 customers by balance per nation,
    written as the ANSI lateral derived table. Catalyst decorrelates
    the ORDER BY/LIMIT subquery into a rank-window over the join
    (DomainJoin rewrite): the plan is ONE partitioned window + filter,
    not a per-nation re-execution — the same physical shape as the
    hand-written q_topk_group, which is the point: the declarative
    lateral form costs nothing over the manual window. DuckDB executes
    the identical statement."""
    _register(spark, sf, "nation", "customer")
    return spark.sql(
        """SELECT n.n_name, t.c_name, t.bal
           FROM nation n,
           LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
                    FROM customer c WHERE c.c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t"""
    )


def q_agg_filter_clause(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI ``FILTER (WHERE …)`` aggregate modifier — one pass over the
    fact table computing several differently-conditioned aggregates
    (the tidy form of the sum(CASE WHEN…) idiom; Catalyst compiles both
    to the same conditional partial aggregates, so it is one scan + one
    keyed exchange, never one pass per condition). Runs through
    ``spark.sql`` because the point is the SQL surface; DuckDB executes
    the identical statement."""
    _register(spark, sf, "lineitem")
    return spark.sql(
        """SELECT l_returnflag,
                  count(*) AS n_all,
                  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
                  round(sum(l_extendedprice)
                        FILTER (WHERE l_tax = 0), 2) AS rev_taxfree,
                  round(avg(l_quantity)
                        FILTER (WHERE l_linestatus = 'F'), 4) AS avg_qty_f
           FROM lineitem GROUP BY l_returnflag"""
    )


def q_subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders beating the global average
    price. Catalyst runs the 1-row aggregate once and folds it into the
    scan filter — the fact table is read exactly once."""
    _register(spark, sf, "orders")
    return spark.sql(
        """SELECT o_orderkey, round(o_totalprice, 2) AS price
           FROM orders
           WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"""
    )


def q_subquery_corr(spark: SparkSession, sf: str) -> DataFrame:
    """CORRELATED scalar subquery: orders 1.5× above their own customer's
    average. Catalyst decorrelates to groupBy(o_custkey).avg + equi-join
    (one keyed shuffle) — the naive per-row re-execution this syntax
    implies would be O(n²) and never happens."""
    _register(spark, sf, "orders")
    return spark.sql(
        """SELECT o.o_orderkey, o.o_custkey,
                  round(o.o_totalprice, 2) AS price
           FROM orders o
           WHERE o.o_totalprice > 1.5 * (
               SELECT avg(o2.o_totalprice) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)"""
    )


def q_subquery_exists(spark: SparkSession, sf: str) -> DataFrame:
    """EXISTS + NOT EXISTS in one pass: customers with a 400k+ order but
    no open ('O') order. Both subqueries become hash joins (left-semi,
    left-anti) on c_custkey — two keyed shuffles, no nested loops."""
    _register(spark, sf, "customer", "orders")
    return spark.sql(
        """SELECT c.c_custkey, c.c_name
           FROM customer c
           WHERE EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             AND NOT EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')"""
    )


QUERIES = {
    "q_agg_group_by_all": QuerySpec(
        q_agg_group_by_all,
        """SELECT o_orderstatus, o_orderpriority,
                  date_trunc('month', o_orderdate) AS month,
                  CAST(count(*) AS BIGINT) AS n,
                  round(sum(o_totalprice), 2) AS revenue
           FROM orders GROUP BY ALL""",
    ),
    "q_join_lateral": QuerySpec(
        q_join_lateral,
        """SELECT n.n_name, t.c_name, t.bal
           FROM nation n,
           LATERAL (SELECT c_name, round(c_acctbal, 2) AS bal
                    FROM customer c WHERE c.c_nationkey = n.n_nationkey
                    ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""",
    ),
    "q_agg_filter_clause": QuerySpec(
        q_agg_filter_clause,
        """SELECT l_returnflag,
                  CAST(count(*) AS BIGINT) AS n_all,
                  CAST(count(*) FILTER (WHERE l_discount > 0.05)
                       AS BIGINT) AS n_discounted,
                  round(sum(l_extendedprice)
                        FILTER (WHERE l_tax = 0), 2) AS rev_taxfree,
                  round(avg(l_quantity)
                        FILTER (WHERE l_linestatus = 'F'), 4) AS avg_qty_f
           FROM lineitem GROUP BY l_returnflag""",
    ),
    "q_subquery_scalar": QuerySpec(
        q_subquery_scalar,
        """SELECT o_orderkey, round(o_totalprice, 2) AS price
           FROM orders
           WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
    ),
    "q_subquery_corr": QuerySpec(
        q_subquery_corr,
        """SELECT o.o_orderkey, o.o_custkey,
                  round(o.o_totalprice, 2) AS price
           FROM orders o
           WHERE o.o_totalprice > 1.5 * (
               SELECT avg(o2.o_totalprice) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)""",
    ),
    "q_subquery_exists": QuerySpec(
        q_subquery_exists,
        """SELECT c.c_custkey, c.c_name
           FROM customer c
           WHERE EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
             AND NOT EXISTS (
               SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""",
    ),
}
