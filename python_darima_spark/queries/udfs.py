"""Pandas-UDF queries (SURVEY.md §2B): vectorized scalar, grouped-map,
grouped-agg. These exist to pin the Arrow boundary contract — everything
that CAN be a built-in expression elsewhere in the engine IS one; these
queries deliberately route through Python to test the crossing, and their
oracles are the equivalent SQL so the driver still hash-checks them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from python_darima_spark.queries import QuerySpec, load


def q_udf_scalar(spark: SparkSession, sf: str) -> DataFrame:
    # UDFs are built inside the function: pandas_udf needs an active session
    # to resolve the DDL return type, so module import stays Spark-free.
    @pandas_udf("double")
    def revenue_udf(price: pd.Series, discount: pd.Series) -> pd.Series:
        # Arrow-batched: one vectorized op per ~10k-row batch, not per row.
        return price * (1.0 - discount)

    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue_udf("l_extendedprice", "l_discount").alias("revenue"),
    )


def q_udf_grouped_map(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas — the harness shape of the DARIMA fit
    (ref R5, /root/reference/darima.py:157-159) with a deterministic,
    SQL-checkable body: per-status z-score of order totals."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["o_totalprice"].mean()
        sd = pdf["o_totalprice"].std(ddof=1)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderstatus": pdf["o_orderstatus"],
                "z": np.round((pdf["o_totalprice"] - mu) / sd, 6),
            }
        )

    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(
        zscore, "o_orderkey long, o_orderstatus string, z double"
    )


def q_udaf_grouped_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-agg pandas UDF — the DLSA weighted-combine shape
    (ref R11+R16) as a custom aggregate: quantity-weighted mean price."""

    @pandas_udf("double")
    def weighted_avg_udf(x: pd.Series, w: pd.Series) -> float:  # GROUPED_AGG
        return float(np.dot(x, w) / w.sum())

    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            weighted_avg_udf("l_extendedprice", "l_quantity"), 4
        ).alias("wavg_price")
    )


def q_udtf_table(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF via LATERAL correlated invocation — the table-function
    surface (one input row → many output rows with computed columns), the
    modern form of the reference's mapPartitions→flatMap chain (ref R5+R10,
    /root/reference/darima.py:157-160). Arrow-batched (``useArrow``) so
    rows cross the Python boundary in columnar batches. Body: per-doc
    frequent words (count ≥ 3) — multi-row emission with a SQL-restatable
    result."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, n int", useArrow=True)
    class FrequentWords:
        def eval(self, text: str):
            from collections import Counter

            for w, c in Counter(text.split(" ")).items():
                if c >= 3:
                    yield w, c

    spark.udtf.register("pds_frequent_words", FrequentWords)
    load(spark, sf, "documents").createOrReplaceTempView("_pds_docs_udtf")
    return spark.sql(
        """SELECT d.doc_id, s.word, s.n
           FROM _pds_docs_udtf d, LATERAL pds_frequent_words(d.text) s"""
    )


def q_udf_map_arrow(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow`` — the lowest-overhead Python crossing: raw pyarrow
    RecordBatches, no pandas conversion at all (pandas_udf pays
    Arrow→pandas→Arrow per batch; this stays columnar end-to-end). The
    kernel computes a margin-rate column with pyarrow.compute — one
    vectorized call per ~10k-row batch. Use this tier when the logic is
    expressible in Arrow compute kernels; it is the fastest possible
    Python path, though still second to staying JVM-side entirely."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def margin(batches):
        for batch in batches:
            price = batch.column("l_extendedprice")
            tax = batch.column("l_tax")
            disc = batch.column("l_discount")
            rate = pc.multiply(pc.subtract(1.0, disc), pc.add(1.0, tax))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("l_orderkey"),
                    batch.column("l_linenumber"),
                    rate,
                    pc.multiply(price, rate),
                ],
                names=["l_orderkey", "l_linenumber", "rate", "net"],
            )

    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_tax", "l_discount"
    )
    # NO rounding anywhere: the Arrow kernel's products are bit-identical
    # to DuckDB's (same IEEE ops in the same order — q_udf_scalar proves
    # the exact-match works), but ROUNDING them is not portable here:
    # pc.round is half-to-even, Spark's round goes through an exact
    # BigDecimal HALF_UP, DuckDB rounds in float space — 12 of 60k nets
    # sit within an ulp of a .xx5 boundary and split between them. Raw
    # doubles hash equal; rounded ones don't.
    return li.mapInArrow(
        margin, "l_orderkey long, l_linenumber int, rate double, net double"
    )


def q_udf_cogrouped_map(spark: SparkSession, sf: str) -> DataFrame:
    """Cogrouped-map UDF (``groupBy().cogroup().applyInPandas``) — the
    primitive the DARIMA forecast stage runs on (coefs ⨝ series per key,
    python_darima_spark/darima/pipeline.py:forecast), with a
    deterministic SQL-checkable body: per-nation customer count and
    order revenue joined pandas-side."""

    def summarize(key, cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": [int(key[0])],
                "n_cust": [len(cust)],
                "revenue": [round(float(orders["o_totalprice"].sum()), 2)],
            }
        )

    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    # fresh read with renamed columns: deriving the orders side from `c`
    # itself would make the cogroup an ambiguous self-join
    dim = load(spark, sf, "customer").select(
        F.col("c_custkey").alias("_ck"), F.col("c_nationkey").alias("_nk")
    )
    o = (
        load(spark, sf, "orders")
        .join(dim, F.col("o_custkey") == F.col("_ck"))
        .select(F.col("_nk").alias("c_nationkey"), "o_totalprice")
    )
    return (
        c.groupBy("c_nationkey")
        .cogroup(o.groupBy("c_nationkey"))
        .applyInPandas(summarize, "c_nationkey int, n_cust long, revenue double")
    )


QUERIES = {
    # exact-product contract, no rounding (see the kernel comment): the
    # same IEEE multiply chain on both engines is bit-identical, which
    # is a STRONGER check than any rounded comparison
    "q_udf_map_arrow": QuerySpec(
        q_udf_map_arrow,
        """SELECT l_orderkey, l_linenumber,
                  (1 - l_discount) * (1 + l_tax) AS rate,
                  l_extendedprice * ((1 - l_discount) * (1 + l_tax)) AS net
           FROM lineitem""",
    ),
    "q_udf_cogrouped_map": QuerySpec(
        q_udf_cogrouped_map,
        """SELECT c_nationkey,
                  count(*) AS n_cust,
                  round(coalesce((SELECT sum(o.o_totalprice)
                                  FROM orders o JOIN customer c2
                                    ON o.o_custkey = c2.c_custkey
                                  WHERE c2.c_nationkey = c.c_nationkey), 0),
                        2) AS revenue
           FROM customer c
           GROUP BY c_nationkey""",
    ),
    "q_udf_scalar": QuerySpec(
        q_udf_scalar,
        """SELECT l_orderkey, l_linenumber,
                  l_extendedprice * (1 - l_discount) AS revenue
           FROM lineitem""",
    ),
    "q_udf_grouped_map": QuerySpec(
        q_udf_grouped_map,
        """SELECT o_orderkey, o_orderstatus,
                  round((o_totalprice - avg(o_totalprice) OVER w)
                        / stddev_samp(o_totalprice) OVER w, 6) AS z
           FROM orders
           WINDOW w AS (PARTITION BY o_orderstatus)""",
    ),
    "q_udaf_grouped_agg": QuerySpec(
        q_udaf_grouped_agg,
        """SELECT l_returnflag,
                  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                      AS wavg_price
           FROM lineitem GROUP BY l_returnflag""",
    ),
    "q_udtf_table": QuerySpec(
        q_udtf_table,
        """SELECT doc_id, word, CAST(n AS INT) AS n FROM (
             SELECT doc_id, word, count(*) AS n
             FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                   FROM documents)
             GROUP BY doc_id, word)
           WHERE n >= 3""",
    ),
}
