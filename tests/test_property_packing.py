"""Property-based tests (hypothesis) for the packing / split family —
the invariants a training-data pipeline depends on:

* greedy first-fit bins NEVER exceed capacity unless a single document
  alone does, and bin ids are dense per shard;
* block packing (the SQL-expressible variant) overflows by at most one
  document per bin;
* the md5 split bucket is a pure function of the key (stable under any
  row order / partitioning).

Example counts are small: every example is a full Spark round trip.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from python_darima_spark.operators.packing import pack_greedy

TOKS = st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

CAP = 256


@given(toks=TOKS)
@settings(**_SETTINGS)
def test_greedy_pack_invariants(spark, toks):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(toks)),
            "shard": [i % 3 for i in range(len(toks))],
            "n_tok": toks,
        }
    )
    df = spark.createDataFrame(pdf)
    got = pack_greedy(df, "doc_id", "n_tok", "shard", capacity=CAP).toPandas()
    merged = got.merge(pdf, on=["doc_id", "shard"])
    assert len(merged) == len(pdf)
    for (_, _), grp in merged.groupby(["shard", "bin_id"]):
        if len(grp) > 1:
            assert grp.n_tok.sum() <= CAP
    # bins dense from 0 and monotone in doc_id order per shard
    for _, grp in merged.sort_values("doc_id").groupby("shard"):
        bins = grp.bin_id.tolist()
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))


@given(toks=TOKS)
@settings(**_SETTINGS)
def test_block_pack_overflow_bound(spark, toks):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(toks)),
            "shard": [i % 3 for i in range(len(toks))],
            "n_tok": toks,
        }
    )
    df = spark.createDataFrame(pdf)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    got = df.withColumn(
        "bin_id", F.floor(cum / F.lit(float(CAP))).cast("long")
    ).toPandas()
    fills = got.groupby(["shard", "bin_id"]).n_tok.agg(["sum", "max"])
    assert (fills["sum"] < CAP + fills["max"]).all()


def test_split_bucket_pure_function_of_key(spark):
    from python_darima_spark.functions.text import hash_split_bucket

    a = (
        spark.range(0, 500)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", hash_split_bucket("doc_id").alias("b"))
        .toPandas()
    )
    # same keys, different order and partitioning → identical buckets
    b = (
        spark.range(0, 500, 1, 7)
        .select((499 - F.col("id")).alias("doc_id"))
        .select("doc_id", hash_split_bucket("doc_id").alias("b"))
        .toPandas()
    )
    ja = a.sort_values("doc_id").reset_index(drop=True)
    jb = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ja, jb)
    assert 0 <= ja.b.min() and ja.b.max() < 256
