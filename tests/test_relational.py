"""Relational operator specifics not covered by the oracle-parity sweep:
approximate-aggregate error bounds, top-k-per-group, and the asof-join
tolerance path."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from python_darima_spark.operators.relational import asof_join, top_k_per_group
from python_darima_spark.queries import load, registry


def test_approx_count_distinct_within_epsilon(spark, sf_dir):
    """q_agg_approx emits exact distinct counts plus within-5%-of-exact
    flags for the HLL++ estimates; both flags must hold and the exact
    columns must equal an independent countDistinct."""
    got = registry()["q_agg_approx"].fn(spark, sf_dir).collect()[0]
    e = load(spark, sf_dir, "events")
    exact = e.agg(
        F.countDistinct("user_id").alias("u"),
        F.countDistinct("event_id").alias("ev"),
    ).collect()[0]
    assert got["exact_users"] == exact["u"]
    assert got["exact_events"] == exact["ev"]
    assert got["approx_users_ok"] and got["approx_events_ok"]


def test_top_k_per_group_matches_pandas(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    got = (
        top_k_per_group(
            o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
        )
        .toPandas()
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    pdf = o.toPandas()
    want = (
        pdf.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
        )
        .groupby("o_custkey")
        .head(3)
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.groupby("o_custkey").size().max() <= 3


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a"],
                "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-02 10:00"]),
                "lid": [1, 2],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"],
                "ts": pd.to_datetime(["2024-01-01 09:00"]),
                "rid": [100],
            }
        )
    )
    out = (
        asof_join(
            left, right, on="k", right_cols=["rid"], tolerance="2 hours"
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid=1 is 1h after the right row -> kept; lid=2 is 25h after -> stale
    assert out.loc[0, "rid"] == 100
    assert pd.isna(out.loc[1, "rid"])


def test_ensure_parallelism_conditional(spark):
    """ensure_parallelism repartitions a compact (single-partition) input
    up to the shuffle-partition target, and is a NO-OP (same plan, no
    added exchange) when the input already has enough splits."""
    from python_darima_spark.operators import ensure_parallelism

    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    compact = spark.range(0, 1000, 1, 1)
    assert ensure_parallelism(compact).rdd.getNumPartitions() == target

    wide = spark.range(0, 1000, 1, target)
    out = ensure_parallelism(wide)
    assert out is wide  # not just equal partitioning: literally untouched


def test_salted_join_matches_plain_join(spark):
    """salted_join must be result-identical to the plain equi-join while
    actually joining on (key, salt) — the skew-spread the plan relies on."""
    import pandas as pd
    from pyspark.sql import functions as F

    from python_darima_spark.operators.relational import salted_join

    # 90%-hot key distribution with a distinguishing column
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("k"),
        F.col("id").alias("lval"),
    )
    right = spark.createDataFrame(
        [("hot", 1.0), ("k0", 2.0), ("k3", 3.0), ("nomatch", 9.0)],
        "k string, rval double",
    )
    for how in ("inner", "left"):
        got = (
            salted_join(left, right, "k", num_salts=4, how=how)
            .toPandas().sort_values(["k", "lval"]).reset_index(drop=True)
        )
        want = (
            left.join(right, "k", how)
            .toPandas().sort_values(["k", "lval"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)]
        )
    # the join condition actually includes the salt column
    plan = salted_join(left, right, "k", num_salts=4)._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    import pytest as _pt
    with _pt.raises(ValueError):
        salted_join(left, right, "k", how="full")
