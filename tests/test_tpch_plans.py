"""Physical-plan assertions for the TPC-H composites: the plans must be
the shapes the 100 TB argument relies on (PLANS.md §2.11), not whatever
happened to pass — broadcast dims, shuffled facts, top-k without a global
sort, pushdown reaching the scan."""

from __future__ import annotations

from python_darima_spark.queries.tpch import q_tpch_q1, q_tpch_q3, q_tpch_q5


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_and_partial_agg(spark, sf_dir):
    # plan metadata strings (ReadSchema/PushedFilters) truncate at 100
    # chars by default — widen so the per-column assertions see all of it
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    plan = _plan(q_tpch_q1(spark, sf_dir))
    spark.conf.unset("spark.sql.maxMetadataStringLength")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan[:1500]
    assert "partial_sum" in plan  # map-side combine before the exchange
    # projection pruned: only the referenced columns reach the reader —
    # asserted per column (exact struct strings are brittle to column
    # order / Spark-version formatting changes)
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in read_schema, read_schema
    assert "l_orderkey" not in read_schema, read_schema  # unreferenced


def test_q3_topk_no_global_sort(spark, sf_dir):
    plan = _plan(q_tpch_q3(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    # the segment-filtered customer key list broadcasts
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_dims_only(spark, sf_dir):
    plan = _plan(q_tpch_q5(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    # the supplier..nation..region dim chain must NOT shuffle the facts:
    # lineitem joins appear as shuffled (SortMergeJoin or ShuffledHashJoin)
    # or AQE-converted broadcast, but never a NestedLoop/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
