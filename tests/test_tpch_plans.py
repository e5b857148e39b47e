"""Physical-plan assertions for the TPC-H composites: the plans must be
the shapes the 100 TB argument relies on (PLANS.md §2.11), not whatever
happened to pass — broadcast dims, shuffled facts, top-k without a global
sort, pushdown reaching the scan."""

from __future__ import annotations

from python_darima_spark.queries.tpch import (
    q_tpch_q1,
    q_tpch_q3,
    q_tpch_q4,
    q_tpch_q5,
    q_tpch_q18,
    q_tpch_q19,
)


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


def test_q4_exists_is_semi_join(spark, sf_dir):
    # the EXISTS-shaped predicate must plan as a LeftSemi HASH join even
    # though the condition mixes the equi key with a date inequality —
    # the inequality rides as the join's residual condition, it must not
    # demote the join to a nested loop
    plan = _plan(q_tpch_q4(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q18_aggregates_before_join(spark, sf_dir):
    # the HAVING pre-aggregation must run BELOW the joins (only
    # qualifying orderkeys join) and top-20 must be TakeOrdered
    plan = _plan(q_tpch_q18(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert agg_pos != -1 and join_pos != -1
    # executedPlan prints top-down: the join appears before (above) the
    # qualifying-keys aggregate it consumes
    assert join_pos < plan.rfind("HashAggregate")


def test_q19_or_of_ands_extracts_equi_join(spark, sf_dir):
    # the spec repeats p_partkey = l_partkey inside every OR disjunct;
    # Catalyst must factor it out and plan a HASH equi-join with the
    # brand/size/quantity bands as a residual — an engine that misses the
    # extraction runs a cartesian product here
    plan = _plan(q_tpch_q19(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_q7_dims_broadcast_facts_hash_join(spark, sf_dir):
    from python_darima_spark.queries.tpch import q_tpch_q7

    plan = _plan(q_tpch_q7(spark, sf_dir))
    # the nation-filtered supplier/customer composites must broadcast;
    # no join may degenerate to a nested loop
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q17_avg_decorrelated_below_join(spark, sf_dir):
    from python_darima_spark.queries.tpch import q_tpch_q17

    plan = _plan(q_tpch_q17(spark, sf_dir))
    # the per-part average is an aggregate joined back, never a per-row
    # subquery; brand slice broadcasts into lineitem
    assert "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q2_min_joinback_no_nested_loop(spark, sf_dir):
    # the correlated-MIN shape must run as agg + equi-join-back on
    # (partkey, cost) — hash joins throughout, dims broadcast, never a
    # per-row subquery or nested loop
    from python_darima_spark.queries.tpch import q_tpch_q2

    plan = _plan(q_tpch_q2(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-100, not a global sort
    # round-5 pin (r4 bench flagged a possible plan flip — rule it out
    # structurally): BOTH fact-side dim joins (part, supplier-composite)
    # plus the dim-chain builds broadcast; lineitem itself never builds
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2000]
    # the supply MIN aggregates map-side before its exchange
    assert "partial_min" in plan
    # the min-cost join-back is an equi join on (partkey, cost) — it may
    # plan as SMJ or shuffled-hash, but it must be a shuffle-keyed equi
    # join, not a broadcast of the full supply relation
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_q21_double_quantifier_single_agg(spark, sf_dir):
    # EXISTS + NOT EXISTS decorrelate into ONE per-order aggregate
    # (count_distinct suppliers / late suppliers) joined back — the plan
    # must not contain nested-loop re-probes of lineitem
    from python_darima_spark.queries.tpch import q_tpch_q21

    plan = _plan(q_tpch_q21(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    # the distinct-supplier counts plan as partial/final aggregate pairs
    assert plan.count("HashAggregate") >= 2


def test_q16_not_in_is_anti_join(spark, sf_dir):
    from python_darima_spark.queries.tpch import q_tpch_q16

    plan = _plan(q_tpch_q16(spark, sf_dir))
    assert "LeftAnti" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


def test_q22_anti_join_and_scalar_broadcast(spark, sf_dir):
    # customers-without-orders is a LEFT-ANTI hash join; the 1-row
    # threshold aggregate attaches as a broadcast nested loop (the only
    # acceptable NL: build side is exactly one row)
    from python_darima_spark.queries.tpch import q_tpch_q22

    plan = _plan(q_tpch_q22(spark, sf_dir))
    assert "LeftAnti" in plan, plan[:1500]
    assert "CartesianProduct" not in plan
