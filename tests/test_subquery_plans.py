"""Catalyst must DECORRELATE the subquery family into joins — the plans
the 100 TB posture relies on. A correlated subquery that survives to
execution as a per-row re-execution would be O(n²); these assert it never
does."""

from __future__ import annotations

from python_darima_spark.queries.subqueries import (
    q_subquery_corr,
    q_subquery_exists,
    q_subquery_scalar,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scalar_subquery_runs_once(spark, sf_dir):
    plan = _plan(q_subquery_scalar(spark, sf_dir))
    # the aggregate executes as a separate 1-row subquery, not a join
    assert "Subquery" in plan or "subquery" in plan, plan[:1200]
    assert "CartesianProduct" not in plan


def test_correlated_scalar_decorrelates_to_join(spark, sf_dir):
    plan = _plan(q_subquery_corr(spark, sf_dir))
    # RewriteCorrelatedScalarSubquery: aggregate on the correlation key
    # + an equi-join; no nested-loop anywhere
    assert "Join" in plan, plan[:1200]
    assert "avg(" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exists_becomes_semi_and_anti_join(spark, sf_dir):
    plan = _plan(q_subquery_exists(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:1200]
    assert "LeftAnti" in plan, plan[:1200]
    assert "BroadcastNestedLoopJoin" not in plan


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """q_join_runtime_filter must carry the injected bloom filter: a
    bloom_filter_agg subquery on the filtered build side and a
    BloomFilterMightContain pre-filter on the fact side BEFORE its
    shuffle — and the conf overrides it uses must be restored after."""
    from python_darima_spark.queries.joins import q_join_runtime_filter

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    df = q_join_runtime_filter(spark, sf_dir)
    plan = _plan(df)
    assert "bloom_filter_agg" in plan, plan[:1500]
    assert "BloomFilterMightContain" in plan or "might_contain" in plan, (
        plan[:1500]
    )
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    assert df.count() > 0
