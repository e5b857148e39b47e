"""Physical-plan assertions for the round-4 operators — the shapes the
100 TB posture relies on, pinned so a regression (a lost broadcast, a
nested-loop fallback, a global sort) fails loudly instead of silently
slowing down."""

from __future__ import annotations

from python_darima_spark.queries.joins import q_join_interval_overlap
from python_darima_spark.queries.llm_data import (
    q_sample_reservoir,
    q_text_ngram_lm,
    q_text_quality_gopher,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_reservoir_is_take_ordered_not_global_sort(spark, sf_dir):
    """k smallest by hash must plan as TakeOrderedAndProject (per-partition
    k-heaps + k-sized driver merge) — a global Sort would be a full
    shuffle of the corpus for 100 rows."""
    plan = _plan(q_sample_reservoir(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_interval_overlap_is_hash_join_not_nested_loop(spark, sf_dir):
    """The bucketed rewrite must produce an equi hash/merge join; the raw
    overlap predicate would fall back to BroadcastNestedLoopJoin."""
    plan = _plan(q_join_interval_overlap(spark, sf_dir))
    assert "BroadcastNestedLoop" not in plan, plan[:1500]
    assert "CartesianProduct" not in plan
    assert any(
        j in plan
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    ), plan[:1500]


def test_ngram_lm_probability_table_broadcasts(spark, sf_dir):
    """The bigram probability table is vocabulary-sized; joining it back
    to the corpus must be a broadcast, never a corpus shuffle."""
    plan = _plan(q_text_ngram_lm(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_gopher_rules_are_one_map_only_stage(spark, sf_dir):
    """The quality gate is map-only: no exchange (beyond the
    parallelism-floor repartition of the scan) and no join anywhere."""
    plan = _plan(q_text_quality_gopher(spark, sf_dir))
    assert "Join" not in plan, plan[:1500]
    # exactly the fan_out exchange, nothing aggregation-shaped
    assert "HashAggregate" not in plan, plan[:1500]
