"""Batch-equivalence for the custom stateful operator (SURVEY.md §5.2/5):
the streaming EWMA anomaly detector, replayed over micro-batches, must
emit exactly what a single-node pandas fold over the whole ordered
series emits — state carried across batch boundaries included."""

from __future__ import annotations

import pandas as pd
import pytest

from python_darima_spark.streaming.stateful import _fold, _q6


def _single_node_oracle(events: pd.DataFrame, alpha, z, warmup) -> pd.DataFrame:
    rows = []
    for key, grp in events.groupby("event_type"):
        # (ts, event_id) — the same total order the operator folds in;
        # a ts-only sort is stable on raw parquet row order and would
        # diverge from the replay on equal-ts rows within a key.
        grp = grp.sort_values(["ts", "event_id"], kind="mergesort")
        _, _, _, hits = _fold(0, 0.0, 0.0, grp["value"], alpha, z, warmup)
        for pos, zs, mean_before, seen in hits:
            rows.append(
                {
                    "series_key": key,
                    "ts": grp["ts"].iloc[pos],
                    "value": float(grp["value"].iloc[pos]),
                    "zscore": _q6(zs),
                    "ewm_mean": _q6(mean_before),
                    "seen": seen,
                }
            )
    return (
        pd.DataFrame(rows)
        .sort_values(["series_key", "ts"])
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("alpha,z,warmup", [(0.1, 3.0, 24), (0.3, 2.0, 8)])
def test_stream_matches_single_node_fold(spark, sf_dir, alpha, z, warmup):
    from python_darima_spark.queries import load
    from python_darima_spark.streaming.stateful import ewma_anomalies
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_to_table,
        stage_event_chunks,
    )

    stream = read_event_stream(spark, stage_event_chunks(spark, sf_dir, 4))
    name = run_stream_to_table(
        ewma_anomalies(stream, alpha=alpha, z_threshold=z, warmup=warmup),
        "update",
    )
    got = (
        spark.table(name)
        .toPandas()
        .sort_values(["series_key", "ts"])
        .reset_index(drop=True)
    )

    events = load(spark, sf_dir, "events").select(
        "event_type", "ts", "value", "event_id"
    ).toPandas()
    want = _single_node_oracle(events, alpha, z, warmup)

    assert len(got) == len(want), (len(got), len(want))
    assert len(got) > 0, "fixture produced no anomalies; loosen threshold"
    pd.testing.assert_frame_equal(
        got[["series_key", "value", "zscore", "ewm_mean", "seen"]],
        want[["series_key", "value", "zscore", "ewm_mean", "seen"]],
        check_dtype=False,
    )
    assert (got["ts"].to_numpy() == want["ts"].to_numpy()).all()


def test_anomalies_emitted_once_across_batches(spark, sf_dir):
    """Re-running the same replay yields the identical row multiset —
    exactly-once emission, no state bleed between runs."""
    from python_darima_spark.streaming.stateful import ewma_anomalies
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_to_table,
        stage_event_chunks,
    )

    staged = stage_event_chunks(spark, sf_dir, 4)
    outs = []
    for _ in range(2):
        stream = read_event_stream(spark, staged)
        name = run_stream_to_table(ewma_anomalies(stream), "update")
        outs.append(
            spark.table(name)
            .toPandas()
            .sort_values(["series_key", "ts"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_tws_twin_matches_apply_in_pandas_with_state(spark, sf_dir):
    """transformWithStateInPandas twin must emit IDENTICAL rows to the
    applyInPandasWithState detector on identical replay — the migration
    guarantee between the two stateful APIs. Requires protobuf (the TWS
    state-server protocol); skipped where absent, with the plan-time
    guard asserted instead."""
    import pytest

    from python_darima_spark.streaming.stateful import (
        ewma_anomalies,
        ewma_anomalies_tws,
        has_tws_support,
    )
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_to_table,
        stage_event_chunks,
    )

    if not has_tws_support():
        with pytest.raises(NotImplementedError, match="protobuf"):
            ewma_anomalies_tws(None)
        pytest.skip("protobuf not installed; TWS cannot run here")

    staged = stage_event_chunks(spark, sf_dir, 4)
    a = run_stream_to_table(
        ewma_anomalies(read_event_stream(spark, staged)), "update"
    )
    b = run_stream_to_table(
        ewma_anomalies_tws(read_event_stream(spark, staged)),
        "update",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    cols = ["series_key", "ts", "value", "zscore", "ewm_mean", "seen"]
    pa = spark.table(a).toPandas().sort_values(cols).reset_index(drop=True)
    pb = spark.table(b).toPandas().sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(pa[cols], pb[cols], check_dtype=False)


def test_session_tws_twin_matches_session_window(spark, sf_dir):
    """The ListState+timer sessionizer must emit IDENTICAL sessions to
    Spark's own session_window aggregation on identical replay — the
    migration guarantee for moving sessionization onto the
    arbitrary-state API, and the proof that the timer path (all
    emission happens in handleExpiredTimer) reproduces append-mode
    watermark eviction exactly."""
    import pytest

    from python_darima_spark.streaming.stateful import (
        has_tws_support,
        session_windows_tws,
    )
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_to_table,
        session_agg,
        stage_event_chunks,
    )

    if not has_tws_support():
        with pytest.raises(NotImplementedError, match="protobuf"):
            session_windows_tws(None)
        pytest.skip("protobuf not installed; TWS cannot run here")

    staged = stage_event_chunks(spark, sf_dir, 4)
    a = run_stream_to_table(
        session_agg(read_event_stream(spark, staged)), "append"
    )
    b = run_stream_to_table(
        session_windows_tws(read_event_stream(spark, staged)),
        "append",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    cols = ["user_id", "session_start", "session_end", "n", "sum_value"]
    pa = spark.table(a).toPandas()[cols].sort_values(cols).reset_index(drop=True)
    pb = spark.table(b).toPandas()[cols].sort_values(cols).reset_index(drop=True)
    assert len(pa) > 0  # the replay actually closes sessions
    pd.testing.assert_frame_equal(pa, pb, check_dtype=False)


def test_cep_dfa_equals_regex_nonoverlapping_count():
    """The O(1)-state DFA inside cep_pattern_counts_tws must count
    exactly what the batch twin's regexp_count('VC+P') counts — for
    EVERY event string and every split into stream batches (state
    carried across the split). Property-tested over the full alphabet
    the mapper emits (V, C, P, S, E)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def dfa(chars, st0=0, conv0=0):
        stt, conv = st0, conv0
        for c in chars:
            if c == "V":
                stt = 1
            elif c == "C":
                stt = 2 if stt in (1, 2) else 0
            elif c == "P" and stt == 2:
                conv += 1
                stt = 0
            else:
                stt = 0
        return stt, conv

    @settings(max_examples=500, deadline=None)
    @given(
        s=st.text(alphabet="VCPSE", max_size=60),
        cut=st.integers(min_value=0, max_value=60),
    )
    def check(s, cut):
        want = len(re.findall("VC+P", s))
        _, one_pass = dfa(s)
        assert one_pass == want
        # batch-boundary invariance: fold the prefix, carry state,
        # fold the suffix — exactly what the streaming operator does
        cut = min(cut, len(s))
        mid_st, mid_conv = dfa(s[:cut])
        _, two_pass = dfa(s[cut:], mid_st, mid_conv)
        assert two_pass == want
        # monotone: appending never reduces the count (the max-over-
        # sink aggregation in q_stream_pattern_tws relies on this)
        assert one_pass >= len(re.findall("VC+P", s[:cut]))

    check()


def test_stream_dedup_near_equals_batch_contract(spark, sf_dir):
    """The streaming append-then-probe ingest must emit EXACTLY the
    batch near-dup pairs touching the streamed slice (doc_id%5==0) —
    cross-corpus, cross-batch AND within-batch, each exactly once.
    Compares against the batch all-pairs operator filtered to the same
    contract."""
    from python_darima_spark.operators.dedup import minhash_near_duplicates
    from python_darima_spark.queries import load
    from python_darima_spark.queries.streaming_q import q_stream_dedup_near

    streamed = q_stream_dedup_near(spark, sf_dir).toPandas()
    assert streamed.duplicated(["id_a", "id_b"]).sum() == 0  # exactly-once
    docs = load(spark, sf_dir, "documents")
    batch = minhash_near_duplicates(
        docs, "text", "doc_id", threshold=0.5
    ).toPandas()
    want = {
        (r.id_a, r.id_b)
        for r in batch.itertuples()
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    got = {(r.id_a, r.id_b) for r in streamed.itertuples()}
    assert got == want and len(got) > 0


def test_segmented_ewma_oracle_identical_to_single(sf_dir):
    """The scale-adaptive segmented EWMA oracle (chained depth-bounded
    recursions over temp-table slices, used by the sf1 probe where the
    single recursive CTE costs depth × |ev|) must produce rows
    BIT-IDENTICAL to the single-CTE oracle — seeds are exact row copies
    and update expressions are shared verbatim, so the float trajectory
    cannot diverge. Forces segmentation at test scale (depth 50 → ~5
    segments over ~200 rows/key at sf0.001)."""
    import duckdb
    import pandas as pd

    import python_darima_spark.queries.streaming_q as sq

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    old = sq._EWMA_SEGMENT_DEPTH
    sq._EWMA_SEGMENT_DEPTH = 50
    try:
        seg_sql = sq.build_segmented_ewma_oracle(con)
        assert "_ewma_st_" in seg_sql  # segmentation actually engaged
        seg = con.execute(seg_sql).df()
    finally:
        sq._EWMA_SEGMENT_DEPTH = old
    single = con.execute(sq._EWMA_RECURSIVE_ORACLE).df()
    cols = sorted(seg.columns)
    pd.testing.assert_frame_equal(
        seg[cols].sort_values(cols).reset_index(drop=True),
        single[cols].sort_values(cols).reset_index(drop=True),
    )
    assert len(seg) > 0


def test_distinct_tws_ttl_processing_time_poll_stop(spark, sf_dir):
    """The TTL'd MapState/ValueState shape: Spark requires
    ProcessingTime time mode for TTL, and ProcessingTime-mode TWS never
    quiesces under availableNow (the engine keeps scheduling
    maintenance batches), so the registry entry runs TTL-less and THIS
    test covers the TTL protocol path — run under a supervised
    poll-stop harness and compare the (monotone-max) final counters
    against the batch ground truth. ttl_hours is far above the run's
    wall-clock, so eviction never fires and both shapes must agree."""
    import pyspark.sql.functions as F

    from python_darima_spark.queries import load
    from python_darima_spark.streaming.stateful import (
        distinct_user_counts_tws,
        has_tws_support,
    )
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_until_stable,
        stage_event_chunks,
    )

    if not has_tws_support(spark):
        pytest.skip("transformWithStateInPandas unavailable")
    stream = read_event_stream(spark, stage_event_chunks(spark, sf_dir, 4))
    name = run_stream_until_stable(
        distinct_user_counts_tws(stream, ttl_hours=24),
        "update",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    got = (
        spark.table(name)
        .groupBy("series_key")
        .agg(F.max("users").alias("users"), F.max("events").alias("events"))
        .toPandas()
        .sort_values("series_key")
        .reset_index(drop=True)
    )
    want = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("event_type").cast("string").alias("series_key"))
        .agg(
            F.count_distinct("user_id").alias("users"),
            F.count("*").alias("events"),
        )
        .toPandas()
        .sort_values("series_key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
