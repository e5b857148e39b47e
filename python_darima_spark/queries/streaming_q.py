"""Structured Streaming queries (SURVEY.md §2B q_stream_*): each runs a
REAL streaming job — file-replayed micro-batches, watermarks, stateful
aggregation into a memory sink — then returns the sink as a DataFrame.

Oracle status: unusually, these ARE hash-matched. Append-mode emission is
deterministic given in-order replay: a window emits iff
``window_end ≤ max_event_time − watermark_delay``; sessions emit iff
``session_end = last_ts + gap`` clears the same cutoff; first-arrival
dedup with a horizon-wide watermark keeps exactly the (ts, event_id)-min
row per key. The SQL oracles state those cutoffs explicitly. Event times
are CAST to microsecond TIMESTAMP in the oracles because Spark reads the
nanos column truncated to micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from python_darima_spark.queries import QuerySpec, load
from python_darima_spark.queries.pipeline_ext import _CEP_ORACLE
from python_darima_spark.streaming.stateful import (
    cep_pattern_counts_tws,
    distinct_user_counts_tws,
    ewma_anomalies,
    ewma_anomalies_tws,
    has_tws_support,
    session_windows_tws,
)
from python_darima_spark.streaming.windows import (
    read_event_stream,
    run_stream_foreach_upsert,
    run_stream_to_files,
    run_stream_to_table,
    session_agg,
    sliding_agg,
    stage_event_chunks,
    stream_dedup,
    stream_static_join_agg,
    stream_stream_interval_join,
    tumbling_agg,
)


def _replayed(spark: SparkSession, sf: str) -> DataFrame:
    return read_event_stream(spark, stage_event_chunks(spark, sf, num_chunks=4))


def q_stream_tumble(spark: SparkSession, sf: str) -> DataFrame:
    name = run_stream_to_table(tumbling_agg(_replayed(spark, sf)), "append")
    return spark.table(name)


def q_stream_slide(spark: SparkSession, sf: str) -> DataFrame:
    name = run_stream_to_table(sliding_agg(_replayed(spark, sf)), "append")
    return spark.table(name)


def q_stream_session(spark: SparkSession, sf: str) -> DataFrame:
    name = run_stream_to_table(session_agg(_replayed(spark, sf)), "append")
    return spark.table(name)


def q_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    name = run_stream_to_table(stream_dedup(_replayed(spark, sf)), "append")
    return spark.table(name)


def q_stream_dedup_rocksdb(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME stateful dedup on the ROCKSDB state-store provider — the
    backend that makes 100 TB-scale streaming state viable (state lives
    off-heap in per-partition RocksDB instances with incremental
    checkpointing, instead of the default HDFS-backed in-memory maps
    that must FIT in executor memory). RocksDB ships in Spark's JVM —
    no extra packages — so unlike the protobuf-gated transformWithState
    twin this runs here. Identical results to q_stream_dedup by
    construction (same oracle): the hash match proves state-backend
    choice is result-invisible, which is the migration guarantee for
    flipping the provider on a production checkpoint."""
    name = run_stream_to_table(
        stream_dedup(_replayed(spark, sf)),
        "append",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    return spark.table(name)


def q_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static join: the replayed stream enriched per micro-batch
    with a broadcast dimension (event_type → category), then a tumbling
    count per category. The oracle inlines the dimension expression."""
    dim = (
        load(spark, sf, "events")
        .select("event_type")
        .distinct()
        .withColumn("category", F.upper(F.substring("event_type", 1, 1)))
    )
    name = run_stream_to_table(
        stream_static_join_agg(_replayed(spark, sf), dim), "append"
    )
    return spark.table(name)


def q_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream interval self-join: errors matched to same-user
    clicks within the preceding 2 hours. Both branches derive from ONE
    replayed source (a streaming self-join); inner-join append emission
    under in-order replay equals the batch join, so this is hash-matched
    against plain SQL."""
    s = _replayed(spark, sf)
    name = run_stream_to_table(
        stream_stream_interval_join(
            s.where(F.col("event_type") == "click"),
            s.where(F.col("event_type") == "error"),
            interval="2 hours",
        ),
        "append",
    )
    return spark.table(name)


def q_stream_sink_files(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming PARQUET file sink with checkpoint (exactly-once output)
    read back — same tumbling agg and oracle as q_stream_tumble, but
    through the production sink path instead of the memory sink."""
    out = run_stream_to_files(tumbling_agg(_replayed(spark, sf)))
    return spark.read.parquet(out)


def q_stream_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC upsert via foreachBatch: each replayed micro-batch
    merges into a keyed parquet state table, keeping the latest row per
    user (by ts, then event_id). The final state is batch-order
    INDEPENDENT — keep-latest is associative — so it hash-matches the
    plain SQL 'latest event per user' statement."""
    out = run_stream_foreach_upsert(_replayed(spark, sf))
    return spark.read.parquet(out).select(
        "user_id",
        "event_type",
        F.round("value", 6).alias("value"),
        "event_id",
    )


def q_stream_dedup_near(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING NEAR-DUP INGEST — the production loop the batch dedup
    family feeds: documents arrive as micro-batches (the doc_id%5==0
    slice replayed in 2 doc_id-ordered chunks), the doc_id%5!=0 corpus
    is pre-indexed, and each micro-batch runs append-then-probe via
    ``foreachBatch`` against the PERSISTED MinHash index
    (operators/dedup.py minhash_index_append / minhash_probe_index):
    batch N finds its pairs against corpus ∪ batches 1..N — so the union
    of emissions is every J≥0.5 pair with at least one streamed element
    (cross corpus, cross earlier batches, and within-batch via the
    self-probe, normalized least/greatest + batch-local distinct;
    self-pairs dropped). Exactly-once per pair by construction: a
    cross-batch pair emits only when its LATER element probes.

    foreachBatch is the right harness (not a stream-static join):
    probe-then-append must observe the index ACCUMULATED through this
    very stream, which a static join side frozen at plan time cannot.
    The oracle is the all-pairs exact-Jaccard restatement filtered to
    pairs touching the streamed slice — every emitted pair is
    exact-verified, so the hash match is again the recall-1.0 statement.
    Scale: per-ingest cost is O(|batch|·bands) probe rows against the
    band-partitioned index + verification; state lives in the index
    files, not the stream's state store (nothing stateful in-plan)."""
    import shutil
    import tempfile
    import uuid

    from python_darima_spark.operators.dedup import (
        minhash_index_append,
        minhash_probe_index,
    )
    from python_darima_spark.streaming.windows import (
        read_document_stream,
        stage_document_chunks,
    )

    docs_all = load(spark, sf, "documents")
    corpus = docs_all.where(F.col("doc_id") % 5 != 0)
    base = tempfile.mkdtemp(prefix="pds_stream_neardup_")
    ix = f"{base}/index"
    out = f"{base}/pairs"
    ckpt = f"{base}/ckpt"
    shutil.rmtree(ix, ignore_errors=True)
    minhash_index_append(corpus, ix, ingest_tag="corpus")
    # pre-create the sink so an (impossible-on-fixture) zero-pair run
    # still reads back as an empty 3-column table
    spark.createDataFrame(
        [], "id_a long, id_b long, jaccard double"
    ).write.mode("overwrite").parquet(f"{out}/ingest=init")

    # IDEMPOTENT batch handler (round-5 ADVICE): foreachBatch is
    # at-least-once, so a replayed micro-batch must not duplicate index
    # signatures or output pairs. Both side effects are keyed by the
    # stable batch_id and written with overwrite — the index append
    # lands in ingest=batch-N (minhash_index_append's ingest_tag), the
    # pairs land in ingest=batch-N under the sink — so a retry rewrites
    # its own partition dirs instead of appending duplicates, and the
    # exactly-once-per-pair contract survives replays.
    def process(batch_df, batch_id) -> None:
        minhash_index_append(batch_df, ix, ingest_tag=f"batch-{batch_id}")
        pairs = minhash_probe_index(
            batch_df, ix, docs_all, threshold=0.5
        )
        (
            pairs.where(F.col("id_new") != F.col("id_old"))
            .select(
                F.least("id_new", "id_old").alias("id_a"),
                F.greatest("id_new", "id_old").alias("id_b"),
                "jaccard",
            )
            .distinct()
            .write.mode("overwrite")
            .parquet(f"{out}/ingest=batch-{batch_id}")
        )

    staged = stage_document_chunks(spark, sf, num_chunks=2)
    q = (
        read_document_stream(spark, staged)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .queryName(f"pds_neardup_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
        raise TimeoutError("near-dup ingest stream did not finish in 180s")
    # distinct on read: a batch replayed AFTER a later batch landed would
    # re-probe against the later signatures and re-emit that batch's
    # cross pairs — the per-batch overwrite makes each dir idempotent,
    # the read-side distinct makes the UNION exactly-once-per-pair even
    # under out-of-order replays
    return (
        spark.read.parquet(out)
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )


def q_scan_pysource_stream(spark: SparkSession, sf: str) -> DataFrame:
    """CUSTOM STREAMING CONNECTOR via the Python Data Source API (Spark
    4 ``SimpleDataSourceStreamReader``, sources/pysource.py): the
    deterministic series generator emitted as 4 real micro-batches
    (offsets checkpointed by Spark; ``readBetweenOffsets`` replays any
    committed range exactly, so recovery is exactly-once with no source
    state). ``sf`` is unused — the point is the non-file STREAMING
    connector axis. The stream runs with a processing-time trigger and
    stops once the known row count lands (availableNow snapshots only
    the reader's first prefetched batch, so it cannot drain a
    multi-batch source). The result re-aggregates the sink per series
    with micro-integer sums; the oracle restates the generator formula,
    so the hash check covers offset planning → per-batch generation →
    append sink — end to end."""
    import tempfile
    import time
    import uuid

    from python_darima_spark.sources.pysource import (
        register_synthetic_stream_source,
    )

    register_synthetic_stream_source(spark)
    num_series, rows, nb = 6, 240, 4
    expected = num_series * rows
    name = f"pds_pystream_{uuid.uuid4().hex[:12]}"
    df = (
        spark.readStream.format("synthetic_series_stream")
        .option("num_series", num_series)
        .option("rows_per_series", rows)
        .option("num_batches", nb)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="pds_pystream_ckpt_")
        )
        .start()
    )
    from python_darima_spark.streaming.windows import _stream_timeout

    budget = _stream_timeout()
    try:
        deadline = time.time() + budget
        while (
            time.time() < deadline and spark.table(name).count() < expected
        ):
            time.sleep(0.3)
    finally:
        q.stop()
    landed = spark.table(name).count()
    if landed < expected:  # distinguish slow-drain timeout from a real
        # correctness failure — a partial aggregate would hash-mismatch
        # with no indication the stream simply hadn't finished
        raise RuntimeError(
            f"synthetic stream drained {landed}/{expected} rows before the "
            f"{budget} s deadline — machine too slow, not a correctness "
            "failure"
        )
    y6 = F.round(F.col("y") * 1e6).cast("bigint")
    return (
        spark.table(name)
        .groupBy("series_id")
        .agg(
            F.count("*").alias("n"),
            F.min("idx").alias("first_idx"),
            F.max("idx").alias("last_idx"),
            F.round(F.sum(y6) / 1e6, 6).alias("sum_y"),
        )
    )


def q_stream_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): online EWMA
    z-score anomalies per event_type. Deterministic given in-order replay,
    but the EWMA recursion is not SQL-expressible → rows-only driver check;
    batch-equivalence proven in tests/test_streaming_stateful.py."""
    name = run_stream_to_table(ewma_anomalies(_replayed(spark, sf)), "update")
    return spark.table(name)


def q_stream_anomaly_tws(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME detector on ``transformWithStateInPandas`` — Spark 4's
    arbitrary-state successor API (typed state handles, timers, TTL,
    state-schema evolution), which requires the RocksDB state store.
    Emits identical rows to q_stream_anomaly on identical replay
    (twin-equivalence asserted in tests/test_streaming_stateful.py), so
    the rows-only driver check is backed by an exact cross-API oracle."""
    name = run_stream_to_table(
        ewma_anomalies_tws(_replayed(spark, sf)),
        "update",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    return spark.table(name)


def q_stream_distinct_tws(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type distinct-user + event counters on
    transformWithStateInPandas with MAPSTATE and ValueState —
    completing the arbitrary-state API surface (ValueState: anomaly
    twin; ListState + timers: session twin; TTL: the ProcessingTime
    poll-stop test in tests/test_streaming_stateful.py — TTL'd state
    requires ProcessingTime time mode, which never quiesces under the
    availableNow replay this gate needs, see the operator docstring).
    The processor emits monotone cumulative counters per batch in
    update mode; the final value per key is the max over the sink,
    which the oracle pins to the batch count(distinct)/count(*). See
    streaming.stateful.distinct_user_counts_tws."""
    name = run_stream_to_table(
        distinct_user_counts_tws(_replayed(spark, sf)),
        "update",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    return (
        spark.table(name)
        .groupBy(F.col("series_key").alias("event_type"))
        .agg(
            F.max("users").alias("users"),
            F.max("events").alias("n_events"),
        )
    )


def q_stream_pattern_tws(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CEP conversion counting (view→click+→purchase) with
    O(1) per-user state — the DFA restatement of q_window_pattern's
    regex, sharing its hash oracle (the two entries must agree on every
    user's conversion count). Cumulative update-mode emissions are
    monotone, so the final value per user is the max over the sink.
    See streaming.stateful.cep_pattern_counts_tws for the DFA and the
    leftmost-match equivalence argument."""
    name = run_stream_to_table(
        cep_pattern_counts_tws(_replayed(spark, sf)),
        "update",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_conversions").alias("n_conversions"),
        )
        .withColumn("converted", F.col("n_conversions") > 0)
    )


def q_stream_session_tws(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization on ``transformWithStateInPandas`` with
    ListState + event-time timers (round-8 VERDICT ask #4) — the
    arbitrary-state twin of q_stream_session's session_window plan.
    Emission happens exclusively on the timer path (buffer on input,
    flush when the watermark passes a session's end), and the entry
    shares the windowed twin's hash oracle, so the two APIs must agree
    emission for emission. See streaming.stateful.session_windows_tws
    for the mechanics and the timer-expiry boundary analysis."""
    name = run_stream_to_table(
        session_windows_tws(_replayed(spark, sf)),
        "append",
        extra_confs={
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider"
            )
        },
    )
    return spark.table(name)


# Gap-based sessionization restated in SQL: sessions are maximal runs
# with consecutive per-user gaps < 30 min (lag + running sum of session
# starts), emitted iff session_end = last_ts + gap clears the append
# cutoff max_ts − 2 h. SHARED by q_stream_session (session_window
# windowed aggregation) and q_stream_session_tws (ListState + event-time
# timers on transformWithStateInPandas): the hash match proves the
# arbitrary-state reimplementation of Spark's own session operator is
# emission-for-emission identical — the migration guarantee for moving a
# sessionization stream onto the new API.
_SESSION_ORACLE = """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, value,
                             event_id
                      FROM events),
           mx AS (SELECT max(ts) AS mt FROM e),
           o AS (SELECT user_id, ts, value, event_id,
                        lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS pts
                 FROM e),
           f AS (SELECT *, CASE WHEN pts IS NULL
                                  OR ts - pts >= INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS is_new
                 FROM o),
           g AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS sid
                 FROM f),
           s AS (SELECT min(ts) AS session_start,
                        max(ts) + INTERVAL 30 MINUTE AS session_end,
                        user_id, count(*) AS n,
                        round(sum(value), 4) AS sum_value
                 FROM g GROUP BY user_id, sid)
           SELECT s.session_start, s.session_end, s.user_id, s.n, s.sum_value
           FROM s, mx
           WHERE s.session_end <= mx.mt - INTERVAL 2 HOUR"""


# The EWMA fold is a LINEAR recursion over per-key (ts, event_id) order,
# so a recursive CTE restates it — every float op at the exact expression
# shape the Python fold uses (delta reused, (0.1·δ)·δ association,
# math.sqrt = SQL sqrt, both IEEE correctly rounded; 1.0−0.1 == 0.9
# exactly in float64), so both engines walk bit-identical doubles and the
# |z| ≥ 3 emission decisions cannot diverge. State rows accumulate one
# per (key, i) — O(rows) but iteration-bound in DuckDB (depth = rows/key),
# fine at the sf0.01 driver gate (q_stream_anomaly graduated from
# rows-only in round 7). Shared verbatim by the TWS twin: the two
# stateful APIs must produce the same hash.
_EWMA_RECURSIVE_ORACLE = """WITH RECURSIVE ev AS (
     SELECT event_type AS k, CAST(ts AS TIMESTAMP) AS ts, value,
            row_number() OVER (
              PARTITION BY event_type
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS i
     FROM events
   ), st AS (
     SELECT event_type AS k, 0 AS i, 0 AS cnt,
            CAST(0 AS DOUBLE) AS mean, CAST(0 AS DOUBLE) AS var
     FROM (SELECT DISTINCT event_type FROM events) t
     UNION ALL
     SELECT s.k, e.i, s.cnt + 1,
            CASE WHEN s.cnt = 0 THEN e.value
                 ELSE s.mean + CAST(0.1 AS DOUBLE)
                      * (e.value - s.mean) END,
            CASE WHEN s.cnt = 0 THEN CAST(0 AS DOUBLE)
                 ELSE CAST(0.9 AS DOUBLE) * (s.var
                      + (CAST(0.1 AS DOUBLE) * (e.value - s.mean))
                        * (e.value - s.mean)) END
     FROM st s JOIN ev e ON e.k = s.k AND e.i = s.i + 1
   )
   SELECT s.k AS series_key, e.ts, e.value,
          floor((e.value - s.mean) / sqrt(s.var) * 1e6 + 0.5) / 1e6
              AS zscore,
          floor(s.mean * 1e6 + 0.5) / 1e6 AS ewm_mean,
          CAST(s.cnt AS BIGINT) AS seen
   FROM st s JOIN ev e ON e.k = s.k AND e.i = s.i + 1
   WHERE s.cnt >= 24 AND s.var > 0
     AND abs((e.value - s.mean) / sqrt(s.var))
         >= CAST(3.0 AS DOUBLE)"""


# DuckDB executes a recursive CTE as one join round per iteration, and
# every round probes the full join input — a 20k-deep recursion over a
# 1M-row events table costs depth × |ev| (measured 456 s at sf1). The
# SEGMENTED form (round-7 VERDICT ask #3) chains K depth-bounded
# recursive CTEs, each seeded by the previous segment's per-key final
# state and joining only its own MATERIALIZED 1/K slice of the rows, so
# total work falls to depth × |ev| / K. Expressions are copied VERBATIM
# from the single-CTE oracle and seeds are exact row copies, so the
# float trajectory is bit-identical — the hash cannot tell the two
# shapes apart (asserted at sf0.01 by test_segmented_ewma_oracle).
_EWMA_SEGMENT_DEPTH = 2048

_EWMA_UPDATE = """SELECT s.k, e.i, s.cnt + 1,
            CASE WHEN s.cnt = 0 THEN e.value
                 ELSE s.mean + CAST(0.1 AS DOUBLE)
                      * (e.value - s.mean) END,
            CASE WHEN s.cnt = 0 THEN CAST(0 AS DOUBLE)
                 ELSE CAST(0.9 AS DOUBLE) * (s.var
                      + (CAST(0.1 AS DOUBLE) * (e.value - s.mean))
                        * (e.value - s.mean)) END"""


def build_segmented_ewma_oracle(duck, sf_dir: str | None = None) -> str:
    """Scale-adaptive DuckDB oracle for the EWMA detector: the plain
    recursive CTE below the segment-depth bound, the chained-segment
    form above it. ``duck`` must already expose the ``events`` view.

    Every stage is materialized as a REAL temp table, one statement per
    segment, because DuckDB re-evaluates CTEs (even ``AS MATERIALIZED``
    ones) per reference from recursive arms and re-executes chained
    recursive CTEs per downstream reference — both in-query shapes
    measured exponential-or-worse at sf1 (the single CTE alone was a
    456 s wall: the 1M-row row_number window recomputed per iteration).
    With temp tables each segment's recursion probes only its own
    |ev|/K-row slice exactly once per iteration."""
    [maxd] = duck.execute(
        "SELECT max(c) FROM (SELECT count(*) AS c FROM events "
        "GROUP BY event_type)"
    ).fetchone()
    d = _EWMA_SEGMENT_DEPTH
    k_segs = max(1, -(-int(maxd) // d))
    if k_segs == 1:
        return _EWMA_RECURSIVE_ORACLE
    duck.execute(
        """CREATE OR REPLACE TEMP TABLE _ewma_ev AS
     SELECT event_type AS k, CAST(ts AS TIMESTAMP) AS ts, value,
            row_number() OVER (
              PARTITION BY event_type
              ORDER BY CAST(ts AS TIMESTAMP), event_id) AS i
     FROM events"""
    )
    for s in range(k_segs):
        duck.execute(
            f"CREATE OR REPLACE TEMP TABLE _ewma_ev_{s} AS "
            f"SELECT * FROM _ewma_ev "
            f"WHERE i > {s * d} AND i <= {(s + 1) * d}"
        )
        # segment anchor: the i=0 seeds (segment 0) or the previous
        # segment's per-key FINAL state — exact row copies, so the
        # float trajectory is bit-identical to the single recursion
        anchor = (
            """SELECT event_type AS k, 0 AS i, 0 AS cnt,
            CAST(0 AS DOUBLE) AS mean, CAST(0 AS DOUBLE) AS var
     FROM (SELECT DISTINCT event_type FROM events) t"""
            if s == 0
            else f"""SELECT s.k, s.i, s.cnt, s.mean, s.var
     FROM _ewma_st_{s - 1} s
     JOIN (SELECT k, max(i) AS mi FROM _ewma_st_{s - 1} GROUP BY k) m
       ON s.k = m.k AND s.i = m.mi"""
        )
        duck.execute(
            f"""CREATE OR REPLACE TEMP TABLE _ewma_st_{s} AS
   WITH RECURSIVE st AS (
     {anchor}
     UNION ALL
     {_EWMA_UPDATE}
     FROM st s JOIN _ewma_ev_{s} e ON e.k = s.k AND e.i = s.i + 1
   ) SELECT * FROM st"""
        )
    # each segment CONTRIBUTES only the states it created (i > s·d);
    # seed copies duplicate the prior segment's final row and are
    # filtered out here, never double-emitted
    allst = "\n     UNION ALL ".join(
        ["SELECT * FROM _ewma_st_0"]
        + [
            f"SELECT * FROM _ewma_st_{s} WHERE i > {s * d}"
            for s in range(1, k_segs)
        ]
    )
    return (
        f"WITH allst AS (\n     {allst}\n   )"
        + """
   SELECT s.k AS series_key, e.ts, e.value,
          floor((e.value - s.mean) / sqrt(s.var) * 1e6 + 0.5) / 1e6
              AS zscore,
          floor(s.mean * 1e6 + 0.5) / 1e6 AS ewm_mean,
          CAST(s.cnt AS BIGINT) AS seen
   FROM allst s JOIN _ewma_ev e ON e.k = s.k AND e.i = s.i + 1
   WHERE s.cnt >= 24 AND s.var > 0
     AND abs((e.value - s.mean) / sqrt(s.var))
         >= CAST(3.0 AS DOUBLE)"""
    )


QUERIES = {
    "q_stream_dedup_near": QuerySpec(
        q_stream_dedup_near,
        """WITH sh AS (
             SELECT doc_id,
                    list_distinct(list_transform(
                        generate_series(1, greatest(length(text) - 4, 1)),
                        i -> substring(text, CAST(i AS INT), 5))) AS s
             FROM documents
           ), e AS (
             SELECT doc_id, unnest(s) AS g FROM sh
           ), sizes AS (
             SELECT doc_id, len(s) AS n FROM sh
           ), inter AS (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
             FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
             GROUP BY 1, 2
           )
           SELECT id_a, id_b,
                  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
           FROM inter
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
             AND (id_a % 5 = 0 OR id_b % 5 = 0)""",
    ),
    "q_scan_pysource_stream": QuerySpec(
        q_scan_pysource_stream,
        """WITH g AS (
             SELECT CAST(s.s AS INT) AS series_id, CAST(i.i AS INT) AS idx,
                    round(sin((i.i + s.s) / 24.0) * 10 + (i.i % 7) + s.s, 6)
                        AS y
             FROM (SELECT unnest(generate_series(0, 5)) AS s) s,
                  (SELECT unnest(generate_series(0, 239)) AS i) i
           )
           SELECT series_id, count(*) AS n,
                  min(idx) AS first_idx, max(idx) AS last_idx,
                  round(sum(CAST(round(y * 1e6) AS BIGINT)) / 1e6, 6) AS sum_y
           FROM g GROUP BY series_id""",
    ),
    "q_stream_tumble": QuerySpec(
        q_stream_tumble,
        """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                      FROM events),
           mx AS (SELECT max(ts) AS mt FROM e),
           b AS (SELECT date_trunc('hour', ts) AS wstart, event_type,
                        count(*) AS n, round(sum(value), 4) AS sum_value
                 FROM e GROUP BY 1, 2)
           SELECT b.wstart, b.event_type, b.n, b.sum_value
           FROM b, mx
           WHERE b.wstart + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""",
    ),
    "q_stream_slide": QuerySpec(
        q_stream_slide,
        """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type
                      FROM events),
           mx AS (SELECT max(ts) AS mt FROM e),
           panes AS (
             SELECT TIMESTAMP '1970-01-01'
                      + (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900
                         - k.k * 900) * INTERVAL 1 SECOND AS wstart,
                    event_type
             FROM e, (SELECT unnest(generate_series(0, 3)) AS k) k
           ),
           b AS (SELECT wstart, event_type, count(*) AS n
                 FROM panes GROUP BY 1, 2)
           SELECT b.wstart, b.event_type, b.n
           FROM b, mx
           WHERE b.wstart + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""",
    ),
    "q_stream_session": QuerySpec(q_stream_session, _SESSION_ORACLE),
    "q_stream_session_tws": QuerySpec(
        q_stream_session_tws, _SESSION_ORACLE
    ),
    "q_stream_distinct_tws": QuerySpec(
        q_stream_distinct_tws,
        """SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS users,
                  CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY event_type""",
    ),
    # shares q_window_pattern's oracle: the streaming DFA and the batch
    # regex must agree on every user's conversion count
    "q_stream_pattern_tws": QuerySpec(q_stream_pattern_tws, _CEP_ORACLE),
    "q_stream_join": QuerySpec(
        q_stream_join,
        """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts,
                             upper(substring(event_type, 1, 1)) AS category
                      FROM events),
           mx AS (SELECT max(ts) AS mt FROM e),
           b AS (SELECT date_trunc('hour', ts) AS wstart, category,
                        count(*) AS n
                 FROM e GROUP BY 1, 2)
           SELECT b.wstart, b.category, b.n
           FROM b, mx
           WHERE b.wstart + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""",
    ),
    "q_stream_stream_join": QuerySpec(
        q_stream_stream_join,
        """WITH e AS (SELECT event_id, user_id, event_type,
                             CAST(ts AS TIMESTAMP) AS ts
                      FROM events)
           SELECT c.user_id,
                  c.event_id AS click_id,
                  r.event_id AS err_id,
                  c.ts AS click_ts,
                  r.ts AS err_ts
           FROM e c JOIN e r
             ON c.user_id = r.user_id
            AND c.event_type = 'click' AND r.event_type = 'error'
            AND r.ts >= c.ts AND r.ts <= c.ts + INTERVAL 2 HOUR""",
    ),
    "q_stream_sink_files": QuerySpec(
        q_stream_sink_files,
        """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value
                      FROM events),
           mx AS (SELECT max(ts) AS mt FROM e),
           b AS (SELECT date_trunc('hour', ts) AS wstart, event_type,
                        count(*) AS n, round(sum(value), 4) AS sum_value
                 FROM e GROUP BY 1, 2)
           SELECT b.wstart, b.event_type, b.n, b.sum_value
           FROM b, mx
           WHERE b.wstart + INTERVAL 1 HOUR <= mx.mt - INTERVAL 2 HOUR""",
    ),
    "q_stream_upsert": QuerySpec(
        q_stream_upsert,
        """SELECT user_id, event_type, round(value, 6) AS value, event_id
           FROM (
             SELECT user_id, event_type, value, event_id,
                    ROW_NUMBER() OVER (
                      PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             FROM events
           ) WHERE rn = 1""",
    ),
    # q_stream_anomaly graduated from rows-only in round 7: the EWMA
    # fold is a LINEAR recursion over per-key (ts, event_id) order, so a
    # recursive CTE can restate it — and every float op is restated at
    # the exact expression shape the Python fold uses (delta reused,
    # (0.1·δ)·δ association, math.sqrt = SQL sqrt, both IEEE correctly
    # rounded; 1.0−0.1 == 0.9 exactly in float64), so both engines walk
    # bit-identical doubles and the |z| ≥ 3 emission decisions cannot
    # diverge. State rows accumulate one per (key, i) — the oracle is
    # O(rows) but iteration-bound in DuckDB (depth = rows/key), which is
    # fine at the sf0.01 driver gate.
    "q_stream_anomaly": QuerySpec(
        q_stream_anomaly,
        _EWMA_RECURSIVE_ORACLE,
        oracle_builder=build_segmented_ewma_oracle,
    ),
    "q_stream_dedup": QuerySpec(
        q_stream_dedup,
        """SELECT user_id, event_type, event_id FROM (
             SELECT user_id, event_type, event_id,
                    ROW_NUMBER() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             FROM events
           ) WHERE rn = 1""",
    ),
    # same oracle as q_stream_dedup on purpose: the state-backend swap
    # (HDFS-map -> RocksDB) must be result-invisible
    "q_stream_dedup_rocksdb": QuerySpec(
        q_stream_dedup_rocksdb,
        """SELECT user_id, event_type, event_id FROM (
             SELECT user_id, event_type, event_id,
                    ROW_NUMBER() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
             FROM events
           ) WHERE rn = 1""",
    ),
}

# transformWithStateInPandas needs the protobuf package (its state-server
# wire protocol). Where the real wheel is absent, the vendored minimal
# wire runtime (python_darima_spark/vendor, clean-room from the public
# spec) activates on driver and workers, so the entry runs for real here
# too — and is hash-graded against the SAME recursive-CTE oracle as its
# applyInPandasWithState twin (the state-API swap must be
# result-invisible). Only if neither the real nor the vendored runtime
# can import does the plan-time guard raise an explicit ENV-REFUSAL.
QUERIES["q_stream_anomaly_tws"] = QuerySpec(
    q_stream_anomaly_tws,
    _EWMA_RECURSIVE_ORACLE,
    oracle_builder=build_segmented_ewma_oracle,
)
