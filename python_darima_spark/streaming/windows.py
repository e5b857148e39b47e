"""Streaming window operators (SURVEY.md §2B q_stream_*).

The transformations are written once and work on BOTH batch and streaming
DataFrames — that is Structured Streaming's contract, and it is what makes
batch-equivalence testable: run the same builder on a replayed stream and
on the static table, compare.

Watermark semantics (the part worth pinning down, since the driver's
oracle has to state it in SQL): with output mode ``append``, a window
emits only once the watermark (max observed event time − delay) passes
its end; for session windows, once it passes session_end (= last event +
gap). Our replay stages files in ascending time order, so nothing is ever
dropped as late — the cutoff only truncates the tail. The SQL oracles
restate exactly that cutoff. One measured subtlety (Spark 4.1,
tests/test_streaming_late.py): the watermark that filters a batch's
INPUT rows lags the value reported in that batch's progress by one
batch — the reported value gates state eviction/emission only, so a
straggler is reliably dropped once the watermark passed its window end
in the batch before last.

Scale: state size is O(open windows × groups); the watermark delay bounds
it. At 100 TB/day you shard by the grouping key (Spark does: state store
partitions follow the shuffle partitioning on the group-by key).
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _stream_timeout(default: int = 120) -> int:
    """Harness stream deadline, env-overridable: large-SF probes (sf1 =
    1M replayed events through chatty per-key state RPCs) legitimately
    need more than the 120 s that keeps fixture-scale failures fast —
    set SPARK_GRAFT_STREAM_TIMEOUT instead of editing call sites."""
    try:
        return int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", default))
    except ValueError:
        return default


def tumbling_agg(df: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window count/sum per event_type with late-data watermark."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts (each event lands in window/slide panes)."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n")
    )


def session_agg(
    df: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (gap-based) with event count and value sum."""
    return (
        df.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
            "sum_value",
        )
    )


def stream_static_join_agg(
    stream: DataFrame,
    dim: DataFrame,
    on: str = "event_type",
    category_col: str = "category",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join + tumbling agg: the static dimension is joined
    per micro-batch (broadcast — a dimension table is small by
    definition; Spark re-plans the static side each batch, so slowly
    changing dims pick up updates), then the enriched stream aggregates
    per (window, category)."""
    from pyspark.sql.functions import broadcast

    return (
        stream.join(broadcast(dim), on=on)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), category_col)
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), category_col, "n")
    )


def stream_stream_interval_join(
    clicks: DataFrame,
    errors: DataFrame,
    interval: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM inner join on user_id within a time interval: each
    error is matched to the clicks of the same user in the preceding
    ``interval``. Both sides carry watermarks, so join state is evicted
    once event time passes ``watermark + interval`` — bounded state at
    any scale (without the interval condition + watermarks Spark would
    have to buffer both streams forever). Inner-join append emission is
    exactly the batch join result under in-order replay, which is what
    the SQL oracle states."""
    c = clicks.withWatermark("ts", watermark).select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    e = errors.withWatermark("ts", watermark).select(
        F.col("user_id").alias("_euser"),
        F.col("ts").alias("err_ts"),
        F.col("event_id").alias("err_id"),
    )
    cond = (
        (c["user_id"] == e["_euser"])
        & (F.col("err_ts") >= F.col("click_ts"))
        & (F.col("err_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {interval}"))
    )
    return c.join(e, cond, "inner").select(
        "user_id", "click_id", "err_id", "click_ts", "err_ts"
    )


def stream_dedup(df: DataFrame, watermark: str = "40 days") -> DataFrame:
    """Stateful first-arrival dedup on (user_id, event_type) within the
    watermark horizon (dropDuplicatesWithinWatermark)."""
    return (
        df.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id")
    )


# --- replay harness --------------------------------------------------------

def _fixture_fingerprint(sf_dir: str, table: str) -> str:
    """Short digest of a fixture table's files (relpath/size/mtime) for
    staging-cache keys: a regenerated fixture or a different dataset
    sharing a basename gets a different cache dir, so a stale _STAGED
    marker can never serve old rows (the q_scan_binaryfile round-4
    ADVICE hazard, applied to every staging cache)."""
    import hashlib

    src = os.path.join(sf_dir, f"{table}.parquet")
    h = hashlib.sha256(src.encode())
    if os.path.isdir(src):
        for root, _dirs, files in sorted(os.walk(src)):
            for fn in sorted(files):
                st = os.stat(os.path.join(root, fn))
                h.update(
                    f"{os.path.relpath(os.path.join(root, fn), src)}"
                    f":{st.st_size}:{st.st_mtime_ns};".encode()
                )
    elif os.path.exists(src):
        st = os.stat(src)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, num_chunks: int = 4
) -> str:
    """Write events as ``num_chunks`` time-ordered parquet files so a file
    stream replays them as in-order micro-batches. Cached per
    (sf_dir basename, chunk count, fixture fingerprint)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = _fixture_fingerprint(sf_dir, "events")
    path = os.path.join(
        tempfile.gettempdir(), f"pds_stream_events_v2_{tag}_{num_chunks}_{fp}"
    )
    done = os.path.join(path, "_STAGED")
    if not os.path.exists(done):
        # Chunk boundaries from ts quantiles — a cheap sketch pass instead
        # of a single-partition global ntile sort re-executed per chunk.
        # Windowed aggs only need chunks to cover ascending, disjoint time
        # ranges (append-mode emission depends on the per-batch max event
        # time), but each chunk file is still sorted: first-arrival dedup
        # (q_stream_dedup) keeps the row seen first, so intra-batch scan
        # order is part of the replay contract.
        from python_darima_spark.operators import epoch_seconds
        from python_darima_spark.queries import load

        raw = (
            load(spark, sf_dir, "events")
            .withColumn("_es", epoch_seconds("ts", fractional=True))
            .persist()
        )
        qs = [i / num_chunks for i in range(1, num_chunks)]
        cuts = raw.approxQuantile("_es", qs, 0.001)
        lo = [None, *cuts]
        hi = [*cuts, None]
        for i in range(1, num_chunks + 1):
            pred = F.lit(True)
            if lo[i - 1] is not None:
                pred = F.col("_es") >= F.lit(float(lo[i - 1]))
            if hi[i - 1] is not None:
                pred = pred & (F.col("_es") < F.lit(float(hi[i - 1])))
            (
                raw.where(pred)
                .drop("_es")
                .sort("ts", "event_id")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"chunk={i:03d}"))
            )
        raw.unpersist()
        open(done, "w").close()
    return path


def read_event_stream(spark: SparkSession, staged_path: str) -> DataFrame:
    """File-source stream over the staged chunks, one file per micro-batch.
    The chunks are written by :func:`stage_event_chunks` from the already
    ts-normalized batch loader. Event-time watermarks REQUIRE the TIMESTAMP
    type (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on TIMESTAMP_NTZ), so the
    NTZ column is cast once at the source — wall-clock identity under the
    engine's pinned UTC session timezone."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_path + "/chunk=*")
    )
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def run_stream_to_files(
    result: DataFrame,
    timeout_s: int | None = None,
    state_partitions: int | None = 8,
) -> str:
    """Execute a streaming DataFrame (availableNow) into a PARQUET file
    sink with a checkpoint — the production-shaped sink: exactly-once
    file output (restarts resume from the checkpoint without
    re-emitting), append mode only. Returns the output directory.
    Fresh temp dirs per call keep replays independent."""
    timeout_s = _stream_timeout() if timeout_s is None else timeout_s
    base = tempfile.mkdtemp(prefix="pds_stream_sink_")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    spark = result.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"file-sink stream did not finish in {timeout_s}s")
    finally:
        spark.conf.set(key, prev)
    return out


def run_stream_foreach_upsert(
    stream: DataFrame,
    timeout_s: int | None = None,
) -> str:
    """``foreachBatch`` CDC upsert: every micro-batch SCD1-merges into a
    keyed parquet state table (latest row per user_id by (ts, event_id)).
    This is the streaming MERGE pattern production jobs run against
    Delta/Iceberg; on plain parquet the merge is union + keep-latest with
    an explicit materialize-before-overwrite (persist + count) so the
    state read never races its own rewrite. The checkpoint makes replay
    exactly-once at the batch level: a restarted query re-runs only the
    batch whose merge did not commit — and because the merge is
    idempotent (keep-latest is a pure function of state ∪ batch),
    re-running it cannot change the result.

    Scale: per-batch cost is O(state ∪ batch) with state bounded by key
    cardinality, keyed-window work only. At warehouse scale you bucket
    the state table by the merge key (q_join_bucketed's zero-exchange
    merge) or hand the rewrite to a table format's MERGE."""
    from pyspark.sql import Window

    timeout_s = _stream_timeout() if timeout_s is None else timeout_s
    base = tempfile.mkdtemp(prefix="pds_stream_upsert_")
    state, ckpt = os.path.join(base, "state"), os.path.join(base, "ckpt")

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        cur = batch_df.select("user_id", "event_type", "value", "ts", "event_id")
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            cur = sess.read.parquet(state).unionByName(cur)
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        latest = (
            cur.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .persist()
        )
        latest.count()  # materialize BEFORE overwriting the dir we read
        latest.write.mode("overwrite").parquet(state)
        latest.unpersist()

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"upsert stream did not finish in {timeout_s}s")
    return state


def run_stream_to_table(
    result: DataFrame,
    mode: str = "append",
    timeout_s: int | None = None,
    state_partitions: int | None = 8,
    extra_confs: dict[str, str] | None = None,
) -> str:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the sink table name.

    ``state_partitions`` pins the state-store partition count for this
    query (it is frozen from ``spark.sql.shuffle.partitions`` at stream
    start and written into the checkpoint). Per-micro-batch overhead
    scales with state partitions × stateful operators, so the harness
    default of 8 beats inheriting the batch-sized 32; on a real cluster
    size it to the grouping-key cardinality instead and it will outlive
    restarts via the checkpoint.

    CONCURRENCY CAVEAT: Spark exposes no per-query knob for this — the
    only way to pin it is to set the SESSION conf around ``start()``
    (restored in ``finally``). Any batch query submitted on the same
    session between start and finish would plan with ``state_partitions``
    shuffle partitions. This harness (driver correctness pass, bench,
    tests) is strictly sequential, so nothing observes the window; do
    not call this helper concurrently with batch work on one session.
    """
    timeout_s = _stream_timeout() if timeout_s is None else timeout_s
    name = f"pds_sink_{uuid.uuid4().hex[:12]}"
    spark = result.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    # extra_confs (e.g. the RocksDB state-store provider that
    # transformWithState requires) follow the same set-around-start /
    # restore-in-finally discipline and concurrency caveat as above
    prev_extra = {
        k: spark.conf.get(k, None) for k in (extra_confs or {})
    }
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    for k, v in (extra_confs or {}).items():
        spark.conf.set(k, v)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"stream {name} did not finish in {timeout_s}s")
    finally:
        spark.conf.set(key, prev)
        for k, v in prev_extra.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return name


def run_stream_until_stable(
    result: DataFrame,
    mode: str = "update",
    state_partitions: int | None = 8,
    extra_confs: dict[str, str] | None = None,
    poll_s: float = 1.0,
    stable_polls: int = 3,
    timeout_s: int | None = None,
) -> str:
    """Run a stream to a memory sink and STOP IT EXPLICITLY once the
    sink stabilizes — for ProcessingTime-time-mode stateful queries,
    which Spark keeps scheduling micro-batches for as wall-clock
    advances (``shouldRunAnotherBatch`` is always true), so the
    ``availableNow`` run-to-completion contract of
    :func:`run_stream_to_table` never terminates on them. The sink is
    polled until its row count is positive and unchanged for
    ``stable_polls`` consecutive polls (empty maintenance batches emit
    no rows for input-driven processors), then the query is stopped —
    the supervised-shutdown shape a production ProcessingTime stream
    uses. Only safe when the caller reduces the sink with an
    order-insensitive, prefix-monotone summary (max of cumulative
    counters); arbitrary append semantics should use the availableNow
    harness instead. Same conf set/restore discipline and concurrency
    caveat as :func:`run_stream_to_table`."""
    timeout_s = _stream_timeout() if timeout_s is None else timeout_s
    name = f"pds_sink_{uuid.uuid4().hex[:12]}"
    spark = result.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    prev_extra = {
        k: spark.conf.get(k, None) for k in (extra_confs or {})
    }
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    for k, v in (extra_confs or {}).items():
        spark.conf.set(k, v)
    try:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .start()
        )
        deadline = time.monotonic() + timeout_s
        last, stable = -1, 0
        while time.monotonic() < deadline:
            time.sleep(poll_s)
            if not q.isActive:
                q.awaitTermination()  # surface the failure
                raise RuntimeError(f"stream {name} died before stabilizing")
            n = spark.table(name).count()
            stable = stable + 1 if (n > 0 and n == last) else 0
            last = n
            if stable >= stable_polls:
                break
        q.stop()
        if stable < stable_polls:
            raise TimeoutError(
                f"stream {name} did not stabilize in {timeout_s}s"
            )
    finally:
        spark.conf.set(key, prev)
        for k, v in prev_extra.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return name


DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stage_document_chunks(
    spark: SparkSession,
    sf_dir: str,
    num_chunks: int = 2,
    id_filter: str = "doc_id % 5 = 0",
) -> str:
    """Write the ``id_filter`` slice of documents as ``num_chunks``
    doc_id-ordered parquet files so a file stream replays them as
    in-order ingest micro-batches. Deliberately NOT merged with
    :func:`stage_event_chunks`: the two have different pinned contracts
    (events cut on float epoch quantiles with >=lo/<hi bounds and sort
    (ts, event_id) — the intra-batch order q_stream_dedup's
    first-arrival oracle depends on; documents cut on integer doc_id
    with >lo/<=hi), and four rounds of driver hashes stand behind the
    event convention. Cached per (sf, chunks, filter, fixture
    fingerprint)."""
    from python_darima_spark.queries import load

    import hashlib

    tag = os.path.basename(os.path.normpath(sf_dir))
    # stable digest (NOT Python hash(), which is per-process salted and
    # would defeat the cache) keyed by the slice predicate
    fkey = hashlib.md5(id_filter.encode()).hexdigest()[:8]
    fp = _fixture_fingerprint(sf_dir, "documents")
    path = os.path.join(
        tempfile.gettempdir(),
        f"pds_stream_docs_{tag}_{num_chunks}_{fkey}_{fp}",
    )
    done = os.path.join(path, "_STAGED")
    if not os.path.exists(done):
        docs = load(spark, sf_dir, "documents").where(id_filter).persist()
        # chunk boundaries from doc_id quantiles — the driver sees
        # num_chunks-1 scalars, never an id list (same sketch-pass shape
        # as stage_event_chunks; a collect of ids would be O(corpus) on
        # the driver)
        qs = [i / num_chunks for i in range(1, num_chunks)]
        cuts = docs.approxQuantile("doc_id", qs, 0.001) if num_chunks > 1 else []
        lo = [None, *cuts]
        hi = [*cuts, None]
        for i in range(num_chunks):
            pred = F.lit(True)
            if lo[i] is not None:
                pred = F.col("doc_id") > F.lit(int(lo[i]))
            if hi[i] is not None:
                pred = pred & (F.col("doc_id") <= F.lit(int(hi[i])))
            (
                docs.where(pred)
                .sort("doc_id")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"chunk={i + 1:03d}"))
            )
        docs.unpersist()
        open(done, "w").close()
    return path


def read_document_stream(spark: SparkSession, staged_path: str) -> DataFrame:
    """File-source stream over staged document chunks, one per batch."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_path + "/chunk=*")
    )
