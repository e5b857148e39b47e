"""Watermark late-data semantics for the streaming window family.

The replay harness stages time-ordered chunks, so the registry queries
never exercise LATE data — this test does, with a hand-built out-of-order
replay: an event older than the watermark must be dropped (and must not
re-emit or bump an already-emitted append window), while an out-of-order
event still inside the watermark must be admitted to its (open) window.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from python_darima_spark.streaming.windows import (
    read_event_stream,
    run_stream_to_table,
    tumbling_agg,
)

H = 3600
T0 = 1704067200  # 2024-01-01 00:00:00 UTC, hour-aligned


def _write_chunks(spark, path, chunks, start=1):
    import time
    from datetime import datetime, timezone

    def _ntz(off):
        return datetime.fromtimestamp(T0 + off, tz=timezone.utc).replace(
            tzinfo=None
        )

    for i, rows in enumerate(chunks, start=start):
        df = spark.createDataFrame(
            [(eid, _ntz(off), 1, "a", 1.0, "{}") for eid, off in rows],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        d = os.path.join(path, f"chunk={i:03d}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        # FileStreamSource batches by modification time; sub-second write
        # gaps can tie and merge two chunks into one micro-batch, which
        # would stale the watermark the test depends on — pin strictly
        # increasing mtimes.
        now = time.time()
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (now + i * 10, now + i * 10))


def test_tumbling_append_drops_late_admits_in_watermark(spark):
    path = tempfile.mkdtemp(prefix="pds_late_events_")
    # NOTE (measured, Spark 4.1): the watermark that FILTERS a batch's
    # input lags the one reported in that batch's progress by one batch —
    # the reported value gates EVICTION only. The late row therefore
    # arrives two batches after the watermark first passed its window end,
    # so it is behind the filter watermark under either timing.
    _write_chunks(
        spark,
        path,
        [
            # batch 1: window [00:00, 01:00) gets 3 events
            [(1, 10 * 60), (2, 20 * 60), (3, 30 * 60)],
            # batch 2: max event time 03:30 → watermark 01:30 ≥ 01:00
            [(4, 3 * H + 30 * 60)],
            # batch 3: [00:00, 01:00) evicted+emitted (n=3) by here
            [(7, 3 * H + 45 * 60)],
            # batch 4: 00:40 is far behind every watermark candidate →
            # dropped (no duplicate hour-0 emission either); 02:50 is
            # out-of-order but within the watermark → admitted
            [(5, 40 * 60), (6, 2 * H + 50 * 60)],
            # batch 5: advances the final watermark to 03:45 ≥ 03:00 so
            # [02:00, 03:00) flushes; [03:00, 04:00) stays open
            [(8, 5 * H + 45 * 60)],
        ],
    )
    name = run_stream_to_table(
        tumbling_agg(read_event_stream(spark, path)), "append"
    )
    got = sorted(
        (int(r.wstart.timestamp() - T0) // H, r.n, r.sum_value)
        for r in spark.table(name).collect()
    )
    # late event 5 dropped: hour-0 window emitted EXACTLY ONCE with n=3
    # (an admitted-late row would re-open the evicted window and emit a
    # duplicate (0, 1, 1.0) row — the multiset compare catches that too)
    assert got == [(0, 3, 3.0), (2, 1, 1.0)], got


def test_tumbling_batch_equivalence_counts_everything(spark):
    """The same builder on the STATIC table counts the late row too —
    the batch/stream delta is exactly the watermark-dropped rows."""
    path = tempfile.mkdtemp(prefix="pds_late_events_b_")
    rows = [(1, 10 * 60), (2, 40 * 60), (3, 3 * H)]
    _write_chunks(spark, path, [rows])
    static = spark.read.schema(
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string"
    ).parquet(path + "/chunk=*")
    out = tumbling_agg(static).collect()
    assert {int(r.wstart.timestamp() - T0) // H: r.n for r in out} == {0: 2, 3: 1}


def test_checkpoint_restart_exactly_once(spark):
    """Kill-and-resume: run availableNow over chunks 1-2 into a parquet
    file sink with a checkpoint, then add chunks 3-4 and RE-start the
    same query against the same checkpoint + output dir. The resumed run
    must pick up from the recorded offsets — the final sink contents
    equal one uninterrupted replay's (no re-emitted windows, no gaps),
    which is the exactly-once file-sink contract restarts rely on."""
    base = tempfile.mkdtemp(prefix="pds_restart_")
    src = os.path.join(base, "src")
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")
    os.makedirs(src)

    all_chunks = [
        [(1, 10 * 60), (2, 20 * 60), (3, 30 * 60)],
        [(4, 3 * H + 30 * 60)],           # watermark passes hour 0
        [(5, 4 * H + 10 * 60)],
        [(6, 7 * H + 45 * 60)],           # watermark passes hours 3-4
    ]

    def run_phase(lo, hi):
        # ADD chunks [lo, hi) — never rewrite earlier ones: source files
        # are immutable to a file stream; rewriting a chunk creates new
        # file names the source would (correctly) treat as new data
        _write_chunks(spark, src, all_chunks[lo:hi], start=lo + 1)
        q = (
            tumbling_agg(read_event_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_phase(0, 2)  # phase 1: chunks 1-2, then the query STOPS
    first = spark.read.parquet(out).collect()
    run_phase(2, 4)  # phase 2: same checkpoint, chunks 3-4 appear

    got = {
        (r.wstart.hour, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    # phase-1 output is a prefix (no re-emission of hour 0)
    assert len(first) == 1 and first[0].wstart.hour == 0
    # closed windows: hour 0 (3 events), hour 3 (1), hour 4 (1);
    # hour 7 stays open (watermark 05:45 < 08:00)
    assert got == {
        (0, "a"): (3, 3.0),
        (3, "a"): (1, 1.0),
        (4, "a"): (1, 1.0),
    }
