"""Custom connector via the Python Data Source API (Spark 4).

The reference's only sources are CSV files and object-store paths
(/root/reference/darima.py:127-141, darima_config.json:6-7). A real engine
also needs a CONNECTOR story — sources that are not files. Spark 4's
``pyspark.sql.datasource`` API makes that a first-class, partition-parallel
citizen without a line of JVM code, and this module demonstrates it with a
deterministic synthetic-series generator (the "load generator" connector
every benchmark/soak-test harness wants):

* ``partitions()`` declares one InputPartition per series shard, so the
  scan is parallel — each executor task generates only its shard
  (round-robin ``series_id % num_partitions``); scale the partition count
  with the series count and no task ever holds the whole table.
* the rows are a pure function of (series_id, idx) — no RNG state — so
  the same options always produce the same table on any cluster, any
  partitioning, any engine (the DuckDB oracle restates the formula).

At 100 TB the same shape wraps any record-service/API-backed source:
partition by shard key, yield per-shard rows, let Spark schedule.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_EPOCH = datetime(2024, 1, 1)


def series_value(series_id: int, idx: int) -> float:
    """The generator formula — shared by the connector and its tests."""
    return round(
        math.sin((idx + series_id) / 24.0) * 10.0 + (idx % 7) + series_id, 6
    )


class SyntheticSeriesDataSource(DataSource):
    """``spark.read.format("synthetic_series")`` — options:
    ``num_series`` (default 8), ``rows_per_series`` (default 720),
    ``num_partitions`` (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_series"

    def schema(self) -> str:
        return "series_id int, idx int, ts timestamp, y double"

    def reader(self, schema) -> "SyntheticSeriesReader":
        return SyntheticSeriesReader(self.options)


class SyntheticSeriesReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.num_series = int(options.get("num_series", 8))
        self.rows_per_series = int(options.get("rows_per_series", 720))
        self.num_partitions = int(options.get("num_partitions", 8))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        shard = partition.value
        for s in range(self.num_series):
            if s % self.num_partitions != shard:
                continue
            for idx in range(self.rows_per_series):
                yield (
                    s,
                    idx,
                    _EPOCH + timedelta(hours=idx),
                    series_value(s, idx),
                )


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(SyntheticSeriesDataSource)


class SyntheticSeriesStreamSource(DataSource):
    """``spark.readStream.format("synthetic_series_stream")`` — the
    STREAMING side of the connector API (Spark 4
    ``SimpleDataSourceStreamReader``): the same deterministic generator
    emitted as ``num_batches`` micro-batches of consecutive idx chunks.
    Offsets are plain dicts checkpointed by Spark; ``readBetweenOffsets``
    replays any committed range exactly (the generator is a pure
    function of the offset range), so recovery is exactly-once without
    the source storing anything. Options: ``num_series`` (default 6),
    ``rows_per_series`` (default 240, must divide by ``num_batches``),
    ``num_batches`` (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_series_stream"

    def schema(self) -> str:
        return "series_id int, idx int, ts timestamp, y double"

    def simpleStreamReader(self, schema) -> "SyntheticSeriesStreamReader":
        return SyntheticSeriesStreamReader(self.options)


class SyntheticSeriesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.num_series = int(options.get("num_series", 6))
        self.rows_per_series = int(options.get("rows_per_series", 240))
        self.num_batches = int(options.get("num_batches", 4))
        self.chunk = self.rows_per_series // self.num_batches

    def initialOffset(self) -> dict:
        return {"chunk": 0}

    def _rows(self, chunk: int) -> list:
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s
        # the iterator read() returns, and generators aren't copyable
        # (TypeError: cannot pickle 'generator'); each chunk is bounded
        # (rows_per_series/num_batches × num_series) so materializing is
        # the contract, not a compromise
        lo, hi = chunk * self.chunk, (chunk + 1) * self.chunk
        return [
            (s, idx, _EPOCH + timedelta(hours=idx), series_value(s, idx))
            for s in range(self.num_series)
            for idx in range(lo, hi)
        ]

    def read(self, start: dict):
        c = start["chunk"]
        if c >= self.num_batches:
            return iter([]), {"chunk": c}
        return iter(self._rows(c)), {"chunk": c + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        out: list = []
        for c in range(start["chunk"], end["chunk"]):
            out.extend(self._rows(c))
        return iter(out)


def register_synthetic_stream_source(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(SyntheticSeriesStreamSource)


class JsonlDirDataSource(DataSource):
    """WRITE side of the Python Data Source API — a JSON-lines directory
    sink with two-phase commit, the connector shape for any non-file
    target (record service, feature store, queue) written without JVM
    code:

    * each TASK ATTEMPT writes its partition to
      ``part-<pid>-<attempt>.jsonl.tmp`` — the attempt id in the name is
      what makes speculation/retry safe (two live attempts of the same
      partition write DIFFERENT files; Hadoop committers use per-attempt
      paths for exactly this reason) — and returns (tmp, final) in its
      ``WriterCommitMessage``; nothing is visible mid-job;
    * ``commit()`` runs on the DRIVER only after every task succeeded:
      under overwrite it first clears stale committed files, then
      atomically renames the winning attempts into place; ``abort()``
      deletes every temp file under the path (including orphans from
      attempts that died mid-write and never returned a message);
    * final filenames embed a per-job id (``part-<pid>-<jobid>.jsonl``)
      so ``mode("append")`` ACCUMULATES across jobs instead of renaming
      over a previous job's same-named partitions — two appends of the
      same DataFrame yield twice the rows, like a Hadoop committer.

    Rows are serialized with sorted keys so output bytes are a pure
    function of the data, partition by partition."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> "JsonlDirWriter":
        return JsonlDirWriter(self.options, overwrite)


class JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False) -> None:
        import uuid

        self.path = options["path"]
        self.overwrite = overwrite
        # Generated ONCE on the driver and serialized to every task:
        # the job id in the final filename is what makes append-mode
        # safe — job N+1 renames to different names than job N, so
        # append accumulates partitions instead of clobbering them
        # (round-3 ADVICE: same-named finals silently replaced earlier
        # committed partitions).
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, iterator) -> WriterCommitMessage:
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"part-{pid:05d}-{self.job_id}-{attempt}.jsonl.tmp"
        )
        final = os.path.join(self.path, f"part-{pid:05d}-{self.job_id}.jsonl")
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
        return _JsonlCommit(tmp, final)

    def commit(self, messages) -> None:
        import glob
        import os

        winners = {m.final_file for m in messages if m is not None}
        if self.overwrite:
            # honor mode("overwrite"): stale committed files from earlier
            # jobs (possibly with MORE partitions) must not survive, or a
            # re-read mixes old and new rows
            for old in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if old not in winners:
                    os.remove(old)
        for m in messages:
            if m is not None:
                os.replace(m.tmp_file, m.final_file)
        # losing speculative attempts returned no message; their temps
        # are swept here so a committed directory holds only .jsonl
        for stale in glob.glob(os.path.join(self.path, "*.jsonl.tmp")):
            os.remove(stale)

    def abort(self, messages) -> None:
        import glob
        import os

        # messages only cover attempts that RETURNED; an attempt that
        # died mid-write leaves an orphan .tmp — sweep them all (temps
        # under this path belong to this sink's jobs by construction)
        for stale in glob.glob(os.path.join(self.path, "*.jsonl.tmp")):
            if os.path.exists(stale):
                os.remove(stale)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_file: str, final_file: str) -> None:
        self.tmp_file = tmp_file
        self.final_file = final_file


def register_jsonl_sink(spark) -> None:
    """Idempotent registration (re-registering the same name is allowed)."""
    spark.dataSource.register(JsonlDirDataSource)
