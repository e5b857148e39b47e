"""Sink operators (ref R31 generalized, SURVEY.md §2B q_sink_*).

The reference's only sink is a driver-side ``json.dump`` of the forecast
dict (/root/reference/darima.py:410-412). The engine's sinks are
executor-side ``DataFrameWriter`` paths with the two decisions that matter
at 100 TB made explicit:

* **Partition layout.** ``write_partitioned_parquet`` repartitions BY the
  partition columns before ``partitionBy`` — without that, every task
  holding rows of a partition writes its own file into that directory
  (tasks × partitions small files, the classic overwhelmed-listing
  failure); with it, each partition directory gets one file per owning
  task. Readers then prune whole directories on the partition predicate.
* **In-file clustering.** optional ``sort_cols`` →
  ``sortWithinPartitions``: parquet min/max page stats become selective,
  so point/range reads skip pages (the poor man's Z-order).

``write_bucketed_table`` persists hash-bucketed tables (Spark's native
bucketing): two tables bucketed on the same key with the same bucket
count join with ZERO exchange on either side — the co-location is paid
once at write time instead of per query (verified in
tests/test_sinks.py by asserting the joined plan has no Exchange).
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (ref R31 as a distributed write)."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed (optionally sorted) managed table.

    Overwrite is made robust to a FRESH session with a STALE warehouse:
    the default in-memory catalog forgets tables between sessions while
    their directories survive, and ``saveAsTable`` then fails with
    LOCATION_ALREADY_EXISTS — so drop both the catalog entry and any
    orphaned local directory first."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
        if wh.scheme in ("", "file") and wh.path:
            loc = os.path.join(wh.path, table.lower())
            if os.path.exists(loc):
                shutil.rmtree(loc)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
