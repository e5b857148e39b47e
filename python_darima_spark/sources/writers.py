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


def zorder_key(x_col: str, y_col: str, x_bounds, y_bounds, bits: int = 6):
    """Morton (Z-order) key for two numeric columns: each value maps to
    its ``bits``-bit QUANTILE RANK (count of precomputed boundaries ≤
    value — an O(2^bits) JVM fold, no UDF), then the two ranks' bits
    interleave with shift/mask terms unrolled at plan build time (shift
    amounts must be literals).

    Rank-based scaling, not min/max: a linear scale collapses under
    skew (one outlier compresses the mass into a few ranks — measured
    on the events fixture, where value spans 0..490 with the mass below
    20, linear scaling made Z-order WORSE than a plain sort), which is
    why production Z-order implementations cluster by range-partition
    rank. Boundaries arrive as parameters (one approx_percentile agg
    upstream) so the key expression stays deterministic and
    codegen-able."""
    from pyspark.sql import functions as F

    def _rank(col: str, bounds) -> object:
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc
            + F.when(F.col(col).cast("double") >= b, 1).otherwise(0),
        ).cast("long")

    xr, yr = _rank(x_col, x_bounds), _rank(y_col, y_bounds)
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xr, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        terms.append(
            F.shiftleft(F.shiftright(yr, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    key = terms[0]
    for t in terms[1:]:
        key = key + t
    return key


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    num_files: int = 8,
    bits: int = 6,
    mode: str = "overwrite",
) -> None:
    """Re-layout ``df`` by Z-order over (x_col, y_col) — the
    Delta/Iceberg OPTIMIZE ZORDER layout in plain Spark primitives: one
    approx_percentile agg for per-column quantile boundaries,
    range-partition on the Morton key into ``num_files`` tasks, sort
    within each, write parquet.

    What it buys (quantified in tests/test_sinks.py): a single-column
    sort gives perfect min/max skipping on its key and NONE on any
    other column; Z-order trades some of the key's skipping for useful
    skipping on BOTH — on the mixed workload (user-only, value-only,
    box predicates) the Morton layout leaves ~half the candidate files
    of the single-key sort, with the value-only cases (where the plain
    sort reads everything) cut by ≥ 2×."""
    from pyspark.sql import functions as F

    nq = 1 << bits
    qs = ",".join(str(i / nq) for i in range(1, nq))
    b = df.agg(
        F.expr(f"approx_percentile({x_col}, array({qs}), 2000)").alias("xb"),
        F.expr(f"approx_percentile({y_col}, array({qs}), 2000)").alias("yb"),
    ).first()
    key = zorder_key(x_col, y_col, b["xb"], b["yb"], bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
