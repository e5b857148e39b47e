"""Relational / time-series / data-pipeline operators (DataFrame-native)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str, fractional: bool = False) -> Column:
    """Timestamp → epoch seconds, portable across timestamp flavors.

    Spark ≥4.1 reads parquet ``isAdjustedToUTC=false`` timestamps (all of
    this repo's testdata) as TIMESTAMP_NTZ, which has NO direct numeric
    cast (``CAST(ntz AS BIGINT)`` is DATATYPE_MISMATCH). Routing through
    TIMESTAMP first is identity under the engine's pinned UTC session
    timezone (session.py) and keeps the whole expression JVM-side inside
    whole-stage codegen.
    """
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("timestamp").cast("double" if fractional else "long")


def shuffle_width(sess) -> int:
    """The session's shuffle width as an int, robust to non-numeric conf.

    ``spark.sql.shuffle.partitions`` may be set to ``"auto"`` on
    AQE-managed deployments; a bare ``int()`` on that value raises at
    plan-build time (round-6 ADVICE). Fall back to the cluster's default
    parallelism, which is what AQE's coalescing floor tracks anyway."""
    try:
        return int(sess.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return sess.sparkContext.defaultParallelism


def fan_out(df: DataFrame, *key_cols: str) -> DataFrame:
    """Hash-repartition ``df`` on ``key_cols`` before a CPU-dense kernel.

    Two jobs in one shuffle:

    * **Parallelism floor.** A parquet file is splittable only at row-group
      boundaries, so a compact input (one row group) scans as ONE partition
      and every per-row kernel downstream of it (shingling, hashing, regex,
      embedding math) runs on one core. Repartitioning to
      ``spark.sql.shuffle.partitions`` restores full-cluster parallelism.
    * **Agg/join co-location.** Keying the shuffle on the downstream
      group-by/join key means Catalyst reuses this partitioning and the
      later ``groupBy(key)`` needs no second exchange.

    At 100 TB the input already has thousands of splits, and this exchange
    is the same one the keyed aggregation would have paid anyway — it moves
    the shuffle BEFORE the row-expanding kernel (shingles explode ~300× the
    input rows; shuffling raw docs is 300× cheaper than shuffling shingles).

    Use this ONLY when a keyed exchange follows (groupBy/join on
    ``key_cols``); for map-only plans use :func:`ensure_parallelism`,
    which shuffles only when the scan is actually under-partitioned.

    The partition count is PINNED to the session's shuffle width (r11):
    a bare ``repartition(cols)`` is REPARTITION_BY_COL, which AQE's
    byte-based coalescing may legally collapse — and every fan_out call
    site marks a spot where a row-expanding or Python-CPU-dense kernel
    follows, i.e. exactly where shuffle BYTES are the wrong signal for
    width (measured: the resample rewrite's 7.5 kB-scale packed
    aggregate coalesced to ~3 partitions and the downstream ARIMA fit
    ran 9× slower). REPARTITION_BY_NUM is exempt from coalescing, and
    the width still tracks ``spark.sql.shuffle.partitions``, so it is
    conf-scaled on a cluster, not a local constant.
    """
    return df.repartition(shuffle_width(df.sparkSession), *key_cols)


def ensure_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition a MAP-ONLY plan iff the scan under-partitions it.

    A compact parquet input scans as few partitions (often 1), starving a
    per-row kernel; but an unconditional repartition on a map-only query
    is pure added shuffle once the input has enough splits (there is no
    downstream keyed exchange to reuse it — at 100 TB the scan has
    thousands of splits and this is a no-op). ``target`` defaults to
    ``spark.sql.shuffle.partitions``."""
    sess = df.sparkSession
    tgt = target or shuffle_width(sess)
    if df.rdd.getNumPartitions() < tgt:
        return df.repartition(tgt)
    return df


def source_mixture_rates(
    df: DataFrame, group_col: str, weight: Column
) -> DataFrame:
    """Per-group keep rates that hit a TARGET mixture by downsampling:
    ``rate(g) = min(1, (w_g / Σw) · total / count_g)`` — groups whose
    observed share already exceeds their target share get a fractional
    rate, the rest keep everything. Returns ``(group_col, _rate)``,
    dim-sized: one tiny aggregate + a 1-row cross join, meant to be
    ``broadcast()`` back onto a map-only keep filter (e.g.
    ``hash_split_bucket(id) < _rate * 256``). Shared by
    q_mixture_sample and the example curation pipeline."""
    stats = (
        df.groupBy(group_col)
        .agg(F.count("*").cast("double").alias("_cnt"))
        .withColumn("_w", weight.cast("double"))
    )
    tot = stats.agg(F.sum("_cnt").alias("_tot"), F.sum("_w").alias("_wsum"))
    return stats.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.least(
            F.lit(1.0),
            (F.col("_w") / F.col("_wsum") * F.col("_tot")) / F.col("_cnt"),
        ).alias("_rate"),
    )


def planted_source_weight(source_col: str = "source") -> Column:
    """The fixture's PLANTED mixture-weight expression (source ``srcK``
    gets weight K%4+1) — one definition shared by q_mixture_sample and
    the example pipeline so the planted scenario can't silently
    desynchronize (the DuckDB oracle and tests restate it as
    ``CAST(substr(source, 4) AS INT) % 4 + 1``)."""
    return F.pmod(F.substring(source_col, 4, 10).cast("int"), F.lit(4)) + 1
