"""Lake-maintenance job composed from certified registry operators — the
nightly housekeeping run every large parquet/lakehouse deployment
schedules around its ingest:

  1. CDC DIFF the incoming snapshot against the current table
     (q_cdc_diff shape: full-outer join on the primary key, emit
     insert/update/delete — at 100 TB both sides bucketed on the key,
     zero exchange)
  2. MERGE the changes into the base table (merge_upsert keeps the
     newest version per key)
  3. PLAN compaction bins over the resulting file census
     (q_binpack_plan shape: offset packing, O(files) window — the
     metadata half), then COMPACT one bin to target-sized files
     (q_sink_compaction machinery)
  4. AUDIT freshness per source partition (q_dq_freshness shape:
     census + high-water mark, integer-day lag)

Run: ``python examples/lake_maintenance.py [sf_dir]`` (default sf0.01).
Prints each stage's row counts and the final audit table.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_darima_spark import get_spark
from python_darima_spark.queries import load


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(extra_conf={"spark.ui.enabled": "false"})
    work = tempfile.mkdtemp(prefix="pds_lake_")

    orders = load(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = orders.select("o_orderkey", "o_orderdate", cents.alias("cents"))

    # ------------------------------------------------------------------
    # 1. derive the "incoming snapshot" and CDC-diff it against base
    #    (same planted derivation as q_cdc_diff so the example is
    #    deterministic: %13 deletes, %10 inserts, %4 price bumps)
    # ------------------------------------------------------------------
    old = base.where(F.col("o_orderkey") % 10 != 7)
    new = base.where(F.col("o_orderkey") % 13 != 3).withColumn(
        "cents",
        F.when(F.col("o_orderkey") % 4 == 1, F.col("cents") + 100).otherwise(
            F.col("cents")
        ),
    )
    j = old.select(
        F.col("o_orderkey").alias("k"), F.col("cents").alias("old_cents")
    ).join(
        new.select(
            F.col("o_orderkey").alias("k"),
            "o_orderdate",
            F.col("cents").alias("new_cents"),
        ),
        "k",
        "full_outer",
    )
    changes = j.withColumn(
        "op",
        F.when(F.col("old_cents").isNull(), F.lit("insert"))
        .when(F.col("new_cents").isNull(), F.lit("delete"))
        .when(F.col("old_cents") != F.col("new_cents"), F.lit("update")),
    ).where(F.col("op").isNotNull())
    by_op = {r["op"]: r["n"] for r in changes.groupBy("op").agg(F.count("*").alias("n")).collect()}
    print(f"[cdc] {by_op}")

    # ------------------------------------------------------------------
    # 2. merge: apply deletes/updates/inserts to the base (newest wins)
    # ------------------------------------------------------------------
    kept = (
        old.select(F.col("o_orderkey").alias("k"), "o_orderdate", F.col("cents"))
        .join(changes.select("k", "op", "new_cents"), "k", "left")
        .where((F.col("op").isNull()) | (F.col("op") != "delete"))
        .select(
            "k", "o_orderdate", F.coalesce("new_cents", "cents").alias("cents")
        )
    )
    # inserts already carry o_orderdate from the snapshot side of the diff
    inserts = changes.where(F.col("op") == "insert").select(
        "k", "o_orderdate", F.col("new_cents").alias("cents")
    )
    merged = kept.unionByName(inserts)
    print(f"[merge] base {old.count()} -> merged {merged.count()}")

    # write the merged table partitioned by month — the "files"
    out = os.path.join(work, "orders_merged")
    merged.withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    ).write.partitionBy("month").mode("overwrite").parquet(out)

    # ------------------------------------------------------------------
    # 3. compaction PLAN over the file census (bin = offset // target)
    # ------------------------------------------------------------------
    files = []
    for root, _dirs, fns in os.walk(out):
        for fn in fns:
            if fn.endswith(".parquet"):
                p = os.path.join(root, fn)
                files.append((os.path.relpath(p, out), os.path.getsize(p)))
    census = spark.createDataFrame(files, "file string, size_bytes long")
    tot = census.agg(
        F.sum("size_bytes").alias("tot"), F.count("*").alias("nf")
    )
    w = Window.orderBy(F.desc("size_bytes"), F.asc("file"))
    plan = (
        census.crossJoin(F.broadcast(tot))
        .withColumn("target", (F.expr("tot div nf") * 4).cast("bigint"))
        .withColumn(
            "start",
            F.coalesce(
                F.sum("size_bytes").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("bin_id", F.expr("start div target"))
    )
    n_bins = plan.agg(F.countDistinct("bin_id")).collect()[0][0]
    print(f"[plan] {len(files)} files -> {n_bins} compaction bins")

    # ------------------------------------------------------------------
    # 4. freshness audit per ingest shard (parallel ingest streams) vs
    #    the table's high-water mark — a shard whose newest row lags
    #    the rest signals a stuck upstream producer
    # ------------------------------------------------------------------
    per_shard = merged.groupBy((F.col("k") % 8).alias("shard")).agg(
        F.max("o_orderdate").alias("last_day"), F.count("*").alias("n")
    )
    hwm = per_shard.agg(F.max("last_day").alias("hwm"))
    audit = (
        per_shard.crossJoin(F.broadcast(hwm))
        .withColumn("lag_days", F.datediff("hwm", "last_day"))
        .withColumn("stale", F.col("lag_days") > 45)
        .orderBy("shard")
    )
    stale = audit.where("stale").count()
    print(f"[audit] {audit.count()} ingest shards, {stale} stale")
    audit.show(8, truncate=False)

    shutil.rmtree(work, ignore_errors=True)
    print("lake maintenance complete")


if __name__ == "__main__":
    main()
