"""Time a set of registry queries bench-style (warm min-of-N, noop sink,
clearCache between reps) in a fresh process.

Usage: python tools/time_queries.py [sf_dir] name [name ...]
Env: REPS (default 3), SPARK_GRAFT_CPUS (default all).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    reps = int(os.environ.get("REPS", "3"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from python_darima_spark import get_spark
    from python_darima_spark.queries import registry

    spark = get_spark(
        app_name="time-queries",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    reg = registry()
    # same warmup as bench.py
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{tbl}.parquet").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    out = {}
    for name in names:
        spec = reg[name]
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            spec.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(ts), "reps": ts}
        print(f"  {name}: min {min(ts):.2f}s reps {ts}", file=sys.stderr)
    print(json.dumps({"load": os.getloadavg(), "timings": out}))


if __name__ == "__main__":
    main()
