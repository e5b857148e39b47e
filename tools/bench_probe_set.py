"""Fixed-probe-set bench runner: one JSON line of warm-min walls.

The building block of the round-over-round bench CONTROL (round-8
VERDICT ask #2): the same ~10-query probe set is measured (a) by the
current tree, (b) by the PREVIOUS round's code checked out in a git
worktree (PYTHONPATH points there, this script stays in the current
tree), same host, same day — so cross-round comparisons carry their
own host calibration; and (c) one streaming entry at a time in a fresh
process, because streaming walls measured inside a 123-query session
are inflated ~2× by state-store/session accumulation (PLANS.md §2.25).

Usage:
  PYTHONPATH=<tree> python tools/bench_probe_set.py [--sf DIR]
      [--reps N] name [name ...]
Prints one JSON line: {"queries": {name: warm_min_sec},
"queries_reps": {...}, "loadavg": [...], "pythonpath": "..."}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("names", nargs="+")
    a = p.parse_args()

    from python_darima_spark import get_spark
    from python_darima_spark.queries import registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="pds-bench-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    reg = registry()
    # warmup mirrors bench.py: worker pool + page cache + write path
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()
    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{a.sf}/{tbl}.parquet").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass

    out: dict[str, float] = {}
    reps: dict[str, list[float]] = {}
    for name in a.names:
        spec = reg.get(name)
        if spec is None:
            print(f"  [probe-set] {name}: absent in this tree, skipped",
                  file=sys.stderr)
            continue
        ts: list[float] = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            spec.fn(spark, a.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        ts.sort()
        out[name] = round(ts[0], 3)
        reps[name] = [round(t, 3) for t in ts]
        print(f"  [probe-set] {name}: {out[name]:.2f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "queries": out,
                "queries_reps": reps,
                "loadavg": list(os.getloadavg()),
                "pythonpath": os.environ.get("PYTHONPATH", ""),
            }
        )
    )


if __name__ == "__main__":
    main()
