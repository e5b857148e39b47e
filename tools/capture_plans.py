"""Capture .explain("formatted") for named registry queries to files.

Usage:
  python tools/capture_plans.py --out plans/r10 --suffix _before.txt \
      [--sf DIR] name [name ...]

Driver-only (no job execution): builds each query's DataFrame and writes
its formatted physical plan (initial AQE plan) to <out>/<name><suffix>.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--out", default="plans/r10")
    p.add_argument("--suffix", default="_before.txt")
    p.add_argument("names", nargs="+")
    a = p.parse_args()

    from python_darima_spark import get_spark
    from python_darima_spark.queries import registry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="pds-capture-plans",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    reg = registry()
    os.makedirs(a.out, exist_ok=True)
    for name in a.names:
        spec = reg.get(name)
        if spec is None:
            print(f"  [plans] {name}: absent, skipped", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, a.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}"
        dest = os.path.join(a.out, f"{name}{a.suffix}")
        with open(dest, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"  [plans] {name}: {dest} (Exchange x{n_exch})", file=sys.stderr)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
