"""Local replica of the driver's correctness pass WITH per-query timing.

Runs every registry query on Spark and (when present) its DuckDB oracle,
compares rows / schema / order-insensitive values, and prints per-query
wall time so slow entries can be found before a budget-capped driver
truncates the pass (round 1 stopped at exactly 50/61 entries).

Usage: python tools/correctness_probe.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")

from python_darima_spark.queries import registry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--exclude=")]
    excl: set[str] = set()
    for a in sys.argv[1:]:
        if a.startswith("--exclude="):
            excl |= set(a.split("=", 1)[1].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from python_darima_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark()
    print(f"[probe] spark up in {time.perf_counter() - t0:.1f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from tests.test_oracle_parity import assert_query_matches

    results: dict[str, dict] = {}
    total0 = time.perf_counter()
    for name, spec in registry().items():
        if (only and name not in only) or name in excl:
            continue
        q0 = time.perf_counter()
        status = "pass"
        err = None
        try:
            if spec.oracle:
                assert_query_matches(spark, con, name, spec, sf_dir)
            else:
                df = spec.fn(spark, sf_dir)
                assert df.count() >= 0 and len(df.schema.fields) > 0
                status = "rows_only"
        except Exception as e:  # noqa: BLE001
            status = "FAIL"
            err = f"{type(e).__name__}: {e}"[:200]
        wall = time.perf_counter() - q0
        results[name] = {"status": status, "wall_s": round(wall, 2), "err": err}
        print(f"{name:28s} {status:9s} {wall:6.2f}s" + (f"  {err}" if err else ""), flush=True)

    total = time.perf_counter() - total0
    fails = [n for n, r in results.items() if r["status"] == "FAIL"]
    print(f"\n[probe] {len(results)} queries in {total:.1f}s; FAIL={fails}")
    slow = sorted(results.items(), key=lambda kv: -kv[1]["wall_s"])[:8]
    print("[probe] slowest:", ", ".join(f"{n}={r['wall_s']}s" for n, r in slow))
    with open("/tmp/probe_results.json", "w") as f:
        json.dump({"total_s": total, "results": results}, f, indent=1)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
