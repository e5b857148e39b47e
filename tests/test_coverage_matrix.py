"""COVERAGE.json stays truthful and current (round-9 VERDICT ask #5):
the checked-in matrix must equal a fresh regeneration, every registry
entry must be driver-green in some recorded round, and the rows-only
set must match the declared non-SQL domain entries, each with a
hash-certified twin that is itself green."""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from coverage_matrix import build_matrix  # noqa: E402


@pytest.fixture(scope="module")
def fresh():
    return build_matrix()


def test_checked_in_matrix_is_current(fresh):
    path = os.path.join(REPO, "COVERAGE.json")
    assert os.path.exists(path), "run python tools/coverage_matrix.py"
    checked_in = json.load(open(path))
    assert checked_in == fresh, (
        "COVERAGE.json drifted from the registry/artifacts — "
        "regenerate with python tools/coverage_matrix.py"
    )


def test_every_entry_is_driver_green(fresh):
    s = fresh["summary"]
    pending = set(s["pending_first_driver_round"])
    missing = [
        name
        for name, e in fresh["entries"].items()
        if not e["latest_green_round"] and name not in pending
    ]
    assert missing == [], (
        f"entries RECORDED by the driver but never green: {missing}"
    )
    assert s["driver_green_union"] + len(pending) == s["entries_total"]


def test_rows_only_set_is_declared_and_twinned(fresh):
    rows_only = {
        name
        for name, e in fresh["entries"].items()
        if e["oracle"] == "rows_only"
    }
    declared = {
        "q_embed_pca",
        "q_ts_backtest_arima",
        "q_ts_fit_combine",
        "q_ts_fit_combine_dlsa",
        "q_ts_fit_reference_bounds",
        "q_ts_fitted",
        "q_ts_forecast",
        "q_ts_holtwinters",
        "q_ts_many_series",
    }
    assert rows_only == declared
    for name in sorted(rows_only):
        twin = fresh["entries"][name].get("hash_twin")
        assert twin, f"{name} lacks a hash-certified twin"
        twin_e = fresh["entries"][twin]
        assert twin_e["oracle"] != "rows_only"
        assert twin_e["latest_green_round"], f"twin {twin} not green"


def test_entry_count_matches_driver_contract(fresh):
    import __spark_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    assert len(fresh["entries"]) == len(qs)
    n_sql = sum(
        1 for v in fresh["entries"].values() if v["oracle"] != "rows_only"
    )
    assert n_sql == len(oq)
