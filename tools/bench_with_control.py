"""Compose BENCH_LOCAL_r{N}.json with a self-certifying CONTROL block.

Round-8's 1.47× in-suite "regression" was defused only because the
builder improvised a same-day control (the UNCHANGED round-7 code
re-benched on the same host measured the same inflation). This tool
makes that control a standard artifact (round-8 VERDICT ask #2): the
output JSON carries, next to the headline suite,

* ``control.current``  — a fixed ~10-query probe set, current tree,
  fresh process;
* ``control.previous`` — the SAME probe set run by the PREVIOUS
  round's code (git worktree at ``--control-commit``), same host,
  same day, same runner;
* ``control.streaming_isolated`` — each streaming entry in its own
  fresh process (in-suite streaming walls are inflated ~2× by
  long-session accumulation, PLANS.md §2.25).

Cross-round claims then divide by the probe-set ratio instead of
trusting absolute walls from different host conditions.

Usage:
  python tools/bench_with_control.py --round 9 \
      --control-commit <prev-round-sha> [--sf /root/testdata/sf0.1] \
      [--skip-suite]
Writes BENCH_LOCAL_r{round}.json in the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Fixed cross-round probe set: one entry per major family, all present
# since round 7 at the latest, cheap enough to run 3 reps each. DO NOT
# EDIT casually — stability across rounds is the point.
PROBE_SET = [
    "q_agg_hash",
    "q_join_inner",
    "q_window_frame",
    "q_ts_resample",
    "q_ts_many_series",
    "q_ts_fit_combine",
    "q_dedup_near",
    "q_sim_topk",
    "q_curation_pipeline",
    "q_text_bm25",
]

# Extension set (round-9 VERDICT asks #1): a sink, a sketch, and the
# ledger-backed index append — the three families whose in-suite
# "regressions" needed manual noise adjudication in rounds 8-9. Run
# against BOTH trees alongside the core set (kept stable) so the
# adjudication is automatic from round 10 on.
PROBE_SET_EXT = [
    "q_dedup_index_append",
    "q_sink_dynamic_overwrite",
    "q_sketch_countmin",
]

# streaming entries measured one-per-process (fresh session each) —
# every q_stream_* the headline suite times, plus the TWS family
STREAMING_ISOLATED = [
    "q_stream_tumble",
    "q_stream_anomaly",
    "q_stream_watermark_late",
    "q_stream_anomaly_tws",
    "q_stream_session_tws",
    "q_stream_dedup_near",
]


def _run_probe_set(tree: str, sf: str, names: list[str]) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "bench_probe_set.py"),
            "--sf",
            sf,
            *names,
        ],
        env=env,
        cwd="/tmp",  # NOT the repo: PYTHONPATH alone selects the tree
        capture_output=True,
        text=True,
        timeout=1800,
    )
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        raise RuntimeError(f"probe set failed in {tree}: {proc.stderr[-500:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--control-commit", required=True)
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument(
        "--sf1-dir",
        default=os.path.join(REPO, ".scaledata", "sf1"),
        help="10x-replicated sf1 dir for the control_sf1 block ('' to skip)",
    )
    p.add_argument(
        "--skip-suite",
        action="store_true",
        help="reuse the suite block from an existing BENCH_LOCAL file",
    )
    a = p.parse_args()
    out_path = os.path.join(REPO, f"BENCH_LOCAL_r{a.round}.json")

    # 1. headline suite (bench.py prints ONE JSON line on stdout)
    if a.skip_suite and os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    else:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=a.sf)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=7200,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            raise RuntimeError(f"bench.py failed: {proc.stderr[-500:]}")
        doc = json.loads(proc.stdout.strip().splitlines()[-1])
        # bench.py's stdout is now the driver-shaped COMPACT summary
        # (round-9 VERDICT ask #8); the medians/reps/loadavg detail is
        # in the sidecar — fold it back in for the local artifact
        detail_path = os.path.join(REPO, "bench_detail_last.json")
        if os.path.exists(detail_path):
            with open(detail_path) as f:
                detail = json.load(f)
            if detail.get("queries") == doc.get("queries"):
                doc = {**detail, **doc}

    # 2. control: current tree, fresh process (core + extension set)
    cur = _run_probe_set(REPO, a.sf, PROBE_SET + PROBE_SET_EXT)

    # 3. control: previous round's code in a worktree
    wt = os.path.join(REPO, ".bench_control", f"r{a.round - 1}")
    if not os.path.exists(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, a.control_commit],
            cwd=REPO,
            check=True,
        )
    prev = _run_probe_set(wt, a.sf, PROBE_SET + PROBE_SET_EXT)

    # 4. streaming entries isolated, one fresh process each
    iso: dict[str, float] = {}
    for name in STREAMING_ISOLATED:
        res = _run_probe_set(REPO, a.sf, [name])
        iso.update(res["queries"])

    def _ratios(c: dict, p: dict) -> dict:
        return {
            n: round(c["queries"][n] / p["queries"][n], 3)
            for n in c.get("queries", {})
            if p.get("queries", {}).get(n)
        }

    doc["control"] = {
        "probe_set": PROBE_SET,
        "probe_set_ext": PROBE_SET_EXT,
        "control_commit": a.control_commit,
        "current": cur,
        "previous": prev,
        "current_over_previous": _ratios(cur, prev),
        "streaming_isolated": iso,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": (
            "same host, same day, same runner; cross-round claims "
            "should divide by current_over_previous rather than trust "
            "absolute walls; streaming_isolated are fresh-session "
            "walls (in-suite streaming numbers accumulate ~2x, "
            "PLANS.md 2.25)"
        ),
    }

    # 5. sf1 control (round-9 VERDICT ask #1): the same two trees on
    # the 10x-replicated sf1 derivation, core + extension set — the
    # block that adjudicates sf1 round-over-round signals (r9's
    # q_dedup_index_append doubling had no same-host sf1 control)
    if a.sf1_dir and os.path.isdir(a.sf1_dir):
        cur1 = _run_probe_set(REPO, a.sf1_dir, PROBE_SET + PROBE_SET_EXT)
        prev1 = _run_probe_set(wt, a.sf1_dir, PROBE_SET + PROBE_SET_EXT)
        doc["control_sf1"] = {
            "sf_dir": a.sf1_dir,
            "current": cur1,
            "previous": prev1,
            "current_over_previous": _ratios(cur1, prev1),
            "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
    elif a.sf1_dir:
        doc["control_sf1"] = {
            "skipped": f"{a.sf1_dir} absent — run tools/scale_probe.py --build-only"
        }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
