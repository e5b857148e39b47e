"""sf1 PLANTED-PAIR oracle for the quadratic-oracle queries (round-5
verdict ask #6): the 8 queries whose DuckDB restatement is all-pairs (or
a fully unrolled iterative CTE) are too expensive to oracle at sf1, so
PROBE_SF1 skipped them — green at three smaller SFs, unchecked at the
scale the probe exists for. This closes that gap WITHOUT the quadratic
oracle, using the replica's construction as the plant:

``.scaledata/sf1`` is 10 key-shifted copies of sf0.1; copy k>0 documents
are alphabet-ROTATED (a character bijection), which maps each copy's
shingle sets bijectively — so within-copy Jaccard/containment is
EXACTLY preserved, and the graph/key tables form 10 disjoint isomorphic
components. Hence, for each query, the sf1 result RESTRICTED TO COPY-0
IDS must equal the sf0.1 result exactly (copy-0 text and keys are
byte-identical, the operators are exact-verifying, and cross-copy
interference is impossible by construction: cross-copy ids are larger,
so a copy-0 doc is never the dropped side of a cross-copy pair, and the
graph components are disjoint). PageRank needs one algebraic twist: a
10-component union gives each copy 1/10 of the rank mass, but the
query's ``rank × n`` output cancels it exactly, so copy-0 rows still
match (compared at 2e-6 to absorb the ×10/÷10 float round trip).

Usage: python tools/planted_sf1_check.py [names...] → PLANTED_SF1.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scaledata", "sf1",
)

# per-query: (id columns to restrict/shift, float columns compared with
# tolerance). Restriction: every id column < its table period; shifted
# ids don't need unshifting because copy 0 keeps original keys.
CHECKS: dict[str, dict] = {
    "q_dedup_near": {"ids": ["id_a", "id_b"], "period": "documents"},
    "q_dedup_simhash": {"ids": ["id_a", "id_b"], "period": "documents"},
    "q_dedup_containment": {"ids": ["id_a", "id_b"], "period": "documents"},
    "q_stream_dedup_near": {"ids": ["id_a", "id_b"], "period": "documents"},
    "q_doc_dedup_pipeline": {"ids": ["doc_id"], "period": "documents"},
    "q_curation_pipeline": {"ids": ["doc_id"], "period": "documents"},
    "q_graph_bfs": {"ids": ["node"], "period": "graph"},
    "q_graph_pagerank": {
        "ids": ["node"],
        "period": "graph",
        "tol": {"rank_x_n": 2e-6},
    },
    # SemDeDup: anchors are a pure function of vector VALUES (unchanged
    # across replica copies), copy-0 ids are the smallest ids at every
    # level (originals < V ≤ copy-k originals; copy-0 twins at
    # OFFSET+[0,V) < copy-k twins), and every cross-copy candidate is a
    # value-duplicate of a copy-0 candidate — so copy-0 rows (cid, kept,
    # dup_of included) must equal the sf0.1 run exactly. dup_of is NULL
    # for kept rows; filled to -1 so the exact set-compare can't be
    # poisoned by NaN≠NaN.
    "q_dedup_semantic": {
        "ids": ["vec_id"],
        "period": "embeddings_twin",
        "fillna": {"dup_of": -1},
    },
    # the fixed-k codebook twin shares q_dedup_semantic's planted
    # argument verbatim: the coarse codebook and sub-anchors are pure
    # functions of vector VALUES (unchanged across replica copies), and
    # copy-0 ids are the smallest at every level.
    "q_dedup_semantic_codebook": {
        "ids": ["vec_id"],
        "period": "embeddings_twin",
        "fillna": {"dup_of": -1},
    },
    # the THREE-level fixed-k variant: same argument again — mid and
    # leaf anchors are the k digest-smallest distinct originals of
    # their parent cell, all pure functions of vector values.
    "q_dedup_semantic_codebook3": {
        "ids": ["vec_id"],
        "period": "embeddings_twin",
        "fillna": {"dup_of": -1},
    },
}

_PART_OFFSET = 1_000_000
# imported, not re-declared: a drifted copy would silently misclassify
# twins in the copy-0 mask and degrade the planted gate instead of
# failing it (round-8 ADVICE)
from python_darima_spark.queries.llm_data import _SEM_TWIN_OFFSET  # noqa: E402


def _periods() -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    d = con.execute(
        f"SELECT max(doc_id) FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0] + 1
    s = con.execute(
        f"SELECT max(s_suppkey) FROM read_parquet('{SRC}/supplier.parquet')"
    ).fetchone()[0] + 1
    p = con.execute(
        f"SELECT max(p_partkey) FROM read_parquet('{SRC}/part.parquet')"
    ).fetchone()[0] + 1
    v = con.execute(
        f"SELECT max(vec_id) FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0] + 1
    return {"documents": d, "supplier": s, "part": p, "embeddings": v}


def _copy0_mask(pdf, ids, period, periods):
    import numpy as np

    mask = None
    for c in ids:
        if period == "graph":
            # node < PART_OFFSET → supplier id, else part id + offset
            m = np.where(
                pdf[c] < _PART_OFFSET,
                pdf[c] < periods["supplier"],
                (pdf[c] - _PART_OFFSET) < periods["part"],
            )
        elif period == "embeddings_twin":
            # copy-0 = originals below the vec_id period, plus copy-0
            # TWINS at _SEM_TWIN_OFFSET + [0, period)
            off = _SEM_TWIN_OFFSET
            m = (
                (pdf[c] < periods["embeddings"])
                | ((pdf[c] >= off) & (pdf[c] - off < periods["embeddings"]))
            ).to_numpy()
        else:
            m = (pdf[c] < periods[period]).to_numpy()
        mask = m if mask is None else (mask & m)
    return mask


def _diff(base, big0, tol):
    """(missing, extra) example tuples after key-matched comparison.

    Float columns named in ``tol`` are compared ``|a−b| <= tol[c]`` after
    matching rows on the exact (non-float) columns — NOT by rounding to a
    fixed decimal grid and set-comparing, which the round-6 ADVICE
    correctly called out as neither the stated tolerance nor a reliable
    equality (two in-tolerance values straddling a grid boundary round
    apart; values up to a full quantum apart round together)."""
    cols = sorted(base.columns)
    keys = [c for c in cols if c not in tol]
    fl = [c for c in cols if c in tol]
    if not fl:
        want = set(map(tuple, base[cols].itertuples(index=False, name=None)))
        got = set(map(tuple, big0[cols].itertuples(index=False, name=None)))
        return sorted(want - got), sorted(got - want)
    # the non-float columns must uniquely key each row — duplicate keys
    # would cross-match in the outer merge and inflate 'both', silently
    # weakening the gate (round-7 ADVICE)
    for side, df in (("base", base), ("big", big0)):
        dup = df.duplicated(subset=keys)
        if dup.any():
            raise ValueError(
                f"planted check keys {keys} not unique on {side}: e.g. "
                f"{df.loc[dup, keys].iloc[0].to_dict()}"
            )
    m = base[cols].merge(
        big0[cols], on=keys, how="outer", indicator=True,
        suffixes=("_a", "_b"),
    )
    missing = [
        tuple(r) for r in
        m.loc[m["_merge"] == "left_only", keys].itertuples(index=False)
    ]
    extra = [
        tuple(r) for r in
        m.loc[m["_merge"] == "right_only", keys].itertuples(index=False)
    ]
    both = m[m["_merge"] == "both"]
    bad = None
    for c in fl:
        a, b = both[f"{c}_a"], both[f"{c}_b"]
        # a NaN on EITHER side is a mismatch: (NaN−NaN) > tol is False,
        # so a query regressing to NaN on both artifacts would otherwise
        # read as a match (round-7 ADVICE)
        nan_bad = a.isna() | b.isna()
        val_bad = (a - b).abs() > tol[c]
        col_bad = nan_bad | val_bad
        bad = col_bad if bad is None else (bad | col_bad)
    if bad is not None and bad.any():
        for r in both.loc[bad, keys].itertuples(index=False):
            missing.append(tuple(r))
            extra.append(tuple(r))
    return sorted(missing), sorted(extra)


def main() -> None:
    from python_darima_spark.queries import registry
    from python_darima_spark.session import get_spark

    names = [a for a in sys.argv[1:] if not a.startswith("--")] or list(
        CHECKS
    )
    periods = _periods()
    spark = get_spark()
    reg = registry()
    results: dict[str, dict] = {}
    for name in names:
        spec, cfg = reg.get(name), CHECKS.get(name)
        if spec is None or cfg is None:
            print(f"[planted] {name}: no check configured, skipped")
            continue
        t0 = time.perf_counter()
        base = spec.fn(spark, SRC).toPandas()
        big = spec.fn(spark, OUT).toPandas()
        tol = cfg.get("tol", {})
        for col, fill in cfg.get("fillna", {}).items():
            base[col] = base[col].fillna(fill)
            big[col] = big[col].fillna(fill)
        mask = _copy0_mask(big, cfg["ids"], cfg["period"], periods)
        big0 = big[mask]
        missing, extra = _diff(base, big0, tol)
        row = {
            "sf01_rows": len(base),
            "sf1_rows": len(big),
            "sf1_copy0_rows": len(big0),
            "missing_from_sf1": len(missing),
            "extra_in_sf1_copy0": len(extra),
            "ok": not missing and not extra,
            "sec": round(time.perf_counter() - t0, 1),
        }
        results[name] = row
        print(
            f"{name:24s} {'OK ' if row['ok'] else 'DIFF'} "
            f"base={len(base)} copy0={len(big0)} "
            f"missing={len(missing)} extra={len(extra)} "
            f"({row['sec']}s)",
            flush=True,
        )
        if missing:
            print(f"  e.g. missing: {sorted(missing)[:3]}")
        if extra:
            print(f"  e.g. extra:   {sorted(extra)[:3]}")
    path = "PLANTED_SF1.json"
    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)
    print(f"[planted] {sum(r['ok'] for r in results.values())}/"
          f"{len(results)} ok → {path}")
    spark.stop()


if __name__ == "__main__":
    main()
