"""Round-5 extension batch: manual sketches (HLL, Count-Min), Bloom
semi-join, triangle counting, 2-D skyline, sequence patterns, rolling
COUNT DISTINCT, and reciprocal-rank fusion. Each query's DuckDB oracle
carries the cross-engine hash; these tests pin the SEMANTIC guarantees
(sketch bounds, no-false-negative, frontier definition, exactly-once
window membership) and the plan shapes the 100 TB posture relies on."""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from python_darima_spark.queries import load
from python_darima_spark.queries.graph import (
    q_graph_labelprop,
    q_graph_triangles,
)
from python_darima_spark.queries.joins import q_join_bloom
from python_darima_spark.queries.llm_data import (
    q_dedup_phash,
    q_multimodal_phash,
    q_rank_rrf,
    q_sample_weighted_pps,
)
from python_darima_spark.queries.relational import (
    q_event_sequence,
    q_ml_ols_multifeature,
    q_scan_corrupt,
    q_scan_text,
    q_sink_dynamic_overwrite,
    q_sketch_countmin,
    q_sketch_hll_manual,
    q_skyline,
    q_window_distinct_rolling,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- HyperLogLog ----------------------------------------------------------

def test_hll_estimate_within_error_band(spark, sf_dir):
    """m=64 → standard error 1.04/√64 = 13%; assert the estimate is
    within 4σ of exact (the fixture is a single draw, not an average)."""
    row = q_sketch_hll_manual(spark, sf_dir).collect()[0]
    est = row.hll_est_e3 / 1000.0
    assert row.n_exact > 0
    assert abs(est - row.n_exact) / row.n_exact < 4 * 0.13, (est, row.n_exact)


def test_hll_registers_merge_by_max(spark, sf_dir):
    """Mergeability — the property that makes the sketch shippable at
    100 TB: registers built on two disjoint halves of orders, merged by
    per-register max, must equal the whole-corpus registers (so the
    estimate is identical regardless of sharding)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.md5(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))).alias("h"),
    )
    x = F.conv(F.substring("h", 3, 8), 16, 10).cast("long")
    obs = o.select(
        "o_orderkey",
        (F.conv(F.substring("h", 1, 2), 16, 10).cast("long") % 64).alias("reg"),
        F.when(x == 0, F.lit(33)).otherwise(33 - F.length(F.bin(x))).alias("rho"),
    )
    whole = {
        r.reg: r.mx
        for r in obs.groupBy("reg").agg(F.max("rho").alias("mx")).collect()
    }
    halves = (
        obs.withColumn("shard", F.col("o_orderkey") % 2)
        .groupBy("shard", "reg")
        .agg(F.max("rho").alias("mx"))
        .groupBy("reg")
        .agg(F.max("mx").alias("mx"))
        .collect()
    )
    assert {r.reg: r.mx for r in halves} == whole


def test_hll_plan_no_python_no_cartesian(spark, sf_dir):
    plan = _plan(q_sketch_hll_manual(spark, sf_dir))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


# --- Count-Min ------------------------------------------------------------

def test_countmin_never_underestimates(spark, sf_dir):
    """The defining CM guarantee: est ≥ true for every probe key."""
    rows = q_sketch_countmin(spark, sf_dir).collect()
    assert rows, "probe set empty"
    for r in rows:
        assert r.cm_est >= r.true_cnt, (r.partkey, r.cm_est, r.true_cnt)


def test_countmin_probe_join_broadcast(spark, sf_dir):
    """The 1024-cell counter table must reach probes as a broadcast —
    a shuffled join on a ≤1024-row side would be a plan regression."""
    plan = _plan(q_sketch_countmin(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


# --- Bloom join -----------------------------------------------------------

def test_bloom_no_false_negatives_and_python_twin(spark, sf_dir):
    """n_pass ≥ n_true is Bloom's contract; recompute both sides from
    raw parquet with hashlib to prove the md5-position arithmetic, not
    just the Spark/DuckDB agreement."""
    row = q_join_bloom(spark, sf_dir).collect()[0]
    assert row.n_pass >= row.n_true
    assert row.n_false_pos == row.n_pass - row.n_true

    supp = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    ).toPandas()
    nk = int(supp.loc[supp.s_suppkey == 1, "s_nationkey"].iloc[0])
    build = set(supp.loc[supp.s_nationkey == nk, "s_suppkey"].astype(int))
    probe = set(
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey")
        .distinct()
        .toPandas()["l_suppkey"]
        .astype(int)
    )

    def pos(j: int, k: int) -> int:
        return int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:4], 16) % 1024

    bits = {pos(j, k) for k in build for j in range(3)}
    passed = {k for k in probe if all(pos(j, k) in bits for j in range(3))}
    assert row.n_probe == len(probe)
    assert row.n_pass == len(passed)
    assert row.n_true == len(probe & build)


# --- Triangles ------------------------------------------------------------

def test_triangles_match_brute_force(spark, sf_dir):
    """Brute-force per-node triangle counts from the adjacency sets."""
    f = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    adj: dict[int, set[int]] = {}
    for _, grp in f.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey.astype(int))
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    counts: dict[int, int] = {}
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for n in (a, b, c):
                        counts[n] = counts.get(n, 0) + 1
    got = {
        r.node: r.tri_count
        for r in q_graph_triangles(spark, sf_dir).collect()
    }
    assert got == counts


def test_triangles_equi_joins_only(spark, sf_dir):
    plan = _plan(q_graph_triangles(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_labelprop_python_replay(spark, sf_dir):
    """Replay the 3 synchronous LPA rounds in plain Python (mode over
    neighbor labels, ties to smallest) and require identical labels."""
    f = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    adj: dict[int, set[int]] = {}
    for _, grp in f.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey.astype(int))
        for i, a in enumerate(parts):
            for b in parts[i + 1:]:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n in adj:
            counts: dict[int, int] = {}
            for nb in adj[n]:
                counts[labels[nb]] = counts.get(labels[nb], 0) + 1
            if counts:
                best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
                nxt[n] = best[0]
            else:
                nxt[n] = labels[n]
        labels = nxt
    got = {r.node: r.label for r in q_graph_labelprop(spark, sf_dir).collect()}
    assert got == labels


# --- Skyline --------------------------------------------------------------

def test_skyline_equals_dominance_definition(spark, sf_dir):
    """The window formulation must equal the O(n²) dominance definition:
    a (price, size) point survives iff no other part in the brand has
    price ≤ AND size ≥ with at least one strict."""
    p = load(spark, sf_dir, "part").toPandas()
    p["price_c"] = (p.p_retailprice * 100).round().astype(int)
    expected = set()
    for brand, grp in p.groupby("p_brand"):
        pts = grp[["price_c", "p_size"]].values
        best: dict[int, int] = {}
        for pc, sz in pts:
            best[pc] = max(best.get(pc, -1), sz)
        for pc, sz in best.items():
            if not any(
                pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz)
                for pc2, sz2 in best.items()
            ):
                expected.add((brand, pc, sz))
    got = {
        (r.p_brand, r.price_c, r.size)
        for r in q_skyline(spark, sf_dir).collect()
    }
    assert got == expected


# --- Event sequence -------------------------------------------------------

def test_event_sequence_python_regex_replay(spark, sf_dir):
    import re

    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).toPandas()
    got = {
        r.user_id: (r.n_events, r.n_view_to_purchase, r.has_purchase)
        for r in q_event_sequence(spark, sf_dir).collect()
    }
    pat = re.compile("v[^p]*p")
    for uid, grp in ev.groupby("user_id"):
        seq = "".join(
            grp.sort_values(["ts", "event_id"]).event_type.str[0]
        )
        assert got[int(uid)] == (
            len(seq),
            len(pat.findall(seq)),
            "p" in seq,
        ), uid
    assert len(got) == ev.user_id.nunique()


# --- Rolling distinct -----------------------------------------------------

def test_rolling_distinct_naive_replay(spark, sf_dir):
    """The last-occurrence explode must equal the naive 7-day distinct."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).toPandas()
    pairs = ev.drop_duplicates()
    days = sorted(pairs.day.unique())
    got = {
        pd.Timestamp(r.day): (r.u7, r.u1)
        for r in q_window_distinct_rolling(spark, sf_dir).collect()
    }
    for d in days:
        lo = d - pd.Timedelta(days=6)
        u7 = pairs[(pairs.day >= lo) & (pairs.day <= d)].user_id.nunique()
        u1 = pairs[pairs.day == d].user_id.nunique()
        assert got[pd.Timestamp(d)] == (u7, u1), d


def test_rolling_distinct_no_collect_set_in_plan(spark, sf_dir):
    """The scalable formulation must NOT materialize per-window sets."""
    plan = _plan(q_window_distinct_rolling(spark, sf_dir))
    assert "collect_set" not in plan
    assert "CartesianProduct" not in plan
    assert "Generate" in plan  # the sequence() explode


# --- Trending / argmax / LTOB -----------------------------------------------

def test_agg_argmax_matches_pandas(spark, sf_dir):
    """max_by/min_by with the tie-free packed key must equal a pandas
    groupby argmax over the same exact-integer revenues."""
    from python_darima_spark.queries.relational import q_agg_argmax

    li = load(spark, sf_dir, "lineitem").toPandas()
    sup = load(spark, sf_dir, "supplier").toPandas()
    li = li.merge(
        sup[["s_suppkey", "s_nationkey"]],
        left_on="l_suppkey",
        right_on="s_suppkey",
    )
    li["rev_c"] = (li.l_extendedprice * 100 + 0.5).apply(int)
    got = {
        r.s_nationkey: (r.top_suppkey, r.top_supp_rev, r.low_partkey, r.low_part_rev)
        for r in q_agg_argmax(spark, sf_dir).collect()
    }
    for nk, grp in li.groupby("s_nationkey"):
        ps = grp.groupby("l_suppkey").rev_c.sum()
        pp = grp.groupby("l_partkey").rev_c.sum()
        top = max(ps.items(), key=lambda kv: (kv[1], kv[0]))
        low = min(pp.items(), key=lambda kv: (kv[1], kv[0]))
        assert got[nk] == (top[0], top[1], low[0], low[1]), nk


def test_ltob_keeps_per_bucket_max_area(spark, sf_dir):
    """Every kept point must have the maximum neighbor-triangle area in
    its (series, bucket), ties to the earlier hour."""
    from python_darima_spark.queries.domain import (
        _hourly_series,
        q_ts_downsample_ltob,
    )

    grid = _hourly_series(spark, sf_dir).toPandas()
    rows = q_ts_downsample_ltob(spark, sf_dir).collect()
    assert rows
    for sid, grp in grid.groupby("series_id"):
        grp = grp.sort_values("ts").reset_index(drop=True)
        yq = (grp.y * 1e6 + 0.5).apply(int)
        best: dict[int, tuple] = {}
        for i in range(1, len(grp) - 1):
            area = abs(
                ((i - 1) - (i + 1)) * (yq[i] - yq[i - 1])
                - ((i - 1) - i) * (yq[i + 1] - yq[i - 1])
            )
            b = i // 24  # xi = i+1, bucket = (xi-1) div 24
            key = (-area, grp.ts[i])
            if b not in best or key < best[b][0]:
                best[b] = (key, grp.ts[i], area)
        got = {
            (r.series_id, r.bucket): (r.ts, r.area)
            for r in rows
            if r.series_id == sid
        }
        for b, (_, ts, area) in best.items():
            assert got[(sid, b)] == (ts, area), (sid, b)


# --- Closed-form multivariate OLS -------------------------------------------

def test_ols_multifeature_matches_numpy_lstsq(spark, sf_dir):
    """The Cramer solve over integer sufficient statistics must agree
    with numpy's least squares on the same design matrix."""
    import numpy as np

    o = load(spark, sf_dir, "orders").toPandas()
    y = np.floor(o.o_totalprice.values)
    x1 = o.o_orderdate.dt.month.values - 1
    x2 = o.o_orderpriority.str[0].astype(int).values
    X = np.column_stack([np.ones_like(y), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    row = q_ml_ols_multifeature(spark, sf_dir).collect()[0]
    assert abs(row.b0 - beta[0]) < 1e-4, (row.b0, beta[0])
    assert abs(row.b1 - beta[1]) < 1e-4
    assert abs(row.b2 - beta[2]) < 1e-4
    assert abs(row.r2 - r2) < 1e-4
    assert row.n == len(y)


# --- Corrupt-record ingestion ----------------------------------------------

def test_scan_corrupt_quarantines_exactly_the_planted_rows(spark, sf_dir):
    """Nothing lost, nothing invented: the _corrupt bucket equals the
    planting rule's count and the good buckets sum to the rest."""
    ev = load(spark, sf_dir, "events").toPandas()
    rows = {r.bucket: r.n for r in q_scan_corrupt(spark, sf_dir).collect()}
    n_corrupt = int((ev.event_id % 50 == 0).sum())
    assert rows.pop("_corrupt") == n_corrupt
    assert sum(rows.values()) == len(ev) - n_corrupt


# --- Dynamic partition overwrite --------------------------------------------

def test_dynamic_overwrite_touches_only_en(spark, sf_dir):
    """'en' rows shifted by +1000, every other partition identical to
    the source table — the overwrite replaced one partition, not all."""
    docs = load(spark, sf_dir, "documents").toPandas()
    got = {
        r.lang: (r.n, r.sum_chars)
        for r in q_sink_dynamic_overwrite(spark, sf_dir).collect()
    }
    for lang, grp in docs.groupby("lang"):
        shift = 1000 * len(grp) if lang == "en" else 0
        assert got[lang] == (len(grp), int(grp.n_chars.sum()) + shift), lang
    assert set(got) == set(docs.lang.unique())


# --- RRF ------------------------------------------------------------------

def test_scan_text_roundtrip_and_parse(spark, sf_dir):
    """Every staged log line must parse back (parse_ok), and the parsed
    fields must equal a direct recompute from the documents table."""
    import re

    rows = q_scan_text(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").toPandas().set_index("doc_id")
    assert len(rows) == len(docs)
    for r in rows[:50]:
        assert r.parse_ok, r
        d = docs.loc[r.doc_id]
        assert r.lang == d.lang
        assert r.n_chars == d.n_chars
        assert r.prefix == re.sub(r"[\n\r|]", " ", d.text)[:40]


def test_pps_totals_and_guarantees(spark, sf_dir):
    """Systematic PPS invariants: exactly k=10 picks per stratum, and
    any doc with weight ≥ W/k is guaranteed at least one pick."""
    rows = q_sample_weighted_pps(spark, sf_dir).collect()
    docs = load(spark, sf_dir, "documents").toPandas()
    w_tot = docs.groupby("source").n_chars.sum().to_dict()
    by_src: dict[str, int] = {}
    picked = {(r.source, r.doc_id) for r in rows}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_picks
        # multiplicity bound: a doc spans at most ceil(w·k/W)+1 thresholds
        assert r.n_picks <= (r.weight * 10) // w_tot[r.source] + 1
    for src, tot in w_tot.items():
        assert by_src[src] == 10, (src, by_src)
        must = docs[(docs.source == src) & (docs.n_chars * 10 >= tot)]
        for d in must.itertuples():
            assert (src, d.doc_id) in picked, (src, d.doc_id)


def test_phash_matches_direct_text_dhash(spark, sf_dir):
    """The decode-path dHash must equal a direct dHash of the utf-8
    bytes (PNG is lossless) — recomputed here without either engine."""
    rows = {r.media_id: r for r in q_multimodal_phash(spark, sf_dir).collect()}
    docs = load(spark, sf_dir, "documents").toPandas()
    assert len(rows) == len(docs)
    for d in docs.itertuples():
        b = d.text.encode("utf-8") or b"\x00"
        n = len(b)
        hi = lo = 0
        if n >= 2:
            pos = [(i * (n - 1)) // 64 for i in range(65)]
            for i in range(64):
                if b[pos[i + 1]] > b[pos[i]]:
                    if i < 32:
                        lo |= 1 << i
                    else:
                        hi |= 1 << (i - 32)
        r = rows[d.doc_id]
        assert (r.n_px, r.phash_hi, r.phash_lo) == (n, hi, lo), d.doc_id


def test_dedup_phash_finds_every_planted_twin(spark, sf_dir):
    """Each planted twin (doc_id%25==0, ≥64 chars, one mid-string byte
    substituted) must be found by the banded join — pigeonhole recall
    1.0 for Hamming ≤ 7 — and every returned pair must involve a twin
    (the fixture has no natural pairs within the radius)."""
    docs = load(spark, sf_dir, "documents").toPandas()
    planted = {
        int(d.doc_id)
        for d in docs.itertuples()
        if d.doc_id % 25 == 0 and len(d.text) >= 64
    }
    rows = q_dedup_phash(spark, sf_dir).collect()
    got_pairs = {(r.id_a, r.id_b) for r in rows}
    for doc in planted:
        assert (doc, doc + 1000000) in got_pairs, doc
    for r in rows:
        assert r.hamming <= 7
        assert r.id_b >= 1000000, (r.id_a, r.id_b)


def test_dedup_phash_banded_join_is_equi(spark, sf_dir):
    plan = _plan(q_dedup_phash(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rrf_fusion_arithmetic_and_membership(spark, sf_dir):
    """Each fused row's rrf_e6 must equal the integer formula on its own
    rank columns, and every fused candidate must come from ≥1 list."""
    rows = q_rank_rrf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        lex = 1000000 // (60 + r.lex_rank) if r.lex_rank is not None else 0
        sem = 1000000 // (60 + r.sem_rank) if r.sem_rank is not None else 0
        assert r.rrf_e6 == lex + sem, r
        assert r.lex_rank is not None or r.sem_rank is not None
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, lst in by_q.items():
        assert [r.fused_rank for r in sorted(lst, key=lambda r: r.fused_rank)] == list(
            range(1, len(lst) + 1)
        )
        scores = [r.rrf_e6 for r in sorted(lst, key=lambda r: r.fused_rank)]
        assert scores == sorted(scores, reverse=True)
