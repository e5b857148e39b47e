"""Targeted invariants for the round-7 pipeline_ext operators, each
checked against an INDEPENDENT formulation (pandas brute force, planted
structure) rather than the DuckDB oracle the parity test already runs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_darima_spark.queries.pipeline_ext import (
    _KM_ITERS,
    _KM_K,
    _LP_MAX_DEG,
    _LP_MIN_COMMON,
    q_cdc_diff,
    q_embed_kmeans,
    q_graph_linkpred,
    q_mixture_temperature,
    q_stream_watermark_late,
    q_text_dedup_lines,
)

SF = "/root/testdata/sf0.001"


def test_linkpred_matches_pandas_bruteforce(spark):
    """The capped common-neighbors projection equals a row-at-a-time
    pandas recomputation (different join/aggregation machinery)."""
    got = (
        q_graph_linkpred(spark, SF)
        .toPandas()
        .sort_values(["c1", "c2"])
        .reset_index(drop=True)
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    edges = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")[
            ["l_partkey", "o_custkey"]
        ].drop_duplicates()
    )
    deg = edges.groupby("l_partkey").size()
    small = edges[edges.l_partkey.isin(deg[deg <= _LP_MAX_DEG].index)]
    from collections import Counter

    cnt: Counter = Counter()
    for _, grp in small.groupby("l_partkey"):
        cs = sorted(grp.o_custkey)
        for i in range(len(cs)):
            for j in range(i + 1, len(cs)):
                cnt[(cs[i], cs[j])] += 1
    want = (
        pd.DataFrame(
            [
                (c1, c2, n)
                for (c1, c2), n in cnt.items()
                if n >= _LP_MIN_COMMON
            ],
            columns=["c1", "c2", "common_parts"],
        )
        .sort_values(["c1", "c2"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_kmeans_recovers_planted_clusters(spark):
    """After 3 Lloyd iterations from corner seeds, each centroid must sit
    inside its planted jitter box (cluster base + [0, 200) per axis) and
    the sizes must sum to the table size — i.e. the loop actually
    converged to the planted structure, on any fixture."""
    out = q_embed_kmeans(spark, SF).toPandas().sort_values("cid")
    assert list(out.cid) == list(range(_KM_K))
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert out.n.sum() == n_emb
    for _, r in out.iterrows():
        bx, by = (r.cid % 2) * 5000, (r.cid // 2) * 5000
        assert bx <= r.cx < bx + 200, (r.cid, r.cx)
        assert by <= r.cy < by + 200, (r.cid, r.cy)
    assert _KM_ITERS == 3  # the oracle unrolls exactly this many


def test_cdc_diff_partition_sanity(spark):
    """Every op class must match its planted population exactly."""
    out = q_cdc_diff(spark, SF).toPandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    k = orders.o_orderkey
    want_ins = int(((k % 10 == 7) & (k % 13 != 3)).sum())
    want_del = int(((k % 10 != 7) & (k % 13 == 3)).sum())
    want_upd = int(
        ((k % 10 != 7) & (k % 13 != 3) & (k % 4 == 1)).sum()
    )
    by_op = out.groupby("op").size()
    assert by_op.get("insert", 0) == want_ins
    assert by_op.get("delete", 0) == want_del
    assert by_op.get("update", 0) == want_upd
    upd = out[out.op == "update"]
    assert (upd.new_cents - upd.old_cents == 100).all()


def test_mixture_weights_sum_to_one(spark):
    out = q_mixture_temperature(spark, SF).toPandas()
    assert abs(out.weight.sum() - 1.0) < 1e-4
    # temperature flattening: weight spread is strictly narrower than
    # the raw char-share spread
    share = out.chars / out.chars.sum()
    assert out.weight.max() - out.weight.min() < share.max() - share.min() + 1e-12


def test_dedup_lines_removes_only_frequent_segments(spark):
    out = q_text_dedup_lines(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    # cleaned text is always a subsequence of the original segmentation
    orig = docs.set_index("doc_id").text.to_dict()
    sample = out.head(20)
    for _, r in sample.iterrows():
        words = orig[r.doc_id].split(" ")
        segs = [
            " ".join(words[i : i + 3]) for i in range(0, len(words), 3)
        ]
        assert r.n_kept <= len(segs)
        # the cleaned text re-segmented must be an in-order subsequence
        # of the original segmentation
        assert _is_subsequence(_split3(r.cleaned), segs)


def _split3(text: str) -> list[str]:
    ws = text.split(" ")
    return [" ".join(ws[i : i + 3]) for i in range(0, len(ws), 3)]


def _is_subsequence(sub: list[str], full: list[str]) -> bool:
    it = iter(full)
    return all(any(s == f for f in it) for s in sub)


def test_watermark_late_drops_all_planted_rows(spark):
    """The streaming output must equal the BATCH aggregate of on-time
    rows under the final-emission cutoff — i.e. zero planted late rows
    leaked into any window count (computed here with the batch engine,
    not the DuckDB oracle)."""
    got = q_stream_watermark_late(spark, SF).toPandas()
    from python_darima_spark.queries import load

    ev = load(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    us = F.unix_micros(F.col("ts"))
    mid = ev.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2")
    ).collect()[0][0]
    ontime = ev.where(~((F.col("event_id") % 13 == 0) & (us <= F.lit(int(mid)))))
    cutoff = ev.agg(
        F.max("ts") - F.expr("INTERVAL 47 MINUTES")
    ).collect()[0][0]
    want = (
        ontime.groupBy(
            F.date_trunc("hour", "ts").alias("wstart"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .where(
            F.col("wstart") + F.expr("INTERVAL 1 HOUR") <= F.lit(cutoff)
        )
        .toPandas()
    )
    g = got.sort_values(["wstart", "event_type"]).reset_index(drop=True)
    w = want.sort_values(["wstart", "event_type"]).reset_index(drop=True)
    assert len(g) == len(w) > 0
    assert (g.n.values == w.n.values).all()


@pytest.mark.parametrize("_", [0])
def test_segment_threshold_is_nontrivial(spark, _):
    """The boilerplate filter must actually remove something at this SF
    (guards against a degenerate threshold after fixture regeneration)."""
    out = q_text_dedup_lines(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(out) <= docs


def test_global_row_number_matches_single_partition_window(spark):
    """The distributed rank (range repartition + per-block enumeration +
    prefix offsets) must equal the naive single-partition
    row_number() OVER (ORDER BY ...) on any fixture and split layout."""
    from pyspark.sql import Window

    from python_darima_spark.operators.relational import (
        global_row_number,
        ntile_from_rank,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    got = global_row_number(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], "rn",
        num_partitions=7,
    ).toPandas().sort_values("o_orderkey").reset_index(drop=True)
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    want = (
        orders.withColumn("rn", F.row_number().over(w))
        .toPandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert (got.rn.values == want.rn.values).all()
    # ntile restatement equals SQL ntile on the same rank
    n = len(want)
    nt_got = (
        global_row_number(
            orders, [F.desc("o_totalprice"), F.asc("o_orderkey")], "rn",
            num_partitions=7,
        )
        .withColumn("nt", ntile_from_rank(F.col("rn"), F.lit(n), 5))
        .toPandas().sort_values("o_orderkey").reset_index(drop=True)
    )
    nt_want = (
        orders.withColumn("nt", F.ntile(5).over(w))
        .toPandas().sort_values("o_orderkey").reset_index(drop=True)
    )
    assert (nt_got.nt.values == nt_want.nt.values).all()


def test_anonymize_k_cascade_and_invariant(spark):
    """q_anonymize_k equals a pandas recomputation of the ladder, and
    every published row's FULL-POPULATION anonymity set is ≥ k.
    (group_size here is the population census, NOT the released
    equivalence class — the ladder is a risk-triage artifact; the
    released-class ≥ k guarantee belongs to q_anonymize_k_strict.)"""
    import math

    from python_darima_spark.queries.pipeline_ext import _ANON_K, q_anonymize_k

    sf = "/root/testdata/sf0.01"
    got = (
        q_anonymize_k(spark, sf)
        .toPandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    cust["b"] = (cust.c_acctbal / 1000.0).apply(math.floor)
    n0 = cust.groupby(["c_nationkey", "c_mktsegment", "b"]).c_custkey.transform("size")
    n1 = cust.groupby(["c_nationkey", "c_mktsegment"]).c_custkey.transform("size")
    n2 = cust.groupby(["c_mktsegment"]).c_custkey.transform("size")
    k = _ANON_K
    lvl = pd.Series(3, index=cust.index)
    lvl[n2 >= k] = 2
    lvl[n1 >= k] = 1
    lvl[n0 >= k] = 0
    want = pd.DataFrame(
        {"c_custkey": cust.c_custkey, "gen_level": lvl}
    ).sort_values("c_custkey").reset_index(drop=True)
    assert (got.gen_level.values == want.gen_level.values).all()
    pub = got[got.gen_level < 3]
    assert (pub.group_size >= k).all()
    # the ladder actually cascades on this fixture: all of 0, 1, 2 occur
    assert {0, 1, 2} <= set(got.gen_level.unique())
    # suppressed rows reveal nothing
    sup = got[got.gen_level == 3]
    assert sup.anon_nation.isna().all() and sup.anon_segment.isna().all()


def test_anonymize_k_strict_released_classes(spark):
    """q_anonymize_k_strict is an actual k-anonymous release: every
    RELEASED EQUIVALENCE CLASS — the rows sharing (gen_level,
    anon_nation, anon_segment, anon_bal_bucket) — has ≥ k members for
    gen_level < 3, group_size equals that released class size exactly,
    and a strict row never sits at a finer level than its ladder row
    (the strict cascade can only hold or push rows coarser)."""
    from python_darima_spark.queries.pipeline_ext import (
        _ANON_K,
        q_anonymize_k,
        q_anonymize_k_strict,
    )

    sf = "/root/testdata/sf0.01"
    got = q_anonymize_k_strict(spark, sf).toPandas()
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    assert len(got) == len(cust) and got.c_custkey.is_unique
    pub = got[got.gen_level < 3].fillna({"anon_nation": -1, "anon_bal_bucket": -1})
    cls = pub.groupby(
        ["gen_level", "anon_nation", "anon_segment", "anon_bal_bucket"],
        dropna=False,
    ).c_custkey.transform("size")
    assert (cls >= _ANON_K).all()
    assert (pub.group_size.values == cls.values).all()
    sup = got[got.gen_level == 3]
    assert sup.anon_nation.isna().all() and sup.anon_segment.isna().all()
    # strict ≥ ladder level per row (sequential release only coarsens)
    ladder = (
        q_anonymize_k(spark, sf)
        .toPandas()
        .set_index("c_custkey")
        .gen_level.sort_index()
    )
    strict_lvl = got.set_index("c_custkey").gen_level.sort_index()
    assert (strict_lvl.values >= ladder.values).all()
    # the cascade is exercised: at least two distinct released levels
    assert got.gen_level.nunique() >= 2


def test_kalman_tracks_float_filter(spark):
    """The integer micro-unit Kalman recursion stays within quantization
    distance of an INDEPENDENT float-arithmetic local-level filter, and
    the 240-hour cap bounds n_obs."""
    from python_darima_spark.queries.pipeline_ext import (
        _KAL_HOURS,
        _KAL_M,
        _KAL_Q,
        _KAL_R,
        q_ts_kalman,
    )

    sf = "/root/testdata/sf0.001"
    got = q_ts_kalman(spark, sf).toPandas().set_index("series_id")
    assert (got.n_obs <= _KAL_HOURS).all()
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["ts"] = pd.to_datetime(ev.ts)
    hourly = (
        ev.groupby(["event_type", ev.ts.dt.floor("h")])["value"]
        .sum()
        .reset_index()
    )
    for sid, grp in hourly.groupby("event_type"):
        grp = grp.sort_values("ts")
        grp = grp[grp.ts > grp.ts.max() - pd.Timedelta(hours=_KAL_HOURS)]
        ys = grp.value.to_numpy(dtype=float)
        m = _KAL_M
        r_, q_ = _KAL_R / m, _KAL_Q / m
        lev, p = ys[0], r_
        for y in ys[1:]:
            pp = p + q_
            kk = pp / (pp + r_)
            lev = lev + kk * (y - lev)
            p = (1 - kk) * pp
        assert got.loc[sid, "n_obs"] == len(ys)
        # integer micro-unit recursion vs float: drift bounded by the
        # per-step floor error accumulated through a contraction (<1e-3)
        assert abs(got.loc[sid, "level"] - lev) < 1e-3
        assert abs(got.loc[sid, "p_var"] - p) < 1e-3


def test_window_pattern_matches_re_module(spark):
    """q_window_pattern equals a pure-python re.findall recomputation
    over (ts, event_id)-sorted event streams."""
    import re

    from python_darima_spark.queries.pipeline_ext import (
        _CEP_PATTERN,
        q_window_pattern,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.user_id: (r.n_events, r.n_conversions, r.converted)
        for r in q_window_pattern(spark, sf).collect()
    }
    ev = pd.read_parquet(f"{sf}/events.parquet")
    m = {"view": "V", "click": "C", "purchase": "P", "signup": "S"}
    want = {}
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        s = "".join(m.get(t, "E") for t in grp.event_type)
        n = len(re.findall(_CEP_PATTERN, s))
        want[uid] = (len(s), n, n > 0)
    assert got == want
    # the fixture exercises both outcomes
    assert any(v[2] for v in got.values()) and not all(v[2] for v in got.values())


def test_dq_anomaly_volume_matches_pandas_rolling(spark):
    """q_dq_anomaly_volume equals a pandas rolling mean/std (ddof=1)
    recomputation, and only rows with a full 7-observation history are
    judged."""
    from python_darima_spark.queries.pipeline_ext import q_dq_anomaly_volume

    sf = "/root/testdata/sf0.01"
    got = (
        q_dq_anomaly_volume(spark, sf)
        .toPandas()
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["day"] = pd.to_datetime(ev.ts).dt.floor("d")
    daily = ev.groupby(["event_type", "day"]).size().rename("n").reset_index()
    rows = []
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        trail = grp.n.shift(1).rolling(7)
        mean, std = trail.mean(), trail.std(ddof=1)
        for i in range(len(grp)):
            if i >= 7:
                rows.append((et, grp.day[i], grp.n[i], mean[i], std[i]))
    want = pd.DataFrame(rows, columns=["event_type", "day", "n", "mean", "std"])
    want = want.sort_values(["event_type", "day"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got.n.values == want.n.values).all()
    assert (abs(got.mean7.values - want["mean"].values) < 1e-5).all()
    z = (want.n - want["mean"]) / want["std"]
    ok = want["std"] > 0
    assert (abs(got.z.values[ok.values] - z[ok].values) < 1e-5).all()
    assert (got.is_anomaly.values == (abs(z).fillna(0) > 2).values).all()
