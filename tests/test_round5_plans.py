"""Physical-plan assertions for the round-5 operators: pin the shapes
the 100 TB posture relies on (map-only stages stay map-only, the
capped-LSH bucket count rides the existing shuffle, the prefix-filter
candidate joins stay equi) so regressions fail loudly."""

from __future__ import annotations

from python_darima_spark.queries.domain import (
    q_ts_fitted_unrolled,
    q_ts_forecast_unrolled,
)
from python_darima_spark.queries.llm_data import (
    q_multimodal_audio_energy,
    q_multimodal_frame_sample,
    q_url_canonicalize,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_forecast_unrolled_single_keyed_window(spark, sf_dir):
    """Last-2-obs + 3-row fan-out: one keyed window over the series grid,
    then pure projection — no join, no second shuffle, no Python."""
    plan = _plan(q_ts_forecast_unrolled(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" in plan, plan[:1500]
    assert "Generate" in plan  # the explode fan-out is relational


def test_fitted_unrolled_is_window_algebra(spark, sf_dir):
    """Two lag()s + row_number share ONE window spec: the plan must
    contain a Window and no join/Python — the whole fit is map-side
    after the grid's keyed shuffle."""
    plan = _plan(q_ts_fitted_unrolled(spark, sf_dir))
    assert "Window" in plan, plan[:1500]
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_frame_sample_fanout_relational_joinback_equi(spark, sf_dir):
    """The offset fan-out must be a Generate (posexplode), never a
    Python stage, and the content join-back an equi hash join."""
    plan = _plan(q_multimodal_frame_sample(spark, sf_dir))
    assert "Generate" in plan, plan[:1500]
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_audio_energy_single_arrow_stage(spark, sf_dir):
    """Exactly ONE Arrow crossing (the mapInPandas framing stage);
    payloads must not shuffle — no exchange above the Python stage other
    than the scan-side parallelism floor."""
    plan = _plan(q_multimodal_audio_energy(spark, sf_dir))
    assert plan.count("MapInPandas") == 1, plan[:2000]
    assert "CartesianProduct" not in plan


def test_url_canonicalize_map_only_plus_one_window(spark, sf_dir):
    """Regexp chain is map-side; the min-id-per-canon dedup is ONE keyed
    window — no join, no Python."""
    plan = _plan(q_url_canonicalize(spark, sf_dir))
    assert "Window" in plan, plan[:1500]
    assert "Join" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def _no_checkpoint(monkeypatch):
    """Make localCheckpoint an identity so the operator's REAL plan is
    inspectable (the eager checkpoint otherwise collapses everything
    upstream into a Scan ExistingRDD)."""
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame;
    # patching the abstract pyspark.sql.DataFrame would not intercept
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )


def test_containment_counting_prefix_in_plan(spark, sf_dir, monkeypatch):
    """The round-6 containment shape: all candidate/verify joins equi
    (hash or sort-merge), no nested loop anywhere, the df-rank prefix
    window present, and the round-5 MinHash estimate stage GONE (the
    counting prefix filter replaced it). The estimate stage is detected
    by ITS markers — the `_mh*` minhash min-aggregates and the zip_with
    signature compare — not by `xxhash64`, which the replay-stable gid
    dictionary legitimately uses (round-6 ADVICE fix; the old blanket
    no-xxhash64 assertion only ever passed when a previously registered
    cache entry happened to hide the dictionary subtree)."""
    _no_checkpoint(monkeypatch)
    from python_darima_spark.queries.llm_data import load
    from python_darima_spark.operators.dedup import containment_pairs

    docs = load(spark, sf_dir, "documents")
    plan = _plan(containment_pairs(docs, "text", "doc_id"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # round-5 signature estimate stage removed in round 6
    assert "_mh0" not in plan, plan[:2000]
    assert "zip_with" not in plan, plan[:2000]
    # hit-count aggregate (map-side combined) + the df-rank window
    assert "HashAggregate" in plan
    assert "Window" in plan


def test_holt_recursive_single_grouped_arrow_stage(spark, sf_dir):
    """One grouped Arrow crossing (the per-series sequential recursion IS
    the operator); everything before it is a keyed hash aggregate."""
    from python_darima_spark.queries.domain import q_ts_holt_recursive

    plan = _plan(q_ts_holt_recursive(spark, sf_dir))
    assert plan.count("FlatMapGroupsInPandas") == 1, plan[:2000]
    assert "CartesianProduct" not in plan


def test_holt_recursive_matches_python_replay(spark, sf_dir):
    """The integer recursion replayed in plain Python off the hourly
    aggregate must reproduce the operator's level/trend/yhat exactly —
    the twin the recursive-CTE oracle certifies cross-engine."""
    from python_darima_spark.queries.domain import load, q_ts_holt_recursive
    import pyspark.sql.functions as F

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("series_id"),
            F.date_trunc("hour", "ts").alias("ts"),
        )
        .agg(
            F.floor(F.sum("value") * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("y")
        )
        .orderBy("series_id", "ts")
        .collect()
    )
    expect = {}
    series = {}
    for r in hourly:
        series.setdefault(r.series_id, []).append(r.y)
    for sid, ys in series.items():
        lev, tr = ys[0], 0
        for y in ys[1:]:
            nl = (y + lev + tr) // 2
            tr = (nl - lev + tr) // 2
            lev = nl
        for h in (1, 2, 3):
            expect[(sid, h)] = (lev / 1e6, tr / 1e6, (lev + h * tr) / 1e6)
    got = q_ts_holt_recursive(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        lev, tr, yhat = expect[(r.series_id, r.h)]
        assert (r.level, r.trend, r.yhat) == (lev, tr, yhat)


def test_fuzzy_join_equi_block_and_total_recall(spark, sf_dir):
    """The SymSpell blocking must plan as an equi join (no cartesian /
    nested loop), and the pigeonhole recall-1.0 claim must hold: every
    probe resolves its true source NAME at distance exactly 1, and the
    output stays |probes|-bounded (dictionary resolution, not row
    fan-out)."""
    from python_darima_spark.queries.joins import q_join_fuzzy, load

    df = q_join_fuzzy(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    source = {
        r.p_partkey: r.p_name
        for r in load(spark, sf_dir, "part")
        .where("p_partkey % 17 = 3")
        .collect()
    }
    rows = df.collect()
    hits = {
        r.probe_key
        for r in rows
        if r.match_name == source[r.probe_key] and r.dist == 1
    }
    assert hits == set(source), "a probe failed to resolve its source name"
    # dictionary resolution: no probe may fan out to more matches than
    # the (tiny) set of names within distance 1
    per_probe = {}
    for r in rows:
        per_probe[r.probe_key] = per_probe.get(r.probe_key, 0) + 1
    assert max(per_probe.values()) <= 10


def test_bm25_broadcast_qterms_no_cartesian(spark, sf_dir):
    """Candidate generation must be a broadcast hash join of query terms
    against the posting table; the only cross join is the 1-row stats
    broadcast. Top-5 contract: ≤5 per query, self excluded, ranks dense
    from 1."""
    from python_darima_spark.queries.llm_data import q_text_bm25

    df = q_text_bm25(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan, plan[:2000]
    rows = df.collect()
    by_q = {}
    for r in rows:
        assert r.doc_id != r.query_id
        assert r.score > 0
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_bpe_train_matches_python_replay(spark, sf_dir):
    """The 3-round distributed trainer must equal a pure-Python greedy
    BPE replay over the same word-frequency table (Counter-based, same
    (count desc, pair asc) tie-break) — the loop's argmax chain is the
    thing under test, not one round."""
    from collections import Counter

    import pyspark.sql.functions as F
    from python_darima_spark.queries.llm_data import (
        load,
        q_text_bpe_train,
    )

    words = (
        load(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    vocab = {tuple(r.w): r.freq for r in words}
    expect = []
    for rnd in (1, 2, 3):
        counts = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freq
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((rnd, " ".join(pair), counts[pair]))
        merged = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == pair
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + freq
        vocab = merged
    got = [
        (r.rnd, r.pair, r.weighted_count)
        for r in q_text_bpe_train(spark, sf_dir).orderBy("rnd").collect()
    ]
    assert got == expect


def test_bpe_apply_map_only_one_agg_no_python(spark, sf_dir):
    """The whole merge chain is one JVM projection: no Python stage, no
    join, exactly one aggregate exchange (doc_id)."""
    from python_darima_spark.queries.llm_data import q_text_bpe_apply

    df = q_text_bpe_apply(spark, sf_dir)
    plan = _plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan
    rows = df.collect()
    for r in rows:
        assert r.n_words <= r.n_tokens <= r.n_chars
        assert r.ratio_e6 == r.n_tokens * 1_000_000 // r.n_chars


def test_curation_pipeline_verdict_consistency(spark, sf_dir):
    """Cascade invariants: every doc gets exactly one verdict; split is
    non-null iff kept; eval docs are verdict-stable (doc_id%97==0 ⇒
    eval_holdout); each standalone stage agrees with the cascade's
    verdict for docs that REACH that stage (composition check against
    the independently-certified stage queries)."""
    import pyspark.sql.functions as F
    from python_darima_spark.queries.llm_data import (
        load,
        q_curation_pipeline,
        q_text_quality_gopher,
    )

    df = q_curation_pipeline(spark, sf_dir)
    rows = {r.doc_id: r for r in df.collect()}
    docs = {
        r.doc_id: r
        for r in load(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    assert set(rows) == set(docs)
    gopher_keep = {
        r.doc_id: r.keep
        for r in q_text_quality_gopher(spark, sf_dir)
        .select("doc_id", "keep")
        .collect()
    }
    for doc_id, r in rows.items():
        assert (r.split is not None) == (r.verdict == "kept")
        if doc_id % 97 == 0:
            assert r.verdict == "eval_holdout"
        elif docs[doc_id].lang not in ("en", "de", "es", "fr"):
            assert r.verdict == "lang"
        elif not gopher_keep.get(doc_id, False):
            assert r.verdict == "quality"
        else:
            assert r.verdict in (
                "exact_dup",
                "near_dup",
                "contaminated",
                "kept",
            )


def test_spatial_radius_equi_join_and_brute_force_equal(spark, sf_dir):
    """The grid blocking must plan as an equi hash join (no cartesian /
    nested loop), and the 3×3-neighborhood recall-1.0 claim must hold:
    the grid result equals the brute-force all-pairs result exactly."""
    from itertools import combinations

    from python_darima_spark.queries.joins import (
        load,
        q_join_spatial_radius,
    )

    df = q_join_spatial_radius(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    keys = [
        r.c_custkey
        for r in load(spark, sf_dir, "customer")
        .select("c_custkey")
        .collect()
    ]
    import hashlib

    def pt(k):
        h = hashlib.md5(str(k).encode()).hexdigest()
        return int(h[0:4], 16) % 1000, int(h[4:8], 16) % 1000

    pts = {k: pt(k) for k in keys}
    expect = {
        (a, b, (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2)
        for a, b in combinations(sorted(keys), 2)
        if (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        <= 15 * 15
    }
    got = {(r.id_a, r.id_b, r.dist2) for r in df.collect()}
    assert got == expect
    # guard against the degenerate-generator failure mode: the fixture
    # must actually CONTAIN near pairs for the oracle to certify
    assert len(expect) > 0


def test_gaps_islands_matches_python_replay(spark, sf_dir):
    """Islands must equal a direct Python reconstruction of maximal
    consecutive-hour runs (and the plan must carry no join — the whole
    query is windows + aggs on one keyed partitioning)."""
    import pyspark.sql.functions as F
    from python_darima_spark.queries.domain import (
        load,
        q_ts_gaps_islands,
    )

    df = q_ts_gaps_islands(spark, sf_dir)
    assert "Join" not in _plan(df)
    hours = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("sid"),
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
                "h"
            ),
        )
        .distinct()
        .collect()
    )
    series = {}
    for r in hours:
        series.setdefault(r.sid, []).append(r.h)
    expect = set()
    for sid, hs in series.items():
        hs.sort()
        start = prev = hs[0]
        prev_end = None
        for h in hs[1:] + [None]:
            if h is not None and (h - prev).total_seconds() == 3600:
                prev = h
                continue
            n = int((prev - start).total_seconds() // 3600) + 1
            gap = (
                None
                if prev_end is None
                else int((start - prev_end).total_seconds() // 3600) - 1
            )
            expect.add((sid, start, prev, n, gap))
            prev_end = prev
            if h is not None:
                start = prev = h
    got = {
        (r.series_id, r.island_start, r.island_end, r.n_hours,
         r.gap_hours_before)
        for r in df.collect()
    }
    assert got == expect


def test_basket_pairs_bounded_fanout_and_lift_exact(spark, sf_dir):
    """The pair stage must be an equi join on l_orderkey (no cartesian),
    support ≥ 2 everywhere, ordering deterministic, and lift_e6 must
    equal the integer formula recomputed from the emitted supports."""
    import pyspark.sql.functions as F
    from python_darima_spark.queries.relational import (
        load,
        q_basket_pairs,
    )

    df = q_basket_pairs(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    n_orders = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    rows = df.collect()
    assert 0 < len(rows) <= 50
    for r in rows:
        assert r.id_a < r.id_b and r.support >= 2
        assert (
            r.lift_e6
            == r.support * n_orders * 1_000_000
            // (r.support_a * r.support_b)
        )
    supports = [r.support for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_agg_regression_matches_numpy_lstsq(spark, sf_dir):
    """The sufficient-statistics OLS must agree with numpy's polyfit on
    the same integer-quantized inputs (independent algorithm: lstsq on
    the design matrix vs closed-form component sums)."""
    import math

    import numpy as np
    import pyspark.sql.functions as F
    from python_darima_spark.queries.relational import (
        load,
        q_agg_regression,
    )

    rows = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.col("l_quantity").cast("long").alias("x"),
            F.floor("l_extendedprice").cast("long").alias("y"),
        )
        .collect()
    )
    by_g = {}
    for r in rows:
        by_g.setdefault(r.l_returnflag, []).append((r.x, r.y))
    got = {r.l_returnflag: r for r in q_agg_regression(spark, sf_dir).collect()}
    assert set(got) == set(by_g)
    for gname, pts in by_g.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        # emitted columns are display-rounded (slope/r2 to 6 dp,
        # intercept to 4 dp) — compare within half an ulp of that
        assert math.isclose(
            got[gname].slope, slope, rel_tol=1e-5, abs_tol=5e-7
        )
        assert math.isclose(
            got[gname].intercept, intercept, rel_tol=1e-5, abs_tol=5e-5
        )
        assert math.isclose(
            got[gname].r2, r * r, rel_tol=1e-5, abs_tol=5e-7
        )
        assert got[gname].n == len(pts)


def test_twap_matches_python_locf_replay(spark, sf_dir):
    """The time-weighted average must equal a direct Python LOCF replay
    (value holds until next observation, last extends to midnight) on
    every (series, day) — and a constant-value day must TWAP to exactly
    that constant regardless of sampling irregularity."""
    import math
    from datetime import timedelta

    import pyspark.sql.functions as F
    from python_darima_spark.queries.domain import load, q_ts_twap

    obs = (
        load(spark, sf_dir, "events")
        .select(
            F.col("event_type").alias("sid"),
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias(
                "day"
            ),
            F.col("ts").cast("timestamp").alias("ts"),
            F.floor(F.col("value") * F.lit(1e3) + F.lit(0.5))
            .cast("long")
            .alias("v"),
        )
        .groupBy("sid", "day", "ts")
        .agg(F.floor(F.avg("v")).cast("long").alias("v"))
        .collect()
    )
    groups = {}
    for r in obs:
        groups.setdefault((r.sid, r.day), []).append((r.ts, r.v))
    expect = {}
    for (sid, day), pts in groups.items():
        pts.sort()
        midnight = day + timedelta(days=1)
        wsum = tsum = 0
        for i, (ts, v) in enumerate(pts):
            nxt = pts[i + 1][0] if i + 1 < len(pts) else midnight
            # exact integer microseconds — float total_seconds() loses
            # ulps on microsecond-resolution stamps
            dur = (nxt - ts) // timedelta(microseconds=1)
            wsum += v * dur
            tsum += dur
        expect[(sid, day)] = (len(pts), wsum / tsum / 1e3)
    got = {
        (r.series_id, r.day): (r.n_obs, r.twap)
        for r in q_ts_twap(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n, tw) in expect.items():
        assert got[k][0] == n
        assert math.isclose(got[k][1], tw, rel_tol=1e-12)


def test_ngram_prefix_filter_no_cross_join(spark, sf_dir, monkeypatch):
    """The round-5 rewrite's reason to exist: the candidate stage must
    never plan a cross/nested-loop join (the old length-bucket blocking
    degenerated to one on this corpus)."""
    _no_checkpoint(monkeypatch)
    from python_darima_spark.queries.llm_data import load
    from python_darima_spark.operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    plan = _plan(ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan  # the df-rank prefix window
