"""Property-based tests (hypothesis) for the hand-built join operators —
the two places where a subtle off-by-one in tie/boundary handling would
silently corrupt results: asof_join (union+window) and range_join
(bucketed equi-join). Oracles are single-node pandas computations.

Example counts are small: every example is a full Spark round trip.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from python_darima_spark.operators.relational import asof_join, range_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=50)

ROWS = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=25)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _to_pdf(rows, id_start=0):
    return pd.DataFrame(
        {
            "k": [f"k{a}" for a, _ in rows],
            "ts": pd.to_datetime([b * 3600 for _, b in rows], unit="s"),
            "rid": range(id_start, id_start + len(rows)),
        }
    )


@given(left=ROWS, right=ROWS)
@settings(**_SETTINGS)
def test_asof_join_matches_merge_asof(spark, left, right):
    lp, rp = _to_pdf(left), _to_pdf(right, id_start=1000)
    l_df = spark.createDataFrame(lp) if len(lp) else None
    if l_df is None or not len(rp):
        return  # empty sides are covered by unit tests
    r_df = spark.createDataFrame(rp)

    got = (
        asof_join(
            l_df, r_df, on="k", right_cols=["rid"], suffix="_r",
            tie_break=["rid"],
        )
        .toPandas()
        .sort_values(["rid"])
        .reset_index(drop=True)
    )

    # pandas merge_asof backward-inclusive; among equal right ts the
    # positionally LAST wins, so sorting right by (ts, rid) makes the
    # winner the greatest rid — the same tie rule tie_break=["rid"] pins.
    want = pd.merge_asof(
        lp.sort_values(["ts", "rid"], kind="mergesort"),
        rp.sort_values(["ts", "rid"], kind="mergesort"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_r"),
    ).sort_values(["rid"]).reset_index(drop=True)

    assert len(got) == len(want)
    g = got["rid_r"].astype("float64").fillna(-1).to_numpy()
    w = want["rid_r"].astype("float64").fillna(-1).to_numpy()
    assert (g == w).all(), pd.DataFrame({"rid": got["rid"], "got": g, "want": w})


@given(points=ROWS, intervals=ROWS, span_h=st.integers(min_value=0, max_value=5))
@settings(**_SETTINGS)
def test_range_join_matches_naive_between(spark, points, intervals, span_h):
    pp, ip = _to_pdf(points), _to_pdf(intervals, id_start=1000)
    if not len(pp) or not len(ip):
        return
    ip = ip.assign(lo=ip["ts"], hi=ip["ts"] + pd.Timedelta(hours=span_h))

    got = (
        range_join(
            spark.createDataFrame(pp),
            spark.createDataFrame(ip[["k", "rid", "lo", "hi"]].rename(
                columns={"rid": "iid"}
            )),
            on="k", point_ts="ts", lo_ts="lo", hi_ts="hi",
            bucket_seconds=7200,
        )
        .select("rid", "iid")
        .toPandas()
    )
    got_set = set(map(tuple, got.to_numpy()))

    naive = pp.merge(ip.rename(columns={"rid": "iid"}), on="k")
    naive = naive[(naive["ts_x"] >= naive["lo"]) & (naive["ts_x"] <= naive["hi"])]
    want_set = set(zip(naive["rid"], naive["iid"]))

    assert got_set == want_set
    # exactly-once: no duplicate pairs survived the bucket explosion
    assert len(got) == len(got_set)


@given(
    left=ROWS,
    right=ROWS,
    span_l=st.integers(min_value=0, max_value=5),
    span_r=st.integers(min_value=0, max_value=5),
)
@settings(**_SETTINGS)
def test_interval_overlap_join_matches_naive(spark, left, right, span_l, span_r):
    """Bucketed interval×interval overlap (first-shared-bucket matching)
    must emit exactly the naive inclusive-overlap pair set, once each —
    across interval spans shorter and longer than the bucket width."""
    from python_darima_spark.operators.relational import interval_overlap_join

    lp, rp = _to_pdf(left), _to_pdf(right, id_start=1000)
    if not len(lp) or not len(rp):
        return
    lp = lp.assign(lo_a=lp["ts"], hi_a=lp["ts"] + pd.Timedelta(hours=span_l))
    rp = rp.assign(lo_b=rp["ts"], hi_b=rp["ts"] + pd.Timedelta(hours=span_r))

    got = (
        interval_overlap_join(
            spark.createDataFrame(lp[["k", "rid", "lo_a", "hi_a"]]),
            spark.createDataFrame(
                rp[["k", "rid", "lo_b", "hi_b"]].rename(columns={"rid": "iid"})
            ),
            on="k", lo_a="lo_a", hi_a="hi_a", lo_b="lo_b", hi_b="hi_b",
            bucket_seconds=7200,
        )
        .select("rid", "iid")
        .toPandas()
    )
    got_pairs = list(map(tuple, got.to_numpy()))

    naive = lp.merge(
        rp.rename(columns={"rid": "iid"}), on="k", suffixes=("_l", "_r")
    )
    naive = naive[
        (naive["lo_a"] <= naive["hi_b"]) & (naive["lo_b"] <= naive["hi_a"])
    ]
    want = set(zip(naive["rid"], naive["iid"]))

    assert set(got_pairs) == want
    # exactly-once: the first-shared-bucket rule deduplicates by construction
    assert len(got_pairs) == len(set(got_pairs))
