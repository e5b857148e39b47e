"""sf1 scale probe (round-3 verdict ask #5): measure how the headline
plans SCALE, not just how fast they are at sf0.1.

Builds a 10×-replicated dataset from /root/testdata/sf0.1 (the driver
ships no sf1) under .scaledata/sf1 — key spaces are shifted per copy so
join cardinalities and group counts scale the way real data growth
does (10× more orders/customers/series/docs, NOT 10× duplicates of the
same keys; dimension tables nation/region stay fixed like TPC-H dims):

* customer/orders/lineitem/part/supplier: surrogate keys += k·max_key,
  foreign keys shifted consistently so referential joins stay 1:N;
* events: copy k>0 gets suffixed event_type (new series) and shifted
  event_id/user_id — the q_ts_many_series parallel axis grows 10×;
* documents: shifted doc_id; copy k>0 texts are alphabet-ROTATED
  (translate with a per-copy Caesar map — a bijection applied
  uniformly), which preserves the original WITHIN-copy dup/near-dup
  structure exactly while destroying cross-copy shingle overlap, so
  dedup output scales linearly like a real 10× corpus. (The first
  attempt appended a short per-copy salt; long docs kept >0.5 Jaccard
  to their 9 siblings, every copy group became a genuine near-dup
  clique, and q_dedup_near measured a bogus 38.8× "super-linear" ratio
  that was really quadratic TRUE-PAIR growth in the synthetic data.);
* embeddings: shifted vec_id, vectors unchanged.

Then times each probe query at sf0.1 and sf1 (noop-format write, same
methodology as bench.py: min of WARM_REPS warm runs) and prints the
scaling ratio r = t_sf1 / t_sf0.1. With 10× data on fixed cores, linear
work ⇒ r ≈ 10 at full utilization; r ≪ 10 means fixed overhead still
dominates at sf0.1; r ≫ 10 flags a super-linear plan (the thing this
probe exists to catch). Results land in SCALE_PROBE.json.

Usage: python tools/scale_probe.py [--build-only] [names...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata", "sf1")
FACTOR = 10
WARM_REPS = 2

PROBE_QUERIES = [
    "q_ts_many_series",
    "q_graph_pagerank",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dedup_incremental",
    "q_stream_tumble",
    "q_text_tfidf",
    "q_text_stats",
    "q_tpch_q1",
    "q_tpch_q9",
    "q_tpch_q21",
    "q_agg_hash",
    "q_join_inner",
    "q_window_rank",
    "q_sim_topk",
    "q_pack_sequences",
    "q_text_ngram_lm",
    "q_text_quality_gopher",
    "q_dedup_exact_substr",
    "q_sample_reservoir",
    "q_doc_dedup_pipeline",
    "q_ts_anomaly_mad",
    # round-5 additions (r4 verdict ask #5): the uncovered expensive
    # families with plausible super-linear failure modes —
    # prefix-filter candidate growth, index growth across appends,
    # ADC-table × corpus product, CC round count on larger components
    "q_dedup_containment",
    "q_dedup_index_append",
    "q_sim_topk_pq",
    "q_dedup_cluster_star",
    # round-5 additions: the streaming ingest loop (index growth across
    # batches at 10× corpus), the Arrow audio stage, the map-only
    # canonicalize, and the two ngram-family rewrites
    "q_stream_dedup_near",
    "q_multimodal_audio_energy",
    "q_url_canonicalize",
    "q_dedup_ngram",
    "q_dedup_cluster",
    # round-6: density-preserving spatial twin (defined below, not in
    # the registry — a probe instrument, not a query)
    "q_join_spatial_radius_dp",
]


def _q_join_spatial_radius_dp(spark, sf_dir):
    """Density-preserving twin of q_join_spatial_radius (r5 verdict ask
    #4): the registry query keeps the 1000² plane fixed while the probe
    replica grows points 10×, so per-cell density — and the true answer
    itself — grows quadratically; a superlinear ratio there is ANSWER
    growth, not plan growth. This twin scales the plane area with the
    point count (side ∝ √n ⇒ constant density ⇒ ~constant answer per
    point), so its sf0.1→sf1 ratio isolates how the grid-join PLAN
    scales. Expected ~linear (≈ the q_join_inner ratio); measured and
    recorded alongside the fixed-plane entry in SCALE_PROBE.json."""
    import math

    from python_darima_spark.queries.joins import (
        points_from_customers,
        spatial_radius_join,
    )

    n = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    side = max(1000, int(1000 * math.sqrt(n / 15000)))
    return spatial_radius_join(
        points_from_customers(spark, sf_dir, side=side), r=15
    )


EXTRA_PROBES = {"q_join_spatial_radius_dp": _q_join_spatial_radius_dp}


def build() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {min(16, os.cpu_count() or 8)}")

    def copy(table: str, select: str) -> None:
        dst = f"{OUT}/{table}.parquet"
        if os.path.exists(dst):
            return
        src = f"read_parquet('{SRC}/{table}.parquet')"
        q = (
            f"COPY (SELECT {select} FROM {src} "
            f"CROSS JOIN range({FACTOR}) t(k)) TO '{dst}' (FORMAT PARQUET)"
        )
        t0 = time.perf_counter()
        con.execute(q)
        print(f"[build] {table}: {time.perf_counter() - t0:.1f}s", flush=True)

    # key-space sizes from the source (compile-time constants in the SQL)
    sizes = {
        t: con.execute(
            f"SELECT max({k}) FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
        for t, k in [
            ("customer", "c_custkey"), ("orders", "o_orderkey"),
            ("part", "p_partkey"), ("supplier", "s_suppkey"),
            ("events", "event_id"), ("documents", "doc_id"),
            ("embeddings", "vec_id"),
        ]
    }
    C, O = sizes["customer"] + 1, sizes["orders"] + 1
    P, S = sizes["part"] + 1, sizes["supplier"] + 1
    E, D, V = sizes["events"] + 1, sizes["documents"] + 1, sizes["embeddings"] + 1
    U = con.execute(
        f"SELECT max(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0] + 1

    copy("customer", f"c_custkey + k*{C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment")
    copy("orders", f"o_orderkey + k*{O} AS o_orderkey, o_custkey + k*{C} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority")
    copy("lineitem", f"l_orderkey + k*{O} AS l_orderkey, l_partkey + k*{P} AS l_partkey, l_suppkey + k*{S} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate")
    copy("part", f"p_partkey + k*{P} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice")
    copy("supplier", f"s_suppkey + k*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal")
    copy("events", f"event_id + k*{E} AS event_id, ts, user_id + k*{U} AS user_id, CASE WHEN k = 0 THEN event_type ELSE event_type || '_' || k END AS event_type, value, props")
    az = "abcdefghijklmnopqrstuvwxyz"
    rot = " ".join(
        f"WHEN {k} THEN translate(text, '{az}', '{az[k:] + az[:k]}')"
        for k in range(1, FACTOR)
    )
    rot_text = f"CASE k {rot} ELSE text END"
    copy(
        "documents",
        f"doc_id + k*{D} AS doc_id, {rot_text} AS text, lang, source, "
        f"CAST(length(text) AS INT) AS n_chars",
    )
    copy("embeddings", f"vec_id + k*{V} AS vec_id, embedding, label")
    for dim in ("nation", "region"):
        dst = f"{OUT}/{dim}.parquet"
        if not os.path.exists(dst):
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{dim}.parquet')) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    build()
    if "--build-only" in sys.argv:
        return

    from python_darima_spark.queries import registry
    from python_darima_spark.session import get_spark

    spark = get_spark()
    reg = registry()
    names = args or PROBE_QUERIES
    results: dict[str, dict] = {}
    for name in names:
        spec = reg.get(name)
        fn = spec.fn if spec is not None else EXTRA_PROBES.get(name)
        if fn is None:
            print(f"[scale] {name}: not in registry, skipped")
            continue
        row = {}
        for label, d in [("sf0.1", SRC), ("sf1", OUT)]:
            best = float("inf")
            for _ in range(WARM_REPS):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 1)
        row["factor"] = FACTOR
        results[name] = row
        print(
            f"{name:24s} sf0.1={row['sf0.1']:7.2f}s sf1={row['sf1']:7.2f}s "
            f"ratio={row['ratio']:5.1f}x",
            flush=True,
        )
    # merge into the existing artifact so partial runs (single-query
    # re-measures after a fix) don't clobber the full table. Each row
    # records the FACTOR it was measured at, and prior rows measured at
    # a different factor are discarded on merge so one artifact never
    # mixes ratios from different scale factors (ADVICE r5); rows for
    # queries no longer in the registry are dropped for the same reason.
    from python_darima_spark.queries import registry as _reg

    live = set(_reg()) | set(EXTRA_PROBES)
    merged: dict[str, dict] = {}
    if os.path.exists("SCALE_PROBE.json"):
        with open("SCALE_PROBE.json") as f:
            prior = json.load(f)
        merged = {
            n: r
            for n, r in prior.get("results", {}).items()
            if n in live
            and r.get("factor", prior.get("factor")) == FACTOR
        }
    merged.update(results)
    with open("SCALE_PROBE.json", "w") as f:
        json.dump({"factor": FACTOR, "results": merged}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
