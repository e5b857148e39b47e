#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with a noop-format write (full plan runs, nothing
collects to the driver) so timings measure the distributed plan, not
toPandas serialization. The headline set spans every operator family:
scan, filter, hash-agg, joins (broadcast/SMJ/as-of), windows, UDF paths,
the DARIMA fit+combine, streaming replay, and the LLM-data ops.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q_scan_parquet",
    "q_filter_pred",
    "q_project_expr",
    "q_agg_hash",
    "q_agg_sets",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_semi_anti",
    "q_join_asof",
    "q_join_range",
    "q_window_rank",
    "q_window_frame",
    "q_sort_limit",
    "q_udf_scalar",
    "q_json_fns",
    "q_ts_resample",
    "q_ts_gapfill",
    "q_ts_fit_combine",
    "q_ts_many_series",
    "q_sink_parquet",
    "q_stream_tumble",
    "q_stream_anomaly",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_topk",
    "q_text_stats",
    "q_doc_chunk",
    "q_pack_sequences",
    "q_ts_rollup",
    "q_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q18",
    "q_subquery_corr",
    "q_join_runtime_filter",
    "q_text_tfidf",
    "q_embed_normalize",
    "q_tpch_q10",
    "q_tpch_q19",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_tpch_q2",
    "q_tpch_q21",
    "q_agg_cube",
    "q_text_classifier",
    "q_ts_eval_metrics",
    "q_graph_pagerank",
    "q_dedup_incremental",
    "q_dedup_index_append",
    "q_doc_dedup_pipeline",
    "q_multimodal_decode_real",
    "q_text_ngram_lm",
    "q_text_quality_gopher",
    "q_embed_pca",
    "q_join_interval_overlap",
    "q_dedup_exact_substr",
    "q_ts_anomaly_mad",
    "q_ts_forecast_unrolled",
    "q_ts_holt_recursive",
    "q_join_fuzzy",
    "q_text_bm25",
    "q_text_bpe_train",
    "q_text_bpe_apply",
    "q_curation_pipeline",
    "q_join_spatial_radius",
    "q_ts_gaps_islands",
    "q_basket_pairs",
    "q_agg_regression",
    "q_ts_twap",
    "q_sketch_hll_manual",
    "q_sketch_countmin",
    "q_skyline",
    "q_event_sequence",
    "q_window_distinct_rolling",
    "q_join_bloom",
    "q_graph_triangles",
    "q_rank_rrf",
    "q_scan_text",
    "q_sql_frontend",
    "q_sample_weighted_pps",
    "q_multimodal_phash",
    "q_ts_motif",
    "q_dedup_phash",
    "q_graph_labelprop",
    "q_scan_corrupt",
    "q_sink_dynamic_overwrite",
    "q_ml_ols_multifeature",
    "q_rank_trending",
    "q_agg_argmax",
    "q_ts_downsample_ltob",
    "q_ts_strength",
    "q_scan_csv_quoted",
    "q_join_asof_tolerance",
    "q_sql_recursive",
    # round-6 additions
    "q_embed_pca_planted",
    "q_ts_many_series_census",
    # the round-6 counting-prefix rewrite's flagship (was the r5
    # verdict's one scale-killer; now 2.4x at 10x data)
    "q_dedup_containment",
    # round-7 additions
    "q_text_quality_c4",
    "q_text_dedup_lines",
    "q_dedup_url",
    "q_mixture_temperature",
    "q_cdc_diff",
    "q_binpack_plan",
    "q_graph_linkpred",
    "q_ts_acf",
    "q_ts_reconcile",
    "q_embed_kmeans",
    "q_stream_watermark_late",
    "q_yoy_growth",
    "q_attribution_last_touch",
    "q_rfm_segment",
    "q_dq_freshness",
    "q_ts_combine_planted",
    "q_ts_backtest_census",
    "q_ts_hw_recursive",
    # round-8 additions
    "q_dedup_semantic",
    "q_mixture_epochs",
    "q_anonymize_k",
    "q_graph_kcore",
    "q_ts_kalman",
    "q_window_pattern",
    "q_dq_anomaly_volume",
    # round-9 additions
    "q_dedup_semantic_codebook",
    "q_anonymize_k_strict",
    # round-10 additions
    "q_dedup_semantic_codebook3",
    "q_multimodal_decode_jpeg",
    "q_multimodal_decode_jpeg_color",
    "q_multimodal_decode_jpeg420",
    "q_multimodal_decode_wav",
    "q_multimodal_decode_video",
    "q_multimodal_decode_jpeg_prog",
    "q_multimodal_decode_bmp",
    "q_multimodal_decode_png_adam7",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from python_darima_spark import get_spark
    from python_darima_spark.queries import registry

    spark = get_spark(
        app_name="python-darima-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    reg = registry()

    # Warmup: JIT the write path, spin up the Python-UDF worker pool, and
    # pull the parquet inputs through the OS page cache, so the timed
    # section measures the query plans rather than first-touch costs
    # (standard warm-run benchmarking; a production cluster is never
    # page-cache-cold for a hot table either).
    t_warm = time.perf_counter()
    spark.range(0, 1000, 1, 32).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()
    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{sf_dir}/{tbl}.parquet").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    print(f"  warmup: {time.perf_counter() - t_warm:.2f}s", file=sys.stderr)

    # Each query runs REPS times; the headline number is the fastest rep
    # (first pass pays one-off plan compilation / codegen / broadcast
    # warmup), but EVERY rep is recorded in the JSON ("reps") plus the
    # per-query median ("queries_median") so variance is visible and the
    # methodology (warm min-of-N since round 1) is auditable. Default 3
    # warm reps (round-3 advisory: min-of-2 let one noisy rep set the
    # median); loadavg is recorded before/after so ambient contention on
    # the shared host is visible next to the numbers.
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        spec = reg.get(name)
        if spec is None:
            continue
        rep_times: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            # noop sink: executes every stage, discards rows executor-side.
            df.write.format("noop").mode("overwrite").save()
            rep_times.append(time.perf_counter() - t0)
            # Per-query persist()s (MinHash signatures etc.) are scoped to
            # the query; drop them so later timings don't pay eviction/GC.
            spark.catalog.clearCache()
        rep_times.sort()
        timings[name] = round(rep_times[0], 3)
        medians[name] = round(rep_times[len(rep_times) // 2], 3)
        all_reps[name] = [round(t, 3) for t in rep_times]
        print(f"  {name}: {timings[name]:.2f}s (median {medians[name]:.2f}s)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # sf1 pass (round-4 verdict ask #4): the sf0.1 numbers are fixed-
    # overhead-dominated (SCALE_PROBE: most 10x-data ratios well below
    # 10), so the 2x-of-baseline bar is insensitive at sf0.1. When the
    # 10x-replicated dataset built by tools/scale_probe.py is present
    # (run `python tools/scale_probe.py --build-only` to create it;
    # .scaledata/ is gitignored, it's a 10x derivation of the driver's
    # own sf0.1 parquet, not new data), re-time the headline set there
    # with one fewer rep and report it alongside. Opt out with
    # SPARK_GRAFT_BENCH_SF1=0.
    sf1_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".scaledata", "sf1")
    sf1_timings: dict[str, float] = {}
    sf1_reps_n = max(1, reps - 1)
    if (
        os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0"
        and os.path.isdir(sf1_dir)
        and str(sf_val) == "0.1"
    ):
        for name in HEADLINE:
            spec = reg.get(name)
            if spec is None:
                continue
            # per-query guard: the sf1 dir is an OPTIONAL derived
            # artifact (a partial --build-only leaves tables missing);
            # one failure there must never discard the completed sf0.1
            # pass below
            try:
                rep_times = []
                for _ in range(sf1_reps_n):
                    t0 = time.perf_counter()
                    spec.fn(spark, sf1_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    rep_times.append(time.perf_counter() - t0)
                    spark.catalog.clearCache()
                sf1_timings[name] = round(min(rep_times), 3)
                print(
                    f"  [sf1] {name}: {sf1_timings[name]:.2f}s",
                    file=sys.stderr,
                )
            except Exception as exc:  # noqa: BLE001
                print(f"  [sf1] {name}: SKIPPED ({exc})", file=sys.stderr)

    # Round-9 driver artifact BENCH_r09.json recorded "parsed": null —
    # the driver tail-captures stdout and the old single JSON line
    # (with per-query reps and medians inlined) was long enough to get
    # truncated mid-line. Split the output: the COMPACT summary (the
    # driver's documented shape: metric/value/unit/queries/sf) goes to
    # stdout TWICE — first and last line — so head- or tail-capture
    # both land on a complete, parseable line; the full detail (reps,
    # medians, loadavg, sf1 per-query walls) goes to a sidecar file
    # and stderr.
    out = {
        "metric": "headline_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    detail = {
        **out,
        "queries_median": medians,
        "reps": all_reps,
        "methodology": f"warm min of {reps} reps (page-cache + UDF-pool warmup first); medians and raw reps alongside",
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "noise_note": "shared host: ambient load inflates single reps up to ~4x (PLANS.md 2.10); compare warm minima across rounds, medians within a round",
    }
    if sf1_timings:
        out["sf1_total"] = round(sum(sf1_timings.values()), 3)
        detail["sf1_total"] = out["sf1_total"]
        detail["sf1_queries"] = sf1_timings
        detail["sf1_methodology"] = (
            f"same headline set on the 10x-replicated .scaledata/sf1 "
            f"(tools/scale_probe.py derivation of sf0.1), warm min of "
            f"{sf1_reps_n} rep(s)"
        )
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail_last.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
        out["detail"] = os.path.basename(detail_path)
    except OSError as exc:  # read-only checkout: detail to stderr only
        print(f"  detail sidecar unwritable: {exc}", file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)
    line = json.dumps(out)
    print(line)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
