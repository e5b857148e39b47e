"""Data-governance pass over a training corpus — the policy stage a
curation DAG runs AFTER quality filtering and BEFORE export, composed
from certified round-8 engine operators:

  semantic dedup : SemDeDup cluster-then-threshold over the embedding
                   corpus (q_dedup_semantic's machinery) — drops
                   paraphrase-level duplicates lexical dedup can't see
  epoch schedule : per-source repeat factors with a deterministic
                   fractional-epoch subset (q_mixture_epochs) over the
                   SURVIVORS — small high-value sources train >1 epoch
  privacy gate   : k-anonymity generalization cascade over the customer
                   dimension (q_anonymize_k) — the release-side check
                   for any user-keyed metadata shipped with the corpus
  ingest audit   : trailing-window volume z-score (q_dq_anomaly_volume)
                   + CEP conversion-pattern census (q_window_pattern)
                   over the event stream feeding the corpus

Scale shape: every stage is a certified registry operator — the dedup
is broadcast-argmin + cluster-keyed self-join (linear pairs), the
schedule and privacy gates are map-only / census-chained, and the
audits are one keyed window each. Nothing here collects more than a
handful of driver-side counters.

Run: ``python examples/governance_pipeline.py [sf_dir]`` (default sf0.01).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from python_darima_spark import get_spark
from python_darima_spark.queries.llm_data import (
    q_dedup_semantic,
    q_mixture_epochs,
)
from python_darima_spark.queries.pipeline_ext import (
    q_anonymize_k,
    q_dq_anomaly_volume,
    q_window_pattern,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="governance-pipeline")
    t0 = time.time()

    # --- 1. semantic dedup: keep one doc per semantic duplicate group ---
    verdicts = q_dedup_semantic(spark, sf)
    kept = verdicts.where("kept").select("vec_id")
    n_total, n_kept = verdicts.count(), kept.count()
    print(
        f"semantic dedup: {n_total} docs -> {n_kept} kept "
        f"({n_total - n_kept} semantic dups dropped)  "
        f"[{time.time() - t0:.1f}s]"
    )

    # --- 2. epoch schedule over the survivors ---------------------------
    sched = q_mixture_epochs(spark, sf).join(
        kept.withColumnRenamed("vec_id", "doc_id"), "doc_id", "left_semi"
    )
    per_src = (
        sched.groupBy("source")
        .agg(
            F.count("*").alias("scheduled_rows"),
            F.max("epoch").alias("max_epoch"),
        )
        .orderBy(F.desc("scheduled_rows"))
    )
    top = per_src.limit(3).collect()
    n_sched = sched.count()
    print(f"epoch schedule: {n_sched} scheduled rows; top sources:")
    for r in top:
        print(
            f"  {r.source}: {r.scheduled_rows} rows, "
            f"epochs 0..{r.max_epoch}"
        )

    # --- 3. privacy gate on the user-keyed dimension ---------------------
    anon = q_anonymize_k(spark, sf)
    ladder = {
        r.gen_level: r.cnt
        for r in anon.groupBy("gen_level")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    print(f"k-anonymity ladder (level -> rows): {dict(sorted(ladder.items()))}")

    # --- 4. ingest audits -------------------------------------------------
    vol = q_dq_anomaly_volume(spark, sf)
    n_anom = vol.where("is_anomaly").count()
    print(f"volume audit: {vol.count()} judged days, {n_anom} anomalous")

    cep = q_window_pattern(spark, sf)
    conv = cep.where("converted").count()
    print(
        f"CEP census: {conv}/{cep.count()} users show the "
        f"view->click+->purchase pattern  [{time.time() - t0:.1f}s total]"
    )

    spark.stop()


if __name__ == "__main__":
    main()
