"""End-to-end LLM training-data pipeline over the `documents` table —
every stage is an engine operator, composed the way a 100 TB curation job
would be:

  scan → quality filter (stats + repetition) → language filter
       → exact dedup → MinHash near-dedup → containment → decontamination
       → source-mixture resampling → train/val/test split
       → shuffle-shard addressing → sequence packing → partitioned parquet

Scale shape: the whole pipeline is a handful of keyed shuffles (near-dup
bands, containment index, decontamination gram join, packing windows,
final write repartition) — everything else is map-only JVM expressions
(the mixture stage is a dim-sized broadcast onto a map-only filter).
Nothing ever collects to the driver; each stage's cut statistics are
computed with aggregates.

Run: ``python examples/llm_data_pipeline.py [sf_dir]`` (default sf0.01).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_darima_spark import get_spark
from python_darima_spark.functions.text import (
    hash_split_bucket,
    lang_guess,
    quality_score,
    token_count,
    word_ngrams,
)
from python_darima_spark.operators import (
    planted_source_weight,
    source_mixture_rates,
)
from python_darima_spark.operators.dedup import (
    containment_pairs,
    dedup_exact,
    minhash_near_duplicates,
)
from python_darima_spark.queries import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="llm-data-pipeline")
    t0 = time.perf_counter()

    docs = load(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality: heuristic score + duplicated-3-gram ratio, both map-only
    toks = F.split(F.lower("text"), " ")
    total3 = F.greatest(F.size(toks) - F.lit(2), F.lit(1))
    grams3 = F.transform(
        F.sequence(F.lit(1), total3),
        lambda i: F.concat_ws(" ", F.slice(toks, i, 3)),
    )
    dup_ratio = 1.0 - F.size(F.array_distinct(grams3)) / total3
    docs = docs.where(
        (quality_score("text") >= 0.4) & (dup_ratio <= F.lit(0.5))
    )

    # 2. language: keep docs whose stopword profile says English
    docs = docs.where(lang_guess("text") == "en")

    # 2b. unigram-LM perplexity band: drop the most surprising tail
    # (vocabulary probabilities broadcast back; integer micro-nat sums)
    tk = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).where(F.length("tok") > 0)
    vocab = tk.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    lp6 = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(F.log(F.col("c") / F.col("t")) * 1e6).cast("bigint").alias("lp6"),
    )
    ppl = (
        tk.join(F.broadcast(lp6), "tok")
        .groupBy("doc_id")
        .agg(F.exp(-(F.sum("lp6") / 1e6) / F.count("*")).alias("ppl"))
    )
    docs = docs.join(ppl, "doc_id").where(F.col("ppl") <= 5000).drop("ppl")

    # 3. exact dedup (sha2 digest, one agg + semi join)
    docs = dedup_exact(docs)
    # 4. near dedup: drop the higher doc_id of every verified pair;
    # then the ASYMMETRIC pass — drop docs ≥90% contained in a larger
    # surviving doc (the quote-inside-a-page case Jaccard misses)
    pairs = minhash_near_duplicates(docs, threshold=0.8)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    cont = containment_pairs(docs, threshold=0.9)
    # containment_a = |A∩B|/|A|: the CONTAINED doc is the one whose side
    # clears the threshold; keep the container, drop the contained
    contained = cont.select(
        F.when(F.col("containment_a") >= 0.9, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("doc_id")
    ).distinct()
    docs = docs.join(contained, "doc_id", "left_anti")

    # 5. decontamination vs the eval slice (doc_id % 97 == 0 stands in
    # for a benchmark set): drop corpus docs sharing any word-5-gram
    eval_grams = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 97 == 0)
        .select(F.explode(word_ngrams("text", 5)).alias("gram"))
        .distinct()
    )
    contaminated = (
        docs.select("doc_id", F.explode(word_ngrams("text", 5)).alias("gram"))
        .join(F.broadcast(eval_grams), "gram")
        .select("doc_id")
        .distinct()
    )
    docs = docs.where(F.col("doc_id") % 97 != 0).join(
        contaminated, "doc_id", "left_anti"
    )

    # 5b. mixture control: downsample over-represented sources to a
    # target share (weights planted per source index here) — one tiny
    # broadcast aggregate onto a map-only md5 filter
    rates = source_mixture_rates(docs, "source", planted_source_weight())
    # SALTED bucket — decorrelated from the split bucket below: with the
    # same hash, a source kept at rate r would survive only in buckets
    # < r·256, i.e. entirely inside the train range, starving val/test
    mix_b = hash_split_bucket(
        F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))
    )
    docs = (
        docs.join(F.broadcast(rates), "source")
        .where(mix_b.cast("double") < F.col("_rate") * 256)
        .drop("_rate")
    )

    # 6. deterministic split + global shuffle-shard addressing
    # (shard = md5 bucket, so export order is content-addressed and
    # source locality is broken) + 7. sequence packing per (split, shard)
    b = hash_split_bucket("doc_id")
    docs = (
        docs.withColumn(
            "split",
            F.when(b < 204, "train").when(b < 230, "val").otherwise("test"),
        )
        .withColumn("shard", (b % 8).cast("int"))
        .withColumn("n_tok", token_count("text"))
    )
    w = (
        Window.partitionBy("split", "shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    docs = docs.withColumn(
        "bin_id",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(2048.0)),
    )

    # 8. partitioned sink: directory pruning by split downstream
    out = os.path.join(tempfile.mkdtemp(prefix="llm_pipeline_"), "curated")
    docs.repartition("split").write.partitionBy("split").mode(
        "overwrite"
    ).parquet(out)

    stats = (
        spark.read.parquet(out)
        .groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").alias("tokens"),
            F.count_distinct("bin_id").alias("bins"),
        )
        .orderBy("split")
        .collect()
    )
    kept = sum(r.docs for r in stats)
    print(f"raw={n_raw} kept={kept} ({100.0 * kept / n_raw:.1f}%)")
    for r in stats:
        print(f"  {r.split:5s} docs={r.docs:6d} tokens={r.tokens:9d} bins={r.bins}")
    print(f"wall: {time.perf_counter() - t0:.1f}s -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
