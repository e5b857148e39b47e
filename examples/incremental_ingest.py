"""Continuous-ingest dedup loop over a PERSISTED MinHash index — the
production shape for a training corpus that grows batch by batch:

  for each incoming batch:
      1. probe the batch against the accumulated index
         (minhash_probe_index — band equi-joins against the persisted
         band table, estimate prefilter, exact verification; cost is
         O(|batch|·bands) probe rows, independent of corpus size)
      2. drop batch docs that near-match an already-ingested doc
      3. append the survivors' signatures + band keys to the index
         (minhash_index_append — each doc is shingled exactly once,
         ever) and their rows to the corpus

At 100 TB the corpus is a partitioned parquet/lakehouse table, the index
bands live in a table bucketed by band_hash (probe joins co-located),
and this loop is the ingest job's dedup stage. Run:
``python examples/incremental_ingest.py [sf_dir]`` (default sf0.01).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from python_darima_spark import get_spark
from python_darima_spark.operators.dedup import (
    minhash_index_append,
    minhash_probe_index,
)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    root = Path(tempfile.mkdtemp(prefix="ingest_demo_"))
    index = str(root / "minhash_index")
    corpus = str(root / "corpus")

    # the stream of ingest batches: 5 slices of the fixture
    batches = [docs.where(F.col("doc_id") % 5 == k) for k in range(5)]

    # bootstrap: batch 0 is the initial corpus
    batches[0].write.mode("overwrite").parquet(corpus)
    minhash_index_append(batches[0], index)
    print(f"bootstrap: {batches[0].count()} docs ingested")

    for k, batch in enumerate(batches[1:], start=1):
        corpus_df = spark.read.parquet(corpus)
        dups = minhash_probe_index(batch, index, corpus_df, threshold=0.5)
        survivors = batch.join(
            dups.select(F.col("id_new").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        )
        n_in, n_dup = batch.count(), dups.select("id_new").distinct().count()
        survivors.write.mode("append").parquet(corpus)
        minhash_index_append(survivors, index)
        print(
            f"batch {k}: {n_in} in, {n_dup} near-dup vs corpus, "
            f"{n_in - n_dup} appended"
        )

    total = spark.read.parquet(corpus).count()
    print(f"final corpus: {total} docs (index at {index})")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
