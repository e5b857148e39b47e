"""Hybrid search over the `documents`/`embeddings` tables — the full
retrieval stack a RAG system runs, composed from certified engine
operators:

  lexical leg : BM25 inverted-index scoring (q_text_bm25's shared scorer)
  semantic leg: cosine top-k — exact (brute) for the quality ceiling,
                IVF for the scale path, with measured recall between them
  fusion      : reciprocal-rank fusion (integer-exact, q_rank_rrf)

Scale shape: the BM25 leg is posting-list joins (query terms against the
term-keyed tf table — never a corpus scan per query); the semantic leg
streams the corpus once against a broadcast query panel (brute) or probes
nprobe/C of it (IVF); fusion touches only the two per-query top-k tables.
The query panel is a FIXED absolute set — panels that grow with the
corpus make query×corpus work quadratic (measured before q_rank_rrf's
bound landed).

Run: ``python examples/hybrid_search.py [sf_dir]`` (default sf0.01).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from python_darima_spark import get_spark
from python_darima_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    sample_vectors_bounded,
    train_centroids,
)
from python_darima_spark.queries import load
from python_darima_spark.queries.llm_data import _bm25_scored, q_rank_rrf


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="hybrid-search")
    t0 = time.time()

    emb = load(spark, sf, "embeddings")
    panel = emb.where((F.col("vec_id") % 101 == 1) & (F.col("vec_id") <= 1000))
    n_q = panel.count()
    print(f"query panel: {n_q} queries")

    # --- lexical leg: BM25 top-10 per query --------------------------------
    lw = Window.partitionBy("query_id").orderBy(F.desc("_si"), F.asc("doc_id"))
    bm25 = (
        _bm25_scored(spark, sf, max_query_id=1000)
        .withColumn("rank", F.row_number().over(lw))
        .where(F.col("rank") <= 10)
    )
    print(f"bm25 rows: {bm25.count()} ({time.time() - t0:.1f}s)")

    # --- semantic leg: exact vs IVF, recall measured ------------------------
    exact = cosine_topk(emb, panel, k=10)
    cents = train_centroids(
        sample_vectors_bounded(emb, n=2048), num_centroids=16, lloyd_iters=3
    )
    approx = ivf_topk(emb, panel, cents, k=10, nprobe=4)
    hit = exact.join(
        approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    total = exact.count()
    print(
        f"IVF recall@10 vs exact: {hit}/{total} = {hit / max(total, 1):.3f} "
        f"({time.time() - t0:.1f}s)"
    )

    # --- fusion: the certified RRF query ------------------------------------
    fused = q_rank_rrf(spark, sf)
    fused.orderBy("query_id", "fused_rank").show(15, truncate=False)
    print(f"total {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
