"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, dot products via zip_with + seeded fold (JVM-side),
  per-query rank window. The right baseline, and the verifier for the
  approximate paths.
* ``ivf_topk`` — the scale path: coarse-quantize the corpus to C centroids
  (one shuffle), store cluster id; queries probe only the nprobe nearest
  clusters, cutting scanned vectors by ~C/nprobe. Centroids are a
  deterministic corpus sample refined by one Lloyd step — at 100 TB you'd
  persist the clustered table bucketed by centroid_id and reuse it across
  queries.
* ``hyperplane_lsh_buckets`` — random-hyperplane signature (sign bits of
  dot with broadcast planes); same-bucket vectors are near-dup candidates
  for embedding-cosine dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_darima_spark.operators import fan_out


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` must be small (it is broadcast); the corpus side streams.
    Output: (query_id, neighbor_id, cosine) with rank ≤ k per query.
    Cosine is rounded BEFORE ranking so rank order is reproducible across
    engines; ties break by neighbor id.
    """
    # fan_out: the corpus side carries the O(n·k·dim) dot-product work and
    # must not inherit a compact scan's single partition.
    c = fan_out(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("_cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * _norm(F.col("_qv"))
    )
    if round_to is not None:
        cos = F.round(cos, round_to)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def train_centroids(
    corpus_pdf_vectors: np.ndarray, num_centroids: int, lloyd_iters: int = 1
) -> np.ndarray:
    """Deterministic k-means-lite: evenly-strided sample init + a few Lloyd
    steps, driver-side numpy on a SAMPLE (at scale: sample ≪ corpus)."""
    n = corpus_pdf_vectors.shape[0]
    stride = max(1, n // num_centroids)
    cents = corpus_pdf_vectors[::stride][:num_centroids].astype(float)
    for _ in range(lloyd_iters):
        d = corpus_pdf_vectors @ cents.T
        norms = np.linalg.norm(corpus_pdf_vectors, axis=1, keepdims=True) * (
            np.linalg.norm(cents, axis=1, keepdims=True).T + 1e-12
        )
        assign = np.argmax(d / (norms + 1e-12), axis=1)
        for j in range(cents.shape[0]):
            members = corpus_pdf_vectors[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def assign_centroids(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``centroid_id`` = argmax-cosine centroid, JVM-side: the centroid
    matrix becomes a literal array-of-arrays (broadcast with the plan)."""
    cent_lit = F.array(
        *[
            F.array(*[F.lit(float(v)) for v in row])
            for row in centroids
        ]
    )
    vec = _as_double(F.col(vec_col))
    sims = F.transform(
        cent_lit, lambda cv: _dot(cv, vec) / (_norm(cv) * _norm(vec))
    )
    best = F.array_position(sims, F.array_max(sims)) - 1
    return fan_out(corpus, id_col).withColumn("centroid_id", best.cast("int"))


def build_ivf_index(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The persistent half of IVF: corpus with ``centroid_id``, hash-
    partitioned on it so every probe join is co-located. At 100 TB you pay
    this once — write it out bucketed by centroid_id
    (``write_bucketed_table(ix, "corpus_ivf", ["centroid_id"], n)``) and
    every subsequent query set probes nprobe/C of the data with zero
    corpus-side shuffle."""
    return assign_centroids(corpus, centroids, id_col, vec_col).repartition(
        "centroid_id"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: scan only the nprobe clusters nearest each query.
    Pass a prebuilt ``index`` (from :func:`build_ivf_index`, possibly read
    back from a bucketed table) to skip re-assigning the corpus."""
    clustered = (
        index
        if index is not None
        else assign_centroids(corpus, centroids, id_col, vec_col)
    )
    qn = queries.toPandas()
    qv = np.array(qn[vec_col].tolist(), dtype=float)
    sims = (qv @ centroids.T) / (
        np.linalg.norm(qv, axis=1, keepdims=True)
        * np.linalg.norm(centroids, axis=1)[None, :]
        + 1e-12
    )
    probe = np.argsort(-sims, axis=1)[:, :nprobe]
    spark = corpus.sparkSession
    probe_df = F.broadcast(
        spark.createDataFrame(
            [
                (int(qid), int(cid))
                for qid, row in zip(qn[id_col], probe)
                for cid in row
            ],
            schema=f"query_id long, centroid_id int",
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("_qv")
    )
    cand = (
        clustered.join(probe_df, on="centroid_id")
        .join(F.broadcast(q), on="query_id")
        .where(F.col(id_col) != F.col("query_id"))
    )
    cos = _dot(_as_double(F.col(vec_col)), F.col("_qv")) / (
        _norm(_as_double(F.col(vec_col))) * _norm(F.col("_qv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        cand.withColumn("cosine", F.round(cos, 6))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cosine")
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (int) per vector: bit i = sign of
    dot(v, plane_i). Same-bucket ⇒ low angular distance w.h.p."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    vec = _as_double(F.col(vec_col))
    bucket = None
    for i, p in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(_dot(vec, plane_lit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return fan_out(df, id_col).withColumn("lsh_bucket", bucket.cast("long"))


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket candidates, then exact
    cosine verification within buckets only."""
    b = hyperplane_lsh_buckets(df, num_planes, dim, seed, id_col, vec_col)
    l = b.select(
        F.col(id_col).alias("id_a"),
        _as_double(F.col(vec_col)).alias("_va"),
        "lsh_bucket",
    )
    r = b.select(
        F.col(id_col).alias("id_b"),
        _as_double(F.col(vec_col)).alias("_vb"),
        "lsh_bucket",
    )
    pairs = l.join(r, on="lsh_bucket").where(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )
