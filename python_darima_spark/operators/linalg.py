"""Distributed dense linear algebra over embedding columns
(array<float>): one-pass Gram/mean statistics → driver-side
eigendecomposition → distributed projection. The PCA pattern every
embedding pipeline needs (whitening, dimensionality reduction before
IVF/PQ indexing, drift monitoring of the spectrum).

Scale shape: the ONLY thing that ever reaches the driver is one
(d + d²)-double partial per partition (d=64 → ~33 KB each), combined by
simple addition — the classic treeAggregate pattern, O(partitions), not
O(rows). The projection back out is a broadcast (k×d) matrix applied in
an Arrow-vectorized pandas_udf: map-only, no shuffle, linear in rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_stats(df: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, Σx, ΣxxT). Each partition emits a
    single partial row (count, sum vector, flattened Gram matrix); the
    driver adds them up. Driver memory is O(partitions·d²), independent
    of row count — the documented bound that makes the collect safe."""

    def partials(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype=float)
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        raise ValueError("gram_stats: empty input")
    d = len(rows[0]["s"])
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    return n, s, g


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 4
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Covariance PCA from one distributed pass: returns
    (mean[d], eigvals[k] descending, components[k, d]). Component signs
    are canonicalized (largest-|coefficient| entry made positive) so the
    decomposition is deterministic — eigenvectors are otherwise only
    defined up to ±1 and would flip between runs/platforms."""
    n, s, g = gram_stats(df, vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, vals[order], comps


def pca_project(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project every vector onto the fitted components: map-only Arrow
    batches, (k×d) matrix captured in the UDF closure (shipped once per
    executor, the broadcast pattern without the explicit Broadcast
    object)."""
    mu = np.asarray(mean, dtype=float)
    W = np.asarray(components, dtype=float)

    @F.pandas_udf("array<double>")
    def proj(vs: pd.Series) -> pd.Series:
        x = np.asarray(vs.tolist(), dtype=float)
        out = (x - mu) @ W.T
        return pd.Series([row.tolist() for row in out])

    return df.withColumn(out_col, proj(F.col(vec_col)))
