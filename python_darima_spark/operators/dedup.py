"""Document deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame programs — shingling, hashing, banding and
verification all stay JVM-side (whole-stage codegen); there is no Python in
the hot path. Scale notes per operator:

* exact      — one hash-shuffle on the 8-byte digest; keep-first is a
               per-digest min, not a window sort over everything.
* minhash    — O(docs × shingles) map work, then LSH banding turns the
               O(n²) pair space into per-bucket joins; only candidate
               pairs (tiny at realistic thresholds) are verified exactly.
* simhash    — 64 partial aggregates per doc (one shuffle); near-dup pairs
               via pigeonhole banding on 16-bit chunks, then exact Hamming
               check with xor+bit_count.

ANSI-mode note: Spark 4 throws on bigint overflow, so the universal-hash
family (a·h+b) mod p keeps h < 2³² and a,b < 2³⁰ — products stay < 2⁶²
and never overflow, whatever spark.sql.ansi.enabled is set to.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Prime just above 2^32: keeps the base hash domain small enough that the
# affine family (a*h + b) % P never overflows a signed 64-bit value.
_MERSENNE_P = 4294967311


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup by content digest (sha2-256), keeping one representative
    per digest (the min/max id — an agg+semi-join, cheaper than a global
    row_number window at scale)."""
    agg_fn = F.min if keep == "min" else F.max
    digest = F.sha2(F.col(text_col), 256)
    keyed = df.withColumn("_digest", digest)
    keepers = keyed.groupBy("_digest").agg(agg_fn(id_col).alias(id_col))
    return keyed.join(keepers, on=["_digest", id_col], how="left_semi").drop(
        "_digest"
    )


def char_shingles(text_col: str, k: int = 5):
    """Array of k-char shingles, JVM-side: substring at every offset."""
    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {k - 1}, 1)),"
        f" i -> substring({text_col}, i, {k}))"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature: shingle → base-hash → min over an affine
    hash family. Output: (id_col, sig: array<bigint>, shingles kept for
    exact verification)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**30, size=num_hashes)
    b = rng.integers(0, 2**30, size=num_hashes)
    sh = F.array_distinct(char_shingles(text_col, shingle_k))
    base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE_P)))
    df = df.select(id_col, sh.alias("_shingles"), base.alias("_base"))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_base"),
                    lambda h: F.pmod(
                        h * F.lit(int(a[i])) + F.lit(int(b[i])),
                        F.lit(_MERSENNE_P),
                    ),
                )
            )
            for i in range(num_hashes)
        ]
    )
    return df.select(id_col, "_shingles", sig.alias("sig"))


def minhash_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.
    Shuffle key is (band_id, band_hash) — n·bands rows total, never n²."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band_id"),
                F.xxhash64(
                    F.slice("sig", i * rows_per_band + 1, rows_per_band)
                ).alias("band_hash"),
            )
            for i in range(num_bands)
        ]
    )
    exploded = sig_df.select(
        F.col(id_col), F.explode(bands).alias("b")
    ).select(id_col, "b.band_id", "b.band_hash")
    l = exploded.alias("l")
    r = exploded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    shingle_k: int = 5,
    num_bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """End-to-end near-dup pairs: MinHash → LSH candidates → EXACT Jaccard
    verification on the candidate set only. Returns
    (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, seed)
    cands = minhash_candidate_pairs(sigs, id_col, num_bands, rows_per_band)
    sh = sigs.select(F.col(id_col), F.col("_shingles"))
    joined = (
        cands.join(
            sh.select(
                F.col(id_col).alias("id_a"), F.col("_shingles").alias("_sh_a")
            ),
            on="id_a",
        ).join(
            sh.select(
                F.col(id_col).alias("id_b"), F.col("_shingles").alias("_sh_b")
            ),
            on="id_b",
        )
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    block_on_length: int = 64,
) -> DataFrame:
    """Word n-gram Jaccard similarity with cheap length-bucket blocking
    (docs whose token counts differ grossly can't clear the threshold, so
    only same-or-adjacent length buckets are compared)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), '\\\\s+')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i, {n})))"
    )
    base = df.select(
        F.col(id_col),
        F.array_distinct(grams).alias("_grams"),
        (F.size(words) / block_on_length).cast("int").alias("_blk"),
    )
    l, r = base.alias("l"), base.alias("r")
    pairs = l.join(
        r,
        (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        & (
            F.abs(F.col("l._blk") - F.col("r._blk")) <= 1
        ),
    )
    inter = F.size(F.array_intersect("l._grams", "r._grams")).cast("double")
    union = F.size(F.array_union("l._grams", "r._grams")).cast("double")
    return (
        pairs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over word tokens, fully relational: explode tokens,
    64 conditional-sum partial aggregates (one shuffle on id), then
    recompose the fingerprint bits."""
    tokens = F.explode(
        F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    ).alias("tok")
    hashed = df.select(F.col(id_col), tokens).select(
        id_col, F.xxhash64("tok").alias("h")
    )
    sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
            ).alias(f"_b{j}")
            for j in range(63)  # bit 63 is the sign bit; keep fingerprints positive
        ]
    )
    fp = None
    for j in range(63):
        term = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k. Candidate generation
    by pigeonhole: split the 64-bit fingerprint into max_hamming+1 chunks —
    any pair within distance k must agree exactly on ≥1 chunk, so bucketing
    by (chunk_id, chunk_value) finds all of them without an n² join."""
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    fps = simhash(df, text_col, id_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk_id"),
                F.shiftrightunsigned(F.col("simhash"), i * bits)
                .bitwiseAND(F.lit((1 << bits) - 1))
                .alias("chunk_val"),
            )
            for i in range(n_chunks)
        ]
    )
    exploded = fps.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", "c.chunk_id", "c.chunk_val"
    )
    l, r = exploded.alias("l"), exploded.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.simhash").alias("_fa"),
            F.col("r.simhash").alias("_fb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("_fa").bitwiseXOR(F.col("_fb")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
