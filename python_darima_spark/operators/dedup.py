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

import os

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_darima_spark.operators import (
    ensure_parallelism,
    fan_out,
    shuffle_width,
)
from python_darima_spark.operators.ledger import (
    commit_staged_ingest,
    staged_parquet_writer,
)

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
    row_number window at scale).

    SKINNY shuffles (round-6 sf1 profile): the digest aggregate sees only
    (digest, id) — never the text — and the final semi-join keys on the
    id alone, so when the keeper-id set fits the broadcast threshold
    (8 B/doc) the full-width rows never cross an exchange; when it does
    not, the semi-join shuffles rows once by id, still never by the
    64-char digest with text in tow."""
    agg_fn = F.min if keep == "min" else F.max
    digest = F.sha2(F.col(text_col), 256)
    keeper_ids = (
        df.select(F.col(id_col), digest.alias("_digest"))
        .groupBy("_digest")
        .agg(agg_fn(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keeper_ids, on=id_col, how="left_semi")


def char_shingles(text_col: str, k: int = 5):
    """Array of k-char shingles, JVM-side: substring at every offset.

    ALL-ASCII rows (length == octet_length, checked once per row) slice
    the UTF-8 BYTES instead: ``substring`` on a string re-scans from the
    head to find the char offset (O(offset) per shingle — O(len²) per
    document), while the binary slice is O(1); the bytes are identical
    for ASCII, so the produced shingle strings are too (r10; the
    quadratic scan dominated the whole dedup family's shingle stages).
    Non-ASCII rows keep the exact char-substring path."""
    seq = f"sequence(1, greatest(length({text_col}) - {k - 1}, 1), 1)"
    return F.expr(
        f"if(length({text_col}) = octet_length({text_col}), "
        f"transform({seq}, i -> cast(substring(cast({text_col} as binary),"
        f" i, {k}) as string)), "
        f"transform({seq}, i -> substring({text_col}, i, {k})))"
    )


def _shingle_gid(text_col: str, bin_col: str, ascii_col: str, k: int):
    """xxhash64 of the k-char shingle at exploded (1-based) offset
    ``_i`` — byte-sliced from the precomputed binary column for
    all-ASCII rows (O(1) per shingle; xxhash64 hashes raw bytes, so
    BINARY and STRING inputs with the same bytes hash identically),
    char-sliced otherwise (UTF-8 ``substring`` scans from the string
    head — O(offset) per shingle, O(len²) per doc, the r10 profile's
    dominant dedup-stage cost)."""
    return F.when(
        F.col(ascii_col),
        F.xxhash64(F.expr(f"substring({bin_col}, _i, {k})")),
    ).otherwise(F.xxhash64(F.expr(f"substring({text_col}, _i, {k})")))


def doc_shingle_gids(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
) -> DataFrame:
    """The SHARED corpus shingle stage: one ``(id, gid)`` row per
    DISTINCT shingle per document, gid = replay-stable ``xxhash64`` of
    the shingle text. Every dedup pipeline in the family starts from
    exactly this table — MinHash signatures (``pmod(gid, P)`` is the
    base hash), the containment dictionary (document frequency per
    gid), and exact set verification (sorted int-gid arrays intersect
    ~10× cheaper than 5-char-string arrays) — so a caller that computes
    it once and persists it (queries/llm_data.py `_corpus_shingles`)
    pays the corpus text scan + shingle explode a single time for the
    whole family instead of once per pipeline. A 64-bit collision
    merges one shingle pair deterministically (P ≈ n²/2⁶⁴ per doc,
    ~1e-13 at 2k shingles/doc — the same accepted bound as the
    containment dictionary).

    Shape: explode the OFFSET sequence and substring per row — NOT
    ``array_distinct(transform(...))``: Spark interprets higher-order
    lambdas row-at-a-time instead of codegen (the minhash_signatures
    measurement, 8×), and the first cut of this stage shipped with the
    HOF shape and doubled the near-dup family's wall at sf0.01 (probe
    4.0 s → 8.7 s) before the round-8 re-audit caught it. Per-doc
    distinctness comes from the (id, gid) hash aggregate — partial
    aggregation dedups map-side, no per-row array ever materializes."""
    offsets = F.sequence(
        F.lit(1),
        F.greatest(F.length(text_col) - (shingle_k - 1), F.lit(1)),
    )
    return (
        fan_out(df, id_col)
        .select(
            F.col(id_col),
            F.col(text_col),
            F.col(text_col).cast("binary").alias("_b"),
            (
                F.length(text_col) == F.expr(f"octet_length({text_col})")
            ).alias("_a"),
            F.explode(offsets).alias("_i"),
        )
        .select(
            id_col,
            _shingle_gid(text_col, "_b", "_a", shingle_k).alias("gid"),
        )
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    shingle_gids: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature → (id_col, sig: array<bigint>).

    Shape matters for speed here: shingles are EXPLODED (offset sequence +
    substring, no higher-order functions — Spark interprets HOF lambdas,
    it does not codegen them; measured 8× slower) and each of the
    ``num_hashes`` minima is a plain codegen'd ``min`` aggregate with
    map-side partial aggregation, so the only shuffle carries one
    ``num_hashes``-wide partial row per (task, doc). Duplicate shingles
    need no dedup — they cannot change a min, which is also why the
    (distinct-per-doc) shared stage gives identical signatures.

    ``shingle_gids`` — a :func:`doc_shingle_gids` table (typically the
    family-shared persisted stage) — skips the text scan + explode
    entirely: the base hash is ``pmod(gid, P)``, the same value the
    inline path computes (gid = xxhash64(shingle)).
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**30, size=num_hashes)
    b = rng.integers(0, 2**30, size=num_hashes)
    if shingle_gids is not None:
        base = shingle_gids.select(
            id_col, F.pmod("gid", F.lit(_MERSENNE_P)).alias("_h")
        )
    else:
        offsets = F.sequence(
            F.lit(1),
            F.greatest(F.length(text_col) - (shingle_k - 1), F.lit(1)),
        )
        # fan_out BEFORE the ~300×-row explode: full-core shingling, and
        # the groupBy(id) below reuses this partitioning (no second
        # exchange).
        df = fan_out(df, id_col)
        base = df.select(
            F.col(id_col),
            F.col(text_col),
            F.col(text_col).cast("binary").alias("_b"),
            (
                F.length(text_col) == F.expr(f"octet_length({text_col})")
            ).alias("_a"),
            F.explode(offsets).alias("_i"),
        ).select(
            id_col,
            F.pmod(
                _shingle_gid(text_col, "_b", "_a", shingle_k),
                F.lit(_MERSENNE_P),
            ).alias("_h"),
        )
    mins = [
        F.min(
            F.pmod(
                F.col("_h") * F.lit(int(a[i])) + F.lit(int(b[i])),
                F.lit(_MERSENNE_P),
            )
        ).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]
    return (
        base.groupBy(id_col)
        .agg(*mins)
        .select(
            id_col, F.array(*[f"_mh{i}" for i in range(num_hashes)]).alias("sig")
        )
    )


def band_hashes(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Explode a signature table to its LSH band keys:
    ``(id, band_id, band_hash)`` — n·bands skinny rows. Shared by the
    self-join (all-pairs) and probe-vs-index (incremental) shapes."""
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
    return sig_df.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, "b.band_id", "b.band_hash"
    )


def minhash_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become candidate pairs.
    Shuffle key is (band_id, band_hash) — n·bands rows total, never n².

    ``max_bucket_size``: per-bucket self-joins are quadratic in bucket
    size, so one HOT bucket (boilerplate text whose common shingles win
    several minhash minima across unrelated docs) can dominate the whole
    candidate stage — the sf1 scale probe measured candidates growing
    17× for 10× docs on the dense-vocabulary fixture for exactly this
    reason. Setting a cap skips buckets larger than the cap (one extra
    keyed count, then a semi-filter), the standard production LSH
    mitigation: a pair whose EVERY shared band is hot is dropped
    (bounded recall cost — genuinely near-dup pairs collide in many
    bands, so they survive unless all their bands are hot), while cost
    becomes ≤ cap × bucket rows. Default None keeps the exact banding
    contract the hash-checked oracles verify."""
    exploded = band_hashes(sig_df, id_col, num_bands, rows_per_band)
    if max_bucket_size is not None:
        sizes = exploded.groupBy("band_id", "band_hash").agg(
            F.count("*").alias("_bsz")
        )
        exploded = (
            exploded.join(sizes, ["band_id", "band_hash"])
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
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
    max_bucket_size: int | None = None,
    shingle_gids: DataFrame | None = None,
) -> DataFrame:
    """End-to-end near-dup pairs: MinHash → LSH candidates → signature
    Jaccard-estimate prefilter → EXACT Jaccard verification. Returns
    (id_a, id_b, jaccard) with jaccard ≥ threshold.

    Scale decisions, each measured on sf0.1 (5k docs, 138k LSH
    candidates → 256 true pairs):

    * signatures are ``persist()``-ed — the band self-join and both
      estimate-join sides would otherwise recompute the full
      scan→shingle→hash subtree (2× faster overall; on a real cluster
      this is where you'd checkpoint to storage instead);
    * candidates are prefiltered by the signature-estimated Jaccard
      (matching minhashes / num_hashes, a zip_with over two cached
      64-long arrays) at ``threshold − 0.2`` — ≈3.5σ below the target
      for 64 hashes, so true pairs survive while the ~500× excess of
      LSH false positives never reaches exact verification;
    * exact shingle SETS are built ONLY for candidate docs (a semi-join
      on the surviving pair ids), as sorted int-gid arrays — int
      intersects run ~10× cheaper than 5-char-string intersects (the
      containment_pairs measurement), and with a family-shared
      ``shingle_gids`` stage the verify pays no text re-shingle at all.
      Set-Jaccard over gids equals string Jaccard up to 64-bit
      collisions (~1e-13/doc, the containment dictionary's accepted
      bound).
    """
    rows_per_band = num_hashes // num_bands
    # inline gids feed TWO consumers (the signature aggregate and the
    # exact-verify arrays) — unpersisted, each replays the corpus
    # scan + shingle explode (the dominant stage; measured ~2 s/replay
    # at sf0.1 inside q_curation_pipeline). A caller-supplied shared
    # stage is the caller's to persist (queries/llm_data._corpus_shingles
    # does), so only the inline table is persisted here — same
    # release-by-clearCache lifecycle as `sigs` below.
    gids = (
        shingle_gids
        if shingle_gids is not None
        else doc_shingle_gids(df, text_col, id_col, shingle_k).persist()
    )
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, seed,
        shingle_gids=gids,
    ).persist()
    cands = minhash_candidate_pairs(
        sigs, id_col, num_bands, rows_per_band, max_bucket_size
    )
    est_match = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pre = (
        cands.join(
            sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sa")),
            on="id_a",
        )
        .join(
            sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sb")),
            on="id_b",
        )
        .where(
            est_match / F.lit(float(num_hashes)) >= F.lit(threshold - 0.2)
        )
        .select("id_a", "id_b")
    )
    # repartition-by-number before the CPU-heavy verify tail: the
    # survivor pairs are byte-tiny, AQE's byte-based coalescing would
    # shrink this exchange to a few partitions and run the per-pair
    # intersects on a fraction of the cores (the _probe_verified_pairs
    # round-6 finding; REPARTITION_BY_NUM is exempt from coalescing).
    # Eagerly checkpointed: the verify tail reads `pre` three times
    # (both cand_ids legs + the pair join), and without materialization
    # each read re-runs the whole sig→band→prefilter prefix — measured
    # 4 s of the 5.5 s sf0.01 wall before the round-8 re-audit.
    pre = pre.repartition(shuffle_width(df.sparkSession)).localCheckpoint(
        eager=True
    )
    # exact verify from sorted int-gid arrays, built only for docs that
    # appear in a surviving pair (semi-join) — never for the corpus
    cand_ids = (
        pre.select(F.col("id_a").alias(id_col))
        .union(pre.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    arr = (
        gids.join(cand_ids, id_col, "left_semi")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("gid")).alias("_sh"))
    )
    joined = pre.join(
        arr.select(F.col(id_col).alias("id_a"), F.col("_sh").alias("_sh_a")),
        on="id_a",
    ).join(
        arr.select(F.col(id_col).alias("id_b"), F.col("_sh").alias("_sh_b")),
        on="id_b",
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_incremental(
    new_df: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    shingle_k: int = 5,
    num_bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """INCREMENTAL near-dup: probe a NEW batch against an EXISTING corpus
    — the production shape for continuously-ingested training data,
    where re-running all-pairs dedup over 100 TB per ingest is not an
    option. Returns ``(id_new, id_old, jaccard)`` with exact shingle
    Jaccard ≥ threshold; new-vs-new duplicates are intentionally NOT
    reported (run the all-pairs pass within the batch for those).

    Same hash family and banding as :func:`minhash_near_duplicates`
    (``seed`` must match the index's), but the band join is
    new-batch × index instead of a self-join: cost scales with
    ``|new| · bands`` probe rows against the bucketed index, independent
    of corpus size per ingest. At scale the index side is a PERSISTED
    table of (band_id, band_hash, id) bucketed by band key — signatures
    are computed once at ingest and appended by
    :func:`minhash_index_append`, so each increment pays only its own
    shingling. Candidates are estimate-prefiltered and exact-verified
    from the texts, so every EMITTED pair is a true Jaccard-≥-threshold
    pair (no false positives ever). Recall is w.h.p. for pairs well
    above the threshold, not certain: a pair at similarity s collides
    in ≥1 of b bands with probability 1−(1−s^r)^b (≈64% at s=0.5 with
    b=16, r=4; >99.9% at s≥0.8), and the estimate prefilter at
    ``threshold − 0.2`` is a ~3σ margin at 64 hashes — the same
    banding-recall contract :func:`minhash_near_duplicates` documents.
    Fixtures for hash-checked oracles must therefore keep their true
    pairs comfortably above the threshold (the q_dedup_incremental
    fixture pairs sit at j ≥ 0.8, where missed-pair probability is
    < 1e-3 per pair).
    """
    rows_per_band = num_hashes // num_bands
    # NOTE (round 10): wiring the family-shared ``shingle_gids`` stage
    # through here (as minhash_probe_index does) was tried and MEASURED
    # SLOWER (4.6 vs 3.3 s isolated at sf0.1): the new/index slices are
    # disjoint, so the inline path already shingles the corpus exactly
    # once in total, fused into the signature aggregates — the shared
    # stage adds a materialization barrier + two semi-joins with no
    # reuse to amortize them (verify shingles only candidate pairs).
    sig_new = minhash_signatures(
        new_df, text_col, id_col, num_hashes, shingle_k, seed
    ).persist()
    sig_idx = minhash_signatures(
        index_df, text_col, id_col, num_hashes, shingle_k, seed
    ).persist()
    cands = (
        band_hashes(sig_new, id_col, num_bands, rows_per_band)
        .withColumnRenamed(id_col, "id_new")
        .join(
            band_hashes(sig_idx, id_col, num_bands, rows_per_band)
            .withColumnRenamed(id_col, "id_old"),
            ["band_id", "band_hash"],
        )
        .select("id_new", "id_old")
        .distinct()
    )
    result = _probe_verified_pairs(
        cands, sig_new, sig_idx, new_df, index_df,
        text_col, id_col, threshold, num_hashes, shingle_k,
    )
    sig_new.unpersist()
    sig_idx.unpersist()
    return result


def _probe_verified_pairs(
    cands: DataFrame,
    sig_new: DataFrame,
    sig_idx: DataFrame,
    new_df: DataFrame,
    old_texts: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    num_hashes: int,
    shingle_k: int,
    shingle_gids: DataFrame | None = None,
) -> DataFrame:
    """Shared tail of the incremental probe shapes: estimate-prefilter
    candidate (id_new, id_old) pairs on their signatures, then
    exact-verify — from sorted int-gid arrays when the family-shared
    ``shingle_gids`` stage is supplied (must cover both batch and
    corpus ids; no text re-shingle, ~10× cheaper intersects), else from
    the texts. Eager-materializes the (small) verified set so callers
    can release their cached signature tables immediately (a lazy
    return would leak cache entries per invocation)."""
    est_match = F.aggregate(
        F.zip_with("_sa", "_sb", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    pre = (
        cands.join(
            sig_new.select(F.col(id_col).alias("id_new"), F.col("sig").alias("_sa")),
            on="id_new",
        )
        .join(
            sig_idx.select(F.col(id_col).alias("id_old"), F.col("sig").alias("_sb")),
            on="id_old",
        )
        .where(est_match / F.lit(float(num_hashes)) >= F.lit(threshold - 0.2))
        .select("id_new", "id_old")
    )
    # materialize + explicitly widen the survivor set before the verify
    # joins: the pairs are byte-TINY but the per-pair shingling below is
    # CPU-heavy, and inside one fused plan AQE's byte-based coalescing
    # shrank this boundary to ~6 partitions — the verify tail then ran
    # on 6 of 32 cores (measured 34 s vs 14 s at sf1). persist breaks
    # the fused re-plan; repartition-by-number is exempt from AQE
    # coalescing, so the tail keeps full width.
    spark = pre.sparkSession
    tgt = shuffle_width(spark)
    pre = pre.repartition(tgt).persist()
    if shingle_gids is not None:
        new_ids = pre.select(F.col("id_new").alias(id_col)).distinct()
        old_ids = pre.select(F.col("id_old").alias(id_col)).distinct()
        arr_new = (
            shingle_gids.join(new_ids, id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("gid")).alias("_sh_a"))
            .withColumnRenamed(id_col, "id_new")
        )
        arr_old = (
            shingle_gids.join(old_ids, id_col, "left_semi")
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("gid")).alias("_sh_b"))
            .withColumnRenamed(id_col, "id_old")
        )
        joined = pre.join(arr_new, "id_new").join(arr_old, "id_old")
    else:
        # ensure_parallelism on the TEXT sides: the survivor pair set is
        # small so AQE broadcasts it, and then the per-pair shingling +
        # intersect work runs at the text table's SCAN partitioning — a
        # compact parquet corpus scans as ~6 splits and the verify stage
        # crawled on 6 cores (round-6 sf1 profile; same scan-parallelism
        # rule as the index reads above)
        joined = (
            pre.join(
                ensure_parallelism(
                    new_df.select(
                        F.col(id_col).alias("id_new"),
                        F.col(text_col).alias("_txt_a"),
                    )
                ),
                on="id_new",
            )
            .join(
                ensure_parallelism(
                    old_texts.select(
                        F.col(id_col).alias("id_old"),
                        F.col(text_col).alias("_txt_b"),
                    )
                ),
                on="id_old",
            )
            .withColumn(
                "_sh_a", F.array_distinct(char_shingles("_txt_a", shingle_k))
            )
            .withColumn(
                "_sh_b", F.array_distinct(char_shingles("_txt_b", shingle_k))
            )
        )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    result = (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_new", "id_old", F.round("jaccard", 6).alias("jaccard"))
        .localCheckpoint(eager=True)
    )
    pre.unpersist()
    return result


def minhash_index_append(
    batch_df: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 5,
    num_bands: int = 16,
    seed: int = 42,
    ingest_tag: str | None = None,
    shingle_gids: DataFrame | None = None,
) -> None:
    """WRITE path of the incremental dedup index: shingle + MinHash the
    batch ONCE and append its ``(id, sig)`` rows to ``{index}/sigs`` and
    its ``(id, band_id, band_hash)`` rows to ``{index}/bands`` (parquet,
    directory-partitioned by band_id so a probe prunes to its band).
    Each ingest pays only its own signatures — the corpus is never
    re-shingled. At cluster scale the bands table would instead be a
    metastore table ``bucketBy(N, "band_hash")`` so probe joins are
    co-located shuffle-free; the path layout here is the
    filesystem-only equivalent. Texts are NOT stored — exact
    verification joins back to the corpus by id, so the index stays
    skinny (~(8+8·num_hashes) bytes/doc + bands) no matter how large
    documents are.

    ``ingest_tag`` makes the append EXACTLY-ONCE under replay: each
    table's batch goes through the two-phase-commit directory protocol
    in :mod:`python_darima_spark.operators.ledger` (stage with
    overwrite → atomic per-file renames into the table dir → marker),
    so a caller that retries the same logical batch after a crash at
    ANY single point (e.g. a replayed foreachBatch micro-batch under
    at-least-once semantics — the round-5 ADVICE hazard in
    q_stream_dedup_near) neither duplicates nor loses signature rows —
    the commit-vs-marker window the previous marker-file ledger left
    open (round-7 VERDICT) is closed, and the ledger is scheme-routed
    through the Hadoop FileSystem API, so ``file://`` URIs and remote
    filesystems with atomic rename (HDFS, ABFS) work identically
    (round-7 ADVICE: the old whitelist handed file:// URIs to
    ``os.path``). Markers and staging dirs are underscore-prefixed —
    invisible to parquet scans — so the read path stays identical to
    untagged appends (flat layout; the ``ingest=<tag>`` partition-dir
    alternative measured ~2.5× worse probe parallelism at sf1)."""
    rows_per_band = num_hashes // num_bands
    sig = minhash_signatures(
        batch_df, text_col, id_col, num_hashes, shingle_k, seed,
        # a family-shared stage covers the whole corpus; this ingest
        # signs only ITS batch (semi-join on the batch ids)
        shingle_gids=(
            shingle_gids.join(
                batch_df.select(id_col), id_col, "left_semi"
            )
            if shingle_gids is not None
            else None
        ),
    ).persist()
    try:
        # repartition on the directory key first: ONE file per band dir
        # per ingest instead of shuffle-partition-count tiny files per
        # dir (the small-files problem compounds across ingests;
        # measured ~2× faster append+probe round trip at fixture scale)
        bands = band_hashes(
            sig, id_col, num_bands, rows_per_band
        ).repartition(num_bands, "band_id")
        # sig rows are skinny (id + num_hashes longs); writing them at
        # full shuffle width leaves shuffle-partition-count tiny files
        # PER INGEST (the small-files problem again, and each extra
        # file is one extra task commit + one extra ledger rename).
        # Scale file count with the session's width so big clusters
        # still write in parallel; parquet row groups keep reads
        # splittable either way.
        #
        # Trade-off (round-9 ADVICE): coalesce without shuffle collapses
        # the PARENT stage too, so when `sig` is recomputed for this
        # write (cache miss / eviction) the signature computation itself
        # runs at ≤ width/8 tasks — acceptable while the persist() above
        # holds (the compute ran wide once), and net-faster in the
        # bench. If sig computation ever dominates, switch to
        # repartition(n) (one extra skinny shuffle, full compute
        # parallelism) or localCheckpoint before coalescing.
        sig_out = sig.coalesce(
            max(4, shuffle_width(batch_df.sparkSession) // 8)
        )
        # The sigs table and the bands table are INDEPENDENT targets that
        # both derive from the persisted `sig`: submit the two write jobs
        # concurrently (guide §2.6 — actions are only sequential because
        # driver code calls them sequentially) so the second job's tasks
        # back-fill executors freed by the first job's tail. Safe because
        # each per-table ledger transaction is self-contained (its own
        # staging dir, marker, and tag-prefixed file names) and Spark's
        # block-level cache locks deduplicate the concurrent first
        # materialization of `sig`. A crash/replay interleaving where one
        # table commits and the other does not was already reachable
        # sequentially; the per-table replay decision table is unchanged.
        from concurrent.futures import ThreadPoolExecutor

        if ingest_tag is None:
            # untagged: plain appends; Spark's commit protocol makes a
            # died-mid-job retry safe, but a caller-level replay
            # duplicates (that is what tags are for)
            jobs = [
                lambda: sig_out.write.mode("append").parquet(
                    f"{index_path}/sigs"
                ),
                lambda: bands.write.mode("append")
                .partitionBy("band_id")
                .parquet(f"{index_path}/bands"),
            ]
        else:
            spark = batch_df.sparkSession
            jobs = [
                lambda: commit_staged_ingest(
                    spark, f"{index_path}/sigs", ingest_tag,
                    staged_parquet_writer(sig_out),
                ),
                lambda: commit_staged_ingest(
                    spark, f"{index_path}/bands", ingest_tag,
                    staged_parquet_writer(bands, partition_by="band_id"),
                ),
            ]
        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [pool.submit(j) for j in jobs]
            errs = []
            for f in futures:
                try:
                    f.result()
                except Exception as exc:  # noqa: BLE001 — re-raised below
                    errs.append(exc)
            if errs:
                raise errs[0]
    finally:
        sig.unpersist()


def minhash_probe_index(
    new_df: DataFrame,
    index_path: str,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    shingle_k: int = 5,
    num_bands: int = 16,
    seed: int = 42,
    shingle_gids: DataFrame | None = None,
) -> DataFrame:
    """PROBE a new batch against the PERSISTED index maintained by
    :func:`minhash_index_append` — the full production loop: append
    batch N, probe batch N+1 against everything ingested so far, append
    batch N+1, … Cost per ingest is O(|new|·bands) probe rows against
    the bucketed bands table + exact verification of the surviving
    candidates; the corpus is touched only by id for candidate texts
    (a semi-join-sized read, never a re-shingle). ``corpus_df`` must
    contain the texts of every id previously appended (``seed`` /
    ``num_hashes`` / ``shingle_k`` must match the index's). Same
    emitted-pair contract as :func:`minhash_incremental`: no false
    positives ever; recall w.h.p. by the banding bound documented
    there."""
    spark = new_df.sparkSession
    rows_per_band = num_hashes // num_bands
    sig_new = minhash_signatures(
        new_df, text_col, id_col, num_hashes, shingle_k, seed,
        shingle_gids=(
            shingle_gids.join(
                new_df.select(id_col), id_col, "left_semi"
            )
            if shingle_gids is not None
            else None
        ),
    ).persist()
    # ensure_parallelism on BOTH index scans (round 6): the index files
    # are few and small, so their scans plan at a handful of splits; when
    # AQE then broadcasts the (small) candidate side of the verify joins,
    # the expensive per-pair stages INHERIT that scan parallelism — a
    # measured 2.5× swing at sf1 depending on the file-split lottery.
    # Forcing the skinny index tables up to the shuffle width pins it.
    bands_idx = ensure_parallelism(
        spark.read.parquet(f"{index_path}/bands")
    )
    cands = (
        band_hashes(sig_new, id_col, num_bands, rows_per_band)
        .withColumnRenamed(id_col, "id_new")
        .join(
            bands_idx.withColumnRenamed(id_col, "id_old"),
            ["band_id", "band_hash"],
        )
        .select("id_new", "id_old")
        .distinct()
    )
    sig_idx = ensure_parallelism(spark.read.parquet(f"{index_path}/sigs"))
    result = _probe_verified_pairs(
        cands, sig_new, sig_idx, new_df, corpus_df,
        text_col, id_col, threshold, num_hashes, shingle_k,
        shingle_gids=shingle_gids,
    )
    sig_new.unpersist()
    return result


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Word n-gram Jaccard similarity with PREFIX-FILTER candidate
    generation (the containment_pairs construction applied to the
    symmetric threshold).

    History: through round 4 this used length-bucket blocking
    (``|blk_a − blk_b| ≤ 1`` rewritten as a 3-probe equi-join). The
    round-5 sf1 scale probe exposed it as degenerate on this corpus:
    with ~8–90-word docs and 64-word buckets, essentially EVERY doc
    lands in buckets 0/1, the "blocked" join is a full cross join, and
    at 10× data the candidate count grows 100× (the q_dedup_cluster_star
    probe ran >20 min at sf1 before being killed). Blocking keys must
    discriminate; a bucket wider than the corpus's length distribution
    does not.

    Candidates now come from the inverted-index prefix filter: order
    each doc's grams by global document frequency ascending and probe
    only the ``floor((1−t)·|A|)+1`` RAREST against the full index.
    Recall is provably 1.0: J(A,B) ≥ t implies |A∩B| ≥ t·|A∪B| ≥ t·|A|,
    so at most ``(1−t)·|A|`` of A's grams miss B and at least one probe
    gram must hit. Word 3-grams are overwhelmingly df=1, so posting
    lists are short and candidate volume tracks true-pair volume, not
    corpus-pair volume. The size-ratio prefilter
    ``min(|A|,|B|) ≥ t·max(|A|,|B|)`` (implied by J ≥ t) still prunes
    before any array traversal, and the union size derives as
    ``|A|+|B|−|A∩B|`` so ONE O(|A|+|B|) intersect runs per survivor.
    At 100 TB: two shuffles of the skinny (id, gram) table + keyed
    equi-joins — same posture as containment_pairs; per-gram posting
    lists can additionally be length-capped if a boilerplate gram goes
    hot (same tradeoff as the LSH ``max_bucket_size``)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(size(split(lower({text_col}), '\\\\s+')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split(lower({text_col}), '\\\\s+'), i, {n})))"
    )
    base = (
        fan_out(df, id_col)
        .select(F.col(id_col), F.array_distinct(grams).alias("_grams"))
        .withColumn("_ng", F.size("_grams"))
        .persist()
    )
    e = base.select(id_col, F.explode("_grams").alias("g")).persist()
    # df as a window count over g: one shuffle, not groupBy+join-back
    ranked = e.withColumn(
        "_df", F.count("*").over(Window.partitionBy("g"))
    ).withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy(id_col).orderBy("_df", "g")),
    )
    szs = base.select(F.col(id_col), F.col("_ng"))
    probe = (
        ranked.join(szs, id_col)
        # exact prefix bound n − ⌈t·n⌉ + 1 with an epsilon guard: the
        # float form floor((1−t)·n)+1 loses a probe at exact-threshold
        # boundaries ((1.0−0.9)·20 = 1.999…96 floors to 1), which is a
        # RECALL hole — a pair at similarity exactly t can miss
        # (hypothesis-found, round 5)
        .where(
            F.col("_rn")
            <= F.col("_ng")
            - F.ceil(F.lit(threshold) * F.col("_ng") - F.lit(1e-9))
            + 1
        )
        .select(F.col(id_col).alias("_pid"), "g")
    )
    index = e.select(F.col(id_col).alias("_iid"), "g")
    cands = (
        probe.join(index, "g")
        .where(F.col("_pid") != F.col("_iid"))
        .select(
            F.least("_pid", "_iid").alias("id_a"),
            F.greatest("_pid", "_iid").alias("id_b"),
        )
        .distinct()
    )
    joined = cands.join(
        base.select(
            F.col(id_col).alias("id_a"),
            F.col("_grams").alias("_ga"),
            F.col("_ng").alias("_na"),
        ),
        on="id_a",
    ).join(
        base.select(
            F.col(id_col).alias("id_b"),
            F.col("_grams").alias("_gb"),
            F.col("_ng").alias("_nb"),
        ),
        on="id_b",
    )
    size_ok = F.least("_na", "_nb").cast("double") >= (
        F.greatest("_na", "_nb") * threshold
    )
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.col("_na") + F.col("_nb") - inter
    result = (
        joined.where(size_ok)
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    e.unpersist()
    return result


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokenizer: str = "words",
) -> DataFrame:
    """64-bit SimHash, fully relational: explode tokens,
    64 conditional-sum partial aggregates (one shuffle on id), then
    recompose the fingerprint bits.

    ``tokenizer``: ``"words"`` (lowercased whitespace tokens — coarse,
    good when vocabularies differ) or ``"shingle5"`` (char 5-shingles —
    the same token space MinHash uses, so fingerprint distance tracks
    shingle-Jaccard; on corpora with a shared vocabulary word tokens
    saturate and near-dup/non-dup Hamming bands overlap)."""
    if tokenizer.startswith("shingle") and tokenizer[7:].isdigit():
        token_arr = F.array_distinct(char_shingles(text_col, int(tokenizer[7:])))
    elif tokenizer == "words":
        token_arr = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    else:
        raise ValueError(
            f"tokenizer must be 'words' or 'shingle<k>' (e.g. 'shingle5'), "
            f"got {tokenizer!r}"
        )
    tokens = F.explode(token_arr).alias("tok")
    hashed = fan_out(df, id_col).select(F.col(id_col), tokens).select(
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
    tokenizer: str = "words",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k. Candidate generation
    by pigeonhole: split the 64-bit fingerprint into max_hamming+1 chunks —
    any pair within distance k must agree exactly on ≥1 chunk, so bucketing
    by (chunk_id, chunk_value) finds all of them without an n² join."""
    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    # persisted: the chunk self-join below reads fingerprints twice, and
    # recomputing means re-running the token explode + 63-way aggregate
    fps = simhash(df, text_col, id_col, tokenizer).persist()
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


def simhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 7,
    threshold: float = 0.5,
    shingle_k: int = 5,
) -> DataFrame:
    """SimHash candidate generation + EXACT shingle-Jaccard verification:
    (id_a, id_b, jaccard ≥ threshold), same output contract as
    :func:`minhash_near_duplicates` so the two candidate generators are
    interchangeable (and share one SQL oracle — every emitted pair is
    exact-verified, so result equality is precisely the statement that
    SimHash banding missed no true pair).

    Fingerprints hash the SAME char-k-shingle tokens the verification
    measures, so Hamming distance tracks shingle-Jaccard; ``max_hamming=7``
    (8 pigeonhole chunks of 8 bits) holds a wide margin on realistic
    corpora — measured on the sf0.01 fixture: all 25 true pairs
    (jaccard ≥ 0.93) at Hamming ≤ 6, while only those same 25 of the
    124,750 possible pairs sit at Hamming ≤ 10 at all."""
    cands = simhash_near_duplicates(
        df, text_col, id_col, max_hamming, tokenizer=f"shingle{shingle_k}"
    ).select("id_a", "id_b")
    text = df.select(F.col(id_col), F.col(text_col))
    joined = (
        cands.join(
            text.select(
                F.col(id_col).alias("id_a"), F.col(text_col).alias("_txt_a")
            ),
            on="id_a",
        )
        .join(
            text.select(
                F.col(id_col).alias("id_b"), F.col(text_col).alias("_txt_b")
            ),
            on="id_b",
        )
        # exact shingle sets only for candidates, never for all docs
        .withColumn("_sh_a", F.array_distinct(char_shingles("_txt_a", shingle_k)))
        .withColumn("_sh_b", F.array_distinct(char_shingles("_txt_b", shingle_k)))
    )
    inter = F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
    union = F.size(F.array_union("_sh_a", "_sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    shingle_k: int = 5,
    probe_frac: float = 0.05,
    shingle_gids: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC containment |A∩B|/|A| ≥ threshold — doc-inside-doc
    detection, the case Jaccard-based dedup structurally misses (a page
    quoted verbatim inside a 100× larger page has Jaccard ≈ 0.01 but
    containment 1.0).

    Candidate generation is a COUNTING prefix filter (the PPJoin prefix
    bound generalized from "≥1 shared probe shingle" to "≥k shared"):
    order each doc's shingles by global document frequency ascending and
    probe the ``n − ⌈t·n⌉ + k`` RAREST, with ``k = max(3, ⌈ε·n⌉)``
    (ε = ``probe_frac``). A true pair's smaller doc S shares
    ≥ ⌈t·n_S⌉ shingles with its partner, so at most ``n_S − ⌈t·n_S⌉``
    of S's probes can miss — at least ``min(k, ⌈t·n_S⌉)`` probe
    shingles MUST hit the partner's inverted index. Requiring that many
    hits keeps candidate recall PROVABLY 1.0 (a deterministic counting
    bound, no hash-family luck) while slashing false candidates: on a
    dense-vocabulary corpus a random pair fakes ONE shared rare shingle
    easily, but faking ⌈ε·n⌉ of them is binomially impossible
    (round-6 measurement at sf0.1: 6.6 M candidates with k=1 → 84 k
    with k=εn, against 256 true pairs — which also made the round-5
    MinHash-estimate prefilter and its ratio-bucketed drop table
    obsolete; this replaces both). Probing costs (1−t+ε)·n instead of
    (1−t)·n rows per doc — a 1.5× candidate-join price at t=0.9 for a
    ~80× candidate cut.

    Only the SMALLER side of a pair needs to probe (the containment
    predicate is inter ≥ t·min(n_a, n_b), and the counting guarantee
    above is exactly the smaller doc's), so the index join keeps a
    probe row only when the indexed doc is larger (ids break size
    ties) — halving the join volume and making each unordered pair
    emerge from exactly one probe direction, so no distinct is needed.
    Survivors are exact-verified in both directions from
    dictionary-encoded shingle-id arrays (int arrays intersect ~10×
    cheaper than 5-char-string arrays, and the gid dictionary is the
    df table the ranking already computes). At 100 TB: the dictionary
    is a groupBy with map-side combine (broadcast when small, shuffle
    join when not — AQE decides), the probe×index join shuffles on the
    int gid, the hit-count aggregate combines map-side, and the verify
    join touches ~answer-sized pair sets; every stage is linear in
    corpus shingle volume (measured 10.0× candidates / ~4× wall at 10×
    data on local[32])."""
    # the shared corpus stage (or its inline equivalent): one (id, gid)
    # row per distinct shingle per doc; the dictionary id is a
    # DETERMINISTIC content hash, not monotonically_increasing_id — a
    # run-dependent gid is only bijective if every partition is computed
    # exactly once, and a lineage replay of a lost cached partition
    # would re-draw ids and silently mix two vocabularies in the verify
    # arrays (round-6 ADVICE, medium). xxhash64 is replay-stable; a
    # 64-bit collision merges one shingle pair deterministically
    # (P≈n²/2⁶⁴, negligible).
    src = (
        shingle_gids
        if shingle_gids is not None
        else doc_shingle_gids(df, text_col, id_col, shingle_k)
    )
    # per-gram document frequency, grouped and joined on the 8-byte gid
    # (the string shingle never leaves the shared stage). persist: the
    # df-annotated shingle table feeds FOUR consumers (ranked probe,
    # index, and the two verify array sides) — unpersisted, each one
    # replays the scan→shingle→dictionary subtree (same reasoning as
    # minhash's persisted signatures; on a cluster, checkpoint to
    # storage instead).
    d = src.groupBy("gid").agg(F.count("*").alias("_df"))
    e = src.join(d, "gid").select(id_col, "gid", "_df").persist()
    # one keyed window pass computes both the df-ascending probe rank
    # and the doc's shingle-set size (no separate sizes join)
    wdoc = Window.partitionBy(id_col)
    ranked = e.withColumn(
        "_rn", F.row_number().over(wdoc.orderBy("_df", "gid"))
    ).withColumn("_n", F.count("*").over(wdoc))
    # exact prefix bound n − ⌈t·n⌉ + k, epsilon-guarded: the float
    # floor((1−t)·n)+1 form dropped a probe at the exact-threshold
    # boundary and with it a true pair (hypothesis-found, round 5)
    kcol = F.greatest(F.lit(3), F.ceil(F.lit(probe_frac) * F.col("_n")))
    tn = F.ceil(F.lit(threshold) * F.col("_n") - F.lit(1e-9))
    probe = ranked.where(
        F.col("_rn") <= F.col("_n") - tn + kcol
    ).select(
        F.col(id_col).alias("_pid"),
        "gid",
        F.col("_n").alias("_np"),
        F.least(kcol, tn).alias("_need"),
    )
    index = ranked.select(
        F.col(id_col).alias("_iid"), "gid", F.col("_n").alias("_ni")
    )
    bigger = (F.col("_ni") > F.col("_np")) | (
        (F.col("_ni") == F.col("_np")) & (F.col("_iid") > F.col("_pid"))
    )
    cands = (
        probe.join(index, "gid")
        .where(bigger)
        .groupBy("_pid", "_iid", "_need")
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") >= F.col("_need"))
        .select("_pid", "_iid")
        # repartition-by-number before the verify tail (the
        # _probe_verified_pairs round-6 finding): survivors are
        # byte-tiny, and AQE's byte-based coalescing would otherwise
        # run the per-pair array intersects on a few partitions
        .repartition(shuffle_width(df.sparkSession))
    )
    # exact verify from the persisted gid arrays — survivors never
    # re-shingle the raw text
    arr = e.groupBy(id_col).agg(
        F.sort_array(F.collect_list("gid")).alias("_a")
    )
    joined = cands.join(
        arr.select(F.col(id_col).alias("_pid"), F.col("_a").alias("_sp")),
        on="_pid",
    ).join(
        arr.select(F.col(id_col).alias("_iid"), F.col("_a").alias("_si")),
        on="_iid",
    )
    inter = F.size(F.array_intersect("_sp", "_si")).cast("double")
    cont_p = inter / F.size("_sp")
    cont_i = inter / F.size("_si")
    # materialize the (small) survivor-pair set eagerly so the cached
    # shingle table can be released here — a lazy return would pin it
    # for the session lifetime (every invocation leaking a cache
    # entry), and the caller has no handle to unpersist it
    result = (
        joined.where(F.greatest(cont_p, cont_i) >= threshold)
        .select(
            F.least("_pid", "_iid").alias("id_a"),
            F.greatest("_pid", "_iid").alias("id_b"),
            F.round(
                F.when(F.col("_pid") < F.col("_iid"), cont_p).otherwise(
                    cont_i
                ),
                6,
            ).alias("containment_a"),
            F.round(
                F.when(F.col("_pid") < F.col("_iid"), cont_i).otherwise(
                    cont_p
                ),
                6,
            ).alias("containment_b"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    return result


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Cluster near-duplicate PAIRS into components and label every node
    with its component's min id — the step between pair detection and
    canonical-document selection in a dedup pipeline (keep one doc per
    cluster, drop the rest).

    Iterative min-label propagation: each round every node takes the min
    of its own label and its neighbors' labels — one shuffle join + one
    aggregate per round, all distributed; the driver sees only a scalar
    convergence count. Rounds needed = graph diameter, and near-dup
    clusters are overwhelmingly tiny (pairs/triples — diameter 2-3), so
    this converges in a handful of rounds; ``max_iterations`` guards the
    pathological chain. For graphs with genuinely large diameter switch
    to the large-star/small-star contraction (Kiveris et al.), which the
    same join shape expresses in O(log n) rounds.

    Each round's result is ``localCheckpoint(eager)``-ed: iterative
    DataFrame loops otherwise stack a lineage of joins that deepens the
    plan every round (re-planned from scratch each action — quadratic
    planning cost and an eventual stack overflow at scale).
    """
    # Materialize the symmetrized edge list ONCE: the loop joins it every
    # round, and the edge subtree is typically the expensive part (here a
    # full near-dup pair pipeline). Without this each round re-runs pair
    # generation from scratch.
    sym = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).localCheckpoint(eager=True)
    labels = nodes.select(F.col(id_col).alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.coalesce("nbr_label", F.col("label")) < F.col("label")).alias(
                    "_changed"
                ),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.where("_changed").limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )


def connected_components_star(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components by LARGE-STAR / SMALL-STAR contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round companion to ``connected_components``'s
    O(diameter) label propagation. Same contract: every node labeled
    with its component's min id.

    Per round, two keyed aggregates + joins over the current edge list:

    * large-star: each node attaches all STRICTLY LARGER neighbors to
      the minimum of its closed neighborhood — long tails collapse
      toward small ids without growing any adjacency;
    * small-star: each node attaches its smaller-or-equal neighbors
      (and itself) to their minimum — stars flatten.

    Near-dup graphs (diameter 2-3) don't need this; it exists for the
    big-diameter regimes label propagation can't afford (chains from
    transitive similarity, URL graphs). Iteration state is
    ``localCheckpoint``-ed per phase for the same lineage reason as the
    propagation loop; the edge list never grows beyond the distinct
    (node, min) pairs, so every round is a bounded shuffle."""
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # large-star over the symmetric adjacency
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("u", "_mn").alias("m"))
        )
        large = (
            sym.join(lmin, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over the large→small orientation
        d = large.select(
            F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
        )
        smin = d.groupBy("a").agg(F.min("b").alias("m"))
        pairs = d.join(smin, "a")
        small = (
            pairs.select(F.col("b").alias("u"), F.col("m").alias("v"))
            .union(pairs.select(F.col("a").alias("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        new_e = small.localCheckpoint(eager=True)
        # order-independent set checksum (count + xor-fold of 64-bit
        # edge hashes — xor is associative/commutative and cannot
        # overflow under ANSI mode) instead of two exceptAll passes:
        # one 1-row aggregate per phase vs two shuffled anti joins —
        # the distinct() above already guarantees both sides are sets
        def _sig(df: DataFrame) -> tuple:
            row = df.agg(
                F.count("*").alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).first()
            return (row["n"], row["h"])

        stable = _sig(new_e) == _sig(e)
        e = new_e
        if stable:
            break
    else:
        # the final groupBy(u).min(v) below is only correct at the star
        # fixpoint; labeling from an intermediate edge list would return
        # silently-wrong clusters
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iterations} iterations (expected O(log n) rounds); "
            f"raise max_iterations"
        )
    # at convergence every non-root points directly at its component min
    final = e.groupBy("u").agg(F.min("v").alias("_label"))
    return (
        nodes.select(F.col(id_col))
        .distinct()
        .join(final, F.col(id_col) == F.col("u"), "left")
        .select(
            F.col(id_col),
            F.coalesce("_label", F.col(id_col)).alias("cluster_id"),
        )
    )
