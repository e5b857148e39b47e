"""Round-7 extension operators: data-management and curation surface a
production training-data pipeline layers on top of the core engine.

Same contract as every other query module (SURVEY.md §2C): each entry is
a Spark DataFrame program plus, where expressible, an ANSI-SQL DuckDB
oracle with IDENTICALLY aliased columns; derived doubles are quantized
with the shared tie-safe ``rhu`` (floor-based round-half-up) on BOTH
engines; money/measure aggregates run in exact integer micro-units with
one final double division so summation-order ulps can't flip the value
hash (the sf1-probe lesson from rounds 5-6).

Reference parity note: the reference repo (vladislabv/python-darima) has
no curation/lake surface — these extend the engine beyond §2A the same
way rounds 2-6 did, per the build charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_darima_spark.queries import QuerySpec, load, rhu


# ---------------------------------------------------------------------------
# q_text_quality_c4 — C4-style heuristic quality gate
# ---------------------------------------------------------------------------

# C4 (Raffel et al. 2020, §2.2) keeps pages by cheap lexical heuristics
# before any model-based scoring. The fixture is single-space word soup,
# so the discriminating gates are word-count bounds, stopword presence
# and single-word repetition; the thresholds below split the sf0.01
# corpus non-trivially (word counts range 10-99, mean 54).
_C4_MIN_WORDS = 20
_C4_MAX_WORDS = 80
_C4_MIN_STOP = 0.02    # ≥2% of tokens are {'the','a'}
_C4_MAX_REP = 0.125    # no single word >12.5% of the doc


def q_text_quality_c4(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style lexical quality gate over ``documents``.

    Every gate is a JVM higher-order-function expression over the split
    word array — map-only, no shuffle, whole-stage-codegen: at 100 TB
    this is a pure scan-side filter that composes with any downstream
    shuffle for free. The repetition gate is O(distinct·len) per doc on
    a ≤100-word array — bounded per-row work, not a join.
    """
    docs = load(spark, sf, "documents")
    ws = F.split(F.col("text"), " ")
    n_words = F.size(ws)
    stop_cnt = F.size(F.filter(ws, lambda w: w.isin("the", "a")))
    # max occurrence count of any single word
    rep_max = F.array_max(
        F.transform(
            F.array_distinct(ws),
            lambda w: F.size(F.filter(ws, lambda x: x == w)),
        )
    )
    stop_ratio = stop_cnt.cast("double") / n_words.cast("double")
    rep_ratio = rep_max.cast("double") / n_words.cast("double")
    keep = (
        (n_words >= _C4_MIN_WORDS)
        & (n_words <= _C4_MAX_WORDS)
        & (stop_ratio >= _C4_MIN_STOP)
        & (rep_ratio <= _C4_MAX_REP)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        rhu(stop_ratio, 6).alias("stop_ratio"),
        rhu(rep_ratio, 6).alias("rep_ratio"),
        keep.alias("keep"),
    )


_C4_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         len(list_filter(ws, x -> x IN ('the', 'a'))) AS stop_cnt,
         list_max(list_transform(list_distinct(ws),
                  w -> len(list_filter(ws, x -> x = w)))) AS rep_max
  FROM w
)
SELECT doc_id,
       n_words,
       floor(CAST(stop_cnt AS DOUBLE) / n_words * 1e6 + 0.5) / 1e6
           AS stop_ratio,
       floor(CAST(rep_max AS DOUBLE) / n_words * 1e6 + 0.5) / 1e6
           AS rep_ratio,
       (n_words >= {_C4_MIN_WORDS} AND n_words <= {_C4_MAX_WORDS}
        AND CAST(stop_cnt AS DOUBLE) / n_words >= {_C4_MIN_STOP}
        AND CAST(rep_max AS DOUBLE) / n_words <= {_C4_MAX_REP}) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# q_text_dedup_lines — corpus-frequency boilerplate segment removal
# ---------------------------------------------------------------------------

# C4 removes any LINE occurring ≥3 times in the corpus (nav bars, cookie
# banners). The fixture has no newlines, so the "line" unit is the
# deterministic non-overlapping 3-word segment; the semantics — global
# segment document-frequency, drop frequent segments, reassemble docs in
# order — are exactly the C4 rule.
_SEG_WORDS = 3
_SEG_MAX_DF = 2  # keep segments occurring in ≤2 distinct docs


def q_text_dedup_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate-segment removal: drop 3-word segments appearing in
    >2 distinct docs, reassemble the survivors in document order.

    Plan: segment explosion is map-side; the only shuffles are (1) the
    segment→distinct-doc-count aggregate keyed on the SEGMENT (bounded
    by vocabulary, partial-agg combines upstream) and (2) the per-doc
    reassembly keyed on doc_id. The frequent-segment table is tiny
    (boilerplate is by definition a small distinct set × huge row count,
    crushed map-side), so at 100 TB the drop step is a broadcast
    anti-join against it rather than this equi-join; the fixture-scale
    formulation joins directly which AQE already broadcasts.
    """
    docs = load(spark, sf, "documents")
    ws = F.split(F.col("text"), " ")
    n_seg = F.ceil(F.size(ws) / F.lit(float(_SEG_WORDS))).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(
            F.slice(ws, i * _SEG_WORDS + 1, _SEG_WORDS), " "
        ),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(segs).alias("pos", "seg")
    )
    freq = exploded.groupBy("seg").agg(
        F.countDistinct("doc_id").alias("df")
    )
    kept = (
        exploded.join(freq, "seg")
        .where(F.col("df") <= _SEG_MAX_DF)
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "seg"))
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )


_DEDUP_LINES_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), segs AS (
  SELECT doc_id, i AS pos,
         array_to_string(ws[(i*{_SEG_WORDS}+1):(i*{_SEG_WORDS}+{_SEG_WORDS})],
                         ' ') AS seg
  FROM w, unnest(generate_series(0,
        CAST(ceil(len(ws) / {_SEG_WORDS}.0) AS INT) - 1)) AS t(i)
), freq AS (
  SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_kept,
       string_agg(s.seg, ' ' ORDER BY s.pos) AS cleaned
FROM segs s JOIN freq f USING (seg)
WHERE f.df <= {_SEG_MAX_DF}
GROUP BY s.doc_id
"""


# ---------------------------------------------------------------------------
# q_dedup_url — canonical-URL keep-best dedup
# ---------------------------------------------------------------------------


def _messy_urls(docs: DataFrame):
    """The q_url_canonicalize planted-injection URL builder (llm_data.py):
    deterministic messy URLs per doc so the oracle checks the OPERATOR,
    not the fixture."""
    host = F.when(F.col("doc_id") % 3 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    port = F.when(F.col("doc_id") % 4 == 0, F.lit(":443")).otherwise(F.lit(""))
    slash = F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit(""))
    frag = F.when(F.col("doc_id") % 5 == 0, F.lit("#sec1")).otherwise(F.lit(""))
    raw = F.concat(
        F.lit("https://"), host, F.lit(".example.com"), port,
        F.lit("/docs/"), (F.col("doc_id") % 40).cast("string"), slash,
        F.lit("?utm_source=feed&id="), (F.col("doc_id") % 7).cast("string"),
        frag,
    )
    c = F.regexp_replace(raw, r"#.*$", "")
    c = F.regexp_replace(c, r":443/", "/")
    c = F.regexp_replace(c, r"utm_[a-z]+=[^&]*&", "")
    c = F.regexp_replace(c, r"[?&]utm_[a-z]+=[^&]*$", "")
    c = F.regexp_replace(c, r"/\?", "?")
    return F.lower(c)


def q_dedup_url(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level dedup, KEEP-BEST policy: one row per canonical URL,
    keeping the doc with the most content (max n_chars, ties to min
    doc_id) — the crawl-dedup refinement over q_url_canonicalize's
    min-id keeper (a refetch usually supersedes a truncated first
    fetch).

    Plan: map-only canonicalization, then ONE window keyed on the
    canonical URL (same shuffle a groupBy would need). 100 TB: the
    canonical URL is the natural partition key of a crawl frontier;
    this is its first and only shuffle.
    """
    docs = load(spark, sf, "documents")
    with_url = docs.select(
        "doc_id", "n_chars", _messy_urls(docs).alias("canon_url")
    )
    w = Window.partitionBy("canon_url").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        with_url.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_dups", F.count("*").over(Window.partitionBy("canon_url"))
        )
        .where(F.col("rk") == 1)
        .select(
            "canon_url",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_chars").alias("kept_chars"),
            F.col("n_dups").cast("bigint").alias("n_dups"),
        )
    )


_DEDUP_URL_ORACLE = """
WITH u AS (
  SELECT doc_id, n_chars,
         'https://' ||
         CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END ||
         '.example.com' ||
         CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
         '/docs/' || CAST(doc_id % 40 AS VARCHAR) ||
         CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END ||
         '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR) ||
         CASE WHEN doc_id % 5 = 0 THEN '#sec1' ELSE '' END AS raw_url
  FROM documents
), c AS (
  SELECT doc_id, n_chars,
         lower(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(raw_url, '#.*$', ''),
                   ':443/', '/'),
                 'utm_[a-z]+=[^&]*&', ''),
               '[?&]utm_[a-z]+=[^&]*$', ''),
             '/\\?', '?')
         ) AS canon_url
  FROM u
), r AS (
  SELECT canon_url, doc_id, n_chars,
         row_number() OVER (PARTITION BY canon_url
                            ORDER BY n_chars DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY canon_url) AS n_dups
  FROM c
)
SELECT canon_url, doc_id AS kept_doc, n_chars AS kept_chars,
       CAST(n_dups AS BIGINT) AS n_dups
FROM r WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# q_mixture_temperature — temperature-scaled domain mixture weights
# ---------------------------------------------------------------------------

# Multilingual/multi-domain pretraining upsamples small domains by
# flattening the natural distribution: w_i ∝ p_i^α (α=0.5 here, the
# classic mBERT/XLM-R temperature). Exactness: IEEE sqrt is correctly
# rounded, so both engines produce bit-identical sqrt(doubles); each
# sqrt is then quantized to integer micro-units BEFORE the sum so the
# normalizer is an exact BIGINT — no summation-order ulps.
_MIX_ALPHA_DOC = "0.5 (square root)"
_MIX_TOKEN_BUDGET = 1_000_000_000  # tokens to allocate across domains


def q_mixture_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled (α=0.5) sampling weights + exact integer token
    allocation per source domain, sized by total characters.

    Plan: one partial-agg groupBy on ``source`` (domain cardinality is
    tiny — combines map-side to O(domains) rows), then a broadcast
    1-row normalizer join. At 100 TB the per-domain census is the only
    pass over the data; everything after is driver-scale arithmetic.
    """
    docs = load(spark, sf, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    # micro-quantized sqrt(chars): exact BIGINT, deterministic
    w_micro = F.floor(
        F.sqrt(F.col("chars").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("bigint")
    scored = per_src.withColumn("w_micro", w_micro)
    tot = scored.agg(F.sum("w_micro").alias("tot_micro"))
    out = scored.crossJoin(F.broadcast(tot))
    alloc = (
        (F.col("w_micro").cast("decimal(38,0)")
         * F.lit(_MIX_TOKEN_BUDGET).cast("decimal(38,0)"))
        / F.col("tot_micro").cast("decimal(38,0)")
    )
    return out.select(
        "source",
        "n_docs",
        "chars",
        rhu(F.col("w_micro").cast("double") / F.col("tot_micro").cast("double"), 6)
        .alias("weight"),
        F.floor(alloc).cast("bigint").alias("token_alloc"),
    )


_MIXTURE_ORACLE = f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
), m AS (
  SELECT *, CAST(floor(sqrt(CAST(chars AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)
              AS w_micro
  FROM s
), t AS (SELECT sum(w_micro) AS tot_micro FROM m)
SELECT source, n_docs, chars,
       floor(CAST(w_micro AS DOUBLE) / CAST(tot_micro AS DOUBLE) * 1e6 + 0.5)
         / 1e6 AS weight,
       CAST(floor(CAST(w_micro AS HUGEINT) * {_MIX_TOKEN_BUDGET}
                  / tot_micro) AS BIGINT) AS token_alloc
FROM m, t
"""


# ---------------------------------------------------------------------------
# q_cdc_diff — change-data-capture snapshot diff
# ---------------------------------------------------------------------------

# Two deterministic snapshots are derived from orders (planted-injection
# pattern — the oracle checks the DIFF operator, not the fixture):
#   old = keys with k%10 != 7            (the %10==7 rows are later inserts)
#   new = all keys except k%13 == 3      (those got deleted)
#   and keys with k%4 == 1 had totalprice bumped +$1 (updates).
# Prices are compared in exact integer cents.


def q_cdc_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot diff (CDC): emit insert/update/delete rows between two
    versions of the orders table.

    Plan: one full-outer sort-merge join on the primary key — the
    canonical CDC shape. At 100 TB both snapshots are bucketed/sorted
    by the key in a real lake layout, so the join is co-located and
    shuffle-free; unchanged rows are filtered before any downstream
    exchange, so the diff's output (not the table) sizes the rest of
    the pipeline.
    """
    orders = load(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = orders.select("o_orderkey", cents.alias("cents"))
    old = base.where(F.col("o_orderkey") % 10 != 7).select(
        F.col("o_orderkey").alias("k"), F.col("cents").alias("old_cents")
    )
    new = (
        base.where(F.col("o_orderkey") % 13 != 3)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 4 == 1, F.col("cents") + 100)
            .otherwise(F.col("cents"))
            .alias("new_cents"),
        )
    )
    j = old.join(new, "k", "full_outer")
    op = (
        F.when(F.col("old_cents").isNull(), F.lit("insert"))
        .when(F.col("new_cents").isNull(), F.lit("delete"))
        .when(F.col("old_cents") != F.col("new_cents"), F.lit("update"))
    )
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(F.col("k").alias("o_orderkey"), "op", "old_cents", "new_cents")
    )


_CDC_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), old AS (
  SELECT o_orderkey AS k, cents AS old_cents FROM base WHERE o_orderkey % 10 != 7
), new AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 4 = 1 THEN cents + 100 ELSE cents END
           AS new_cents
  FROM base WHERE o_orderkey % 13 != 3
)
SELECT COALESCE(old.k, new.k) AS o_orderkey,
       CASE WHEN old.k IS NULL THEN 'insert'
            WHEN new.k IS NULL THEN 'delete'
            WHEN old_cents != new_cents THEN 'update' END AS op,
       old_cents, new_cents
FROM old FULL OUTER JOIN new ON old.k = new.k
WHERE old.k IS NULL OR new.k IS NULL OR old_cents != new_cents
"""


# ---------------------------------------------------------------------------
# q_binpack_plan — compaction bin-packing planner
# ---------------------------------------------------------------------------


def q_binpack_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Compaction PLANNER: assign per-month lineitem "files" (size =
    rows × 128 bytes) to target-sized compaction bins by offset packing
    — sort files by size desc, lay them end to end, bin = offset ÷
    target (target = 4× the mean file size, derived from the data so
    the plan is scale-free).

    This is the metadata half of q_sink_compaction: a real lake
    compactor first PLANS bins over the file listing (KB of metadata,
    never the data), then rewrites each bin independently. Plan: one
    partial-agg groupBy (file census) + one window over the file LIST
    — O(files), not O(rows); at 100 TB the file listing is ~10^5 rows,
    driver-scale.
    """
    li = load(spark, sf, "lineitem")
    files = (
        li.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("file_month")
        )
        .agg((F.count("*") * 128).alias("size_bytes"))
    )
    tot = files.agg(
        F.sum("size_bytes").alias("tot"), F.count("*").alias("nf")
    )
    withtot = files.crossJoin(F.broadcast(tot))
    target = F.expr("tot div nf") * 4
    w = Window.orderBy(F.desc("size_bytes"), F.asc("file_month"))
    packed = (
        withtot.withColumn("target_bytes", target.cast("bigint"))
        .withColumn(
            "start_off",
            F.coalesce(
                F.sum("size_bytes").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return packed.select(
        "file_month",
        "size_bytes",
        "target_bytes",
        F.expr("start_off div target_bytes").cast("bigint").alias("bin_id"),
    )


_BINPACK_ORACLE = """
WITH files AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS file_month,
         CAST(count(*) * 128 AS BIGINT) AS size_bytes
  FROM lineitem GROUP BY 1
), t AS (
  SELECT CAST(sum(size_bytes) // count(*) AS BIGINT) * 4 AS target_bytes
  FROM files
), packed AS (
  SELECT file_month, size_bytes, target_bytes,
         COALESCE(sum(size_bytes) OVER (
             ORDER BY size_bytes DESC, file_month ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM files, t
)
SELECT file_month, size_bytes, target_bytes,
       CAST(start_off // target_bytes AS BIGINT) AS bin_id
FROM packed
"""


QUERIES = {
    "q_text_quality_c4": QuerySpec(q_text_quality_c4, _C4_ORACLE),
    "q_text_dedup_lines": QuerySpec(q_text_dedup_lines, _DEDUP_LINES_ORACLE),
    "q_dedup_url": QuerySpec(q_dedup_url, _DEDUP_URL_ORACLE),
    "q_mixture_temperature": QuerySpec(
        q_mixture_temperature, _MIXTURE_ORACLE
    ),
    "q_cdc_diff": QuerySpec(q_cdc_diff, _CDC_ORACLE),
    "q_binpack_plan": QuerySpec(q_binpack_plan, _BINPACK_ORACLE),
}
