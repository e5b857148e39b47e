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

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_darima_spark.operators import ensure_parallelism
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
    a ≤100-word array — bounded per-row work, not a join; locally the
    compact single-file scan under-partitions that per-row kernel, so
    ensure_parallelism spreads it (a no-op once the scan has splits).
    """
    docs = ensure_parallelism(load(spark, sf, "documents"))
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
    docs = ensure_parallelism(load(spark, sf, "documents"))
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
    # Exact integer floor quotient (w_micro·budget) // tot_micro with NO
    # float or rounded-decimal step: Catalyst's decimal division rounds
    # HALF_UP to scale 6 before any floor(), which floors the wrong way
    # when the true quotient sits within 5e-7 below an integer — so
    # subtract the exact decimal remainder first, making the division
    # itself integral ((p − p % t)/t is exact at any decimal scale).
    # `div` can't be used directly: its result type is BIGINT and
    # w_micro·budget overflows 2^63 at warehouse scale.
    alloc = F.expr(
        f"""CAST((CAST(w_micro AS DECIMAL(38,0)) * {_MIX_TOKEN_BUDGET}
                  - CAST(w_micro AS DECIMAL(38,0)) * {_MIX_TOKEN_BUDGET}
                    % CAST(tot_micro AS DECIMAL(38,0)))
                 / CAST(tot_micro AS DECIMAL(38,0)) AS BIGINT)"""
    )
    return out.select(
        "source",
        "n_docs",
        "chars",
        rhu(F.col("w_micro").cast("double") / F.col("tot_micro").cast("double"), 6)
        .alias("weight"),
        alloc.alias("token_alloc"),
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
       CAST(CAST(w_micro AS HUGEINT) * {_MIX_TOKEN_BUDGET}
            // CAST(tot_micro AS HUGEINT) AS BIGINT) AS token_alloc
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


# ---------------------------------------------------------------------------
# q_graph_linkpred — common-neighbor link prediction on a bipartite graph
# ---------------------------------------------------------------------------

# Customer↔part co-purchase graph from orders⋈lineitem. The classic
# common-neighbors score projects the bipartite graph onto customer
# pairs; the quadratic danger is hub parts (a part bought by B customers
# emits B²/2 pairs), so the operator carries an explicit DEGREE CAP:
# only parts with ≤ _LP_MAX_DEG distinct buyers generate candidates —
# the standard hub-suppression contract (hubs carry ~no signal for
# similarity anyway). The oracle states the same cap, so the hash
# certifies the capped semantics exactly.
_LP_MAX_DEG = 25
_LP_MIN_COMMON = 2


def q_graph_linkpred(spark: SparkSession, sf: str) -> DataFrame:
    """Common-neighbors link prediction over the customer↔part
    co-purchase graph, hub-capped.

    Plan: the bipartite edge list distincts on (part, cust) — one
    shuffle; the degree filter joins WITHOUT a broadcast hint — the
    (part, degree) table is PART-cardinality, so a forced broadcast
    would stop scaling exactly when parts do (the round-6 curation
    lesson); AQE broadcasts it at fixture scale anyway, and at 100 TB
    the join is already keyed on part like everything downstream.
    Candidate pairs come from a self-join keyed on PART, so per-key
    fan-out is ≤ cap² and the shuffle is skew-free by construction —
    the cap is the lever that keeps the projection linear in the edge
    count.
    """
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_partkey", "o_custkey")
        .distinct()
    )
    deg = edges.groupBy("l_partkey").agg(F.count("*").alias("n_buyers"))
    small = edges.join(
        deg.where(F.col("n_buyers") <= _LP_MAX_DEG), "l_partkey"
    )
    a = small.select("l_partkey", F.col("o_custkey").alias("c1"))
    b = small.select("l_partkey", F.col("o_custkey").alias("c2"))
    pairs = a.join(b, "l_partkey").where(F.col("c1") < F.col("c2"))
    return (
        pairs.groupBy("c1", "c2")
        .agg(F.count("*").alias("common_parts"))
        .where(F.col("common_parts") >= _LP_MIN_COMMON)
    )


_LINKPRED_ORACLE = f"""
WITH edges AS (
  SELECT DISTINCT l_partkey, o_custkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), deg AS (
  SELECT l_partkey, count(*) AS n_buyers FROM edges GROUP BY l_partkey
), small AS (
  SELECT e.* FROM edges e JOIN deg USING (l_partkey)
  WHERE n_buyers <= {_LP_MAX_DEG}
)
SELECT a.o_custkey AS c1, b.o_custkey AS c2,
       CAST(count(*) AS BIGINT) AS common_parts
FROM small a JOIN small b USING (l_partkey)
WHERE a.o_custkey < b.o_custkey
GROUP BY 1, 2
HAVING count(*) >= {_LP_MIN_COMMON}
"""


# ---------------------------------------------------------------------------
# q_ts_acf — integer-centered autocorrelation per series
# ---------------------------------------------------------------------------

# ACF at lags 1 and 7 over the per-type daily value series. Exactness
# contract: daily sums in integer CENTS; the series is centered by the
# FLOOR mean (an exact BIGINT), so deviations, lag products and both
# accumulator sums are exact integers on both engines — the only float
# op is the final num/den division of two BIGINTs (correctly rounded,
# then tie-safe-quantized). Magnitudes: at the 10× sf1 replica the
# worst lag-product sum is ~3e17, inside BIGINT.


def q_ts_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event_type's daily totals.

    Plan: one partial-agg groupBy to daily grain (the big shuffle, keyed
    (type, day)), then per-type windows over O(days) rows — at 100 TB
    the day-grain rollup crushes the data 10^6:1 before any window sees
    it; the window partitions by series key so 10^6 series parallelize.
    """
    ev = load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(cents).alias("x"))
    )
    wd = Window.partitionBy("event_type")
    wo = wd.orderBy("day")
    centered = (
        daily.withColumn("n_days", F.count("*").over(wd))
        .withColumn("s", F.sum("x").over(wd))
        .withColumn("dev", F.col("x") - F.expr("s div n_days"))
        .withColumn("dev_l1", F.lag("dev", 1).over(wo))
        .withColumn("dev_l7", F.lag("dev", 7).over(wo))
    )
    agg = centered.groupBy("event_type", "n_days").agg(
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        F.sum(F.col("dev") * F.col("dev_l1")).alias("num1"),
        F.sum(F.col("dev") * F.col("dev_l7")).alias("num7"),
    )
    return agg.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        rhu(F.col("num1").cast("double") / F.col("den").cast("double"), 6)
        .alias("acf_lag1"),
        rhu(F.col("num7").cast("double") / F.col("den").cast("double"), 6)
        .alias("acf_lag7"),
    )


_ACF_ORACLE = """
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), c AS (
  SELECT event_type, day, x,
         count(*) OVER (PARTITION BY event_type) AS n_days,
         x - sum(x) OVER (PARTITION BY event_type)
               // count(*) OVER (PARTITION BY event_type) AS dev
  FROM daily
), l AS (
  SELECT event_type, n_days, dev,
         lag(dev, 1) OVER (PARTITION BY event_type ORDER BY day) AS dev_l1,
         lag(dev, 7) OVER (PARTITION BY event_type ORDER BY day) AS dev_l7
  FROM c
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       floor(CAST(sum(dev * dev_l1) AS DOUBLE)
             / CAST(sum(dev * dev) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS acf_lag1,
       floor(CAST(sum(dev * dev_l7) AS DOUBLE)
             / CAST(sum(dev * dev) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS acf_lag7
FROM l GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_ts_reconcile — hierarchical forecast reconciliation (bottom-up share)
# ---------------------------------------------------------------------------

# Hierarchical forecasting: per-type naive forecasts (mean of the last
# 14 days, exact integer cents) disagree with the independently-computed
# TOTAL forecast; reconcile by allocating the top forecast to types
# proportionally to their bottom forecasts (the classic top-down-by-
# forecast-proportions scheme). All shares are exact integer products
# (HUGEINT / decimal(38,0)) with one floor division.
_RECON_WINDOW_DAYS = 14


def q_ts_reconcile(spark: SparkSession, sf: str) -> DataFrame:
    """Top-down proportional reconciliation of per-type daily forecasts
    against the aggregate forecast.

    Plan: one day-grain rollup shuffle, then O(types) arithmetic under
    a broadcast 1-row top-forecast join — the hierarchy fan-in costs
    nothing at any scale once the day grain exists.
    """
    ev = load(spark, sf, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(cents).alias("x"))
    )
    maxday = daily.agg(F.max("day").alias("mx"))
    recent = daily.crossJoin(F.broadcast(maxday)).where(
        F.col("day") >= F.col("mx") - F.expr(
            f"INTERVAL {_RECON_WINDOW_DAYS - 1} DAYS"
        )
    )
    bottom = recent.groupBy("event_type").agg(
        F.expr("sum(x) div count(*)").alias("bottom_fc")
    )
    top = recent.groupBy("day").agg(F.sum("x").alias("tot")).agg(
        F.expr("sum(tot) div count(*)").alias("top_fc")
    )
    sum_bottom = bottom.agg(F.sum("bottom_fc").alias("sum_bottom"))
    out = bottom.crossJoin(F.broadcast(top)).crossJoin(
        F.broadcast(sum_bottom)
    )
    # Exact integer quotient via the remainder trick (see
    # q_mixture_temperature): decimal division alone rounds HALF_UP at
    # scale 6 before floor(); subtracting the exact remainder first
    # makes the division integral, so no rounding can move the result.
    recon = F.expr(
        """CAST((CAST(top_fc AS DECIMAL(38,0)) * bottom_fc
                 - CAST(top_fc AS DECIMAL(38,0)) * bottom_fc
                   % CAST(sum_bottom AS DECIMAL(38,0)))
                / CAST(sum_bottom AS DECIMAL(38,0)) AS BIGINT)"""
    )
    return out.select(
        "event_type", "bottom_fc", "top_fc", recon.alias("recon_fc")
    )


_RECON_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), mx AS (SELECT max(day) AS mx FROM daily),
recent AS (
  SELECT d.* FROM daily d, mx
  WHERE d.day >= mx.mx - INTERVAL {_RECON_WINDOW_DAYS - 1} DAY
), bottom AS (
  SELECT event_type, CAST(sum(x) // count(*) AS BIGINT) AS bottom_fc
  FROM recent GROUP BY event_type
), top AS (
  SELECT CAST(sum(tot) // count(*) AS BIGINT) AS top_fc
  FROM (SELECT day, sum(x) AS tot FROM recent GROUP BY day)
), sb AS (SELECT sum(bottom_fc) AS sum_bottom FROM bottom)
SELECT event_type, bottom_fc, top_fc,
       CAST(CAST(top_fc AS HUGEINT) * bottom_fc // sum_bottom AS BIGINT)
         AS recon_fc
FROM bottom, top, sb
"""


# ---------------------------------------------------------------------------
# q_embed_kmeans — Lloyd's k-means, planted-separation hash certification
# ---------------------------------------------------------------------------

# K-means is iterative and data-dependent — normally rows-only. The
# planted-fixture trick (cf. q_embed_pca_planted) makes it hash-exact:
# points are planted on 4 integer cluster boxes 5000 apart with jitter
# ≤ 200, so (a) every assignment margin is ≥ 4000² distance units —
# float ties are impossible; (b) centroid sums are exact BIGINTs, so
# the means both engines divide are bit-identical doubles. 3 Lloyd
# iterations from fixed corner seeds therefore produce identical
# assignments and centroids on both engines, certifying the LOOP
# (assign → re-center → repeat), not just one step.
_KM_K = 4
_KM_ITERS = 3
_KM_SEEDS = [(100.0, 100.0), (5100.0, 100.0), (100.0, 5100.0), (5100.0, 5100.0)]


def _km_planted(emb: DataFrame) -> DataFrame:
    h = "cast(conv(substring(md5(cast(vec_id as string)), 1, 8), 16, 10) as bigint)"
    jx = "cast(conv(substring(md5(cast(vec_id as string)), 9, 8), 16, 10) as bigint) % 200"
    jy = "cast(conv(substring(md5(cast(vec_id as string)), 17, 8), 16, 10) as bigint) % 200"
    return emb.select(
        "vec_id",
        F.expr(f"(({h}) % {_KM_K} % 2) * 5000 + {jx}").alias("px"),
        F.expr(f"(({h}) % {_KM_K} div 2) * 5000 + {jy}").alias("py"),
    )


def q_embed_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """3-iteration Lloyd's k-means (k=4) on planted-separation 2-D
    points derived from ``embeddings.vec_id``.

    Plan: per iteration, assignment is a map-only expression over a
    k-element literal array (centroids are collected to the driver —
    an O(k) bounded collect, the same contract as the BPE argmax), and
    re-centering is one partial-agg groupBy on the cluster id. At
    100 TB: k centroids broadcast as literals; 2 map-reduce passes per
    iteration; no shuffle grows with k or data skew.
    """
    emb = load(spark, sf, "embeddings")
    pts = _km_planted(emb)
    cents = list(_KM_SEEDS)
    for _ in range(_KM_ITERS):
        dists = F.array(
            *[
                F.struct(
                    (
                        (F.col("px").cast("double") - F.lit(cx)) ** 2
                        + (F.col("py").cast("double") - F.lit(cy)) ** 2
                    ).alias("dist"),
                    F.lit(cid).alias("cid"),
                )
                for cid, (cx, cy) in enumerate(cents)
            ]
        )
        assigned = pts.withColumn("cid", F.array_min(dists)["cid"])
        stats = (
            assigned.groupBy("cid")
            .agg(
                F.sum("px").alias("sx"),
                F.sum("py").alias("sy"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        new: dict[int, tuple[float, float]] = {}
        for r in stats:
            new[r["cid"]] = (r["sx"] / r["n"], r["sy"] / r["n"])
        cents = [new.get(i, _KM_SEEDS[i]) for i in range(_KM_K)]
        final_stats = {r["cid"]: (r["sx"], r["sy"], r["n"]) for r in stats}
    rows = [
        (
            cid,
            int(final_stats[cid][2]) if cid in final_stats else 0,
            float(cents[cid][0]),
            float(cents[cid][1]),
        )
        for cid in range(_KM_K)
    ]
    out = spark.createDataFrame(rows, "cid int, n bigint, cx double, cy double")
    return out.select(
        "cid", "n", rhu(F.col("cx"), 4).alias("cx"), rhu(F.col("cy"), 4).alias("cy")
    )


def _km_oracle() -> str:
    pts = """
  SELECT vec_id,
         (CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 4 % 2) * 5000
           + CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 9, 8))
                  AS BIGINT) % 200 AS px,
         (CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
               AS BIGINT) % 4 // 2) * 5000
           + CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 17, 8))
                  AS BIGINT) % 200 AS py
  FROM embeddings
"""
    seeds = ", ".join(
        f"({cid}, CAST({cx} AS DOUBLE), CAST({cy} AS DOUBLE))"
        for cid, (cx, cy) in enumerate(_KM_SEEDS)
    )
    sql = f"WITH pts AS ({pts}), c0(cid, cx, cy) AS (VALUES {seeds})"
    prev = "c0"
    for it in range(1, _KM_ITERS + 1):
        sql += f""",
a{it} AS (
  SELECT vec_id, px, py,
         arg_min(cid, (px - cx) * (px - cx) + (py - cy) * (py - cy)) AS cid
  FROM pts, {prev}
  GROUP BY vec_id, px, py
),
c{it} AS (
  SELECT cid, CAST(sum(px) AS DOUBLE) / count(*) AS cx,
         CAST(sum(py) AS DOUBLE) / count(*) AS cy,
         CAST(count(*) AS BIGINT) AS n
  FROM a{it} GROUP BY cid
)"""
        prev = f"c{it}"
    sql += f"""
SELECT CAST(cid AS INT) AS cid, n,
       floor(cx * 1e4 + 0.5) / 1e4 AS cx,
       floor(cy * 1e4 + 0.5) / 1e4 AS cy
FROM c{_KM_ITERS}
"""
    return sql


# ---------------------------------------------------------------------------
# q_ts_combine_planted — hash certification of the coefficient COMBINE step
# ---------------------------------------------------------------------------

# The DARIMA combine (reference darima.py:260-280 mean; auto_arima.R:
# 103-110 DLSA) is the reduce half of the reference's map-reduce — but
# it sits behind the non-SQL ARIMA fit, so q_ts_fit_combine* stay
# rows-only. Planted coefficients make the combine itself hash-exact:
# per-(series, window, coef) values are md5-derived small integers
# (exact in float64 at any summation order), the ENGINE's
# combine_coefs runs on them for BOTH methods, and the oracle restates
# the mean / Σwθ÷Σw algebra in SQL. This certifies the actual
# production code path (pipeline.py:172), not a twin.
_CMB_SERIES = 5
_CMB_WINDOWS = 4
_CMB_COEFS = ["ar1", "ar2", "ar3", "beta0", "beta1", "sigma2", "n_obs"]


def _planted_coefs(spark: SparkSession) -> DataFrame:
    s = spark.range(_CMB_SERIES).select(
        F.concat(F.lit("srs"), F.col("id")).alias("series_id")
    )
    w = spark.range(_CMB_WINDOWS).select(F.col("id").alias("wid"))
    c = spark.createDataFrame(
        [(x,) for x in _CMB_COEFS], "coef string"
    )
    key = F.concat_ws("_", "series_id", "wid", "coef")
    val = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 1000
        + 1
    ).cast("double")
    return s.crossJoin(w).crossJoin(c).select(
        "series_id", "coef", val.alias("value")
    )


def q_ts_combine_planted(spark: SparkSession, sf: str) -> DataFrame:
    """The engine's cross-window coefficient combine (darima/pipeline.py
    combine_coefs) on planted integer coefficients, BOTH methods under
    one hash: ``mean`` (per-coef average, the reference's
    aggregateByKey restated as one hash aggregate) and ``dlsa``
    (Σ(w·θ)/Σw with the sigma2 row as the weight and global σ² =
    T/Σw). Plan: one partial-agg groupBy per method over long-form
    coef rows — O(series × coefs) output, the driver never holds a
    series."""
    from python_darima_spark.darima.pipeline import (
        DarimaConfig,
        combine_coefs,
    )

    planted = _planted_coefs(spark)
    out = []
    for method in ("mean", "dlsa"):
        cfg = DarimaConfig(num_windows=_CMB_WINDOWS, method=method)
        out.append(
            combine_coefs(planted, cfg).select(
                F.lit(method).alias("method"),
                "series_id",
                "coef",
                rhu(F.col("value"), 6).alias("value"),
            )
        )
    return out[0].unionByName(out[1])


def _combine_oracle() -> str:
    coefs = ", ".join(f"('{c}')" for c in _CMB_COEFS)
    return f"""
WITH s AS (
  SELECT 'srs' || CAST(i AS VARCHAR) AS series_id
  FROM unnest(generate_series(0, {_CMB_SERIES - 1})) t(i)
), w AS (
  SELECT i AS wid FROM unnest(generate_series(0, {_CMB_WINDOWS - 1})) t(i)
), c(coef) AS (VALUES {coefs}),
planted AS (
  SELECT series_id, coef,
         CAST(CAST(('0x' || substring(
                 md5(series_id || '_' || CAST(wid AS VARCHAR) || '_' || coef),
                 1, 8)) AS BIGINT) % 1000 + 1 AS DOUBLE) AS value
  FROM s, w, c
),
mean_m AS (
  SELECT 'mean' AS method, series_id, coef,
         floor(avg(value) * 1e6 + 0.5) / 1e6 AS value
  FROM planted WHERE coef != 'n_obs' GROUP BY series_id, coef
),
sums AS (
  SELECT series_id, coef, sum(value) AS value
  FROM planted GROUP BY series_id, coef
),
per_series AS (
  SELECT series_id,
         sum(CASE WHEN coef = 'sigma2' THEN value END) AS wsum,
         sum(CASE WHEN coef = 'n_obs' THEN value END) AS ttotal
  FROM planted GROUP BY series_id
),
dlsa_m AS (
  SELECT 'dlsa' AS method, sums.series_id, coef,
         floor(CASE WHEN coef = 'sigma2' THEN ttotal / wsum
                    ELSE sums.value / wsum END * 1e6 + 0.5) / 1e6 AS value
  FROM sums JOIN per_series ON sums.series_id = per_series.series_id
  WHERE coef != 'n_obs'
)
SELECT * FROM mean_m UNION ALL SELECT * FROM dlsa_m
"""


def q_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly order revenue with year-over-year growth — the canonical
    BI report shape: one day→month rollup (partial-agg crushed), then a
    lag-12 window over O(months) rows. Revenue accumulates in exact
    integer cents; the growth ratio is the single float op, tie-safe
    quantized. At 100 TB the month rollup is the only row-scale pass.
    """
    orders = load(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(cents).alias("rev_cents"))
    # Self-join on the EXPLICIT month-minus-12 key, not lag(12) over
    # month-ordered rows: a positional lag silently compares against
    # the wrong month whenever any month is missing from the data
    # (round-7 ADVICE — both engines shared the flaw, so the hash gate
    # could not see it). O(months) rows on both sides — the join is
    # metadata-sized at any data scale.
    prev_key = F.date_format(
        F.add_months(F.to_date(F.concat(F.col("month"), F.lit("-01"))), -12),
        "yyyy-MM",
    )
    cur = monthly.withColumn("prev_month_key", prev_key)
    prior = monthly.select(
        F.col("month").alias("prev_month_key"),
        F.col("rev_cents").alias("prev_year_cents"),
    )
    prev = F.col("prev_year_cents")
    return (
        cur.join(F.broadcast(prior), "prev_month_key", "left")
        .select(
            "month",
            "rev_cents",
            prev.alias("prev_year_cents"),
            rhu(
                (F.col("rev_cents") - prev).cast("double")
                / prev.cast("double"),
                6,
            ).alias("yoy_growth"),
        )
    )


_YOY_ORACLE = """
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
)
SELECT a.month, a.rev_cents,
       b.rev_cents AS prev_year_cents,
       floor(CAST(a.rev_cents - b.rev_cents AS DOUBLE)
             / CAST(b.rev_cents AS DOUBLE) * 1e6 + 0.5) / 1e6 AS yoy_growth
FROM m a
LEFT JOIN m b
  ON b.month = strftime(CAST(a.month || '-01' AS DATE)
                        - INTERVAL 12 MONTH, '%Y-%m')
"""


# ---------------------------------------------------------------------------
# q_attribution_last_touch — marketing attribution over the event stream
# ---------------------------------------------------------------------------


def q_attribution_last_touch(spark: SparkSession, sf: str) -> DataFrame:
    """LAST-TOUCH attribution: each purchase event is credited to the
    user's most recent preceding click (the ignore-nulls last_value
    carry-forward idiom, which Spark has no dedicated operator for).

    Plan: ONE window keyed on user_id ordered by (ts, event_id) — the
    deterministic total order — carrying the last click's event_id
    forward; purchases project the carried value. One exchange on
    user_id; at 100 TB users parallelize and no state outlives a key.
    """
    ev = load(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    attributed = ev.withColumn(
        "last_click_id", F.last(click_id, ignorenulls=True).over(w)
    )
    return (
        attributed.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "last_click_id",
        )
    )


_ATTRIBUTION_ORACLE = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(ts AS TIMESTAMP) AS ts
  FROM events
), carried AS (
  SELECT user_id, event_id, event_type,
         last_value(CASE WHEN event_type = 'click' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_click_id
  FROM ev
)
SELECT user_id, event_id AS purchase_id, last_click_id
FROM carried WHERE event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# q_rfm_segment — RFM customer segmentation
# ---------------------------------------------------------------------------


def q_rfm_segment(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days since last order),
    Frequency (order count) and Monetary (exact cents), each cut into
    quintiles under a fully deterministic total order (metric, then
    custkey — quintiles are ordinal, so the tie-break IS the contract).
    Segment = 100·R + 10·F + M, the classic 111-555 code.

    Plan: a naive ``ntile(5) OVER (ORDER BY ...)`` moves every customer
    through ONE window partition — the global-sort cliff. Instead each
    quintile is ``ntile_from_rank`` over :func:`global_row_number`
    (operators/relational.py): range-repartition on the total order,
    rank per range block in parallel, add O(partitions) broadcast
    prefix offsets — identical ntile semantics (the DuckDB oracle IS
    plain ``ntile(5)``), fully distributed. At 100 TB the customer
    census flows through 3 range exchanges, never one task.
    """
    from python_darima_spark.operators.relational import (
        global_row_number,
        ntile_from_rank,
    )

    orders = load(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    maxd = orders.agg(F.max("o_orderdate").alias("as_of"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(maxd))
        .withColumn("recency_days", F.datediff("as_of", "last_order"))
        # customer-census-sized; persisted because the count below plus
        # each ranking pass re-reads it — without the cache every use
        # re-executes the order rollup
        .persist()
    )
    try:
        # O(1) driver scalar (the engine-wide bounded-collect rule);
        # also lets per_cust be unpersisted before returning — the
        # eager localCheckpoints inside global_row_number cut the
        # returned plan's lineage above per_cust, so holding the cache
        # past this function only leaked executor storage across the
        # long probe/driver suites (round-7 ADVICE)
        n_cust = per_cust.count()
        ranked = global_row_number(
            per_cust, [F.asc("recency_days"), F.asc("o_custkey")], "rn_r"
        )
        ranked = global_row_number(
            ranked, [F.desc("frequency"), F.asc("o_custkey")], "rn_f"
        )
        ranked = global_row_number(
            ranked, [F.desc("monetary_cents"), F.asc("o_custkey")], "rn_m"
        )
    finally:
        per_cust.unpersist()
    nc = F.lit(n_cust)
    code = (
        ntile_from_rank(F.col("rn_r"), nc, 5) * 100
        + ntile_from_rank(F.col("rn_f"), nc, 5) * 10
        + ntile_from_rank(F.col("rn_m"), nc, 5)
    )
    return ranked.select(
        "o_custkey",
        F.col("recency_days").cast("int").alias("recency_days"),
        "frequency",
        "monetary_cents",
        code.alias("rfm_code"),
    )


_RFM_ORACLE = """
WITH hw AS (SELECT max(o_orderdate) AS as_of FROM orders),
per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate), as_of) AS INT)
           AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders, hw GROUP BY o_custkey, as_of
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) * 100
       + ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC) * 10
       + ntile(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
         AS rfm_code
FROM per_cust
"""


# ---------------------------------------------------------------------------
# q_dq_freshness — per-source data freshness / staleness audit
# ---------------------------------------------------------------------------

_FRESH_STALE_DAYS = 2


def q_dq_freshness(spark: SparkSession, sf: str) -> DataFrame:
    """Freshness audit: per source, last arrival vs the table's global
    high-water mark in whole days; sources lagging more than
    ``_FRESH_STALE_DAYS`` flag stale — the standard ingestion-health
    check next to q_dq_checks/q_dq_drift_psi. One partial-agg census +
    a broadcast 1-row high-water join; lag is exact integer days.
    """
    docs = load(spark, sf, "documents")
    # documents carry no timestamp — derive a deterministic ingest day
    # from doc_id (planted-injection pattern): day index doc_id % 29
    day = F.date_add(F.lit("2024-01-01").cast("date"), (F.col("doc_id") % 29).cast("int"))
    per_src = docs.select("source", day.alias("ingest_day")).groupBy(
        "source"
    ).agg(F.max("ingest_day").alias("last_day"), F.count("*").alias("n_docs"))
    hwm = per_src.agg(F.max("last_day").alias("hwm"))
    out = per_src.crossJoin(F.broadcast(hwm))
    lag_days = F.datediff("hwm", "last_day")
    return out.select(
        "source",
        "n_docs",
        F.col("last_day").cast("string").alias("last_day"),
        lag_days.cast("int").alias("lag_days"),
        (lag_days > _FRESH_STALE_DAYS).alias("stale"),
    )


_FRESHNESS_ORACLE = f"""
WITH d AS (
  SELECT source,
         DATE '2024-01-01' + CAST(doc_id % 29 AS INT) AS ingest_day
  FROM documents
), per_src AS (
  SELECT source, max(ingest_day) AS last_day,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM d GROUP BY source
), h AS (SELECT max(last_day) AS hwm FROM per_src)
SELECT source, n_docs,
       CAST(last_day AS VARCHAR) AS last_day,
       CAST(date_diff('day', last_day, hwm) AS INT) AS lag_days,
       date_diff('day', last_day, hwm) > {_FRESH_STALE_DAYS} AS stale
FROM per_src, h
"""


# ---------------------------------------------------------------------------
# q_ts_backtest_census — structural hash certification of the ARIMA backtest
# ---------------------------------------------------------------------------


def q_ts_backtest_census(spark: SparkSession, sf: str) -> DataFrame:
    """HASH-CERTIFIED census over the real-model rolling-origin backtest
    (the q_ts_many_series_census pattern applied to
    q_ts_backtest_arima, which stays rows-only — ARIMA MAE values are
    not SQL-restatable). The STRUCTURE is: every (series × fold) cell
    present (no silent series/fold loss through fit→combine→forecast→
    score), each scoring exactly the 24-point horizon the config
    implies, each with a finite strictly-positive MAE (a diverged fit
    yields NaN/inf and flips the flag)."""
    from python_darima_spark.queries.domain import q_ts_backtest_arima

    bt = q_ts_backtest_arima(spark, sf)
    m = F.col("mae")
    mae_pos = (
        m.isNotNull() & ~F.isnan(m) & (m > 0) & (m < F.lit(float("inf")))
    )
    return bt.select(
        "series_id",
        "fold",
        F.col("n_points").cast("bigint").alias("n_points"),
        mae_pos.cast("int").alias("mae_pos"),
    )


_BACKTEST_CENSUS_ORACLE = """
WITH s AS (SELECT DISTINCT event_type AS series_id FROM events),
f AS (SELECT unnest([1, 2, 3]) AS fold)
SELECT series_id, CAST(fold AS INT) AS fold,
       CAST(24 AS BIGINT) AS n_points, CAST(1 AS INT) AS mae_pos
FROM s, f
"""


# ---------------------------------------------------------------------------
# q_ts_hw_recursive — Holt-Winters TRIPLE recursion under the value hash
# ---------------------------------------------------------------------------

# q_ts_holt_recursive certifies the level+trend recursion; this extends
# the integer-exact trick to the full additive Holt-Winters state
# (level + trend + m seasonal slots, m=4, α=β=γ=½): every update is a
# floor-halving of BIGINT operands, so Spark's per-series Arrow loop
# and a DuckDB recursive CTE carrying the 6-column state walk identical
# integers — the SEASONAL recursion (the part q_ts_holtwinters adds
# over Holt) gets a hash check of its own.
_HW_M = 4


def q_ts_hw_recursive(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact additive Holt-Winters (m=4, α=β=γ=½) per series:

        init (t≤4):  l = (y1+..+y4) div 4,  b = 0,  s_i = y_i − l
        step (t>4):  slot = (t−1) mod 4
                     l' = (y − s_slot + l + b) div 2
                     b' = (l' − l + b) div 2
                     s_slot' = (y − l' + s_slot) div 2

    Emits the h∈{1..4} seasonal forecast (l + h·b + s_{slot(t+h)}).
    Scale: one task per series like q_ts_holtwinters — the sequential
    loop IS the operator; the driver holds nothing."""
    import pandas as pd

    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("hour", "ts").alias("ts"),
    ).agg(
        F.floor(F.sum("value") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("y_i6")
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ys = [int(v) for v in pdf["y_i6"].tolist()]
        lev = (ys[0] + ys[1] + ys[2] + ys[3]) // _HW_M
        b = 0
        s = [ys[i] - lev for i in range(_HW_M)]
        for t, y in enumerate(ys[_HW_M:], start=_HW_M + 1):
            slot = (t - 1) % _HW_M
            nl = (y - s[slot] + lev + b) // 2
            b = (nl - lev + b) // 2
            s[slot] = (y - nl + s[slot]) // 2
            lev = nl
        n = len(ys)
        hs = list(range(1, _HW_M + 1))
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "h": pd.array(hs, dtype="int32"),
                "level": lev / 1e6,
                "trend": b / 1e6,
                "yhat": [
                    (lev + h * b + s[(n + h - 1) % _HW_M]) / 1e6 for h in hs
                ],
            }
        )

    return hourly.groupBy("series_id").applyInPandas(
        _one, "series_id string, h int, level double, trend double, yhat double"
    )


def _hw_step_l() -> str:
    return (
        "CAST(floor((r.y - CASE ((r.rn - 1) % 4) + 1"
        " WHEN 1 THEN rec.s1 WHEN 2 THEN rec.s2"
        " WHEN 3 THEN rec.s3 ELSE rec.s4 END"
        " + rec.l + rec.b) / 2.0) AS BIGINT)"
    )


def _hw_oracle() -> str:
    ln = _hw_step_l()
    bn = f"CAST(floor(({ln} - rec.l + rec.b) / 2.0) AS BIGINT)"
    slots = []
    for i in (1, 2, 3, 4):
        upd = (
            f"CAST(floor((r.y - {ln} + rec.s{i}) / 2.0) AS BIGINT)"
        )
        slots.append(
            f"CASE WHEN ((r.rn - 1) % 4) + 1 = {i} THEN {upd}"
            f" ELSE rec.s{i} END"
        )
    return f"""
WITH RECURSIVE s AS (
  SELECT event_type AS series_id,
         date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ts,
         CAST(floor(sum(value) * 1e6 + 0.5) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), r AS (
  SELECT series_id, y,
         row_number() OVER (PARTITION BY series_id ORDER BY ts) AS rn
  FROM s
), mx AS (SELECT series_id, max(rn) AS t FROM r GROUP BY 1),
init AS (
  SELECT series_id,
         max(CASE rn WHEN 1 THEN y END) AS y1,
         max(CASE rn WHEN 2 THEN y END) AS y2,
         max(CASE rn WHEN 3 THEN y END) AS y3,
         max(CASE rn WHEN 4 THEN y END) AS y4
  FROM r WHERE rn <= 4 GROUP BY series_id
), rec AS (
  SELECT series_id, 4 AS rn,
         CAST(floor((y1 + y2 + y3 + y4) / 4.0) AS BIGINT) AS l,
         CAST(0 AS BIGINT) AS b,
         y1 - CAST(floor((y1 + y2 + y3 + y4) / 4.0) AS BIGINT) AS s1,
         y2 - CAST(floor((y1 + y2 + y3 + y4) / 4.0) AS BIGINT) AS s2,
         y3 - CAST(floor((y1 + y2 + y3 + y4) / 4.0) AS BIGINT) AS s3,
         y4 - CAST(floor((y1 + y2 + y3 + y4) / 4.0) AS BIGINT) AS s4
  FROM init
  UNION ALL
  SELECT r.series_id, r.rn,
         {ln},
         {bn},
         {slots[0]},
         {slots[1]},
         {slots[2]},
         {slots[3]}
  FROM rec JOIN r ON r.series_id = rec.series_id AND r.rn = rec.rn + 1
)
SELECT rec.series_id, h.h,
       rec.l / 1e6 AS level,
       rec.b / 1e6 AS trend,
       (rec.l + h.h * rec.b
        + CASE ((mx.t + h.h - 1) % 4) + 1
            WHEN 1 THEN rec.s1 WHEN 2 THEN rec.s2
            WHEN 3 THEN rec.s3 ELSE rec.s4 END) / 1e6 AS yhat
FROM rec
JOIN mx ON rec.series_id = mx.series_id AND rec.rn = mx.t
CROSS JOIN (VALUES (1), (2), (3), (4)) AS h(h)
"""


# ---------------------------------------------------------------------------
# q_stream_watermark_late — late-data DROP semantics certification
# ---------------------------------------------------------------------------

# The other q_stream_* entries replay in ts order, so their watermarks
# never actually drop anything. This entry PLANTS late arrivals: rows
# with event_id%13==0 AND ts in the FIRST HALF of the time range
# (exact integer-micros midpoint) are held out of the in-order chunks
# and replayed as the final micro-batch — by then the watermark has
# advanced days past their windows, so Spark MUST drop every one of
# them, and the oracle is simply the tumbling aggregate of the on-time
# rows under the final-emission cutoff (window_end ≤ global max ts −
# delay). A hash match certifies the drop: keeping even one late row
# shifts a group count (measured: the pre-fix formulation differed in
# 251 groups).
#
# Why first-half-only: the watermark IN FORCE while the late batch is
# processed turned out to lag one batch behind the data (it reflected
# chunks 1-2, not 1-3, of the in-order replay) — i.e. it sits at SOME
# boundary of the approximate-quantile chunk split, which no exact SQL
# oracle can restate. Late rows whose windows predate EVERY plausible
# in-force watermark (first half vs. a watermark ≥ the ~2/3 boundary
# minus 47 min) make the drop outcome boundary-independent.
_LATE_DELAY = "47 minutes"  # odd delay: no window_end ever ties a cutoff


def _stage_late_chunks(spark: SparkSession, sf_dir: str) -> str:
    """3 in-order chunks of the non-late rows + 1 trailing chunk holding
    the planted late rows (event_id%13==0, original timestamps). Same
    fingerprint-keyed staging-cache contract as stage_event_chunks."""
    import os
    import tempfile

    from python_darima_spark.operators import epoch_seconds
    from python_darima_spark.streaming.windows import _fixture_fingerprint

    tag = os.path.basename(os.path.normpath(sf_dir))
    fp = _fixture_fingerprint(sf_dir, "events")
    path = os.path.join(
        tempfile.gettempdir(), f"pds_stream_late_v2_{tag}_{fp}"
    )
    done = os.path.join(path, "_STAGED")
    if not os.path.exists(done):
        raw = (
            load(spark, sf_dir, "events")
            .withColumn("_es", epoch_seconds("ts", fractional=True))
            .withColumn("_us", F.unix_micros(F.col("ts").cast("timestamp")))
            .persist()
        )
        span = raw.agg(
            F.expr("(min(_us) + max(_us)) div 2").alias("mid")
        ).collect()[0]
        is_late = (F.col("event_id") % 13 == 0) & (
            F.col("_us") <= F.lit(int(span["mid"]))
        )
        ontime = raw.where(~is_late)
        cuts = ontime.approxQuantile("_es", [1 / 3, 2 / 3], 0.001)
        lo = [None, *cuts]
        hi = [*cuts, None]
        for i in range(1, 4):
            pred = F.lit(True)
            if lo[i - 1] is not None:
                pred = F.col("_es") >= F.lit(float(lo[i - 1]))
            if hi[i - 1] is not None:
                pred = pred & (F.col("_es") < F.lit(float(hi[i - 1])))
            (
                ontime.where(pred)
                .drop("_es", "_us")
                .sort("ts", "event_id")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, f"chunk={i:03d}"))
            )
        (
            raw.where(is_late)
            .drop("_es", "_us")
            .sort("ts", "event_id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(path, "chunk=004"))
        )
        raw.unpersist()
        open(done, "w").close()
    return path


def q_stream_watermark_late(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1 h counts per event_type under a 47-minute watermark
    with PLANTED late arrivals in the final micro-batch.

    Plan: standard streaming windowed agg — state keyed (window, type),
    late rows filtered BEFORE state access (that filter is exactly what
    this query certifies). At 100 TB the watermark bound is what keeps
    state finite; this entry is the proof the engine enforces it.
    """
    from python_darima_spark.streaming.windows import (
        read_event_stream,
        run_stream_to_table,
    )

    stream = read_event_stream(spark, _stage_late_chunks(spark, sf))
    agg = (
        stream.withWatermark("ts", _LATE_DELAY)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n")
    )
    name = run_stream_to_table(agg, "append")
    return spark.table(name)


_LATE_ORACLE = """
WITH ev0 AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, event_id FROM events
), mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM ev0
), ev AS (
  SELECT ts, event_type,
         (event_id % 13 = 0 AND epoch_us(ts) <= mid) AS late
  FROM ev0, mid
), wm AS (
  SELECT max(ts) - INTERVAL 47 MINUTE AS wm_final FROM ev
)
SELECT date_trunc('hour', ts) AS wstart, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM ev, wm
WHERE NOT late
  AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm_final
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_ts_reference_gefcom — the reference's OWN headline workload under the gate
# ---------------------------------------------------------------------------

# The reference ships GEFCom2017-style data (10 zones × ~121k hourly train
# obs, 2,879-step test horizon, /root/reference/data/*.csv) and its whole
# program is this one job (/root/reference/darima.py:492-493 +
# darima_config.json). This entry puts the SAME end-to-end job under the
# driver's value-hash gate as a census: per zone, the forecast surface is
# complete (h rows, h = that zone's test length), every point finite,
# every interval ordered (lo ≤ fc ≤ hi), and the global metrics sit inside
# the recorded band. It runs on the CHECKED-IN fixtures/gefcom downsample
# (per zone: last 8760 train hours, first 480 test hours — staged once by
# tools/stage_gefcom_fixture.py), NOT the read-only reference mount, so
# the entry is green on any machine (round-8 VERDICT "missing" #4); the
# full-121k-row accuracy band stays in tests/test_reference_accuracy.py,
# env-gated on the mount. The DuckDB oracle reads the same fixture CSVs,
# so expected zones and horizons come from the data, not from constants
# baked into the entry. Bands below are the downsample run's recorded
# metrics (mean combine: MASE 1.9194, sMAPE 0.1193, MSIS_80 8.379,
# MSIS_95 11.586) with wide margins on both sides.
_GEFCOM_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "gefcom",
)
_GEFCOM_BANDS = {
    "mase": (0.8, 3.0),
    "smape": (0.05, 0.20),
    "msis_80": (4.0, 16.0),
    "msis_95": (5.0, 22.0),
}


def q_ts_reference_gefcom(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end DARIMA on the reference's own GEFCom workload,
    hash-certified as a census (the q_ts_backtest_census pattern).

    ``sf`` is ignored by design: the reference workload IS the dataset
    (fixed 10-zone layout, checked-in downsample — see the staging note
    above), so this entry certifies the same job at every scale tier
    and on every machine. Plan: the darima pipeline itself —
    per-window Arrow ARIMA fits in parallel, O(coef) driver combine,
    distributed recursive scoring — followed by one per-zone aggregate
    over the forecast surface; nothing here adds a row-scale collect."""
    from python_darima_spark.darima.pipeline import DarimaConfig, darima
    from python_darima_spark.sources import read_reference_series_csv

    if not os.path.exists(f"{_GEFCOM_DATA}/CT_train.csv"):
        raise FileNotFoundError(
            f"checked-in GEFCom fixture missing at {_GEFCOM_DATA}; "
            "regenerate with tools/stage_gefcom_fixture.py where "
            "/root/reference/data exists"
        )
    train = read_reference_series_csv(spark, f"{_GEFCOM_DATA}/*_train.csv")
    test = read_reference_series_csv(spark, f"{_GEFCOM_DATA}/*_test.csv")
    # horizon = the (shared) per-zone test length, derived from the data
    # like the oracle derives it — an O(1) driver scalar
    h = test.groupBy("series_id").count().agg(F.max("count")).collect()[0][0]
    cfg = DarimaConfig(num_windows=4, period=24, method="mean", tol=2000)
    res = darima(train, cfg, test_df=test, h=int(h))
    s = res.scores.collect()[0].asDict()
    flags = {
        name: int(lo <= s[name] <= hi)
        for name, (lo, hi) in _GEFCOM_BANDS.items()
    }
    fc, lo, hi = F.col("mean"), F.col("lo_95"), F.col("hi_95")
    finite = ~F.isnan(fc) & (fc > F.lit(float("-inf"))) & (
        fc < F.lit(float("inf"))
    )
    return (
        res.forecasts.groupBy(F.col("series_id").alias("zone"))
        .agg(
            F.count("*").alias("fc_rows"),
            F.sum(finite.cast("bigint")).alias("fc_finite"),
            F.sum(((lo <= fc) & (fc <= hi)).cast("bigint")).alias(
                "interval_ok"
            ),
        )
        .select(
            "zone",
            "fc_rows",
            "fc_finite",
            "interval_ok",
            F.lit(flags["mase"]).cast("int").alias("mase_in_band"),
            F.lit(flags["smape"]).cast("int").alias("smape_in_band"),
            F.lit(flags["msis_80"]).cast("int").alias("msis80_in_band"),
            F.lit(flags["msis_95"]).cast("int").alias("msis95_in_band"),
        )
    )


_GEFCOM_ORACLE = f"""
WITH t AS (
  SELECT regexp_extract(filename, '([^/]+)_test\\.csv$', 1) AS zone,
         CAST(count(*) AS BIGINT) AS h
  FROM read_csv('{_GEFCOM_DATA}/*_test.csv', header=true, filename=true,
                columns={{'demand': 'DOUBLE', 'time': 'VARCHAR'}})
  GROUP BY 1
)
SELECT zone, h AS fc_rows, h AS fc_finite, h AS interval_ok,
       CAST(1 AS INT) AS mase_in_band, CAST(1 AS INT) AS smape_in_band,
       CAST(1 AS INT) AS msis80_in_band, CAST(1 AS INT) AS msis95_in_band
FROM t
"""


# ---------------------------------------------------------------------------
# q_anonymize_k — k-anonymity generalization cascade
# ---------------------------------------------------------------------------

# Generalization ladder + strict release (Sweeney 2002, k-anonymity).
# Two entries share the QI schema (level 0 = (nation, segment,
# balance-bucket), level 1 drops the bucket, level 2 drops nation too,
# level 3 = suppressed):
#
# * q_anonymize_k — the generalization LADDER: each row is assigned the
#   first level whose FULL-POPULATION QI group reaches k, and
#   group_size is that population census. This is the risk-triage
#   artifact (how far must each record generalize before its
#   population anonymity set reaches k), NOT a k-anonymous release:
#   because the released table mixes levels, a released equivalence
#   class (the rows sharing a released representation AT the same
#   level) can hold fewer than k rows (round-8 ADVICE example: a
#   10-row group ≥ k splitting into a 7-row level-0 bucket plus 3
#   fall-through rows releases a class of 3).
# * q_anonymize_k_strict — the actual k-anonymous release: rows are
#   released level by level, and each level's census counts only the
#   rows STILL UNRELEASED, so every released class is by construction
#   a ≥ k group of exactly the rows published at that level. See its
#   docstring for the class-size proof.
#
# k=6 exercises the whole ladder on the fixture: 13 rows publish at
# level 0, two (nation, segment) groups of 5 fall through to level 2,
# everything else stops at level 1.
_ANON_K = 6


def q_anonymize_k(spark: SparkSession, sf: str) -> DataFrame:
    """GENERALIZATION LADDER over ``customer`` quasi-identifiers:
    first level at which each row's full-population QI group reaches k
    (``group_size`` = that population census — see the ladder-vs-
    release note above; ``q_anonymize_k_strict`` is the release).

    Plan: three partial-agg groupBys on progressively coarser QI keys
    (group tables are O(distinct QI combos), far smaller than the fact)
    joined back on their keys — AQE broadcasts the coarse levels and
    shuffles only the finest join. Map-only after the joins; no window,
    no global state. At 100 TB: the QI censuses are one combine-heavy
    pass each, and the row-level classification is embarrassingly
    parallel — the same shape DP/k-anon release jobs run at warehouse
    scale. The balance bucket is floor(acctbal/1000) — double division
    + floor, bit-identical cross-engine."""
    cust = load(spark, sf, "customer")
    base = cust.select(
        "c_custkey",
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
        .alias("qi_bal_bucket"),
    )
    # One fact pass: the coarser censuses re-aggregate the finest one
    # (Σn0 over a bucket = n1, Σn1 over a nation = n2) — metadata-sized
    # inputs instead of three scans of the fact table.
    g0 = base.groupBy("qi_nation", "qi_segment", "qi_bal_bucket").agg(
        F.count("*").alias("n0")
    )
    g1 = g0.groupBy("qi_nation", "qi_segment").agg(
        F.sum("n0").alias("n1")
    )
    g2 = g1.groupBy("qi_segment").agg(F.sum("n1").alias("n2"))
    joined = (
        base.join(g0, ["qi_nation", "qi_segment", "qi_bal_bucket"])
        .join(g1, ["qi_nation", "qi_segment"])
        .join(g2, ["qi_segment"])
    )
    k = _ANON_K
    lvl = (
        F.when(F.col("n0") >= k, 0)
        .when(F.col("n1") >= k, 1)
        .when(F.col("n2") >= k, 2)
        .otherwise(3)
    )
    return joined.select(
        "c_custkey",
        lvl.cast("int").alias("gen_level"),
        F.when(lvl <= 1, F.col("qi_nation")).alias("anon_nation"),
        F.when(lvl <= 2, F.col("qi_segment")).alias("anon_segment"),
        F.when(lvl <= 0, F.col("qi_bal_bucket")).alias("anon_bal_bucket"),
        F.when(lvl == 0, F.col("n0"))
        .when(lvl == 1, F.col("n1"))
        .when(lvl == 2, F.col("n2"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("group_size"),
    )


_ANON_ORACLE = f"""
WITH base AS (
  SELECT c_custkey, c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS qi_bal_bucket
  FROM customer
), g0 AS (
  SELECT qi_nation, qi_segment, qi_bal_bucket, count(*) AS n0
  FROM base GROUP BY 1, 2, 3
), g1 AS (
  SELECT qi_nation, qi_segment, count(*) AS n1 FROM base GROUP BY 1, 2
), g2 AS (
  SELECT qi_segment, count(*) AS n2 FROM base GROUP BY 1
), lv AS (
  SELECT b.*, n0, n1, n2,
         CASE WHEN n0 >= {_ANON_K} THEN 0
              WHEN n1 >= {_ANON_K} THEN 1
              WHEN n2 >= {_ANON_K} THEN 2
              ELSE 3 END AS lvl
  FROM base b
  JOIN g0 USING (qi_nation, qi_segment, qi_bal_bucket)
  JOIN g1 USING (qi_nation, qi_segment)
  JOIN g2 USING (qi_segment)
)
SELECT c_custkey,
       CAST(lvl AS INT) AS gen_level,
       CASE WHEN lvl <= 1 THEN qi_nation END AS anon_nation,
       CASE WHEN lvl <= 2 THEN qi_segment END AS anon_segment,
       CASE WHEN lvl <= 0 THEN qi_bal_bucket END AS anon_bal_bucket,
       CAST(CASE lvl WHEN 0 THEN n0 WHEN 1 THEN n1 WHEN 2 THEN n2
                     ELSE 0 END AS BIGINT) AS group_size
FROM lv
"""


def q_anonymize_k_strict(spark: SparkSession, sf: str) -> DataFrame:
    """K-ANONYMOUS RELEASE over ``customer`` quasi-identifiers: a
    sequential-release cascade whose released equivalence classes all
    reach k.

    Rows are released level by level, each level's census counting only
    the rows still unreleased: level 0 publishes the (nation, segment,
    bucket) groups of size ≥ k; the fall-through rows are re-counted at
    (nation, segment) and published at level 1 where ≥ k; the rest at
    (segment); anything still short is suppressed (level 3, all QIs
    withheld). Proof of k-anonymity: the rows published at level L with
    released representation X are exactly the members of census-L group
    X, which passed the ≥ k test, and no later pass adds or removes
    rows from an already-released class (later levels publish under a
    different mask, hence a different class); level 3 withholds every
    QI. So every released class is a ≥ k set, and ``group_size`` IS the
    released class size — the invariant the ladder twin documents away.

    Plan: the same three partial-agg censuses as the ladder, but each
    over the shrinking unreleased remainder (filters push into the
    scan of the previous join output); the census tables are
    metadata-sized, AQE broadcasts them, and the classification is
    map-only after the joins. At 100 TB this is the ladder's cost plus
    two filtered re-censuses of strict subsets — same shuffle count,
    strictly less data per pass."""
    cust = load(spark, sf, "customer")
    k = _ANON_K
    base = cust.select(
        "c_custkey",
        F.col("c_nationkey").alias("qi_nation"),
        F.col("c_mktsegment").alias("qi_segment"),
        F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
        .alias("qi_bal_bucket"),
    )
    g0 = base.groupBy("qi_nation", "qi_segment", "qi_bal_bucket").agg(
        F.count("*").alias("n0")
    )
    b0 = base.join(g0, ["qi_nation", "qi_segment", "qi_bal_bucket"])
    # census 1 counts ONLY rows not released at level 0
    g1 = (
        b0.where(F.col("n0") < k)
        .groupBy("qi_nation", "qi_segment")
        .agg(F.count("*").alias("n1"))
    )
    b1 = b0.join(g1, ["qi_nation", "qi_segment"], "left")
    g2 = (
        b1.where((F.col("n0") < k) & (F.col("n1") < k))
        .groupBy("qi_segment")
        .agg(F.count("*").alias("n2"))
    )
    b2 = b1.join(g2, ["qi_segment"], "left")
    lvl = (
        F.when(F.col("n0") >= k, 0)
        .when(F.col("n1") >= k, 1)
        .when(F.col("n2") >= k, 2)
        .otherwise(3)
    )
    return b2.select(
        "c_custkey",
        lvl.cast("int").alias("gen_level"),
        F.when(lvl <= 1, F.col("qi_nation")).alias("anon_nation"),
        F.when(lvl <= 2, F.col("qi_segment")).alias("anon_segment"),
        F.when(lvl <= 0, F.col("qi_bal_bucket")).alias("anon_bal_bucket"),
        F.when(lvl == 0, F.col("n0"))
        .when(lvl == 1, F.col("n1"))
        .when(lvl == 2, F.col("n2"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("group_size"),
    )


_ANON_STRICT_ORACLE = f"""
WITH base AS (
  SELECT c_custkey, c_nationkey AS qi_nation, c_mktsegment AS qi_segment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS qi_bal_bucket
  FROM customer
), g0 AS (
  SELECT qi_nation, qi_segment, qi_bal_bucket, count(*) AS n0
  FROM base GROUP BY 1, 2, 3
), b0 AS (
  SELECT b.*, n0 FROM base b
  JOIN g0 USING (qi_nation, qi_segment, qi_bal_bucket)
), g1 AS (
  SELECT qi_nation, qi_segment, count(*) AS n1
  FROM b0 WHERE n0 < {_ANON_K} GROUP BY 1, 2
), b1 AS (
  SELECT b0.*, n1 FROM b0
  LEFT JOIN g1 USING (qi_nation, qi_segment)
), g2 AS (
  SELECT qi_segment, count(*) AS n2
  FROM b1 WHERE n0 < {_ANON_K} AND n1 < {_ANON_K} GROUP BY 1
), b2 AS (
  SELECT b1.*, n2 FROM b1
  LEFT JOIN g2 USING (qi_segment)
), lv AS (
  SELECT *,
         CASE WHEN n0 >= {_ANON_K} THEN 0
              WHEN n1 >= {_ANON_K} THEN 1
              WHEN n2 >= {_ANON_K} THEN 2
              ELSE 3 END AS lvl
  FROM b2
)
SELECT c_custkey,
       CAST(lvl AS INT) AS gen_level,
       CASE WHEN lvl <= 1 THEN qi_nation END AS anon_nation,
       CASE WHEN lvl <= 2 THEN qi_segment END AS anon_segment,
       CASE WHEN lvl <= 0 THEN qi_bal_bucket END AS anon_bal_bucket,
       CAST(CASE lvl WHEN 0 THEN n0 WHEN 1 THEN n1 WHEN 2 THEN n2
                     ELSE 0 END AS BIGINT) AS group_size
FROM lv
"""


# ---------------------------------------------------------------------------
# q_ts_kalman — adaptive-gain Kalman filter, exact integer recursion
# ---------------------------------------------------------------------------

# The state-space family beside the exponential-smoothing recursions
# (q_ts_holt_recursive / q_ts_hw_recursive): a local-level Kalman
# filter whose GAIN ADAPTS each step through the variance recursion —
#   P⁻ = P + Q;  K = ⌊P⁻·M / (P⁻+R)⌋;  l += ⌊K·(y−l) / M⌋;
#   P = ⌊(M−K)·P⁻ / M⌋            (M = 1e6 gain scale)
# EWMA/Holt have constant gains, so this certifies a recursion whose
# COEFFICIENTS are themselves recursive state. All arithmetic is BIGINT
# micro-units; the one signed floor-division (K·(y−l) can be negative)
# is spelled remainder-first in the oracle ((a − ((a%b)+b)%b)/b — the
# q_mixture_temperature trick) because DuckDB's `//` truncates toward
# zero while Python's floors. Series are capped to their LAST 240 hours
# so the oracle's recursive CTE is depth-bounded at EVERY sf (the
# q_stream_anomaly segmented-oracle lesson, avoided by construction).
_KAL_M = 1_000_000       # gain scale
_KAL_R = 4_000_000       # measurement variance, micro-units (4.0)
_KAL_Q = 250_000         # process variance, micro-units (0.25)
_KAL_HOURS = 240


def q_ts_kalman(spark: SparkSession, sf: str) -> DataFrame:
    """Local-level KALMAN FILTER per series (event_type), exact integer
    recursion, hash-graded against a recursive-CTE oracle.

    Plan: one partial-agg hourly census, a per-key window for the
    240-hour cap, then ONE grouped Arrow UDF task per series running
    the sequential filter (sequential by construction — the gain
    recursion has no scan/closed form; same distribution contract as
    q_ts_holt_recursive: the driver holds nothing, series count is the
    scale axis)."""
    import pandas as pd

    ev = load(spark, sf, "events")
    hourly = ev.groupBy(
        F.col("event_type").alias("series_id"),
        F.date_trunc("hour", "ts").alias("ts"),
    ).agg(
        F.floor(F.sum("value") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("y_i6")
    )
    w = Window.partitionBy("series_id")
    capped = (
        hourly.withColumn("_mx", F.max("ts").over(w))
        .where(F.col("ts") > F.col("_mx") - F.expr(f"INTERVAL {_KAL_HOURS} HOURS"))
        .drop("_mx")
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        ys = [int(v) for v in pdf["y_i6"].tolist()]
        m, rr, qq = _KAL_M, _KAL_R, _KAL_Q
        lev, p, gain = ys[0], rr, 0
        for y in ys[1:]:
            pp = p + qq
            gain = (pp * m) // (pp + rr)
            lev = lev + (gain * (y - lev)) // m
            p = ((m - gain) * pp) // m
        return pd.DataFrame(
            {
                "series_id": [pdf["series_id"].iloc[0]],
                "n_obs": [len(ys)],
                "level": [lev / 1e6],
                "p_var": [p / 1e6],
                "gain": [gain / 1e6],
            }
        )

    return capped.groupBy("series_id").applyInPandas(
        _one,
        "series_id string, n_obs int, level double, p_var double, gain double",
    )


def _kalman_oracle() -> str:
    m, rr, qq = _KAL_M, _KAL_R, _KAL_Q
    # Signed floor division a fld M (M>0), exact in BIGINT:
    # (a − ((a%M)+M)%M) // M — the numerator is divisible by M, so the
    # division is integral under any rounding mode (DuckDB's // truncates
    # toward zero; Python's floors — this spelling makes them agree).
    fld_ke = f"((k2 * e) - (((k2 * e) % {m}) + {m}) % {m}) // {m}"
    return f"""
WITH RECURSIVE h AS (
  SELECT event_type AS series_id, date_trunc('hour', ts) AS ts,
         CAST(floor(sum(value) * 1e6 + 0.5) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), capped AS (
  SELECT series_id, ts, y,
         row_number() OVER (PARTITION BY series_id ORDER BY ts) AS rn
  FROM (
    SELECT h.*, max(ts) OVER (PARTITION BY series_id) AS mx FROM h
  )
  WHERE ts > mx - INTERVAL {_KAL_HOURS} HOUR
), rec AS (
  SELECT series_id, rn, y AS l, CAST({rr} AS BIGINT) AS p,
         CAST(0 AS BIGINT) AS k
  FROM capped WHERE rn = 1
  UNION ALL
  SELECT series_id, rn,
         l + ({fld_ke}) AS l,
         (({m} - k2) * pp) // {m} AS p,
         k2 AS k
  FROM (
    SELECT c.series_id, c.rn, r.l, (c.y - r.l) AS e,
           (r.p + {qq}) AS pp,
           ((r.p + {qq}) * {m}) // ((r.p + {qq}) + {rr}) AS k2
    FROM rec r JOIN capped c
      ON c.series_id = r.series_id AND c.rn = r.rn + 1
  ) t
), fin AS (
  SELECT series_id, max(rn) AS n_obs FROM capped GROUP BY 1
)
SELECT r.series_id, CAST(f.n_obs AS INT) AS n_obs,
       CAST(r.l AS DOUBLE) / 1e6 AS level,
       CAST(r.p AS DOUBLE) / 1e6 AS p_var,
       CAST(r.k AS DOUBLE) / 1e6 AS gain
FROM rec r JOIN fin f ON f.series_id = r.series_id AND r.rn = f.n_obs
"""


# ---------------------------------------------------------------------------
# q_window_pattern — complex-event-processing sequence match
# ---------------------------------------------------------------------------

# MATCH_RECOGNIZE-style CEP: per user, does the ordered event stream
# contain view → click+ → purchase? Funnel/event-sequence entries count
# fixed step sets; this one matches a REGEX over the ordered event-type
# string (the Flink CEP / SQL MATCH_RECOGNIZE primitive), so quantified
# repetitions and non-overlapping occurrence counting come for free.
# The per-user sequence is totally ordered by (ts, event_id) — event_id
# is unique, so both engines build byte-identical strings.
_CEP_PATTERN = "VC+P"
_CEP_CHARS = [
    ("view", "V"), ("click", "C"), ("purchase", "P"), ("signup", "S"),
]


def q_window_pattern(spark: SparkSession, sf: str) -> DataFrame:
    """CEP conversion-pattern count per user (view→click+→purchase).

    Plan: ONE keyed exchange (groupBy user) collecting (ts, eid, char)
    structs; array_sort orders them lexicographically (total order —
    event_id is unique), and the regex count runs per user row. At
    100 TB: per-user sequences are session-bounded, the agg is the same
    single shuffle as q_sessionize, and the STREAMING TWIN is real and
    hash-graded against this entry's own oracle — q_stream_pattern_tws
    folds the same pattern as an O(1)-state DFA on
    transformWithStateInPandas (three integers per user, no buffered
    sequence)."""
    ev = load(spark, sf, "events")
    char = None
    for name, c in _CEP_CHARS:
        cond = F.col("event_type") == name
        char = F.when(cond, c) if char is None else char.when(cond, c)
    char = char.otherwise("E")
    rows = ev.select(
        "user_id",
        F.struct(
            F.col("ts").alias("ts"),
            F.col("event_id").alias("eid"),
            char.alias("c"),
        ).alias("s"),
    )
    per_user = rows.groupBy("user_id").agg(
        F.array_sort(F.collect_list("s")).alias("arr")
    )
    seq = F.array_join(F.expr("transform(arr, x -> x.c)"), "")
    n_conv = F.regexp_count(seq, F.lit(_CEP_PATTERN)).cast("int")
    return per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_events"),
        n_conv.alias("n_conversions"),
        (n_conv > 0).alias("converted"),
    )


_CEP_CASE = (
    "CASE event_type WHEN 'view' THEN 'V' WHEN 'click' THEN 'C' "
    "WHEN 'purchase' THEN 'P' WHEN 'signup' THEN 'S' ELSE 'E' END"
)
_CEP_ORACLE = f"""
WITH seq AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         string_agg({_CEP_CASE}, '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT user_id, n_events,
       CAST(len(regexp_extract_all(s, '{_CEP_PATTERN}')) AS INT)
         AS n_conversions,
       len(regexp_extract_all(s, '{_CEP_PATTERN}')) > 0 AS converted
FROM seq
"""


# ---------------------------------------------------------------------------
# q_dq_anomaly_volume — trailing-window ingest-volume anomaly audit
# ---------------------------------------------------------------------------

# The data-quality check every ingest pipeline runs: per (source, day),
# is today's row volume anomalous against its trailing history? z-score
# of the daily count vs the mean/std of the 7 preceding OBSERVED
# (event_type, day) rows — a ROWS frame, deliberately: for a source
# with gaps the baseline is the last 7 days that actually ingested
# anything (which can span more than a calendar week), because a
# calendar RANGE frame would refuse to judge any day after a gap even
# when ample history exists. Days without 7 observed predecessors are
# not judged. All window sums are exact
# BIGINTs (counts and squared counts), the variance is the one-pass
# identity (Σx² − (Σx)²/n)/(n−1) evaluated in identical double
# expressions on both engines, and z is rhu-quantized before the flag
# comparison so the hash can't be flipped by formatting.
_DQ_VOL_Z = 2.0


def q_dq_anomaly_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Daily volume z-score per event_type over the 7 preceding
    observed ingest days (ROWS frame — see the gap note above).

    Plan: one partial-agg daily census, then a per-type window (keyed
    exchange on event_type, tiny) with three frame aggregates sharing
    one sort. At 100 TB the census is the only pass over the data —
    the window runs over (types × days) rows."""
    ev = load(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    hist = F.count("n").over(w)
    s1 = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    d = daily.select(
        "event_type", "day", "n",
        hist.alias("_h"), s1.alias("_s1"), s2.alias("_s2"),
    ).where(F.col("_h") == 7)
    mean = F.col("_s1").cast("double") / F.lit(7.0)
    var = (
        F.col("_s2").cast("double")
        - F.col("_s1").cast("double") * F.col("_s1").cast("double") / F.lit(7.0)
    ) / F.lit(6.0)
    std = F.when(var > 0, F.sqrt(var))
    z = rhu((F.col("n").cast("double") - mean) / std, 6)
    return d.select(
        "event_type",
        "day",
        "n",
        rhu(mean, 6).alias("mean7"),
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(_DQ_VOL_Z), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


_DQ_VOL_ORACLE = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
), framed AS (
  SELECT event_type, day, n,
         count(n) OVER w AS h,
         sum(n) OVER w AS s1,
         sum(n * n) OVER w AS s2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
), judged AS (
  SELECT event_type, day, n,
         CAST(s1 AS DOUBLE) / 7.0 AS mean,
         (CAST(s2 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0) / 6.0 AS var
  FROM framed WHERE h = 7
)
SELECT event_type, day, n,
       floor(mean * 1e6 + 0.5) / 1e6 AS mean7,
       CASE WHEN var > 0 THEN
         floor((CAST(n AS DOUBLE) - mean) / sqrt(var) * 1e6 + 0.5) / 1e6
       END AS z,
       coalesce(abs(CASE WHEN var > 0 THEN
         floor((CAST(n AS DOUBLE) - mean) / sqrt(var) * 1e6 + 0.5) / 1e6
       END) > {_DQ_VOL_Z}, false) AS is_anomaly
FROM judged
"""


QUERIES = {
    "q_ts_reference_gefcom": QuerySpec(
        q_ts_reference_gefcom, _GEFCOM_ORACLE
    ),
    "q_text_quality_c4": QuerySpec(q_text_quality_c4, _C4_ORACLE),
    "q_text_dedup_lines": QuerySpec(q_text_dedup_lines, _DEDUP_LINES_ORACLE),
    "q_dedup_url": QuerySpec(q_dedup_url, _DEDUP_URL_ORACLE),
    "q_mixture_temperature": QuerySpec(
        q_mixture_temperature, _MIXTURE_ORACLE
    ),
    "q_cdc_diff": QuerySpec(q_cdc_diff, _CDC_ORACLE),
    "q_binpack_plan": QuerySpec(q_binpack_plan, _BINPACK_ORACLE),
    "q_graph_linkpred": QuerySpec(q_graph_linkpred, _LINKPRED_ORACLE),
    "q_ts_acf": QuerySpec(q_ts_acf, _ACF_ORACLE),
    "q_ts_reconcile": QuerySpec(q_ts_reconcile, _RECON_ORACLE),
    "q_embed_kmeans": QuerySpec(q_embed_kmeans, _km_oracle()),
    "q_stream_watermark_late": QuerySpec(
        q_stream_watermark_late, _LATE_ORACLE
    ),
    "q_ts_backtest_census": QuerySpec(
        q_ts_backtest_census, _BACKTEST_CENSUS_ORACLE
    ),
    "q_ts_combine_planted": QuerySpec(
        q_ts_combine_planted, _combine_oracle()
    ),
    "q_ts_hw_recursive": QuerySpec(q_ts_hw_recursive, _hw_oracle()),
    "q_yoy_growth": QuerySpec(q_yoy_growth, _YOY_ORACLE),
    "q_attribution_last_touch": QuerySpec(
        q_attribution_last_touch, _ATTRIBUTION_ORACLE
    ),
    "q_rfm_segment": QuerySpec(q_rfm_segment, _RFM_ORACLE),
    "q_dq_freshness": QuerySpec(q_dq_freshness, _FRESHNESS_ORACLE),
    "q_anonymize_k": QuerySpec(q_anonymize_k, _ANON_ORACLE),
    "q_anonymize_k_strict": QuerySpec(
        q_anonymize_k_strict, _ANON_STRICT_ORACLE
    ),
    "q_ts_kalman": QuerySpec(q_ts_kalman, _kalman_oracle()),
    "q_window_pattern": QuerySpec(q_window_pattern, _CEP_ORACLE),
    "q_dq_anomaly_volume": QuerySpec(
        q_dq_anomaly_volume, _DQ_VOL_ORACLE
    ),
}
