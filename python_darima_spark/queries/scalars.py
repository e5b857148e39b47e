"""Scalar-function queries: string / datetime / math / array / map / JSON
(SURVEY.md §2B M1 + M4). Everything stays inside whole-stage codegen —
no UDFs here.

Cross-engine float note: transcendentals (exp/ln) can differ from DuckDB
by 1 ulp (different libm), so those columns are rounded to 6 dp; plain
arithmetic, sqrt, abs, floor/ceil are IEEE-exact and left raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from python_darima_spark.queries import QuerySpec, load


def q_string_fns(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's coef-key normalization (``ar12`` → ``ar_00000012``,
    /root/reference/py_handlers/converters.py:92) restated over part:
    lpad + regexp_extract + concat + lower + substring + length + replace."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.concat(
            F.lit("brand_"),
            F.lpad(F.regexp_extract("p_brand", r"Brand#(\d+)", 1), 8, "0"),
        ).alias("brand_key"),
        F.lower(F.substring("p_name", 1, 5)).alias("name5"),
        F.length("p_name").alias("name_len"),
        F.upper(F.col("p_type")).alias("type_upper"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("name_dashed"),
    )


def q_date_fns(spark: SparkSession, sf: str) -> DataFrame:
    """date_trunc / extract fields / interval add (ref R27's forecast-index
    generation). Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_trunc("day", "ts").alias("day"),
        F.hour("ts").alias("hh"),
        F.minute("ts").alias("mi"),
        F.dayofweek("ts").alias("dow1"),  # 1=Sunday
        F.dayofmonth("ts").alias("dom"),
        (F.date_trunc("hour", "ts") + F.expr("INTERVAL 1 HOUR")).alias("next_hour"),
    )


def q_math_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Math scalars used by interval construction (ref R28-R30):
    sqrt/abs/sign/floor/ceil exact; exp/ln rounded (libm ulp)."""
    li = load(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_quantity").alias("sqrt_qty"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_disc"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("ln_qty1"),
        F.pow("l_tax", 2).alias("tax_sq"),
    )


def q_array_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions over embeddings (the coef-vector /
    embedding algebra of ref R24): size, element_at, transform+aggregate
    (norm²), zip_with (self dot with reverse), array slicing.

    Floats are cast to double BEFORE arithmetic on both sides; the fold
    starts at 0.0 so the summation order is identical left-to-right in both
    engines → bitwise-stable to 6 dp rounding."""
    emb = load(spark, sf, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.aggregate(
        F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    dot_rev = F.aggregate(
        F.zip_with(vec, F.reverse(vec), lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at(vec, 1).alias("e1"),
        F.round(sq, 6).alias("norm_sq"),
        F.round(dot_rev, 6).alias("dot_rev"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda a, x: a + x), 6
        ).alias("sum_first8"),
    )


def q_map_fns(spark: SparkSession, sf: str) -> DataFrame:
    """map_from_arrays / element_at / map_keys — the coef name→value
    mapping of ref R9 restated. The oracle checks the extracted values
    (semantic equivalence), since map internals aren't comparable."""
    p = load(spark, sf, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "brand").alias("brand_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


_PROPS_SCHEMA = StructType([StructField("k", IntegerType())])


def q_json_fns(spark: SparkSession, sf: str) -> DataFrame:
    """get_json_object + from_json(schema) on events.props."""
    e = load(spark, sf, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", _PROPS_SCHEMA).getField("k").alias("k_int"),
    )


def q_json_variant(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` once into a
    binary variant, then typed ``variant_get`` extractions — the
    schema-on-read pattern for heterogeneous event payloads. Unlike
    ``from_json`` (fixed schema up front) the variant parses once and
    serves any later path/type ask; ``try_parse_json`` shows the
    null-on-malformed contract. All JVM expressions, map-only."""
    e = load(spark, sf, "events")
    v = F.parse_json("props")
    bad = F.try_parse_json(F.concat(F.lit("{"), F.col("event_type")))
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_int"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "bigint").alias("k_missing"),
        bad.isNull().alias("malformed_is_null"),
    )


def q_regex_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Regex scalar surface: extract / count / replace / match over
    document text. Patterns stay in the ASCII-class subset where Java
    regex (Spark) and RE2 (DuckDB) agree exactly; both engines return ''
    for a non-matching extract, and Spark's replace-all is matched by
    DuckDB's 'g' flag. Map-only JVM expressions — the regex hot path
    never leaves codegen."""
    docs = load(spark, sf, "documents")
    head = F.substring("text", 1, 40)
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([0-9]+)", 1).alias("first_number"),
        F.regexp_count("text", F.lit(r"[0-9]")).cast("int").alias("n_digits"),
        F.regexp_replace(head, r"[aeiou]", "").alias("devoweled_head"),
        F.col("text").rlike(r"[A-Z][a-z]+").alias("has_title_word"),
    )


def q_text_editdist(spark: SparkSession, sf: str) -> DataFrame:
    """Levenshtein EDIT DISTANCE between consecutive documents' 32-char
    prefixes — the string-distance scalar both engines implement with
    identical unit-cost semantics (insert/delete/substitute = 1), plus
    a normalized similarity. Map-only after one keyed self-join on
    doc_id+1; integer distances, so only the ratio is rounded."""
    docs = load(spark, sf, "documents")
    a = docs.select("doc_id", F.substring("text", 1, 32).alias("_ta"))
    b = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.substring("text", 1, 32).alias("_tb"),
    )
    d = F.levenshtein("_ta", "_tb")
    maxlen = F.greatest(F.length("_ta"), F.length("_tb"))
    return (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            d.alias("edit_dist"),
            F.round(F.lit(1.0) - d / maxlen, 6).alias("similarity"),
        )
    )


def q_null_fns(spark: SparkSession, sf: str) -> DataFrame:
    """Null-handling scalars: coalesce / nullif / greatest / least and
    null-safe equality — the semantics every filter/join in the engine
    leans on (three-valued logic made explicit)."""
    o = load(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest("o_totalprice", F.lit(10000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(100000.0)).alias("capped_price"),
        F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("is_f"),
        (F.nullif(F.lit(1), F.lit(1)).isNull()).alias("nullif_works"),
    )


QUERIES = {
    "q_text_editdist": QuerySpec(
        q_text_editdist,
        """SELECT a.doc_id,
                  CAST(levenshtein(substring(a.text, 1, 32),
                                   substring(b.text, 1, 32)) AS INT)
                      AS edit_dist,
                  round(1.0 - CAST(levenshtein(substring(a.text, 1, 32),
                                               substring(b.text, 1, 32))
                                   AS DOUBLE)
                        / greatest(length(substring(a.text, 1, 32)),
                                   length(substring(b.text, 1, 32))), 6)
                      AS similarity
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1""",
    ),
    "q_regex_fns": QuerySpec(
        q_regex_fns,
        """SELECT doc_id,
                  regexp_extract(text, '([0-9]+)', 1) AS first_number,
                  CAST(len(regexp_extract_all(text, '[0-9]')) AS INT)
                      AS n_digits,
                  regexp_replace(substring(text, 1, 40), '[aeiou]', '', 'g')
                      AS devoweled_head,
                  regexp_matches(text, '[A-Z][a-z]+') AS has_title_word
           FROM documents""",
    ),
    "q_null_fns": QuerySpec(
        q_null_fns,
        """SELECT o_orderkey,
                  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
                  greatest(o_totalprice, 10000.0) AS floor_price,
                  least(o_totalprice, 100000.0) AS capped_price,
                  o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f,
                  nullif(1, 1) IS NULL AS nullif_works
           FROM orders""",
    ),
    "q_string_fns": QuerySpec(
        q_string_fns,
        r"""SELECT p_partkey,
                  'brand_' || lpad(regexp_extract(p_brand, 'Brand#(\d+)', 1), 8, '0')
                      AS brand_key,
                  lower(substring(p_name, 1, 5)) AS name5,
                  length(p_name) AS name_len,
                  upper(p_type) AS type_upper,
                  replace(p_name, ' ', '-') AS name_dashed
           FROM part""",
    ),
    "q_date_fns": QuerySpec(
        q_date_fns,
        """SELECT event_id,
                  date_trunc('day', ts) AS day,
                  CAST(hour(ts) AS INT) AS hh,
                  CAST(minute(ts) AS INT) AS mi,
                  CAST(dayofweek(ts) + 1 AS INT) AS dow1,
                  CAST(dayofmonth(ts) AS INT) AS dom,
                  date_trunc('hour', ts) + INTERVAL 1 HOUR AS next_hour
           FROM events""",
    ),
    "q_math_fns": QuerySpec(
        q_math_fns,
        """SELECT l_orderkey, l_linenumber,
                  sqrt(l_quantity) AS sqrt_qty,
                  abs(l_discount - 0.05) AS abs_disc,
                  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_disc,
                  CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
                  CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
                  round(exp(l_discount), 6) AS exp_disc,
                  round(ln(l_quantity + 1), 6) AS ln_qty1,
                  power(l_tax, 2) AS tax_sq
           FROM lineitem""",
    ),
    "q_array_fns": QuerySpec(
        q_array_fns,
        """SELECT vec_id,
                  CAST(len(embedding) AS INT) AS dim,
                  CAST(embedding[1] AS DOUBLE) AS e1,
                  round(list_reduce(
                      list_prepend(0.0, list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                      (a, b) -> a + b), 6) AS norm_sq,
                  round(list_reduce(
                      list_prepend(0.0, list_transform(
                          list_zip(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                   list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))),
                          p -> p[1] * p[2])),
                      (a, b) -> a + b), 6) AS dot_rev,
                  round(list_reduce(
                      list_prepend(0.0, list_transform(embedding[1:8],
                          x -> CAST(x AS DOUBLE))),
                      (a, b) -> a + b), 6) AS sum_first8
           FROM embeddings""",
    ),
    "q_map_fns": QuerySpec(
        q_map_fns,
        """SELECT p_partkey, p_brand AS brand_val, p_type AS type_val,
                  2 AS n_keys
           FROM part""",
    ),
    "q_json_fns": QuerySpec(
        q_json_fns,
        """SELECT event_id,
                  props ->> 'k' AS k_str,
                  CAST(props ->> 'k' AS INT) AS k_int
           FROM events""",
    ),
    "q_json_variant": QuerySpec(
        q_json_variant,
        """SELECT event_id,
                  CAST(props ->> 'k' AS BIGINT) AS k_int,
                  props ->> 'k' AS k_str,
                  CAST(props ->> 'missing' AS BIGINT) AS k_missing,
                  TRUE AS malformed_is_null
           FROM events""",
    ),
}
