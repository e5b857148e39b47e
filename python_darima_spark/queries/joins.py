"""Join variants (SURVEY.md §2B milestone M2): inner, broadcast, outer,
semi/anti, theta (non-equi), as-of. Catalyst picks the physical strategy
(broadcast-hash vs sort-merge) — we pin ``F.broadcast`` only where the dim
side is known-small; AQE converts to broadcast at runtime otherwise."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_darima_spark.operators.relational import asof_join, range_join
from python_darima_spark.queries import QuerySpec, load


def q_join_inner(spark: SparkSession, sf: str) -> DataFrame:
    o, c = load(spark, sf, "orders"), load(spark, sf, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice", "c_mktsegment"
    )


def q_join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Fact ⋈ broadcast dims: customer→nation→region with explicit
    broadcast hints — zero shuffle of the fact side at any scale."""
    c = load(spark, sf, "customer")
    n = F.broadcast(load(spark, sf, "nation"))
    r = F.broadcast(load(spark, sf, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


def q_join_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Inner join through the manual hot-key salting operator
    (operators/relational.py:salted_join): the left side spreads each key
    over 8 salts via a row-content hash, the right replicates 8× — the
    mitigation for skew AQE can't reach (shuffled-hash plans, or one key
    so hot a single AQE split still overflows a task). Result-identical
    to q_join_inner by construction, so it shares that exact SQL oracle."""
    from python_darima_spark.operators.relational import salted_join

    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").withColumnRenamed("c_custkey", "o_custkey")
    return salted_join(o, c, "o_custkey", num_salts=8).select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "c_name",
        "o_totalprice",
        "c_mktsegment",
    )


def q_join_runtime_filter(spark: SparkSession, sf: str) -> DataFrame:
    """RUNTIME bloom-filter join pruning (Spark's InjectRuntimeFilter):
    a selectively-filtered build side too big to broadcast injects a
    ``bloom_filter_agg`` subquery, and the fact side is pre-filtered by
    ``BloomFilterMightContain`` BEFORE its shuffle — at 100 TB this cuts
    the dominant cost (shuffling the fact) by the dim filter's
    selectivity, for dims that exceed the broadcast threshold. The two
    conf overrides emulate at-scale conditions on the small fixture
    (broadcast disabled = 'dim too big to broadcast'; app-side scan
    threshold 0 = 'fact is huge'); the plan is forced eagerly while they
    hold, then they are restored (plan assertion:
    tests/test_subquery_plans.py)."""
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        orders = (
            load(spark, sf, "orders")
            .where(F.col("o_totalprice") > 450000)
            .select("o_orderkey", "o_totalprice")
        )
        li = load(spark, sf, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        out = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_orderkey")
            .agg(
                # round to 4: the products have exactly 4 decimals, so the
                # true sum does too — 4dp rounding is a no-op both engines
                # agree on, where 2dp sits on .005 boundaries that summation
                # -order ulps flip (measured 1/1467 groups)
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    4,
                ).alias("revenue"),
                F.round(F.max("o_totalprice"), 2).alias("o_price"),
            )
        )
        # force plan optimization NOW, while the overrides hold — the
        # DataFrame memoizes its queryExecution, so restoring conf after
        # this point cannot re-plan the query
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def q_join_outer(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer: every customer, with order info where present."""
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def q_join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left semi + left anti, tagged and unioned (customers with vs
    without orders) — no columns from the right side ever materialize."""
    c, o = load(spark, sf, "customer"), load(spark, sf, "orders")
    cond = c.c_custkey == o.o_custkey
    semi = c.join(o, cond, "left_semi").select("c_custkey").withColumn(
        "tag", F.lit("has_orders")
    )
    anti = c.join(o, cond, "left_anti").select("c_custkey").withColumn(
        "tag", F.lit("no_orders")
    )
    return semi.unionByName(anti)


def q_join_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi (theta) join — broadcast nested-loop over a small side.
    Every supplier × the nations whose key-scaled threshold its balance
    clears. The small side MUST be broadcast: a non-equi join has no
    shuffle key, so the only scalable plan is BNLJ with the tiny side
    replicated."""
    s = load(spark, sf, "supplier")
    n = F.broadcast(load(spark, sf, "nation"))
    return s.join(n, s.s_acctbal >= n.n_nationkey * 300.0).select(
        "s_suppkey", "n_nationkey", "s_acctbal"
    )


def q_join_range(spark: SparkSession, sf: str) -> DataFrame:
    """Attribution-window range join: clicks in the trailing 2 h before a
    purchase by the same user. Bucketed-equi-join rewrite (see
    operators/relational.py:range_join) — hash join on (user, time bucket)
    instead of the nested-loop plan Spark gives BETWEEN joins."""
    e = load(spark, sf, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), "ts")
        .withColumn("lo", F.col("ts") - F.expr("INTERVAL 2 hours"))
        .select("user_id", "purchase_id", "lo", F.col("ts").alias("hi"))
    )
    return range_join(
        clicks, purchases, on="user_id", point_ts="ts",
        lo_ts="lo", hi_ts="hi", bucket_seconds=7200,
    ).select("purchase_id", "click_id")


def q_join_interval_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Interval×interval overlap join: per-user activity spans of each
    event type (min..max ts), paired where the spans intersect —
    via the bucketed equi-join rewrite with first-shared-bucket
    exactly-once matching (operators/relational.py
    interval_overlap_join), never the nested-loop plan a raw
    ``a.lo <= b.hi AND b.lo <= a.hi`` join gets. The oracle states the
    naive non-equi formulation; the hash match proves the rewrite emits
    exactly the overlap set, once each."""
    from python_darima_spark.operators.relational import interval_overlap_join

    e = load(spark, sf, "events")
    spans = e.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    )
    a = spans.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    b = spans.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    return (
        interval_overlap_join(
            a, b, on="user_id", lo_a="lo_a", hi_a="hi_a",
            lo_b="lo_b", hi_b="hi_b", bucket_seconds=86400,
        )
        .where(F.col("type_a") < F.col("type_b"))
        .select(
            "user_id",
            "type_a",
            "type_b",
            # micro-second integers: exact on both engines (fractional
            # epoch seconds would hit double rounding)
            (
                F.unix_micros(F.least("hi_a", "hi_b").cast("timestamp"))
                - F.unix_micros(F.greatest("lo_a", "lo_b").cast("timestamp"))
            ).alias("overlap_us"),
        )
    )


def q_join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase event, the latest prior (≤) click by
    the same user. Union+window implementation (see
    operators/relational.py:asof_join) — the oracle states the equivalent
    candidate-join + ROW_NUMBER formulation."""
    e = load(spark, sf, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", right_cols=["click_id"],
        tie_break=["click_id"],
    )
    return joined.select("purchase_id", "click_id")


_DELETION_VARIANTS = (
    "transform(sequence(0, length({c})), i -> case when i = 0 then {c} "
    "else substring({c}, 1, i - 1) || "
    "substring({c}, i + 1, length({c}) - i) end)"
)


def q_join_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    """FUZZY JOIN on edit distance ≤ 1 via symmetric single-deletion
    variants (the SymSpell blocking) — entity RESOLUTION of noisy
    strings against the distinct canonical-name dictionary, never
    against raw rows. A probe set is synthesized deterministically from
    part names (parts with p_partkey%17=3, one character DELETED at
    position (p_partkey % (len-3)) + 3). The reference side is the
    DISTINCT p_name dictionary (canonical id = min p_partkey carrying
    the name, plus its row count) — resolving against raw rows would
    make the output itself quadratic when names repeat, and this
    corpus's generator draws p_name from a 64-value vocabulary, the
    adversarial-but-realistic case (measured: the row-level prefix-2
    formulation ran 75× at 10× data; dictionary resolution returns
    |probes|·O(1) rows). Both sides explode into {s} ∪ {s minus one
    char} (len+1 variants each); candidates are the DISTINCT
    (probe, name) pairs sharing any variant, verified with
    levenshtein ≤ 1. Completeness is the pigeonhole: two strings at
    edit distance ≤ 1 (substitution/insertion/deletion/equality) always
    share a deletion variant, so recall is provably 1.0 regardless of
    where the typo lands. At 100 TB: the dictionary is a keyed
    distinct-aggregate (vocab-sized, tiny next to the corpus); variant
    rows are n·(len+1) — a near-unique-keyed equi-join shuffle, joined
    on xxhash64(variant) to cut shuffle width (verify filters
    collisions), the operators/dedup.py convention. Both engines share
    the classic Levenshtein metric, so the verify predicate hashes
    identically."""
    parts = load(spark, sf, "part").select("p_partkey", "p_name")
    names = parts.groupBy(F.col("p_name").alias("match_name")).agg(
        F.min("p_partkey").alias("canon_key"),
        F.count("*").alias("n_rows"),
    )
    probes = (
        # length >= 5 guards the deletion-position modulo (len - 3);
        # every fixture name is >= 7 chars so the guard is a no-op there
        parts.where(
            (F.col("p_partkey") % 17 == 3) & (F.length("p_name") >= 5)
        )
        .withColumn("_len", F.length("p_name"))
        .withColumn(
            "_pos",
            (F.col("p_partkey") % (F.col("_len") - 3) + 3).cast("int"),
        )
        .select(
            F.col("p_partkey").alias("probe_key"),
            F.expr(
                "substring(p_name, 1, _pos - 1) || "
                "substring(p_name, _pos + 1, _len - _pos)"
            ).alias("typo"),
        )
    )
    probe_var = probes.select(
        "probe_key",
        "typo",
        F.explode(F.expr(_DELETION_VARIANTS.format(c="typo"))).alias("v"),
    ).select("probe_key", "typo", F.xxhash64("v").alias("vh"))
    name_var = names.select(
        "match_name",
        "canon_key",
        "n_rows",
        F.explode(
            F.expr(_DELETION_VARIANTS.format(c="match_name"))
        ).alias("v"),
    ).select(
        "match_name", "canon_key", "n_rows", F.xxhash64("v").alias("vh")
    )
    cand = (
        probe_var.join(name_var, "vh")
        .select("probe_key", "typo", "match_name", "canon_key", "n_rows")
        .distinct()
    )
    return cand.where(F.levenshtein("typo", "match_name") <= 1).select(
        "probe_key",
        "typo",
        "match_name",
        "canon_key",
        "n_rows",
        F.levenshtein("typo", "match_name").alias("dist"),
    )


def points_from_customers(
    spark: SparkSession, sf: str, side: int = 1000
) -> DataFrame:
    """Deterministic synthetic points on a ``side``² plane from customer
    keys (md5 nibble fields of c_custkey; a multiplicative mix was tried
    first and produced a degenerate 1-D LATTICE with zero near pairs —
    the classic LCG artifact — so the generator is hash-based and the
    non-emptiness of the result is asserted in tests)."""
    cust = load(spark, sf, "customer").select("c_custkey")
    h = F.md5(F.col("c_custkey").cast("string"))
    return cust.select(
        F.col("c_custkey").alias("pid"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % side).alias(
            "x"
        ),
        (F.conv(F.substring(h, 5, 4), 16, 10).cast("long") % side).alias(
            "y"
        ),
    )


def spatial_radius_join(pts: DataFrame, r: int) -> DataFrame:
    """Grid-blocked SPATIAL RADIUS self-join — all point pairs within
    euclidean distance r, the geospatial workhorse (store clustering,
    trajectory contact tracing) Spark has no native operator for.
    Blocking: each point belongs to ONE r-sized grid cell; candidates
    come from joining one side's cell against the other side's 3×3
    neighbor-cell fan-out (the standard fixed-radius-near-neighbor
    construction: any pair within r is in the same or adjacent cells,
    so recall is provably 1.0, and each candidate pair arises from
    exactly one (cell_b ∈ neighbors(cell_a)) match so no dedup pass is
    needed). Round 6 halves the fan-out with the HALF-NEIGHBORHOOD
    trick: every unordered adjacent cell pair is enumerated exactly once
    by probing only {self, E, NE, N, NW} (5 offsets instead of 9), with
    the id ordering applied only to same-cell pairs — same provable
    recall, ~half the candidate volume. Verify is dx²+dy² ≤ r² in
    BIGINT — no float anywhere, no sqrt. At 100 TB: the fan-out is 5×
    one side's rows; the join is an
    equi hash join on cell id whose bucket occupancy is DENSITY-bounded
    (points per r×r cell), not corpus-bounded — candidate volume is
    Σ_cells 9·n_cell², linear in points at constant density. Growing
    the corpus inside a FIXED plane grows density, and then candidates
    — and the true answer itself — grow quadratically; that is answer
    growth, not plan growth (the round-5 verdict's q_join_fuzzy
    lesson). The scale probe separates the two with a density-
    preserving twin (tools/scale_probe.py q_join_spatial_radius_dp:
    plane area scales with the corpus → measured ~linear), and the
    LSH-family cap-the-bucket discipline applies if real data skews.
    Output (id_a, id_b, dist2), id_a < id_b."""
    cells = pts.select(
        "pid",
        "x",
        "y",
        (F.col("x") - F.col("x") % r).alias("cx"),
        (F.col("y") - F.col("y") % r).alias("cy"),
    )
    # half neighborhood: (0,0) self plus E/NE/N/NW — every unordered
    # adjacent cell pair appears exactly once
    offsets = [(0, 0), (1, 0), (1, 1), (0, 1), (-1, 1)]
    a = cells.select(
        F.col("pid").alias("id_p"),
        F.col("x").alias("xp"),
        F.col("y").alias("yp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx * r).alias("cx"),
                        (F.col("cy") + dy * r).alias("cy"),
                        F.lit(dx == 0 and dy == 0).alias("self_cell"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nc"),
    ).select("id_p", "xp", "yp", "nc.cx", "nc.cy", "nc.self_cell")
    b = cells.select(
        F.col("pid").alias("id_q"),
        F.col("x").alias("xq"),
        F.col("y").alias("yq"),
        "cx",
        "cy",
    )
    cand = a.join(b, ["cx", "cy"]).where(
        # same-cell pairs order by id (each found once); cross-cell
        # pairs are already unique per unordered cell pair
        (~F.col("self_cell") & (F.col("id_p") != F.col("id_q")))
        | (F.col("id_p") < F.col("id_q"))
    )
    d2 = (F.col("xp") - F.col("xq")) * (F.col("xp") - F.col("xq")) + (
        F.col("yp") - F.col("yq")
    ) * (F.col("yp") - F.col("yq"))
    return cand.select(
        F.least("id_p", "id_q").alias("id_a"),
        F.greatest("id_p", "id_q").alias("id_b"),
        d2.alias("dist2"),
    ).where(F.col("dist2") <= r * r)


def q_join_spatial_radius(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial radius self-join on the fixed 1000² plane (see
    spatial_radius_join for the plan and the density-vs-corpus scaling
    contract)."""
    return spatial_radius_join(points_from_customers(spark, sf), r=15)


def _bloom_pos(j_col, key_col):
    """Position of hash row j for key: 16 md5 bits of 'j:key' mod 1024."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        j_col.cast("string"), F.lit(":"), key_col.cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 1024
    )


def q_join_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join WITH TOLERANCE (pandas merge_asof's ``tolerance=``,
    kdb's windowed aj): the latest prior click per purchase counts only
    within 1 hour — staler matches are NULLED, because attribution
    windows are the semantic a marketing/market-data pipeline actually
    wants (an unbounded as-of silently attributes a purchase to a
    week-old click). Exercises operators/relational.py:asof_join's
    tolerance path; same union+window shape as q_join_asof (one keyed
    exchange, no range join), the tolerance is a map-side flag on the
    matched timestamp. Emitted gap in exact integer seconds."""
    e = load(spark, sf, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        right_cols=["click_id"],
        tolerance="1 hour",
        tie_break=["click_id"],
    )
    return joined.select(
        "purchase_id",
        "click_id",
        F.when(
            F.col("click_id").isNotNull(),
            (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("ts_right").cast("timestamp"))
            )
            / F.lit(1000000),
        )
        .cast("long")
        .alias("gap_s"),
    ).orderBy("purchase_id")


def q_join_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """MANUAL Bloom-filter semi-join (the structure behind Spark's own
    runtime-filter rewrite, q_join_runtime_filter, opened up so the
    filter's bit state and its false positives are under the value
    hash): build side = suppliers of the nation holding suppkey 1,
    k=3 md5-derived positions into m=1024 bits; a probe-side key
    (distinct lineitem suppkeys) passes iff ALL 3 of its positions are
    set — expressed as an inner join against the distinct set-bit
    table with a HAVING count(*) = 3, no bitmap type needed. The
    output row pins n_probe (distinct probe keys), n_pass (bloom
    survivors), n_true (exact semi-join answer) and n_false_pos
    (pass − true): Bloom's no-false-negative guarantee is therefore
    hash-checked, not asserted. At 100 TB the set-bit table is ≤1024
    rows — broadcast to every probe task, the probe stays map-side
    (groupBy on the probe key is a partial agg over ≤3k rows/key),
    and the exact join only sees survivors — exactly how a runtime
    filter cuts a fact-scan's shuffle."""
    supp = load(spark, sf, "supplier")
    nat = supp.where(F.col("s_suppkey") == 1).select("s_nationkey")
    build = supp.join(F.broadcast(nat), "s_nationkey").select(
        F.col("s_suppkey").alias("k")
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(3)])).alias("j")
    bits = (
        build.select("k", js)
        .select(_bloom_pos(F.col("j"), F.col("k")).alias("pos"))
        .distinct()
    )
    probe_keys = (
        load(spark, sf, "lineitem").select(F.col("l_suppkey").alias("k")).distinct()
    )
    probe_pos = probe_keys.select("k", js).select(
        "k", _bloom_pos(F.col("j"), F.col("k")).alias("pos")
    )
    passed = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("k")
        .agg(F.count("*").alias("_hits"))
        .where(F.col("_hits") == 3)
        .select("k")
    )
    true_match = probe_keys.join(build, "k", "left_semi")
    n_probe = probe_keys.agg(F.count("*").alias("n_probe"))
    n_pass = passed.agg(F.count("*").alias("n_pass"))
    n_true = true_match.agg(F.count("*").alias("n_true"))
    return (
        n_probe.crossJoin(n_pass)
        .crossJoin(n_true)
        .select(
            "n_probe",
            "n_pass",
            "n_true",
            (F.col("n_pass") - F.col("n_true")).alias("n_false_pos"),
        )
    )


QUERIES = {
    "q_join_bloom": QuerySpec(
        q_join_bloom,
        """WITH nat AS (
             SELECT s_nationkey FROM supplier WHERE s_suppkey = 1
           ), build AS (
             SELECT s_suppkey AS k FROM supplier
             JOIN nat USING (s_nationkey)
           ), rows_j AS (
             SELECT unnest(generate_series(0, 2)) AS j
           ), bits AS (
             SELECT DISTINCT
                    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                        || CAST(k AS VARCHAR)), 1, 4))::BIGINT
                        % 1024 AS pos
             FROM build CROSS JOIN rows_j
           ), probe_keys AS (
             SELECT DISTINCT l_suppkey AS k FROM lineitem
           ), probe_pos AS (
             SELECT k,
                    ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                        || CAST(k AS VARCHAR)), 1, 4))::BIGINT
                        % 1024 AS pos
             FROM probe_keys CROSS JOIN rows_j
           ), passed AS (
             SELECT k FROM probe_pos
             JOIN bits USING (pos)
             GROUP BY k HAVING count(*) = 3
           )
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM probe_keys)
                      AS n_probe,
                  (SELECT CAST(count(*) AS BIGINT) FROM passed)
                      AS n_pass,
                  (SELECT CAST(count(*) AS BIGINT) FROM probe_keys
                   WHERE k IN (SELECT k FROM build)) AS n_true,
                  (SELECT CAST(count(*) AS BIGINT) FROM passed)
                  - (SELECT CAST(count(*) AS BIGINT) FROM probe_keys
                     WHERE k IN (SELECT k FROM build)) AS n_false_pos""",
    ),
    "q_join_spatial_radius": QuerySpec(
        q_join_spatial_radius,
        """WITH pts AS (
             SELECT c_custkey AS pid,
                    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                    1, 4))::BIGINT % 1000 AS x,
                    ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                                    5, 4))::BIGINT % 1000 AS y
             FROM customer
           ), cells AS (
             SELECT pid, x, y,
                    x - x % 15 AS cx, y - y % 15 AS cy
             FROM pts
           ), a AS (
             SELECT pid AS id_a, x AS xa, y AS ya,
                    cx + dx * 15 AS cx, cy + dy * 15 AS cy
             FROM cells
             CROSS JOIN (VALUES (-1), (0), (1)) AS ox(dx)
             CROSS JOIN (VALUES (-1), (0), (1)) AS oy(dy)
           ), cand AS (
             SELECT id_a, xa, ya, b.pid AS id_b, b.x AS xb, b.y AS yb
             FROM a JOIN cells b USING (cx, cy)
             WHERE id_a < b.pid
           )
           SELECT id_a, id_b,
                  CAST((xa - xb) * (xa - xb)
                       + (ya - yb) * (ya - yb) AS BIGINT) AS dist2
           FROM cand
           WHERE (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
                 <= 225""",
    ),
    "q_join_fuzzy": QuerySpec(
        q_join_fuzzy,
        """WITH probes AS (
             SELECT p_partkey AS probe_key,
                    substr(p_name, 1,
                           CAST(p_partkey % (length(p_name) - 3) + 3
                                AS INTEGER) - 1)
                    || substr(p_name,
                           CAST(p_partkey % (length(p_name) - 3) + 3
                                AS INTEGER) + 1,
                           length(p_name)
                           - CAST(p_partkey % (length(p_name) - 3) + 3
                                  AS INTEGER)) AS typo
             FROM part
             WHERE p_partkey % 17 = 3 AND length(p_name) >= 5
           )
           , pv AS (
             SELECT probe_key, typo,
                    unnest(list_prepend(typo,
                        list_transform(range(1, length(typo) + 1),
                            i -> substr(typo, 1, CAST(i AS INTEGER) - 1)
                                 || substr(typo, CAST(i AS INTEGER) + 1,
                                           length(typo)
                                           - CAST(i AS INTEGER))))) AS v
             FROM probes
           ), names AS (
             SELECT p_name AS match_name,
                    min(p_partkey) AS canon_key,
                    CAST(count(*) AS BIGINT) AS n_rows
             FROM part GROUP BY 1
           ), rv AS (
             SELECT match_name, canon_key, n_rows,
                    unnest(list_prepend(match_name,
                        list_transform(range(1, length(match_name) + 1),
                            i -> substr(match_name, 1,
                                        CAST(i AS INTEGER) - 1)
                                 || substr(match_name,
                                           CAST(i AS INTEGER) + 1,
                                           length(match_name)
                                           - CAST(i AS INTEGER))))) AS v
             FROM names
           ), cand AS (
             SELECT DISTINCT probe_key, typo, match_name, canon_key,
                             n_rows
             FROM pv JOIN rv USING (v)
           )
           SELECT probe_key, typo, match_name, canon_key, n_rows,
                  CAST(levenshtein(typo, match_name) AS INTEGER) AS dist
           FROM cand WHERE levenshtein(typo, match_name) <= 1""",
    ),
    "q_join_runtime_filter": QuerySpec(
        q_join_runtime_filter,
        """SELECT l_orderkey,
                  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
                  round(max(o_totalprice), 2) AS o_price
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           WHERE o_totalprice > 450000
           GROUP BY l_orderkey""",
    ),
    "q_join_inner": QuerySpec(
        q_join_inner,
        """SELECT o_orderkey, c_custkey, c_name, o_totalprice, c_mktsegment
           FROM orders JOIN customer ON o_custkey = c_custkey""",
    ),
    "q_join_salted": QuerySpec(
        q_join_salted,
        """SELECT o_orderkey, c_custkey, c_name, o_totalprice, c_mktsegment
           FROM orders JOIN customer ON o_custkey = c_custkey""",
    ),
    "q_join_broadcast": QuerySpec(
        q_join_broadcast,
        """SELECT r_name, n_name, COUNT(*) AS n_cust,
                  ROUND(SUM(c_acctbal), 2) AS sum_bal
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name""",
    ),
    "q_join_outer": QuerySpec(
        q_join_outer,
        """SELECT c_custkey, c_name, o_orderkey, o_totalprice
           FROM customer LEFT JOIN orders ON c_custkey = o_custkey""",
    ),
    "q_join_semi_anti": QuerySpec(
        q_join_semi_anti,
        """SELECT c_custkey, 'has_orders' AS tag FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           UNION ALL
           SELECT c_custkey, 'no_orders' AS tag FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    ),
    "q_join_theta": QuerySpec(
        q_join_theta,
        """SELECT s_suppkey, n_nationkey, s_acctbal
           FROM supplier JOIN nation ON s_acctbal >= n_nationkey * 300.0""",
    ),
    "q_join_interval_overlap": QuerySpec(
        q_join_interval_overlap,
        """WITH s AS (
             SELECT user_id, event_type, min(ts) AS lo, max(ts) AS hi
             FROM events GROUP BY 1, 2
           )
           SELECT a.user_id,
                  a.event_type AS type_a,
                  b.event_type AS type_b,
                  epoch_us(least(a.hi, b.hi)) - epoch_us(greatest(a.lo, b.lo))
                      AS overlap_us
           FROM s a JOIN s b
             ON a.user_id = b.user_id
            AND a.event_type < b.event_type
            AND a.lo <= b.hi AND b.lo <= a.hi""",
    ),
    "q_join_range": QuerySpec(
        q_join_range,
        """SELECT p.event_id AS purchase_id, c.event_id AS click_id
           FROM events p
           JOIN events c
             ON p.user_id = c.user_id
            AND c.event_type = 'click'
            AND c.ts BETWEEN p.ts - INTERVAL 2 HOUR AND p.ts
           WHERE p.event_type = 'purchase'""",
    ),
    "q_join_asof": QuerySpec(
        q_join_asof,
        """WITH cand AS (
             SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                    ROW_NUMBER() OVER (
                      PARTITION BY p.event_id
                      ORDER BY c.ts DESC, c.event_id DESC
                    ) AS rn
             FROM events p
             LEFT JOIN events c
               ON p.user_id = c.user_id
              AND c.event_type = 'click'
              AND c.ts <= p.ts
             WHERE p.event_type = 'purchase'
           )
           SELECT purchase_id, click_id FROM cand WHERE rn = 1""",
    ),
    "q_join_asof_tolerance": QuerySpec(
        q_join_asof_tolerance,
        """WITH cand AS (
             SELECT p.event_id AS purchase_id, c.event_id AS click_id,
                    p.ts AS pts, c.ts AS cts,
                    ROW_NUMBER() OVER (
                      PARTITION BY p.event_id
                      ORDER BY c.ts DESC, c.event_id DESC
                    ) AS rn
             FROM events p
             LEFT JOIN events c
               ON p.user_id = c.user_id
              AND c.event_type = 'click'
              AND c.ts <= p.ts
             WHERE p.event_type = 'purchase'
           )
           SELECT purchase_id,
                  CASE WHEN cts >= pts - INTERVAL 1 HOUR
                       THEN click_id END AS click_id,
                  CASE WHEN cts >= pts - INTERVAL 1 HOUR
                       THEN CAST(epoch_us(pts) - epoch_us(cts)
                                 AS BIGINT) // 1000000 END AS gap_s
           FROM cand WHERE rn = 1
           ORDER BY purchase_id""",
    ),
}
