"""Relational operators Spark lacks as built-ins, composed from DataFrame
primitives (SURVEY.md §4.3: no custom Catalyst rules needed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_darima_spark.operators import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
    suffix: str = "_right",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (backward direction,
    inclusive — pandas ``merge_asof`` semantics). Left rows with no prior
    right row keep nulls.

    Implementation is the union+window trick, NOT a candidate join: tag both
    sides, union, then ``last(col, ignorenulls=True)`` over a per-key ordered
    window. One shuffle on the key, O(n log n) — whereas the naive
    ``l JOIN r ON key AND r.ts <= l.ts`` + rank explodes to O(|candidate
    pairs|) and dies on dense keys at scale. Ties at equal ts: right sorts
    before left (inclusive ≤); among equal-ts right rows the greatest by
    ``tie_break`` (right-side column names) wins — pass it whenever ts can
    tie, otherwise the winner is partition-order-dependent.

    Output: all left columns, plus each carried right column named
    ``c`` (or ``c + suffix`` on collision with a left column).

    ``tolerance`` (e.g. "7 days"): matches older than ``left_ts − tolerance``
    are nulled out.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = [right_ts] + right_cols

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *left.columns,
    )
    unioned = r.unionByName(l, allowMissingColumns=True)

    order = [F.col("_ts"), F.col("_side")] + [
        F.col(f"_r_{c}") for c in (tie_break or [])
    ]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        unioned = unioned.withColumn(
            f"_f_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    out = unioned.where(F.col("_side") == 1)

    if tolerance:
        # Materialize the flag BEFORE nulling any column: the flag reads
        # _f_<right_ts>, which is itself one of the columns being nulled.
        out = out.withColumn(
            "_stale",
            F.col(f"_f_{right_ts}")
            < F.col("_ts") - F.expr(f"INTERVAL {tolerance}"),
        )
        for c in payload:
            out = out.withColumn(
                f"_f_{c}",
                F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(f"_f_{c}")),
            )

    outname = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    return out.select(
        *left.columns, *[F.col(f"_f_{c}").alias(outname[c]) for c in payload]
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str,
    lo_ts: str,
    hi_ts: str,
    bucket_seconds: int = 7200,
) -> DataFrame:
    """Point-in-interval (range) join as a bucketed EQUI-join.

    Spark has no native range-join optimization: ``p JOIN i ON p.ts
    BETWEEN i.lo AND i.hi`` plans as a nested-loop join — O(|p|·|i|) per
    key, dead at scale. The standard rewrite: quantize time into
    fixed-width buckets, explode each interval onto every bucket it
    overlaps (⌈span/width⌉ + 1 rows — bounded, since real interval spans
    are bounded), tag each point with its single bucket, then hash-join on
    ``(key, bucket)`` and keep the exact BETWEEN as a residual filter.
    Each qualifying pair meets exactly once (a point has ONE bucket), so
    no dedup pass is needed. One shuffle per side, same as any equi-join.

    ``bucket_seconds`` should be ≥ the typical interval span: one-bucket
    intervals duplicate nothing, and the residual filter discards at most
    the adjacent-bucket false candidates.

    Bounds are inclusive on both ends (SQL BETWEEN).
    """
    b = F.lit(int(bucket_seconds))
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(epoch_seconds(lo_ts) / b),
                F.floor(epoch_seconds(hi_ts) / b),
            )
        ),
    )
    p = points.withColumn("_bkt", F.floor(epoch_seconds(point_ts) / b))
    return (
        p.join(i, on=[on, "_bkt"])
        .where(F.col(point_ts).between(F.col(lo_ts), F.col(hi_ts)))
        .drop("_bkt")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Interval×interval OVERLAP join as a bucketed EQUI-join — the
    sibling of :func:`range_join` for the two-intervals case (session vs
    campaign windows, availability vs booking spans, …).

    Both sides explode onto the fixed-width time buckets they span and
    hash-join on ``(key, bucket)``; the exact inclusive-overlap predicate
    ``lo_a ≤ hi_b AND lo_b ≤ hi_a`` stays as a residual filter. Unlike
    the point case, an overlapping pair shares EVERY bucket in its
    intersection, so instead of a post-join ``distinct`` (a second
    shuffle of the full output) each pair is kept only in its FIRST
    shared bucket — ``bkt = max(⌊lo_a/w⌋, ⌊lo_b/w⌋)``, which both sides
    are guaranteed to contain — making the match exactly-once by
    construction. One shuffle per side, same cost as any equi-join, and
    the residual comparisons are all codegen'd."""
    b = F.lit(int(bucket_seconds))

    def bkts(lo: str, hi: str):
        return F.explode(
            F.sequence(
                F.floor(epoch_seconds(lo) / b), F.floor(epoch_seconds(hi) / b)
            )
        )

    l = left.withColumn("_bkt", bkts(lo_a, hi_a))
    r = right.withColumn("_bkt", bkts(lo_b, hi_b))
    first_shared = F.greatest(
        F.floor(epoch_seconds(lo_a) / b), F.floor(epoch_seconds(lo_b) / b)
    )
    return (
        l.join(r, on=[on, "_bkt"])
        .where(
            (F.col(lo_a) <= F.col(hi_b))
            & (F.col(lo_b) <= F.col(hi_a))
            & (F.col("_bkt") == first_shared)
        )
        .drop("_bkt")
    )


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order_cols: list, k: int
) -> DataFrame:
    """Per-group top-k via row_number window (no global sort, no explosion)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting — the mitigation for a HOT join
    key when the right side is too large to broadcast (where AQE's
    skew-join split cannot help either, e.g. a shuffled-hash plan, or a
    hot key so extreme one split still overflows a task).

    Mechanics: the left side gets a deterministic salt in [0, num_salts)
    from a content hash of the whole row, spreading one hot key's rows
    over ``num_salts`` shuffle partitions; the right side is replicated
    ``num_salts``× (explode of a literal range — cheap relative to the
    skewed shuffle it replaces) so every (key, salt) bucket finds its
    match. Result-identical to ``left.join(right, on, how)``.

    Only ``inner`` and ``left`` joins are supported: replicating the
    right side S× would emit unmatched RIGHT rows S times under
    right/full outer semantics.

    Caveat: rows identical in EVERY column share a salt (content hash),
    so a hot key whose rows are full duplicates does not spread; real
    tables have a distinguishing column. At 100 TB prefer trying AQE
    (``spark.sql.adaptive.skewJoin.enabled``) first — this operator is
    for the cases AQE cannot reach.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    lt = left.withColumn("_salt", salt_l)
    rt = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return lt.join(rt, on=[*keys, "_salt"], how=how).drop("_salt")


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered N-step funnel per user: for each step k, the earliest
    event of type ``steps[k]`` strictly AFTER the user's step-(k−1) time.
    One conditional-min aggregate per step, every join keyed on the user
    column — after the first shuffle the whole chain stays co-partitioned
    (AQE reuses the exchange). ``min()`` makes each step deterministic
    with no tie-break column needed.

    Returns one row per user who completed step 1:
    ``(user, first_<step1>, …, first_<stepN>, funnel_stage)`` with
    ``funnel_stage`` = number of steps completed. Later-step columns are
    null once a user drops out. At scale this is the shape to prefer
    over per-user ``collect_list`` + sequence-matching UDFs: state per
    user is one timestamp per step, not the event history."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(user_col, type_col, ts_col)
    cur = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"first_{steps[0]}"))
    )
    reached = cur
    for prev, step in zip(steps, steps[1:]):
        nxt = (
            ev.where(F.col(type_col) == step)
            .join(reached.select(user_col, f"first_{prev}"), user_col)
            .where(F.col(ts_col) > F.col(f"first_{prev}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"first_{step}"))
        )
        cur = cur.join(nxt, user_col, "left")
        reached = nxt
    stage = None
    for step in steps:
        hit = F.when(F.col(f"first_{step}").isNotNull(), 1).otherwise(0)
        stage = hit if stage is None else stage + hit
    return cur.withColumn("funnel_stage", stage)


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed GLOBAL row_number over a total order — the operator
    Spark lacks: ``row_number() OVER (ORDER BY ...)`` with no PARTITION
    BY moves every row through ONE window partition (WindowExec warns
    and the plan stops scaling at exactly the row count a single task
    can sort).

    Plan: (1) ``repartitionByRange`` on the order columns — partitions
    are range-DISJOINT and partition ids ascend with the order, so a
    global rank decomposes into per-partition rank + a prefix offset;
    the ranged frame is ``localCheckpoint``-ed, which is the
    CORRECTNESS linchpin: the range partitioner SAMPLES its boundaries,
    and every materialization of the exchange may sample differently
    (a first formulation measured offsets in one job and ranked in
    another; a second put both in one plan, but AQE materializes the
    two subtree instances as independent stages — both mis-shifted
    whole blocks of ranks, caught by the sf0.1 probe while sf0.01
    happened to sample identically). Checkpointing freezes ONE
    placement that the offset and ranking subtrees then share; ranks
    are invariant to where the boundaries landed, so the output is
    deterministic for any split layout. (2) prefix offsets from a
    per-partition-count aggregate cumulated over O(partitions) rows
    and broadcast-joined back — never a row-scale collect. (3)
    per-partition ``row_number`` windows — each range block ranks
    independently, in parallel.

    ``order_cols`` must be a TOTAL order (include a key column): range
    placement of ties is arbitrary, and per-partition enumeration would
    make tied ranks placement-dependent. On a multi-tenant cluster use
    a reliable checkpoint dir instead of localCheckpoint if executor
    loss during the (short) rank stage must be survivable.
    """
    from python_darima_spark.operators import shuffle_width

    sess = df.sparkSession
    parts = num_partitions or shuffle_width(sess)
    ranged = (
        df.repartitionByRange(parts, *order_cols)
        .localCheckpoint(eager=True)
        .withColumn("_gpid", F.spark_partition_id())
    )
    woff = Window.orderBy("_gpid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # O(partitions) rows — metadata-sized by construction
    offsets = (
        ranged.groupBy("_gpid")
        .count()
        .withColumn(
            "_goff", F.coalesce(F.sum("count").over(woff), F.lit(0))
        )
        .select("_gpid", "_goff")
    )
    w = Window.partitionBy("_gpid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offsets), "_gpid")
        .withColumn(out_col, F.row_number().over(w) + F.col("_goff"))
        .drop("_gpid", "_goff")
    )


def ntile_from_rank(rank_col, n_rows, k: int):
    """SQL ``ntile(k)`` restated from a global 1-based rank and the total
    row count: the first ``n % k`` buckets hold ``n div k + 1`` rows,
    the rest ``n div k`` (exactly the ISO semantics both engines
    implement). Pure integer arithmetic — composes with
    :func:`global_row_number` into a distributed ntile."""
    r0 = rank_col - 1
    big = (n_rows % k) * ((n_rows / k).cast("bigint") + 1)
    in_big = r0 < big
    bucket_big = (r0 / ((n_rows / k).cast("bigint") + 1)).cast("bigint")
    bucket_small = (n_rows % k) + (
        (r0 - big) / (n_rows / k).cast("bigint")
    ).cast("bigint")
    return (F.when(in_big, bucket_big).otherwise(bucket_small) + 1).cast(
        "int"
    )
