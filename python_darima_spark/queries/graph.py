"""Graph analytics queries: PageRank over a fixture-derived graph.

The graph is the part↔supplier bipartite sourcing network from
``lineitem``: an edge for every distinct (partkey, suppkey) pair, made
SYMMETRIC (both directions) so the chain is ergodic — no dangling
nodes, and the operator's no-redistribution simplification is exact.
Part nodes are offset by 1e6 to disjoint the two key spaces.

The DuckDB oracle restates the SAME fixed-iteration recurrence with the
iterations UNROLLED as chained CTEs (r0 → r5) rather than a recursive
CTE: the recursive form would need an aggregate in the recursive term,
which SQL restricts — and unrolling keeps the oracle a pure ANSI
restatement of exactly what the Spark loop computes. Ranks are emitted
scaled by N (``rank_x_n`` ≈ 1 for an average node) and rounded to 6
decimals so both engines' summation-order ulps cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_darima_spark.operators.graph import bfs_distances, pagerank
from python_darima_spark.queries import QuerySpec, load

_PART_OFFSET = 1_000_000
_DAMPING = 0.85
_ITERS = 5


def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """5-iteration PageRank on the symmetric part↔supplier graph.

    Per iteration: one shuffle on ``src`` (ranks ⋈ checkpointed
    adjacency) + one hash aggregate on ``dst`` — see
    operators/graph.py for the 100 TB notes."""
    li = load(spark, sf, "lineitem")
    part_node = (F.col("l_partkey") + F.lit(_PART_OFFSET)).cast("long")
    supp_node = F.col("l_suppkey").cast("long")
    edges = li.select(part_node.alias("src"), supp_node.alias("dst")).union(
        li.select(supp_node.alias("src"), part_node.alias("dst"))
    )
    pr = pagerank(edges, damping=_DAMPING, iterations=_ITERS)
    return pr.select(
        "node", F.round(F.col("rank") * F.col("n"), 6).alias("rank_x_n")
    )


def _pagerank_oracle() -> str:
    head = f"""WITH e AS (
             SELECT DISTINCT l_partkey + {_PART_OFFSET} AS src,
                    CAST(l_suppkey AS BIGINT) AS dst
             FROM lineitem
             UNION
             SELECT DISTINCT CAST(l_suppkey AS BIGINT),
                    l_partkey + {_PART_OFFSET}
             FROM lineitem
           ), deg AS (
             SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src
           ), nodes AS (
             SELECT DISTINCT src AS node FROM e
             UNION SELECT DISTINCT dst FROM e
           ), nn AS (
             SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
           ), r0 AS (
             SELECT node, 1.0 / nn.n AS rank FROM nodes, nn
           )"""
    step = """, r{next} AS (
             SELECT nd.node,
                    (1.0 - {d}) / (SELECT n FROM nn)
                    + {d} * coalesce(c.s, 0.0) AS rank
             FROM nodes nd
             LEFT JOIN (
               SELECT e.dst AS node, sum(r.rank / deg.deg) AS s
               FROM e
               JOIN r{cur} r ON r.node = e.src
               JOIN deg ON deg.src = e.src
               GROUP BY e.dst
             ) c ON c.node = nd.node
           )"""
    body = "".join(
        step.format(cur=i, next=i + 1, d=_DAMPING) for i in range(_ITERS)
    )
    tail = f"""
           SELECT node, round(rank * (SELECT n FROM nn), 6) AS rank_x_n
           FROM r{_ITERS}"""
    return head + body + tail


def q_graph_bfs(spark: SparkSession, sf: str) -> DataFrame:
    """BFS hop distances (≤ 3) from the supplier seed set
    (s_suppkey % 50 == 0) over the same symmetric part↔supplier graph.
    The oracle is a genuine RECURSIVE CTE (walk expansion bounded by
    depth, min(dist) per node) — pure frontier expansion needs no
    aggregate in the recursive term, so unlike PageRank the recursion
    doesn't have to be unrolled."""
    li = load(spark, sf, "lineitem")
    part_node = (F.col("l_partkey") + F.lit(_PART_OFFSET)).cast("long")
    supp_node = F.col("l_suppkey").cast("long")
    edges = li.select(part_node.alias("src"), supp_node.alias("dst")).union(
        li.select(supp_node.alias("src"), part_node.alias("dst"))
    )
    seeds = (
        load(spark, sf, "supplier")
        .where(F.col("s_suppkey") % 50 == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return bfs_distances(edges, seeds, max_hops=3)


_BFS_ORACLE = f"""WITH RECURSIVE e AS (
             SELECT DISTINCT l_partkey + {_PART_OFFSET} AS src,
                    CAST(l_suppkey AS BIGINT) AS dst
             FROM lineitem
             UNION
             SELECT DISTINCT CAST(l_suppkey AS BIGINT),
                    l_partkey + {_PART_OFFSET}
             FROM lineitem
           ), walk(node, dist) AS (
             SELECT CAST(s_suppkey AS BIGINT), 0
             FROM supplier WHERE s_suppkey % 50 = 0
             UNION ALL
             SELECT e.dst, w.dist + 1
             FROM walk w JOIN e ON e.src = w.node
             WHERE w.dist < 3
           )
           SELECT node, CAST(min(dist) AS INT) AS dist
           FROM walk GROUP BY node"""


def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """TRIANGLE COUNTING per node — the clustering-coefficient /
    community-density primitive. The part↔supplier PageRank graph is
    bipartite (triangle-free by construction), so this runs on the
    part CO-ORDER projection: an edge between two parts that appear on
    the same order with l_quantity ≥ 45 (the quantity cut keeps the
    projection sparse — max degree ~13 on the fixture, edge count
    linear in orders; the UNCUT projection's hub parts would make the
    wedge join quadratic, the same hot-bucket failure mode as uncapped
    LSH). Edges are canonically oriented a<b, triangles enumerated by
    the standard wedge join e1(a,b)⋈e2(b,c)⋈e3(a,c) with a<b<c — each
    triangle found exactly once, two equi-joins, no theta join. Per-
    node counts come from exploding each triangle to its 3 corners.
    At 100 TB the orientation upgrade is by (degree, id) instead of id
    — bounds wedge work by arboricity (Suri & Vassilvitskii 2011) —
    and the co-order pair generation is basket-bounded exactly like
    q_basket_pairs."""
    f = (
        load(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    e = (
        f.alias("x")
        .join(f.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .distinct()
    )
    e1 = e.select(F.col("a"), F.col("b"))
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e1.join(e2, "b")
        .join(
            e3,
            (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")),
        )
        .select("a", "b", "c")
    )
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return (
        corners.groupBy("node")
        .agg(F.count("*").alias("tri_count"))
        .orderBy("node")
    )


_TRIANGLES_ORACLE = """WITH f AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 45
           ), e AS (
             SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
             FROM f x JOIN f y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey
           ), tri AS (
             SELECT e1.a, e1.b, e2.b AS c
             FROM e e1
             JOIN e e2 ON e2.a = e1.b
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
           ), corners AS (
             SELECT a AS node FROM tri
             UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri
           )
           SELECT node, CAST(count(*) AS BIGINT) AS tri_count
           FROM corners GROUP BY node ORDER BY node"""


_LPA_ROUNDS = 3


def _coorder_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric part co-order edges (the q_graph_triangles projection,
    both directions) — l_quantity ≥ 45 keeps it sparse."""
    f = (
        load(spark, sf, "lineitem")
        .where(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    half = (
        f.alias("x")
        .join(f.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .distinct()
    )
    return half.union(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def q_graph_labelprop(spark: SparkSession, sf: str) -> DataFrame:
    """COMMUNITY DETECTION by synchronous label propagation (Raghavan
    et al. 2007) on the part co-order graph — the cheap community
    screen run before anything Louvain-shaped. Deterministic variant
    so the driver hash pins it: labels start as node ids; each of the
    3 synchronous rounds every node adopts the most frequent label
    among its neighbors, ties to the SMALLEST label, isolated nodes
    keep their own (coalesce). Per round: one join (labels ⋈ edges) +
    one (node, label) count + one argmax window — the same
    unrolled-iteration shape as q_graph_pagerank, and the oracle
    restates the identical 3 rounds as chained CTEs. Emits each node's
    final community and the community size joined back. At 100 TB:
    rounds are O(edges) keyed shuffles; synchronous LPA is exactly the
    Pregel superstep Spark expresses as join+agg, checkpoint per round
    for lineage (operators/graph.py note).

    The edge list is ``localCheckpoint``-ed ONCE (the co-order self-join
    is the expensive subtree; uncheckpointed, every round's plan re-read
    it) and ``labels`` is checkpointed PER ROUND: each round consumes
    the previous labels twice (the votes join and the coalesce
    fallback), so an unmaterialized loop doubles the labels subtree per
    round — the round-10 before-plan held 240 copies of the lineitem
    scan; checkpointing makes the plan linear in rounds, values
    unchanged."""
    edges = _coorder_edges(spark, sf).localCheckpoint(eager=True)
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            edges.join(
                labels.select(
                    F.col("node").alias("src"), F.col("label")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("votes"))
        )
        w = Window.partitionBy("node").orderBy(
            F.desc("votes"), F.asc("label")
        )
        best = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce("new_label", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    return (
        labels.join(sizes, "label")
        .select("node", "label", "community_size")
        .orderBy("node")
    )


def _labelprop_oracle() -> str:
    head = """WITH f AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 45
           ), half AS (
             SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
             FROM f x JOIN f y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey
           ), e AS (
             SELECT src, dst FROM half
             UNION SELECT dst, src FROM half
           ), l0 AS (
             SELECT DISTINCT src AS node, src AS label FROM e
           )"""
    step = """, l{next} AS (
             SELECT l.node,
                    coalesce(b.new_label, l.label) AS label
             FROM l{cur} l
             LEFT JOIN (
               SELECT node, label AS new_label FROM (
                 SELECT e.dst AS node, p.label,
                        row_number() OVER (
                          PARTITION BY e.dst
                          ORDER BY count(*) DESC, p.label) AS rn
                 FROM e JOIN l{cur} p ON p.node = e.src
                 GROUP BY e.dst, p.label
               ) WHERE rn = 1
             ) b ON b.node = l.node
           )"""
    body = "".join(
        step.format(cur=i, next=i + 1) for i in range(_LPA_ROUNDS)
    )
    tail = f"""
           SELECT l.node, l.label,
                  CAST(s.community_size AS BIGINT) AS community_size
           FROM l{_LPA_ROUNDS} l
           JOIN (
             SELECT label, count(*) AS community_size
             FROM l{_LPA_ROUNDS} GROUP BY label
           ) s ON s.label = l.label
           ORDER BY l.node"""
    return head + body + tail


_KCORE_K = 3
_KCORE_ROUNDS = 5


def q_graph_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """K-CORE DECOMPOSITION (k=3) of the part co-order graph — the
    density screen that strips low-degree fringe before community /
    influence analysis (and the standard spam-subgraph filter on web
    corpora). Iterative peel: each round drops every node whose degree
    AMONG SURVIVORS is < k; a node's degree can only fall as neighbors
    leave, so the fixed point is the maximal subgraph with min-degree
    ≥ k. The engine runs _KCORE_ROUNDS synchronous rounds (semantics =
    survivors-after-R-peels, deterministic whether or not converged;
    on this fixture alive counts go 1494→533→241→112→74→68, so R=5 is
    one round short of the fixed point ON PURPOSE — the oracle must
    certify the ITERATION, not just a converged set that many wrong
    iteration counts would also reach). Per round: two semi-joins of
    the static edge list against the alive set + one count — the same
    unrolled shape as q_graph_pagerank; alive shrinks monotonically so
    later rounds get cheaper. At 100 TB: edges are the shuffle axis,
    alive sets are skinny (node only); localCheckpoint per round cuts
    the growing lineage exactly like the other iterative operators
    (operators/graph.py note), and real deployments peel with k-level
    buckets (Montresor et al.) — same join shape, fewer rounds.

    The static edge list is ``localCheckpoint``-ed once: every round
    semi-joins it twice, and uncheckpointed each reference re-derived
    the co-order self-join from the lineitem scan (8 scans in the
    round-10 before-plan)."""
    edges = _coorder_edges(spark, sf).localCheckpoint(eager=True)
    alive = edges.select(F.col("src").alias("node")).distinct()
    deg = None
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.join(alive.withColumnRenamed("node", "src"), "src")
            .join(alive.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("deg"))
        )
        alive = (
            deg.where(F.col("deg") >= _KCORE_K)
            .select("node")
            .localCheckpoint(eager=True)
        )
    return (
        deg.where(F.col("deg") >= _KCORE_K)
        .select("node", "deg")
        .orderBy("node")
    )


def _kcore_oracle() -> str:
    head = """WITH f AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 45
           ), half AS (
             SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
             FROM f x JOIN f y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey
           ), e AS (
             SELECT src, dst FROM half
             UNION SELECT dst, src FROM half
           ), a0 AS (
             SELECT DISTINCT src AS node FROM e
           )"""
    step = """, d{cur} AS (
             SELECT e.src AS node, count(*) AS deg
             FROM e
             JOIN a{cur} p ON p.node = e.src
             JOIN a{cur} q ON q.node = e.dst
             GROUP BY e.src
           ), a{next} AS (
             SELECT node FROM d{cur} WHERE deg >= {k}
           )"""
    body = "".join(
        step.format(cur=i, next=i + 1, k=_KCORE_K)
        for i in range(_KCORE_ROUNDS)
    )
    tail = f"""
           SELECT node, deg FROM d{_KCORE_ROUNDS - 1}
           WHERE deg >= {_KCORE_K}
           ORDER BY node"""
    return head + body + tail


def build_kcore_oracle(duck, sf_dir: str | None = None) -> str:
    """Scale-adaptive k-core oracle: each peel round materialized as a
    REAL temp table. The chained-CTE string (the static ``oracle``)
    references every a_i twice from d_i, and DuckDB re-evaluates chained
    CTEs per reference — the base re-evaluates ~2^rounds times (measured
    482 s at sf1, vs 37 s at sf0.1). One temp table per round makes each
    join pass run exactly once; values are identical because the temp
    tables hold exactly the CTE contents (same statements, just
    materialized)."""
    duck.execute(
        """CREATE OR REPLACE TEMP TABLE _kcore_e AS
           WITH f AS (
             SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
             WHERE l_quantity >= 45
           ), half AS (
             SELECT DISTINCT x.l_partkey AS src, y.l_partkey AS dst
             FROM f x JOIN f y ON x.l_orderkey = y.l_orderkey
                              AND x.l_partkey < y.l_partkey
           )
           SELECT src, dst FROM half
           UNION SELECT dst, src FROM half"""
    )
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE _kcore_a0 AS "
        "SELECT DISTINCT src AS node FROM _kcore_e"
    )
    for i in range(_KCORE_ROUNDS):
        duck.execute(
            f"""CREATE OR REPLACE TEMP TABLE _kcore_d{i} AS
                SELECT e.src AS node, count(*) AS deg
                FROM _kcore_e e
                JOIN _kcore_a{i} p ON p.node = e.src
                JOIN _kcore_a{i} q ON q.node = e.dst
                GROUP BY e.src"""
        )
        duck.execute(
            f"CREATE OR REPLACE TEMP TABLE _kcore_a{i + 1} AS "
            f"SELECT node FROM _kcore_d{i} WHERE deg >= {_KCORE_K}"
        )
    return (
        f"SELECT node, deg FROM _kcore_d{_KCORE_ROUNDS - 1} "
        f"WHERE deg >= {_KCORE_K} ORDER BY node"
    )


QUERIES = {
    "q_graph_pagerank": QuerySpec(q_graph_pagerank, _pagerank_oracle()),
    "q_graph_bfs": QuerySpec(q_graph_bfs, _BFS_ORACLE),
    "q_graph_triangles": QuerySpec(q_graph_triangles, _TRIANGLES_ORACLE),
    "q_graph_labelprop": QuerySpec(q_graph_labelprop, _labelprop_oracle()),
    "q_graph_kcore": QuerySpec(
        q_graph_kcore, _kcore_oracle(), oracle_builder=build_kcore_oracle
    ),
}
