"""PageRank: numpy power-iteration parity + structural sanity.

The registry-level hash check (q_graph_pagerank vs the unrolled-CTE
DuckDB oracle) covers the fixture graph; these tests pin the OPERATOR
contract on planted graphs where the expected structure is known.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from python_darima_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping, iterations):
    """Dense restatement of the operator's exact semantics: dedup edges,
    node set = src ∪ dst, no dangling redistribution."""
    edges = sorted(set((int(u), int(v)) for u, v in edges if u != v))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {node: i for i, node in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[idx[u]] += 1
    ranks = np.full(n, 1.0 / n)
    for _ in range(iterations):
        new = np.full(n, (1.0 - damping) / n)
        for u, v in edges:
            new[idx[v]] += damping * ranks[idx[u]] / deg[idx[u]]
        ranks = new
    return {node: ranks[idx[node]] for node in nodes}


def test_pagerank_matches_power_iteration(spark):
    """Mixed graph: a cycle, a chord, a sink (no out-edges, rank leaks),
    and a source (no in-edges, settles at the teleport floor)."""
    edges = [
        (1, 2), (2, 3), (3, 1),      # cycle
        (1, 3),                      # chord
        (3, 4),                      # 4 is a sink
        (5, 1), (5, 2),              # 5 is a source
    ]
    want = _numpy_pagerank(edges, damping=0.85, iterations=5)
    got = (
        pagerank(
            spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"])),
            damping=0.85,
            iterations=5,
        )
        .toPandas()
        .set_index("node")
    )
    assert set(got.index) == set(want)
    for node, r in want.items():
        assert abs(got.loc[node, "rank"] - r) < 1e-12, (node, r)
    # source node has no in-edges -> exactly the teleport floor
    assert abs(got.loc[5, "rank"] - (1 - 0.85) / 5) < 1e-12


def test_pagerank_plan_shape(spark, sf_dir):
    """The iterative plan must stay keyed: N rides as 1-row broadcasts
    (BroadcastNestedLoopJoin with a single-row side — one per crossJoin,
    i.e. iterations + init + final), never a real CartesianProduct, and
    each iteration contributes exactly one equi-join of ranks into the
    checkpointed adjacency."""
    from python_darima_spark.queries.graph import q_graph_pagerank

    plan = (
        q_graph_pagerank(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # 5 iterations + rank init + final scale = 7 single-row crossJoins
    # (the teleport-floor rows' crossJoin is checkpointed out of lineage)
    assert plan.count("BroadcastNestedLoopJoin") == 7
    # per-iteration ranks ⋈ adj equi-joins (SMJ or hash — engine's pick);
    # exactly one per iteration since the round-10 rewrite replaced the
    # per-iteration left join onto the node set with a union of the
    # static teleport-floor rows
    equi_joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert equi_joins == 5  # one contrib join per iteration, nothing else
    assert plan.count("Union") == 5  # teleport-floor union per iteration


def test_pagerank_hub_outranks_leaves(spark):
    """Symmetric star: the hub must outrank every leaf, leaves tie."""
    leaves = list(range(1, 9))
    edges = [(0, leaf) for leaf in leaves] + [(leaf, 0) for leaf in leaves]
    got = (
        pagerank(spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"])))
        .toPandas()
        .set_index("node")["rank"]
    )
    hub, leaf_ranks = got.loc[0], got.drop(0)
    assert (hub > leaf_ranks).all()
    assert leaf_ranks.std() < 1e-15
    # symmetric graph has no dangling mass: total rank is conserved
    assert abs(got.sum() - 1.0) < 1e-9


def test_bfs_distances_on_planted_graph(spark):
    """Chain + branch: distances are minimum hops, unreachable and
    beyond-max_hops nodes are absent, sources sit at 0."""
    edges = pd.DataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (2, 10), (99, 100)],
        columns=["src", "dst"],
    )
    sources = pd.DataFrame({"node": [1]})
    from python_darima_spark.operators.graph import bfs_distances

    got = {
        r.node: r.dist
        for r in bfs_distances(
            spark.createDataFrame(edges),
            spark.createDataFrame(sources),
            max_hops=3,
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 10: 2, 4: 3}  # 5 is 4 hops; 99/100 unreachable


def test_kcore_matches_python_peel(spark):
    """q_graph_kcore equals an independent pure-python synchronous peel
    of the same co-order graph (sets + dict degree counting — no joins),
    and every survivor meets the min-degree bound among survivors."""
    from python_darima_spark.queries.graph import (
        _KCORE_K,
        _KCORE_ROUNDS,
        _coorder_edges,
        q_graph_kcore,
    )

    sf = "/root/testdata/sf0.01"
    edges = [
        (r.src, r.dst) for r in _coorder_edges(spark, sf).collect()
    ]
    alive = {u for u, _ in edges}
    deg: dict = {}
    for _ in range(_KCORE_ROUNDS):
        deg = {}
        for u, v in edges:
            if u in alive and v in alive:
                deg[u] = deg.get(u, 0) + 1
        alive = {u for u, d in deg.items() if d >= _KCORE_K}
    want = sorted((u, deg[u]) for u in alive)
    got = sorted(
        (r.node, r.deg) for r in q_graph_kcore(spark, sf).collect()
    )
    assert got == want
    assert all(d >= _KCORE_K for _, d in got)
