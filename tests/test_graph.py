"""PageRank property tests: the distributed implementation must match
a dense numpy reference on known graphs (same damping, same iteration
count, same uniform init restricted to nodes that appear in edges).
"""

from __future__ import annotations

import numpy as np
import pytest

from hackmd_data_pipeline_spark.operators.graph import pagerank


def _numpy_pagerank(edge_list, damping=0.85, iters=10):
    nodes = sorted({n for e in edge_list for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    # symmetrize + distinct
    edges = set()
    for a, b in edge_list:
        edges.add((a, b))
        edges.add((b, a))
    deg = np.zeros(n)
    for a, _ in edges:
        deg[idx[a]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        incoming = np.zeros(n)
        for a, b in edges:
            incoming[idx[b]] += rank[idx[a]] / deg[idx[a]]
        rank = (1 - damping) / n + damping * incoming
    return {node: rank[idx[node]] for node in nodes}


@pytest.mark.parametrize("threshold", [100_000, 0],
                         ids=["local-path", "distributed-path"])
@pytest.mark.parametrize("edge_list", [
    # triangle + pendant + separate 2-chain
    [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)],
    # star: hub 0 with 5 leaves
    [(0, i) for i in range(1, 6)],
    # two chains of different lengths
    [(1, 2), (2, 3), (3, 4), (20, 21), (21, 22)],
])
def test_pagerank_matches_numpy_reference(spark, edge_list, threshold):
    """Both execution paths (bounded driver-side numpy fast path and
    the distributed per-round loop) must match the dense reference."""
    pairs = spark.createDataFrame(edge_list, "id_a long, id_b long")
    got = {r.id: r.rank
           for r in pagerank(pairs, small_graph_threshold=threshold).collect()}
    want = _numpy_pagerank(edge_list)
    assert set(got) == set(want)
    for node, w in want.items():
        assert got[node] == pytest.approx(w, abs=1e-6), f"node {node}"


def test_pagerank_hub_outranks_leaves(spark):
    edge_list = [(0, i) for i in range(1, 8)] + [(100, 101)]
    pairs = spark.createDataFrame(edge_list, "id_a long, id_b long")
    got = {r.id: r.rank for r in pagerank(pairs).collect()}
    assert got[0] > max(got[i] for i in range(1, 8))
    # ranks over the edge-connected node set sum to ~1
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(pairs).collect() == []
    assert pagerank(pairs, small_graph_threshold=0).collect() == []
