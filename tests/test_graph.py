"""PageRank (operators/graph.py) vs a numpy power-iteration twin."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations=3, damping=0.85):
    """Dense twin of the documented semantics: distinct edges, uniform
    start, no dangling redistribution."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[idx[d]] += pr[idx[s]] / out[idx[s]]
        pr = (1.0 - damping) / n + damping * contrib
    return {v: pr[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.RandomState(17)
    n_nodes, n_edges = 200, 1500
    edges = {
        (f"n{rng.randint(n_nodes)}", f"n{rng.randint(n_nodes)}")
        for _ in range(n_edges)
    }
    # keep self-loops out (the entity graph has none; semantics with
    # loops would still match, this just mirrors the production shape)
    return sorted((s, d) for s, d in edges if s != d)


def test_pagerank_matches_numpy_twin(spark, random_graph):
    df = spark.createDataFrame(random_graph, "src string, dst string")
    got = {
        r["node"]: r["pagerank"] for r in pagerank(df, 3).collect()
    }
    want = _numpy_pagerank(random_graph, 3)
    assert set(got) == set(want)
    for v, p in want.items():
        assert got[v] == pytest.approx(round(p, 6), abs=2e-6)


def test_pagerank_mass_and_determinism(spark, random_graph):
    df = spark.createDataFrame(random_graph, "src string, dst string")
    a = pagerank(df, 2).collect()
    b = pagerank(df.repartition(7), 2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # without dangling redistribution total mass only leaks, never
    # grows (tolerance: per-node round-to-6 accumulates to ~n·5e-7)
    total = sum(r["pagerank"] for r in a)
    assert total <= 1.0 + len(a) * 5e-7
