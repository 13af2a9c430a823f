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


def test_cooccurrence_pmi_matches_python_twin(spark):
    import math
    from collections import Counter
    from itertools import combinations

    from deepie_spark.operators.graph import cooccurrence_pmi

    # (doc, entity) mention stream with repeats inside a doc
    rows = [
        (1, 10), (1, 11), (1, 10), (1, 12),
        (2, 10), (2, 11),
        (3, 11), (3, 12),
        (4, 13),
        (5, 10), (5, 11), (5, 12),
    ]
    df = spark.createDataFrame(rows, "doc_id long, entity_id long")
    got = {
        (r["ent_a"], r["ent_b"]): (r["c_ab"], r["pmi"])
        for r in cooccurrence_pmi(df).collect()
    }

    by_doc = {}
    for d, e in rows:
        by_doc.setdefault(d, set()).add(e)
    n_docs = len(by_doc)
    ca = Counter(e for es in by_doc.values() for e in es)
    cab = Counter()
    for es in by_doc.values():
        for a, b in combinations(sorted(es), 2):
            cab[(a, b)] += 1
    exp = {
        k: (c, round(math.log(c * n_docs / (ca[k[0]] * ca[k[1]])), 6))
        for k, c in cab.items()
    }
    assert got == exp
    # sanity anchors: (10,11) co-occur in docs 1,2,5 of 5 docs;
    # 10 is in 3 docs, 11 in 4
    assert got[(10, 11)][0] == 3
    assert got[(10, 11)][1] == round(math.log(3 * 5 / (3 * 4)), 6)
    assert (10, 13) not in got  # never co-occur


def test_degree_histogram_semantics(spark):
    from deepie_spark.operators.graph import degree_histogram

    edges = [
        ("a", "b"), ("b", "a"),   # reverse duplicate → one neighbor each
        ("a", "c"), ("a", "c"),   # multi-edge → counted once
        ("c", "c"),               # self-loop → dropped
        ("d", "a"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["degree"]: r["n_nodes"] for r in degree_histogram(df).collect()}
    # degrees: a=3 (b,c,d), b=1, c=1, d=1
    assert got == {3: 1, 1: 3}
