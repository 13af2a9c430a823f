"""Pointer-jumping alias resolution (operators/aliases.py): hand
chains, a python-twin random forest, the O(log chain) doubling bound,
cycle/ambiguity guards, and partition invariance."""

import pytest

from deepie_spark.operators.aliases import resolve_aliases


def _df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_resolve_hand_chain(spark):
    out = {
        r.src: (r.canonical, r.hops)
        for r in resolve_aliases(
            _df(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")])
        ).collect()
    }
    assert out == {
        "a": ("d", 3),
        "b": ("d", 2),
        "c": ("d", 1),
        "e": ("d", 1),
    }


def test_resolve_random_forest_python_twin(spark):
    import random

    rng = random.Random(7)
    # acyclic by construction: node i points to some j < i; roots are
    # the nodes never used as src (multiples of 9 and node 0)
    edges = [
        (f"n{i}", f"n{rng.randrange(i)}")
        for i in range(1, 120)
        if i % 9 != 0
    ]
    parent = {s: d for s, d in edges}

    def walk(v):
        hops = 0
        while v in parent:
            v, hops = parent[v], hops + 1
        return v, hops

    out = {
        r.src: (r.canonical, r.hops)
        for r in resolve_aliases(_df(spark, edges)).collect()
    }
    assert out == {s: walk(s) for s in parent}
    # partition invariance
    out2 = {
        r.src: (r.canonical, r.hops)
        for r in resolve_aliases(_df(spark, edges).repartition(7)).collect()
    }
    assert out2 == out


def test_resolve_doubling_bound(spark):
    # a 20-edge chain resolves in ceil(log2(20)) = 5 doubling rounds
    chain = [(f"c{i}", f"c{i + 1}") for i in range(20)]
    out = resolve_aliases(_df(spark, chain), max_rounds=5).collect()
    assert {r.canonical for r in out} == {"c20"}
    assert max(r.hops for r in out) == 20
    # 3 rounds bound chains at 2**3 = 8 < 20 → explicit failure, not a
    # silent mid-chain result
    with pytest.raises(RuntimeError, match="unresolved"):
        resolve_aliases(_df(spark, chain), max_rounds=3)


def test_resolve_cycle_raises(spark):
    with pytest.raises(RuntimeError, match="unresolved"):
        resolve_aliases(
            _df(spark, [("a", "b"), ("b", "a"), ("x", "a")]),
            max_rounds=6,
        )


def test_resolve_ambiguous_raises(spark):
    with pytest.raises(ValueError, match="not functional"):
        resolve_aliases(_df(spark, [("a", "b"), ("a", "c")]))


def test_resolve_self_loops_dropped(spark):
    # a self-loop is "already canonical": no output row, no hang
    out = resolve_aliases(
        _df(spark, [("x", "x"), ("a", "x")])
    ).collect()
    assert [(r.src, r.canonical, r.hops) for r in out] == [("a", "x", 1)]
