import random

from deepie_spark.operators.temporal import earliest_arrival


def _twin(edges, seeds, max_hops):
    """Bounded time-respecting walk enumeration + min."""
    best = dict(seeds)
    frontier = dict(seeds)
    for _ in range(max_hops):
        nxt = {}
        for (a, b, t) in edges:
            if a in frontier and t >= frontier[a]:
                if b not in nxt or t < nxt[b]:
                    nxt[b] = t
        # relax against the global best (min domination)
        frontier = {}
        for v, t in nxt.items():
            if v not in best or t < best[v]:
                best[v] = t
        # the spark side relaxes from ALL current minima each round,
        # so the twin must too
        frontier = dict(best)
    return best


def test_earliest_arrival_hand(spark):
    # a -(5)-> b -(3)-> c : b reachable at 5, but the b->c edge at 3
    # precedes the arrival — c unreachable; d via a -(2)-> d -(7)-> c
    edges = [("a", "b", 5), ("b", "c", 3), ("a", "d", 2), ("d", "c", 7)]
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame([("a", 0)], "node string, arr long")
    got = {r.entity: r.arrival
           for r in earliest_arrival(e, s, max_hops=4).collect()}
    assert got == {"a": 0, "b": 5, "d": 2, "c": 7}


def test_earliest_arrival_horizon_bound(spark):
    # chain of 3 edges, horizon 2: the last hop is out of budget
    edges = [("a", "b", 1), ("b", "c", 2), ("c", "d", 3)]
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame([("a", 0)], "node string, arr long")
    got = {r.entity: r.arrival
           for r in earliest_arrival(e, s, max_hops=2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_earliest_arrival_random_python_twin(spark):
    rng = random.Random(79)
    nodes = [f"n{i}" for i in range(14)]
    edges = sorted({
        (rng.choice(nodes), rng.choice(nodes), rng.randrange(0, 30))
        for _ in range(60)
    })
    edges = [(a, b, t) for a, b, t in edges if a != b]
    seeds = [("n0", 0), ("n1", 5)]
    want = _twin(edges, seeds, 5)
    e = spark.createDataFrame(edges, "src string, dst string, t long")
    s = spark.createDataFrame(seeds, "node string, arr long")
    got = {r.entity: r.arrival
           for r in earliest_arrival(e, s, max_hops=5).collect()}
    assert got == want
    got2 = {r.entity: r.arrival
            for r in earliest_arrival(
                e.repartition(7), s, max_hops=5).collect()}
    assert got2 == got
