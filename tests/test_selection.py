import random

import pytest

from deepie_spark.operators.selection import exact_kth, exact_quantiles


def test_exact_kth_hand(spark):
    df = spark.createDataFrame([(x,) for x in [5, 1, 9, 1, 7]], "x long")
    assert exact_kth(df, "x", 1) == 1
    assert exact_kth(df, "x", 2) == 1  # duplicates counted
    assert exact_kth(df, "x", 3) == 5
    assert exact_kth(df, "x", 5) == 9
    with pytest.raises(ValueError):
        exact_kth(df, "x", 6)
    with pytest.raises(ValueError):
        exact_kth(df, "x", 0)


def test_exact_kth_random_wide_range(spark):
    rng = random.Random(89)
    # wide 64-bit-ish range forces multiple narrowing passes
    xs = [rng.randrange(-(2**40), 2**40) for _ in range(500)]
    xs += [xs[0]] * 7  # duplicate block
    df = spark.createDataFrame([(x,) for x in xs], "x long").repartition(9)
    s = sorted(xs)
    for k in [1, 2, 17, len(xs) // 2, len(xs)]:
        assert exact_kth(df, "x", k) == s[k - 1]


def test_exact_kth_small_buckets(spark):
    # n_buckets=2 degenerates to binary search — exercises many passes
    xs = list(range(100, 0, -1))
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    assert exact_kth(df, "x", 37, n_buckets=2) == 37


def test_exact_quantiles_frame(spark):
    xs = list(range(1, 101))
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r.k: r.value
           for r in exact_quantiles(df, "x", [25, 50, 75, 90]).collect()}
    assert got == {25: 25, 50: 50, 75: 75, 90: 90}


def test_greedy_max_coverage_python_twin(spark):
    import random

    from deepie_spark.operators.selection import greedy_max_coverage

    rng = random.Random(13)
    universe = [f"e{i}" for i in range(40)]
    sets = {
        f"s{j}": set(rng.sample(universe, rng.randint(3, 15)))
        for j in range(25)
    }
    rows = [(s, e) for s, es in sets.items() for e in sorted(es)]
    df = spark.createDataFrame(rows, ["set_id", "element"])
    got = [
        (r["round"], r.set_id, r.gain)
        for r in sorted(
            greedy_max_coverage(df, k=5).collect(),
            key=lambda r: r["round"],
        )
    ]

    covered, expect = set(), []
    for r in range(1, 6):
        gains = {s: len(es - covered) for s, es in sets.items()}
        best = min(sorted(gains), key=lambda s: (-gains[s], s))
        if gains[best] == 0:
            break
        expect.append((r, best, gains[best]))
        covered |= sets[best]
    assert got == expect


def test_greedy_max_coverage_stops_when_covered(spark):
    from deepie_spark.operators.selection import greedy_max_coverage

    # 2 sets cover everything; rounds 3+ have zero gain rows on the
    # Spark side (left_anti leaves nothing) → exactly 2 output rows
    rows = [("a", 1), ("a", 2), ("b", 3), ("c", 1)]
    df = spark.createDataFrame(rows, ["set_id", "element"])
    got = sorted(
        (r["round"], r.set_id, r.gain)
        for r in greedy_max_coverage(df, k=4).collect()
    )
    assert got == [(1, "a", 2), (2, "b", 1)]


def test_dhondt_wikipedia_example(spark):
    """The classic D'Hondt example: 8 seats over votes
    A=100000 B=80000 C=30000 D=20000 -> 4/3/1/0."""
    from deepie_spark.operators.selection import highest_averages_allocation

    df = spark.createDataFrame(
        [("A", 100000), ("B", 80000), ("C", 30000), ("D", 20000)],
        "key string, n long",
    )
    got = {
        r.key: r.slots
        for r in highest_averages_allocation(df, seats=8).collect()
    }
    assert got == {"A": 4, "B": 3, "C": 1, "D": 0}


def test_sainte_lague_and_invariants(spark):
    """Sainte-Laguë divisors (1,3,5,...) favor small parties; slots
    always sum to the house size; house monotonicity holds."""
    from deepie_spark.operators.selection import highest_averages_allocation

    df = spark.createDataFrame(
        [("A", 53), ("B", 24), ("C", 23)], "key string, n long"
    )
    sl = {
        r.key: r.slots
        for r in highest_averages_allocation(
            df, seats=7, divisor_step=2
        ).collect()
    }
    assert sum(sl.values()) == 7
    # Sainte-Laguë hand calc: quotients A:53,17.67,10.6,7.571
    # B:24,8,4.8  C:23,7.667,4.6 -> top7 = A,B,C,A,A,B,C
    # (the 7th seat: C's 23/3=7.667 beats A's 53/7=7.571)
    assert sl == {"A": 3, "B": 2, "C": 2}
    prev = None
    for seats in (3, 5, 8, 12):
        cur = {
            r.key: r.slots
            for r in highest_averages_allocation(df, seats=seats).collect()
        }
        assert sum(cur.values()) == seats
        if prev is not None:
            assert all(cur[k] >= prev[k] for k in cur)  # house-monotone
        prev = cur


def test_neyman_allocation_properties(spark):
    """Higher-spread strata get more budget; allocations sum exactly
    to the budget; all-constant strata fall back to equal split."""
    from deepie_spark.operators.selection import neyman_allocation

    rows = (
        [("flat", 50)] * 40                       # sigma = 0
        + [("narrow", 100 + (i % 3)) for i in range(40)]
        + [("wide", 100 * (i % 11)) for i in range(40)]
    )
    df = spark.createDataFrame(rows, "stratum string, x long")
    got = {r.stratum: r for r in
           neyman_allocation(df, "stratum", "x", budget=100).collect()}
    assert sum(r.alloc for r in got.values()) == 100
    # weights order by spread; 'wide' dwarfs 'narrow' (sigma 316 vs
    # 0.8), so at budget 100 narrow's optimal share rounds to 0
    assert got["wide"].w_fp > got["narrow"].w_fp > got["flat"].w_fp
    assert got["wide"].alloc > got["narrow"].alloc >= got["flat"].alloc
    assert got["flat"].w_fp == 0 and got["wide"].alloc >= 99

    const = spark.createDataFrame(
        [("a", 5)] * 10 + [("b", 7)] * 10, "stratum string, x long"
    )
    eq = {r.stratum: r.alloc for r in
          neyman_allocation(const, "stratum", "x", budget=10).collect()}
    assert eq == {"a": 5, "b": 5}
