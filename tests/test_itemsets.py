"""A-priori itemsets + association rules vs itertools brute force."""

from itertools import combinations

import numpy as np
import pytest

from deepie_spark.operators.itemsets import (
    association_rules,
    frequent_itemsets,
)


def _brute_itemsets(baskets, min_support, max_size):
    """Exhaustive support counting over every candidate subset."""
    items = sorted({i for b in baskets for i in b})
    out = {}
    for size in range(1, max_size + 1):
        for combo in combinations(items, size):
            s = sum(1 for b in baskets if set(combo) <= b)
            if s >= min_support:
                out["|".join(combo)] = (size, s)
    return out


@pytest.fixture(scope="module")
def baskets():
    rng = np.random.RandomState(31)
    items = [f"i{k}" for k in range(9)]
    # Zipf-ish inclusion probabilities → a real frequency gradient
    probs = np.array([0.7, 0.6, 0.5, 0.4, 0.3, 0.25, 0.2, 0.1, 0.05])
    return [
        {it for it, p in zip(items, probs) if rng.rand() < p}
        for _ in range(120)
    ]


def _tx_df(spark, baskets):
    rows = [(t, i) for t, b in enumerate(baskets) for i in sorted(b)]
    return spark.createDataFrame(rows, ["tid", "item"])


def test_itemsets_match_brute_force(spark, baskets):
    df = _tx_df(spark, baskets)
    got = {
        r.itemset: (r.size, r.support)
        for r in frequent_itemsets(df, min_support=10, max_size=3).collect()
    }
    assert got == _brute_itemsets(baskets, 10, 3)


def test_itemsets_monotone_in_support(spark, baskets):
    df = _tx_df(spark, baskets)
    lo = {
        r.itemset
        for r in frequent_itemsets(df, min_support=10, max_size=3).collect()
    }
    hi = {
        r.itemset
        for r in frequent_itemsets(df, min_support=30, max_size=3).collect()
    }
    assert hi <= lo


def test_itemsets_duplicate_rows_ignored(spark):
    # (tid, item) multiplicities must not inflate support
    rows = [(0, "a"), (0, "a"), (0, "b"), (1, "a"), (1, "b"), (1, "b")]
    df = spark.createDataFrame(rows, ["tid", "item"])
    got = {
        r.itemset: r.support
        for r in frequent_itemsets(df, min_support=2, max_size=2).collect()
    }
    assert got == {"a": 2, "b": 2, "a|b": 2}


def test_association_rules_brute(spark, baskets):
    df = _tx_df(spark, baskets)
    got = {
        (r.antecedent, r.consequent): (r.support, r.confidence, r.lift)
        for r in association_rules(df, min_support=10).collect()
    }
    truth = _brute_itemsets(baskets, 10, 2)
    # N = transactions PRESENT in the table (an empty basket has no
    # (tid, item) row, so no engine can count it)
    n = sum(1 for b in baskets if b)
    expect = {}
    for key, (size, s_ab) in truth.items():
        if size != 2:
            continue
        a, b = key.split("|")
        sa, sb = truth[a][1], truth[b][1]
        expect[(a, b)] = (s_ab, round(s_ab / sa, 6),
                          round(s_ab * n / (sa * sb), 6))
        expect[(b, a)] = (s_ab, round(s_ab / sb, 6),
                          round(s_ab * n / (sa * sb), 6))
    assert got == expect


def test_association_rules_min_confidence(spark, baskets):
    df = _tx_df(spark, baskets)
    rules = association_rules(df, min_support=10,
                              min_confidence=0.65).collect()
    lo = association_rules(df, min_support=10).collect()
    assert rules and all(r.confidence >= 0.65 for r in rules)
    # the threshold actually filters something
    assert len(rules) < len(lo)


def _contains_pairs_triples(seq):
    """Brute-force subsequence containment for a single sequence."""
    pairs, triples = set(), set()
    n = len(seq)
    for i in range(n):
        for j in range(i + 1, n):
            pairs.add((seq[i], seq[j]))
            for k in range(j + 1, n):
                triples.add((seq[i], seq[j], seq[k]))
    return pairs, triples


def test_sequential_patterns_vs_bruteforce(spark):
    from collections import Counter

    from deepie_spark.operators.itemsets import sequential_patterns

    seqs = {
        "u1": ["a", "b", "a", "c"],
        "u2": ["b", "b", "c"],
        "u3": ["c", "a"],
    }
    rows = [
        (u, it, i) for u, s in seqs.items() for i, it in enumerate(s)
    ]
    df = spark.createDataFrame(rows, ["u", "it", "pos"])
    # support threshold 0 -> keep everything
    got = {
        (r["pattern"], r["length"]): r["support"]
        for r in sequential_patterns(df, "u", "it", "pos", 0, 1).collect()
    }
    want = Counter()
    for s in seqs.values():
        p, t = _contains_pairs_triples(s)
        for a, b in p:
            want[(f"{a}>{b}", 2)] += 1
        for a, b, c in t:
            want[(f"{a}>{b}>{c}", 3)] += 1
    assert got == dict(want)


def test_sequential_patterns_support_filter(spark):
    from deepie_spark.operators.itemsets import sequential_patterns

    rows = [("u1", "a", 0), ("u1", "b", 1), ("u2", "a", 0),
            ("u2", "b", 1), ("u3", "b", 0), ("u3", "a", 1)]
    df = spark.createDataFrame(rows, ["u", "it", "pos"])
    # a>b support 2/3, b>a support 1/3; at >=50% only a>b survives
    got = {r["pattern"]: r["support"]
           for r in sequential_patterns(df, "u", "it", "pos", 1, 2).collect()}
    assert got == {"a>b": 2}
