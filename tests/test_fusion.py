"""Truth discovery (operators/fusion.py): hand-computed two-round
fixpoint, vote/claim semantics, majority-vote equivalence at rounds=1,
and partition invariance."""

import pytest

from deepie_spark.operators.fusion import truth_discovery


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "source string, entity string, value string"
    )


_HAND = [
    ("A", "e1", "x"),
    ("A", "e2", "x"),
    ("A", "e3", "x"),
    ("B", "e1", "x"),
    ("B", "e2", "y"),
    ("C", "e1", "y"),
    ("C", "e2", "y"),
    ("C", "e3", "y"),
]


def test_truth_discovery_hand_computed(spark):
    # round 1 (uniform trust): e1→x (2:1), e2→y (2:1), e3 tie → min
    # value x; trusts A=2/3, B=1, C=1/3.
    # round 2 (weighted): e1 x=5/3 vs y=1/3 → x; e2 x=2/3 vs y=4/3 →
    # y; e3 x=2/3 vs y=1/3 → x (now a clear win, not a tie-break).
    out = {
        r.source: r
        for r in truth_discovery(_claims(spark, _HAND)).collect()
    }
    assert (out["A"].n_claims, out["A"].n_correct) == (3, 2)
    assert (out["B"].n_claims, out["B"].n_correct) == (2, 2)
    assert (out["C"].n_claims, out["C"].n_correct) == (3, 1)
    assert out["A"].trust == round(2 / 3, 6)
    assert out["B"].trust == 1.0
    assert out["C"].trust == round(1 / 3, 6)


def test_truth_discovery_round1_is_majority_vote(spark):
    out1 = {
        r.source: r
        for r in truth_discovery(_claims(spark, _HAND), rounds=1).collect()
    }
    # same resolved values here (e3 via tie-break) → same counts
    assert (out1["A"].n_claims, out1["A"].n_correct) == (3, 2)
    assert (out1["C"].n_claims, out1["C"].n_correct) == (3, 1)


def test_truth_discovery_duplicate_and_contradiction(spark):
    rows = [
        ("A", "e1", "x"),
        ("A", "e1", "x"),  # duplicate assertion: ONE claim
        ("B", "e1", "x"),
        ("B", "e1", "y"),  # self-contradiction: TWO claims, ≤1 correct
    ]
    out = {
        r.source: r
        for r in truth_discovery(_claims(spark, rows)).collect()
    }
    assert (out["A"].n_claims, out["A"].n_correct) == (1, 1)
    assert (out["B"].n_claims, out["B"].n_correct) == (2, 1)
    assert out["B"].trust == 0.5


def test_truth_discovery_partition_invariance(spark):
    import random

    rng = random.Random(3)
    rows = [
        (
            f"s{rng.randrange(5)}",
            f"e{rng.randrange(12)}",
            f"v{rng.randrange(3)}",
        )
        for _ in range(200)
    ]
    base = sorted(
        tuple(r) for r in truth_discovery(_claims(spark, rows)).collect()
    )
    rep = sorted(
        tuple(r)
        for r in truth_discovery(
            _claims(spark, rows).repartition(7)
        ).collect()
    )
    assert base == rep


def test_truth_discovery_rounds_guard(spark):
    with pytest.raises(ValueError, match="rounds"):
        truth_discovery(_claims(spark, _HAND), rounds=0)
