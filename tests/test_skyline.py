"""Skyline operator (operators/skyline.py) vs a brute-force twin."""

import numpy as np
import pytest

from deepie_spark.operators.skyline import _sfs_mask, skyline


def _brute_skyline(points):
    """Quadratic NOT-EXISTS twin: keep p iff nothing dominates it."""
    out = []
    for i, p in enumerate(points):
        dominated = any(
            all(q[k] >= p[k] for k in range(len(p)))
            and any(q[k] > p[k] for k in range(len(p)))
            for j, q in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(p)
    return sorted(out)


@pytest.fixture(scope="module")
def random_points():
    rng = np.random.RandomState(41)
    # small integer grid → plenty of dominance AND ties/duplicates
    return [tuple(int(v) for v in rng.randint(0, 12, 3)) for _ in range(300)]


def test_skyline_equals_brute_force(spark, random_points):
    df = spark.createDataFrame(
        [(i,) + p for i, p in enumerate(random_points)],
        ["rid", "x", "y", "z"],
    )
    got = sorted(
        (r.x, r.y, r.z) for r in skyline(df, ["x", "y", "z"]).collect()
    )
    assert got == _brute_skyline(random_points)


def test_skyline_partition_invariant(spark, random_points):
    df = spark.createDataFrame(
        [(i,) + p for i, p in enumerate(random_points)],
        ["rid", "x", "y", "z"],
    )
    one = sorted(
        r.rid for r in skyline(df.coalesce(1), ["x", "y", "z"]).collect()
    )
    many = sorted(
        r.rid
        for r in skyline(df.repartition(7, "rid"), ["x", "y", "z"]).collect()
    )
    assert one == many and one


def test_skyline_keeps_duplicate_optima(spark):
    # two identical maximal points: neither strictly dominates the
    # other, so BOTH are in the skyline (set semantics of dominance)
    rows = [(0, 5, 5), (1, 5, 5), (2, 4, 6), (3, 3, 3), (4, 6, 1)]
    df = spark.createDataFrame(rows, ["rid", "x", "y"])
    got = sorted(r.rid for r in skyline(df, ["x", "y"]).collect())
    assert got == [0, 1, 2, 4]


def test_skyline_single_dim_is_max(spark):
    rows = [(i, v) for i, v in enumerate([3, 9, 9, 1])]
    df = spark.createDataFrame(rows, ["rid", "x"])
    assert sorted(r.rid for r in skyline(df, ["x"]).collect()) == [1, 2]


def test_sfs_mask_superset_of_batch_skyline():
    # the local mask must be EXACTLY the batch skyline (not merely a
    # superset): SFS correctness at the unit level
    rng = np.random.RandomState(7)
    X = rng.randint(0, 8, size=(120, 4))
    kept = X[_sfs_mask(X)]
    assert sorted(map(tuple, kept)) == _brute_skyline(
        [tuple(int(v) for v in r) for r in X]
    )
