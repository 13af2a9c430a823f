"""Approximate sketches (operators/sketches.py) vs exact twins."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_hll_within_tolerance_every_source(docs):
    from deepie_spark.operators.sketches import source_shingle_cardinality

    rows = source_shingle_cardinality(docs, k=3).collect()
    assert rows and all(r["approx_ok"] == 1 for r in rows)
    assert all(r["n_exact"] > 0 for r in rows)


def test_count_min_sketch_bounds(docs):
    """true ≤ estimate ≤ true + eps·N for every vocabulary token."""
    from deepie_spark.functions.text import tokenize
    from deepie_spark.operators.sketches import token_count_min

    occ = docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
    exact = {r["token"]: r["n"] for r in occ.groupBy("token")
             .agg(F.count("*").alias("n")).collect()}
    total = sum(exact.values())
    eps = 0.001
    cms = token_count_min(docs, eps=eps)
    for tok, n in exact.items():
        est = cms.estimateCount(tok)
        assert est >= n, tok
        assert est <= n + eps * total, tok


def test_count_min_sketch_is_mergeable(docs):
    """Half-corpus sketches merged == semantics of one full build
    (estimates still upper-bound the true counts) — the property that
    makes the sketch map-side combinable at scale."""
    from deepie_spark.operators.sketches import token_count_min

    a = token_count_min(docs.filter(F.col("doc_id") % 2 == 0))
    b = token_count_min(docs.filter(F.col("doc_id") % 2 == 1))
    merged = a.mergeInPlace(b)
    full_exact = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    ).count()
    assert merged.totalCount() == full_exact


def test_heavy_hitters_exact_two_pass(spark):
    """MG candidate superset + recount = exact φ-heavy hitters, on a
    skewed stream whose hitters span partitions; capacity far below the
    distinct-item count (the whole point)."""
    import random

    from pyspark.sql import functions as F

    from deepie_spark.operators.sketches import heavy_hitters_exact

    rng = random.Random(3)
    items = []
    for _ in range(20_000):
        r = rng.random()
        if r < 0.20:
            items.append("hot1")
        elif r < 0.32:
            items.append("hot2")
        elif r < 0.40:
            items.append("hot3")
        else:
            items.append(f"cold{rng.randrange(5000)}")
    df = spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(8)
    got = {
        r["item"]: r["cnt"]
        for r in heavy_hitters_exact(df, phi=0.05, item_col="item").collect()
    }
    from collections import Counter

    c = Counter(items)
    want = {k: v for k, v in c.items() if v > 0.05 * len(items)}
    assert got == want
    assert set(got) == {"hot1", "hot2", "hot3"}


def test_haar_synopsis_exact_reconstruction(spark):
    """The defining invariant: the inverse Haar transform of ALL
    coefficients reproduces each group's bin-count vector exactly
    (orthogonal basis, computed in rationals — no FP)."""
    from fractions import Fraction

    import numpy as np

    from deepie_spark.operators.sketches import (
        haar_coefficient_signs,
        haar_synopsis,
    )

    rng = np.random.RandomState(3)
    n_bins = 16
    rows = [
        (g, int(b))
        for g in ("x", "y")
        for b in rng.randint(0, n_bins, size=200)
    ]
    df = spark.createDataFrame(rows, ["g", "b"])
    out = haar_synopsis(df, "g", "b", n_bins=n_bins).collect()
    coefs = {}
    for r in out:
        coefs.setdefault(r.g, {})[r.coef] = r.value

    from collections import Counter

    truth = {"x": Counter(), "y": Counter()}
    for g, b in rows:
        truth[g][b] += 1

    signs = dict(haar_coefficient_signs(n_bins))
    for g, cs in coefs.items():
        for j in range(n_bins):
            v = Fraction(0)
            for name, smap in signs.items():
                if j in smap:
                    v += Fraction(cs[name] * smap[j], len(smap))
            assert v == truth[g][j], (g, j)


def test_haar_synopsis_rejects_bad_bins(spark):
    import pytest as _pytest

    from deepie_spark.operators.sketches import haar_synopsis

    df = spark.createDataFrame([("g", 0)], ["g", "b"])
    with _pytest.raises(ValueError):
        haar_synopsis(df, "g", "b", n_bins=12)


def test_ams_f2_python_twin_and_estimate(spark):
    from collections import Counter

    from deepie_spark.functions.text import BASE, MOD
    from deepie_spark.operators.sketches import ams_coeffs, ams_f2

    # Zipf-ish stream: token k appears ~N/k times
    stream = [f"tok{k}" for k in range(1, 40) for _ in range(200 // k)]
    df = spark.createDataFrame([(t,) for t in stream], "token string")
    rows = {r.j: r for r in ams_f2(df, "token", 16).collect()}

    def ph(s):
        h = 0
        for ch in s:
            h = (h * BASE + ord(ch)) % MOD
        return h

    freq = Counter(stream)
    f2 = sum(f * f for f in freq.values())
    for j, (a, b) in enumerate(ams_coeffs(16)):
        z = sum(
            f * (1 - 2 * (((ph(x) * a + b) % MOD) % 2))
            for x, f in freq.items()
        )
        r = rows[j]
        assert (r.z, r.z2, r.exact_f2) == (z, z * z, f2)
        assert r.ratio == round(z * z / f2, 6)
    # median-of-counters estimate lands within a small constant factor
    z2s = sorted(r.z2 for r in rows.values())
    est = (z2s[7] + z2s[8]) / 2
    assert f2 / 4 < est < f2 * 4
