"""Distributed PCA vs the numpy twin (tolerance-gated: FP aggregation
order is engine-unspecified, so this is deliberately NOT hash-oracle
material — see operators/pca.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.pca import (
    gram_and_mean,
    principal_components,
    project,
)

DIM = 12


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(5)
    # anisotropic cloud: two dominant directions with known order
    basis = np.linalg.qr(rng.randn(DIM, DIM))[0]
    scales = np.array([10.0, 5.0] + [0.5] * (DIM - 2))
    x = rng.randn(400, DIM) * scales @ basis.T + rng.randn(DIM) * 3
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return x, df.repartition(9)


def test_gram_and_mean_match_numpy(data):
    x, df = data
    g, s, n = gram_and_mean(df, DIM)
    assert n == len(x)
    assert np.allclose(g, x.T @ x, rtol=1e-10)
    assert np.allclose(s, x.sum(axis=0), rtol=1e-10)


def test_components_match_numpy_pca(data):
    x, df = data
    comps = principal_components(df, DIM, n_components=2)
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / len(x)
    vals, vecs = np.linalg.eigh(cov)
    want = vecs[:, ::-1][:, :2].T
    for got, w in zip(comps, want):
        j = int(np.argmax(np.abs(w)))
        if w[j] < 0:
            w = -w
        assert np.allclose(got, w, atol=1e-8)


def test_projection_stable_under_repartition(data):
    x, df = data
    comps = principal_components(df, DIM, n_components=2)
    a = {r["vec_id"]: (r["pc1"], r["pc2"]) for r in project(df, comps).collect()}
    comps2 = principal_components(df.repartition(3), DIM, n_components=2)
    b = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in project(df.repartition(3), comps2).collect()
    }
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], abs=2e-6)
        assert a[k][1] == pytest.approx(b[k][1], abs=2e-6)
    # variance along pc1 exceeds pc2 (eigen order respected end-to-end)
    p1 = np.array([v[0] for v in a.values()])
    p2 = np.array([v[1] for v in a.values()])
    assert p1.var() > p2.var() > 0


def test_projection_plan_is_jvm_only(data):
    _, df = data
    comps = principal_components(df, DIM, n_components=1)
    out = project(df, comps)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # projection never re-enters Python


def test_gram_bit_deterministic_run_to_run(data):
    """For a FIXED partitioning the Gram pass must be BITWISE identical
    across runs: per-task partials are combined driver-side with fsum
    (exactly rounded), so task scheduling / arrival order cannot change
    a single bit."""
    _, df = data
    g1, s1, n1 = gram_and_mean(df, DIM)
    g2, s2, n2 = gram_and_mean(df, DIM)
    assert n1 == n2
    assert (g1 == g2).all() and (s1 == s2).all()  # bitwise, no tolerance
