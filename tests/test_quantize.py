"""Scalar quantization codes (operators/quantize.py): range/clamp
invariants, a numpy twin, and the reconstruction-error bound that
makes SQ8 usable as an ANN pre-filter."""

import numpy as np
import pytest

from deepie_spark.operators.quantize import scalar_quantize


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_scalar_quantize_numpy_twin_and_bounds(spark):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(40, 6)).astype(np.float32)
    out = scalar_quantize(_emb_df(spark, mat)).collect()
    assert len(out) == 40 * 6
    codes = {(r.vec_id, r.dim): r.code for r in out}
    lo = mat.astype(np.float64).min(axis=0)
    hi = mat.astype(np.float64).max(axis=0)
    for (vid, dim), code in codes.items():
        x = np.float64(mat[vid, dim])
        expect = int(min(255, np.floor((x - lo[dim]) / (hi[dim] - lo[dim]) * 256.0)))
        assert code == expect
        assert 0 <= code <= 255
        # dequantized midpoint error is bounded by one cell width
        deq = lo[dim] + (code + 0.5) / 256.0 * (hi[dim] - lo[dim])
        assert abs(deq - x) <= (hi[dim] - lo[dim]) / 256.0


def test_scalar_quantize_extremes_and_constant_dim(spark):
    mat = [[0.0, 7.5], [1.0, 7.5], [0.5, 7.5]]
    out = {(r.vec_id, r.dim): r.code
           for r in scalar_quantize(_emb_df(spark, mat)).collect()}
    assert out[(0, 0)] == 0       # x == lo → 0
    assert out[(1, 0)] == 255     # x == hi → clamped top code
    assert out[(2, 0)] == 128
    # constant dimension codes to 0 everywhere
    assert out[(0, 1)] == out[(1, 1)] == out[(2, 1)] == 0


def test_scalar_quantize_levels_guard(spark):
    with pytest.raises(ValueError, match="levels"):
        scalar_quantize(_emb_df(spark, [[0.0]]), levels=1)


def test_product_quantize_structure_and_consistency(spark):
    import random

    from deepie_spark.operators.clustering import kmeans_fit
    from deepie_spark.operators.quantize import product_quantize

    rng = random.Random(101)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = product_quantize(df, m=4, k=3, iters=2, dim=16)
    rowsc = got.collect()
    # one code per (vec, subspace), codes within range
    assert len(rowsc) == 40 * 4
    assert all(0 <= r.code < 3 for r in rowsc)
    # subspace 1 codes equal a direct kmeans_fit on that slice
    from pyspark.sql import functions as F

    sub1 = df.select(
        "vec_id", F.slice("embedding", 5, 4).alias("embedding")
    )
    direct, _ = kmeans_fit(sub1, k=3, iters=2)
    want = {r.vec_id: r.cluster for r in direct.collect()}
    got1 = {r.vec_id: r.code for r in rowsc if r.sub == 1}
    assert got1 == want
    # partition invariance
    got2 = {(r.vec_id, r.sub): r.code
            for r in product_quantize(
                df.repartition(7), m=4, k=3, iters=2, dim=16).collect()}
    assert got2 == {(r.vec_id, r.sub): r.code for r in rowsc}


def test_product_quantize_validates_dim(spark):
    import pytest

    from deepie_spark.operators.quantize import product_quantize

    df = spark.createDataFrame([(0, [0.0] * 10)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        product_quantize(df, m=4, dim=10)


def test_pq_topk_matches_python_adc(spark):
    import random

    from deepie_spark.operators.quantize import pq_fit, pq_topk

    rng = random.Random(103)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        [(0, rows[0][1]), (5, rows[5][1])],
        "query_id long, qvec array<double>")
    got = {(r.query_id, r.vec_id): (r.rank, r.adc)
           for r in pq_topk(df, q, m=2, k_codebook=3, iters=2,
                            dim=8, k=5).collect()}
    # python twin from the SAME fitted codebooks/codes
    codes_df, books = pq_fit(df, m=2, k=3, iters=2, dim=8)
    codes = {}
    for r in codes_df.collect():
        codes.setdefault(r.vec_id, {})[r.sub] = r.code
    want = {}
    for qid, qv in [(0, rows[0][1]), (5, rows[5][1])]:
        scored = []
        for vid, _ in rows:
            if vid == qid:
                continue
            adc = 0.0
            for s in range(2):
                qs = qv[s * 4:(s + 1) * 4]
                cid = codes[vid][s]
                c = dict(books[s])[cid]
                d2 = 0.0
                for a, b in zip(qs, c):
                    d2 += (a - b) * (a - b)
                adc += d2
            scored.append((round(adc, 6), vid))
        for rank, (adc, vid) in enumerate(sorted(scored), 1):
            if rank <= 5:
                want[(qid, vid)] = (rank, adc)
    assert got == want


def test_rp_python_twin_and_distance_preservation(spark):
    import numpy as np

    from deepie_spark.functions.text import MOD
    from deepie_spark.operators.quantize import (
        RP_A,
        RP_B,
        RP_C,
        random_project_codes,
    )

    rng = np.random.default_rng(11)
    d, m, n = 32, 8, 30
    codes = rng.integers(0, 256, size=(n, d))
    rows = [
        (int(v), int(dim), int(codes[v, dim]))
        for v in range(n)
        for dim in range(d)
    ]
    df = spark.createDataFrame(rows, "vec_id long, dim int, code int")
    got = {
        (r.vec_id, r.o): r.y
        for r in random_project_codes(df, m_dims=m).collect()
    }
    sign = np.array(
        [
            [1 - 2 * (((dim * RP_A + o * RP_B + RP_C) % MOD) % 2) for o in range(m)]
            for dim in range(d)
        ]
    )
    y = codes @ sign
    assert got == {
        (v, o): int(y[v, o]) for v in range(n) for o in range(m)
    }
    # JL sanity: mean over pairs of ||yu-yv||^2/(m*||cu-cv||^2) near 1
    ratios = []
    for u in range(0, n, 3):
        for v in range(1, n, 7):
            if u == v:
                continue
            d2 = ((codes[u] - codes[v]) ** 2).sum()
            p2 = ((y[u] - y[v]) ** 2).sum()
            if d2:
                ratios.append(p2 / (m * d2))
    r = float(np.mean(ratios))
    assert 0.5 < r < 2.0


def test_isotropy_stats_vs_bruteforce(spark):
    import math

    from deepie_spark.operators.quantize import isotropy_stats

    vecs = [
        [0.5, -0.25, 0.125], [0.1, 0.2, -0.3],
        [-0.4, 0.05, 0.6], [0.33, -0.21, 0.11],
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    row = isotropy_stats(df, scale_bits=16).collect()[0]
    q = [[math.floor(x * 65536.0) for x in v] for v in vecs]
    n = len(q)
    cross = sum(
        sum(a * b for a, b in zip(q[i], q[j]))
        for i in range(n) for j in range(n) if i != j
    )
    norm2 = sum(x * x for v in q for x in v)
    sd = [sum(v[d] for v in q) for d in range(3)]
    assert row["n_vecs"] == n
    assert row["sum_norm2q"] == norm2
    assert row["s_norm2q"] == sum(s * s for s in sd)
    assert row["avg_dot_q"] == round(
        cross / (n * (n - 1)) / 4294967296.0, 6
    )


def test_isotropy_mean_energy_ratio_bounds(spark):
    from deepie_spark.operators.quantize import isotropy_stats

    # identical vectors -> mean vector carries ALL the energy:
    # ratio = n*|x|^2*... = |S|^2/(n*sum|x|^2) = n^2/(n*n) = 1
    vecs = [[0.5, 0.5]] * 5
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], ["vec_id", "embedding"]
    )
    row = isotropy_stats(df).collect()[0]
    assert row["mean_energy_ratio"] == 1.0
