"""ANN similarity-search tests: exact top-k vs numpy, LSH recall vs the
exact baseline (the correct oracle for an approximate operator).
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.similarity import (
    brute_force_topk,
    hyperplanes,
    lsh_topk,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """5 well-separated clusters x 8 vectors: near neighbors share the
    cluster, so sign-bucket LSH keeps them together."""
    rng = np.random.RandomState(7)
    centers = rng.randn(5, 12) * 4.0
    rows = []
    vid = 0
    for c in centers:
        for _ in range(8):
            v = c + rng.randn(12) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def queries_from(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def test_brute_force_topk_matches_numpy(clustered):
    k = 5
    q = queries_from(clustered, 6)
    got = brute_force_topk(clustered, q, k=k).collect()
    pdf = clustered.toPandas().set_index("vec_id")["embedding"]
    M = np.stack([np.array(v) for v in pdf])
    ids = np.array(pdf.index)
    norms = np.linalg.norm(M, axis=1)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(6))
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, k + 1))
        qv = np.array(pdf[qid])
        cos = (M @ qv) / (norms * np.linalg.norm(qv))
        cos = np.round(cos, 6)
        mask = ids != qid
        order = sorted(
            zip(cos[mask], -ids[mask]), key=lambda t: (-t[0], t[1])
        )
        want_top = [(c, -i) for c, i in order[:k]]
        got_top = [(r["cosine"], r["vec_id"]) for r in rows]
        for (wc, wi), (gc, gi) in zip(want_top, got_top):
            assert gc == pytest.approx(wc, abs=1e-6)
            assert gi == wi


def test_lsh_topk_recall_vs_exact(clustered):
    k = 5
    q = queries_from(clustered, 10)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(clustered, q, k=k).collect()
    }
    approx_rows = lsh_topk(clustered, q, k=k, n_bits=4).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # clustered data: same-cluster neighbors share the sign bucket
    assert recall >= 0.8, f"recall {recall}"
    # scores inside the bucket are exact — spot-check against brute force
    exact_cos = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in brute_force_topk(clustered, q, k=40).collect()
    }
    for r in approx_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == pytest.approx(exact_cos[key], abs=1e-6)


def test_lsh_reduces_candidates(clustered):
    """The point of LSH at scale: the bucket join scores far fewer pairs
    than the cross join."""
    from deepie_spark.operators.similarity import _bucket, _as_double

    planes = hyperplanes(12, 4, 42)
    e = clustered.select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    ).withColumn("bucket", _bucket(F.col("v"), planes))
    sizes = e.groupBy("bucket").count().collect()
    n = clustered.count()
    candidate_pairs = sum(r["count"] ** 2 for r in sizes)
    assert candidate_pairs < n * n / 2


def test_hyperplanes_deterministic():
    assert np.allclose(hyperplanes(8, 6, 42), hyperplanes(8, 6, 42))
    assert not np.allclose(hyperplanes(8, 6, 42), hyperplanes(8, 6, 43))


def test_topk_on_driver_embeddings(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sub = emb.filter(F.col("vec_id") < 100)
    q = queries_from(sub, 3)
    got = brute_force_topk(sub, q, k=10).collect()
    assert len(got) == 30
    for r in got:
        assert -1.0 <= r["cosine"] <= 1.0


def test_ivf_topk_recall_vs_exact(spark):
    """IVF with one seed per cluster (ids 0..4 are the 5 centers, the
    members follow): every member lands in its cluster's cell, so
    same-cluster neighbors — the exact top-k — are all candidates."""
    from deepie_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.randn(5, 12) * 4.0
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(centers)
    ]
    vid = 5
    for c in centers:
        for _ in range(8):
            v = c + rng.randn(12) * 0.05
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    k = 5
    q = emb.filter(
        (F.col("vec_id") >= 5) & (F.col("vec_id") < 13)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }
    approx_rows = ivf_topk(emb, q, k=k, n_cells=5).collect()
    approx = {(r["query_id"], r["vec_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall}"
    # in-cell scores are exact
    exact_cos = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in brute_force_topk(emb, q, k=45).collect()
    }
    for r in approx_rows:
        key = (r["query_id"], r["vec_id"])
        if key in exact_cos:
            assert r["cosine"] == pytest.approx(exact_cos[key], abs=1e-6)


def test_ivf_multiprobe_recall_strictly_improves(spark):
    """Boundary queries (midway between two cluster centers) miss their
    runner-up-cell neighbors at nprobe=1; nprobe=2 must recover them.
    Construction: two tight clusters + queries sitting between them, so
    each query's exact top-k spans both cells."""
    from deepie_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(11)
    c0 = rng.randn(12) * 4.0
    c1 = rng.randn(12) * 4.0  # independent → well-separated in cosine
    rows = [(0, [float(x) for x in c0]), (1, [float(x) for x in c1])]
    vid = 2
    for c in (c0, c1):
        for _ in range(10):
            rows.append(
                (vid, [float(x) for x in c + rng.randn(12) * 0.05])
            )
            vid += 1
    # boundary queries: angular midpoint (sum of unit vectors), perturbed
    u0 = c0 / np.linalg.norm(c0)
    u1 = c1 / np.linalg.norm(c1)
    qrows = []
    for j in range(6):
        m = (u0 + u1) + rng.randn(12) * 0.01
        qrows.append((1000 + j, [float(x) for x in m]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(qrows, "query_id long, qvec array<double>")
    # k exceeds one cluster's size (11 vectors incl. its centroid), so the
    # exact top-k necessarily spans BOTH cells — nprobe=1 cannot reach it
    k = 15
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(emb, q, k=k).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb, q, k=k, n_cells=2, nprobe=nprobe
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 > r1, f"nprobe=2 recall {r2} not above nprobe=1 {r1}"
    assert r2 == 1.0, f"nprobe=2 over 2 cells must be exhaustive, got {r2}"


def test_ann_recall_query_bounds(spark):
    """ann_recall composes the exact and IVF gated stages: overlap is
    a subset count, so 0 <= n_overlap <= n_exact = k, and nprobe=2
    multi-probe must find SOMETHING for at least one query."""
    import __spark_entry__ as e

    rows = e.queries()["ann_recall"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(
        0.0 <= r.recall <= 1.0 and 0 <= r.n_overlap <= r.n_exact == 10
        for r in rows
    )
    assert any(r.n_overlap > 0 for r in rows)
