"""Distributed Lloyd k-means (operators/clustering.py) against a
numpy twin, plus partitioning-invariance and the empty-cluster /
tie-break rules the DuckDB oracle depends on.
"""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.clustering import (
    assign_clusters,
    kmeans_cluster_summary,
    kmeans_fit,
)


def np_assign(X: np.ndarray, cents: list[tuple[int, np.ndarray]]) -> np.ndarray:
    """argmin ||x - c||²; ties take the FIRST (= smallest cid, since
    cents stays sorted by cid) — same as the struct-min tie rule."""
    cids = np.array([c for c, _ in cents])
    C = np.stack([v for _, v in cents])
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
    return cids[np.argmin(d, axis=1)]


def np_kmeans(ids, X, k, iters):
    order = np.argsort(ids, kind="stable")
    ids, X = ids[order], X[order]
    cents = [(i, X[i].astype(np.float64).copy()) for i in range(k)]
    for _ in range(iters):
        a = np_assign(X, cents)
        cents = [
            (cid, X[a == cid].mean(axis=0))
            for cid, _ in cents
            if (a == cid).any()
        ]
    return ids, np_assign(X, cents), cents


@pytest.fixture(scope="module")
def emb_np(sf_dir):
    t = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = t["vec_id"].to_numpy()
    X = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    return ids, X


def test_kmeans_matches_numpy_twin(spark, sf_dir, emb_np):
    ids, X = emb_np
    _, np_a, np_cents = np_kmeans(ids, X, k=8, iters=2)
    expected = dict(zip(ids.tolist(), np_a.tolist()))

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    assigned, cents = kmeans_fit(emb, k=8, iters=2)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assigned.select("vec_id", "cluster").collect()
    }
    assert got == expected
    assert [c for c, _ in cents] == [c for c, _ in np_cents]
    for (_, sv), (_, nv) in zip(cents, np_cents):
        np.testing.assert_allclose(sv, nv, rtol=1e-9, atol=1e-12)


def test_kmeans_summary_counts(spark, sf_dir, emb_np):
    ids, X = emb_np
    _, np_a, np_cents = np_kmeans(ids, X, k=8, iters=2)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = kmeans_cluster_summary(emb, k=8, iters=2).collect()
    got_sizes = {r["cluster_id"]: r["n_members"] for r in rows}
    exp_sizes = {
        int(c): int((np_a == c).sum()) for c in np.unique(np_a)
    }
    assert got_sizes == exp_sizes
    # centroid norms: member mean per final cluster
    exp_norm = {
        int(c): float(np.sqrt((X[np_a == c].mean(axis=0) ** 2).sum()))
        for c in np.unique(np_a)
    }
    for r in rows:
        assert abs(r["centroid_norm"] - exp_norm[r["cluster_id"]]) < 1e-5


def test_kmeans_repartition_invariant(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    a1, _ = kmeans_fit(emb, k=4, iters=1)
    a2, _ = kmeans_fit(emb.repartition(7), k=4, iters=1)
    r1 = sorted((r["vec_id"], r["cluster"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cluster"]) for r in a2.collect())
    assert r1 == r2


def test_kmeans_empty_cluster_drops(spark):
    # seeds: c0=[5], c1=[5] (identical — every [5] ties to c0), c2=[0]
    df = spark.createDataFrame(
        [(0, [5.0]), (1, [5.0]), (2, [0.0]), (3, [4.9])],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = kmeans_fit(df, k=3, iters=1)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 0}
    assert [c for c, _ in cents] == [0, 2]  # cluster 1 emptied and dropped
    rows = kmeans_cluster_summary(df, k=3, iters=1).collect()
    assert {r["cluster_id"]: r["n_members"] for r in rows} == {0: 3, 2: 1}


def test_assign_tie_breaks_to_smaller_cid(spark):
    df = spark.createDataFrame([(0, [1.0])], "vec_id long, v array<double>")
    out = assign_clusters(
        df, [(3, [0.0]), (7, [2.0])], vec_col="v"
    ).collect()
    assert out[0]["cluster"] == 3  # equidistant → smaller cid


def test_semantic_dedup_catches_planted_paraphrase(spark):
    """SemDeDup removes embedding-level near-dups that lexical dedup
    cannot see: two docs with DISJOINT shingle sets but near-identical
    embeddings.  minhash-LSH finds no pair; semantic_dedup drops the
    later of the two."""
    import numpy as np

    from deepie_spark.operators.clustering import semantic_dedup
    from deepie_spark.operators.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(11)
    base = rng.randn(10, 8)
    vecs = {i: base[i] / np.linalg.norm(base[i]) for i in range(10)}
    # planted pair: 10 is a paraphrase of 3 (same direction, tiny noise)
    v10 = vecs[3] + rng.randn(8) * 0.01
    vecs[10] = v10 / np.linalg.norm(v10)
    texts = {
        i: " ".join(f"w{i}_{j}" for j in range(12)) for i in vecs
    }  # all-disjoint vocabularies → zero shared shingles
    docs = spark.createDataFrame(
        [(i, texts[i]) for i in sorted(vecs)], "doc_id long, text string"
    )
    assert minhash_lsh_pairs(docs).count() == 0  # lexical dedup is blind
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in sorted(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r["keep"]
        for r in semantic_dedup(emb, k=4, iters=2, threshold=0.95).collect()
    }
    assert out[10] is False  # paraphrase dropped (3 is the keeper)
    assert out[3] is True
    assert sum(not v for v in out.values()) == 1  # nothing else dropped


def _cc_naive(nodes, edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v in nodes:
        if v in out:
            continue
        stack, comp = [v], {v}
        while stack:
            for u in adj.get(stack.pop(), ()):
                if u not in comp:
                    comp.add(u)
                    stack.append(u)
        m = min(comp)
        for u in comp:
            out[u] = m
    return out


def test_single_linkage_matches_naive_threshold_cc(spark):
    import random

    from deepie_spark.operators.clustering import single_linkage_clusters

    rng = random.Random(41)
    nodes = [f"p{i}" for i in range(30)]
    pairs = sorted({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)
    })
    edges = [(a, b, i * 3 + 1) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    for t in (0, 40, 100, 10_000):
        got = {r.entity: r.cluster
               for r in single_linkage_clusters(df, t).collect()}
        # the theorem under test: forest-cut clusters == naive
        # threshold-filter-then-CC over ALL edges
        want = _cc_naive(
            sorted({x for ab in pairs for x in ab}),
            [(a, b) for a, b, w in edges if w <= t],
        )
        assert got == want, f"threshold {t}"


def test_single_linkage_all_cut_is_singletons(spark):
    from deepie_spark.operators.clustering import single_linkage_clusters

    df = spark.createDataFrame(
        [("a", "b", 100), ("b", "c", 200)], "src string, dst string, w long"
    )
    out = {r.entity: r.cluster
           for r in single_linkage_clusters(df, 50).collect()}
    assert out == {"a": "a", "b": "b", "c": "c"}


def test_dbscan_embeddings_python_twin(spark):
    import numpy as np

    from deepie_spark.operators.clustering import dbscan_embeddings

    rng = np.random.RandomState(7)
    # three dense blobs + scattered noise, unit-ish 8-d vectors
    pts = []
    for c in range(3):
        center = rng.randn(8)
        for _ in range(12):
            pts.append(center + 0.05 * rng.randn(8))
    for _ in range(10):
        pts.append(rng.randn(8) * 3)
    rows = [
        (i, [float(x) for x in v]) for i, v in enumerate(pts)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    eps, min_pts = 0.9, 4
    got = {
        r.vec_id: (r.role, r.cluster)
        for r in dbscan_embeddings(
            df, eps_cosine=eps, min_pts=min_pts
        ).collect()
    }

    # brute-force twin with the SAME rounded-cosine neighborhood rule
    X = np.array(pts, dtype=np.float64)
    nrm = np.sqrt((X * X).sum(1))
    cos = (X @ X.T) / np.outer(nrm, nrm)
    n = len(pts)
    nbrs = {
        i: {j for j in range(n) if j != i and round(cos[i, j], 6) >= eps}
        for i in range(n)
    }
    core = {i for i in range(n) if len(nbrs[i]) + 1 >= min_pts}
    # components of the core-core graph (min-id labels)
    lbl = {}
    for s in sorted(core):
        if s in lbl:
            continue
        stack, seen = [s], {s}
        while stack:
            u = stack.pop()
            for v in nbrs[u] & core:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(seen)
        for u in seen:
            lbl[u] = m
    expect = {}
    for i in range(n):
        if i in core:
            expect[i] = ("core", lbl[i])
        else:
            cn = nbrs[i] & core
            if cn:
                expect[i] = ("border", min(lbl[c] for c in cn))
            else:
                expect[i] = ("noise", -1)
    assert got == expect
    roles = {r for r, _ in got.values()}
    assert roles == {"core", "border", "noise"} or "core" in roles


def test_silhouette_labels_python_twin(spark):
    import math

    import numpy as np

    from deepie_spark.operators.clustering import silhouette_labels

    rng = np.random.RandomState(13)
    pts = []
    for lab, center in ((0, (0.0, 0.0)), (1, (10.0, 0.0)), (2, (5.0, 9.0))):
        for _ in range(8):
            pts.append(
                (
                    len(pts),
                    lab,
                    [
                        float(center[0] + rng.normal(0, 0.8)),
                        float(center[1] + rng.normal(0, 0.8)),
                    ],
                )
            )
    df = spark.createDataFrame(pts, "vec_id long, label int, embedding array<float>")
    got = {r.vec_id: r for r in silhouette_labels(df).collect()}

    # twin with the SAME fixed-point quantization
    vs = {i: [float(np.float32(x)) for x in v] for i, _, v in pts}
    labs = {i: l for i, l, _ in pts}
    SC = float(1 << 20)

    def dfp(x, y):
        daa = sum(a * a for a in x)
        dab = sum(a * b for a, b in zip(x, y))
        dbb = sum(b * b for b in y)
        return math.floor(math.sqrt(max(daa - 2.0 * dab + dbb, 0.0)) * SC)

    for i in vs:
        by_lab = {}
        for j in vs:
            if i == j:
                continue
            by_lab.setdefault(labs[j], [0, 0])
            by_lab[labs[j]][0] += 1
            by_lab[labs[j]][1] += dfp(vs[i], vs[j])
        a_mean = by_lab[labs[i]][1] / (by_lab[labs[i]][0] * SC)
        b_mean = min(
            s / (c * SC) for l, (c, s) in by_lab.items() if l != labs[i]
        )
        s = (b_mean - a_mean) / max(a_mean, b_mean)
        r = got[i]
        assert r.a_mean == round(a_mean, 6)
        assert r.b_mean == round(b_mean, 6)
        assert r.silhouette == round(s, 6)
        # well-separated planted clusters: strongly positive
        assert r.silhouette > 0.5


def test_silhouette_singleton_and_single_label(spark):
    from deepie_spark.operators.clustering import silhouette_labels

    # singleton cluster (label 9) -> a undefined -> s = 0
    df = spark.createDataFrame(
        [
            (1, 0, [0.0, 0.0]),
            (2, 0, [1.0, 0.0]),
            (3, 9, [50.0, 50.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    got = {r.vec_id: r.silhouette for r in silhouette_labels(df).collect()}
    assert got[3] == 0.0 and got[1] > 0.9
    # one label only -> b undefined everywhere -> all zeros
    one = spark.createDataFrame(
        [(1, 0, [0.0, 1.0]), (2, 0, [2.0, 1.0])],
        "vec_id long, label int, embedding array<float>",
    )
    assert all(
        r.silhouette == 0.0 for r in silhouette_labels(one).collect()
    )


def test_cluster_agreement_python_twin(spark):
    import math

    from deepie_spark.operators.clustering import cluster_agreement

    # 3 true clusters, labeling B merges two of them + one stray
    pairs = (
        [(0, 0)] * 10 + [(1, 1)] * 8 + [(2, 1)] * 7 + [(2, 0)] * 1
    )
    df = spark.createDataFrame(pairs, ["label_a", "label_b"])
    r = cluster_agreement(df).collect()[0]

    from collections import Counter

    cm = Counter(pairs)
    am = Counter(a for a, _ in pairs)
    bm = Counter(b for _, b in pairs)
    n = len(pairs)
    sp = sum(v * (v - 1) for v in cm.values())
    pa = sum(v * (v - 1) for v in am.values())
    pb = sum(v * (v - 1) for v in bm.values())
    assert (r.n_items, r.pa, r.pb, r.sum_pairs) == (n, pa, pb, sp)
    exp = float(pa) * pb / (n * (n - 1))
    assert r.ari == round((sp - exp) / ((pa + pb) / 2.0 - exp), 6)
    SC = float(1 << 20)
    mi_fp = sum(
        math.floor(
            (v / n)
            * (math.log(v * n) - math.log(am[a] * bm[b]))
            * SC
        )
        for (a, b), v in cm.items()
    )
    assert r.mi_fp == mi_fp
    ha = math.log(n) - sum(
        math.floor(v * math.log(v) * SC) for v in am.values()
    ) / SC / n
    hb = math.log(n) - sum(
        math.floor(v * math.log(v) * SC) for v in bm.values()
    ) / SC / n
    assert r.nmi == round((mi_fp / SC) / math.sqrt(ha * hb), 6)


def test_cluster_agreement_extremes(spark):
    from deepie_spark.operators.clustering import cluster_agreement

    # identical labelings (up to renaming) -> ARI = NMI = 1
    same = spark.createDataFrame(
        [(i % 3, (i % 3) * 7) for i in range(30)], ["label_a", "label_b"]
    )
    r = cluster_agreement(same).collect()[0]
    assert r.ari == 1.0 and r.nmi >= 0.99999  # fp quantization
    # one side trivial (single cluster): NMI NULL; both trivial: both NULL
    triv = spark.createDataFrame(
        [(0, i % 3) for i in range(30)], ["label_a", "label_b"]
    )
    r = cluster_agreement(triv).collect()[0]
    assert r.nmi is None and r.ari is not None
    both = spark.createDataFrame(
        [(0, 0) for _ in range(10)], ["label_a", "label_b"]
    )
    r = cluster_agreement(both).collect()[0]
    assert r.ari is None and r.nmi is None


def test_kcenter_farthest_first_geometry(spark):
    """Orthogonal axes are mutually farthest: the greedy picks one
    per direction before any near-duplicate, and matches a python
    twin exactly (fixed-point distances)."""
    import math

    from deepie_spark.operators.clustering import kcenter_sample

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [0.999, 0.01, 0.0],    # near-dup of 1: picked LAST
        3: [0.0, 1.0, 0.0],
        4: [0.0, 0.0, 1.0],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    rows = {r.sel_round: r for r in kcenter_sample(df, k=4).collect()}
    assert rows[1].vec_id == 1 and rows[1].d_fp is None
    assert {rows[2].vec_id, rows[3].vec_id} == {3, 4}
    assert rows[4].vec_id == 2

    # python twin with float32-cast inputs (Spark reads array<float>)
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    pv = {i: [f32(x) for x in v] for i, v in vecs.items()}
    SC = 1 << 40

    def dfp(a, b):
        va, vb = pv[a], pv[b]
        dot = sum(p * q for p, q in zip(va, vb))
        cos = dot / (math.sqrt(sum(p * p for p in va))
                     * math.sqrt(sum(q * q for q in vb)))
        return SC - math.floor(cos * float(SC))

    sel = [1]
    for r in (2, 3, 4):
        cands = [i for i in pv if i not in sel]
        dmin = {c: min(dfp(c, s) for s in sel) for c in cands}
        pick = max(sorted(cands), key=lambda c: (dmin[c], -c))
        assert rows[r].vec_id == pick and rows[r].d_fp == dmin[pick]
        sel.append(pick)


def test_centroid_stats_separable_labels(spark):
    """Two orthogonal label groups: cohesion near 1, separation near
    0, nearest-neighbor labels point at each other."""
    from deepie_spark.operators.clustering import centroid_stats

    rows = [
        (1, "a", [1.0, 0.02, 0.0]),
        (2, "a", [0.98, 0.0, 0.01]),
        (3, "b", [0.0, 1.0, 0.01]),
        (4, "b", [0.01, 0.97, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    got = {r.label: r for r in centroid_stats(df).collect()}
    assert got["a"].n_vecs == 2 and got["b"].n_vecs == 2
    assert got["a"].cohesion > 0.99 and got["b"].cohesion > 0.99
    assert got["a"].separation < 0.1 and got["b"].separation < 0.1
    assert got["a"].nn_label == "b" and got["b"].nn_label == "a"


def test_bcubed_eval_hand_example(spark):
    from deepie_spark.operators.clustering import bcubed_eval

    # pred cluster 1 = {g1,g1,g2}; cluster 2 = {g2,g2}
    rows = [(1, "g1"), (1, "g1"), (1, "g2"), (2, "g2"), (2, "g2")]
    df = spark.createDataFrame(rows, ["label_a", "label_b"])
    r = bcubed_eval(df).collect()[0]
    # precision: items in c1: 2*(2/3) + 1/3; c2: 2*1 -> sum/5
    p = (2 * (2 / 3) + 1 / 3 + 2 * 1.0) / 5
    # recall: g1 size 2: 2*(2/2); g2 size 3: 1/3 + 2*(2/3)
    rr = (2 * 1.0 + 1 / 3 + 2 * (2 / 3)) / 5
    assert abs(r.p_b3 - p) < 1e-5
    assert abs(r.r_b3 - rr) < 1e-5
    assert abs(r.f_b3 - 2 * p * rr / (p + rr)) < 1e-4
    assert r.n_items == 5
