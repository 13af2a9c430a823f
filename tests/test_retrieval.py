"""BM25 (operators/retrieval.py) vs a pure-python twin."""

import math

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.retrieval import bm25_scores

DOCS = [
    (1, "spark join hash spark"),
    (2, "merge sort merge merge"),
    (3, "hash hash hash hash hash hash"),
    (4, "nothing relevant here at all"),
    (5, "spark"),
]
TERMS = ["spark", "hash", "merge"]


def _python_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    n = len(toks)
    total_len = sum(map(len, toks.values()))
    df = {
        t: sum(1 for ws in toks.values() if t in ws) for t in terms
    }
    out = {}
    for d, ws in toks.items():
        score, matched = 0.0, 0
        for t in terms:  # fixed term order, like the operator
            tf = ws.count(t)
            if not tf:
                continue
            matched += 1
            idf = math.log(2 * n + 2) - math.log(2 * df[t] + 1)
            den = tf + k1 * (1.0 - b) + (
                k1 * b * len(ws) * n / total_len
            )
            score = score + idf * ((tf * (k1 + 1.0)) / den)
        if matched:
            out[d] = (matched, round(score, 6))
    return out


def test_bm25_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    got = {
        r["doc_id"]: (r["n_terms"], round(r["score"], 6))
        for r in bm25_scores(toks, TERMS).collect()
    }
    assert got == _python_bm25(DOCS, TERMS)
    # doc 4 matches nothing and must be absent
    assert 4 not in got
    # doc 3 is pure repetition: tf saturation keeps its score below
    # k1+1 times the idf of 'hash'
    n, dfh = 5, 2
    idf_hash = math.log(2 * n + 2) - math.log(2 * dfh + 1)
    assert got[3][1] < 2.2 * idf_hash


def test_bm25_repartition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    a = sorted(map(tuple, bm25_scores(toks, TERMS).collect()))
    b = sorted(map(tuple, bm25_scores(toks.repartition(7), TERMS).collect()))
    assert a == b  # bit-identical: fixed-order adds, no sum() over rows


def test_term_cosine_matches_python_twin(spark):
    from deepie_spark.operators.retrieval import term_cosine_pairs

    docs = [
        (1, "a b a c"),
        (2, "a b a c d"),       # near-identical frequency profile
        (3, "c a b a"),         # permutation of 1 → cosine exactly 1
        (4, "x y z x y z"),
        (5, "q r s t u v"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    got = {
        (r["a"], r["b"]): (r["dot"], r["n2_a"], r["n2_b"], r["cosine"])
        for r in term_cosine_pairs(toks, threshold=0.9).collect()
    }

    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs}
    want = {}
    for a in tfs:
        for b in tfs:
            if a >= b:
                continue
            dot = sum(tfs[a][w] * tfs[b][w] for w in tfs[a])
            n2a = sum(v * v for v in tfs[a].values())
            n2b = sum(v * v for v in tfs[b].values())
            cos = dot / (math.sqrt(n2a) * math.sqrt(n2b))
            if dot and cos >= 0.9:
                want[(a, b)] = (dot, n2a, n2b, round(cos, 6))
    assert got == want
    # permutation-invariance: docs 1 and 3 are the same bag → cos 1.0
    assert got[(1, 3)][3] == 1.0
    # disjoint vocabularies never pair
    assert all(4 not in p and (5, 4) != p for p in got)


def test_term_cosine_hot_term_guard(spark):
    from deepie_spark.operators.retrieval import term_cosine_pairs

    # 'the' appears in every doc; with max_df=2 it is dropped from the
    # dot product but kept in the norms
    docs = [(i, f"the unique{i} word{i}") for i in range(1, 5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    assert term_cosine_pairs(toks, threshold=0.01, max_df=2).count() == 0
    full = term_cosine_pairs(toks, threshold=0.01, max_df=None)
    rows = full.collect()
    assert len(rows) == 6  # all pairs share 'the'
    assert all(r["dot"] == 1 and r["cosine"] == round(1 / 3, 6) for r in rows)


def test_rrf_fuse_hand(spark):
    from deepie_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "id long, score double")
    sem = spark.createDataFrame(
        [(2, 0.9), (4, 0.8)], "id long, score double")
    got = {r.doc_id: (r.rank_lex, r.rank_sem, r.rrf)
           for r in rrf_fuse({"lex": lex, "sem": sem}).collect()}
    assert got[1] == (1, 0, round(1 / 61, 6))
    assert got[2] == (2, 1, round(1 / 62 + 1 / 61, 6))
    assert got[3] == (3, 0, round(1 / 63, 6))
    assert got[4] == (0, 2, round(1 / 62, 6))
    # doc 2 (in both lists) must outrank every single-list doc
    assert got[2][2] == max(v[2] for v in got.values())


def test_rrf_fuse_tie_break_and_invariance(spark):
    from deepie_spark.operators.retrieval import rrf_fuse

    # equal scores: rank by id ascending
    a = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 2.0)], "id long, score double")
    got = {r.doc_id: r.rank_a
           for r in rrf_fuse({"a": a}).collect()}
    assert got == {5: 1, 3: 2, 7: 3}
    got2 = {r.doc_id: r.rank_a
            for r in rrf_fuse({"a": a.repartition(4)}).collect()}
    assert got2 == got


def test_mmr_rerank_python_twin(spark):
    import math

    import numpy as np

    from deepie_spark.operators.retrieval import mmr_rerank

    rng = np.random.RandomState(47)
    # 2 tight clusters near the query + singles: MMR must alternate
    # across clusters instead of taking one cluster's top-k
    q = rng.randn(8)
    pts = {0: q}
    i = 1
    for c in range(2):
        center = q + 0.4 * rng.randn(8)
        for _ in range(6):
            pts[i] = center + 0.03 * rng.randn(8)
            i += 1
    for _ in range(8):
        pts[i] = rng.randn(8)
        i += 1
    rows = [(k, [float(x) for x in v]) for k, v in pts.items()]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = [
        (r.pick_rank, r.vec_id if hasattr(r, "vec_id") else r.id,
         r.rel_fp, r.mmr_fp)
        for r in sorted(
            mmr_rerank(df, query_id=0, k=4, pool=10).collect(),
            key=lambda r: r.pick_rank,
        )
    ]

    S = float(1 << 40)

    def cos_fp(a, b):
        va, vb = np.array(pts[a]), np.array(pts[b])
        # same left-to-right fold order as both engines (dot over
        # doubles is associativity-sensitive only beyond these dims)
        d = float(sum(float(x) * float(y) for x, y in zip(va, vb)))
        na = math.sqrt(sum(float(x) * float(x) for x in va))
        nb = math.sqrt(sum(float(y) * float(y) for y in vb))
        return int(math.floor(d / (na * nb) * S))

    rel = {k: cos_fp(k, 0) for k in pts if k != 0}
    pool = sorted(rel, key=lambda k: (-rel[k], k))[:10]
    sel, expect = [], []
    for r in range(1, 5):
        if not sel:
            scores = {k: rel[k] for k in pool}
        else:
            scores = {
                k: rel[k] - max(cos_fp(k, s) for s in sel)
                for k in pool
                if k not in sel
            }
        best = min(scores, key=lambda k: (-scores[k], k))
        expect.append((r, best, rel[best], scores[best]))
        sel.append(best)
    assert got == expect
    # diversification actually kicked in: picks span both clusters
    c1 = {k for k in range(1, 7)}
    picked = {p[1] for p in expect}
    assert picked - c1 and picked & c1


def _python_ql(docs, terms, mu=2000):
    toks = {d: t.split() for d, t in docs}
    c_len = sum(map(len, toks.values()))
    cf = {t: sum(ws.count(t) for ws in toks.values()) for t in terms}
    out = {}
    for d, ws in toks.items():
        matched = sum(1 for t in terms if t in ws)
        if not matched:
            continue
        score = None
        for t in terms:  # fixed term order, like the operator
            tf = ws.count(t)
            term = math.log(tf * c_len + mu * cf[t]) - math.log(
                c_len * (len(ws) + mu)
            )
            score = term if score is None else score + term
        out[d] = (matched, len(ws), round(score, 6))
    return out


def test_ql_dirichlet_python_twin(spark):
    from deepie_spark.operators.retrieval import dirichlet_ql_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    got = {
        r["doc_id"]: (r["n_terms"], r["dl"], round(r["score"], 6))
        for r in dirichlet_ql_scores(toks, TERMS).collect()
    }
    assert got == _python_ql(DOCS, TERMS)
    assert 4 not in got  # candidate-set convention
    # smoothing sanity: all scores are log-probabilities < 0
    assert all(s < 0 for _, _, s in got.values())


def test_ql_dirichlet_repartition_invariant(spark):
    from deepie_spark.operators.retrieval import dirichlet_ql_scores

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    toks = df.select("doc_id", F.split("text", " ").alias("toks"))
    a = sorted(map(tuple, dirichlet_ql_scores(toks, TERMS).collect()))
    b = sorted(
        map(
            tuple,
            dirichlet_ql_scores(toks.repartition(7), TERMS).collect(),
        )
    )
    assert a == b


def test_ndcg_hand_case(spark):
    from deepie_spark.operators.retrieval import ndcg_at_k

    # 5 candidates; ranking by score puts rel (3,0,2,1,0) at the top
    rows = [
        (1, 3, 9.0),
        (2, 0, 8.0),
        (3, 2, 7.0),
        (4, 1, 6.0),
        (5, 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, rel long, score double")
    r = ndcg_at_k(df, k=3).collect()[0]
    d = [1.0 / math.log2(i + 1) for i in (1, 2, 3)]
    dcg = 3 * d[0] + 0 * d[1] + 2 * d[2]
    idcg = 3 * d[0] + 2 * d[1] + 1 * d[2]
    assert (r.k, r.n_candidates) == (3, 5)
    assert r.dcg == round(dcg, 6)
    assert r.idcg == round(idcg, 6)
    assert r.ndcg == round(dcg / idcg, 6)


def test_ndcg_perfect_and_zero(spark):
    from deepie_spark.operators.retrieval import ndcg_at_k

    # score order == relevance order: ndcg is exactly 1
    rows = [(i, 10 - i, float(100 - i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "doc_id long, rel long, score double")
    assert ndcg_at_k(df, k=5).collect()[0].ndcg == 1.0
    # all-zero relevance: idcg = 0 exactly -> NULL ndcg
    z = spark.createDataFrame(
        [(i, 0, float(i)) for i in range(1, 6)],
        "doc_id long, rel long, score double",
    )
    assert ndcg_at_k(z, k=5).collect()[0].ndcg is None


def test_mrr_at_k_hand_examples(spark):
    from deepie_spark.operators.retrieval import mrr_at_k

    def cands(rows):
        return spark.createDataFrame(
            rows, "doc_id long, score double, rel int"
        )

    per_query = [
        # relevant doc ranked first -> rr = 1.0
        ("q_first", cands([(1, 9.0, 1), (2, 5.0, 0), (3, 1.0, 1)])),
        # first relevant at rank 3 -> rr = 1/3
        (
            "q_third",
            cands([(1, 9.0, 0), (2, 5.0, 0), (3, 4.0, 1), (4, 1.0, 1)]),
        ),
        # no relevant in candidates -> rank NULL, rr = 0
        ("q_none", cands([(1, 9.0, 0), (2, 5.0, 0)])),
        # relevant exists but OUTSIDE the k cut -> rr = 0
        (
            "q_cut",
            cands([(i, 100.0 - i, 0) for i in range(1, 11)] + [(99, 0.5, 1)]),
        ),
        # score tie: id ascending breaks it -> relevant id 2 at rank 2
        ("q_tie", cands([(1, 5.0, 0), (2, 5.0, 1), (3, 5.0, 0)])),
    ]
    got = {r.query_id: r for r in mrr_at_k(per_query, k=10).collect()}
    assert got["q_first"].first_rel_rank == 1 and got["q_first"].rr == 1.0
    assert got["q_third"].first_rel_rank == 3
    assert got["q_third"].rr == round(1.0 / 3.0, 6)
    assert got["q_none"].first_rel_rank is None and got["q_none"].rr == 0.0
    assert got["q_cut"].first_rel_rank is None and got["q_cut"].rr == 0.0
    assert got["q_tie"].first_rel_rank == 2 and got["q_tie"].rr == 0.5


def test_jm_ql_scores_vs_python(spark):
    import math

    from deepie_spark.operators.retrieval import jm_ql_scores

    docs = {
        1: "spark joins the hash table".split(),
        2: "hash hash partitions".split(),
        3: "nothing relevant here at all".split(),
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "toks"])
    terms = ["spark", "hash"]
    got = {r["doc_id"]: r["score"]
           for r in jm_ql_scores(df, terms, 1, 2).collect()}
    c_len = sum(len(t) for t in docs.values())
    cf = {t: sum(d.count(t) for d in docs.values()) for t in terms}
    for doc_id, toks in docs.items():
        dl = len(toks)
        if not any(t in toks for t in terms):
            assert doc_id not in got
            continue
        want = 0.0
        for t in terms:
            tf = toks.count(t)
            want += math.log(tf * c_len + cf[t] * dl) - math.log(
                2 * dl * c_len
            )
        assert got[doc_id] == pytest.approx(want, rel=1e-12)


def test_jm_ql_rejects_bad_lambda(spark):
    from deepie_spark.operators.retrieval import jm_ql_scores

    df = spark.createDataFrame([(1, ["a"])], ["doc_id", "toks"])
    with pytest.raises(ValueError):
        jm_ql_scores(df, ["a"], 2, 2)


def test_borda_fuse_hand(spark):
    from deepie_spark.operators.retrieval import borda_fuse

    lex = spark.createDataFrame(
        [("d1", 9.0), ("d2", 5.0), ("d3", 1.0)], ["id", "score"]
    )
    sem = spark.createDataFrame(
        [("d2", 0.9), ("d4", 0.8)], ["id", "score"]
    )
    got = {r["doc_id"]: (r["rank_lex"], r["rank_sem"], r["borda"])
           for r in borda_fuse({"lex": lex, "sem": sem}, k=3).collect()}
    # points: rank1 -> 3, rank2 -> 2, rank3 -> 1; absent -> 0
    assert got["d1"] == (1, 0, 3)
    assert got["d2"] == (2, 1, 2 + 3)
    assert got["d3"] == (3, 0, 1)
    assert got["d4"] == (0, 2, 2)


def test_borda_fuse_beyond_k_scores_zero(spark):
    from deepie_spark.operators.retrieval import borda_fuse

    lst = spark.createDataFrame(
        [(f"d{i}", float(10 - i)) for i in range(4)], ["id", "score"]
    )
    got = {r["doc_id"]: r["borda"]
           for r in borda_fuse({"one": lst}, k=2).collect()}
    assert got == {"d0": 2, "d1": 1, "d2": 0, "d3": 0}


def test_rbo_at_k_vs_python_twin(spark):
    from deepie_spark.operators.retrieval import rbo_at_k

    a = spark.createDataFrame(
        [(f"d{i}", 100.0 - i) for i in range(15)], ["doc_id", "score"]
    )
    # b: same top-3, then shuffled/disjoint tail
    order_b = ["d0", "d1", "d2", "d7", "d9", "d4", "d20", "d21",
               "d5", "d3", "d22"]
    b = spark.createDataFrame(
        [(x, 50.0 - i) for i, x in enumerate(order_b)],
        ["doc_id", "score"],
    )
    k = 10
    r = rbo_at_k(a, b, k=k).collect()[0]
    ta = [f"d{i}" for i in range(k)]
    tb = order_b[:k]
    rbo = 0.0
    for d in range(1, k + 1):
        xd = len(set(ta[:d]) & set(tb[:d]))
        assert r[f"x{d}"] == xd
        rbo += (0.5 ** (d - 1)) * xd / d
    assert r.rbo == round(0.5 * rbo, 6)
    # identical rankings: RBO@k = (1-p) * sum p^(d-1) = 1 - p^k
    r2 = rbo_at_k(a, a, k=k).collect()[0]
    assert r2.rbo == round(1 - 0.5 ** k, 6)
    # disjoint rankings: 0
    c = spark.createDataFrame(
        [(f"z{i}", 10.0 - i) for i in range(12)], ["doc_id", "score"]
    )
    assert rbo_at_k(a, c, k=k).collect()[0].rbo == 0.0


def test_err_at_k_vs_python_cascade(spark):
    from deepie_spark.operators.retrieval import err_at_k

    rels = [3, 0, 2, 1, 0, 3, 0, 0, 1, 2, 3, 0]  # score-desc order
    df = spark.createDataFrame(
        [(f"d{i:02d}", 100.0 - i, g) for i, g in enumerate(rels)],
        ["doc_id", "score", "rel"],
    )
    k = 10
    r = err_at_k(df, k=k).collect()[0]
    err, carry = 0.0, 1.0
    for i, g in enumerate(rels[:k]):
        ri = (2**g - 1) / 8.0
        err += carry * ri / (i + 1)
        carry *= 1.0 - ri
    assert r.k == k and r.n_candidates == len(rels)
    assert r.err == round(err, 6)
    # a perfect first hit dominates: ERR close to R_max = 7/8
    assert 0.875 <= r.err < 1.0
    # all-zero relevance: ERR = 0
    import pyspark.sql.functions as F

    z = df.select("doc_id", "score", (F.col("rel") * 0).alias("rel"))
    assert err_at_k(z, k=k).collect()[0].err == 0.0
