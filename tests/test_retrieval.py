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
