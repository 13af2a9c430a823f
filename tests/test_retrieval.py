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
