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
