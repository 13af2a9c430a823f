"""Approximate sketches for corpus-scale profiling.

Exact distinct counts and exact heavy-hitter counts shuffle the full
key set; at 10^12 documents the profiling queries that guard a training
pipeline (vocabulary growth, hot-token monitoring, per-source
cardinality) want mergeable fixed-size sketches instead:

* **HyperLogLog++** — ``approx_count_distinct`` (built-in): map-side
  partial sketches merge in a tiny reduce; relative standard deviation
  is a parameter.  The exact twin exists for verification at test
  scale; at production scale only the sketch runs.
* **Count-min sketch** — the ``count_min_sketch`` SQL aggregate
  (partial sketches merge map-side inside the aggregation, one binary
  blob reaches the driver): upper-biased counts with
  ``est ≤ true + eps·N`` at the given confidence; the standard
  heavy-hitter monitor.

Both are JVM implementations; nothing here leaves the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import shingles, tokenize
from deepie_spark.session import ensure_parallelism


def source_shingle_cardinality(
    docs: DataFrame,
    k: int = 3,
    rsd: float = 0.05,
    tolerance: float = 0.15,
) -> DataFrame:
    """Per-source distinct-shingle cardinality, sketched AND exact.

    Returns (source, n_exact, approx_ok): the exact count is the
    verification twin (oracle-computable), ``approx_ok`` asserts the
    HLL estimate lands within ``tolerance`` of it — the same
    gate-by-exact-twin pattern as the tagger gate.  At scale the exact
    branch is dropped and only the sketch runs."""
    docs = ensure_parallelism(docs)
    sh = docs.select(
        "source",
        F.explode(
            F.array_distinct(shingles(tokenize(F.col("text")), k))
        ).alias("shingle"),
    )
    agg = sh.groupBy("source").agg(
        F.countDistinct("shingle").alias("n_exact"),
        F.approx_count_distinct("shingle", rsd=rsd).alias("n_approx"),
    )
    return agg.select(
        "source",
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= tolerance * F.col("n_exact")
        ).cast("int").alias("approx_ok"),
    )


def token_count_min(
    docs: DataFrame,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 17,
):
    """Count-min sketch over the exploded token stream, built with the
    ``count_min_sketch`` SQL aggregate (partials merge map-side; one
    sketch-sized blob crosses the wire).  Returns the JVM
    CountMinSketch handle (``estimateCount``/``mergeInPlace``/
    ``totalCount``); estimates satisfy ``true ≤ est ≤ true + eps·N``
    w.p. ``confidence``."""
    occ = ensure_parallelism(docs).select(
        F.explode(tokenize(F.col("text"))).alias("token")
    )
    blob = occ.agg(
        F.expr(
            f"count_min_sketch(token, cast({eps} as double),"
            f" cast({confidence} as double), {seed})"
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = docs.sparkSession._jvm
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(blob)
    )
