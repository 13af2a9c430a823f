"""N-gram language-model count statistics.

Kneser–Ney smoothing — the standard n-gram LM estimator (Kneser &
Ney 1995; the KenLM default every web-corpus perplexity filter is
trained with) — is driven entirely by three exact-integer statistics
per word: the raw unigram count ``c(w)``, the LEFT continuation count
``N1+(·w)`` (how many distinct predecessors w follows — the quantity
the lower-order KN distribution is built from), and the RIGHT
fan-out ``N1+(w·)`` (how many distinct successors w precedes — the
backoff-weight numerator).  This module computes all three in one
pass; the FP smoothing arithmetic is left to the consumer so the
output stays engine-bit-identical (the closeness_stats convention —
see q_doc_perplexity for the FP-scoring counterpart).

Reference parity note: the reference pipeline has no n-gram LM — this
is one of the LLM-data-pipeline extensions (SURVEY.md §2 extension
table) beside doc_perplexity and dsir_weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kn_continuation_counts(
    toks: DataFrame, toks_col: str = "toks"
) -> DataFrame:
    """Per-token ``(token, c, n_left, n_right)`` exact longs over a
    (doc_id, token-array) frame: raw count, N1+(·w), N1+(w·).

    Plan (the 100-TB shape): bigrams are materialized IN-ROW from the
    token array (``transform`` over a slice — zero joins; the
    positional self-join the DuckDB twin uses would shuffle the corpus
    twice), then ONE distinct on (w1, w2) feeds both continuation
    aggregations, and the unigram count is one more hash agg.  All
    stages are map-side-combinable groupBys on token keys; nothing is
    collected, nothing is windowed.  Vocabulary-sized joins are left
    un-hinted (the tfidf/doc_perplexity rule) so AQE picks the
    strategy at real scale.
    """
    t = toks.filter(F.size(toks_col) >= 1)
    uni = (
        t.select(F.explode(toks_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = F.expr(
        f"transform(slice({toks_col}, 1, size({toks_col}) - 1),"
        f" (x, i) -> struct(x AS w1, {toks_col}[i + 1] AS w2))"
    )
    bgd = (
        t.filter(F.size(toks_col) >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .distinct()
    )
    nr = bgd.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n_right")
    )
    nl = bgd.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_left")
    )
    return (
        uni.join(nl, uni["token"] == nl["w2"], "left")
        .join(nr, uni["token"] == nr["w1"], "left")
        .select(
            "token",
            "c",
            F.coalesce("n_left", F.lit(0)).cast("long").alias("n_left"),
            F.coalesce("n_right", F.lit(0)).cast("long").alias("n_right"),
        )
    )
