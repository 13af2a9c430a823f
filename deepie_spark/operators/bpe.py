"""Distributed BPE merge training (Sennrich et al. 2016 §3.2).

Byte-pair-encoding training looks sequential — one merge at a time —
but the working set after the first corpus pass is the WORD VOCABULARY
(distinct words + counts), not the corpus: at web scale the corpus-
sized work is exactly one explode + hash agg (word counts), and every
merge round then runs over the vocabulary table:

  * pair counting: in-row adjacent-pair explode over the symbol arrays
    + one hash agg weighted by word count (map-side combine) — counts
    are EXACT INTEGERS, so the argmax is engine-portable;
  * merge selection: ``ORDER BY count DESC, s1, s2 LIMIT 1`` — a
    bounded 1-row collect per round (the trainer's only driver
    action, same pattern as the k-means centroid collect);
  * merge application: an in-row left fold per word — greedy
    left-to-right non-overlapping replacement.  The fold replaces the
    accumulator's last symbol when (last, current) equals the pair;
    this is exactly greedy BPE because the merged symbol is strictly
    longer than s1, so a just-created merge can never re-match as s1
    within the same round;
  * ``localCheckpoint`` per round truncates lineage (the iterative
    DataFrame-loop rule from PageRank/CC).

No end-of-word marker (documented variant): words are whitespace
tokens, symbols start as their characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping replacement of adjacent
    (a, b) with a+b inside a symbol array — pure in-row fold."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    word_counts: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges over (word, n) counts.

    Returns (merges in order, final vocab DataFrame
    (word, n, syms array<string>)).  Deterministic under any
    partitioning: exact-integer pair counts with lexicographic
    (s1, s2) tie-break."""
    vocab = word_counts.select(
        "word", "n", F.split("word", "").alias("syms")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("syms") - 2),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i + 1).alias("s1"),
                            F.element_at(F.col("syms"), i + 2).alias("s2"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("n").cast("long").alias("c"))
        )
        top = pairs.orderBy(F.desc("c"), "s1", "s2").limit(1).collect()
        if not top:
            break
        a, b = top[0]["s1"], top[0]["s2"]
        merges.append((a, b))
        vocab = vocab.withColumn(
            "syms", apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges, vocab


def bpe_segment_corpus(
    word_counts: DataFrame, n_merges: int
) -> DataFrame:
    """(word, n, segmentation, n_syms): the vocabulary after
    ``n_merges`` trained merges, symbols joined with '|' (scalar
    output — gated-query friendly)."""
    _, vocab = bpe_train(word_counts, n_merges)
    return vocab.select(
        "word",
        "n",
        F.concat_ws("|", "syms").alias("segmentation"),
        F.size("syms").cast("long").alias("n_syms"),
    )
