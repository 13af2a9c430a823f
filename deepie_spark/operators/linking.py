"""Entity-link scoring and disambiguation (north-star stage 2's
"entity-link scoring against an alias dictionary").

A surface form may map to several catalog entities; linking picks one
per mention occurrence.  Scoring is ``prior + context affinity``:

* **prior** — the catalog's standalone link probability;
* **context affinity** — fraction of the entity's context cue tokens
  present in the mention's surrounding token window (a deterministic,
  oracle-expressible stand-in for embedding similarity; the
  embedding-based variant plugs into the same plan by swapping the
  affinity expression for a dot product against broadcast entity
  vectors).

The plan: explode candidates via broadcast join on the alias, score
in-row, keep the argmax per (doc, pos) with ``row_number()`` — ties
break on entity_id, so linking is deterministic.  One narrow window per
mention; no extra shuffle beyond the candidate join's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def context_affinity(
    context_tokens: Column, cue_tokens: Column
) -> Column:
    """|context ∩ cues| / |cues| — 0 when the entity has no cues."""
    n_cues = F.size(cue_tokens)
    hits = F.size(F.array_intersect(F.array_distinct(context_tokens), cue_tokens))
    return F.when(n_cues > 0, hits.cast("double") / n_cues).otherwise(
        F.lit(0.0)
    )


def link_mentions(
    occurrences: DataFrame,
    catalog: DataFrame,
    window: int = 3,
    prior_weight: float = 0.5,
) -> DataFrame:
    """Disambiguate token occurrences against an (ambiguous) catalog.

    ``occurrences``: (doc_id, pos, token, toks) — token stream with the
    full token array carried for context.  ``catalog``: (entity_id,
    alias, entity_type, prior, cues array<string>).  Returns one row per
    linked mention: the argmax-scored candidate.
    """
    # ±window tokens around pos: clamp the start at the sentence
    # boundary AND shrink the length by the clamped amount — a fixed
    # length would grab extra right-hand context for sentence-initial
    # mentions and inflate their affinity
    start0 = F.greatest(F.col("pos") - window, F.lit(0))  # 0-based
    ctx = F.slice(
        F.col("toks"),
        (start0 + 1).cast("int"),
        (F.col("pos") + window + 1 - start0).cast("int"),
    )
    cands = occurrences.join(
        F.broadcast(catalog), occurrences.token == catalog["alias"]
    ).withColumn(
        "score",
        F.round(
            prior_weight * F.col("prior")
            + (1.0 - prior_weight)
            * context_affinity(ctx, F.col("cues")),
            6,
        ),
    )
    w = W.partitionBy("doc_id", "pos").orderBy(
        F.col("score").desc(), F.col("entity_id")
    )
    return (
        cands.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id", "pos", "alias", "entity_id", "entity_type", "score"
        )
    )
