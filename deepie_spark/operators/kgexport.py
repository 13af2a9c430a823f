"""KG serialization for downstream consumers (KG stage 9).

After the triple table is canonicalized and audited, the last step of
a KG-construction pipeline is handing the graph to consumers that do
not speak triples: entity-centric "cards" (one row per subject with
its facts flattened to a deterministic string) are the standard shape
for KG→text corpus generation (KELM, Agarwal et al. NAACL 2021 —
verbalized triple groups as LLM training data), for entity-profile
indexing, and for human spot-checks.  The reference pipeline stops at
per-pair prediction files (rnnRE.py:979-994 renders one line per
pair); this is the downstream materialization those lines feed.

Scale notes: one distinct over (s, p, o) — a single shuffle with
map-side combine — then ONE groupBy(subject).  Per-subject fact lists
are bounded by the subject's out-degree (the entity-card analog of a
document: small in practice; a pathological super-subject would be
capped upstream by the same hub guards the graph operators use).
The card string is built in-row with ``array_sort`` + ``array_join``
— deterministic regardless of shuffle order, no window, no second
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_cards(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """One row per subject entity: ``(entity, n_facts, n_preds,
    card)`` where ``card`` is the '|'-joined, lexically-sorted list of
    distinct ``pred=obj`` facts.  Exact strings and exact longs — the
    output is hash-exact across engines (and across partitionings,
    because the sort happens in-row after the distinct).

    Self-loop facts (s == o) are kept: a card states every fact the
    table holds for the entity; filtering is the auditors' job
    (kgquality), not the serializer's.
    """
    facts = triples.select(
        F.col(subj_col).alias("entity"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    ).distinct()
    fact = F.concat(F.col("p"), F.lit("="), F.col("o"))
    return (
        facts.groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_facts"),
            F.countDistinct("p").alias("n_preds"),
            F.array_sort(F.collect_list(fact)).alias("fl"),
        )
        .select(
            "entity",
            F.col("n_facts").cast("long").alias("n_facts"),
            F.col("n_preds").cast("long").alias("n_preds"),
            F.array_join("fl", "|").alias("card"),
        )
    )


def entity_salience(
    mentions: DataFrame,
    n_docs: DataFrame,
    doc_col: str = "doc_id",
    alias_col: str = "alias",
    pos_col: str = "pos",
) -> DataFrame:
    """Per-(document, entity) salience: which entities a page is ABOUT
    — the weighting signal triple-confidence aggregation and entity
    summarization read (salient subjects make trustworthy triples;
    Gamon et al. 2013).  ``salience = n_mentions · (ln D − ln df)``
    — mention-frequency × entity-IDF.

    Engine portability: ``n_mentions``, ``first_pos``, ``df`` and
    ``D`` are exact longs; both ``ln`` calls take exact-integer
    arguments (the repo convention — both engines round the same libm
    value), and the final product multiplies two identical doubles.

    Plan: one (doc, alias) count agg over the mention stream, one
    alias-level df agg (catalog-bounded → broadcast join-back), one
    1-row corpus count cross-joined.  No window, no self-join.
    ``n_docs`` must be a 1-row DataFrame with a long column ``d`` =
    total corpus size (computed from the DOCUMENT table, not the
    mention stream, so mention-free docs count toward IDF).
    """
    per_doc = mentions.groupBy(
        F.col(doc_col).alias("doc_id"), F.col(alias_col).alias("alias")
    ).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min(pos_col).cast("long").alias("first_pos"),
    )
    df = per_doc.groupBy("alias").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    out = per_doc.join(F.broadcast(df), "alias").crossJoin(
        F.broadcast(n_docs)
    )
    sal = F.col("n_mentions").cast("double") * (
        F.log(F.col("d").cast("double"))
        - F.log(F.col("df").cast("double"))
    )
    return out.select(
        "doc_id",
        "alias",
        F.col("n_mentions").cast("long").alias("n_mentions"),
        "first_pos",
        "df",
        F.round(sal, 6).alias("salience"),
    )
