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


def fellegi_sunter_weights(
    pairs: DataFrame, label_col: str, feature_cols: list[str]
) -> DataFrame:
    """Fellegi–Sunter record-linkage weights (JASA 1969): for each
    boolean comparison feature, the conditional agreement rates

        m = P(agree | match)      u = P(agree | non-match)

    and the log-likelihood-ratio weights the classic ER decision rule
    sums per pair (agreement adds ln(m/u), disagreement adds
    ln((1−m)/(1−u))).  Input: one row per LABELED candidate pair
    (``label_col`` boolean — e.g. membership in a verified-duplicate
    set), one boolean column per feature.

    Output: one row per feature — exact-long counts (m_num, m_den,
    u_num, u_den, +1/+2 Laplace-smoothed so zero cells stay finite)
    and round-6 weights.  Every weight's ln argument is ONE division
    of exact-integer products (the PMI rule), so values are
    engine-portable with no FP-sum tolerance.

    Plan: ONE aggregation over the pair table (2·k+2 conditional
    sums, map-side combinable), then a k-row in-plan unpivot (the
    table_profile stack pattern) — no shuffle keyed on data, no
    window, no driver collect.
    """
    if not feature_cols:
        raise ValueError("need at least one feature column")
    lab = F.col(label_col).cast("boolean")
    aggs = [
        F.sum(F.when(lab, 1).otherwise(0)).cast("long").alias("m_den"),
        F.sum(F.when(~lab, 1).otherwise(0)).cast("long").alias("u_den"),
    ]
    for f in feature_cols:
        fc = F.col(f).cast("boolean")
        aggs.append(
            F.sum(F.when(lab & fc, 1).otherwise(0))
            .cast("long")
            .alias(f"m_{f}")
        )
        aggs.append(
            F.sum(F.when(~lab & fc, 1).otherwise(0))
            .cast("long")
            .alias(f"u_{f}")
        )
    one = pairs.agg(*aggs)
    stack = ", ".join(
        f"'{f}', m_{f}, u_{f}" for f in feature_cols
    )
    rows = one.selectExpr(
        "m_den",
        "u_den",
        f"stack({len(feature_cols)}, {stack})"
        " AS (feature, m_num, u_num)",
    )
    w_agree = F.log(
        ((F.col("m_num") + 1) * (F.col("u_den") + 2))
        / ((F.col("u_num") + 1) * (F.col("m_den") + 2))
    )
    w_disagree = F.log(
        ((F.col("m_den") - F.col("m_num") + 1) * (F.col("u_den") + 2))
        / ((F.col("u_den") - F.col("u_num") + 1) * (F.col("m_den") + 2))
    )
    return rows.select(
        "feature",
        "m_num",
        "m_den",
        "u_num",
        "u_den",
        F.round(w_agree, 6).alias("w_agree"),
        F.round(w_disagree, 6).alias("w_disagree"),
    )


def mutual_nn_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 40,
) -> DataFrame:
    """Mutual-nearest-neighbor alignment between two embedding sets —
    the high-precision unsupervised matcher (bilingual lexicon
    induction, cross-catalog entity alignment: Artetxe et al. 2018,
    Lample et al. 2018 use exactly this filter): keep (a, b) iff b is
    a's top-1 cosine in ``right`` AND a is b's top-1 in ``left``.
    Mutuality is the precision gate — one-directional top-1 pairs
    include every hub attraction; requiring agreement removes them.

    Engine-portability is the mmr_rerank rule: cosines ride
    floor(2^bits·cos) exact longs (sequential-fold dot products ==
    DuckDB list_dot_product), both argmaxes are min(struct(−fp, id))
    with id tie-breaks, and the join keeps exact integers end-to-end.

    Scale: the pair stage here is the exact brute-force generator
    (the verification tier); at corpus scale the SAME mutual filter
    runs over LSH/IVF candidate pairs (operators/similarity.py), which
    approximates only the candidate set, not the mutuality rule."""
    scale = F.lit(float(1 << scale_bits))

    def side(df, ida, v):
        return df.select(
            F.col(id_col).alias(ida),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
                v
            ),
        )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a = side(left, "a", "va")
    b = side(right, "b", "vb")
    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    pairs = a.crossJoin(b).select(
        "a",
        "b",
        F.floor(cos * scale).cast("long").alias("fp"),
    )
    best_b = pairs.groupBy("a").agg(
        F.min(F.struct((-F.col("fp")).alias("nf"), F.col("b").alias("b")))[
            "b"
        ].alias("b")
    )
    best_a = pairs.groupBy("b").agg(
        F.min(F.struct((-F.col("fp")).alias("nf"), F.col("a").alias("a")))[
            "a"
        ].alias("a")
    )
    mutual = best_b.join(best_a, ["a", "b"])
    return (
        mutual.join(pairs, ["a", "b"])
        .select(
            "a",
            "b",
            "fp",
            F.round(F.col("fp") / scale, 6).alias("cosine"),
        )
        .orderBy("a")
    )


def hard_triplets(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 40,
) -> DataFrame:
    """Hard-triplet mining for contrastive training (Schroff et al.
    FaceNet 2015; the batch-hard rule of Hermans et al. 2017 applied
    corpus-wide): per anchor, the hardest POSITIVE is its top-1
    cosine neighbor sharing its label (self excluded) and the hardest
    NEGATIVE its top-1 neighbor with a DIFFERENT label; the margin
    pos − neg is the triplet-loss violation signal (negative margin =
    the pairs a contrastive fine-tune must fix first).

    Portability is the mutual_nn_pairs rule: cosines as
    floor(2^bits·cos) exact longs, both argmaxes min(struct(−fp, id)),
    the margin an exact long difference.  Anchors whose label is a
    singleton have no positive and are dropped (inner join) — the
    triplet needs both sides.

    Scale: this is the exact brute-force tier (pairs = n²·d work,
    fine for the verification corpus); at 100 TB the SAME per-anchor
    argmax runs over IVF/LSH candidate pairs (operators/similarity.py)
    — mining quality degrades gracefully with candidate recall while
    the selection rule stays identical."""
    scale = F.lit(float(1 << scale_bits))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"),
        v.alias("v"),
    )
    a = base.select(
        F.col("id").alias("anchor"),
        F.col("lbl").alias("lbl_a"),
        F.col("v").alias("va"),
    )
    b = base.select(
        F.col("id").alias("other"),
        F.col("lbl").alias("lbl_b"),
        F.col("v").alias("vb"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("anchor") != F.col("other"))
        .select(
            "anchor",
            "lbl_a",
            "other",
            "lbl_b",
            F.floor(cos * scale).cast("long").alias("fp"),
        )
    )
    arg = F.min(
        F.struct((-F.col("fp")).alias("nf"), F.col("other").alias("o"))
    )
    pos = (
        pairs.filter(F.col("lbl_a") == F.col("lbl_b"))
        .groupBy("anchor")
        .agg(arg.alias("s"))
        .select(
            "anchor",
            F.col("s")["o"].alias("pos_id"),
            (-F.col("s")["nf"]).cast("long").alias("pos_fp"),
        )
    )
    neg = (
        pairs.filter(F.col("lbl_a") != F.col("lbl_b"))
        .groupBy("anchor")
        .agg(arg.alias("s"))
        .select(
            "anchor",
            F.col("s")["o"].alias("neg_id"),
            (-F.col("s")["nf"]).cast("long").alias("neg_fp"),
        )
    )
    scale_f = float(1 << scale_bits)
    return pos.join(neg, "anchor").select(
        "anchor",
        "pos_id",
        "neg_id",
        "pos_fp",
        "neg_fp",
        (F.col("pos_fp") - F.col("neg_fp")).cast("long").alias("margin_fp"),
        F.round(F.col("pos_fp") / F.lit(scale_f), 6).alias("pos_cos"),
        F.round(F.col("neg_fp") / F.lit(scale_f), 6).alias("neg_cos"),
        (F.col("neg_fp") >= F.col("pos_fp")).alias("violation"),
    )
