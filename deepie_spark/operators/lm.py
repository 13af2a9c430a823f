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


def naive_bayes_classify(
    occ: DataFrame,
    labels: DataFrame,
    doc_col: str = "doc_id",
    token_col: str = "token",
    label_col: str = "label",
    scale_bits: int = 20,
) -> DataFrame:
    """Multinomial naive-Bayes document classification with Laplace
    smoothing, trained and applied on the same corpus (the
    resubstitution audit a curation pipeline runs to ask "is this
    label separable from the text at all?" — e.g. language or source
    from tokens).  Returns per doc the argmax label, its score and
    the gold/pred agreement flag.

    Engine-portable scoring: every log term is the difference of two
    EXACT-INTEGER-argument ln's quantized to fixed point —
    token term  floor(2^bits·(ln(c_tc+1) − ln(N_c+V))),
    prior term  floor(2^bits·(ln D_c − ln D)) —
    so the per-(doc,label) score is an order-free exact-long sum and
    the argmax (min(struct(−score, label))) is hash-gateable.
    Overflow: doc_len·2^bits·ln(N_c+V) per doc — 20 bits holds to
    ~10⁹-token documents.

    Plan: two hash aggs build the (token,label) count table and the
    label marginals; scoring is occurrences × |labels| rows with a
    LEFT join onto the count table (absent pair → c_tc = 0, ln 1 = 0
    exactly in both engines) and one final per-doc argmax agg — no
    window, no driver loop."""
    scale = F.lit(float(1 << scale_bits))
    o = occ.select(
        F.col(doc_col).alias("_doc"), F.col(token_col).alias("_tok")
    )
    lab = labels.select(
        F.col(doc_col).alias("_doc"), F.col(label_col).alias("_lbl")
    )
    tl = o.join(lab, "_doc")
    ctc = tl.groupBy("_tok", "_lbl").agg(
        F.count(F.lit(1)).cast("long").alias("c_tc")
    )
    nc = ctc.groupBy("_lbl").agg(F.sum("c_tc").cast("long").alias("n_c"))
    dc = lab.groupBy("_lbl").agg(
        F.count(F.lit(1)).cast("long").alias("d_c")
    )
    glob = tl.agg(
        F.countDistinct("_tok").cast("long").alias("v_sz"),
    ).crossJoin(lab.agg(F.count(F.lit(1)).cast("long").alias("d_tot")))
    cls = (
        nc.join(dc, "_lbl")
        .crossJoin(F.broadcast(glob))
        .select(
            "_lbl",
            (F.col("n_c") + F.col("v_sz")).cast("long").alias("den_c"),
            F.floor(
                scale
                * (
                    F.log(F.col("d_c").cast("double"))
                    - F.log(F.col("d_tot").cast("double"))
                )
            )
            .cast("long")
            .alias("prior_fp"),
        )
    )
    scored = (
        o.crossJoin(F.broadcast(cls))
        .join(ctc, ["_tok", "_lbl"], "left")
        .select(
            "_doc",
            "_lbl",
            "prior_fp",
            F.floor(
                scale
                * (
                    F.log(
                        (F.coalesce(F.col("c_tc"), F.lit(0)) + F.lit(1))
                        .cast("double")
                    )
                    - F.log(F.col("den_c").cast("double"))
                )
            )
            .cast("long")
            .alias("term_fp"),
        )
        .groupBy("_doc", "_lbl")
        .agg(
            (F.max("prior_fp") + F.sum("term_fp"))
            .cast("long")
            .alias("score_fp")
        )
    )
    pred = scored.groupBy("_doc").agg(
        F.min(
            F.struct(
                (-F.col("score_fp")).alias("ns"), F.col("_lbl").alias("l")
            )
        ).alias("s")
    )
    return pred.join(lab, "_doc").select(
        F.col("_doc").alias(doc_col),
        F.col("_lbl").alias("gold_label"),
        F.col("s")["l"].alias("pred_label"),
        (-F.col("s")["ns"]).cast("long").alias("score_fp"),
        (F.col("s")["l"] == F.col("_lbl")).alias("correct"),
    )


def absolute_discount_bigram(
    toks: DataFrame, toks_col: str = "toks"
) -> DataFrame:
    """Interpolated absolute-discounting bigram probabilities with the
    POWER-OF-TWO discount d = 1/2 (the Kneser-Ney smoothing family —
    Ney, Essen & Kneser 1994 — applied on top of
    kn_continuation_counts' statistics):

        P(w₂|w₁) = (c₁₂ − ½)/c₁ + ½·(T₁/c₁)·(N₁₊(·w₂)/B)
                 = [(2c₁₂ − 1)·B + T₁·N₁₊(·w₂)] / (2·c₁·B)

    for every OBSERVED bigram (c₁₂ ≥ 1; the unseen tail is the
    residual backoff mass T₁/(2c₁)·(1 − Σ_seen N₁₊(·w₂)/B), pinned by
    the pytest Fractions twin: total mass per head is EXACTLY 1).
    With d a dyadic rational every numerator/denominator is an exact
    long — emitted undivided plus one IEEE ratio, hash-gateable.
    Overflow bound: 2·c₁₂·B must fit int64 (c₁₂·B < 2^62 — holds to
    ~10⁹ tokens × 10⁹ bigram types is past it; at that scale shard by
    w₁ and rescale B).

    Plan: in-row bigram expansion (the kn_continuation_counts shape),
    then four hash aggs (c₁₂, c₁, T₁, N₁₊(·w₂)) and one bounded
    1-row cross join for B — no window, no self-join."""
    t = toks.filter(F.size(toks_col) >= 2)
    pairs = F.expr(
        f"transform(slice({toks_col}, 1, size({toks_col}) - 1),"
        f" (x, i) -> struct(x AS w1, {toks_col}[i + 1] AS w2))"
    )
    bg = t.select(F.explode(pairs).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t1"),
    )
    nl = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("nl2")
    )
    bt = c12.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    num = (F.lit(2) * F.col("c12") - F.lit(1)) * F.col("bt") + F.col(
        "t1"
    ) * F.col("nl2")
    den = F.lit(2) * F.col("c1") * F.col("bt")
    return (
        c12.join(c1, "w1")
        .join(nl, "w2")
        .crossJoin(F.broadcast(bt))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "t1",
            "nl2",
            "bt",
            num.cast("long").alias("num"),
            den.cast("long").alias("den"),
            F.round(num.cast("long") / den.cast("long"), 6).alias("p"),
        )
    )


def heldout_loglik(
    train: DataFrame,
    held: DataFrame,
    toks_col: str = "toks",
    scale_bits: int = 20,
) -> DataFrame:
    """Held-out log-likelihood of the absolute-discount bigram model
    (the evaluation half of absolute_discount_bigram — what a
    perplexity report is made of): train the d = 1/2 model on one
    corpus split, score every bigram occurrence of the other.

    Scoring rule per held-out bigram (w1, w2):
      - (w1, w2) observed in training → the model's own
        P = [(2c₁₂−1)·B + T₁·N₁₊(·w₂)] / (2·c₁·B);
      - w1 known, pair unseen → the interpolated backoff mass
        P = T₁·N₁₊(·w₂) / (2·c₁·B)  (the same formula at c₁₂ = 0 + ½
        discount floor — exactly the residual the Fractions twin
        pins);
      - w1 unseen or w2 never a continuation → OOV, excluded and
        counted (the standard open-vocabulary convention).

    Both num and den stay EXACT LONGS, so ln num − ln den has
    integer libm args; each bigram TYPE's term is quantized
    floor(2^bits·term) once and weighted by its held-out count —
    order-free exact-long accumulation, hash-gateable (perplexity's
    exp is left client-side, the kaplan_meier rule).

    Plan: the four training hash aggs + one held-out bigram count +
    three left joins — no window, no self-join.

    Output one row: (n_scored, n_oov, sum_ll_fp, avg_ll)."""

    def _bigrams(df):
        t = df.filter(F.size(toks_col) >= 2)
        pairs = F.expr(
            f"transform(slice({toks_col}, 1, size({toks_col}) - 1),"
            f" (x, i) -> struct(x AS w1, {toks_col}[i + 1] AS w2))"
        )
        return t.select(F.explode(pairs).alias("p")).select(
            F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
        )

    c12 = _bigrams(train).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("t1"),
    )
    nl = c12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("nl2")
    )
    bt = c12.agg(F.count(F.lit(1)).cast("long").alias("bt"))
    hb = _bigrams(held).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("hc")
    )
    j = (
        hb.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .join(nl, "w2", "left")
        .crossJoin(F.broadcast(bt))
    )
    ok = F.col("c1").isNotNull() & F.col("nl2").isNotNull()
    num = F.when(
        F.col("c12").isNotNull(),
        (F.lit(2) * F.col("c12") - F.lit(1)) * F.col("bt")
        + F.col("t1") * F.col("nl2"),
    ).otherwise(F.col("t1") * F.col("nl2"))
    den = F.lit(2) * F.col("c1") * F.col("bt")
    scale = F.lit(float(1 << scale_bits))
    term_fp = F.floor(
        (F.log(num.cast("double")) - F.log(den.cast("double"))) * scale
    )
    agg = j.agg(
        F.sum(F.when(ok, F.col("hc")).otherwise(0))
        .cast("long")
        .alias("n_scored"),
        F.sum(F.when(ok, 0).otherwise(F.col("hc")))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.when(ok, F.col("hc") * term_fp).otherwise(0))
        .cast("long")
        .alias("sum_ll_fp"),
    )
    return agg.select(
        "n_scored",
        "n_oov",
        "sum_ll_fp",
        F.round(
            (F.col("sum_ll_fp") / scale) / F.col("n_scored"), 6
        ).alias("avg_ll"),
    )
