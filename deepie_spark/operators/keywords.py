"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010) —
corpus-level rapid automatic keyword extraction over the documents
table, the degree/frequency companion to the PageRank-based
textrank_keywords query.

Reference context: DeepIE surfaces relation evidence as scored token
spans (rnnRE.py:564-581); RAKE is the unsupervised span-scoring
analogue a curation pipeline runs when no trained tagger exists.

Algorithm:
- stoplist = the ``n_stop`` highest-frequency tokens (corpus-adaptive
  stoplist generation — the df-based variant Rose et al. §1.2.1
  describe; the synthetic vocabulary has no closed English stopword
  class, so a fixed list would never split anything);
- candidate phrases = maximal runs of non-stop tokens (classic
  gaps-and-islands: island id = pos − row_number over the per-doc
  position order), kept when 1 ≤ len ≤ ``max_phrase_len``;
- word scores deg(w)/freq(w) with deg(w) = Σ len(phrase) over the
  word's phrase instances and freq(w) its instance count;
- phrase score = Σ word scores over its (distinct) words.

Engine-portability: deg and freq are exact longs; each word score
rides the PURE-INTEGER fixed point (deg·2^bits) div freq, so the
phrase score is an ORDER-FREE exact-long sum (never an FP fold over
words); ranking ties break on the phrase text.

Scale: one corpus-frequency agg (the stoplist collect is n_stop
rows — bounded, the k-means-seeds precedent), per-DOC keyed windows
for the islands (bounded per doc), two hash aggs for word stats and
phrase scores, and a bounded TakeOrderedAndProject top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deepie_spark.functions.text import tokenize


def rake_keywords(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_stop: int = 30,
    max_phrase_len: int = 4,
    top_k: int = 50,
    scale_bits: int = 20,
) -> DataFrame:
    """Top-``top_k`` RAKE keyword phrases:
    (phrase, n_words, n_occ, score_fp, score)."""
    if max_phrase_len < 1 or n_stop < 1:
        raise ValueError("n_stop and max_phrase_len must be >= 1")
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "token"),
    )
    freq = occ.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    stop = [
        r.token
        for r in freq.orderBy(F.desc("f"), "token").limit(n_stop).collect()
    ]  # bounded: n_stop rows (the k-means-seeds rule)
    ns = occ.filter(~F.col("token").isin(stop))
    w = W.partitionBy("doc_id").orderBy("pos")
    isl = ns.select(
        "doc_id",
        "pos",
        "token",
        (F.col("pos") - F.row_number().over(w)).alias("island"),
    )
    ph = (
        isl.groupBy("doc_id", "island")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("pos", "token"))
                ),
                lambda s: s["token"],
            ).alias("words")
        )
        .filter(F.size("words") <= max_phrase_len)
        .select(
            F.concat_ws(" ", F.col("words")).alias("phrase"),
            F.size("words").cast("long").alias("n_words"),
        )
    )
    wo = ph.select(
        F.explode(F.split(F.col("phrase"), " ")).alias("w"), "n_words"
    )
    ws = wo.groupBy("w").agg(
        F.expr(f"(CAST(sum(n_words) AS BIGINT) * {1 << scale_bits})"
               " div CAST(count(*) AS BIGINT)")
        .cast("long")
        .alias("w_score_fp")
    )
    dp = ph.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.max("n_words").cast("long").alias("n_words"),
    )
    pw = dp.select(
        "phrase",
        "n_occ",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    psum = pw.join(ws, "w").groupBy("phrase", "n_occ", "n_words").agg(
        F.sum("w_score_fp").cast("long").alias("score_fp")
    )
    scale = float(1 << scale_bits)
    return (
        psum.orderBy(F.desc("score_fp"), "phrase")
        .limit(top_k)
        .select(
            "phrase",
            "n_words",
            "n_occ",
            "score_fp",
            F.round(F.col("score_fp") / F.lit(scale), 6).alias("score"),
        )
    )


def kwic_windows(
    toks: DataFrame,
    term: str,
    width: int = 3,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """Keyword-in-context (KWIC) concordance — the corpus-linguistics
    primitive behind every "show me how this term is used" audit
    (collocation triage, sense inspection, PII-context review): one
    row per occurrence of ``term`` with ``width`` tokens of left and
    right context joined as strings.

    Map-only: a posexplode filtered to the term plus two in-row
    ``slice`` calls on the SAME carried token array (plain-column
    collection args — the winnow HOF-CSE rule does not bite), zero
    shuffles, zero joins — the plan a 100-TB concordance must have.
    Context at corpus edges truncates naturally (empty string).

    Output: (id_col, pos, left_ctx, term, right_ctx) with pos the
    0-based token position."""
    ex = toks.select(
        F.col(id_col),
        F.col(toks_col).alias("_tk"),
        F.posexplode(F.col(toks_col)).alias("pos", "token"),
    ).filter(F.col("token") == term)
    left = F.when(F.col("pos") == 0, F.lit("")).otherwise(
        F.concat_ws(
            " ",
            F.expr(
                f"slice(_tk, greatest(pos - {width}, 0) + 1,"
                f" least(pos, {width}))"
            ),
        )
    )
    right = F.concat_ws(
        " ", F.expr(f"slice(_tk, pos + 2, {width})")
    )
    return ex.select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        left.alias("left_ctx"),
        F.col("token").alias("term"),
        right.alias("right_ctx"),
    )


def texttile_boundaries(
    toks: DataFrame,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    block: int = 10,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """TextTiling-style topic-shift segmentation (Hearst 1997,
    block-comparison variant): split each document into consecutive
    ``block``-token blocks and score every inter-block gap by the
    cosine of the adjacent blocks' integer term-frequency vectors; a
    gap is a BOUNDARY when cohesion < threshold.

    Exactness: tf vectors are integer, so dot and the two squared
    norms are exact longs and the boundary decision is the
    cross-multiplied integer comparison

        den²·dot² < num²·‖a‖²·‖b‖²      (dot ≥ 0)

    — no float threshold anywhere; the reported cohesion is one
    identical IEEE chain.  Plan: one posexplode, one tf agg, one
    adjacent-block equi-join on (id, block+1, token), one norm
    join-back — all keyed on the document, no window, no cross join.

    Output: (id_col, gap, dot, na, nb, cohesion, is_boundary) with
    ``gap`` the left block index."""
    if block < 1 or threshold_num < 0 or threshold_den <= 0:
        raise ValueError("need block >= 1 and threshold >= 0")
    occ = toks.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(toks_col)).alias("pos", "token"),
    ).select(
        "_id",
        F.expr(f"pos div {block}").cast("long").alias("blk"),
        "token",
    )
    tf = occ.groupBy("_id", "blk", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    norms = tf.groupBy("_id", "blk").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("nsq")
    )
    gaps = (
        norms.select("_id", F.col("blk").alias("gap"),
                     F.col("nsq").alias("na"))
        .join(
            norms.select(
                "_id",
                (F.col("blk") - 1).alias("gap"),
                F.col("nsq").alias("nb"),
            ),
            ["_id", "gap"],
        )
    )
    dots = (
        tf.select("_id", F.col("blk").alias("gap"), "token",
                  F.col("tf").alias("ta"))
        .join(
            tf.select(
                "_id",
                (F.col("blk") - 1).alias("gap"),
                "token",
                F.col("tf").alias("tb"),
            ),
            ["_id", "gap", "token"],
        )
        .groupBy("_id", "gap")
        .agg(F.sum(F.col("ta") * F.col("tb")).cast("long").alias("dot"))
    )
    j = gaps.join(dots, ["_id", "gap"], "left").select(
        "_id", "gap", "na", "nb",
        F.coalesce("dot", F.lit(0)).cast("long").alias("dot"),
    )
    tn2 = threshold_num * threshold_num
    td2 = threshold_den * threshold_den
    is_b = (
        F.lit(td2) * F.col("dot") * F.col("dot")
        < F.lit(tn2) * F.col("na") * F.col("nb")
    )
    return j.select(
        F.col("_id").alias(id_col),
        "gap",
        "dot",
        "na",
        "nb",
        F.round(
            F.col("dot").cast("double")
            / F.sqrt((F.col("na") * F.col("nb")).cast("double")),
            6,
        ).alias("cohesion"),
        is_b.alias("is_boundary"),
    )
