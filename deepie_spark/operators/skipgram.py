"""Skip-gram (center, context) pair counts — embedding-training data.

The reference pipeline CONSUMES word2vec embeddings (word2vec binary
reader, rnn_process_onlyExtra.py:658 loads `vectors.bin`-format files;
sources/embeddings.py re-expresses it).  This operator closes the loop:
it PRODUCES the co-occurrence training corpus those embeddings are
trained from — the (center, context) pair counts of Mikolov et al.
2013 with a symmetric window — so a single engine can go raw corpus →
skip-gram pairs → (external trainer) → embeddings → this pipeline.

Plan shape (the 100-TB argument): pair generation is MAP-ONLY — one
in-row higher-order expression expands each document's token array to
its O(n·window) (center, context) structs, then ONE explode and ONE
groupBy count with map-side combine.  No self-join on position (the
naive formulation shuffles the corpus twice and re-keys on doc_id; the
oracle uses exactly that join formulation in DuckDB, which makes it an
INDEPENDENT check, not a transliteration).  Output cardinality is
bounded by vocab², not corpus size, so the single shuffle carries
pre-combined partial counts.

HOF-CSE note (the 230s trap, CLAUDE.md): every lambda below indexes
the PLAIN column ``toks`` — O(1) per access, nothing re-derives a
collection per element, so per-row cost is the true O(n·window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import tokenize


def skipgram_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
) -> DataFrame:
    """(center, context, n) counts over a symmetric ±``window`` token
    window, summed across the corpus.  Deterministic: counts are exact
    longs; no sampling or sub-sampling (rate tricks belong to the
    trainer, not the corpus builder).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = int(window)
    toks = tokenize(F.col(text_col))
    pairs = F.explode(
        F.expr(
            f"""
            flatten(transform(sequence(0, size(toks) - 1), i ->
              transform(
                filter(sequence(greatest(0, i - {w}),
                                least(size(toks) - 1, i + {w})),
                       j -> j != i),
                j -> struct(toks[i] AS center, toks[j] AS context))))
            """
        )
    )
    return (
        docs.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(pairs.alias("pr"))
        .groupBy(
            F.col("pr.center").alias("center"),
            F.col("pr.context").alias("context"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def skipgram_pmi(
    pairs: DataFrame,
    min_count: int = 1,
) -> DataFrame:
    """Pointwise mutual information over a ``(center, context, n)``
    pair-count table (the `skipgram_pairs` output):

        pmi(x, y) = ln n_xy + ln T − ln n_x − ln n_y

    — the word-association statistic the count-based embedding line
    (PPMI-SVD, Levy & Goldberg 2014) factorizes, and the standard
    collocation filter for phrase mining on the way into a KG.

    Engine portability: marginals and the grand total are exact longs
    summed from exact longs; all four ln() calls take exact-integer
    arguments and combine in a FIXED written order (the bm25 rules),
    rounded to 6 digits.

    Plan: two vocab-sized marginal aggs joined back WITHOUT broadcast
    hints (vocab is unbounded — the doc_perplexity rule), one 1-row
    total cross-joined.  Everything stays (vocab²)-bounded — corpus
    size only enters through the upstream pair counting.
    """
    cm = pairs.groupBy("center").agg(
        F.sum("n").cast("long").alias("n_center")
    )
    xm = pairs.groupBy("context").agg(
        F.sum("n").cast("long").alias("n_context")
    )
    tot = pairs.agg(F.sum("n").cast("long").alias("t"))
    j = (
        pairs.filter(F.col("n") >= F.lit(int(min_count)))
        .join(cm, "center")
        .join(xm, "context")
        .crossJoin(F.broadcast(tot))
    )
    pmi = (
        F.log(F.col("n").cast("double"))
        + F.log(F.col("t").cast("double"))
        - F.log(F.col("n_center").cast("double"))
        - F.log(F.col("n_context").cast("double"))
    )
    return j.select(
        "center",
        "context",
        "n",
        "n_center",
        "n_context",
        F.round(pmi, 6).alias("pmi"),
    )


def walk_skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """DeepWalk training pairs: skip-gram ``(center, context, n)``
    counts over a WALK corpus (rows ``(walk, step, node)`` as produced
    by operators/graph.random_walks) — the exact composition Perozzi
    et al. 2014 feed to word2vec: treat each walk as a sentence, pair
    nodes within a symmetric ±``window`` of steps.

    Plan: walks are SHORT (length+1 rows) so each is folded to one
    sorted array (per-walk collect_list — bounded by walk length, the
    same bound as the WL neighborhood fold), then the pair expansion
    is the same map-only in-row transform as skipgram_pairs and ONE
    count agg.  Steps within a walk are contiguous from 0, so array
    positions equal step values even for walks that stopped early at
    dangling nodes.  The oracle uses the positional self-join
    formulation — independent plan, same pair multiset.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = int(window)
    arr = walks.groupBy("walk").agg(
        F.sort_array(F.collect_list(F.struct("step", "node"))).alias("s")
    )
    pairs = F.explode(
        F.expr(
            f"""
            flatten(transform(sequence(0, size(s) - 1), i ->
              transform(
                filter(sequence(greatest(0, i - {w}),
                                least(size(s) - 1, i + {w})),
                       j -> j != i),
                j -> struct(s[i].node AS center,
                            s[j].node AS context))))
            """
        )
    )
    return (
        arr.filter(F.size("s") >= 2)
        .select(pairs.alias("pr"))
        .groupBy(
            F.col("pr.center").alias("center"),
            F.col("pr.context").alias("context"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def collocations_logdice(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """logDice collocation strength for adjacent token bigrams
    (Rychlý 2008, the Sketch Engine measure):

        logDice = 14 + log2(2·f_xy / (f_x + f_y))

    — the frequency-stable alternative to PMI (no low-frequency
    blowup, bounded above by 14).  Portability rides the PMI rule:
    log2(a/b) = (ln a − ln b)·(1/ln 2) with BOTH ln arguments exact
    integers (2·f_xy and f_x+f_y) and the 1/ln2 factor a repr-shared
    python-float literal — both engines run the identical IEEE chain.
    Bigrams from one in-row transform (map-only before the count
    aggs); output ordered by the deterministic (x, y) key."""
    import math

    from deepie_spark.functions.text import tokenize

    t = docs.select(tokenize(F.col(text_col)).alias("toks"))
    uni = t.select(F.explode("toks").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS x, toks[i + 1] AS y))"
                )
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("f_xy"))
        .filter(F.col("f_xy") >= min_count)
    )
    fx = uni.select(F.col("w").alias("x"), F.col("f").alias("f_x"))
    fy = uni.select(F.col("w").alias("y"), F.col("f").alias("f_y"))
    j = bg.join(fx, "x").join(fy, "y")
    inv_ln2 = F.lit(float(1.0 / math.log(2.0)))
    ld = F.lit(14.0) + (
        F.log((F.lit(2) * F.col("f_xy")).cast("double"))
        - F.log((F.col("f_x") + F.col("f_y")).cast("double"))
    ) * inv_ln2
    return j.select(
        "x", "y", "f_xy", "f_x", "f_y", F.round(ld, 6).alias("logdice")
    ).orderBy("x", "y")


def collocations_llr(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning (1993) log-likelihood-ratio collocation significance
    for adjacent token bigrams — the hypothesis-test companion to
    logDice/PMI (G² is χ²₁-distributed under independence, so it
    ranks rare-but-systematic pairs PMI over-rewards and logDice
    under-rewards):

        G² = 2 · Σ_cells k_ij · ln(k_ij·N / (R_i·C_j))

    over the 2×2 bigram contingency table with BIGRAM-EVENT marginals
    (R = bigrams with left word x, C = bigrams with right word y,
    N = all bigrams — the standard Dunning setup; reference DeepIE
    scores co-occurring pairs per sentence, rnnRE.py:564-581).

    Engine-portability rides the entity_cooccur_pmi rule: every ln
    argument is an EXACT-INTEGER product (k·N and R·C, each < 2⁶³ for
    N < 3·10⁹ bigrams — shard beyond), so both engines round the same
    libm value; the four cell terms are added in ONE fixed
    left-associative chain (never a cross-row FP sum), and zero cells
    contribute an exact 0.  Output ordered by the (x, y) key."""
    t = docs.select(tokenize(F.col(text_col)).alias("toks"))
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS x, toks[i + 1] AS y))"
                )
            ).alias("b")
        )
        .select("b.x", "b.y")
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("f_xy"))
    )
    lm = bg.groupBy("x").agg(F.sum("f_xy").cast("long").alias("r_x"))
    rm = bg.groupBy("y").agg(F.sum("f_xy").cast("long").alias("c_y"))
    nn = bg.agg(F.sum("f_xy").cast("long").alias("n_bigrams"))
    j = (
        bg.filter(F.col("f_xy") >= min_count)
        .join(lm, "x")
        .join(rm, "y")
        .crossJoin(F.broadcast(nn))
    )

    def term(k, r, c):
        # k·(ln(k·N) − ln(R·C)); the k=0 cell contributes exact 0
        return F.when(
            k > 0,
            k.cast("double")
            * (
                F.log((k * F.col("n_bigrams")).cast("double"))
                - F.log((r * c).cast("double"))
            ),
        ).otherwise(F.lit(0.0))

    k11 = F.col("f_xy")
    k12 = F.col("r_x") - F.col("f_xy")
    k21 = F.col("c_y") - F.col("f_xy")
    k22 = (
        F.col("n_bigrams") - F.col("r_x") - F.col("c_y") + F.col("f_xy")
    )
    nr = F.col("n_bigrams") - F.col("r_x")
    nc = F.col("n_bigrams") - F.col("c_y")
    g2 = F.lit(2.0) * (
        term(k11, F.col("r_x"), F.col("c_y"))
        + term(k12, F.col("r_x"), nc)
        + term(k21, nr, F.col("c_y"))
        + term(k22, nr, nc)
    )
    return j.select(
        "x",
        "y",
        "f_xy",
        "r_x",
        "c_y",
        "n_bigrams",
        F.round(g2, 6).alias("g2"),
    ).orderBy("x", "y")


def umass_coherence(
    occ: DataFrame,
    top_n: int = 10,
    doc_col: str = "doc_id",
    token_col: str = "token",
    scale_bits: int = 20,
) -> DataFrame:
    """UMass topic coherence (Mimno et al., EMNLP 2011) of the corpus
    head vocabulary: over the top-``top_n`` tokens by document
    frequency, Σ_{i<j} ln((D(w_i, w_j) + 1) / D(w_j)) with w_j the
    LOWER-ranked token of the pair — the standard intrinsic check
    that a token cluster actually co-occurs (near 0 = coherent,
    strongly negative = unrelated head terms).

    No rank index is materialized: rank order is exactly the
    (df DESC, token ASC) order, so "i < j" is the lexicographic
    predicate (df_a, token_a) ≻ (df_b, token_b) on the pair grid —
    windowless.  The top-n rides orderBy+limit
    (TakeOrderedAndProject); the n×n grid is a bounded broadcast
    cross join LEFT-joined to the co-document counts (absent pair →
    D=0, ln 1 exact).  Per-pair terms are fixed-point longs (both ln
    args exact integers), the total an order-free exact sum.

    Emits the n·(n−1)/2 pair rows (term audit) plus the cross-joined
    corpus coherence total."""
    scale = F.lit(float(1 << scale_bits))
    dt = (
        occ.select(F.col(doc_col).alias("d"), F.col(token_col).alias("t"))
        .distinct()
    )
    dfreq = dt.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    top = dfreq.orderBy(F.col("df").desc(), F.col("t").asc()).limit(top_n)
    a = top.select(F.col("t").alias("w_hi"), F.col("df").alias("df_hi"))
    b = top.select(F.col("t").alias("w_lo"), F.col("df").alias("df_lo"))
    grid = a.crossJoin(b).filter(
        (F.col("df_hi") > F.col("df_lo"))
        | ((F.col("df_hi") == F.col("df_lo")) & (F.col("w_hi") < F.col("w_lo")))
    )
    in_top = dt.join(
        F.broadcast(top.select(F.col("t"))), "t", "left_semi"
    )
    co = (
        in_top.alias("x")
        .join(in_top.alias("y"), F.col("x.d") == F.col("y.d"))
        .filter(F.col("x.t") != F.col("y.t"))
        .groupBy(F.col("x.t").alias("w_hi"), F.col("y.t").alias("w_lo"))
        .agg(F.count(F.lit(1)).cast("long").alias("d_co"))
    )
    terms = (
        grid.join(co, ["w_hi", "w_lo"], "left")
        .select(
            "w_hi",
            "w_lo",
            F.coalesce(F.col("d_co"), F.lit(0)).cast("long").alias("d_co"),
            F.col("df_lo").cast("long").alias("d_lo"),
        )
        .withColumn(
            "term_fp",
            F.floor(
                scale
                * (
                    F.log((F.col("d_co") + F.lit(1)).cast("double"))
                    - F.log(F.col("d_lo").cast("double"))
                )
            ).cast("long"),
        )
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("term_fp").cast("long").alias("coherence_fp"),
    )
    return terms.crossJoin(F.broadcast(tot)).select(
        "w_hi",
        "w_lo",
        "d_co",
        "d_lo",
        "term_fp",
        "n_pairs",
        "coherence_fp",
        F.round(F.col("coherence_fp") / scale, 6).alias("coherence"),
    )
