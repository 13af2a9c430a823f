"""BM25 keyword retrieval over the tokenized corpus.

A KG-construction pipeline needs a retrieval primitive twice: to pull
candidate support passages for a (subj, pred, obj) triple during
verification, and to audit what the corpus says about an entity
(reference DeepIE scores relation candidates per sentence pair,
rnnRE.py:564-581; this is the corpus-level analogue for ad-hoc entity
queries).

Scoring is Lucene-variant Okapi BM25::

    idf(t)       = ln(1 + (N − df + 0.5) / (df + 0.5))
    score(d, t)  = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Engine-portability (the DuckDB oracle must reproduce every bit):

* ``idf`` is computed as ``ln(2N+2) − ln(2df+1)`` — both logarithm
  arguments are exact integers converted to double, so both engines
  hand libm the identical argument (same trick as cooccurrence_pmi,
  operators/graph.py).
* every other operation is +/·/÷ on doubles in an identical,
  fully-parenthesized evaluation order — IEEE-exact on both engines.
* the per-document total is NOT a ``sum()`` over an arbitrary row
  order (FP addition does not commute): per-term scores pivot into
  fixed columns and add in query-term order.

Scale plan at 10^12 docs: the term list is a literal (bounded), so the
per-term document-frequency table is broadcast; corpus-level N/avgdl
ride along as a broadcast 1-row aggregate (no driver action); tf is
one map-side-combinable aggregation over the exploded term matches —
the explode filters to query terms BEFORE the shuffle, so shuffle
volume is matches, not tokens.  Top-k goes through Spark's
TakeOrderedAndProject (per-partition heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """(doc_id, n_terms, score) for every document matching ≥ 1 query
    term; ``score`` is the exact double (caller rounds for display,
    orders on the unrounded value)."""
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks_col).cast("long").alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_len"),
    )
    # filter INSIDE the array before exploding: the explode emits only
    # query-term matches (a handful per doc), never the full token
    # stream — at 10^12 docs that is the difference between shuffling
    # matches and shuffling the corpus
    matches = F.filter(F.col(toks_col), lambda t: t.isin(terms))
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(matches).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    # idf: both ln arguments are exact integers widened to double
    idf = F.log(
        (F.lit(2) * F.col("n_docs") + F.lit(2)).cast("double")
    ) - F.log((F.lit(2) * F.col("df") + F.lit(1)).cast("double"))
    den = (
        F.col("tf").cast("double")
        + F.lit(k1 * (1.0 - b))
        + (
            F.lit(k1 * b)
            * F.col("dl").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("total_len").cast("double")
        )
    )
    s = idf * ((F.col("tf").cast("double") * F.lit(k1 + 1.0)) / den)
    scored = j.select("doc_id", "token", s.alias("s"))
    # fixed-order pivot-and-add: score = s(t0) + s(t1) + … in the
    # caller's term order on BOTH engines (FP adds don't commute)
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("token") == t, F.col("s"))), F.lit(0.0)
        ).alias(f"s_{i}")
        for i, t in enumerate(terms)
    ]
    g = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"), *per_term
    )
    total = F.col("s_0")
    for i in range(1, len(terms)):
        total = total + F.col(f"s_{i}")
    return g.select("doc_id", "n_terms", total.alias("score"))


def term_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    toks_col: str = "toks",
    max_df: int | None = 1000,
) -> DataFrame:
    """Vector-space near-dup pairs: cosine similarity between raw
    term-frequency vectors — the bag-of-words complement of shingle
    Jaccard (insensitive to word order, sensitive to frequency
    profile) that needs no embedding table.

    Engine-portability: weights are raw tf counts, so the dot product
    and both squared norms are EXACT integers aggregated in any order;
    the only floats are two IEEE-correctly-rounded sqrts and one
    divide — bit-identical on both engines (idf weighting would break
    this: a float sum over an arbitrary row order).

    Scale plan mirrors :func:`ngram_jaccard_pairs`: the self-join on
    the shared term is Θ(df²) per term, so terms above ``max_df`` are
    dropped from the DOT-PRODUCT stage only — norms keep the full
    vectors, understating (never inflating) hot-term similarity.  Both
    aggregations are map-side combinable."""
    tf = (
        docs.select(
            F.col(id_col).alias("id"), F.explode(toks_col).alias("token")
        )
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    norms = tf.groupBy("id").agg(
        F.sum(F.col("tf") * F.col("tf")).alias("n2")
    )
    probe = tf
    if max_df:
        rare = (
            tf.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("token")
        )
        probe = probe.join(rare, "token")
    a = probe.select(F.col("id").alias("a"), "token", F.col("tf").alias("tfa"))
    b = probe.select(F.col("id").alias("b"), "token", F.col("tf").alias("tfb"))
    dots = (
        a.join(b, "token")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("tfa") * F.col("tfb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("a"), F.col("n2").alias("n2_a"))
    nb = norms.select(F.col("id").alias("b"), F.col("n2").alias("n2_b"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("n2_a").cast("double"))
        * F.sqrt(F.col("n2_b").cast("double"))
    )
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .filter(cos >= threshold)
        .select("a", "b", "dot", "n2_a", "n2_b", F.round(cos, 6).alias("cosine"))
    )


def inverted_postings(
    occ: DataFrame,
    token_col: str = "token",
    id_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Positional inverted index: (token, doc_id, positions, tf).

    One groupBy over the token stream — linear, map-side combinable.
    Postings stay as per-(token, doc) ROWS, never per-term arrays: a
    stop term's full posting list at 10^12 docs would be an unbounded
    in-row array, while rows shard across partitions for free.
    Positions are sorted in-row so downstream intersection and phrase
    checks are deterministic."""
    return occ.groupBy(token_col, id_col).agg(
        F.array_sort(F.collect_list(F.col(pos_col))).alias("positions"),
        F.count("*").cast("long").alias("tf"),
    )


def phrase_search(
    occ: DataFrame,
    phrase: list[str],
    token_col: str = "token",
    id_col: str = "doc_id",
    pos_col: str = "pos",
) -> DataFrame:
    """Exact phrase matches via positional-postings intersection:
    (doc_id, start) for every occurrence of the consecutive token
    sequence ``phrase``.

    The classic positional-index query plan (Manning et al., IIR §2.4)
    restated as m−1 SEMI-joins: anchor on the first token's positions,
    then keep only anchors whose (doc, start+i) position carries token
    i.  Each join key (doc_id, start) is unique per side — 1:1 joins,
    no fan-out even on stop-word phrase terms; each term's filter
    prunes the scan BEFORE any shuffle (predicate pushdown visible in
    the plan).  Total work is O(Σ posting sizes of the phrase terms),
    independent of corpus size."""
    if not phrase:
        raise ValueError("phrase must be non-empty")
    base = occ.filter(F.col(token_col) == phrase[0]).select(
        F.col(id_col).alias("doc_id"), F.col(pos_col).alias("start")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = occ.filter(F.col(token_col) == t).select(
            F.col(id_col).alias("doc_id"),
            (F.col(pos_col) - F.lit(i)).alias("start"),
        )
        base = base.join(nxt, ["doc_id", "start"], "left_semi")
    return base


def rrf_fuse(
    lists: dict[str, DataFrame],
    const: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of top-k result
    lists: ``rrf(d) = Σ_list 1/(const + rank_list(d))``, the standard
    score-free hybrid-retrieval combiner (lexical BM25 + semantic
    cosine being THE pairing).  Each input is ``(id, score)``; ranks
    are 1-based by (score DESC, id) within each list; a document
    absent from a list contributes nothing and reports rank 0.

    Contract: inputs are TOP-K LISTS — bounded by construction (the
    oov_rate bounded-K precedent), so the per-list ranking window is
    over ≤k rows, never corpus-sized; fusing full corpora through
    this operator is a caller bug.  FP portability: each term is
    ``1/(const+rank)`` on exact integers and terms add in SORTED list-
    name order — a fixed-length, fixed-order double chain, identical
    IEEE ops on both engines (the BM25 convention).

    Output: ``(id_col, rank_<name>..., rrf)`` with names sorted.
    """
    from functools import reduce

    from pyspark.sql import Window as W

    ranked = []
    for name in sorted(lists):
        df = lists[name]
        w = W.orderBy(F.desc("score"), "id")
        ranked.append(
            df.select(
                F.col("id"),
                F.row_number().over(w).cast("long").alias(f"rank_{name}"),
            )
        )
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), ranked)
    rrf = None
    for name in sorted(lists):
        term = F.when(
            F.col(f"rank_{name}").isNotNull(),
            F.lit(1.0) / (F.lit(const) + F.col(f"rank_{name}")),
        ).otherwise(F.lit(0.0))
        rrf = term if rrf is None else rrf + term
    return joined.select(
        F.col("id").alias(id_col),
        *[
            F.coalesce(f"rank_{n}", F.lit(0)).cast("long")
             .alias(f"rank_{n}")
            for n in sorted(lists)
        ],
        F.round(rrf, 6).alias("rrf"),
    )


def mmr_rerank(
    emb: DataFrame,
    query_id: int,
    k: int = 5,
    pool: int = 30,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 40,
) -> DataFrame:
    """Maximal Marginal Relevance reranking (Carbonell & Goldstein,
    SIGIR 1998) with λ = 1/2: greedily pick ``k`` results from the
    top-``pool`` cosine candidates, each round maximizing
    ``relevance − max similarity to the already-picked set`` — the
    standard diversification pass between ANN retrieval and a RAG
    context window.

    Engine-portable by the fixed-point rule: relevance and pairwise
    similarity ride ``floor(cosine · 2^scale_bits)`` LONGS (the
    cosine expression is the ann_topk one — bit-identical in both
    engines — and floor of one more identical IEEE multiply stays
    identical), so every round's argmax compares exact integers with
    an id tie-break.  Returns (pick_rank, id, rel_fp, mmr_fp).

    Plan: one broadcast query row, one cosine pass +
    TakeOrderedAndProject for the pool (bounded), a pool² in-pool
    similarity table (broadcast-scale by construction), then k
    bounded rounds of one anti-join + max-agg + 1-row argmax with
    ``localCheckpoint`` (the greedy_max_coverage shape).
    """
    if k < 1 or pool < k:
        raise ValueError("need k >= 1 and pool >= k")
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    scale = F.lit(float(1 << scale_bits))

    def cos_fp(x, y):
        return F.floor(
            dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y))) * scale
        ).cast("long")

    q = v.filter(F.col("id") == query_id).select(
        F.col("v").alias("qv")
    )
    cand = (
        v.filter(F.col("id") != query_id)
        .crossJoin(F.broadcast(q))
        .select("id", "v", cos_fp(F.col("v"), F.col("qv")).alias("rel_fp"))
        .orderBy(F.col("rel_fp").desc(), F.col("id"))
        .limit(pool)
        .localCheckpoint(eager=True)
    )
    a = cand.select(F.col("id").alias("ia"), F.col("v").alias("va"))
    b = cand.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
    sims = (
        a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
        .select(
            "ia", "ib", cos_fp(F.col("va"), F.col("vb")).alias("sim_fp")
        )
        .localCheckpoint(eager=True)
    )
    pool_df = cand.select("id", "rel_fp")
    selected = None
    out = None
    for r in range(1, k + 1):
        remaining = (
            pool_df
            if selected is None
            else pool_df.join(selected, "id", "left_anti")
        )
        if selected is None:
            scored = remaining.select(
                "id", "rel_fp", F.col("rel_fp").alias("mmr_fp")
            )
        else:
            mx = (
                sims.join(
                    selected.withColumnRenamed("id", "ib"), "ib", "left_semi"
                )
                .groupBy(F.col("ia").alias("id"))
                .agg(F.max("sim_fp").alias("max_sim"))
            )
            scored = remaining.join(mx, "id").select(
                "id",
                "rel_fp",
                (F.col("rel_fp") - F.col("max_sim")).alias("mmr_fp"),
            )
        win = (
            scored.agg(
                F.min(
                    F.struct(
                        (-F.col("mmr_fp")).alias("ns"), F.col("id")
                    )
                ).alias("w")
            )
            .select(F.col("w.id").alias("id"))
            .where(F.col("id").isNotNull())
        )
        pick = (
            scored.join(F.broadcast(win), "id")
            .select(
                F.lit(r).alias("pick_rank"), "id", "rel_fp", "mmr_fp"
            )
            .localCheckpoint(eager=True)
        )
        out = pick if out is None else out.unionByName(pick)
        sel_new = pick.select("id")
        selected = (
            sel_new
            if selected is None
            else selected.unionByName(sel_new)
        ).localCheckpoint(eager=True)
    return out


def dirichlet_ql_scores(
    docs: DataFrame,
    terms: list[str],
    mu: int = 2000,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) over documents matching ≥ 1 query term::

        score(d) = Σ_t ln((tf + μ·cf_t/C) / (dl + μ))
                 = Σ_t [ln(tf·C + μ·cf_t) − ln(C·(dl + μ))]

    Engine-portability is the bm25_scores playbook: μ is an INTEGER,
    so both ln arguments are exact longs widened to double (libm gets
    the identical argument on both engines), and the per-term sum is
    a fixed written-order chain, never a row-order FP aggregate.
    Scale plan identical to bm25: literal term list → broadcast cf/df
    tables, explode filters to query-term matches before any shuffle.
    Docs with no match are not scored (the standard candidate-set
    convention); query terms absent from the corpus (cf = 0) are a
    caller error and yield NULL scores.
    """
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks_col).cast("long").alias("dl"),
    )
    stats = dl.agg(F.sum("dl").cast("long").alias("c_len"))
    matches = F.filter(F.col(toks_col), lambda t: t.isin(terms))
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(matches).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cf = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("cf"))
    cfs = cf.agg(
        *[
            F.max(F.when(F.col("token") == t, F.col("cf"))).alias(f"cf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    g = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    j = (
        g.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(cfs))
    )
    mu_l = F.lit(int(mu))
    base = F.log(
        (F.col("c_len") * (F.col("dl") + mu_l)).cast("double")
    )
    total = None
    for i in range(len(terms)):
        term = (
            F.log(
                (
                    F.col(f"tf_{i}") * F.col("c_len")
                    + mu_l * F.col(f"cf_{i}")
                ).cast("double")
            )
            - base
        )
        total = term if total is None else total + term
    return j.select("doc_id", "n_terms", "dl", total.alias("score"))


def ndcg_at_k(
    scored: DataFrame,
    k: int = 10,
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """NDCG@k of a ranking against integer relevance labels: DCG =
    Σ_{i≤k} rel_i / log2(i+1) with the discounts 1/log2(i+1)
    precomputed as repr-shared python-float literals (both engines
    multiply the identical doubles) and the position sum a FIXED
    left-associative chain, never a row-order FP aggregate.  The
    ranking and the ideal ranking are both top-k via
    TakeOrderedAndProject ((score desc, id) / (rel desc, id) —
    deterministic tie-breaks); the only window is over the ≤k-row
    top slices (the lorenz_deciles bounded-input precedent).  NULL
    ndcg when every candidate has zero relevance (idcg exactly 0.0 —
    a sum of exact zero products)."""
    import math

    from pyspark.sql import Window as W

    disc = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]

    def _top_chain(df, order, prefix):
        top = df.orderBy(*order).limit(k)
        w = W.orderBy(*order)
        # ≤k rows — bounded keyless window, the lorenz precedent
        ranked = top.select(
            F.row_number().over(w).alias("_r"),
            F.col(rel_col).cast("long").alias("_rel"),
        )
        cols = [
            F.coalesce(
                F.max(F.when(F.col("_r") == i + 1, F.col("_rel"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"{prefix}{i}")
            for i in range(k)
        ]
        return ranked.agg(*cols)

    dcg_row = _top_chain(
        scored, [F.desc(score_col), F.col(id_col)], "g_"
    )
    ideal_row = _top_chain(
        scored, [F.desc(rel_col), F.col(id_col)], "h_"
    )
    n = scored.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))

    def _chain(prefix):
        tot = None
        for i in range(k):
            term = F.col(f"{prefix}{i}").cast("double") * F.lit(disc[i])
            tot = term if tot is None else tot + term
        return tot

    j = dcg_row.crossJoin(F.broadcast(ideal_row)).crossJoin(
        F.broadcast(n)
    )
    dcg, idcg = _chain("g_"), _chain("h_")
    return j.select(
        F.lit(k).alias("k"),
        "n_candidates",
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(idcg != 0.0, F.round(dcg / idcg, 6)).alias("ndcg"),
    )


def map_at_k(
    per_query: list,
    k: int = 10,
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Average precision at k per query (binary relevance) — the
    set-retrieval evaluation beside ndcg_at_k's graded one.

    ``per_query`` is a list of (query_id, candidates-DataFrame) with a
    BOUNDED number of queries (an evaluation set is dozens, never
    corpus-sized), so each query's top-k goes through its own
    TakeOrderedAndProject ((score desc, id) tie-broken) and the unions
    are q·k rows — broadcast-sized at any corpus scale.

    Exactness: AP@k = Σ_{i≤k, rel_i=1} (c_i/i) / min(R, k) with
    c_i = # relevant in the top i.  Every c_i/i is scaled by
    L = lcm(1..k) (2520 for k=10): ap_num = Σ rel_i·c_i·(L/i) is an
    EXACT long (i divides L), the denominator L·min(R,k) is an exact
    long, and AP is one IEEE divide — no FP accumulation anywhere.
    The rank/cum-rel window is per-query over ≤k rows (the lorenz
    bounded-window precedent)."""
    import math

    from pyspark.sql import Window as W

    lcm = 1
    for i in range(1, k + 1):
        lcm = lcm * i // math.gcd(lcm, i)
    tops = None
    stats = None
    for qid, df in per_query:
        t = (
            df.orderBy(F.desc(score_col), F.col(id_col))
            .limit(k)
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("_id"),
                F.col(rel_col).cast("long").alias("_rel"),
                F.col(score_col).alias("_score"),
            )
        )
        s = df.agg(
            F.lit(qid).alias("query_id"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.coalesce(F.sum(F.col(rel_col).cast("long")), F.lit(0))
            .cast("long")
            .alias("r_total"),
        )
        tops = t if tops is None else tops.unionByName(t)
        stats = s if stats is None else stats.unionByName(s)
    w = W.partitionBy("query_id").orderBy(F.desc("_score"), F.col("_id"))
    ranked = tops.select(
        "query_id",
        "_rel",
        F.row_number().over(w).cast("long").alias("_i"),
        F.sum("_rel")
        .over(
            W.partitionBy("query_id")
            .orderBy(F.desc("_score"), F.col("_id"))
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("_c"),
    )
    num = ranked.groupBy("query_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_rel") == 1,
                    F.col("_c") * F.expr(f"{lcm} div _i"),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("ap_num")
    )
    j = stats.join(num, "query_id", "left").select(
        "query_id",
        "n_candidates",
        "r_total",
        F.coalesce(F.col("ap_num"), F.lit(0)).cast("long").alias("ap_num"),
        (F.lit(lcm) * F.least(F.col("r_total"), F.lit(k)))
        .cast("long")
        .alias("ap_den"),
    )
    return j.select(
        "query_id",
        "n_candidates",
        "r_total",
        "ap_num",
        "ap_den",
        F.when(
            F.col("ap_den") > 0,
            F.round(F.col("ap_num") / F.col("ap_den"), 6),
        ).alias("ap"),
    ).orderBy("query_id")


def mrr_at_k(
    per_query: list,
    k: int = 10,
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal rank at k per evaluation query — the
    first-hit-position metric beside map_at_k (AP) and ndcg_at_k
    (graded gain): rr = 1/rank of the FIRST relevant result in the
    (score desc, id)-tie-broken top-k, 0 if none lands in the cut.

    Exactness: the first-relevant rank is an exact integer (min over
    ranks of relevant rows), so rr is ONE IEEE divide of exact longs;
    no FP accumulation, no pow/ln.  Same bounded per-query
    TakeOrderedAndProject shape as map_at_k — q·k rows total."""
    from pyspark.sql import Window as W

    tops = None
    for qid, df in per_query:
        t = (
            df.orderBy(F.desc(score_col), F.col(id_col))
            .limit(k)
            .select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("_id"),
                F.col(rel_col).cast("long").alias("_rel"),
                F.col(score_col).alias("_score"),
            )
        )
        tops = t if tops is None else tops.unionByName(t)
    w = W.partitionBy("query_id").orderBy(F.desc("_score"), F.col("_id"))
    ranked = tops.select(
        "query_id", "_rel", F.row_number().over(w).cast("long").alias("_i")
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.min(F.when(F.col("_rel") == 1, F.col("_i"))).alias(
                "first_rel_rank"
            )
        )
        .select(
            "query_id",
            "first_rel_rank",
            F.when(
                F.col("first_rel_rank").isNotNull(),
                F.round(F.lit(1.0) / F.col("first_rel_rank"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("rr"),
        )
        .orderBy("query_id")
    )


def postings_compression(
    postings: DataFrame,
    token_col: str = "token",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Varint delta-encoding size audit of the inverted index
    (inverted_postings' storage planner): per token, sort its doc-id
    posting list, delta-encode (first gap = doc_id + 1, so every gap
    is ≥ 1), and price each gap at the LEB128 varint width
    (1 byte < 2⁷, 2 < 2¹⁴, 3 < 2²¹, 4 < 2²⁸, else 5) — the classic
    index-compression estimate (Zobel & Moffat 2006) that decides
    whether hot postings fit cache.  Exact integer byte counts; the
    ratio is one IEEE divide.

    Plan: one token-KEYED lag window (posting lists are per-token
    bounded in df; never single-partition) + one hash agg."""
    from pyspark.sql import Window as W

    w = W.partitionBy("t").orderBy("d")
    p = postings.select(
        F.col(token_col).alias("t"), F.col(doc_col).cast("long").alias("d")
    ).distinct()
    delta = F.coalesce(
        F.col("d") - F.lag("d").over(w), F.col("d") + F.lit(1)
    ).cast("long")
    vb = (
        F.when(delta < F.lit(1 << 7), 1)
        .when(delta < F.lit(1 << 14), 2)
        .when(delta < F.lit(1 << 21), 3)
        .when(delta < F.lit(1 << 28), 4)
        .otherwise(5)
        .cast("long")
    )
    return (
        p.select("t", vb.alias("vb"))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_postings"),
            F.sum("vb").cast("long").alias("varint_bytes"),
        )
        .select(
            F.col("t").alias(token_col),
            "n_postings",
            (F.col("n_postings") * 8).cast("long").alias("raw_bytes"),
            "varint_bytes",
            F.round(
                F.col("varint_bytes") / (F.col("n_postings") * 8), 6
            ).alias("compression_ratio"),
        )
    )


def jm_ql_scores(
    docs: DataFrame,
    terms: list[str],
    lam_num: int = 1,
    lam_den: int = 2,
    id_col: str = "doc_id",
    toks_col: str = "toks",
) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer smoothing (Zhai
    & Lafferty 2004 — the fixed-interpolation companion of
    dirichlet_ql_scores, preferred for verbose queries)::

        score(d) = Σ_t ln((1−λ)·tf/dl + λ·cf_t/C)
                 = Σ_t [ln((den−num)·tf·C + num·cf_t·dl)
                        − ln(den·dl·C)]

    for λ = num/den rational, so BOTH ln arguments are exact longs
    (identical libm inputs both engines) and the per-term sum is a
    fixed written-order chain — the bm25/dirichlet portability
    playbook.  Same candidate convention as dirichlet: docs matching
    ≥ 1 query term are scored over ALL terms (tf = 0 terms contribute
    the background mass).  Long bound: tf·C < 2⁶³ caps corpus tokens
    at ~3·10⁹ per exact-gated run (the dirichlet bound) — beyond
    that the args widen to double and the gate becomes tolerance."""
    if not (0 < lam_num < lam_den):
        raise ValueError("need 0 < lam_num < lam_den")
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks_col).cast("long").alias("dl"),
    )
    stats = dl.agg(F.sum("dl").cast("long").alias("c_len"))
    matches = F.filter(F.col(toks_col), lambda t: t.isin(terms))
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(matches).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cf = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("cf"))
    cfs = cf.agg(
        *[
            F.max(F.when(F.col("token") == t, F.col("cf"))).alias(f"cf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    g = tf.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("tf"))), F.lit(0)
            )
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    j = (
        g.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(cfs))
    )
    keep = F.lit(int(lam_den - lam_num))
    mix = F.lit(int(lam_num))
    base = F.log(
        (F.lit(int(lam_den)) * F.col("dl") * F.col("c_len")).cast("double")
    )
    total = None
    for i in range(len(terms)):
        term = (
            F.log(
                (
                    keep * F.col(f"tf_{i}") * F.col("c_len")
                    + mix * F.col(f"cf_{i}") * F.col("dl")
                ).cast("double")
            )
            - base
        )
        total = term if total is None else total + term
    return j.select("doc_id", "n_terms", "dl", total.alias("score"))


def borda_fuse(
    lists: dict[str, DataFrame],
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Borda-count rank fusion of top-k result lists (the positional
    voting rule — Aslam & Montague 2001 brought it to metasearch):
    a document at rank r in a list earns k+1−r points, absent-or-
    beyond-k earns 0, and lists add.  The PURE-INTEGER companion of
    rrf_fuse — zero FP anywhere, so the gate is exact by
    construction.

    Same contract as rrf_fuse: inputs are bounded TOP-K LISTS of
    ``(id, score)``; ranks are 1-based by (score DESC, id) within
    each ≤k-row list (never a corpus-sized window).

    Output: ``(id_col, rank_<name>..., borda)`` with names sorted."""
    from functools import reduce

    from pyspark.sql import Window as W

    ranked = []
    for name in sorted(lists):
        df = lists[name]
        w = W.orderBy(F.desc("score"), "id")
        ranked.append(
            df.select(
                F.col("id"),
                F.row_number().over(w).cast("long").alias(f"rank_{name}"),
            )
        )
    joined = reduce(lambda a, b: a.join(b, "id", "full_outer"), ranked)
    borda = None
    for name in sorted(lists):
        r = F.col(f"rank_{name}")
        pts = F.when(
            r.isNotNull() & (r <= k), F.lit(k + 1) - r
        ).otherwise(F.lit(0))
        borda = pts if borda is None else borda + pts
    return joined.select(
        F.col("id").alias(id_col),
        *[
            F.coalesce(f"rank_{n}", F.lit(0)).cast("long")
             .alias(f"rank_{n}")
            for n in sorted(lists)
        ],
        borda.cast("long").alias("borda"),
    )


def rbo_at_k(
    a_scored: DataFrame,
    b_scored: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Truncated rank-biased overlap (Webber, Moffat & Zobel 2010) at
    persistence p = 1/2 between two rankings of the same candidates:

        RBO@k = (1 − p) · Σ_{d=1..k} p^{d−1} · X_d / d

    with X_d the EXACT overlap of the two depth-d prefixes.  The two
    top slices come from TakeOrderedAndProject ((score desc, id)
    deterministic tie-break); positions attach via the ≤k-row bounded
    keyless window (the ndcg precedent); X_d for every d falls out of
    ONE id-equi-join — a matched id contributes to all depths
    ≥ max(rank_a, rank_b) — pivoted to fixed columns so the weighted
    sum is a left-associative chain of repr-shared dyadic p-powers
    (p = 1/2 keeps every weight an exact double).

    Output: one row (k, x1..xk, rbo)."""
    from pyspark.sql import Window as W

    def top(df, pfx):
        order = [F.desc(score_col), F.col(id_col)]
        t = df.orderBy(*order).limit(k)
        w = W.orderBy(*order)
        return t.select(
            F.col(id_col).alias("id"),
            F.row_number().over(w).cast("long").alias(f"{pfx}r"),
        )

    ra, rb = top(a_scored, "a"), top(b_scored, "b")
    m = ra.join(rb, "id").select(
        F.greatest("ar", "br").alias("d")
    )
    x = m.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("d") <= dd, 1).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias(f"x{dd}")
            for dd in range(1, k + 1)
        ]
    )
    chain = None
    for dd in range(1, k + 1):
        w_d = 0.5 ** (dd - 1)
        term = (
            F.col(f"x{dd}").cast("double")
            * F.lit(w_d)
            / F.lit(float(dd))
        )
        chain = term if chain is None else chain + term
    return x.select(
        F.lit(k).cast("long").alias("k"),
        *[f"x{dd}" for dd in range(1, k + 1)],
        F.round(F.lit(0.5) * chain, 6).alias("rbo"),
    )


def err_at_k(
    scored: DataFrame,
    k: int = 10,
    rel_col: str = "rel",
    score_col: str = "score",
    id_col: str = "doc_id",
    g_max: int = 3,
) -> DataFrame:
    """Expected reciprocal rank (Chapelle et al. 2009) at k over
    graded relevance g ∈ 0..g_max:

        ERR = Σ_{i≤k} (1/i) · R_i · Π_{j<i} (1 − R_j),
        R = (2^g − 1) / 2^g_max

    The cascade probabilities R are DYADIC rationals (exact doubles),
    so the running "user survives to position i" product is exact;
    the only rounding steps are the 1/i divides — identical IEEE
    chains in both engines.  The top slice is TakeOrderedAndProject
    ((score desc, id)) with positions off the ≤k-row bounded keyless
    window and relevance pivoted to fixed columns (the ndcg
    pattern).

    Output: one row (k, n_candidates, err)."""
    from pyspark.sql import Window as W

    order = [F.desc(score_col), F.col(id_col)]
    top = scored.orderBy(*order).limit(k)
    w = W.orderBy(*order)
    ranked = top.select(
        F.row_number().over(w).alias("_r"),
        F.col(rel_col).cast("long").alias("_g"),
    )
    piv = ranked.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("_r") == i + 1, F.col("_g"))),
                F.lit(0),
            )
            .cast("long")
            .alias(f"g_{i}")
            for i in range(k)
        ]
    )
    denom = float(1 << g_max)
    rmap = {g: ((1 << g) - 1) / denom for g in range(g_max + 1)}

    def r_of(col):
        expr = F.when(col <= 0, F.lit(0.0))
        for g in range(1, g_max + 1):
            expr = expr.when(col == g, F.lit(rmap[g]))
        return expr.otherwise(F.lit(rmap[g_max]))

    carry = F.lit(1.0)
    err = None
    for i in range(k):
        ri = r_of(F.col(f"g_{i}"))
        term = carry * ri / F.lit(float(i + 1))
        err = term if err is None else err + term
        carry = carry * (F.lit(1.0) - ri)
    n = scored.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    return piv.crossJoin(F.broadcast(n)).select(
        F.lit(k).cast("long").alias("k"),
        "n_candidates",
        F.round(err, 6).alias("err"),
    )
