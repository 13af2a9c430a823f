import random

from pyspark.sql import functions as F

from deepie_spark.operators.lm import kn_continuation_counts


def _twin(docs):
    uni, bg = {}, set()
    for toks in docs:
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bg.add((a, b))
    out = {}
    for w, c in uni.items():
        out[w] = (
            c,
            sum(1 for a, b in bg if b == w),
            sum(1 for a, b in bg if a == w),
        )
    return out


def test_kn_counts_hand(spark):
    # "a b a b c" + "b c": c(b)=3, N1+(.b)={a}=1, N1+(b.)={a,c}=2
    docs = [(0, ["a", "b", "a", "b", "c"]), (1, ["b", "c"]), (2, ["x"])]
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {r.token: (r.c, r.n_left, r.n_right)
           for r in kn_continuation_counts(df).collect()}
    assert got == {
        "a": (2, 1, 1),   # b->a; a->b
        "b": (3, 1, 2),   # a->b; b->{a,c}
        "c": (2, 1, 0),   # b->c
        "x": (1, 0, 0),   # singleton doc: no bigrams
    }
    assert got == _twin([t for _, t in docs])


def test_kn_counts_random_python_twin(spark):
    rng = random.Random(61)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, [rng.choice(vocab) for _ in range(rng.randrange(0, 9))])
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    got = {r.token: (r.c, r.n_left, r.n_right)
           for r in kn_continuation_counts(df).collect()}
    assert got == _twin([t for _, t in docs])
    # partition invariance + the KN identity: sum of left continuation
    # counts == number of distinct bigrams == sum of right fan-outs
    assert sum(v[1] for v in got.values()) == sum(
        v[2] for v in got.values()
    )
    got2 = {r.token: (r.c, r.n_left, r.n_right)
            for r in kn_continuation_counts(df.repartition(7)).collect()}
    assert got2 == got


def test_kn_counts_no_window_no_collect(spark):
    docs = [(0, ["a", "b"]), (1, ["b", "a"])]
    df = spark.createDataFrame(docs, "doc_id long, toks array<string>")
    plan = kn_continuation_counts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_naive_bayes_separable_corpus(spark):
    """Disjoint per-class vocabularies -> every doc classified
    correctly; scores match a python twin with the same fixed-point
    quantization."""
    import math

    from deepie_spark.operators.lm import naive_bayes_classify

    docs = [
        (0, "en", "the cat sat"),
        (1, "en", "the dog ran"),
        (2, "de", "der hund lief"),
        (3, "de", "die katze sass"),
        (4, "en", "cat and dog"),
    ]
    occ = spark.createDataFrame(
        [(d, t) for d, _, txt in docs for t in txt.split()],
        "doc_id long, token string",
    )
    labels = spark.createDataFrame(
        [(d, l) for d, l, _ in docs], "doc_id long, label string"
    )
    out = {r.doc_id: r for r in naive_bayes_classify(occ, labels).collect()}
    assert all(out[d].correct for d, _, _ in docs)
    assert out[2].pred_label == "de" and out[0].pred_label == "en"

    # python twin of doc 0's winning score
    from collections import Counter

    tl = [(t, l) for d, l, txt in docs for t in txt.split()]
    ctc = Counter(tl)
    nc = Counter(l for _, l in tl)
    dc = Counter(l for _, l, _ in docs)
    v = len({t for t, _ in tl})
    scale = float(1 << 20)

    def score(doc_tokens, lbl):
        s = math.floor(scale * (math.log(float(dc[lbl]))
                                - math.log(float(len(docs)))))
        for t in doc_tokens:
            s += math.floor(scale * (
                math.log(float(ctc.get((t, lbl), 0) + 1))
                - math.log(float(nc[lbl] + v))))
        return s

    assert out[0].score_fp == score("the cat sat".split(), "en")


def test_naive_bayes_partition_invariance(spark):
    """Scores are exact longs: repartitioning changes nothing."""
    from deepie_spark.operators.lm import naive_bayes_classify

    occ = spark.createDataFrame(
        [(i, w) for i in range(12) for w in ("a", "b", f"w{i % 3}")],
        "doc_id long, token string",
    )
    labels = spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(12)], "doc_id long, label string"
    )
    a = {(r.doc_id, r.pred_label, r.score_fp)
         for r in naive_bayes_classify(occ, labels).collect()}
    b = {(r.doc_id, r.pred_label, r.score_fp)
         for r in naive_bayes_classify(
             occ.repartition(7), labels.repartition(3)).collect()}
    assert a == b


def test_absolute_discount_mass_is_one(spark):
    """Per head w1: Σ_seen P(w2|w1) + residual backoff mass == 1
    EXACTLY (in Fractions) — the defining property of interpolated
    absolute discounting."""
    from collections import Counter
    from fractions import Fraction

    from deepie_spark.operators.lm import absolute_discount_bigram

    docs = [
        "the cat sat on the mat".split(),
        "the dog sat on a log".split(),
        "a cat and a dog".split(),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)],
        "doc_id long, toks array<string>",
    )
    rows = absolute_discount_bigram(df).collect()
    bigr = Counter()
    for t in docs:
        for a, b in zip(t, t[1:]):
            bigr[(a, b)] += 1
    B = len(bigr)
    nl = Counter(b for (_, b) in bigr)
    for w1 in {a for (a, _) in bigr}:
        seen = [r for r in rows if r.w1 == w1]
        c1 = sum(bigr[(w1, b)] for (a, b) in bigr if a == w1)
        t1 = len(seen)
        assert all(r.c1 == c1 and r.t1 == t1 for r in seen)
        mass = sum(Fraction(r.num, r.den) for r in seen)
        seen_cont = sum(Fraction(nl[r.w2], B) for r in seen)
        backoff = Fraction(t1, 2 * c1) * (1 - seen_cont)
        assert mass + backoff == 1
        # python-twin the num/den of one row
        r0 = seen[0]
        assert r0.num == (2 * bigr[(w1, r0.w2)] - 1) * B + t1 * nl[r0.w2]
        assert r0.den == 2 * c1 * B


def test_heldout_loglik_vs_fractions(spark):
    import math
    from fractions import Fraction

    from deepie_spark.operators.lm import heldout_loglik

    train = spark.createDataFrame(
        [(1, "a b a c".split()), (2, "b a b".split())],
        ["doc_id", "toks"],
    )
    held = spark.createDataFrame(
        [(3, "a b z".split()), (4, "c a".split())],
        ["doc_id", "toks"],
    )
    row = heldout_loglik(train, held).collect()[0]
    # train bigrams: (a,b)x2, (b,a)x2, (a,c)x1 -> B=3
    # c1: a:(3,2), b:(2,1); nl2: b:1, a:1, c:1
    B = 3

    def p_obs(c12, c1, t1, nl2):
        return Fraction((2 * c12 - 1) * B + t1 * nl2, 2 * c1 * B)

    def p_backoff(c1, t1, nl2):
        return Fraction(t1 * nl2, 2 * c1 * B)

    # held bigrams: (a,b) obs; (b,z) OOV (z never continues);
    # (c,a) OOV (c unseen as w1)
    want_terms = [p_obs(2, 3, 2, 1)]
    assert row["n_scored"] == 1 and row["n_oov"] == 2
    want = sum(
        math.floor(
            (math.log(t.numerator) - math.log(t.denominator)) * 2**20
        )
        for t in want_terms
    )
    assert row["sum_ll_fp"] == want


def test_heldout_backoff_mass_scored(spark):
    from deepie_spark.operators.lm import heldout_loglik

    train = spark.createDataFrame(
        [(1, "a b".split()), (2, "c b".split()), (3, "a c".split())],
        ["doc_id", "toks"],
    )
    # (c, b)? observed. (a, b) observed. held (c, c): w1=c known,
    # w2=c continues (a->c) -> backoff-scored, not OOV
    held = spark.createDataFrame([(9, "c c".split())], ["doc_id", "toks"])
    row = heldout_loglik(train, held).collect()[0]
    assert row["n_scored"] == 1 and row["n_oov"] == 0
    assert row["sum_ll_fp"] < 0  # a probability < 1
