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
