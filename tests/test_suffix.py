import random

from pyspark.sql import functions as F

from deepie_spark.operators.suffix import (
    corpus_chars,
    repeated_substring_pairs,
    suffix_array,
)


def _sa_twin(s):
    """Brute-force suffix ranks: rank = position in sorted suffix order."""
    order = sorted(range(len(s)), key=lambda i: s[i:])
    return {p: t for t, p in enumerate(order)}


def _lcp(a, b):
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def _chars_df(spark, s):
    return spark.createDataFrame(
        list(enumerate(s)), "gpos long, ch string"
    )


def test_suffix_array_banana(spark):
    s = "banana"
    got = {r.gpos: r.rank for r in suffix_array(_chars_df(spark, s)).collect()}
    assert got == _sa_twin(s)  # {5:0 'a', 3:1 'ana', 1:2 'anana', ...}


def test_suffix_array_random_twin(spark):
    rng = random.Random(67)
    s = "".join(rng.choice("abc") for _ in range(80))
    df = _chars_df(spark, s)
    got = {r.gpos: r.rank for r in suffix_array(df).collect()}
    assert got == _sa_twin(s)
    got2 = {r.gpos: r.rank
            for r in suffix_array(df.repartition(7)).collect()}
    assert got2 == got


def test_repeated_substring_pairs_twin(spark):
    rng = random.Random(71)
    # low-entropy string so real repeats exist
    s = "".join(rng.choice("ab") for _ in range(60))
    df = _chars_df(spark, s)
    ranks = _sa_twin(s)
    order = sorted(ranks, key=ranks.get)
    want = {}
    for pa, pb in zip(order, order[1:]):
        l = _lcp(s[pa:], s[pb:])
        if l >= 4:
            want[(pa, pb)] = l
    got = {(r.gpos_a, r.gpos_b): r.lcp
           for r in repeated_substring_pairs(df, min_len=4).collect()}
    assert got == want
    assert want  # the fixture actually has repeats


def test_repeated_pairs_detect_planted_duplicate(spark):
    # plant an exact 12-char duplication inside otherwise-unique text
    s = "0123456789" + "duplicated!!" + "qwertyuiop" + "duplicated!!" + "zx"
    df = _chars_df(spark, s)
    got = repeated_substring_pairs(df, min_len=12).collect()
    spans = {(min(r.gpos_a, r.gpos_b), max(r.gpos_a, r.gpos_b), r.lcp)
             for r in got}
    assert (10, 32, 12) in spans


def test_corpus_chars_offsets(spark):
    docs = [(0, "ab"), (1, "c"), (2, "de")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.gpos, r.ch) for r in corpus_chars(df, sep="|").collect()
    )
    assert got == list(enumerate("ab|c|de|"))
    # truncation
    got2 = sorted(
        (r.gpos, r.ch)
        for r in corpus_chars(df, max_chars=1, sep="|").collect()
    )
    assert got2 == list(enumerate("a|c|d|"))


def test_suffix_array_plan_no_global_window(spark):
    """Every window in the doubling rounds must carry the range-bucket
    key (the rank_in_order invariant) — no single-partition sort."""
    s = "abracadabra"
    df = _chars_df(spark, s)
    plan = suffix_array(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_bwt_banana_twin(spark):
    from deepie_spark.operators.suffix import bwt

    s = "banana"
    ranks = _sa_twin(s)
    order = sorted(ranks, key=ranks.get)
    want = {t: s[(p - 1) % len(s)] for t, p in enumerate(order)}
    got = {r.rank: r.ch for r in bwt(_chars_df(spark, s)).collect()}
    assert got == want
    # suffix-BWT of banana: suffixes a,ana,anana,banana,na,nana ->
    # preceding chars n,n,b,a(cyclic),a,a
    assert "".join(got[i] for i in range(6)) == "nnbaaa"


def test_distinct_substring_stats_twin(spark):
    import random

    from deepie_spark.operators.suffix import distinct_substring_stats

    rng = random.Random(73)
    s = "".join(rng.choice("ab") for _ in range(40))
    want_distinct = len({s[i:j] for i in range(len(s))
                         for j in range(i + 1, len(s) + 1)})
    row = distinct_substring_stats(_chars_df(spark, s)).collect()[0]
    assert row.n_chars == 40
    assert row.n_distinct_substrings == want_distinct
    assert row.total_lcp == 40 * 41 // 2 - want_distinct
