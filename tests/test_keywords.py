"""RAKE keyword extraction — hand-corpus twin and property checks."""

import math

import pytest


def test_rake_hand_corpus(spark):
    from deepie_spark.operators.keywords import rake_keywords

    # 'the' and 'of' are the two most frequent -> adaptive stoplist
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox of the lazy dog of the quick fox"),
            (2, "the quick brown fox of a lazy dog the end of a story"),
        ],
        ["doc_id", "text"],
    )
    out = rake_keywords(
        docs, n_stop=2, max_phrase_len=4, top_k=50
    ).collect()
    got = {r.phrase: r for r in out}

    # python twin
    toks = {
        1: "the quick brown fox of the lazy dog of the quick fox".split(),
        2: "the quick brown fox of a lazy dog the end of a story".split(),
    }
    from collections import Counter

    freq_all = Counter(t for ts in toks.values() for t in ts)
    stop = sorted(freq_all, key=lambda t: (-freq_all[t], t))[:2]
    assert set(stop) == {"the", "of"}
    phrases = []
    for ts in toks.values():
        run = []
        for t in ts + ["the"]:
            if t in stop:
                if 1 <= len(run) <= 4:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
    wfreq, wdeg = Counter(), Counter()
    for p in phrases:
        for w in p:
            wfreq[w] += 1
            wdeg[w] += len(p)
    SC = 1 << 20
    wsc = {w: (wdeg[w] * SC) // wfreq[w] for w in wfreq}
    exp = {}
    for p in set(phrases):
        text = " ".join(p)
        exp[text] = (
            len(p),
            sum(1 for q in phrases if q == p),
            sum(wsc[w] for w in p),
        )
    assert {k: (r.n_words, r.n_occ, r.score_fp) for k, r in got.items()} == exp
    for r in out:
        assert r.score == round(r.score_fp / float(SC), 6)
    # multi-word phrases outscore their single-word members
    assert got["quick brown fox"].score_fp > got["quick fox"].score_fp


def test_rake_validation_and_cap(spark):
    from deepie_spark.operators.keywords import rake_keywords

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j k")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError):
        rake_keywords(docs, n_stop=0)
    # no stop token inside the run -> one long run, dropped by the cap
    out = rake_keywords(docs, n_stop=1, max_phrase_len=4).collect()
    assert out == []


def test_kwic_windows(spark):
    """KWIC concordance: python twin + edge truncation + plan shape."""
    import pyspark.sql.functions as F

    from deepie_spark.operators.keywords import kwic_windows

    rows = [
        (1, "x a b c x d e".split()),   # interior + near-start hit
        (2, "x".split()),               # lone hit: both contexts empty
        (3, "a b c d e f x".split()),   # hit at the end: right empty
        (4, "a b".split()),             # no hit
    ]
    toks = spark.createDataFrame(rows, ["doc_id", "toks"])
    out = {
        (r.doc_id, r.pos): (r.left_ctx, r.term, r.right_ctx)
        for r in kwic_windows(toks, "x", width=3).collect()
    }

    exp = {}
    for doc_id, ts in rows:
        for pos, t in enumerate(ts):
            if t == "x":
                exp[(doc_id, pos)] = (
                    " ".join(ts[max(pos - 3, 0):pos]),
                    "x",
                    " ".join(ts[pos + 1:pos + 4]),
                )
    assert out == exp
    assert out[(2, 0)] == ("", "x", "")          # edge truncation
    assert out[(3, 6)] == ("d e f", "x", "")     # right edge
    assert out[(1, 0)] == ("", "x", "a b c")

    # map-only contract: no Exchange in the physical plan
    plan = (
        kwic_windows(toks, "x", width=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_texttile_boundaries_hand_doc(spark):
    """Two topical halves with disjoint vocab: the mid gap is a
    boundary (cohesion 0), intra-topic gaps are not; values match a
    python twin."""
    import math
    from collections import Counter

    import pyspark.sql.functions as F  # noqa: F401

    from deepie_spark.operators.keywords import texttile_boundaries

    topic1 = "cat dog cat bird dog cat cat bird dog cat".split()
    topic2 = "join scan hash join scan join hash scan join join".split()
    doc = topic1 + topic1 + topic2 + topic2   # blocks 0,1 | 2,3
    toks = spark.createDataFrame([(1, doc)], ["doc_id", "toks"])
    out = {
        r.gap: r
        for r in texttile_boundaries(toks, block=10).collect()
    }
    assert set(out) == {0, 1, 2}
    blocks = [doc[i * 10:(i + 1) * 10] for i in range(4)]
    for g in range(3):
        ca, cb = Counter(blocks[g]), Counter(blocks[g + 1])
        dot = sum(ca[t] * cb[t] for t in ca)
        na = sum(v * v for v in ca.values())
        nb = sum(v * v for v in cb.values())
        r = out[g]
        assert (r.dot, r.na, r.nb) == (dot, na, nb)
        assert r.cohesion == round(dot / math.sqrt(na * nb), 6)
        assert r.is_boundary == (4 * dot * dot < na * nb)
    assert out[1].is_boundary and out[1].cohesion == 0.0
    assert not out[0].is_boundary and not out[2].is_boundary

    import pytest

    with pytest.raises(ValueError):
        texttile_boundaries(toks, block=0)
