"""Positional inverted index + phrase search (operators/retrieval.py)."""

from pyspark.sql import functions as F

from deepie_spark.operators.retrieval import inverted_postings, phrase_search


def _occ(spark, docs):
    rows = []
    for d, text in docs:
        for p, t in enumerate(text.split()):
            rows.append((d, p, t))
    return spark.createDataFrame(rows, "doc_id long, pos long, token string")


def test_phrase_search_matches_naive_scan(spark):
    docs = [
        (1, "the cat sat on the cat sat mat"),
        (2, "cat sat cat sat cat"),   # overlapping occurrences
        (3, "the cat on sat"),        # tokens present, never consecutive
        (4, "a a a a"),               # self-overlapping phrase source
    ]
    occ = _occ(spark, docs)
    got = {
        (r["doc_id"], r["start"])
        for r in phrase_search(occ, ["cat", "sat"]).collect()
    }
    want = set()
    for d, text in docs:
        toks = text.split()
        for i in range(len(toks) - 1):
            if toks[i] == "cat" and toks[i + 1] == "sat":
                want.add((d, i))
    assert got == want and (2, 2) in got  # overlapping matches kept
    # self-overlapping phrase: every adjacent position matches
    got_aa = {
        (r["doc_id"], r["start"])
        for r in phrase_search(occ, ["a", "a"]).collect()
    }
    assert got_aa == {(4, 0), (4, 1), (4, 2)}
    # single-token phrase degenerates to the posting list
    got_one = {
        (r["doc_id"], r["start"])
        for r in phrase_search(occ, ["mat"]).collect()
    }
    assert got_one == {(1, 7)}


def test_inverted_postings_shape(spark):
    occ = _occ(spark, [(1, "b a b"), (2, "a")])
    got = {
        (r["token"], r["doc_id"]): (r["positions"], r["tf"])
        for r in inverted_postings(occ).collect()
    }
    assert got == {
        ("b", 1): ([0, 2], 2),
        ("a", 1): ([1], 1),
        ("a", 2): ([0], 1),
    }


def test_phrase_search_plan_pushes_token_filters(spark, sf_dir):
    """Each phrase term's equality filter must reach the scan side
    BEFORE any join (no post-join filtering of the full token stream),
    and the plan must contain no cartesian/BNLJ."""
    import __spark_entry__ as entry

    df = entry.q_phrase_search(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
