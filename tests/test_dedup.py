"""Deduplication operator tests (exact, Jaccard, MinHash+LSH, SimHash,
embedding cosine) against brute-force pure-python oracles.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.functions.text import BASE, MOD
from deepie_spark.operators.dedup import (
    _minhash_coeffs,
    dedup_exact,
    embedding_cosine_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (4, "completely different text about spark engines"),
    (5, "spark engines text about completely different"),  # permuted 4
    (6, "one more unrelated document with its own words"),
]


def poly_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * BASE + ord(c)) % MOD
    return h


def py_shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_dedup_exact_groups(docs_df):
    rows = dedup_exact(docs_df).collect()
    groups = {r["dup_key"]: (r["keep_id"], r["n_docs"]) for r in rows}
    assert groups[DOCS[0][1]] == (1, 2)  # docs 1 and 3, min id kept
    assert len(groups) == 5


def test_ngram_jaccard_matches_python(docs_df):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, threshold=0.0, k=3).collect()
    }
    sh = {i: py_shingles(t) for i, t in DOCS}
    for (a, b), j in got.items():
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        assert j == pytest.approx(inter / union, abs=1e-6)
    # exact dup pair has jaccard 1; near-dup is high; disjoint pairs absent
    assert got[(1, 3)] == pytest.approx(1.0)
    assert got[(1, 2)] > 0.6
    assert (1, 4) not in got  # no shared shingles → no join row


def test_ngram_jaccard_threshold(docs_df):
    got = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs_df, 0.8).collect()}
    assert (1, 3) in got
    assert (1, 2) not in got  # ~0.67 < 0.8


def test_minhash_signatures_match_python(docs_df):
    n_hashes = 16
    sigs = {
        r["id"]: list(r["sig"])
        for r in minhash_signatures(docs_df, n_hashes=n_hashes).collect()
    }
    coeffs = _minhash_coeffs(n_hashes)
    for doc_id, text in DOCS:
        hs = [poly_hash(s) for s in py_shingles(text)]
        want = [min((h * a + b) % MOD for h in hs) for a, b in coeffs]
        assert sigs[doc_id] == want
    # identical docs → identical signatures
    assert sigs[1] == sigs[3]


def test_minhash_lsh_candidates(docs_df):
    pairs = {
        (r["a"], r["b"]) for r in minhash_lsh_pairs(docs_df, 16, bands=4).collect()
    }
    assert (1, 3) in pairs          # exact dups always collide
    assert (1, 2) in pairs          # 0.67-jaccard near-dup: expected hit
    assert (1, 6) not in pairs      # unrelated docs don't collide
    assert all(a < b for a, b in pairs)


def test_simhash_fingerprints(docs_df):
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()}
    assert fps[1] == fps[3]  # identical token sets → identical fingerprint
    assert fps[4] == fps[5]  # simhash is order-insensitive (bag of tokens)
    assert fps[1] != fps[6]
    assert all(0 <= v < 2 ** 32 for v in fps.values())


def test_simhash_hamming_locality(docs_df):
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()}

    def ham(x, y):
        return bin(x ^ y).count("1")

    assert ham(fps[1], fps[2]) < ham(fps[1], fps[6])


def test_simhash_near_pairs_exact_recall(docs_df):
    """Banding with max_hamming < bands is lossless: candidates from
    band buckets + exact hamming filter == brute-force hamming pairs."""
    from deepie_spark.operators.dedup import simhash_near_pairs

    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs(
            docs_df, bits=32, bands=4, max_hamming=3
        ).collect()
    }
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs_df).collect()}
    want = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == 0  # identical docs


def test_embedding_cosine_pairs(spark):
    vecs = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # orthogonal
        (4, [1.0, 0.0, 0.0]),      # exact dup of 1
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_cosine_pairs(df, threshold=0.95).collect()
    }
    assert got[(1, 4)] == pytest.approx(1.0)
    assert got[(1, 2)] > 0.99
    assert (1, 3) not in got
    assert (2, 4) in got


def test_embedding_cosine_on_testdata(spark, sf_dir):
    emb = (
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") < 50)
    )
    rows = embedding_cosine_pairs(emb, threshold=0.0).collect()
    # verify a few against numpy
    pdf = emb.toPandas().set_index("vec_id")["embedding"]
    for r in rows[:20]:
        va = np.array(pdf[r["a"]], dtype=np.float64)
        vb = np.array(pdf[r["b"]], dtype=np.float64)
        want = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert r["cosine"] == pytest.approx(want, abs=1e-5)


def test_contamination_counts_vs_python_twin(spark):
    """contamination_counts == brute-force shingle intersection."""
    from deepie_spark.functions.text import py_tokenize
    from deepie_spark.operators.dedup import contamination_counts

    docs = [
        (0, "a b c d e"),          # benchmark
        (1, "a b c x y"),          # shares shingle 'a b c'
        (2, "x y z w v"),          # no overlap
        (3, "c d e a b c"),        # shares 'c d e' and 'a b c'
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") == 0)
    corpus = df.filter(F.col("doc_id") != 0)
    got = {
        r["doc_id"]: r["n_overlap"]
        for r in contamination_counts(corpus, bench, k=3).collect()
    }

    def sh(text, k=3):
        t = py_tokenize(text)
        if len(t) < k:
            return {" ".join(t)}
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    bset = sh(docs[0][1])
    want = {}
    for did, text in docs[1:]:
        n = len(sh(text) & bset)
        if n:
            want[did] = n
    assert got == want


def test_dup_ngram_window_rate_semantics(spark):
    from deepie_spark.operators.dedup import dup_ngram_window_rate

    w = [f"w{i}" for i in range(10)]          # 10 tokens → 3 windows of 8
    u = [f"u{i}" for i in range(10)]
    docs = [
        (1, " ".join(w)),                      # 3 windows
        (2, " ".join(w)),                      # exact dup of 1
        (3, " ".join(u)),                      # unique, but see doc 5
        (4, " ".join(w[2:])),                  # = window 3 of doc 1 only
        (5, " ".join(u[:8])),                  # = window 1 of doc 3
        (6, "a b c d e f g"),                  # 7 tokens → no windows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_rate"])
        for r in dup_ngram_window_rate(df, n=8).collect()
    }
    # python twin
    def wins(t):
        ts = t.split()
        return [" ".join(ts[i:i + 8]) for i in range(len(ts) - 7)]

    byd = {d: wins(t) for d, t in docs if len(t.split()) >= 8}
    from collections import Counter
    df_count = Counter()
    for d, ws in byd.items():
        for wn in set(ws):
            df_count[wn] += 1
    exp = {}
    for d, ws in byd.items():
        dup = sum(1 for wn in ws if df_count[wn] > 1)
        exp[d] = (len(ws), dup, round(dup / len(ws), 6))
    assert got == exp
    assert 6 not in got                       # short doc omitted
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0)
    assert got[4] == (1, 1, 1.0)
    assert got[3] == (3, 1, round(1 / 3, 6))  # only its first window shared
    assert got[5] == (1, 1, 1.0)


def test_dup_ngram_within_doc_repeat_not_dup(spark):
    """A window repeated WITHIN one doc but in no other doc is not a
    duplicate (document frequency, not occurrence count)."""
    from deepie_spark.operators.dedup import dup_ngram_window_rate

    t = " ".join([f"r{i % 8}" for i in range(16)])  # window repeats in-doc
    df = spark.createDataFrame(
        [(1, t), (2, "z1 z2 z3 z4 z5 z6 z7 z8")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["dup_rate"] for r in
           dup_ngram_window_rate(df, n=8).collect()}
    assert got == {1: 0.0, 2: 0.0}


def test_containment_pairs_doc_in_doc(spark):
    from deepie_spark.operators.dedup import containment_pairs

    article = "alpha beta gamma delta epsilon zeta eta theta"
    page = "nav header " + article + " footer links contact about"
    docs = [
        (1, article),          # fully embedded in 2
        (2, page),
        (3, "unrelated words entirely different from both docs here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): (
            r["inter"], r["n_a"], r["n_b"], r["cont_a"], r["cont_b"]
        )
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    sa, sb = py_shingles(article), py_shingles(page)
    inter = len(sa & sb)
    assert got == {
        (1, 2): (
            inter, len(sa), len(sb),
            round(inter / len(sa), 6), round(inter / len(sb), 6),
        )
    }
    # the whole point: containment of the article is 1.0 while the
    # symmetric jaccard would be far below any dedup threshold
    assert got[(1, 2)][3] == 1.0
    assert inter / (len(sa) + len(sb) - inter) < 0.6


def test_containment_threshold_filters(spark):
    from deepie_spark.operators.dedup import containment_pairs

    docs = [
        (1, "a b c d e f g h"),
        (2, "a b c x y z w q"),  # shares only 1 of 6 shingles with 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert containment_pairs(df, threshold=0.8).count() == 0
    low = containment_pairs(df, threshold=0.1).collect()
    assert len(low) == 1 and low[0]["inter"] == 1


def test_max_cluster_caps_pair_expansion(spark):
    """A 1,000-copy cluster is cluster-quadratic (≈500k pairs) without
    the cap; with max_cluster=m the expansion is bounded to pairs among
    each shingle's m smallest ids — here the whole cluster shares every
    shingle, so exactly C(m,2) pairs, each with exact inter/n/jaccard.
    Cap off ≡ old behavior (gated oracles never pass max_cluster)."""
    n = 1000
    text = "the quick brown fox jumps over the lazy dog again"
    docs = [(i, text) for i in range(n)]
    # a couple of non-cluster docs that must be unaffected by the cap
    docs += [(5000, "completely different words entirely here today"),
             (5001, "completely different words entirely here today")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    m = 10
    got = ngram_jaccard_pairs(
        df, threshold=0.8, max_df=None, max_cluster=m
    ).collect()
    cluster_pairs = {(r["a"], r["b"]) for r in got if r["a"] < n}
    assert cluster_pairs == {
        (a, b) for a in range(m) for b in range(a + 1, m)
    }
    for r in got:
        if r["a"] < n:
            assert r["jaccard"] == 1.0 and r["inter"] == r["n_a"]
    # the small exact-dup pair outside the cluster survives intact
    assert (5000, 5001) in {(r["a"], r["b"]) for r in got}


def test_sorted_neighborhood_candidates(spark):
    """Window-w blocking over the sorted key: each record pairs with
    its w-1 successors; near-identical records (same blocking key)
    always land in one window; candidate count is exactly
    (n-1) + (n-2) for w=3; invariant under repartitioning."""
    from deepie_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "alpha beta one"),
        (2, "alpha beta two"),      # same key as 1 → adjacent
        (3, "zulu omega x"),
        (4, "mike november y"),
        (5, "alpha beta three"),    # same key as 1,2
        (6, "zulu omega z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    key = F.concat_ws(" ", F.slice(F.split("text", r"\s+"), 1, 2))
    got = {
        (r["a"], r["b"], r["dist"])
        for r in sorted_neighborhood_pairs(df, key, window=3).collect()
    }
    n = len(rows)
    assert len(got) == (n - 1) + (n - 2)
    # sort order: (alpha beta: 1,2,5)(mike november: 4)(zulu omega: 3,6)
    assert (1, 2, 1) in got and (2, 5, 1) in got and (1, 5, 2) in got
    assert (3, 6, 1) in got
    got2 = {
        (r["a"], r["b"], r["dist"])
        for r in sorted_neighborhood_pairs(
            df.repartition(5), key, window=3
        ).collect()
    }
    assert got2 == got


def test_prefix_filter_equals_exact_jaccard(spark):
    """Prefix filtering is COMPLETE: its output must equal the
    unguarded exact all-pairs Jaccard join on any input."""
    import random

    from deepie_spark.operators.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for d in range(80):
        docs.append(
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
        )
    # inject near-dups: drop the first token of every 5th doc
    docs += [
        (1000 + d, t.split(" ", 1)[1])
        for d, t in docs
        if d % 5 == 0 and " " in t
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): (r["inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(df, threshold=0.5).collect()
    }
    want = {
        (r["a"], r["b"]): (r["inter"], r["n_a"], r["n_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.5, max_df=None).collect()
    }
    assert got == want and len(want) > 0


def test_prefix_filter_complete_at_boundary_t08(spark):
    """Completeness at threshold=0.8 with a J == t boundary pair whose
    shared shingles are globally COMMON (high df, so they sort to the
    END of the prefix order).  The float-(1−t) prefix length
    (⌊n·0.19999…⌋+1) is one short of the provable bound n−⌈t·n⌉+1 and
    would drop this pair; the exact formula keeps it."""
    from deepie_spark.operators.dedup import prefix_filter_jaccard_pairs

    shared = [f"s{i}" for i in range(10)]  # 8 shared shingles
    doc_b = " ".join(shared)  # n_b = 8, all shared
    doc_a = " ".join(shared + ["x1", "x2"])  # n_a = 10: 8 shared + 2 rare
    # filler docs re-use interior runs of the shared tokens (padded with
    # unique tokens so no filler pair reaches t) → shared shingles get
    # high df and sort AFTER doc A's two unique bridging shingles
    docs = [(1, doc_a), (2, doc_b)]
    for f in range(20):
        run = " ".join(shared[f % 5 : f % 5 + 5])
        docs.append((100 + f, f"u{f}a u{f}b {run} u{f}c u{f}d"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a"], r["b"]): (r["inter"], r["jaccard"])
        for r in prefix_filter_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert (1, 2) in got, "J==0.8 boundary pair dropped by prefix filter"
    assert got[(1, 2)] == (8, 0.8)
    want = {
        (r["a"], r["b"]): (r["inter"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, threshold=0.8, max_df=None).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# SymSpell deletion-neighborhood pairs
# ---------------------------------------------------------------------------


def _lev(a, b):
    """Classic Levenshtein (no transposition) — both engines' variant."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_symspell_pairs_complete_vs_naive(spark):
    import random

    from deepie_spark.operators.dedup import symspell_pairs

    rng = random.Random(19)
    base = ["spark", "shuffle", "hash", "join", "merge", "sort",
            "table", "scan"]
    vocab = set(base)
    # planted 1- and 2-edit variants: deletions, substitutions, inserts
    for w in base:
        i = rng.randrange(len(w))
        vocab.add(w[:i] + w[i + 1:])                     # dist 1
        vocab.add(w[:i] + "x" + w[i:])                   # dist 1
        vocab.add(("z" + w[:i] + w[i + 1:] + "q")[:12])  # dist ≤ 3
    vocab = sorted(v for v in vocab if v)
    df = spark.createDataFrame([(v,) for v in vocab], ["token"])
    for d in (1, 2):
        got = {
            (r.a, r.b, r.dist)
            for r in symspell_pairs(df, max_dist=d).collect()
        }
        want = {
            (a, b, _lev(a, b))
            for i, a in enumerate(vocab)
            for b in vocab[i + 1:]
            if _lev(a, b) <= d
        }
        assert got == want and want


def test_symspell_rejects_bad_depth(spark):
    import pytest as _pytest

    from deepie_spark.operators.dedup import symspell_pairs

    df = spark.createDataFrame([("a",)], ["token"])
    with _pytest.raises(ValueError):
        symspell_pairs(df, max_dist=3)


# ---------------------------------------------------------------------------
# content-defined chunking
# ---------------------------------------------------------------------------


def _py_cdc(text, min_len=16, max_len=128, divisor=64, window=16):
    BASE, MOD = 131, 2_147_483_647
    bw = pow(BASE, window, MOD)
    s, hw, hc, out = 0, 0, 0, []
    for p, ch in enumerate(text, 1):
        lag = ord(text[p - window - 1]) if p > window else 0
        hw = ((hw * BASE + ord(ch) - lag * bw) % MOD + MOD) % MOD
        hc = (hc * BASE + ord(ch)) % MOD
        if (p - s >= min_len and hw % divisor == 0) or p - s >= max_len:
            out.append((s + 1, p - s, hc))
            s, hc = p, 0
    if len(text) > s:
        out.append((s + 1, len(text) - s, hc))
    return out


def test_cdc_chunks_python_twin(spark):
    import random

    rng = random.Random(51)
    texts = [
        "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(1, 400)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    from deepie_spark.operators.dedup import cdc_chunks

    got = {}
    for r in cdc_chunks(df).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start, r.length, r.chunk_hash)
        )
    for i, t in enumerate(texts):
        want = [
            (j, st, ln, h) for j, (st, ln, h) in enumerate(_py_cdc(t))
        ]
        assert sorted(got.get(i, [])) == want, i


def test_cdc_boundaries_survive_prefix_edit(spark):
    """The defining CDC property: prepending text shifts only the
    EARLY boundaries — chunk hashes re-align downstream, so most
    chunks dedup against the unedited original (fixed-width blocks
    would share none)."""
    import random

    rng = random.Random(7)
    body = "".join(rng.choice("abcdefgh ") for _ in range(2000))
    edited = "ZZZ " + body
    a = {h for _, _, h in _py_cdc(body)}
    b = {h for _, _, h in _py_cdc(edited)}
    assert len(a & b) >= 0.8 * len(a)


def test_cdc_chunks_respect_length_bounds(spark):
    from deepie_spark.operators.dedup import cdc_chunks

    df = spark.createDataFrame(
        [(0, "x" * 1000)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df).collect()
    # reconstruction: contiguous, covers the doc
    rows = sorted(rows, key=lambda r: r.start)
    assert rows[0].start == 1
    for prev, cur in zip(rows, rows[1:]):
        assert cur.start == prev.start + prev.length
    assert rows[-1].start + rows[-1].length - 1 == 1000
    # every non-final chunk within [min,max]
    for r in rows[:-1]:
        assert 16 <= r.length <= 128


def test_lsh_calibration_buckets(spark):
    from __spark_entry__ import _LSH_SCURVE, q_lsh_calibration

    rows = q_lsh_calibration(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert 0 <= r.n_found <= r.n_true
        assert r.s_curve == round(_LSH_SCURVE[r.bucket], 6)
    # the theoretical curve itself is strictly increasing in s
    vals = [v for _, v in sorted(_LSH_SCURVE.items())]
    assert all(a < b or b == 1.0 for a, b in zip(vals, vals[1:]))


def test_cdc_dup_pairs_find_planted_duplicates(spark):
    """The planted near-dups (doc_id+1000000 = doc with the first
    token dropped) must surface as high-containment chunk-overlap
    pairs."""
    from __spark_entry__ import q_cdc_dup_pairs

    rows = q_cdc_dup_pairs(spark, "/root/testdata/sf0.001").collect()
    assert rows
    planted = {
        (r.a, r.b): (r.cont_a, r.cont_b)
        for r in rows
        if r.b == r.a + 1_000_000
    }
    assert planted  # at least some planted pairs found
    # edited copies share MOST chunks (boundary realignment)
    assert any(ca >= 0.5 or cb >= 0.5 for ca, cb in planted.values())
    for r in rows:
        assert 0 < r.shared <= min(r.n_a, r.n_b)


def test_golden_records_survivorship(spark):
    """Every cluster's survivor is its longest member (tie -> lowest
    doc_id) and first_source follows the min-doc member."""
    import __spark_entry__ as entry

    rows = {r.keep_id: r for r in entry.q_golden_records(
        spark, "/root/testdata/sf0.001").collect()}
    assert rows, "planted dups must cluster"
    dd = {r.doc_id: r.text for r in entry._docs_dups(
        spark, "/root/testdata/sf0.001").collect()}
    cl = entry.q_dedup_canonical(spark, "/root/testdata/sf0.001")
    members = {}
    for r in cl.collect():
        members.setdefault(r.keep_id, []).append(r.doc_id)
    for kid, g in rows.items():
        ms = members[kid]
        assert g.n_members == len(ms)
        best = max(ms, key=lambda d: (len(dd[d]), -d))
        assert g.survivor_doc == best
        assert g.survivor_len == len(dd[best])


def test_er_pairwise_prf_vs_bruteforce(spark):
    """Doubled pair counts equal itertools-combinations counts over
    the actual cluster and truth assignments at sf0.001."""
    from itertools import combinations

    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    r = entry.q_er_pairwise_prf(spark, sf).collect()[0]
    pred = {}
    for row in entry.q_dedup_canonical(spark, sf).collect():
        pred.setdefault(row.keep_id, set()).add(row.doc_id)
    truth = {}
    for row in entry._docs_dups(spark, sf).select("doc_id").collect():
        truth.setdefault(row.doc_id % 1_000_000, set()).add(row.doc_id)
    pred_pairs = {
        p for g in pred.values() for p in combinations(sorted(g), 2)
    }
    true_pairs = {
        p for g in truth.values() for p in combinations(sorted(g), 2)
    }
    assert r.pred_pairs2 == 2 * len(pred_pairs)
    assert r.true_pairs2 == 2 * len(true_pairs)
    assert r.tp_pairs2 == 2 * len(pred_pairs & true_pairs)
    assert r.pair_f1 == round(
        2 * r.tp_pairs2 / (r.pred_pairs2 + r.true_pairs2), 6
    )


def test_oph_signatures_python_twin(spark):
    from deepie_spark.operators.dedup import oph_signatures

    rows = [
        (1, "the quick brown fox jumps over the lazy dog end"),
        (2, "the quick brown fox jumps over the lazy dog end"),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sigs = {r.id: list(r.sig) for r in oph_signatures(df, 32, 3).collect()}
    assert all(len(s) == 32 for s in sigs.values())
    assert sigs[1] == sigs[2]  # identical docs -> identical sigs
    m13 = sum(1 for x, y in zip(sigs[1], sigs[3]) if x == y)
    assert m13 <= 4  # disjoint shingle sets: only chance collisions

    # python twin of binning + rotation densification on doc 1
    def poly(s):
        h = 0
        for ch in s:
            h = (h * 131 + ord(ch)) % 2147483647
        return h

    toks = rows[0][1].split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    bins = {}
    for s in shingles:
        h = poly(s)
        b = h % 32
        bins[b] = min(bins.get(b, 1 << 62), h // 32)
    sig = []
    for j in range(32):
        if j in bins:
            sig.append(bins[j])
        else:
            t = min(((b - j) % 32) for b in bins)
            sig.append(bins[(j + t) % 32] + t * (1 << 40))
    assert sigs[1] == sig
