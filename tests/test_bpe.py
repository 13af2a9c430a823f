"""Distributed BPE training vs a pure-python reference trainer."""

import random
from collections import Counter

from pyspark.sql import functions as F

from deepie_spark.operators.bpe import apply_merge, bpe_train


def _py_bpe(words: Counter, k: int):
    vocab = {w: list(w) for w in words}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        a, b = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        merges.append((a, b))
        m = a + b
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_matches_python_reference(spark):
    rng = random.Random(23)
    alphabet = "abcde"
    words = Counter()
    for _ in range(300):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 8))
        )
        words[w] += rng.randint(1, 5)
    wc = spark.createDataFrame(
        list(words.items()), "word string, n long"
    )
    want_merges, want_vocab = _py_bpe(words, 6)
    # both paths — driver-local fast path AND distributed merge rounds —
    # must produce identical merges and segmentations
    for local_threshold in (500_000, None):
        got_merges, got_vocab = bpe_train(
            wc, 6, local_threshold=local_threshold
        )
        assert got_merges == want_merges, f"threshold={local_threshold}"
        got = {r["word"]: r["syms"] for r in got_vocab.collect()}
        assert got == want_vocab, f"threshold={local_threshold}"


def test_apply_merge_greedy_nonoverlapping(spark):
    """Overlap semantics (s1 == s2) is where naive matching and greedy
    BPE diverge: 'a a a' merges (0,1), never (1,2)."""
    df = spark.createDataFrame(
        [
            (["a", "a", "a"],),
            (["a", "a", "a", "a"],),
            (["b", "a", "a"],),
            (["a"],),
        ],
        "syms array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert out == [
        ["aa", "a"],
        ["aa", "aa"],
        ["b", "aa"],
        ["a"],
    ]


def test_bpe_reconstruction_invariant(spark):
    """Concatenating a word's symbols always reproduces the word, and
    merged symbols appear in later rounds' pair counts (compression
    monotonicity: total symbol count never increases)."""
    words = Counter({"banana": 4, "bandana": 2, "ananas": 3, "nab": 1})
    wc = spark.createDataFrame(list(words.items()), "word string, n long")
    _, vocab = bpe_train(wc, 3)
    rows = vocab.collect()
    for r in rows:
        assert "".join(r["syms"]) == r["word"]
        assert len(r["syms"]) <= len(r["word"])


def test_bpe_apply_reconstruction_and_oov(spark):
    """bpe_apply: concat of subword tokens (ordered by sub_pos) must
    reproduce every word — in-vocabulary words via their trained
    segmentation, OOV words via the character-split fallback."""
    from deepie_spark.operators.bpe import bpe_apply

    words = Counter({"banana": 4, "bandana": 2, "ananas": 3})
    wc = spark.createDataFrame(list(words.items()), "word string, n long")
    _, vocab = bpe_train(wc, 3)
    docs = spark.createDataFrame(
        [
            (1, 0, "banana"),
            (1, 1, "ananas"),
            (2, 0, "bandana"),
            (2, 1, "zebra"),  # OOV — char-split fallback
        ],
        "doc_id long, pos long, word string",
    )
    enc = bpe_apply(docs, vocab)
    rebuilt = {
        (r["doc_id"], r["pos"]): r["w2"]
        for r in enc.groupBy("doc_id", "pos", "word")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(
                    F.collect_list(F.struct("sub_pos", "token"))
                ).getField("token"),
            ).alias("w2")
        )
        .collect()
    }
    assert rebuilt == {
        (1, 0): "banana",
        (1, 1): "ananas",
        (2, 0): "bandana",
        (2, 1): "zebra",
    }
    # OOV fallback is the full character split
    zebra = sorted(
        (r["sub_pos"], r["token"])
        for r in enc.filter(F.col("word") == "zebra").collect()
    )
    assert [t for _, t in zebra] == list("zebra")


def test_bpe_fertility_rollup(spark):
    from __spark_entry__ import q_bpe_encode, q_bpe_fertility

    sf = "/root/testdata/sf0.001"
    fert = {r.source: r for r in q_bpe_fertility(spark, sf).collect()}
    enc = {r.doc_id: r for r in q_bpe_encode(spark, sf).collect()}
    import pandas as pd

    d = pd.read_parquet(f"{sf}/documents.parquet")
    for src, g in d.groupby("source"):
        ids = [i for i in g["doc_id"] if i in enc]
        words = sum(enc[i].n_words for i in ids)
        toks = sum(enc[i].n_tokens for i in ids)
        chars = int(g.set_index("doc_id").loc[ids, "n_chars"].sum())
        r = fert[src]
        assert (r.n_docs, r.words, r.tokens, r.chars) == (
            len(ids),
            words,
            toks,
            chars,
        )
        assert r.fertility == round(toks / words, 6)
        # BPE with few merges splits words: fertility >= 1
        assert r.fertility >= 1.0
