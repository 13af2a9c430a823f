"""Web-pipeline operator tests: intra-doc repetition, PII scrubbing,
per-domain stats (training-data pipeline surface; each also has a
DuckDB oracle via __spark_entry__).
"""

import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from deepie_spark.functions.text import (
    PII_EMAIL,
    PII_IPV4,
    PII_PHONE,
    pii_counts,
    scrub_pii,
)


def test_pii_scrub_redacts_everything(spark):
    rows = [
        (1, "mail me at a.b+c@ex-am.ple.org today"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1-555-0100 or +44-20-7946-0958 now"),
        (4, "clean text with no identifiers at all"),
        (5, "combo x@y.io 8.8.8.8 +1-555-9999"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = pii_counts(F.col("text"))
    got = df.select(
        "doc_id",
        c["n_emails"].alias("e"),
        c["n_ipv4"].alias("i"),
        c["n_phones"].alias("p"),
        scrub_pii(F.col("text")).alias("red"),
    ).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert (by_id[1]["e"], by_id[2]["i"], by_id[3]["p"]) == (1, 2, 2)
    assert by_id[4]["red"] == rows[3][1]  # untouched
    assert by_id[5]["red"] == "combo <EMAIL> <IP> <PHONE>"
    # nothing matching the patterns survives any redacted text
    survivors = df.select(scrub_pii(F.col("text")).alias("red")).filter(
        F.col("red").rlike(PII_EMAIL)
        | F.col("red").rlike(PII_IPV4)
        | F.col("red").rlike(PII_PHONE)
    )
    assert survivors.count() == 0


def test_repetition_scores_bounds_and_extremes(spark, sf_dir):
    out = entry.q_repetition_scores(spark, sf_dir).collect()
    assert len(out) == 500
    for r in out:
        assert r["n_distinct"] <= r["n_tri"]
        assert 0 < r["distinct_ratio"] <= 1.0
        assert 0 < r["top_fraction"] <= 1.0
    # a fully-repetitive doc pins top_fraction to 1
    rep = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "w x y z q r s t")],
        "doc_id long, text string",
    )
    import tempfile

    d = tempfile.mkdtemp()
    rep.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: r for r in entry.q_repetition_scores(spark, d).collect()
    }
    assert got[1]["n_distinct"] == 2      # 'a b a' / 'b a b' alternate
    assert got[2]["distinct_ratio"] == 1.0


def test_domain_stats_matches_source_partition(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["domain"]: r["n_docs"]
        for r in entry.q_domain_stats(spark, sf_dir).collect()
    }
    assert got == {f"{s}.example.com": n for s, n in want.items()}


def test_sequence_pack_invariants(spark, sf_dir):
    out = entry.q_sequence_pack(spark, sf_dir).collect()
    assert len(out) == 500
    from collections import defaultdict

    by_window = defaultdict(list)
    for r in out:
        by_window[r["window_id"]].append((r["doc_id"], r["n_tokens"]))
    budget = entry._PACK_BUDGET
    for wid, docs in by_window.items():
        total = sum(n for _, n in docs)
        # streaming packer: a window exceeds the budget by at most the
        # straddling doc (window boundary decided by the cumsum BEFORE)
        assert total < budget + max(n for _, n in docs)
        # windows hold contiguous doc_id runs within their block
        ids = sorted(d for d, _ in docs)
        assert ids == list(range(ids[0], ids[-1] + 1))


def test_corpus_quantiles_ordering(spark, sf_dir):
    r = entry.q_corpus_quantiles(spark, sf_dir).collect()[0]
    assert r["chars_p50"] <= r["chars_p90"] <= r["chars_p99"]
    assert r["tokens_p50"] <= r["tokens_p90"] <= r["tokens_p99"]


def test_normalize_url_examples(spark):
    """Canonicalization unit cases: fragment, tracking params, param
    order, host case, trailing slash (functions/web.py)."""
    from deepie_spark.functions.web import normalize_url

    cases = [
        ("HTTPS://Example.COM/Path/?utm_source=x&b=2&a=1#f",
         "https://example.com/Path?a=1&b=2"),
        ("https://example.com/doc/1#sec", "https://example.com/doc/1"),
        ("https://example.com/doc/2?gclid=abc", "https://example.com/doc/2"),
        ("https://example.com/doc/2?fbclid=zz&x=1",
         "https://example.com/doc/2?x=1"),
        ("https://example.com/", "https://example.com"),
        ("https://example.com", "https://example.com"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "u string")
    got = [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_normalize_url_random_twin(spark):
    """Randomized adversarial urls (multiple '#', '?' in fragments,
    mixed-case schemes/hosts, tracking params in every position) vs a
    pure-python twin of the documented steps."""
    import re

    from deepie_spark.functions.web import TRACKING_PREFIXES, normalize_url

    def py_norm(u):
        no_frag = u.split("#", 1)[0]
        parts = no_frag.split("?", 1)
        base, query = parts[0], parts[1] if len(parts) > 1 else ""
        m = re.match(r"^([A-Za-z]+://[^/]*)", base)
        host = m.group(1) if m else ""
        rest = re.sub(r"^[A-Za-z]+://[^/]*", "", base)
        rest = re.sub(r"/$", "", rest)
        cleaned = host.lower() + rest
        params = sorted(
            p for p in query.split("&")
            if p and not any(p.startswith(pre) for pre in TRACKING_PREFIXES)
        )
        return cleaned + ("?" + "&".join(params) if params else "")

    import random

    rng = random.Random(99)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    hosts = ["Example.COM", "a.b.c", "X.org:8080", "wWw.Site.net"]
    paths = ["", "/", "/p", "/p/q/", "/Doc/123", "/a%20b/"]
    params = ["a=1", "b=2", "z=9", "utm_source=x", "utm_medium=m",
              "gclid=g1", "fbclid=f", "q=a#b", "empty=", "dup=1"]
    frags = ["", "#f", "#sec?x=1", "#a#b"]
    urls = []
    for _ in range(150):
        qs = "&".join(rng.sample(params, rng.randint(0, 5)))
        u = (
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(paths)
            + (("?" + qs) if qs else "")
            + rng.choice(frags)
        )
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [
        r["n"]
        for r in df.select(normalize_url(F.col("u")).alias("n")).collect()
    ]
    want = [py_norm(u) for u in urls]
    assert got == want


def test_doc_chunks_window_semantics(spark, tmp_path):
    """Strided-chunking rule on crafted lengths: n_chunks =
    floor((n_tokens-1)/S)+1; every chunk starts at k*S, is at most W
    tokens, and the concatenation of stride-prefixes reconstructs the
    document (no token lost at boundaries)."""
    docs = [
        (1, " ".join(f"t{i}" for i in range(5))),    # < W  -> 1 chunk
        (2, " ".join(f"t{i}" for i in range(32))),   # == W -> 2 chunks
        (3, " ".join(f"t{i}" for i in range(80))),   # 80 -> 4 chunks
        (4, "single"),                               # 1 token
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    p = os.path.join(str(tmp_path), "documents.parquet")
    d.write.parquet(p)
    rows = entry.q_doc_chunks(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    from __spark_entry__ import _CHUNK_S, _CHUNK_W

    for doc_id, text in docs:
        toks = text.split()
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert len(chunks) == (len(toks) - 1) // _CHUNK_S + 1
        rebuilt = []
        for r in chunks:
            start = r["chunk_id"] * _CHUNK_S
            want = toks[start:start + _CHUNK_W]
            assert r["chunk_text"].split() == want
            assert r["n_chunk_tokens"] == len(want) <= _CHUNK_W
            rebuilt.extend(want[:_CHUNK_S])
        # stride-prefix concatenation covers every token exactly once
        assert rebuilt[:len(toks)] == toks


def test_dedup_incremental_verdicts(spark, sf_dir):
    """Re-sent docs (exact fingerprint hit) are all dropped; prefixed
    'update:' docs all survive — checked against the raw doc counts."""
    d = entry._docs(spark, sf_dir)
    n_resent = d.filter(F.col("doc_id") % 10 == 0).count()
    n_fresh = d.filter(F.col("doc_id") % 10 == 5).count()
    out = entry.q_dedup_incremental(spark, sf_dir).collect()
    ids = sorted(r["batch_id"] for r in out)
    assert n_resent > 0 and n_fresh > 0
    # every survivor is from the 'update:' branch (batch_id >= 3000000)
    assert all(i >= 3000000 for i in ids)
    assert len(ids) == n_fresh


def _py_gopher(text: str) -> dict:
    """Pure-python twin of functions.text.gopher_flags."""
    import re

    from deepie_spark.functions.text import GOPHER_STOPWORDS, py_tokenize

    toks = py_tokenize(text)
    n = len(toks)
    mean_len = sum(len(t) for t in toks) / n
    n_sym = text.count("#") + len(re.findall(r"\.\.\.", text))
    symbol_ratio = n_sym / n
    alpha_frac = sum(1 for t in toks if re.search("[A-Za-z]", t)) / n
    n_stop = sum(1 for w in GOPHER_STOPWORDS if w in toks)
    passes = (
        50 <= n <= 100_000
        and 3.0 <= mean_len <= 10.0
        and symbol_ratio <= 0.1
        and alpha_frac >= 0.8
        and n_stop >= 2
    )
    return {
        "n_words": n,
        "mean_word_len": round(mean_len, 6),
        "symbol_ratio": round(symbol_ratio, 6),
        "alpha_frac": round(alpha_frac, 6),
        "n_stop": n_stop,
        "passes": passes,
    }


def test_gopher_flags_handcrafted(spark):
    t_short = "the be to of"                      # 4 words, all stop
    t_pass = " ".join(["the", "be"] + ["word"] * 58)   # 60 words, passes
    t_sym = " ".join(["the", "be"] + ["word"] * 58 + ["#"] * 7)
    t_ell = "a... b...... c"
    rows = {
        r["doc_id"]: r
        for r in _gopher_rows(spark, [t_short, t_pass, t_sym, t_ell])
    }
    r = rows[0]
    assert (r["n_words"], r["mean_word_len"], r["n_stop"], r["passes"]) == (
        4, 2.25, 4, False)
    r = rows[1]
    assert r["n_words"] == 60 and r["passes"] is True
    assert r["mean_word_len"] == round((3 + 2 + 4 * 58) / 60, 6)
    r = rows[2]
    # 7 '#' over 67 words = 0.1045 > 0.1 → fails on symbol ratio alone
    assert r["symbol_ratio"] == round(7 / 67, 6) and r["passes"] is False
    r = rows[3]
    # '...' matches non-overlapping: 1 in 'a...' + 2 in 'b......'
    assert r["symbol_ratio"] == 1.0 and r["n_words"] == 3


def _gopher_rows(spark, texts):
    from deepie_spark.functions.text import gopher_flags

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    g = gopher_flags(F.col("text"))
    return df.select("doc_id", *[g[k].alias(k) for k in g]).collect()


def test_gopher_flags_random_twin(spark):
    import random

    rng = random.Random(1234)
    vocab = ["the", "be", "to", "word", "alpha", "x", "123", "#", "a...b",
             "longish-token", "of", "...", "...."]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 80)))
        for _ in range(60)
    ]
    for row in _gopher_rows(spark, texts):
        exp = _py_gopher(texts[row["doc_id"]])
        for k, v in exp.items():
            got = row[k]
            if isinstance(v, float):
                assert abs(got - v) < 1e-9, (k, row["doc_id"])
            else:
                assert got == v, (k, row["doc_id"])


def test_events_hopping_membership(spark, sf_dir):
    """Every event lands in exactly 4 of the 2h/30min hopping windows,
    and a sampled window's count matches a direct epoch filter."""
    out = entry.q_events_hopping(spark, sf_dir)
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_events = e.count()
    assert out.agg(F.sum("n")).first()[0] == 4 * n_events
    # spot-check one window against first principles
    r = out.orderBy("w_start", "event_type").first()
    manual = e.filter(
        (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
         >= r["w_start"])
        & (F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
           < r["w_start"] + 7200)
        & (F.col("event_type") == r["event_type"])
    ).count()
    assert manual == r["n"]
    assert r["w_start"] % 1800 == 0


def test_top_ngrams_tie_break_twin(spark):
    from collections import Counter

    from deepie_spark.operators.stats import top_bigrams_per_group

    docs = [
        (1, "s1", "a b a b c d"),          # bigrams: a b, b a, a b, b c, c d
        (2, "s1", "a b x y x y x y"),
        (3, "s2", "p q p q r s r s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        (r["source"], r["rank"]): (r["bigram"], r["n"])
        for r in top_bigrams_per_group(df, k=5).collect()
    }

    twin = {}
    for _, src, text in docs:
        ts = text.split()
        twin.setdefault(src, Counter()).update(
            f"{a} {b}" for a, b in zip(ts, ts[1:])
        )
    n_expected = 0
    for src, cnt in twin.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        n_expected += len(ranked)
        for i, (bgm, n) in enumerate(ranked, 1):
            assert got[(src, i)] == (bgm, n), (src, i)
    assert len(got) == n_expected


def test_top_ngrams_short_docs_dropped(spark):
    from deepie_spark.operators.stats import top_bigrams_per_group

    df = spark.createDataFrame(
        [(1, "s1", "one"), (2, "s1", "")], "doc_id long, source string, text string"
    )
    assert top_bigrams_per_group(df).count() == 0


def test_chunk_windows_reconstruct_original(spark):
    """Chunking integrity on adversarial token counts (exact multiples
    of width/stride and their neighbors): non-overlapping windows
    concatenate back to the original token list; overlapping windows
    reconstruct via stride-prefixes + the full last window (i.e. no
    token is dropped or duplicated beyond the declared overlap)."""
    import random

    from pyspark.sql import functions as F

    from __spark_entry__ import _chunk_windows

    rng = random.Random(7)
    lengths = [1, 2, 15, 16, 17, 23, 24, 25, 31, 32, 33, 47, 48, 49] + [
        rng.randint(1, 100) for _ in range(40)
    ]
    rows = [
        (i, [f"t{rng.randint(0, 9)}" for _ in range(n)])
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    want = {i: toks for i, toks in rows}

    for width, stride in ((16, 16), (32, 24), (7, 3)):
        got = {}
        for r in _chunk_windows(df, width, stride).collect():
            got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
        assert set(got) == set(want)
        for i, chunks in got.items():
            ordered = [chunks[k] for k in sorted(chunks)]
            rebuilt = []
            for ch in ordered[:-1]:
                rebuilt.extend(ch[:stride])
            rebuilt.extend(ordered[-1])
            assert rebuilt == want[i], (width, stride, i)
            # non-overlapping: every window except the last is full
            # (with overlap, tail windows near the end may be short)
            if width == stride:
                assert all(len(c) == width for c in ordered[:-1])


def test_extract_anchors_order_and_pairing(spark):
    from pyspark.sql import functions as F

    from deepie_spark.functions.web import extract_anchors

    html = (
        '<html><a href="https://x.com/a" class="big">First</a>'
        '<p>noise</p><a href="/rel">Relative</a>'
        '<a href="https://y.com/b">Second</a></html>'
    )
    df = spark.createDataFrame([(html,)], "html string")
    [row] = df.select(extract_anchors(F.col("html")).alias("an")).collect()
    assert [(x.href, x.anchor) for x in row.an] == [
        ("https://x.com/a", "First"),
        ("/rel", "Relative"),
        ("https://y.com/b", "Second"),
    ]


def test_extract_anchors_empty_and_no_anchor_text(spark):
    from pyspark.sql import functions as F

    from deepie_spark.functions.web import extract_anchors

    df = spark.createDataFrame(
        [("<p>no links</p>",), ('<a href="https://z.com/">''</a>',)],
        "html string",
    )
    rows = df.select(extract_anchors(F.col("html")).alias("an")).collect()
    assert rows[0].an == []
    assert [(x.href, x.anchor) for x in rows[1].an] == [
        ("https://z.com/", "")
    ]


def test_html_density_hand_computed(spark, sf_dir):
    import re

    import __spark_entry__ as entry

    out = {r.doc_id: r for r in
           entry.q_html_density(spark, sf_dir).collect()}
    pages = {r.doc_id: r.html for r in
             entry._anchor_pages(entry._docs(spark, sf_dir)).collect()}
    pat = re.compile(r'href="([^"]+)"[^>]*>([^<]*)</a>')
    assert out and set(out) == set(pages)
    for doc_id, html in list(pages.items())[:25]:
        r = out[doc_id]
        anchors = [m[1] for m in pat.findall(html)]
        text = re.sub(r"<[^>]+>", "", html)
        assert r.html_chars == len(html)
        assert r.text_chars == len(text)
        assert r.n_anchors == len(anchors) == 2
        assert r.anchor_chars == sum(len(a) for a in anchors)
        assert r.link_density == round(r.anchor_chars / len(text), 6)
