"""Property-based tests (hypothesis) for the pure kernels.

The reference has no property tests (SURVEY.md §5); these harden the
parsing/hashing/matching primitives the distributed operators are built
from, without Spark in the loop.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deepie_spark.datagen.catalog import build_alias_trie
from deepie_spark.functions.text import BASE, MOD
from deepie_spark.operators.mentions import greedy_match
from deepie_spark.sources.tsv_corpus import analyze_dep_path, parse_score

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)


def py_poly_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * BASE + ord(c)) % MOD
    return h


@given(st.lists(words, min_size=1, max_size=12))
@settings(max_examples=200, deadline=None)
def test_dep_path_roundtrip_and_reversal(tokens):
    """Any alternating word-idx/rel path parses; reversal is involutive
    on the index ordering (last >= first always holds after parsing)."""
    idxs = list(range(1, len(tokens) + 1))
    rels = [f"r{i}" for i in range(len(tokens) - 1)]
    parts = []
    for i, (w, x) in enumerate(zip(tokens, idxs)):
        parts.append(f"{w}-{x}")
        if i < len(rels):
            parts.append(rels[i])
    fwd = " ".join(parts)
    w1, r1, i1 = analyze_dep_path(fwd)
    assert i1[0] <= i1[-1]
    assert w1 == tokens and i1 == [x - 1 for x in idxs]
    # reversed textual path parses to the same canonical orientation
    parts_rev = []
    for i, (w, x) in enumerate(zip(tokens[::-1], idxs[::-1])):
        parts_rev.append(f"{w}-{x}")
        if i < len(rels):
            parts_rev.append(rels[::-1][i])
    w2, r2, i2 = analyze_dep_path(" ".join(parts_rev))
    assert (w2, i2) == (w1, i1)
    assert r2 == r1


@given(st.dictionaries(words, st.floats(-100, 100, allow_nan=False), max_size=8))
@settings(max_examples=100, deadline=None)
def test_parse_score_roundtrip(scores):
    if not scores:
        return
    s = " ".join(f"{k}:{v}" for k, v in scores.items())
    got = parse_score(s)
    assert set(got) == set(scores)
    for k in scores:
        assert abs(got[k] - scores[k]) < 1e-6


@given(st.lists(words, min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_greedy_match_invariants(tokens):
    """Matches never overlap, are in order, and positions obey the
    last-token rule; matched spans reproduce catalog aliases."""
    trie = build_alias_trie()
    out = greedy_match(tokens, trie)
    last_end = -1
    for start, pos, _eid, alias, *_ in out:
        assert start > last_end  # no overlap, left to right
        assert " ".join(tokens[start : pos + 1]) == alias
        last_end = pos


@given(st.lists(words | st.sampled_from(
    ["hash", "join", "table", "scan", "sort", "merge", "spark", "row"]
), min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)
def test_compiled_matcher_equals_greedy_trie(tokens):
    """The compiled fast matcher is semantics-identical to the trie
    walk on arbitrary token streams (incl. alias-dense ones)."""
    from deepie_spark.operators.mentions import compile_matcher

    trie = build_alias_trie()
    assert compile_matcher(trie)(tokens) == greedy_match(tokens, trie)


@given(st.lists(st.lists(words | st.sampled_from(
    ["hash", "join", "table", "scan", "sort", "merge", "spark", "row"]
), min_size=0, max_size=40), min_size=0, max_size=6))
@settings(max_examples=300, deadline=None)
def test_batch_matcher_equals_greedy_trie(token_lists):
    """The vectorized batch matcher (Index.get_indexer hash joins +
    python only at multi-candidate hits) is semantics-identical to the
    per-row trie walk on arbitrary batches."""
    from deepie_spark.operators.mentions import compile_batch_matcher

    trie = build_alias_trie()
    got = compile_batch_matcher(trie)(token_lists)
    want = [greedy_match(toks, trie) for toks in token_lists]
    assert got == want


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_py_tokenize_fast_path_equals_regex(s):
    """The ASCII fast path must agree with the canonical ASCII-regex
    split on arbitrary input (incl. unicode whitespace, \\x1c-\\x1f)."""
    import re

    from deepie_spark.functions.text import py_tokenize

    want = [t for t in re.split(r"\s+", s, flags=re.ASCII) if t]
    assert py_tokenize(s) == want


@given(st.text(max_size=64))
@settings(max_examples=200, deadline=None)
def test_poly_hash_range_and_determinism(s):
    h = py_poly_hash(s)
    assert 0 <= h < MOD
    assert h == py_poly_hash(s)


@given(st.lists(st.integers(0, 3), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_scorer_bounds(ids):
    """P, R in [0, 100]; F1 is the harmonic mean; all 0 when nothing
    predicted AND nothing gold."""
    from deepie_spark.model.train import score_py

    pred = np.array(ids)
    gold = np.roll(pred, 1)
    p, r, f1 = score_py(pred, gold)
    assert 0.0 <= p <= 100.0 and 0.0 <= r <= 100.0
    if p + r > 0:
        assert abs(f1 - 2 * p * r / (p + r)) < 1e-9
    else:
        assert f1 == 0.0


_small = st.sampled_from(["a", "b", "c", "d", "e"])


@given(
    st.lists(
        st.lists(_small, min_size=1, max_size=4), min_size=1, max_size=8
    ),
    st.lists(_small, min_size=0, max_size=30),
)
@settings(max_examples=300, deadline=None)
def test_matchers_agree_on_random_deep_tries(aliases, tokens):
    """All three matcher implementations agree for ARBITRARY tries up
    to depth 4 (not just the shipped catalog) on dense token streams —
    the property the depth-3 gated pipeline relies on."""
    from deepie_spark.operators.mentions import (
        compile_batch_matcher,
        compile_matcher,
    )

    seen, catalog = set(), []
    for parts in aliases:
        alias = " ".join(parts)
        if alias in seen:
            continue
        seen.add(alias)
        catalog.append((len(catalog) + 1, alias, "PER", "NOM", 0.5))
    trie = build_alias_trie(catalog)
    want = greedy_match(tokens, trie)
    assert compile_matcher(trie)(tokens) == want
    assert compile_batch_matcher(trie)([tokens]) == [want]
