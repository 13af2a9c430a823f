"""First-encounter dictionary (A2/A6) and vocabulary (A1) tests.

A pure-python golden builder reimplements the documented insertion-order
semantics (reference: rnn_process_onlyExtra.py:54-56,99-205 — id =
len(dict) on first encounter, scanning files in FULL_SCAN_ORDER); the
distributed operator must reproduce it exactly, *and* be invariant under
repartitioning (the property the reference's sequential scan cannot
have but our coordinate-ordered window construction guarantees).
"""

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.dictionary import (
    binary_feature_dictionary,
    build_reference_dictionaries,
    vocab_document_frequency,
)
from deepie_spark.sources.tsv_corpus import read_corpus
from tests.conftest import REFERENCE_DATA
from tests.test_parser import all_lines
from deepie_spark.sources.tsv_corpus import parse_line


def norm(w: str) -> str:
    return w.replace("_", " ")


def gather(arr, idx):
    return [arr[i] for i in idx]


def record_streams(rec):
    """Per-dict value streams in the operator's documented order."""
    g = rec["grammar"]
    dep = rec["dep_idx"]
    return {
        "label": [[rec["label"]]],
        "type": [[rec["type1"]], [rec["type2"]]],
        "subtype": [[rec["subtype1"]], [rec["subtype2"]]],
        "constit": [
            rec["cons1"],
            rec["cons2"],
            gather(rec["cons1"], dep),
            gather(rec["cons2"], dep),
        ],
        "preter": [rec["preter"], gather(rec["preter"], dep)],
        "prepreter": [rec["prepreter"], gather(rec["prepreter"], dep)],
        "deprel": [
            [x for gs in g for x in gs],
            [x for gs in gather(g, dep) for x in gs],
        ],
        "word": [
            [norm(w) for w in rec["tokens"]],
            [norm(w) for w in rec["dep_tokens"]],
            [norm(w) for w in rec["governors"]],
            [norm(w) for w in gather(rec["governors"], dep)],
        ],
    }


SEEDS = {
    "label": ({"NONE": 0}, 1),
    "type": ({"Other": 1}, 2),
    "subtype": ({"Other": 1}, 2),
    "constit": ({"Other": 1}, 2),
    "preter": ({"Other": 1}, 2),
    "prepreter": ({"Other": 1}, 2),
    "deprel": ({"Other": 1}, 2),
    "word": ({}, 1),
}


@pytest.fixture(scope="module")
def golden():
    """Insertion-order dictionaries built sequentially over the fixtures."""
    dicts = {k: dict(seed) for k, (seed, _) in SEEDS.items()}
    nxt = {k: start for k, (_, start) in SEEDS.items()}
    for corpus, _, line in all_lines():
        rec = parse_line(corpus, line)
        for name, streams in record_streams(rec).items():
            d = dicts[name]
            for stream in streams:
                for v in stream:
                    if v not in d:
                        d[v] = nxt[name]
                        nxt[name] += 1
    return dicts


@pytest.fixture(scope="module")
def mentions(spark):
    return read_corpus(spark, REFERENCE_DATA).cache()


def spark_dict(df):
    return {r["value"]: r["id"] for r in df.collect()}


def test_all_eight_dicts_match_golden(spark, mentions, golden):
    built = build_reference_dictionaries(mentions)
    for name, gold in golden.items():
        got = spark_dict(built[name])
        assert got == gold, f"dict {name!r} diverges from insertion order"


def test_dict_ids_invariant_under_repartition(spark, mentions, golden):
    """The reference's ids depend on scan order; ours must not depend on
    partitioning — the coordinate (file_order, line_no, stream, pos) is
    data, not schedule."""
    shuffled = mentions.repartition(7)
    built = build_reference_dictionaries(shuffled)
    assert spark_dict(built["label"]) == golden["label"]
    assert spark_dict(built["word"]) == golden["word"]
    assert spark_dict(built["constit"]) == golden["constit"]


def test_label_dict_seed_and_range(spark, mentions):
    d = spark_dict(build_reference_dictionaries(mentions)["label"])
    assert d["NONE"] == 0
    ids = sorted(d.values())
    assert ids == list(range(len(d)))  # dense, no gaps


def test_vocab_document_frequency(spark, mentions):
    """A1 golden: distinct raw words per stream, then normalize, then
    count — each stream of each record contributes once per raw word."""
    from collections import Counter

    gold = Counter()
    for corpus, _, line in all_lines():
        rec = parse_line(corpus, line)
        dep = rec["dep_idx"]
        for stream in (
            rec["tokens"],
            rec["dep_tokens"],
            rec["governors"],
            gather(rec["governors"], dep),
        ):
            for w in dict.fromkeys(stream):  # distinct, order-preserving
                gold[norm(w)] += 1
    got = {
        r["word"]: r["df_count"]
        for r in vocab_document_frequency(mentions).collect()
    }
    assert got == dict(gold)


def test_binary_feature_dictionary_cutoff(spark, mentions):
    """A6 golden: count over training corpus only, drop < cutoff, dense
    first-encounter ids over survivors (makeBinaryDictionary
    rnnRE.py:452-482)."""
    from collections import Counter

    cutoff = 2
    counts = Counter()
    first = {}
    k = 0
    for corpus, _, line in all_lines():
        if corpus != "bn_nw":
            continue
        rec = parse_line(corpus, line)
        for f in rec["bin_feats"]:
            counts[f] += 1
            if f not in first:
                first[f] = k
                k += 1
    kept = sorted(
        (f for f, n in counts.items() if n >= cutoff), key=first.__getitem__
    )
    gold = {f: i for i, f in enumerate(kept)}

    df = binary_feature_dictionary(
        mentions, cutoff=cutoff, train_corpora=["bn_nw"]
    )
    got = {r["value"]: r["id"] for r in df.collect()}
    assert got == gold
    ns = {r["value"]: r["n"] for r in df.collect()}
    assert all(n >= cutoff for n in ns.values())


def test_rank_in_order_matches_global_window(spark):
    """rank_in_order must equal row_number() OVER (ORDER BY key) for any
    bucket count, including buckets >> rows (empty buckets) and
    buckets=1 (degenerate single range)."""
    import random

    from pyspark.sql import functions as F

    from deepie_spark.operators.dictionary import rank_in_order

    rng = random.Random(41)
    ordinals = rng.sample(range(10_000_000), 997)
    rows = [(f"v{i}", o) for i, o in enumerate(ordinals)]
    df = spark.createDataFrame(rows, "value string, ord long").repartition(13)
    gold = {
        v: r + 7
        for r, (o, v) in enumerate(sorted((o, v) for v, o in rows))
    }
    for buckets in (1, 4, 2048):
        got = {
            r["value"]: r["id"]
            for r in rank_in_order(
                df, "ord", start_id=7, buckets=buckets
            ).collect()
        }
        assert got == gold, f"buckets={buckets}"


def test_rank_in_order_plan_has_no_global_window(spark):
    """The scale guarantee: ranking must never serialize the vocabulary
    through an unpartitioned window — every Window in the plan is
    partitioned by the range bucket, and the range exchange is present."""
    from deepie_spark.operators.dictionary import rank_in_order

    df = spark.range(1000).selectExpr(
        "CAST(id AS STRING) AS value", "id * 37 % 999983 AS ord"
    )
    ranked = rank_in_order(df, "ord", buckets=8)
    ranked.collect()
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # numeric key: the bucket is a literal-boundary pure function of
    # the key — no sampled range exchange anywhere (its per-branch
    # re-sampling was the rank-divergence bug), windows bucket-keyed
    assert "rangepartitioning" not in plan
    assert "windowspecdefinition" in plan
    for frag in plan.split("windowspecdefinition(")[1:]:
        spec = frag.split(")")[0]
        assert "_bkt" in spec, f"unpartitioned window spec: {spec}"


def test_rank_in_order_consistent_at_scaleish_input(spark):
    """Regression for the branch-divergence bug: on a 15k-row input
    the rank set must be EXACTLY 1..n on every evaluation (the
    sampled-exchange formulation returned nondeterministic duplicate/
    missing ranks at 8 cores)."""
    from deepie_spark.operators.dictionary import rank_in_order

    df = spark.range(15_000).selectExpr(
        "id AS k", "(id * 2654435761) % 1000003 AS v"
    ).selectExpr("k", "named_struct('v', v, 'k', k) AS ord")
    for _ in range(3):
        ranks = [
            r.r for r in rank_in_order(df, "ord", start_id=1, id_col="r").collect()
        ]
        assert sorted(ranks) == list(range(1, 15_001))
