"""End-to-end triple P/R gate vs reference semantics (BASELINE.json).

The reference (Python2/Theano) cannot run here, so per SURVEY.md §7.4.7
the golden generator is a sequential pure-python pipeline reproducing the
reference semantics end to end — parse (parseLine), dictionaries
(first-encounter A2/A6), binary-feature encoding (F5), the trained sparse
log-linear expert (M18, trained with the reference's protocol shape:
seeded shuffled minibatches), argmax decode (M20), directed-triple
emission (S7/P10 relational form).  The distributed Spark pipeline runs
the SAME stages through its own operators (read_corpus → dictionary
operators → mapInPandas inference) and must reproduce the golden triples
at P/R ≥ 0.95 (BASELINE.json: "triple P/R≥0.95 vs reference DeepIE
outputs ... python -m pytest -x -q").  Weights are shared; numpy row-wise
ops are batch-invariant, so the match is exact (P = R = 1.0).
"""

import numpy as np
import pytest

from deepie_spark.model.encoder import binary_feature_rows
from deepie_spark.model.infer import (
    classify_mentions,
    triples_from_predictions,
)
from deepie_spark.model.train import predict_loglinear, train_loglinear
from deepie_spark.operators.dictionary import (
    binary_feature_dictionary,
    build_reference_dictionaries,
)
from deepie_spark.operators.scorer import precision_recall_f1
from deepie_spark.sources.tsv_corpus import (
    MAIN_CORPORA,
    main_corpus_records,
    parse_line,
    read_corpus,
)
from tests.conftest import REFERENCE_DATA
from tests.test_parser import all_lines

TRAIN_CORPUS = "bn_nw"  # fold='all' protocol: train=bn_nw (rnnRE.py:888-899)
CUTOFF = 2              # evaluate.py:112 default


@pytest.fixture(scope="module")
def golden():
    """Sequential golden pipeline over the 150 fixture lines."""
    records = [parse_line(c, line) for c, _, line in all_lines()]

    # A2 label dictionary: NONE=0, first encounter in scan order
    label_dict = {"NONE": 0}
    for r in records:
        if r["label"] not in label_dict:
            label_dict[r["label"]] = len(label_dict)
    label_names = [None] * len(label_dict)
    for k, v in label_dict.items():
        label_names[v] = k

    # A6 binary-feature dictionary over the training corpus
    from collections import Counter

    counts, first, k = Counter(), {}, 0
    for r in records:
        if r["corpus"] != TRAIN_CORPUS:
            continue
        for f in r["bin_feats"]:
            counts[f] += 1
            if f not in first:
                first[f], k = k, k + 1
    bin_dict = {
        f: i
        for i, f in enumerate(
            sorted(
                (f for f, n in counts.items() if n >= CUTOFF),
                key=first.__getitem__,
            )
        )
    }
    assert bin_dict, "training corpus must yield surviving features"

    # A7 max binary-feature count across all corpora
    max_bin = max(len(r["bin_feats"]) for r in records)

    # M18 training on the train corpus (driver-side, seeded)
    train_recs = [r for r in records if r["corpus"] == TRAIN_CORPUS]
    rows = binary_feature_rows(train_recs, bin_dict, max_bin)
    labels = np.array([label_dict[r["label"]] for r in train_recs])
    weights = train_loglinear(
        rows, labels, len(label_dict), len(bin_dict)
    )

    # golden predictions + triples over the 5 main corpora
    main = [r for r in records if r["corpus"] in MAIN_CORPORA]
    main_rows = binary_feature_rows(main, bin_dict, max_bin)
    pred_ids, _ = predict_loglinear(main_rows, weights)
    preds = {}
    triples = set()
    for r, pid in zip(main, pred_ids):
        name = label_names[pid]
        preds[(r["corpus"], r["rel_id"])] = name
        if name == "NONE":
            continue
        subj, obj = r["tokens"][r["pos1"]], r["tokens"][r["pos2"]]
        if name.endswith("(e2,e1)"):
            subj, obj = obj, subj
        bare = name.split("(")[0] if name.endswith(("(e1,e2)", "(e2,e1)")) else name
        triples.add((subj, bare, obj, r["corpus"], r["rel_id"]))

    return {
        "label_names": label_names,
        "label_dict": label_dict,
        "bin_dict": bin_dict,
        "max_bin": max_bin,
        "weights": weights,
        "preds": preds,
        "triples": triples,
    }


@pytest.fixture(scope="module")
def spark_run(spark, golden):
    """The distributed pipeline with the same broadcast weights."""
    mentions = read_corpus(spark, REFERENCE_DATA).cache()

    # distributed dictionary builds must agree with the golden ones
    bin_df = binary_feature_dictionary(
        mentions, cutoff=CUTOFF, train_corpora=[TRAIN_CORPUS]
    )
    spark_bin = {r["value"]: r["id"] for r in bin_df.collect()}
    label_df = build_reference_dictionaries(mentions)["label"]
    spark_labels = {r["value"]: r["id"] for r in label_df.collect()}

    preds = classify_mentions(
        main_corpus_records(mentions),
        golden["weights"],
        spark_bin,
        golden["label_names"],
        golden["max_bin"],
    ).cache()
    return {
        "mentions": mentions,
        "bin_dict": spark_bin,
        "label_dict": spark_labels,
        "preds": preds,
    }


def test_distributed_dicts_match_golden(golden, spark_run):
    assert spark_run["bin_dict"] == golden["bin_dict"]
    assert spark_run["label_dict"] == golden["label_dict"]


def test_per_record_predictions_match_golden(golden, spark_run):
    rows = spark_run["preds"].collect()
    assert len(rows) == len(golden["preds"]) == 50
    for r in rows:
        want = golden["preds"][(r["corpus"], r["rel_id"])]
        assert r["pred"] == want, (r["corpus"], r["rel_id"])


def test_triple_pr_gate(golden, spark_run):
    """BASELINE.json gate: triple P/R ≥ 0.95 vs the golden generator."""
    got = {
        (r["subj"], r["pred"], r["obj"], r["corpus"], r["rel_id"])
        for r in triples_from_predictions(spark_run["preds"]).collect()
    }
    want = golden["triples"]
    assert want, "golden generator must emit triples"
    inter = len(got & want)
    precision = inter / len(got) if got else 0.0
    recall = inter / len(want)
    assert precision >= 0.95, f"P={precision} got={len(got)} ∩={inter}"
    assert recall >= 0.95, f"R={recall} want={len(want)} ∩={inter}"


def test_train_corpus_learnability(golden, spark_run):
    """Sanity on the model itself: on its own training corpus the expert
    must beat the all-NONE baseline (non-zero F1 vs gold labels) — the
    reference's per-epoch train-score print (rnnRE.py:970-972)."""
    from pyspark.sql import functions as F

    df = spark_run["preds"].filter(F.col("corpus") == TRAIN_CORPUS)
    ld = golden["label_dict"]
    to_id = F.udf(lambda s: ld.get(s, 0), "int")
    scored = df.select(
        to_id("pred").alias("pred"), to_id("gold").alias("gold")
    )
    p, r, f1 = precision_recall_f1(scored)
    assert f1 > 0.0
