"""Neural inference path parity: the distributed mapInPandas forward
(embed→CNN / biGRU→head→softmax) must reproduce the driver-side golden
forward bit-for-bit under shared broadcast weights — the neural analog
of the log-linear e2e gate.
"""

import numpy as np
import pytest

from deepie_spark.model.infer import (
    classify_mentions_neural,
    init_neural_weights,
    neural_forward,
)
from deepie_spark.operators.dictionary import build_reference_dictionaries
from deepie_spark.sources.tsv_corpus import (
    main_corpus_records,
    parse_line,
    read_corpus,
)
from tests.conftest import REFERENCE_DATA
from tests.test_parser import all_lines


@pytest.fixture(scope="module")
def setup(spark):
    mentions = read_corpus(spark, REFERENCE_DATA).cache()
    dicts = {
        name: {r["value"]: r["id"] for r in df.collect()}
        for name, df in build_reference_dictionaries(mentions).items()
    }
    records = [
        parse_line(c, line)
        for c, _, line in all_lines()
        if c in ("bn_nw", "bc0", "bc1", "cts", "wl")
    ]
    m_len = max(len(r["tokens"]) for r in records)
    num_position = 2 * m_len + 2
    label_names = [None] * len(dicts["label"])
    for k, v in dicts["label"].items():
        label_names[v] = k
    return {
        "mentions": mentions,
        "dicts": dicts,
        "records": records,
        "m_len": m_len,
        "num_position": num_position,
        "labels": label_names,
    }


@pytest.mark.parametrize(
    "model,seq",
    [
        ("convolute", "surface"),
        ("gruHead", "surface"),
        ("convolute", "dep"),
        ("gruHead", "dep"),
    ],
)
def test_distributed_neural_matches_golden(spark, setup, model, seq):
    dict_sizes = {k: max(d.values()) for k, d in setup["dicts"].items()}
    weights = init_neural_weights(
        dict_sizes,
        setup["num_position"],
        n_classes=len(setup["labels"]),
        model=model,
    )
    # golden: sequential forward over the same records
    gold_ids, gold_p = neural_forward(
        setup["records"], setup["dicts"], weights,
        setup["m_len"], setup["num_position"], seq,
    )
    gold = {
        (r["corpus"], r["rel_id"]): (int(i), float(p[i]))
        for r, i, p in zip(setup["records"], gold_ids, gold_p)
    }

    preds = classify_mentions_neural(
        main_corpus_records(setup["mentions"]),
        weights,
        setup["dicts"],
        setup["labels"],
        setup["m_len"],
        setup["num_position"],
        seq,
    ).collect()
    assert len(preds) == 50
    lid = {l: i for i, l in enumerate(setup["labels"])}
    for r in preds:
        want_id, want_prob = gold[(r["corpus"], r["rel_id"])]
        assert lid[r["pred"]] == want_id, (r["corpus"], r["rel_id"])
        assert r["prob"] == pytest.approx(want_prob, abs=1e-6)


def test_neural_forward_shapes_and_determinism(setup):
    dict_sizes = {k: max(d.values()) for k, d in setup["dicts"].items()}
    w1 = init_neural_weights(
        dict_sizes, setup["num_position"], n_classes=4, model="convolute"
    )
    w2 = init_neural_weights(
        dict_sizes, setup["num_position"], n_classes=4, model="convolute"
    )
    assert all(
        np.array_equal(w1[k], w2[k]) for k in w1 if not k.startswith("_")
    )
    ids, p = neural_forward(
        setup["records"][:10], setup["dicts"], w1,
        setup["m_len"], setup["num_position"],
    )
    assert p.shape == (10, 4)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-5)
    assert ids.shape == (10,)
    # pad row stays zero in every table
    for ch in ("word", "dist1", "type"):
        assert not w1[f"T_{ch}"][0].any()
