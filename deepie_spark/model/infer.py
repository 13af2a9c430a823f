"""Distributed batched model inference (north-star stage 5).

``mapInPandas`` over the parsed relation-mention DataFrame: weights and
dictionaries ride a ``SparkContext.broadcast`` handle, deserialized once
per python worker (iterator form amortizes it across Arrow batches —
SURVEY.md §2.10), and each batch is classified with the numpy zoo.
This is the Spark re-expression of ``predict()`` (rnnRE.py:512-562):
the reference pads corpora to batch multiples and recycles head rows
(:516-523); Arrow batches need no such padding.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.model.encoder import binary_feature_rows
from deepie_spark.model.zoo import (
    softmax,
    sparse_loglinear_logits,
)

PRED_SCHEMA = (
    "rel_id string, corpus string, gold string, pred string,"
    " prob double, pos1 int, pos2 int, subj string, obj string,"
    " line_no long"
)


def classify_mentions(
    mentions: DataFrame,
    weights: dict[str, np.ndarray],
    bin_dict: dict[str, int],
    label_names: list[str],
    max_bin: int,
) -> DataFrame:
    """Parsed mentions → per-record predictions.

    ``label_names[i]`` is the label with dictionary id i (A2 order).
    Output keeps gold + pred label strings, the classifier probability of
    the argmax, and the head surface forms for triple emission.
    """
    spark = mentions.sparkSession
    bc = spark.sparkContext.broadcast(
        {
            "W": weights["W"],
            "b": weights["b"],
            "bin_dict": bin_dict,
            "labels": label_names,
            "max_bin": max_bin,
        }
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        labels = v["labels"]
        for pdf in batches:
            recs = [
                {"bin_feats": list(bf)} for bf in pdf["bin_feats"]
            ]
            rows = binary_feature_rows(recs, v["bin_dict"], v["max_bin"])
            p = softmax(
                sparse_loglinear_logits(rows, v["W"], v["b"]), axis=1
            )
            pred_ids = p.argmax(axis=1)
            probs = p[np.arange(len(pred_ids)), pred_ids]
            subj = [
                toks[int(p1)]
                for toks, p1 in zip(pdf["tokens"], pdf["pos1"])
            ]
            obj = [
                toks[int(p2)]
                for toks, p2 in zip(pdf["tokens"], pdf["pos2"])
            ]
            yield pd.DataFrame(
                {
                    "rel_id": pdf["rel_id"],
                    "corpus": pdf["corpus"],
                    "gold": pdf["label"],
                    "pred": [labels[i] for i in pred_ids],
                    "prob": probs,
                    "pos1": pdf["pos1"],
                    "pos2": pdf["pos2"],
                    "subj": subj,
                    "obj": obj,
                    "line_no": pdf["line_no"],
                }
            )

    cols = [
        "rel_id", "corpus", "label", "bin_feats", "tokens", "pos1",
        "pos2", "line_no",
    ]
    return mentions.select(cols).mapInPandas(run, PRED_SCHEMA)


PAIR_PRED_SCHEMA = (
    "doc_id long, pos1 long, pos2 long, alias1 string, alias2 string,"
    " type1 string, type2 string, label string, prob double"
)


def classify_type_pairs(
    pairs: DataFrame,
    weights: dict[str, np.ndarray],
    label_names: list[str],
    feat_ids: dict[str, int],
) -> DataFrame:
    """Model-path pair classification: the trained log-linear expert
    (M18) applied batched in ``mapInPandas`` with broadcast weights —
    the same plan shape as the full relation classifier, on the
    ``TYPE1@TYPE2`` feature family (reference field 3 / parseLine
    rnn_process_onlyExtra.py:339-340)."""
    bc = pairs.sparkSession.sparkContext.broadcast(
        {"W": weights["W"], "b": weights["b"], "labels": label_names,
         "fid": feat_ids}
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        v = bc.value
        for pdf in batches:
            recs = [
                {"bin_feats": [f"{t1}@{t2}"]}
                for t1, t2 in zip(pdf["type1"], pdf["type2"])
            ]
            rows = binary_feature_rows(recs, v["fid"], 1)
            p = softmax(
                sparse_loglinear_logits(rows, v["W"], v["b"]), axis=1
            )
            ids = p.argmax(axis=1)
            yield pdf.assign(
                label=[v["labels"][i] for i in ids],
                prob=p[np.arange(len(ids)), ids],
            )

    cols = ["doc_id", "pos1", "pos2", "alias1", "alias2", "type1", "type2"]
    return pairs.select(cols).mapInPandas(run, PAIR_PRED_SCHEMA)


def triples_from_predictions(preds: DataFrame) -> DataFrame:
    """Predictions → directed (subj, pred, obj) triples, NONE excluded.

    Direction from the (e2,e1) suffix as in plans.pipeline; subject/
    object are the entity head tokens (last-token rule positions)."""
    t = preds.filter(F.col("pred") != "NONE")
    rev = F.col("pred").endswith("(e2,e1)")
    bare = F.regexp_replace(F.col("pred"), "\\(e[12],e[21]\\)$", "")
    return t.select(
        F.when(rev, F.col("obj")).otherwise(F.col("subj")).alias("subj"),
        bare.alias("pred"),
        F.when(rev, F.col("subj")).otherwise(F.col("obj")).alias("obj"),
        F.col("prob"),
        F.col("corpus"),
        F.col("rel_id"),
        F.col("pos1"),
        F.col("pos2"),
    )
