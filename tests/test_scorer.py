"""Distributed scorer (A8) vs the pure-python twin (rnnRE.py:564-581)."""

import numpy as np
import pytest

from deepie_spark.model.train import score_py
from deepie_spark.operators.scorer import precision_recall_f1, score_df

CASES = [
    ([1, 2, 0, 3, 1, 0], [1, 0, 2, 3, 2, 0]),
    ([0, 0, 0], [1, 2, 3]),          # nothing predicted → P=0
    ([1, 2, 3], [0, 0, 0]),          # nothing gold → R=0
    ([0, 0], [0, 0]),                # all NONE → all zeros
    ([1, 1, 1], [1, 1, 1]),          # perfect
    ([2, 3, 2, 2], [2, 2, 2, 2]),
]


@pytest.mark.parametrize("pred,gold", CASES)
def test_score_matches_python_twin(spark, pred, gold):
    df = spark.createDataFrame(
        list(zip(pred, gold)), "pred int, gold int"
    )
    want = score_py(np.array(pred), np.array(gold))
    got = precision_recall_f1(df)
    assert got == pytest.approx(want)
    row = score_df(df).collect()[0]
    assert (row["precision"], row["recall"], row["f1"]) == pytest.approx(want)
    assert row["num_pred"] == int((np.array(pred) != 0).sum())
    assert row["num_key"] == int((np.array(gold) != 0).sum())
