"""Micro P/R/F1 scorer (A8) with the reference's exact counting semantics.

``score(predictions, groundtruths)`` (rnnRE.py:564-581):

* ``num_pred``  — predictions with label id != 0 (0 == NONE),
* ``num_key``   — gold labels != 0,
* ``correct``   — rows where prediction != 0 AND prediction == gold
  (correctness is only evaluated on predicted-non-NONE rows),
* P = 100*correct/num_pred, R = 100*correct/num_key,
  F1 = 2PR/(P+R); all 0.0 when their denominator is 0.

This is the subtle part (SURVEY.md §7.4.5): a NONE prediction on a NONE
gold row contributes to *nothing*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_counts(
    df: DataFrame, pred_col: str = "pred", gold_col: str = "gold"
) -> DataFrame:
    """The distributed part: three conditional-sum aggregates."""
    p, g = F.col(pred_col), F.col(gold_col)
    return df.agg(
        F.sum((p != 0).cast("long")).alias("num_pred"),
        F.sum((g != 0).cast("long")).alias("num_key"),
        F.sum(((p != 0) & (p == g)).cast("long")).alias("correct"),
    )


def precision_recall_f1(
    df: DataFrame, pred_col: str = "pred", gold_col: str = "gold"
) -> tuple[float, float, float]:
    """Scalar P/R/F1 ×100 per the reference formulas."""
    row = score_counts(df, pred_col, gold_col).collect()[0]
    num_pred, num_key, correct = (
        row["num_pred"] or 0,
        row["num_key"] or 0,
        row["correct"] or 0,
    )
    precision = 100.0 * correct / num_pred if num_pred > 0 else 0.0
    recall = 100.0 * correct / num_key if num_key > 0 else 0.0
    f1 = (
        2.0 * precision * recall / (precision + recall)
        if precision + recall > 0
        else 0.0
    )
    return precision, recall, f1


def score_df(
    df: DataFrame, pred_col: str = "pred", gold_col: str = "gold"
) -> DataFrame:
    """P/R/F1 as a one-row DataFrame (for queries()/oracle checks)."""
    counts = score_counts(df, pred_col, gold_col)
    num_pred, num_key, correct = (
        F.col("num_pred"),
        F.col("num_key"),
        F.col("correct"),
    )
    precision = F.when(
        num_pred > 0, 100.0 * correct / num_pred
    ).otherwise(F.lit(0.0))
    recall = F.when(num_key > 0, 100.0 * correct / num_key).otherwise(
        F.lit(0.0)
    )
    return counts.select(
        num_pred,
        num_key,
        correct,
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision + recall > 0,
            2.0 * precision * recall / (precision + recall),
        )
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )
