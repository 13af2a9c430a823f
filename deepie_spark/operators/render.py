"""Prediction sink renderers (S7 / P10 / P11).

Spark re-expression of the reference's best-epoch output files
(``saving`` rnnRE.py:583-640):

* :func:`render_tagged_sentences` — P10 ``generateSent``
  (rnnRE.py:606-622): one text line per record,
  ``id<TAB>sentence with <ent1-type=X>w</ent1> … <TAB>gold<TAB>pred<TAB>
  __TRUE_|__FALSE_``; words re-joined with ``_`` (inverse of the
  ``'_'→' '`` vocab normalization), pad ids skipped, entity heads
  wrapped in ``<ent{1,2}-type=…>`` markup.  The reference's if/elif
  gives pos1 precedence when pos1 == pos2.
* :func:`render_probability_rows` — P11 ``generateProb``
  (rnnRE.py:624-629): ``id<TAB>label:prob … <TAB>gold``.

Both are pure column expressions (``transform``/``concat_ws``) — the
sink itself is ``df.write.text`` / parquet, executed wherever the
predictions already live; no collect, no python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _underscore(w: Column) -> Column:
    """'_'.join(w.split()) — re-compact multi-word vocab entries."""
    return F.regexp_replace(w, " ", "_")


def render_tagged_sentences(
    preds: DataFrame,
    tokens_col: str = "tokens",
    pos1_col: str = "pos1",
    pos2_col: str = "pos2",
    type1_col: str = "type1",
    type2_col: str = "type2",
    id_col: str = "rel_id",
    gold_col: str = "gold",
    pred_col: str = "pred",
) -> DataFrame:
    """→ (rel_id, line): the reference's tagged-sentence output rows."""
    toks = F.col(tokens_col)
    pos1, pos2 = F.col(pos1_col), F.col(pos2_col)

    def render_tok(w, i):
        word = _underscore(w)
        ent1 = F.concat(
            F.lit("<ent1-type="), F.col(type1_col), F.lit(">"),
            word, F.lit("</ent1>"),
        )
        ent2 = F.concat(
            F.lit("<ent2-type="), F.col(type2_col), F.lit(">"),
            word, F.lit("</ent2>"),
        )
        # if/elif order: pos1 wins when pos1 == pos2 (rnnRE.py:613-617)
        return F.when(i == pos1, ent1).when(i == pos2, ent2).otherwise(word)

    sent = F.concat_ws(" ", F.transform(toks, render_tok))
    match = F.when(
        F.col(pred_col) == F.col(gold_col), F.lit("__TRUE_")
    ).otherwise(F.lit("__FALSE_"))
    line = F.concat_ws(
        "\t",
        F.col(id_col).cast("string"),
        sent,
        F.col(gold_col),
        F.col(pred_col),
        match,
    )
    return preds.select(F.col(id_col).alias("rel_id"), line.alias("line"))


def render_probability_rows(
    preds: DataFrame,
    label_names: list[str],
    probs_col: str = "probs",
    id_col: str = "rel_id",
    gold_col: str = "gold",
) -> DataFrame:
    """→ (rel_id, line): per-class probability rows, labels in id order."""
    labels = F.array(*[F.lit(l) for l in label_names])
    pairs = F.zip_with(
        labels,
        F.col(probs_col),
        lambda l, p: F.concat(l, F.lit(":"), p.cast("string")),
    )
    line = F.concat_ws(
        "\t",
        F.col(id_col).cast("string"),
        F.concat_ws(" ", pairs),
        F.col(gold_col),
    )
    return preds.select(F.col(id_col).alias("rel_id"), line.alias("line"))
