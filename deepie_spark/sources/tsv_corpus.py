"""Reference-format relation-mention corpus scan (operator S1 + P1/P2/P3).

Reads the ACE-2005-style TSV corpus format of the reference system
(format doc: reference ``rnnRE/data/readMe.md:20-41``; parsing semantics:
``rnnRE/rnn_process_onlyExtra.py:283-512`` — ``parseLine``,
``analyzeDepPath``, ``parseScore``).  This module is a brand-new
implementation of those *semantics*:

* one relation mention per TSV line; the five main corpora
  (``bn_nw bc0 bc1 cts wl``) carry 14 tab fields, the cross-validation
  fold files carry 12 (the constituent-subtree string is absent and the
  sparse binary features sit at field 2 instead of 4 —
  ``rnn_process_onlyExtra.py:285-310``);
* the position of an entity mention is its **last** token
  (``data/readMe.md:31``, ``rnn_process_onlyExtra.py:395-396``);
* ``PHYS*`` / ``PER-SOC*`` labels are collapsed to their undirected form
  at parse time (``rnn_process_onlyExtra.py:312-313``); other labels keep
  their ``(e1,e2)``/``(e2,e1)`` direction suffix until the optional
  train-time collapse (``rnnRE.py:642-647``);
* the dependency path alternates ``word-idx`` / ``rel`` tokens, converts
  1-based indices to 0-based, and is reversed when it runs right-to-left
  (``rnn_process_onlyExtra.py:491-512``); endpoints must equal
  pos1/pos2 (``:450-452``);
* missing constituent / preterminal / prepreterminal annotations default
  to per-token ``Other`` (``:408-435``); missing dep path degenerates to
  the two entity head tokens (``:437-448``).

Spark realization: ``spark.read.text`` with ``input_file_name()`` for the
corpus name, then one Arrow-batched ``mapInPandas`` pass running the pure
parser below.  The parser is a pure function (line → record dict) so it is
unit-testable without Spark and reusable by the golden generator.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the five main corpora (reference `testingDataCorpus`,
#: rnn_process_onlyExtra.py:11); fold files use the shifted field layout
#: and contribute only to vocabularies, not to the record stream (P6,
#: rnn_process_onlyExtra.py:207).
MAIN_CORPORA = ("bn_nw", "bc0", "bc1", "cts", "wl")

#: reference scan order for 'full' mode (rnn_process_onlyExtra.py:645-651)
#: — pinned because first-encounter dictionary ids depend on it.
FULL_SCAN_ORDER = (
    "bn_nw", "bc0", "bc1", "cts", "wl",
    "bn_nw_train0", "bn_nw_train1", "bn_nw_train2", "bn_nw_train3",
    "bn_nw_train4",
    "bn_nw_test0", "bn_nw_test1", "bn_nw_test2", "bn_nw_test3",
    "bn_nw_test4",
)


def parse_score(s: str) -> dict[str, float]:
    """``LABEL:score LABEL:score …`` → dict (P9; parseScore :465-472)."""
    out: dict[str, float] = {}
    for tok in s.split():
        cut = tok.rfind(":")
        out[tok[:cut]] = float(tok[cut + 1 :])
    return out


def analyze_dep_path(dep: str):
    """Dependency-path string → (words, rels, 0-based idxs) (P2).

    Semantics of ``analyzeDepPath`` (rnn_process_onlyExtra.py:491-512):
    even positions are ``word-idx`` tokens (1-based idx), odd positions
    are relation labels; the whole path is reversed if it ends left of
    where it starts.  Returns (None, None, None) for an absent path.
    """
    if not dep or dep == "__NULL__":
        return None, None, None
    toks = dep.split()
    words, rels, idxs = [], [], []
    for i, el in enumerate(toks):
        if i % 2 == 0:
            cut = el.rfind("-")
            if cut < 0:
                raise ValueError(f"no - separator in dep path token: {el!r}")
            words.append(el[:cut])
            idxs.append(int(el[cut + 1 :]) - 1)
        else:
            rels.append(el)
    if idxs[-1] < idxs[0]:
        words, rels, idxs = words[::-1], rels[::-1], idxs[::-1]
    return words, rels, idxs


def parse_line(corpus: str, line: str) -> dict:
    """One TSV line → relation-mention record (P1).

    Reference semantics: ``parseLine`` rnn_process_onlyExtra.py:283-463.
    All reference fail-fast ``exit()`` invariants become ``ValueError``.
    Output arrays hold *strings*; dictionary-id assignment is a separate
    relational operator (deepie_spark.operators.dictionary), unlike the
    reference which interleaves both in one pass.
    """
    els = line.rstrip("\n").split("\t")
    main = corpus in MAIN_CORPORA
    if main:
        rel_id, label = els[0], els[1]
        ans = els[5].split()
        constit = els[6].split()
        preter, prepreter, dep, gra = els[7], els[8], els[9], els[10]
        gov = els[11].strip()
        features = els[4]
    else:
        rel_id, label = els[0], els[1]
        ans = els[4].split()
        constit = els[5].split()
        preter, prepreter, dep, gra = els[6], els[7], els[8], els[9]
        gov = els[10].strip()
        features = els[2]

    if label.startswith("PHYS"):
        label = "PHYS"
    if label.startswith("PER-SOC"):
        label = "PER-SOC"

    if len(els) >= 14:
        kernel = els[13]
        cut = kernel.find(" ")
        kernel_pred = kernel[:cut]
        kernel_score = parse_score(kernel[cut + 1 :])
    else:
        kernel_pred = "__UNDEFINED__"
        kernel_score = {}

    if len(ans) != len(constit) and constit[0] != "__NULL__":
        raise ValueError("annotation and constituent lengths not matched")
    if len(ans) != len(preter.split()) and preter != "__NULL__":
        raise ValueError("annotation and preterminal lengths not matched")

    cut = features.find(" ")
    qid = features[:cut]
    bin_feats = features[cut + 1 :].split()

    detector_label = "O" if label == "NONE" else "1"

    type1, type2 = els[3].split("@")[0], els[3].split("@")[1]
    subtype1 = subtype2 = "O"

    tokens: list[str] = []
    e1_pos: list[int] = []
    e2_pos: list[int] = []
    for i, an in enumerate(ans):
        sep = an.rfind("/")
        if sep < 0:
            raise ValueError(f"no / separator in token: {an!r}")
        w, ty = an[:sep], an[sep + 1 :]
        if ty != "O":
            if ty.rfind("#") < 0:
                raise ValueError(f"no # separator in tag: {an!r}")
            ent = int(ty[ty.rfind("#") + 1 :])
            if ent not in (1, 2):
                raise ValueError(f"bad entity indicator: {an!r}")
            etype = ty[: ty.rfind("#")]
            sty = "O"
            if etype.rfind(".") >= 0:
                sty = etype[etype.rfind(".") + 1 :]
                etype = etype[: etype.rfind(".")]
            if etype.find("-") >= 0:
                etype = etype[etype.find("-") + 1 :]
            if ent == 1:
                if etype != type1:
                    raise ValueError(f"type1 mismatch: {etype} != {type1}")
                e1_pos.append(i)
                subtype1 = sty
            else:
                if etype != type2:
                    raise ValueError(f"type2 mismatch: {etype} != {type2}")
                e2_pos.append(i)
                subtype2 = sty
        tokens.append(w)

    if not e1_pos and not e2_pos:
        raise ValueError("cannot find entity indexes")
    if not e1_pos:
        e1_pos = e2_pos
    elif not e2_pos:
        e2_pos = e1_pos
    pos1, pos2 = e1_pos[-1], e2_pos[-1]  # last-token rule (:395-396)

    if type1 == "O":
        type1 = "Other"
    if type2 == "O":
        type2 = "Other"
    if subtype1 == "O":
        subtype1 = "Other"
    if subtype2 == "O":
        subtype2 = "Other"

    n = len(tokens)
    if constit[0] != "__NULL__":
        cons1, cons2 = [], []
        for con in constit:
            parts = con.split("--")
            if len(parts) != 2:
                raise ValueError(f"constit without two parts: {con!r}")
            cons1.append(parts[0])
            cons2.append(parts[1])
    else:
        cons1 = ["Other"] * n
        cons2 = ["Other"] * n
    if len(cons1) != n or len(cons2) != n:
        raise ValueError("sentence / constit length mismatch")

    preter_l = preter.split() if preter != "__NULL__" else ["Other"] * n
    prepreter_l = (
        prepreter.split() if prepreter != "__NULL__" else ["Other"] * n
    )

    dep_tokens, dep_rels, dep_idx = analyze_dep_path(dep)
    if dep_tokens is None:
        if pos1 == pos2:
            dep_tokens, dep_idx, dep_rels = [tokens[pos1]], [pos1], ["Other"]
        else:
            dep_tokens = [tokens[pos1], tokens[pos2]]
            dep_idx = [pos1, pos2]
            dep_rels = ["Other"]
    if dep_idx[0] != pos1 or dep_idx[-1] != pos2:
        raise ValueError(
            f"dep path endpoints {dep_idx[0]},{dep_idx[-1]} != {pos1},{pos2}"
        )

    grammar = [ga.split("@") for ga in gra.split()]
    if len(grammar) != n:
        raise ValueError("sentence / grammar length mismatch")

    governors = gov.split()

    # field 12 (main layout only): full dependency-tree triples
    # `rel(gov-i, dep-j)######…` — provided so no parser rerun is needed
    # (data/readMe.md:39); not consumed by the neural path, parsed for
    # schema parity (FIXTURES.md §3).
    dep_triples = []
    if main and len(els) >= 13 and els[12].strip():
        for trip in els[12].split("######"):
            trip = trip.strip()
            lp = trip.find("(")
            if lp < 0 or not trip.endswith(")"):
                continue
            rel = trip[:lp]
            args = trip[lp + 1 : -1].split(", ")
            if len(args) != 2:
                continue
            gcut, dcut = args[0].rfind("-"), args[1].rfind("-")
            gi, di = args[0][gcut + 1 :], args[1][dcut + 1 :]
            if not (gi.isdigit() and di.isdigit()):
                continue  # malformed index: skip, like the other guards
            dep_triples.append(
                {
                    "rel": rel,
                    "gov": args[0][:gcut],
                    "gov_i": int(gi) - 1,
                    "dep": args[1][:dcut],
                    "dep_i": int(di) - 1,
                }
            )

    return {
        "rel_id": rel_id,
        "label": label,
        "detector_label": detector_label,
        "qid": qid,
        "bin_feats": bin_feats,
        "tokens": tokens,
        "pos1": pos1,
        "pos2": pos2,
        "type1": type1,
        "subtype1": subtype1,
        "type2": type2,
        "subtype2": subtype2,
        "cons1": cons1,
        "cons2": cons2,
        "preter": preter_l,
        "prepreter": prepreter_l,
        "dep_tokens": dep_tokens,
        "dep_rels": dep_rels,
        "dep_idx": dep_idx,
        "grammar": grammar,
        "governors": governors,
        "dep_triples": dep_triples,
        "kernel_pred": kernel_pred,
        "kernel_score": kernel_score,
        "corpus": corpus,
    }


#: Spark schema of the parsed relation-mention table (FIXTURES.md §3).
MENTION_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("detector_label", T.StringType(), False),
        T.StructField("qid", T.StringType(), True),
        T.StructField("bin_feats", T.ArrayType(T.StringType()), True),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("pos1", T.IntegerType(), False),
        T.StructField("pos2", T.IntegerType(), False),
        T.StructField("type1", T.StringType(), False),
        T.StructField("subtype1", T.StringType(), False),
        T.StructField("type2", T.StringType(), False),
        T.StructField("subtype2", T.StringType(), False),
        T.StructField("cons1", T.ArrayType(T.StringType()), True),
        T.StructField("cons2", T.ArrayType(T.StringType()), True),
        T.StructField("preter", T.ArrayType(T.StringType()), True),
        T.StructField("prepreter", T.ArrayType(T.StringType()), True),
        T.StructField("dep_tokens", T.ArrayType(T.StringType()), True),
        T.StructField("dep_rels", T.ArrayType(T.StringType()), True),
        T.StructField("dep_idx", T.ArrayType(T.IntegerType()), True),
        T.StructField(
            "grammar", T.ArrayType(T.ArrayType(T.StringType())), True
        ),
        T.StructField("governors", T.ArrayType(T.StringType()), True),
        T.StructField(
            "dep_triples",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("rel", T.StringType()),
                        T.StructField("gov", T.StringType()),
                        T.StructField("gov_i", T.IntegerType()),
                        T.StructField("dep", T.StringType()),
                        T.StructField("dep_i", T.IntegerType()),
                    ]
                )
            ),
            True,
        ),
        T.StructField("kernel_pred", T.StringType(), True),
        T.StructField(
            "kernel_score", T.MapType(T.StringType(), T.DoubleType()), True
        ),
        T.StructField("corpus", T.StringType(), False),
        T.StructField("file_order", T.IntegerType(), False),
        T.StructField("line_no", T.LongType(), False),
    ]
)

_COLS = [f.name for f in MENTION_SCHEMA.fields]


def _parse_batches(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for corpus, file_order, line_no, line in zip(
            pdf["corpus"], pdf["file_order"], pdf["line_no"], pdf["value"]
        ):
            line = line.strip()
            if not line:
                continue
            rec = parse_line(corpus, line)
            rec["file_order"] = int(file_order)
            rec["line_no"] = int(line_no)
            rows.append([rec[c] for c in _COLS])
        yield pd.DataFrame(rows, columns=_COLS)


def read_corpus(
    spark: SparkSession,
    data_dir: str,
    corpora: Iterable[str] = FULL_SCAN_ORDER,
    suffix: str = ".full.txt",
) -> DataFrame:
    """Scan reference-format corpus files into a relation-mention DataFrame.

    One ``spark.read.text`` over all files (parallel split reading at
    scale); corpus name and deterministic scan order are derived from
    ``input_file_name()`` so downstream first-encounter dictionary ids
    (operators.dictionary) are reproducible regardless of partitioning.
    ``line_no`` is the within-file line index via a window (small files;
    at web scale the ordering key would instead be a stored record id).
    """
    from pyspark.sql import Window as W

    order = {c: i for i, c in enumerate(corpora)}
    paths = [os.path.join(data_dir, c + suffix) for c in corpora]
    raw = (
        spark.read.text(paths)
        .withColumn("_file", F.input_file_name())
        .withColumn(
            "corpus",
            F.regexp_replace(
                F.element_at(F.split(F.col("_file"), "/"), -1),
                suffix.replace(".", "\\.""") + "$",
                "",
            ),
        )
    )
    order_map = F.create_map(
        *[x for c, i in order.items() for x in (F.lit(c), F.lit(i))]
    )
    raw = raw.withColumn("file_order", order_map[F.col("corpus")].cast("int"))
    w = W.partitionBy("corpus").orderBy(F.monotonically_increasing_id())
    raw = raw.withColumn("line_no", F.row_number().over(w).cast("long") - 1)
    return raw.select("corpus", "file_order", "line_no", "value").mapInPandas(
        _parse_batches, schema=MENTION_SCHEMA
    )


def main_corpus_records(df: DataFrame) -> DataFrame:
    """P6 corpus-membership filter: only main corpora yield records
    (rnn_process_onlyExtra.py:207); fold files feed vocabularies only."""
    return df.filter(F.col("corpus").isin(list(MAIN_CORPORA)))
