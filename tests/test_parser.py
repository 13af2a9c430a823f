"""Parser unit tests against the 150 reference fixture lines.

The reference's inline exit() invariants (SURVEY.md §5) are asserted for
every line of every fixture file; spot checks pin exact field values.
"""

import glob
import os

import pytest

from deepie_spark.sources.tsv_corpus import (
    FULL_SCAN_ORDER,
    MAIN_CORPORA,
    analyze_dep_path,
    parse_line,
    parse_score,
)
from tests.conftest import REFERENCE_DATA


def iter_fixture_lines():
    for corpus in FULL_SCAN_ORDER:
        path = os.path.join(REFERENCE_DATA, corpus + ".full.txt")
        with open(path) as f:
            for i, line in enumerate(f):
                line = line.strip()
                if line:
                    yield corpus, i, line


ALL_LINES = None


def all_lines():
    global ALL_LINES
    if ALL_LINES is None:
        ALL_LINES = list(iter_fixture_lines())
    return ALL_LINES


def test_fixture_count():
    assert len(all_lines()) == 150  # 15 files x 10 lines


def test_parse_all_lines_invariants():
    for corpus, i, line in all_lines():
        rec = parse_line(corpus, line)
        n = len(rec["tokens"])
        assert n > 0
        # token-aligned annotations (rnn_process_onlyExtra.py:323-329,423-461)
        assert len(rec["cons1"]) == n
        assert len(rec["cons2"]) == n
        assert len(rec["grammar"]) == n
        assert len(rec["governors"]) == n
        assert len(rec["preter"]) == n
        assert len(rec["prepreter"]) == n
        # entity position = last token of mention (readMe.md:31)
        assert 0 <= rec["pos1"] < n and 0 <= rec["pos2"] < n
        # dep-path endpoints == entity positions (:450-452)
        assert rec["dep_idx"][0] == rec["pos1"]
        assert rec["dep_idx"][-1] == rec["pos2"]
        assert len(rec["dep_tokens"]) == len(rec["dep_idx"])
        # dep rels: one fewer than words unless degenerate path
        assert len(rec["dep_rels"]) in (
            len(rec["dep_tokens"]) - 1,
            1,
        )
        assert rec["corpus"] == corpus
        # labels collapsed for PHYS/PER-SOC only (:312-313)
        if rec["label"].startswith(("PHYS", "PER-SOC")):
            assert "(" not in rec["label"]


def test_parse_first_line_exact():
    corpus, _, line = all_lines()[0]
    rec = parse_line(corpus, line)
    assert rec["rel_id"] == "0"
    assert rec["label"] == "NONE"
    assert rec["detector_label"] == "O"
    assert rec["type1"] == "ORG" and rec["type2"] == "PER"
    assert rec["subtype1"] == "NAM" and rec["subtype2"] == "NOM"
    assert rec["tokens"][:3] == ["Radio", "station", "DXDC"]
    # DXDC is token 2 (B-ORG.NAM#1), officials token 19 (B-PER.NOM#2)
    assert rec["pos1"] == 2
    assert rec["pos2"] == 19
    assert rec["qid"] == "qid:0"
    assert rec["bin_feats"][0] == "WBF=placed"
    assert rec["kernel_pred"] == "NONE"
    assert rec["kernel_score"]["PHYS(e1,e2)"] == pytest.approx(-2.9450228)
    # dep path: DXDC-3 nsubj' placed-4 ... → 0-based, endpoints 2 and 19
    assert rec["dep_idx"][0] == 2 and rec["dep_idx"][-1] == 19
    assert rec["dep_rels"][0] == "nsubj'"


def test_label_direction_semantics():
    # PHYS/PER-SOC collapse strips direction; others keep it
    seen = set()
    for corpus, _, line in all_lines():
        seen.add(parse_line(corpus, line)["label"])
    assert "PHYS" in seen
    assert not any(l.startswith("PHYS(") for l in seen)
    directed = {l for l in seen if "(" in l}
    assert directed  # e.g. PART-WHOLE(e2,e1)
    assert all(l.endswith(("(e1,e2)", "(e2,e1)")) for l in directed)


def test_dep_triples_field12():
    corpus, _, line = all_lines()[0]
    # fixture order: fold files first in all_lines? find a main-corpus line
    for corpus, _, line in all_lines():
        if corpus == "bn_nw":
            break
    rec = parse_line(corpus, line)
    trips = rec["dep_triples"]
    assert trips, "main corpora carry field 12"
    t0 = trips[0]
    assert set(t0) == {"rel", "gov", "gov_i", "dep", "dep_i"}
    assert t0["rel"] == "root"
    assert t0["gov_i"] == -1  # root's pseudo-governor '.-0' → 0-based -1
    # fold layout has no field 12
    for corpus, _, line in all_lines():
        if corpus.startswith("bn_nw_train"):
            assert parse_line(corpus, line)["dep_triples"] == []
            break


def test_analyze_dep_path_reversal():
    words, rels, idxs = analyze_dep_path("b-5 rel1 a-2 rel2 c-1")
    # path ends left of start → reversed (rnn_process_onlyExtra.py:508-511)
    assert idxs == [0, 1, 4]
    assert words == ["c", "a", "b"]
    assert rels == ["rel2", "rel1"]


def test_analyze_dep_path_null():
    assert analyze_dep_path("__NULL__") == (None, None, None)


def test_parse_score():
    assert parse_score("A:1.5 B:-2.0 C:0:3.5") == {
        "A": 1.5,
        "B": -2.0,
        "C:0": 3.5,
    }


def test_spark_read_corpus(spark):
    from deepie_spark.sources.tsv_corpus import main_corpus_records, read_corpus

    df = read_corpus(spark, REFERENCE_DATA)
    rows = df.collect()
    assert len(rows) == 150
    main = main_corpus_records(df)
    assert main.count() == 50  # 5 main corpora x 10 lines
    by_key = {(r["corpus"], r["line_no"]): r for r in rows}
    # cross-check every row against the pure parser
    for corpus, i, line in all_lines():
        rec = parse_line(corpus, line)
        row = by_key[(corpus, i)]
        assert row["label"] == rec["label"]
        assert row["pos1"] == rec["pos1"] and row["pos2"] == rec["pos2"]
        assert list(row["tokens"]) == rec["tokens"]
        assert list(row["dep_idx"]) == rec["dep_idx"]
