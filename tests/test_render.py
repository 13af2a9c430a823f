"""Prediction sink renderer tests (S7/P10/P11) — exact line format per
the reference's generateSent/generateProb (rnnRE.py:606-629).
"""

import pytest

from deepie_spark.operators.render import (
    render_probability_rows,
    render_tagged_sentences,
)


@pytest.fixture(scope="module")
def preds(spark):
    rows = [
        (
            "7",
            ["Radio", "station", "DXDC", "in", "Manila"],
            2,
            4,
            "ORG",
            "GPE",
            "GEN-AFF(e1,e2)",
            "GEN-AFF(e1,e2)",
            [0.1, 0.7, 0.2],
        ),
        (
            "8",
            ["a", "multi word", "token"],
            1,
            1,
            "PER",
            "PER",
            "NONE",
            "PER-SOC",
            [0.5, 0.25, 0.25],
        ),
    ]
    return spark.createDataFrame(
        rows,
        "rel_id string, tokens array<string>, pos1 int, pos2 int,"
        " type1 string, type2 string, gold string, pred string,"
        " probs array<double>",
    )


def test_tagged_sentence_format(preds):
    got = {
        r["rel_id"]: r["line"]
        for r in render_tagged_sentences(preds).collect()
    }
    assert got["7"] == (
        "7\tRadio station <ent1-type=ORG>DXDC</ent1> in "
        "<ent2-type=GPE>Manila</ent2>\tGEN-AFF(e1,e2)\tGEN-AFF(e1,e2)"
        "\t__TRUE_"
    )


def test_tagged_sentence_pos1_wins_and_underscore(preds):
    got = {
        r["rel_id"]: r["line"]
        for r in render_tagged_sentences(preds).collect()
    }
    # pos1 == pos2 → ent1 markup only (if/elif); 'multi word' re-joined
    assert got["8"] == (
        "8\ta <ent1-type=PER>multi_word</ent1> token\tNONE\tPER-SOC"
        "\t__FALSE_"
    )


def test_probability_rows(preds):
    got = {
        r["rel_id"]: r["line"]
        for r in render_probability_rows(
            preds, ["NONE", "PER-SOC", "PHYS"]
        ).collect()
    }
    assert got["7"] == "7\tNONE:0.1 PER-SOC:0.7 PHYS:0.2\tGEN-AFF(e1,e2)"
    assert got["8"] == "8\tNONE:0.5 PER-SOC:0.25 PHYS:0.25\tNONE"


def test_renderers_write_as_text(preds, tmp_path):
    out = str(tmp_path / "best_txt")
    render_tagged_sentences(preds).select("line").write.text(out)
    lines = set()
    import glob

    for p in glob.glob(out + "/part-*"):
        with open(p) as f:
            lines.update(l.rstrip("\n") for l in f if l.strip())
    assert len(lines) == 2
    assert any(l.startswith("7\t") for l in lines)
