"""Entity-link disambiguation tests: prior vs context-affinity tradeoff
and deterministic tie-breaking.
"""

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.linking import link_mentions


@pytest.fixture(scope="module")
def catalog(spark):
    return spark.createDataFrame(
        [
            (1, "bank", "ORG", 0.7, ["money", "loan"]),
            (2, "bank", "LOC", 0.3, ["river", "water"]),
            (3, "apple", "ORG", 0.6, ["iphone"]),
        ],
        "entity_id long, alias string, entity_type string, prior double,"
        " cues array<string>",
    )


def occ_from_texts(spark, texts):
    df = spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(texts)],
        "doc_id long, toks array<string>",
    )
    return df.select(
        "doc_id", "toks", F.posexplode("toks").alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("long"))


def links(spark, catalog, texts):
    occ = occ_from_texts(spark, texts)
    return {
        (r["doc_id"], r["pos"]): (r["entity_id"], r["entity_type"], r["score"])
        for r in link_mentions(occ, catalog).collect()
    }


def test_prior_wins_without_context(spark, catalog):
    got = links(spark, catalog, ["the bank opened today"])
    eid, etype, _ = got[(0, 1)]
    assert (eid, etype) == (1, "ORG")  # higher prior, no cues present


def test_context_overrides_prior(spark, catalog):
    got = links(spark, catalog, ["the river bank water was cold"])
    eid, etype, score = got[(0, 2)]
    # LOC: 0.5*0.3 + 0.5*(2/2) = 0.65 > ORG: 0.5*0.7 = 0.35
    assert (eid, etype) == (2, "LOC")
    assert score == pytest.approx(0.65)


def test_context_window_bounds(spark, catalog):
    # cue outside the +-3 window must not count
    got = links(
        spark, catalog, ["river x1 x2 x3 x4 bank money near here"]
    )
    eid, etype, _ = got[(0, 5)]
    # 'river' at distance 5 is outside; 'money' at +1 is inside → ORG
    assert (eid, etype) == (1, "ORG")


def test_window_symmetric_at_sentence_start(spark, catalog):
    """Boundary clamping must shrink the window, not shift it: a
    sentence-initial mention may not see tokens beyond +window."""
    # 'bank' at pos 0; 'river' and 'water' at positions 4 and 5 — past
    # the +3 window; with a fixed-length slice they would leak in and
    # flip the link to LOC
    got = links(spark, catalog, ["bank x1 x2 x3 river water here"])
    eid, etype, score = got[(0, 0)]
    assert (eid, etype) == (1, "ORG")  # prior decides; no cues in ±3
    assert score == pytest.approx(0.35)


def test_unambiguous_and_unmatched(spark, catalog):
    got = links(spark, catalog, ["apple pie with no match"])
    assert got[(0, 0)][0] == 3
    assert len(got) == 1  # only catalog aliases link


def test_deterministic_tiebreak(spark):
    cat = spark.createDataFrame(
        [
            (9, "x", "A", 0.5, ["q"]),
            (4, "x", "B", 0.5, ["q"]),
        ],
        "entity_id long, alias string, entity_type string, prior double,"
        " cues array<string>",
    )
    got = links(spark, cat, ["x alone"])
    assert got[(0, 0)][0] == 4  # equal scores → min entity_id


# ---------------------------------------------------------------------------
# Fellegi–Sunter weights
# ---------------------------------------------------------------------------


def test_fellegi_sunter_weights_hand_counts(spark):
    import math

    from deepie_spark.operators.linking import fellegi_sunter_weights

    # 4 matches, 6 non-matches; f1 agrees on 3 matches + 1 non-match,
    # f2 agrees on 1 match + 5 non-matches
    rows = []
    for i in range(4):
        rows.append((True, i < 3, i < 1))
    for i in range(6):
        rows.append((False, i < 1, i < 5))
    df = spark.createDataFrame(rows, ["is_match", "f1", "f2"])
    got = {
        r.feature: (r.m_num, r.m_den, r.u_num, r.u_den,
                    r.w_agree, r.w_disagree)
        for r in fellegi_sunter_weights(
            df, "is_match", ["f1", "f2"]
        ).collect()
    }

    def w(mn, md, un, ud):
        return (
            round(math.log(((mn + 1) * (ud + 2)) / ((un + 1) * (md + 2))), 6),
            round(
                math.log(
                    ((md - mn + 1) * (ud + 2)) / ((ud - un + 1) * (md + 2))
                ),
                6,
            ),
        )

    assert got == {
        "f1": (3, 4, 1, 6) + w(3, 4, 1, 6),
        "f2": (1, 4, 5, 6) + w(1, 4, 5, 6),
    }
    # f1 is match-indicative (positive agreement weight), f2 the reverse
    assert got["f1"][4] > 0 > got["f2"][4]


def test_fellegi_sunter_zero_cells_stay_finite(spark):
    from deepie_spark.operators.linking import fellegi_sunter_weights

    rows = [(True, True), (True, True), (False, False)]
    df = spark.createDataFrame(rows, ["is_match", "f"])
    r = fellegi_sunter_weights(df, "is_match", ["f"]).collect()[0]
    # u_num = 0 and m disagreements = 0 → smoothing keeps both finite
    assert (r.m_num, r.m_den, r.u_num, r.u_den) == (2, 2, 0, 1)
    import math

    assert math.isfinite(r.w_agree) and math.isfinite(r.w_disagree)


def test_mutual_nn_pairs_python_twin(spark):
    import math

    import numpy as np

    from deepie_spark.operators.linking import mutual_nn_pairs

    rng = np.random.RandomState(23)
    base = rng.normal(0, 1, size=(10, 6))
    # right = noisy copies of left (planted 1:1 alignment) + 2 decoys
    lrows = [(2 * i, [float(np.float32(x)) for x in base[i]]) for i in range(10)]
    rrows = [
        (
            2 * i + 1,
            [
                float(np.float32(x + rng.normal(0, 0.05)))
                for x in base[i]
            ],
        )
        for i in range(10)
    ] + [
        (101, [float(np.float32(x)) for x in rng.normal(5, 1, 6)]),
        (103, [float(np.float32(x)) for x in rng.normal(-5, 1, 6)]),
    ]
    schema = "vec_id long, embedding array<float>"
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)
    got = {(r.a, r.b): r for r in mutual_nn_pairs(left, right).collect()}

    # twin with the same fixed-point quantization
    SC = float(1 << 40)

    def cfp(x, y):
        d = sum(a * b for a, b in zip(x, y))
        nx = math.sqrt(sum(a * a for a in x))
        ny = math.sqrt(sum(b * b for b in y))
        return math.floor(d / (nx * ny) * SC)

    lv = dict(lrows)
    rv = dict(rrows)
    best_b = {
        a: min(rv, key=lambda b: (-cfp(lv[a], rv[b]), b)) for a in lv
    }
    best_a = {
        b: min(lv, key=lambda a: (-cfp(lv[a], rv[b]), a)) for b in rv
    }
    want = {
        (a, b)
        for a, b in best_b.items()
        if best_a[b] == a
    }
    assert set(got) == want
    # the planted noisy-copy alignment is recovered for every pair
    assert {(2 * i, 2 * i + 1) for i in range(10)} <= set(got)
    # decoys matched nothing mutually
    assert all(b not in (101, 103) for _, b in got)
    for (a, b), r in got.items():
        assert r.fp == cfp(lv[a], rv[b])
        assert r.cosine == round(r.fp / SC, 6)


def test_hard_triplets_picks_hardest_and_flags_violations(spark):
    """Planted geometry: anchor 1 has a near-identical positive (2)
    and a closer-than-positive negative (3) -> violation; anchor 4's
    negative is far -> no violation; singleton-label 5 is dropped."""
    from deepie_spark.operators.linking import hard_triplets

    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.9, 0.0, 0.1]),       # positive of 1 (cos ~ 0.994)
        (3, 1, [0.99, 0.01, 0.0]),     # negative of 1, even closer
        (4, 1, [0.0, 1.0, 0.0]),       # its positive is 3 (cos ~ 0.01);
                                       # every cross-label vec is ~ orthogonal
        (5, 2, [0.0, 0.0, 1.0]),       # singleton label: no positive
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, "
                                     "embedding array<float>")
    got = {r["anchor"]: r for r in hard_triplets(df).collect()}
    assert set(got) == {1, 2, 3, 4}     # 5 dropped (no positive)
    assert got[1]["pos_id"] == 2 and got[1]["neg_id"] == 3
    assert got[1]["violation"] is True
    assert got[1]["margin_fp"] == got[1]["pos_fp"] - got[1]["neg_fp"]
    assert got[4]["pos_id"] == 3
    assert got[4]["violation"] is False
    # cosines are the fp values rescaled
    assert abs(got[1]["pos_cos"] - got[1]["pos_fp"] / float(1 << 40)) < 1e-6
