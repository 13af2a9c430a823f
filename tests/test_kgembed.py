"""TransE pseudo-embedding link-ranking eval — python brute-force twin."""


def _poly(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % (2**31 - 1)
    return h


def _emb(name: str, dim: int = 4) -> list[int]:
    return [_poly(f"{name}#{d}") % 17 - 8 for d in range(4)][:dim]


def test_transe_link_ranking_vs_bruteforce(spark):
    from deepie_spark.operators.kgembed import (
        MRR_SCALE,
        transe_link_ranking,
    )

    triples = [
        ("a", "likes", "b"),
        ("a", "likes", "c"),   # second true tail of (a, likes)
        ("b", "knows", "c"),
        ("c", "knows", "a"),
        ("d", "likes", "a"),
        ("b", "knows", "c"),   # duplicate: distinct-SPO must collapse
    ]
    df = spark.createDataFrame(triples, ["subj", "pred", "obj"])
    r = transe_link_ranking(df).collect()[0]

    spo = sorted(set(triples))
    ents = sorted({s for s, _, _ in spo} | {o for _, _, o in spo})
    tails = {}
    for s, p, o in spo:
        tails.setdefault((s, p), set()).add(o)

    def energy(s, p, t):
        h, rv, tv = _emb(s), _emb(p), _emb(t)
        return sum(abs(h[d] + rv[d] - tv[d]) for d in range(4))

    ranks = []
    for s, p, o in spo:
        e_true = energy(s, p, o)
        beaten = 0
        for c in ents:
            if c == o or c in tails[(s, p)]:
                continue
            e_c = energy(s, p, c)
            if e_c < e_true or (e_c == e_true and c < o):
                beaten += 1
        ranks.append(beaten + 1)

    assert r.n_triples == len(spo) == 5
    assert r.n_entities == len(ents) == 4
    assert r.hits1 == sum(1 for k in ranks if k <= 1)
    assert r.hits3 == sum(1 for k in ranks if k <= 3)
    assert r.hits10 == sum(1 for k in ranks if k <= 10)
    assert r.mean_rank == round(sum(ranks) / len(ranks), 6)
    mrr_fp = sum(MRR_SCALE // k for k in ranks)
    assert r.mrr_fp == mrr_fp
    assert r.mrr == round(mrr_fp / (len(ranks) * MRR_SCALE), 6)
    # the filtered setting is exercised: (a, likes) has two true tails
    assert len(tails[("a", "likes")]) == 2


def test_pseudo_embedding_range_and_determinism(spark):
    import pyspark.sql.functions as F

    from deepie_spark.operators.kgembed import EMB_R, pseudo_embedding_cols

    df = spark.createDataFrame(
        [("alpha",), ("beta",), ("alpha",)], ["name"]
    )
    out = df.select(
        "name", *pseudo_embedding_cols(F.col("name"), 4)
    ).collect()
    by_name = {}
    for row in out:
        coords = tuple(row[f"e{d}"] for d in range(4))
        assert all(-EMB_R <= c <= EMB_R for c in coords)
        assert coords == tuple(_emb(row["name"]))
        by_name.setdefault(row["name"], set()).add(coords)
    # identical names always map to identical coordinates
    assert all(len(v) == 1 for v in by_name.values())
