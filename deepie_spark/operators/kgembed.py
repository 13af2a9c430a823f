"""Deterministic KG-embedding evaluation (TransE-family link ranking).

The reference's joint entity-relation pipeline feeds triples into
embedding training; the evaluation loop that matters downstream is
filtered link ranking (Bordes et al. 2013): for every true
(subj, pred, obj), rank the true object among all candidate entities
by the energy E(h, r, t) = ‖h + r − t‖₁, skipping candidates that are
themselves true objects for the same (subj, pred) ("filtered"
setting), then report hits@k / mean rank / MRR.

At 10^12-triple scale the eval cost is triples × candidate-entities;
the entity side is the bounded dimension (the same catalog the
pipeline broadcasts as a trie), so the pair stage is a broadcast
join, never a shuffle of the triple corpus.

Everything here is bit-reproducible and engine-portable: embeddings
are PSEUDO-embeddings derived per (name, dimension) from the portable
BASE/MOD polynomial hash (functions.text — the same hash every
DuckDB-gated query shares), so coordinates are small exact integers,
every energy is an exact long (a fixed chain of |·| terms), ranks are
exact tie-broken counts, and MRR accumulates as Σ 2⁴⁰ DIV rank — the
link_prediction fixed-point rule — so the final ratio is a ratio of
exact longs.  A trained-float-embedding eval would swap the
pseudo-embedding join for a real vector table and keep the identical
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import char_poly_hash

#: embedding coordinates live in [−EMB_R, EMB_R]
EMB_R = 8
EMB_MOD = 2 * EMB_R + 1
#: fixed-point scale for the MRR accumulator (integer DIV)
MRR_SCALE = 1 << 40


def pseudo_embedding_cols(name_col, dim: int) -> list:
    """dim exact-integer coordinates for ``name_col``: coordinate d is
    (char_poly_hash(name ‖ '#d') mod (2R+1)) − R."""
    return [
        (
            char_poly_hash(F.concat(name_col, F.lit(f"#{d}")))
            % EMB_MOD
            - EMB_R
        )
        .cast("long")
        .alias(f"e{d}")
        for d in range(dim)
    ]


def transe_link_ranking(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    dim: int = 4,
) -> DataFrame:
    """Filtered TransE link-ranking eval over distinct (s, p, o).

    rank(s,p,o) = 1 + #{candidate c : c ∉ true_tails(s,p) and
                        (E(s,p,c), c) < (E(s,p,o), o)}

    with E the exact-long L1 energy of the pseudo-embeddings and the
    candidate pool = every distinct entity (subjects ∪ objects).
    Output: one row (n_triples, n_entities, hits1, hits3, hits10,
    mean_rank, mrr_fp, mrr)."""
    spo = triples.select(
        F.col(subj_col).alias("s"),
        F.col(pred_col).alias("p"),
        F.col(obj_col).alias("o"),
    ).distinct()
    ents = (
        spo.select(F.col("s").alias("ent"))
        .unionByName(spo.select(F.col("o").alias("ent")))
        .distinct()
    )
    h = ents.select(
        F.col("ent").alias("s"),
        *[
            c.alias(f"h{d}")
            for d, c in enumerate(
                pseudo_embedding_cols(F.col("ent"), dim)
            )
        ],
    )
    t = ents.select(
        F.col("ent").alias("c"),
        *[
            c.alias(f"t{d}")
            for d, c in enumerate(
                pseudo_embedding_cols(F.col("ent"), dim)
            )
        ],
    )
    r = spo.select("p").distinct().select(
        "p",
        *[
            c.alias(f"r{d}")
            for d, c in enumerate(pseudo_embedding_cols(F.col("p"), dim))
        ],
    )

    def energy(tail_prefix: str):
        # fixed left-associative chain of exact-long |h_d + r_d − t_d|
        chain = None
        for d in range(dim):
            term = F.abs(
                F.col(f"h{d}") + F.col(f"r{d}") - F.col(f"{tail_prefix}{d}")
            )
            chain = term if chain is None else chain + term
        return chain.cast("long")

    # true-object energy per triple
    ot = ents.select(
        F.col("ent").alias("o"),
        *[
            c.alias(f"o{d}")
            for d, c in enumerate(
                pseudo_embedding_cols(F.col("ent"), dim)
            )
        ],
    )
    base = (
        spo.join(F.broadcast(h), "s")
        .join(F.broadcast(r), "p")
        .join(F.broadcast(ot), "o")
        .withColumn("e_true", energy("o"))
        .select("s", "p", "o", *[f"h{d}" for d in range(dim)],
                *[f"r{d}" for d in range(dim)], "e_true")
    )
    # candidate pairs; filtered setting drops other true tails of (s,p)
    cand = base.join(F.broadcast(t), how="cross").filter(
        F.col("c") != F.col("o")
    )
    tt = spo.select("s", "p", F.col("o").alias("c"))
    cand = cand.join(tt, ["s", "p", "c"], "left_anti").withColumn(
        "e_cand", energy("t")
    )
    beaten = (
        (F.col("e_cand") < F.col("e_true"))
        | ((F.col("e_cand") == F.col("e_true")) & (F.col("c") < F.col("o")))
    )
    ranks = (
        cand.groupBy("s", "p", "o")
        .agg(
            F.sum(F.when(beaten, 1).otherwise(0))
            .cast("long")
            .alias("n_beaten")
        )
        # candidates filtered to zero rows would drop the triple from
        # the grouped count; re-join base so every triple ranks
        .join(base.select("s", "p", "o"), ["s", "p", "o"], "right")
        .select(
            "s",
            "p",
            "o",
            (F.coalesce(F.col("n_beaten"), F.lit(0)) + 1)
            .cast("long")
            .alias("rank"),
        )
    )
    g = ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.sum(F.when(F.col("rank") <= 1, 1).otherwise(0))
        .cast("long")
        .alias("hits1"),
        F.sum(F.when(F.col("rank") <= 3, 1).otherwise(0))
        .cast("long")
        .alias("hits3"),
        F.sum(F.when(F.col("rank") <= 10, 1).otherwise(0))
        .cast("long")
        .alias("hits10"),
        F.sum("rank").cast("long").alias("sum_rank"),
        F.sum(F.expr(f"{MRR_SCALE} DIV rank")).cast("long").alias("mrr_fp"),
    )
    ne = ents.agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
    return g.crossJoin(F.broadcast(ne)).select(
        "n_triples",
        "n_entities",
        "hits1",
        "hits3",
        "hits10",
        F.round(
            F.col("sum_rank").cast("double")
            / F.col("n_triples").cast("double"),
            6,
        ).alias("mean_rank"),
        "mrr_fp",
        F.round(
            F.col("mrr_fp").cast("double")
            / (F.col("n_triples") * F.lit(MRR_SCALE)).cast("double"),
            6,
        ).alias("mrr"),
    )
