"""Deterministic negative sampling for KG-embedding training.

TransE-family training (Bordes et al. 2013) consumes each positive
(subj, pred, obj) triple together with k corrupted negatives whose
object is replaced by a random catalog entity, filtered so the
corruption is not the true object.  At 10^12-triple scale the naive
approach — join the triples against a shuffled entity table, or call a
Python RNG per row — either shuffles the full corpus or falls off the
JVM fast path and is non-reproducible across retries/partitionings.

This implements hash-based filtered corruption instead: the candidate
index is ``char_poly_hash(row identity ‖ sample index) mod n_candidates``
over the portable BASE/MOD polynomial hash (functions.text — the same
hash every DuckDB-gated query shares), and the candidate array is a
PLAN LITERAL (the entity catalog is the bounded dimension the pipeline
already broadcasts as a trie).  The whole operator is one
posexplode(sequence) + codegen expressions: map-only, zero shuffle,
zero Python, bit-identical on reruns and across engines — the DuckDB
oracle replays the identical arithmetic.

Filtered-sampling rule: if the hashed candidate equals the true object,
step to the next index (mod n).  Candidates are distinct, so one step
always suffices; the slight probability tilt toward the successor of
the true object is the standard price of collision-free determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import char_poly_hash


def corrupt_objects(
    triples: DataFrame,
    candidates: list[str],
    k: int = 2,
    id_cols: tuple[str, ...] = ("doc_id", "pos1", "pos2"),
) -> DataFrame:
    """Append ``k`` corrupted-object negatives per positive triple.

    Output: the ``id_cols`` + (subj, pred, obj, neg_id, neg_obj) with
    neg_id in [0, k) and neg_obj drawn from ``candidates`` (a bounded,
    driver-known entity list — e.g. the alias catalog) such that
    neg_obj != obj."""
    n = len(candidates)
    arr = F.array(*[F.lit(c) for c in candidates])
    t = triples.select(
        *id_cols,
        "subj",
        "pred",
        "obj",
        F.posexplode(
            F.array_repeat(F.lit(1), k)
        ).alias("neg_id", "_one"),
    )
    key: Column = F.concat_ws(
        "|",
        *[F.col(c).cast("string") for c in id_cols],
        F.col("subj"),
        F.col("pred"),
        F.col("obj"),
        F.col("neg_id").cast("string"),
    )
    idx = F.pmod(char_poly_hash(key), F.lit(n))
    cand = F.element_at(arr, (idx + 1).cast("int"))
    shifted = F.element_at(arr, (F.pmod(idx + 1, F.lit(n)) + 1).cast("int"))
    neg = F.when(cand == F.col("obj"), shifted).otherwise(cand)
    return t.select(
        *id_cols,
        "subj",
        "pred",
        "obj",
        F.col("neg_id").cast("long").alias("neg_id"),
        neg.alias("neg_obj"),
    )
