"""Alias/redirect chain resolution by pointer jumping.

KG canonicalization constantly materializes functional alias edges —
wiki redirects, ``sameAs`` winners, CDC renames, the dedup keeper map
(operators/dedup.py) — whose chains must be collapsed to a canonical
terminal before entity keys are usable (reference parity: the
reference collapses label aliases eagerly via its dictionary pass,
rnnRE.py:132-156; at corpus scale the alias graph arrives as edges,
not a dict).

The naive fix — walk each chain one hop per job — is O(longest chain)
sequential Spark jobs; a 30-deep redirect chain is 30 shuffles.  This
is the classic pointer-doubling formulation (Wyllie 1979; the same
trick inside small/large-star connected components): each round every
pointer jumps to its target's target, so resolved path length doubles
and the whole forest collapses in O(log chain) rounds.  Each round is
ONE key-equi self-join + a bounded 1-row convergence count, with
``localCheckpoint`` cutting lineage (the pagerank/CC rule).

Determinism: no RNG, no FP — hops are exact longs and the canonical
target is a pure function of the input mapping, so the result is
partition-invariant and oracle-gateable (the DuckDB twin walks chains
linearly with a recursive CTE — an independent formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_aliases(
    mapping: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 40,
) -> DataFrame:
    """Resolve every alias to its chain-terminal canonical id.

    ``mapping`` is a functional edge set (each ``src`` maps to exactly
    one ``dst``; duplicates are dropped, self-loops ignored, a
    genuinely ambiguous src raises).  Returns one row per alias:
    ``(src, canonical, hops)`` where ``canonical`` is the first node
    on the chain with no outgoing mapping and ``hops`` the exact
    number of original edges traversed.

    A cycle never reaches a terminal: after ``max_rounds`` doubling
    rounds (chains up to 2**max_rounds) unresolved pointers remain and
    a ``RuntimeError`` names the count rather than silently returning
    mid-chain targets.
    """
    m = (
        mapping.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    [amb] = (
        m.groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .collect()
    )
    if amb.mx is not None and amb.mx > 1:
        raise ValueError(
            "mapping is not functional: some src has multiple targets"
            " — resolve ambiguity (e.g. latest_event pick-latest)"
            " before chain collapse"
        )
    cur = m.withColumn("hops", F.lit(1).cast("long")).localCheckpoint()
    for _ in range(int(max_rounds)):
        tgt = cur.select(
            F.col("src").alias("dst"),
            F.col("dst").alias("dst2"),
            F.col("hops").alias("hops2"),
        )
        cur = (
            cur.join(tgt, "dst", "left")
            .select(
                "src",
                F.coalesce("dst2", "dst").alias("dst"),
                (
                    F.col("hops") + F.coalesce(F.col("hops2"), F.lit(0))
                ).alias("hops"),
                F.col("dst2").isNotNull().alias("jumped"),
            )
            .localCheckpoint()  # eager: the convergence probe below is
        )  # a count over materialized data, not a join re-execution
        if cur.filter(F.col("jumped")).limit(1).count() == 0:
            break
    else:
        n_stuck = (
            cur.join(
                m.select(F.col("src").alias("dst")), "dst", "left_semi"
            ).count()
        )
        if n_stuck:
            raise RuntimeError(
                f"{n_stuck} aliases unresolved after {max_rounds}"
                " doubling rounds (chain bound 2**rounds) — the"
                " mapping contains a cycle, or raise max_rounds"
            )
    return cur.select("src", F.col("dst").alias("canonical"), "hops")
