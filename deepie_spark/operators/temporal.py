"""Temporal-graph reachability (time-respecting paths).

A temporal edge ``(src, dst, t)`` can only be traversed at time
``t``, and a time-respecting path must use nondecreasing timestamps —
the model behind information-diffusion, contagion and audit-trail
queries (Holme & Saramäki 2012).  ``earliest_arrival`` computes, for
every node, the minimum arrival time over time-respecting paths of at
most ``max_hops`` edges from a seed set — the temporal analog of
bounded BFS (entity_bfs) with the BFS layer rule replaced by the
arrival constraint ``t ≥ arr(u)``.

Correctness of min-relaxation: a smaller arrival at ``u`` admits a
superset of outgoing edges (the constraint is one-sided), so the
per-node minimum dominates — Bellman-Ford-style rounds over the min
table equal full walk enumeration (the DuckDB oracle's formulation).
All quantities are exact longs (epoch seconds); no FP anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def earliest_arrival(
    tedges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
    src: str = "src",
    dst: str = "dst",
    ts_col: str = "t",
) -> DataFrame:
    """Bounded-horizon earliest arrival: ``(entity, arrival)`` exact
    longs, the minimum over time-respecting paths of ≤ ``max_hops``
    edges from ``seeds`` (rows ``(node, arr)`` — a seed's own start
    time; a seed row is itself an arrival).

    Plan: ``max_hops`` relaxation rounds, each ONE equi-join on the
    source key (the time constraint filters after the join — a range
    predicate on top of a hash join, never a BNLJ) plus one min-agg,
    ``localCheckpoint`` per round (the iterative-consumer rule).  The
    horizon bound makes the semantics identical on both engines
    regardless of cycles — same contract as entity_bfs/closeness.
    """
    e = (
        tedges.select(
            F.col(src).alias("a"),
            F.col(dst).alias("b"),
            F.col(ts_col).cast("long").alias("t"),
        )
        .distinct()
        .localCheckpoint()
    )
    arr = (
        seeds.select(
            F.col("node"), F.col("arr").cast("long").alias("arr")
        )
        .groupBy("node")
        .agg(F.min("arr").alias("arr"))
        .localCheckpoint(eager=True)
    )
    for _ in range(int(max_hops)):
        cand = (
            e.join(arr.withColumnRenamed("node", "a"), "a")
            .filter(F.col("t") >= F.col("arr"))
            .select(F.col("b").alias("node"), F.col("t").alias("arr"))
        )
        nxt = (
            arr.unionByName(cand)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint(eager=True)
        )
        if nxt.exceptAll(arr).limit(1).count() == 0:
            break
        arr = nxt
    return arr.select(F.col("node").alias("entity"), "arr").select(
        "entity", F.col("arr").alias("arrival")
    )
