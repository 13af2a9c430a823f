"""Iterative graph analytics over the triple graph (KG stage 7+).

Beyond connected-components canonicalization (operators.cc), a KG
pipeline ranks entities by link structure — entity salience drives
candidate pruning in linking and downstream triple filtering.  This is
PageRank over the directed (subj → obj) edge set of the materialized
triples.

Plan shape per iteration (the thing that must hold at 10^12 edges):
one shuffle hash join edges⋈ranks on ``src`` (ranks is node-sized) and
one shuffle aggregation on ``dst`` with map-side partial sums; the node
count rides the plan as a broadcast 1-row aggregate (no driver-side
count action).  ``localCheckpoint`` after each iteration truncates the
lineage exactly like the CC rounds (operators/cc.py) — without it the
plan doubles per iteration.  Head entities concentrate in-degree; the
``dst`` aggregation's map-side combine absorbs that skew (same argument
as the CC min pre-agg).

Semantics: the classic damped update
``pr' = (1−d)/N + d · Σ_{src→dst} pr(src)/outdeg(src)`` over DISTINCT
edges, without dangling-mass redistribution (dangling nodes keep only
the teleport term) — the variant is pinned by the DuckDB oracle and the
numpy power-iteration twin in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank after ``iterations`` synchronous updates from the
    uniform start vector; returns (node, pagerank) with pagerank
    rounded to 6 decimals (cross-engine summation-order tolerance)."""
    # checkpoint the edge set ONCE: every iteration joins against it
    # (and against nodes/outdeg, derived from it) — without this the
    # whole upstream pipeline that produced the edges would re-execute
    # per iteration and per consumer (same entry pattern as
    # connected_components, operators/cc.py)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n1 = nodes.agg(F.count("*").cast("double").alias("n"))
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("od"))
    pr = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    for _ in range(iterations):
        contrib = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("pr") / F.col("od")).alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        pr = (
            nodes.join(sums, "node", "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
        )
        # truncate lineage: iteration k+1's plan must not contain k's
        pr = pr.localCheckpoint(eager=True)
    return pr.select("node", F.round("pr", 6).alias("pagerank"))
