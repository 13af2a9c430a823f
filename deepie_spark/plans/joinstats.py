"""Exact join-cardinality and skew profiling WITHOUT executing the join.

At 100 TB the expensive question is asked BEFORE the join: how many
rows will ``A ⋈ B`` produce, and is one key hot enough to need
salting?  Both answers are exact functions of the per-key count
tables:  |A ⋈ B| = Σ_k cA(k)·cB(k), and the salting decision reads
max_k cA(k)·cB(k).  The count tables are |distinct keys| rows (map-
side combinable aggs), so the profile costs two scans plus a
key-sized join — orders of magnitude cheaper than the join it
predicts, and the same arithmetic every cost-based optimizer runs on
sampled sketches (this one is exact because the aggs are).

This is the measurement behind the repo's skew leg (operators/skew.py
salting): run the profile, read ``max_key_rows`` against the executor
row budget, then choose naive/broadcast/salted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """One exact row: ``(left_rows, right_rows, n_matching_keys,
    join_rows, max_key_rows)`` — all longs — for the inner equi-join
    of ``left`` and ``right`` on the given keys.  NULL keys never
    match and are excluded (SQL join semantics)."""
    cl = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cl"))
    )
    cr = (
        right.filter(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    prof = cl.join(cr, "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_matching_keys"),
        F.coalesce(F.sum(F.col("cl") * F.col("cr")), F.lit(0))
         .cast("long").alias("join_rows"),
        F.coalesce(F.max(F.col("cl") * F.col("cr")), F.lit(0))
         .cast("long").alias("max_key_rows"),
    )
    nl = left.agg(F.count(F.lit(1)).cast("long").alias("left_rows"))
    nr = right.agg(F.count(F.lit(1)).cast("long").alias("right_rows"))
    return (
        nl.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(prof))
        .select(
            "left_rows", "right_rows", "n_matching_keys",
            "join_rows", "max_key_rows",
        )
    )
