"""Incremental view maintenance for distributive/algebraic aggregates.

A 100-TB rollup is never recomputed from scratch when a day of new
rows lands; the materialized aggregate STATE is merged with the
delta's partial aggregate — the classic self-maintainable-view rule
(Gupta & Mumick, "Maintenance of Materialized Views", 1995): COUNT and
SUM are distributive (state ⊕ delta = add), MIN/MAX are
insert-maintainable (merge = min/max), and AVG is algebraic (derive
from SUM/COUNT at read time — never stored pre-divided).

``merge_agg_state`` implements exactly that contract:

- state and delta both carry (group, n, total, mn, mx) exact longs;
- merge = ONE full-outer join on the group key + coalesced combiners —
  cost O(|state| + |delta|), independent of the base table size;
- inserts only (deletes need either 2-sided counting or recompute —
  out of scope and documented, like every SUM/COUNT IVM engine).

The invariant the test and oracle pin: merging state(base) with
agg(delta) is IDENTICAL (hash-exact, not approximately) to
aggregating base ∪ delta from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The maintainable aggregate state: (group, n, total, mn, mx)
    exact longs — everything needed to answer count/sum/min/max/avg."""
    return df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("total"),
        F.min(F.col(value_col).cast("long")).alias("mn"),
        F.max(F.col(value_col).cast("long")).alias("mx"),
    )


def merge_agg_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """state ⊕ delta (both agg_state-shaped) — one full-outer join on
    the group key, combiners per aggregate class."""
    s = state.select(
        "g",
        F.col("n").alias("n_s"),
        F.col("total").alias("t_s"),
        F.col("mn").alias("mn_s"),
        F.col("mx").alias("mx_s"),
    )
    d = delta.select(
        "g",
        F.col("n").alias("n_d"),
        F.col("total").alias("t_d"),
        F.col("mn").alias("mn_d"),
        F.col("mx").alias("mx_d"),
    )
    z = F.lit(0).cast("long")
    return s.join(d, "g", "full_outer").select(
        "g",
        (F.coalesce("n_s", z) + F.coalesce("n_d", z)).alias("n"),
        (F.coalesce("t_s", z) + F.coalesce("t_d", z)).alias("total"),
        F.least(
            F.coalesce("mn_s", F.col("mn_d")),
            F.coalesce("mn_d", F.col("mn_s")),
        ).alias("mn"),
        F.greatest(
            F.coalesce("mx_s", F.col("mx_d")),
            F.coalesce("mx_d", F.col("mx_s")),
        ).alias("mx"),
    )


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: list,
) -> DataFrame:
    """Delta rule for a materialized JOIN view V = A ⋈ B under
    inserts (Blakeley/Gupta-Mumick counting algorithm, insert case):

        ΔV = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    so V_new = V_old ∪ ΔV without ever re-joining A_old ⋈ B_old —
    the maintenance cost is O(|Δ|·fanout), independent of the base
    join size; at 100 TB the three delta legs broadcast the
    (day-sized) deltas against the bucketed base tables while the
    from-scratch plan would reshuffle both full inputs.

    Inserts only (deletes need counting multiplicities — same scope
    rule as merge_agg_state).  The invariant tests and the oracle
    pin: V_old ∪ ΔV == (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB) exactly.
    """
    return (
        a_delta.join(b_old, on)
        .unionByName(a_old.join(b_delta, on))
        .unionByName(a_delta.join(b_delta, on))
    )
