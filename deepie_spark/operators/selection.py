"""Exact distributed order statistics without a global sort.

The textbook way to get an exact median/percentile in SQL is a global
sort (``row_number() OVER (ORDER BY x)``) — a single-partition window
that serializes 100 TB through one task, the exact plan shape this
repo's rank_in_order work exists to avoid.  ``approx_percentile``
avoids the sort but is, well, approximate.

This module gives EXACT selection in O(log_B range) passes — the
distributed radix-selection scheme (the BFPRT/quickselect idea with a
B-ary histogram instead of a pivot): each pass computes a ≤B-row
bucket histogram of the candidate value range (one map-side-combinable
groupBy), the driver picks the bucket containing the target rank
(≤B rows collected — bounded and documented), and the range narrows
by a factor of B.  For 64-bit longs and B=256 that is ≤8 passes over
the data, each a full-scan agg that AQE/codegen handles at any scale;
no shuffle ever carries more than B rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_kth(
    vals: DataFrame,
    col: str,
    k: int,
    n_buckets: int = 256,
) -> int:
    """The k-th smallest (1-based, duplicates counted) of a long
    column, exact.  Raises ``ValueError`` if ``k`` is out of range.

    Each pass: one filtered histogram agg over the current candidate
    range ``[lo, hi]`` → ≤``n_buckets`` rows to the driver → pick the
    bucket whose cumulative count reaches ``k`` → recurse into it.
    Bucket ids use integer div only; all arithmetic is exact longs.
    """
    v = vals.select(F.col(col).cast("long").alias("x")).filter(
        F.col("x").isNotNull()
    )
    row = v.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if row["n"] == 0 or not (1 <= k <= row["n"]):
        raise ValueError(f"k={k} out of range for n={row['n']}")
    lo, hi = int(row["lo"]), int(row["hi"])
    k_rem = int(k)
    while lo < hi:
        width = (hi - lo + n_buckets) // n_buckets  # ceil ≥ 1
        hist = (
            v.filter((F.col("x") >= lo) & (F.col("x") <= hi))
            .groupBy(
                F.expr(f"(x - {lo}) div {width}").cast("long").alias("b")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b")
            .collect()  # ≤ n_buckets rows — the documented bound
        )
        for r in hist:
            if k_rem <= r["c"]:
                lo2 = lo + int(r["b"]) * width
                hi2 = min(hi, lo2 + width - 1)
                lo, hi = max(lo, lo2), hi2
                break
            k_rem -= int(r["c"])
        else:  # pragma: no cover — guarded by the range check above
            raise AssertionError("rank walked past the histogram")
    return lo


def exact_quantiles(
    vals: DataFrame,
    col: str,
    ks: list[int],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact values at the given 1-based ranks, as a DataFrame
    ``(k, value)`` (one ``exact_kth`` walk per rank; the input is
    checkpointed once so the passes share the materialized column).
    """
    spark = vals.sparkSession
    v = (
        vals.select(F.col(col).cast("long").alias("x"))
        .filter(F.col("x").isNotNull())
        .localCheckpoint()
    )
    out = [(int(k), exact_kth(v, "x", int(k), n_buckets)) for k in ks]
    return spark.createDataFrame(out, "k long, value long")


def greedy_max_coverage(
    items: DataFrame,
    k: int,
    set_col: str = "set_id",
    elem_col: str = "element",
) -> DataFrame:
    """Greedy maximum-coverage selection: pick ``k`` sets (documents)
    one at a time, each maximizing the count of NOT-yet-covered
    elements (vocabulary terms, entities, eval shingles …) — the
    classic (1 − 1/e)-approximate submodular selection (Nemhauser,
    Wolsey & Fisher 1978) behind coverage-driven corpus subset
    curation ("which k documents maximize vocabulary/topic
    coverage?").

    Deterministic: marginal gains are exact longs; the per-round
    winner is argmax by (gain DESC, set_id ASC) via ONE 1-row
    ``min(struct(-gain, set_id))`` aggregate (the latest_event
    pattern, no window); rounds where every remaining set has zero
    marginal gain emit nothing and the selection stops.  Returns
    (round, set_id, gain) — round is 1-based pick order.

    Plan per round: one left_anti join of the (set, element) table
    against the covered-element table (both keyed on the element),
    one map-side-combinable count aggregation, one broadcast 1-row
    winner join; ``localCheckpoint`` per round truncates iterative
    lineage (the pagerank/CC rule).  k is a small constant (the
    caller's budget), so the job count is bounded.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    it = (
        items.select(
            F.col(set_col).alias("s"), F.col(elem_col).alias("e")
        )
        .distinct()
        .localCheckpoint()
    )
    covered = None
    out = None
    for r in range(1, k + 1):
        remaining = (
            it if covered is None else it.join(covered, "e", "left_anti")
        )
        gains = remaining.groupBy("s").agg(
            F.count(F.lit(1)).cast("long").alias("gain")
        )
        win = gains.agg(
            F.min(F.struct((-F.col("gain")).alias("ng"), F.col("s"))).alias(
                "w"
            )
        ).select(
            F.col("w.s").alias("s"), (-F.col("w.ng")).cast("long").alias("gain")
        ).where(F.col("s").isNotNull())
        row = win.select(
            F.lit(r).alias("round"), F.col("s").alias(set_col), "gain"
        ).localCheckpoint(eager=True)
        out = row if out is None else out.unionByName(row)
        newly = it.join(
            F.broadcast(win.select("s")), "s", "left_semi"
        ).select("e")
        covered = (
            newly
            if covered is None
            else covered.unionByName(newly).distinct()
        ).localCheckpoint(eager=True)
    return out


def highest_averages_allocation(
    counts: DataFrame,
    seats: int,
    key_col: str = "key",
    count_col: str = "n",
    divisor_step: int = 1,
    divisor_base: int = 1,
) -> DataFrame:
    """Highest-averages apportionment (D'Hondt with base=1,step=1;
    Sainte-Laguë with base=1,step=2): allocate ``seats`` integer
    slots proportionally to per-key volume — the divisor-method
    alternative to mixture_allocation's largest-remainder rule
    (divisor methods are house-monotone: growing the budget never
    takes a slot away, the property a growing training-mixture
    budget wants).

    Each key emits quotient rows v/(base + step·(i−1)) for i=1..seats
    and the top-``seats`` quotients overall win.  v and the divisor
    are exact ints, so v/divisor is ONE IEEE divide — bit-identical
    across engines — and the ordering (quotient DESC, key ASC, i ASC)
    is deterministic under exact-tie collisions (100/2 == 50/1).
    Top-k rides orderBy+limit (TakeOrderedAndProject — no window, no
    global sort materialization); the quotient table is |keys|·seats
    rows, bounded because seats is a constant."""
    if seats < 1:
        raise ValueError("seats must be >= 1")
    q = counts.select(
        F.col(key_col).alias("k"),
        F.col(count_col).cast("long").alias("v"),
        F.explode(
            F.sequence(F.lit(1), F.lit(seats))
        ).alias("i"),
    ).select(
        "k",
        "v",
        "i",
        (
            F.col("v").cast("double")
            / (
                F.lit(divisor_base)
                + F.lit(divisor_step) * (F.col("i") - F.lit(1))
            ).cast("double")
        ).alias("quotient"),
    )
    won = q.orderBy(
        F.col("quotient").desc(), F.col("k").asc(), F.col("i").asc()
    ).limit(seats)
    return (
        counts.select(
            F.col(key_col).alias("k"),
            F.col(count_col).cast("long").alias("votes"),
        )
        .join(
            won.groupBy("k").agg(
                F.count(F.lit(1)).cast("long").alias("slots")
            ),
            "k",
            "left",
        )
        .select(
            F.col("k").alias(key_col),
            "votes",
            F.coalesce(F.col("slots"), F.lit(0)).cast("long").alias("slots"),
        )
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
    scale_bits: int = 12,
) -> DataFrame:
    """Neyman-optimal stratified-sample allocation: sample counts
    n_h ∝ N_h·σ_h minimize the variance of the stratified mean for a
    fixed total budget (Neyman 1934) — the principled upgrade of
    proportional allocation when strata differ in spread (e.g. far
    more sample to 'purchase' events than to uniform 'view' noise).

    The Neyman weight collapses to ONE portable term:
    N_h·σ_h = sqrt(N_h·Σx² − (Σx)²) — a sqrt of an EXACT LONG (IEEE
    sqrt is correctly rounded in both engines), quantized to
    w_fp = floor(2^bits·√·) and then apportioned by the pure-integer
    largest-remainder rule (the mixture_allocation machinery), so
    allocations sum exactly to ``budget`` and hash-match any engine.
    All-constant strata (every w_fp = 0) fall back to equal weights.
    The ranking window runs over the per-stratum aggregate (one row
    per stratum, bounded), never the raw table."""
    from pyspark.sql import Window as W

    m = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum(F.col(value_col).cast("long")).cast("long").alias("sx"),
        F.sum(
            F.col(value_col).cast("long") * F.col(value_col).cast("long")
        )
        .cast("long")
        .alias("sxx"),
    )
    scale = F.lit(float(1 << scale_bits))
    var_num = (F.col("n_h") * F.col("sxx") - F.col("sx") * F.col("sx"))
    m = m.withColumn(
        "w_fp",
        F.floor(scale * F.sqrt(var_num.cast("double"))).cast("long"),
    )
    tot = m.agg(
        F.sum("w_fp").cast("long").alias("w_tot"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
    )
    q = m.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "n_h",
        "w_fp",
        F.when(F.col("w_tot") > 0, F.col("w_fp"))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("w_eff"),
        F.when(F.col("w_tot") > 0, F.col("w_tot"))
        .otherwise(F.col("n_strata"))
        .cast("long")
        .alias("w_den"),
    )
    q = q.select(
        "stratum",
        "n_h",
        "w_fp",
        F.expr(f"(w_eff * {budget}) div w_den").cast("long").alias("base"),
        F.pmod(F.col("w_eff") * budget, F.col("w_den"))
        .cast("long")
        .alias("rem"),
    )
    left = q.agg(
        (F.lit(budget) - F.sum("base")).cast("long").alias("leftover")
    )
    w = W.orderBy(F.col("rem").desc(), "stratum")
    return (
        q.withColumn("rk", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(left))
        .select(
            "stratum",
            "n_h",
            "w_fp",
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
    )
