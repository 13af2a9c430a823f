"""Global ordered prefix sums and the interval-concurrency sweep.

``SUM(x) OVER (ORDER BY t)`` — the running total — is the one window
shape Spark cannot distribute: an unpartitioned window pulls the whole
input through a single task, the same serialization point the
round-3/4 verdicts chased out of global ranking.  This module is the
prefix-SUM twin of ``dictionary.rank_in_order``'s two-level scheme
(rank = prefix sum of 1s): range-bucket by the order key, cumulative
sum per bucket under a KEYED window, then add per-bucket offsets from
a ≤buckets²-row triangular broadcast join.  With integer values every
arithmetic step is exact, so results are bit-identical to the
single-window formulation — which is exactly what the DuckDB oracle
runs.

On top sits the classic sweep-line consumer: interval concurrency
(how many sessions/locks/intervals are open at each instant) — the
capacity-planning signal over the events table, computed as the
running sum of +1/−1 boundary deltas (McCreight's sweep), never an
interval self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pinned_range_bucket(
    df: DataFrame, order_col: str, buckets: int
) -> DataFrame:
    """Attach a ``_bkt`` column that range-buckets rows by
    ``order_col`` such that every row in bucket *b* orders ≤ every row
    in bucket *b+1* — with the bucket a DETERMINISTIC function of the
    key, never ``spark_partition_id()`` after a sampled
    ``repartitionByRange``.

    Why: the sampled range exchange re-samples its boundaries on every
    materialization, and when column pruning specializes two plan
    branches into different subplans ReusedExchange cannot deduplicate
    them — each branch then gets its OWN boundaries and the branches'
    ``_bkt`` assignments disagree (observed: nondeterministically
    wrong global ranks/prefix sums at 8 cores on a 15k-row input).

    Scheme: quantile boundaries are collected ONCE driver-side
    (``approxQuantile``, ≤ buckets−1 doubles) over the order column —
    or, for a struct key, over its FIRST numeric field (a monotone
    coarsening of the struct order, so bucket monotonicity still
    holds; ties on the first field share a bucket) — and applied as a
    literal in-row count-of-boundaries-≤x.  When the key has no
    numeric prefix (e.g. a string sort key), the sampled
    repartitionByRange result is pinned with ``localCheckpoint`` so
    every branch reads the SAME materialization.  The double cast
    inside the comparison is monotone for any long, so bucketing
    respects key order even past 2⁵³."""
    from pyspark.sql.types import DateType, NumericType, StructType, TimestampType

    field = next(f for f in df.schema.fields if f.name == order_col)
    dt = field.dataType
    ordered_types = (NumericType, DateType, TimestampType)
    qcol = None
    if isinstance(dt, ordered_types):
        qcol = F.col(order_col)
    elif (
        isinstance(dt, StructType)
        and dt.fields
        and isinstance(dt.fields[0].dataType, ordered_types)
    ):
        qcol = F.col(f"{order_col}.{dt.fields[0].name}")
    if qcol is None:
        # non-numeric key: pin ONE sampled materialization — eager,
        # but correct for any orderable type
        return df.repartitionByRange(
            buckets, F.col(order_col)
        ).withColumn("_bkt", F.spark_partition_id()).localCheckpoint()
    bounds: list[float] = []
    if buckets > 1:
        qdf = df.select(qcol.cast("double").alias("_q"))
        bounds = sorted(set(qdf.stat.approxQuantile("_q", [i / buckets for i in range(1, buckets)], 0.001)))
    if not bounds:
        return df.withColumn("_bkt", F.lit(0))
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    xd = qcol.cast("double")
    return df.withColumn(
        "_bkt", F.size(F.filter(barr, lambda b: b <= xd)).cast("int")
    )


def prefix_sum_in_order(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum",
    buckets: int | None = None,
) -> DataFrame:
    """Exactly ``SUM(val_col) OVER (ORDER BY order_col)`` without a
    global sort.

    1. bucket by a DETERMINISTIC range key: quantile boundaries are
       collected ONCE driver-side (``approxQuantile``, ≤ buckets−1
       values) and applied as a literal in-row count-of-boundaries-≤x,
       so bucket *b* holds keys strictly below bucket *b+1* and —
       crucially — every plan branch computes the SAME bucket for the
       same key;
    2. per-bucket running sum (bucket-KEYED window, distributed);
    3. per-bucket totals → prefix offsets via the triangular broadcast
       join (no window on that path);
    4. ``out = offset + local running sum``.

    Results are invariant to the bucket boundaries (exact integer adds
    reassociate freely — pass integral ``val_col``; FP would make the
    answer bucket-dependent).  Ties in ``order_col`` would make the
    within-tie running values order-unspecified — callers must pass a
    unique order key (collapse duplicates with a groupBy first, as
    ``interval_concurrency`` does).

    Why not ``repartitionByRange`` + ``spark_partition_id()`` (the
    original formulation): the range exchange SAMPLES its boundaries,
    and when column pruning specializes the offsets branch and the
    window branch into structurally different subplans, ReusedExchange
    cannot deduplicate them — each branch re-samples, the two ``_bkt``
    assignments diverge, and offsets no longer match the local sums
    (observed as a nondeterministically wrong total at 8 cores under
    load).  Driver-pinned literal boundaries make the bucket a pure
    function of the key: no branch can disagree, at the cost of one
    extra bounded pass (the quantile sketch).  ``order_col`` must be
    numeric; the double cast inside the comparison stays monotone for
    any long, so bucketing always respects key order even past 2⁵³.
    """
    if out_col in ("_bkt", "_cs", "_off"):
        raise ValueError(
            f"out_col {out_col!r} collides with an internal column "
            "(_bkt/_cs/_off) and would be dropped"
        )
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucketed = pinned_range_bucket(df, order_col, buckets)
    sums = bucketed.groupBy("_bkt").agg(
        F.sum(val_col).cast("long").alias("_s")
    )
    lower = sums.select(
        F.col("_bkt").alias("_lo_bkt"), F.col("_s").alias("_lo_s")
    )
    offsets = (
        sums.join(
            F.broadcast(lower), F.col("_lo_bkt") < F.col("_bkt"), "left"
        )
        .groupBy("_bkt")
        .agg(F.coalesce(F.sum("_lo_s"), F.lit(0)).cast("long").alias("_off"))
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bucketed.withColumn("_cs", F.sum(val_col).over(w).cast("long"))
        .join(F.broadcast(offsets), "_bkt")
        .withColumn(out_col, (F.col("_off") + F.col("_cs")).cast("long"))
        .drop("_bkt", "_cs", "_off")
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "start_s",
    end_col: str = "end_s",
    buckets: int | None = None,
) -> DataFrame:
    """Concurrency profile of half-open intervals ``[start, end)``:
    one row per boundary instant ``(t, net, concurrency)`` where
    ``net`` is the exact +1/−1 delta balance at ``t`` and
    ``concurrency`` the number of intervals open immediately AFTER
    ``t`` — the global running sum of nets.

    Half-open semantics (an interval ending at ``t`` frees its slot
    before one starting at ``t`` occupies it) fall out of collapsing
    deltas per instant: within an instant the count only dips then
    rises, so its running peak is ``max(before, after)`` and the
    per-instant profile loses nothing.  Collapsing also makes ``t``
    unique — the precondition of ``prefix_sum_in_order``.  No
    interval self-join anywhere: O(n) rows end to end.
    """
    deltas = intervals.select(
        F.col(start_col).cast("long").alias("t"),
        F.lit(1).cast("long").alias("d"),
    ).unionByName(
        intervals.select(
            F.col(end_col).cast("long").alias("t"),
            F.lit(-1).cast("long").alias("d"),
        )
    )
    net = deltas.groupBy("t").agg(F.sum("d").cast("long").alias("net"))
    return prefix_sum_in_order(
        net, "t", "net", out_col="concurrency", buckets=buckets
    )


def records_in_order(
    df: DataFrame,
    order_col: str,
    val_col: str,
    buckets: int | None = None,
) -> DataFrame:
    """Running-record detection — the rows whose value STRICTLY
    exceeds every earlier value in ``order_col`` order (record highs:
    peak-load alarms, high-water marks).  The first row is a record
    by convention.

    Same two-level scheme as prefix_sum_in_order, specialized to MAX:
    the strict prefix max of row i = greatest(within-bucket running
    max over rows < i, max over strictly-lower buckets) — max
    reassociates freely, so the result is bit-identical to the
    single-window formulation the DuckDB oracle runs, with no
    unpartitioned window anywhere.  Ties are NOT records (strict >).
    """
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucketed = pinned_range_bucket(df, order_col, buckets)
    maxes = bucketed.groupBy("_bkt").agg(
        F.max(val_col).cast("long").alias("_m")
    )
    lower = maxes.select(
        F.col("_bkt").alias("_lo_bkt"), F.col("_m").alias("_lo_m")
    )
    offsets = (
        maxes.join(
            F.broadcast(lower), F.col("_lo_bkt") < F.col("_bkt"), "left"
        )
        .groupBy("_bkt")
        .agg(F.max("_lo_m").alias("_off"))  # NULL for the first bucket
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    strict_local = F.max(F.col(val_col)).over(w)  # NULL on bucket head
    out = (
        bucketed.withColumn("_sl", strict_local)
        .join(F.broadcast(offsets), "_bkt")
        .withColumn(
            "_pm",
            F.when(
                F.col("_sl").isNotNull() & F.col("_off").isNotNull(),
                F.greatest("_sl", "_off"),
            ).otherwise(F.coalesce("_sl", "_off")),
        )
    )
    return (
        out.filter(
            F.col("_pm").isNull() | (F.col(val_col) > F.col("_pm"))
        )
        .drop("_bkt", "_sl", "_off", "_pm")
    )
