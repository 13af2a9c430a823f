"""Columnar time-series primitives: in-row folds over bounded
numeric arrays (the hour-of-day / fixed-bin profiles the events_*
queries aggregate to).  Everything here is exact-long arithmetic —
engine-portable by construction."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: unreachable-cell sentinel — far above any reachable path cost, far
#: below long overflow even after summing a full warping path
DTW_INF = 1 << 50


def dtw_distance(arr_a: Column, arr_b: Column) -> Column:
    """Dynamic-time-warping distance between two equal-domain integer
    arrays with |Δ| cell costs — EXACT LONGS end to end (no FP in the
    DP).  One nested in-row aggregate fold: the outer fold walks the
    query series carrying the sentinel-padded previous DP row
    (prevpad[1] = the diagonal base, prevpad[j+2] = D[i−1][j]), the
    inner fold builds the current row left to right so D[i][j−1] is
    already in the accumulator.  Collection args are plain column
    refs, evaluated once per element (the winnow_fingerprints
    lambda-CSE rule).  O(n·m) work per row, zero shuffles."""
    inf = F.lit(DTW_INF).cast("long")

    def inner(prevpad: Column, bi: Column) -> Column:
        def cell(acc: Column, av: Column) -> Column:
            jj = F.size(acc)
            up = F.element_at(prevpad, jj + 2)
            diag = F.element_at(prevpad, jj + 1)
            left = F.when(jj > 0, F.element_at(acc, jj)).otherwise(inf)
            c = F.abs(av - bi) + F.least(up, diag, left)
            return F.concat(acc, F.array(c.cast("long")))

        return F.aggregate(
            arr_a, F.expr("CAST(array() AS ARRAY<LONG>)"), cell
        )

    def outer(acc: Column, bi: Column) -> Column:
        return F.concat(F.array(inf), inner(acc, bi))

    init = F.concat(
        F.array(F.lit(0).cast("long")),
        F.array_repeat(inf, F.size(arr_a)),
    )
    dp = F.aggregate(arr_b, init, outer)
    return F.element_at(dp, F.size(arr_a) + 1).cast("long")


def nw_score(
    arr_a: Column,
    arr_b: Column,
    match: int = 2,
    mismatch: int = -1,
    gap: int = -1,
) -> Column:
    """Needleman-Wunsch GLOBAL alignment score between two integer
    sequences — EXACT LONGS end to end (integer match/mismatch/gap
    scores, no FP in the DP).  Same nested-fold scheme as
    :func:`dtw_distance`, with max instead of min and the linear
    gap boundary instead of the ∞ sentinel: the outer fold walks
    ``arr_b`` carrying the FULL previous DP row (prev[1] = the
    boundary D[i−1][0] = (i−1)·gap, so the new row opens with
    prev[1]+gap), the inner fold builds the row left to right.
    O(n·m) per row, zero shuffles."""
    g = F.lit(gap).cast("long")

    def inner(prev: Column, bi: Column) -> Column:
        def cell(acc: Column, av: Column) -> Column:
            jj = F.size(acc)  # cells filled so far = j-1 (j 1-based)
            diag = F.element_at(prev, jj + 1)
            up = F.element_at(prev, jj + 2)
            left = F.when(jj > 0, F.element_at(acc, jj)).otherwise(
                F.element_at(prev, 1) + g
            )
            s = F.when(av == bi, F.lit(match)).otherwise(
                F.lit(mismatch)
            ).cast("long")
            c = F.greatest(diag + s, up + g, left + g)
            return F.concat(acc, F.array(c.cast("long")))

        return F.aggregate(
            arr_a, F.expr("CAST(array() AS ARRAY<LONG>)"), cell
        )

    def outer(acc: Column, bi: Column) -> Column:
        return F.concat(
            F.array((F.element_at(acc, 1) + g).cast("long")),
            inner(acc, bi),
        )

    init = F.transform(
        F.sequence(F.lit(0), F.size(arr_a)),
        lambda j: (j.cast("long") * g).cast("long"),
    )
    dp = F.aggregate(arr_b, init, outer)
    return F.element_at(dp, F.size(arr_a) + 1).cast("long")
