"""Join-cardinality estimation audit — the optimizer's eye.

The textbook equi-join estimate |A ⋈ B| ≈ |A|·|B| / max(ndv_A, ndv_B)
(System R's containment-of-values assumption; what Spark's CBO computes
from ANALYZE TABLE statistics) is the number every join-order and
broadcast decision hangs on.  This audit computes the estimate AND the
true join count side by side — the drift between them (skewed keys,
referential subsets) is exactly where a 100-TB plan goes wrong, and
surfacing it tells you which tables need histogram statistics instead
of plain NDVs.

All quantities are exact longs (the estimate is an integer division);
the error ratio is one IEEE divide.  Overflow bound: |A|·|B| must fit
int64 — beyond ~3·10⁹ rows a side, reduce first (n_a div ndv)·n_b.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    label: str,
) -> DataFrame:
    """One row: sizes, NDVs, the System-R estimate and the actual
    equi-join cardinality with the error ratio."""
    la = left.agg(
        F.count(F.lit(1)).cast("long").alias("n_left"),
        F.countDistinct(F.col(left_key)).cast("long").alias("ndv_left"),
    )
    ra = right.agg(
        F.count(F.lit(1)).cast("long").alias("n_right"),
        F.countDistinct(F.col(right_key)).cast("long").alias("ndv_right"),
    )
    actual = (
        left.select(F.col(left_key).alias("k"))
        .join(right.select(F.col(right_key).alias("k")), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("actual_rows"))
    )
    est = F.expr(
        "(n_left * n_right) div greatest(ndv_left, ndv_right)"
    ).cast("long")
    return (
        la.crossJoin(ra)
        .crossJoin(actual)
        .select(
            F.lit(label).alias("pair"),
            "n_left",
            "n_right",
            "ndv_left",
            "ndv_right",
            est.alias("est_rows"),
            "actual_rows",
            F.when(
                F.col("actual_rows") > 0,
                F.round(est / F.col("actual_rows"), 6),
            ).alias("est_over_actual"),
        )
    )
