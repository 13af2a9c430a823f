"""Point-in-time as-of join (pandas ``merge_asof`` / Flink temporal-join
semantics): for every left row, attach the single most recent right row
with ``right_ts <= left_ts`` on the same key — optionally within a
tolerance — never fanning out and never dropping left rows.

Spark has no ASOF JOIN (SPARK-22947 has been open since 2017); the
naive rewrite — inequality join + arg_max — materializes
|left|x|right| rows PER KEY before reducing, quadratic in per-key
history exactly where event tables are deepest.  The scale-safe plan is
the sort-merge formulation streaming engines use: UNION the two sides,
sort per key by ``(ts, side)`` with right-before-left on ties (so an
equal-timestamp right row is visible, matching ``merge_asof``'s
``allow_exact_matches=True``), and carry the last non-null right
payload forward with a running ``last(ignorenulls)`` window.  Cost: ONE
shuffle on the key and a per-key sort — parallelism = key cardinality,
no global sort, no join node at all (the plan guard asserts this).

At 100 TB: a hot key's full history lands in one task — the usual
sort-merge caveat; if a single key outgrows a task, pre-bucket by
coarse time and replicate bucket-boundary right rows forward (the
``plans/rangejoin.py`` rewrite).  The tolerance filter runs in-row
AFTER the match, so it never changes the shuffle shape.

Reference parity: DeepIE is batch-corpus only (no temporal joins
anywhere in rnnRE.py); this extends the §2.7 relational surface for
the north rule's event/lineage tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tolerance: int | float | None = None,
    matched_ts_col: str = "asof_ts",
) -> DataFrame:
    """Backward as-of join, left-outer: every left row survives, with
    the payload of the latest right row at or before its timestamp.

    Contracts (caller-enforced, like the other operator modules):

    * ``right`` is unique per ``(on, right_ts)`` — pre-aggregate if
      not, else which duplicate wins is undefined;
    * ``left_ts`` / ``right_ts`` are the SAME orderable type; when
      ``tolerance`` is given they must be numeric (convert timestamps
      to epoch seconds first — events.ts is TIMESTAMP_NTZ, see
      CLAUDE.md);
    * ``payload_cols`` and ``matched_ts_col`` must not collide with
      left's columns.

    Ties are harmless by construction: right rows are unique per
    ``(key, ts)``, and left rows carry a null payload so their relative
    order inside the running frame cannot change ``last(ignorenulls)``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    pay = list(payload_cols)
    left_cols = list(left.columns)

    r = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.struct(
            F.col(right_ts).alias("_mts"), *[F.col(c) for c in pay]
        ).alias("_rv"),
        F.lit(0).alias("_side"),
    )
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        W.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_ats") - F.col("_m._mts") <= F.lit(tolerance),
                F.col("_m"),
            ),
        )
    sel = [F.col(c) for c in left_cols]
    sel.append(F.col("_m._mts").alias(matched_ts_col))
    sel.extend(F.col(f"_m.{c}").alias(c) for c in pay)
    return out.select(*sel)
