"""Stream-stream interval joins (SURVEY.md §2.9 streaming extension).

The batch engine's range join (error_window_events) correlates an error
with the events that preceded it; the streaming form is Spark's
watermarked stream-stream join.  The part that matters at scale is
STATE BOUNDING: without watermarks on BOTH sides plus a time-range
join condition, each side buffers its entire history waiting for
future matches — unbounded state at 10^12 events.  With them, Spark
derives a state-retention bound per side (watermark + interval width)
and evicts older rows, so state is O(rate × window), independent of
stream age.

Correctness oracle: the same join expressed in batch over the same
files must produce the identical row set once the stream drains
(Trigger.AvailableNow) — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lookback: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join ``left`` rows to ``right`` rows with the same ``key``
    whose ``right_ts`` falls in ``[left_ts − lookback, left_ts]``.

    Works identically on streaming and batch DataFrames: watermarks
    are applied only when the input is streaming (they are what lets
    Spark evict join state); the join condition is the same either
    way, which is exactly what makes the batch twin a valid oracle."""
    lk = f"l_{key}"
    rk = f"r_{key}"
    lf = left.withColumnRenamed(key, lk)
    rf = right.withColumnRenamed(key, rk)
    if lf.isStreaming:
        lf = lf.withWatermark(left_ts, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(right_ts, watermark)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.expr(f"{left_ts} - INTERVAL {lookback}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    return lf.join(rf, cond).withColumnRenamed(lk, key).drop(rk)
