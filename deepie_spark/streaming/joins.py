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

The watermark is a CONTRACT, not a tuning knob: streaming output
equals the batch join ONLY when the watermark covers the source's
maximum event-time disorder (how far behind the observed max-ts a
late row can arrive).  Rows later than that are dropped and matching
state is evicted — by design.  Two consequences worth spelling out:

* a roughly time-ordered production stream needs only a small
  watermark (minutes-hours) and gets small state;
* a FULL-HISTORY REPLAY from unordered files is maximally disordered —
  the micro-batch order can present day-30 data before day-1 — so
  batch parity there requires a watermark spanning the whole replayed
  range (equivalently: re-sort the files by event time first).  A
  small watermark on an unordered replay silently loses matches; the
  parity test in tests/test_streaming.py replays with
  ``maxFilesPerTrigger=1`` and a span-covering watermark for exactly
  this reason.

Correctness oracle: with the watermark sized per the contract above,
the same join expressed in batch over the same files must produce the
identical row set once the stream drains (Trigger.AvailableNow) —
asserted in tests/test_streaming.py.
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

    ``watermark`` must be ≥ the source's maximum event-time disorder
    (see module docstring) — state per side is O(rate × (watermark +
    lookback)), and rows arriving later than the watermark are
    dropped.  Works identically on streaming and batch DataFrames:
    watermarks are applied only when the input is streaming (they are
    what lets Spark evict join state); the join condition is the same
    either way, which is what makes the batch twin a valid oracle."""
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
