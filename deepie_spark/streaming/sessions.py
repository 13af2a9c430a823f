"""Native session-window aggregation (SURVEY.md §2.9 streaming).

The batch engine's gap-based sessionization (q_user_sessions: lag +
cumulative new-session flags) has a first-class streaming counterpart:
``F.session_window(ts, gap)`` — Spark merges events of one key whose
gaps are < ``gap`` into one growing window and the state store keeps
ONE row per open session, not per event, so state is O(open sessions),
independent of stream age.  Semantics are identical to the lag twin: a
new session starts exactly when the gap to the previous event is
≥ ``gap`` (pinned by the batch-equivalence test).

Emission contract (the part everyone trips on): in append mode a
session row is emitted only once the watermark passes ``last_ts +
gap`` — i.e. once no late event could extend it.  A drained replay
(Trigger.AvailableNow) therefore flushes a session only if the
watermark advanced past its close; sessions still open at end-of-
stream stay in state.  The standard pattern to finalize a bounded
replay — used by the parity test — is a synthetic FLUSH record per key
far past the real data (the "punctuation" trick): it pushes event-time
(and so the watermark) beyond every real session without merging into
any of them, so streaming output equals the batch twin on every real
session exactly.

Same-code-path rule as interval_join: the grouping expression is
identical for batch and streaming input, so the batch run of this very
function is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_metrics(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-(key, session) metrics with sessions defined by event-time
    gaps < ``gap``.  Output: key, session_start, session_end (last
    event ts + gap, Spark's session_window end), n_events, first_ts,
    last_ts.

    ``watermark`` must cover the source's event-time disorder (the
    interval_join contract); it is applied only when the input is
    streaming."""
    e = events
    if e.isStreaming:
        e = e.withWatermark(ts, watermark)
    out = e.groupBy(
        F.session_window(F.col(ts), gap).alias("w"), key
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    )
    return out.select(
        key,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "first_ts",
        "last_ts",
    )
