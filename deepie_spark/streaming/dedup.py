"""Streaming deduplication with bounded state (SURVEY.md §2.9 ext).

Ingestion paths re-deliver: at-least-once sources (Kafka replays, file
re-drops, retried batches) hand the pipeline the same event more than
once, and the KG sink must not double-count triples.  The streaming
form is ``dropDuplicatesWithinWatermark``: first occurrence of a key is
emitted immediately, later copies are dropped while the key is in
state, and — the part that matters at 10^12 events — state is EVICTED
once the watermark passes the first occurrence's event time, so memory
is O(rate × watermark) instead of O(distinct keys ever seen), which is
what plain streaming ``dropDuplicates`` would hold.

The watermark is the same contract as in streaming/joins.py: duplicate
suppression is guaranteed only for copies arriving within the watermark
delay of each other.  A replay of unordered history therefore needs a
span-covering watermark for exact batch parity (asserted in
tests/test_streaming.py); a roughly-ordered production stream needs
only its re-delivery horizon (minutes), which is what keeps state
small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(
    df: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once projection of an at-least-once stream: keep the
    first delivery per ``keys``, suppress re-deliveries within the
    watermark horizon.  Batch inputs take the plain ``dropDuplicates``
    path — same result set, which makes the batch twin the oracle."""
    if df.isStreaming:
        ts_typed = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return ts_typed.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(list(keys))
    return df.withColumn(
        ts_col, F.col(ts_col).cast("timestamp")
    ).dropDuplicates(list(keys))
