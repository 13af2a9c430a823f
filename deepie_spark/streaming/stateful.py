"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference is pure batch (SURVEY.md §2.9); these are the engine's
streaming-surface demonstrations for pipelines that ingest pages
continuously:

* :func:`running_totals` — per-key cumulative count/sum maintained in
  group state across micro-batches (the streaming analog of the A3/A5
  counters); emits the updated totals every batch the key appears in.
* :func:`first_seen_filter` — per-key exactly-once pass-through: a key's
  first arrival is emitted, later arrivals are dropped — the streaming
  form of exact dedup (keep_id = first seen), state bounded by one
  boolean per key.

Both run on any keyed stream; tests drive them with
``Trigger.AvailableNow`` file streams and assert agreement with the
batch twins over the same input.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOTALS_SCHEMA = "key string, n long, total double"
TOTALS_STATE_SCHEMA = "n long, total double"


def running_totals(
    events: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Keyed stream → per-micro-batch updated (key, n, total) rows."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"key": [key[0]], "n": [n], "total": [round(total, 3)]}
        )

    return (
        events.selectExpr(f"{key_col} as key", f"{value_col} as {value_col}")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            TOTALS_SCHEMA,
            TOTALS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


FIRST_SEEN_SCHEMA = "key long, first_ts timestamp"
FIRST_SEEN_STATE_SCHEMA = "seen boolean"


def first_seen_filter(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Emit each key once, on first arrival (streaming exact dedup)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:
                pass
            return
        first_ts = None
        for pdf in pdfs:
            t = pdf[ts_col].min()
            if first_ts is None or t < first_ts:
                first_ts = t
        state.update((True,))
        yield pd.DataFrame({"key": [key[0]], "first_ts": [first_ts]})

    return (
        events.selectExpr(f"{key_col} as key", f"{ts_col} as {ts_col}")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            FIRST_SEEN_SCHEMA,
            FIRST_SEEN_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
