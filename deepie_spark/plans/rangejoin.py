"""Binned range-join rewrite (keyless interval correlation at scale).

A range join WITH an equi key (error_window_events: same user) shuffles
on the key and evaluates the band in-partition — fine.  A range join
WITHOUT one ("all events in the 10 minutes before each alert, across
the whole stream") gives Catalyst nothing to hash on: the physical plan
degenerates to BroadcastNestedLoopJoin (or a cartesian product), which
is O(|L|·|R|) work and O(|R|) broadcast memory — both fatal at 10^12
events.

The standard rewrite (Iceberg/Photon "bucketed range join", DuckDB's
IEJoin cousin): quantize event time into fixed bins, replicate the
SMALLER side (the anchors) across the ⌈lookback/bin⌉+1 bins its window
overlaps, map the big side to its single bin, then equi-join on the bin
and re-check the exact band.  Each (anchor, event) candidate appears in
EXACTLY ONE bin — the event's — so no post-join dedup is needed.  With
bin = lookback the anchor replication factor is exactly 2, and the join
is an ordinary shuffle hash join whose fan-out is bounded by bin width
× event rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    anchors: DataFrame,
    events: DataFrame,
    anchor_ts: str,
    event_ts: str,
    lookback_sec: int,
    bin_sec: int | None = None,
) -> DataFrame:
    """Pairs (anchor row, event row) where ``event_ts`` falls in
    ``[anchor_ts − lookback, anchor_ts)`` — no equi key required.

    Epoch seconds come from ``unix_timestamp`` (floors; the DuckDB twin
    must ``floor(epoch(ts))``, its double→int cast rounds).  Bin ids
    are floor-divided non-negative longs, portable across engines."""
    if bin_sec is None:
        bin_sec = lookback_sec
    n_bins = lookback_sec // bin_sec + 1
    a_secs = F.unix_timestamp(F.col(anchor_ts).cast("timestamp"))
    e_secs = F.unix_timestamp(F.col(event_ts).cast("timestamp"))
    a = anchors.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((a_secs - lookback_sec) / bin_sec).cast("long"),
                F.floor(a_secs / bin_sec).cast("long"),
            )
        ),
    )
    e = events.withColumn("_bin", F.floor(e_secs / bin_sec).cast("long"))
    band = (
        F.col(event_ts)
        >= F.col(anchor_ts) - F.expr(f"INTERVAL {lookback_sec} SECONDS")
    ) & (F.col(event_ts) < F.col(anchor_ts))
    assert n_bins >= 2  # replication factor; 2 when bin == lookback
    return a.join(e, "_bin").filter(band).drop("_bin")
