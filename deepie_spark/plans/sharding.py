"""Rendezvous (highest-random-weight) sharding — the consistent
key→shard assignment a 1000-executor ingest tier uses so that growing
the shard count moves only ~1/(N+1) of the keys, against naive
``key mod N`` which reshuffles ~N/(N+1) of them (Thaler & Ravishankar
1996; the partitioning story behind every distributed KV/cache tier
and behind stable bucketed writes).

Assignment: shard(key) = argmax over shards s of H(s ‖ '#' ‖ key),
with H the portable BASE/MOD poly hash (functions.text) so a DuckDB
oracle reproduces every weight exactly; argmax ties (hash collisions)
break to the SMALLER shard id via min(struct(−h, s)) on both engines.
The shard id is PREPENDED, never appended: a trailing digit only adds
s to the rolling hash (h = C + s mod M, monotone in s — the argmax
would degenerate to "always the largest shard"); a leading digit
diverges the whole chain.  This is the weak-rolling-hash cousin of
the CDC chunk-anchored-hash trap.

Scale: the weight table is |keys| × N rows from one crossJoin with a
RANGE (broadcast-sized shard side), one hash agg for the argmax —
map-side combinable, no window, no shuffle beyond the final groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import char_poly_hash_str


def rendezvous_assign(
    keys: DataFrame, n_shards: int, key_col: str = "key"
) -> DataFrame:
    """(key, shard) — highest-random-weight assignment of each
    distinct key to one of ``n_shards`` shards."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shards = keys.sparkSession.range(n_shards).select(
        F.col("id").cast("long").alias("s")
    )
    w = (
        keys.select(F.col(key_col).cast("string").alias("key"))
        .distinct()
        .crossJoin(F.broadcast(shards))
        .select(
            "key",
            "s",
            char_poly_hash_str(
                F.concat(
                    F.col("s").cast("string"),
                    F.lit("#"),
                    F.col("key"),
                )
            ).alias("h"),
        )
    )
    return w.groupBy("key").agg(
        F.min(F.struct((-F.col("h")).alias("nh"), F.col("s").alias("s")))[
            "s"
        ]
        .cast("long")
        .alias("shard")
    )


def rebalance_audit(
    keys: DataFrame, n_from: int, n_to: int, key_col: str = "key"
) -> DataFrame:
    """One-row audit of growing the shard ring ``n_from`` → ``n_to``:
    keys moved under rendezvous vs under naive ``key mod N`` (mod uses
    the same poly hash of the key, so both strategies see the same key
    distribution), plus the max/min shard load at ``n_from`` — every
    count an exact long, the two movement fractions single divides.
    Rendezvous moves ≈ 1 − n_from/n_to of the keys; mod moves almost
    everything."""
    a = rendezvous_assign(keys, n_from, key_col).withColumnRenamed(
        "shard", "s_from"
    )
    b = rendezvous_assign(keys, n_to, key_col).withColumnRenamed(
        "shard", "s_to"
    )
    j = a.join(b, "key")
    kh = char_poly_hash_str(F.col("key"))
    moved = j.select(
        "key",
        (F.col("s_from") != F.col("s_to")).cast("long").alias("rdv_mv"),
        (kh % n_from != kh % n_to).cast("long").alias("mod_mv"),
    )
    loads = a.groupBy("s_from").agg(
        F.count(F.lit(1)).cast("long").alias("load")
    )
    la = loads.agg(
        F.max("load").cast("long").alias("max_load"),
        F.min("load").cast("long").alias("min_load"),
    )
    agg = moved.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("rdv_mv").cast("long").alias("rdv_moved"),
        F.sum("mod_mv").cast("long").alias("mod_moved"),
    )
    return agg.crossJoin(F.broadcast(la)).select(
        "n_keys",
        "rdv_moved",
        "mod_moved",
        F.round(F.col("rdv_moved") / F.col("n_keys"), 6).alias(
            "rdv_moved_frac"
        ),
        F.round(F.col("mod_moved") / F.col("n_keys"), 6).alias(
            "mod_moved_frac"
        ),
        "max_load",
        "min_load",
    )
