"""Within-page mention-pair generation (north-star stage 3).

The reference's unit of work is a pre-built (e1, e2) pair per record; the
pipeline must *generate* those pairs from detected mentions.  Pairing is
shuffle-free: mentions arrive as an array per page, and ordered pairs are
produced with nested array ``transform`` + ``flatten`` — the data never
leaves its partition.  The P5 distance predicate
(|pos2 − pos1| ≤ maximumDistance, rnn_process_onlyExtra.py:10,59-61)
prunes the quadratic blowup; at 100 TB this bound is what keeps hot
(mention-dense) pages from dominating task time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mention_pairs(mentions: DataFrame, max_distance: int = 10) -> DataFrame:
    """(url, tokens, mentions[]) → one row per ordered mention pair.

    Pairs are ordered left-to-right (pos1 < pos2, positions being the
    last-token rule positions); both directions of a relation are
    expressed by the label's (e1,e2)/(e2,e1) suffix, mirroring the
    reference's directed-label convention rather than emitting mirrored
    pairs.
    """
    m = F.col("mentions")
    pair_structs = F.flatten(
        F.transform(
            m,
            lambda a: F.filter(
                F.transform(
                    m,
                    lambda b: F.struct(
                        a.alias("m1"), b.alias("m2")
                    ),
                ),
                lambda p: (p["m1"]["pos"] < p["m2"]["pos"])
                & (
                    (p["m2"]["pos"] - p["m1"]["pos"]) <= max_distance
                ),
            ),
        )
    )
    exploded = mentions.select(
        "url", F.explode(pair_structs).alias("pair")
    )
    return exploded.select(
        "url",
        F.col("pair.m1.pos").alias("pos1"),
        F.col("pair.m2.pos").alias("pos2"),
        F.col("pair.m1.alias").alias("alias1"),
        F.col("pair.m2.alias").alias("alias2"),
        F.col("pair.m1.entity_id").alias("entity_id1"),
        F.col("pair.m2.entity_id").alias("entity_id2"),
        F.col("pair.m1.entity_type").alias("type1"),
        F.col("pair.m2.entity_type").alias("type2"),
        F.col("pair.m1.subtype").alias("subtype1"),
        F.col("pair.m2.subtype").alias("subtype2"),
        (F.col("pair.m2.pos") - F.col("pair.m1.pos")).alias("distance"),
    )
