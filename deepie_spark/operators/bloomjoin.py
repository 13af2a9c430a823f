"""Hand-rolled bloom runtime filter: semi-join reduction for joins
where the build side is too big to broadcast as ROWS but its key
FINGERPRINT is not.

The problem at 100 TB: ``fact ⋈ dim`` with a selective predicate on the
dim side.  If the filtered dim is still millions of rows, Catalyst
falls back to a shuffle join — the full fact table crosses the wire
only to drop most rows at the join.  Engines solve this with bloom
runtime filters (Spark's own InjectRuntimeFilter does it for some
shapes; the expression functions are not SQL-exposed in this build), so
the engine provides its own, in pure integer expressions:

  1. build: each dim key sets ``n_hashes`` bits of an ``m_bits`` bloom;
     bits aggregate with ``bit_or`` per 64-bit word (map-side combine),
     densified to a single in-row array — ONE ROW of m_bits/64 longs —
     and broadcast;
  2. probe: the fact side keeps a row only when all its key's bits are
     set — evaluated in-row BEFORE the shuffle, so the join moves
     ~|matches| + |fact|·fpr rows instead of |fact|;
  3. the real join still runs after the filter: false positives are
     dropped there, so the RESULT is exactly the plain join — which is
     what lets a plain-SQL oracle gate this operator hash-exactly.

The hash family is the portable poly-hash affine family (reduce mod
2^31−1 before multiplying — the stratified-sample overflow rule), so
the filter is deterministic across engines/partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepie_spark.functions.text import MOD

#: affine hash family constants (distinct odd multipliers)
_BLOOM_HASHES = ((1315423911, 17), (2654435761 % MOD, 101), (97, 1009))


def _bit_positions(key: Column, m_bits: int) -> list[Column]:
    k = F.pmod(key.cast("long"), F.lit(MOD))
    return [
        F.pmod(k * F.lit(a) + F.lit(b), F.lit(MOD)) % m_bits
        for a, b in _BLOOM_HASHES
    ]


def bloom_build(keys: DataFrame, key_col: str, m_bits: int) -> DataFrame:
    """ONE-ROW DataFrame (bloom array<long> of m_bits/64 words) — the
    broadcastable fingerprint of the key set.

    ``m_bits`` must be a multiple of 64: bits land in word
    ``bit // 64``, so a ragged final word would fall OUTSIDE the
    densified range, ``element_at`` would return NULL in
    :func:`bloom_prune`, and genuinely-matching rows would be silently
    dropped (a wrong join result, not a lost optimization)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    bits = keys.select(
        F.explode(F.array(*_bit_positions(F.col(key_col), m_bits))).alias(
            "bit"
        )
    )
    words = bits.select(
        F.shiftright(F.col("bit"), 6).alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias(
            "m"
        ),
    ).groupBy("w").agg(F.bit_or("m").alias("v"))
    dense = (
        keys.sparkSession.range(n_words)
        .select(F.col("id").alias("w"))
        .join(words, "w", "left")
        .select("w", F.coalesce("v", F.lit(0).cast("long")).alias("v"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "v"))),
            lambda s: s["v"],
        ).alias("bloom")
    )


def bloom_prune(
    df: DataFrame, bloom: DataFrame, key_col: str, m_bits: int
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the bloom (all bits set) —
    pure in-row integer expressions over the broadcast 1-row bloom."""
    out = df.crossJoin(F.broadcast(bloom))
    tmp = []
    cond = F.lit(True)
    for i, pos in enumerate(_bit_positions(F.col(key_col), m_bits)):
        p = f"_bloom_p{i}"
        tmp.append(p)
        out = out.withColumn(p, pos)
        word = F.element_at(
            "bloom", (F.shiftright(F.col(p), 6) + 1).cast("int")
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return out.filter(cond).drop("bloom", *tmp)


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
) -> DataFrame:
    """``fact ⋈ dim`` with a bloom pre-filter on the fact side.

    Result is EXACTLY the plain inner join (false positives washed by
    the join itself); only the shuffle volume changes."""
    bloom = bloom_build(dim.select(dim_key), dim_key, m_bits)
    pruned = bloom_prune(fact, bloom, fact_key, m_bits)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
