"""Embedding compression: per-dimension scalar quantization.

The storage/IO side of the ANN family (operators/similarity.py): at
10⁹+ vectors the float32 embedding column dominates scan cost, and
every production ANN system stores a compressed code alongside (or
instead of) the raw vector — scalar quantization (SQ8, the
Faiss/Milvus default) maps each dimension to an int8 code against
per-dimension min/max bounds.  This is the exact-arithmetic half of
product quantization; the k-means codebook half is
operators/clustering.py.

Engine portability (what makes the codes oracle-gateable): min/max
are order-free exact aggregates (no FP summation anywhere), the
affine map ``(x − lo) / (hi − lo) · levels`` is the same three IEEE
ops on the same doubles in both engines, and ``floor`` of identical
doubles is identical — so codes are bit-exact, not just close.

Scale shape: the explode is map-only; the per-dim stats agg is
d-row-sized output with map-side combine (one shuffle of d·splits
partial rows); the stats join-back is a broadcast BY DEFINITION
(d rows).  Nothing is corpus²."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """(id, dim, code): per-dimension scalar quantization codes in
    ``[0, levels)`` against corpus-wide per-dim min/max.  A constant
    dimension (hi == lo) codes to 0; the top of the range (x == hi)
    codes to ``levels − 1`` via the least() clamp.
    """
    if levels < 2:
        raise ValueError(f"levels must be >= 2, got {levels}")
    x = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("dim", "xf"),
    ).select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.col("xf").cast("double").alias("xv"),
    )
    stats = x.groupBy("dim").agg(
        F.min("xv").alias("lo"), F.max("xv").alias("hi")
    )
    code = (
        F.when(
            F.col("hi") > F.col("lo"),
            F.least(
                F.lit(levels - 1).cast("long"),
                F.floor(
                    (F.col("xv") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(float(levels))
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return x.join(F.broadcast(stats), "dim").select(
        "vec_id", "dim", code.alias("code")
    )
