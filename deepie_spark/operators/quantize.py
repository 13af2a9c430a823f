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


def product_quantize(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes (Jégou et al. 2011 — the FAISS
    standard beside SQ8): split each vector into ``m`` contiguous
    subspaces of ``dim/m`` dimensions, fit a k-means codebook per
    subspace (operators/clustering.kmeans_fit — deterministic
    first-k-by-id seeding, Lloyd ``iters`` rounds), and emit
    ``(vec_id, sub, code)`` — the nearest-centroid id per subspace.
    Compression: dim·4 bytes → m·⌈log₂k⌉ bits.

    Portability: the argmin is over squared distances computed as the
    same left-to-right in-row fold in both engines (the kmeans gate's
    `_km_dist2_sql` identity), so codes are engine-bit-identical.
    Scale shape: per subspace the corpus-sized work is ``iters+1``
    assignment passes (in-row argmin against k broadcast-literal
    centroids) and ``iters`` k-row centroid aggs; the m subspaces are
    m independent column slices of ONE scan each — nothing corpus².
    """
    from deepie_spark.operators.clustering import kmeans_fit

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sd = dim // m
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint()
    out = None
    for s in range(int(m)):
        sub = e.select(
            "vec_id", F.slice("v", s * sd + 1, sd).alias("embedding")
        )
        assigned, _ = kmeans_fit(sub, k=k, iters=iters)
        part = assigned.select(
            "vec_id",
            F.lit(s).cast("int").alias("sub"),
            F.col("cluster").cast("long").alias("code"),
        )
        out = part if out is None else out.unionByName(part)
    return out
