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


def pq_fit(
    emb: DataFrame,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Like :func:`product_quantize` but ALSO returns the fitted
    codebooks: ``(codes_df, books)`` with ``books[s]`` the subspace-s
    centroid list ``[(cid, vector), ...]`` — the piece ADC search
    (pq_topk) needs.  Codes and books are mutually consistent (the
    final assignment runs against the returned centroids)."""
    from deepie_spark.operators.clustering import kmeans_fit

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sd = dim // m
    e = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint()
    out, books = None, []
    for s in range(int(m)):
        sub = e.select(
            "vec_id", F.slice("v", s * sd + 1, sd).alias("embedding")
        )
        assigned, centroids = kmeans_fit(sub, k=k, iters=iters)
        books.append(centroids)
        part = assigned.select(
            "vec_id",
            F.lit(s).cast("int").alias("sub"),
            F.col("cluster").cast("long").alias("code"),
        )
        out = part if out is None else out.unionByName(part)
    return out, books


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codebook: int = 4,
    iters: int = 2,
    dim: int = 64,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by PQ asymmetric distance computation (ADC,
    Jégou et al. 2011): per query, the subspace lookup table holds the
    exact squared distance from the query's sub-vector to each
    codebook centroid; a corpus vector's ADC distance is the sum of
    its m code lookups.  ``queries`` is ``(query_id, qvec)``.

    The 100-TB shape: the corpus-sized work touches only the CODE
    table (m small ints per vector — the point of PQ); the LUT is
    Q·m·k_codebook rows built from broadcast centroid literals and
    joined on (sub, code).  FP portability: each LUT entry is the
    same in-row left-to-right distance fold as the k-means gate, and
    the per-vector sum folds the m entries in SUBSPACE ORDER (a
    sorted in-row fold — never sum() over arbitrary row order).
    Output: ``(query_id, vec_id, rank, adc)`` with adc rounded to 6dp,
    rank ties broken by vec_id; self-matches excluded (the
    brute_force_topk convention).
    """
    from deepie_spark.operators.clustering import _sq_dist

    codes, books = pq_fit(
        emb, m=m, k=k_codebook, iters=iters, dim=dim,
        id_col=id_col, vec_col=vec_col,
    )
    sd = dim // m
    q = queries.select(
        F.col("query_id"),
        F.transform(F.col("qvec"), lambda x: x.cast("double")).alias("qv"),
    )
    lut = None
    for s, book in enumerate(books):
        qs = F.slice("qv", s * sd + 1, sd)
        cells = F.array(*[
            F.struct(
                F.lit(int(cid)).cast("long").alias("code"),
                _sq_dist(qs, c).alias("d2"),
            )
            for cid, c in book
        ])
        part = q.select(
            "query_id", F.lit(s).cast("int").alias("sub"),
            F.explode(cells).alias("cell"),
        ).select(
            "query_id", "sub",
            F.col("cell.code").alias("code"), F.col("cell.d2").alias("d2"),
        )
        lut = part if lut is None else lut.unionByName(part)
    scored = (
        codes.join(lut, ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sort_array(F.collect_list(F.struct("sub", "d2"))).alias("ds"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.aggregate(
                    "ds", F.lit(0.0),
                    lambda acc, x: acc + x["d2"],
                ),
                6,
            ).alias("adc"),
        )
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("adc").asc(), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "vec_id", "rank", "adc")
    )


#: affine sign-hash coefficients for the JL projection — literal ints
#: shared with the DuckDB twin.
RP_A, RP_B, RP_C = 2_654_435_761, 40_503, 97


def random_project_codes(
    codes: DataFrame,
    m_dims: int = 8,
    id_col: str = "vec_id",
    dim_col: str = "dim",
    code_col: str = "code",
) -> DataFrame:
    """Johnson-Lindenstrauss-style ±1 random projection over INTEGER
    quantization codes (the scalar_quantize output): output dim o of
    vector v is y_o = Σ_d code_d · s(d, o) with s(d, o) = ±1 from the
    parity of an affine hash of (d, o) — the projection matrix is
    never materialized, and because the inputs are ints every
    projected value is an EXACT long (Achlioptas' database-friendly
    variant, made hash-gateable by quantizing first).  Plan: the
    m-fold expansion rides a literal array explode, one hash agg on
    (id, o) — shuffle is N·m rows, independent of the input dim.
    Distance preservation: E[‖y_u − y_v‖²] = m·‖code_u − code_v‖²
    (callers divide by m)."""
    from deepie_spark.functions.text import MOD

    os_ = F.explode(
        F.array(*[F.lit(o) for o in range(m_dims)])
    ).alias("o")
    e = codes.select(
        F.col(id_col).alias("vec_id"),
        F.col(dim_col).cast("long").alias("_d"),
        F.col(code_col).cast("long").alias("_c"),
    ).select("vec_id", "_d", "_c", os_)
    sign = F.lit(1) - F.lit(2) * (
        (
            (F.col("_d") * F.lit(RP_A) + F.col("o") * F.lit(RP_B) + F.lit(RP_C))
            % F.lit(MOD)
        )
        % 2
    )
    return (
        e.groupBy("vec_id", "o")
        .agg(F.sum(F.col("_c") * sign).cast("long").alias("y"))
        .select("vec_id", F.col("o").cast("int").alias("o"), "y")
    )


def isotropy_stats(
    emb: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 16,
) -> DataFrame:
    """Isotropy audit of an embedding collection (the mean-vector
    dominance check of Mu & Viswanath, ICLR 2018 — "All-but-the-Top"):
    a healthy embedding space has near-zero average pairwise dot and
    a mean vector carrying a vanishing share of the energy; a
    collapsed one does not.  The O(n²) pairwise-dot average reduces
    to the GRAM identity

        Σ_{i≠j} ⟨x_i, x_j⟩  =  ‖Σ_i x_i‖² − Σ_i ‖x_i‖²

    — two linear passes, never a pair join (the 100-TB shape).

    Exactness: each coordinate is quantized floor(2^bits·x) ONCE
    (identical float→double→floor on both engines), after which both
    sides of the identity are EXACT LONGS: per-dim sums S_d via one
    dim-keyed agg, then Σ S_d² and Σ‖x‖².  Long bound: |S_d| ≲
    n·2^bits·max|x| must stay < 2^31 so S_d² sums fit — the default
    2^16 holds to ~10⁵ unit-scale vectors per exact-gated run; at
    corpus scale drop scale_bits (the audit is scale-free).

    Output one row: (n_vecs, sum_norm2q, s_norm2q, avg_dot_q,
    mean_energy_ratio) where avg_dot_q de-quantizes by 4^bits and
    mean_energy_ratio = ‖S‖²/(n·Σ‖x‖²) = (mean-vector energy) /
    (mean per-vector energy), both single IEEE divides."""
    q = F.floor(
        F.col("x").cast("double") * F.lit(float(1 << scale_bits))
    ).cast("long")
    ex = emb.select(
        F.posexplode(F.col(vec_col)).alias("d", "x")
    ).select("d", q.alias("xq"))
    per_dim = ex.groupBy("d").agg(
        F.sum("xq").cast("long").alias("s_d"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("n2_d"),
    )
    n = emb.agg(F.count(F.lit(1)).cast("long").alias("n_vecs"))
    agg = per_dim.agg(
        F.sum(F.col("s_d") * F.col("s_d")).cast("long").alias("s_norm2q"),
        F.sum("n2_d").cast("long").alias("sum_norm2q"),
    )
    qq = float(1 << (2 * scale_bits))
    return agg.crossJoin(F.broadcast(n)).select(
        "n_vecs",
        "sum_norm2q",
        "s_norm2q",
        F.round(
            (F.col("s_norm2q") - F.col("sum_norm2q")).cast("double")
            / (F.col("n_vecs") * (F.col("n_vecs") - 1)).cast("double")
            / F.lit(qq),
            6,
        ).alias("avg_dot_q"),
        F.round(
            F.col("s_norm2q").cast("double")
            / (F.col("n_vecs") * F.col("sum_norm2q")).cast("double"),
            6,
        ).alias("mean_energy_ratio"),
    )
