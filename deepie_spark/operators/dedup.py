"""Deduplication operators for web-scale training-data pipelines.

Five near/exact-dup families, all expressed as DataFrame plans:

* exact / bag-of-words (hash-groupBy) — one shuffle on the dup key;
* n-gram Jaccard (exact set similarity via shingle self-join);
* MinHash + LSH banding (the scale path: candidate pairs from band
  buckets, O(n·H) work instead of O(n²));
* SimHash (bitwise fingerprint; identical-fingerprint buckets);
* embedding-cosine near-dup (brute-force pairs; the ANN variant lives in
  operators.similarity).

Hashing is the *portable polynomial hash* (functions.text) so every
operator has a DuckDB-oracle twin; at production scale you'd swap in
``xxhash64`` (JVM intrinsic) via the ``hash_expr`` hooks — the plan
shape is identical.

Skew note: shingle self-joins explode on stop-shingles.  The Jaccard
join filters shingles by document frequency (``max_df``) first — the
standard guard that also caps the LSH bucket size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from deepie_spark.functions.text import (
    MOD,
    char_poly_hash_str,
    shingles,
    tokenize,
)
from deepie_spark.session import ensure_parallelism

# fixed affine coefficients for minhash permutations (any odd a works;
# pinned constants keep Spark and DuckDB twins identical)
def _minhash_coeffs(n: int) -> list[tuple[int, int]]:
    coeffs = []
    a, b = 1_103_515_245, 12_345
    x, y = 7, 3
    for _ in range(n):
        x = (x * a + b) % MOD
        y = (y * a + b) % MOD
        coeffs.append((x | 1, y))
    return coeffs


def doc_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(id, shingle) — distinct k-token shingles per document.

    Shingling is the CPU-heavy narrow stage of every dedup plan, so the
    input is rebalanced to cluster parallelism first (no-op on a
    many-split production table)."""
    df = ensure_parallelism(df)
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(shingles(tokenize(F.col(text_col)), k))
        ).alias("shingle"),
    )


def contamination_counts(
    df: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per-document count of k-gram shingles
    that also occur in the benchmark/eval set (docs with any overlap
    are quarantined before training).

    Scale shape: the benchmark side is eval-set-sized (thousands of
    docs) against a corpus of billions — its distinct shingle set is
    BROADCAST, so the probe is a map-side hash join with no shuffle;
    the only shuffle is the final per-document count (map-side
    combined).  Returns (doc_id, n_overlap) for overlapping docs."""
    bs = (
        doc_shingles(benchmark, id_col, text_col, k)
        .select("shingle")
        .distinct()
    )
    cs = doc_shingles(df, id_col, text_col, k)
    return (
        cs.join(F.broadcast(bs), "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
        .select(F.col("id").alias(id_col), "n_overlap")
    )


def dedup_exact(
    df: DataFrame, id_col: str = "doc_id", key: Column | None = None
) -> DataFrame:
    """Exact dedup on a normalized key; keeps the minimum id.
    One hash aggregation (map-side combine), holds at any scale."""
    key = key if key is not None else F.col("text")
    return (
        df.groupBy(key.alias("dup_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
    )


class ShingleCache:
    """Caller-owned persist lifecycle for :func:`ngram_jaccard_pairs`.

    The shingle table feeds three downstream consumers of one lazy
    result, so its persist must outlive the function call until the
    consumer's action runs — which only the CALLER knows.  Hold one of
    these per call site; ``release()`` (or leaving the ``with`` block)
    unpersists everything held.  Not thread-safe: share one cache per
    thread, like a SparkSession."""

    def __init__(self) -> None:
        self._held: list[DataFrame] = []

    def hold(self, df: DataFrame) -> DataFrame:
        df.persist()
        self._held.append(df)
        return df

    def release(self) -> None:
        while self._held:
            self._held.pop().unpersist(False)

    def __enter__(self) -> "ShingleCache":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    cache: ShingleCache | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jaccard ≥ threshold).

    shingle self-join → |A∩B| per pair; |A|,|B| from per-doc counts;
    J = inter / (|A|+|B|−inter).  ``max_df`` drops stop-shingles before
    the join (skew guard: a shingle shared by d docs contributes d²
    join rows).

    Pass a :class:`ShingleCache` to persist the shingle table across
    its three consumers (release it after the result is consumed);
    without one the plan recomputes shingles per consumer — correct,
    just slower.  At real scale the cache becomes an intermediate
    table write instead.

    ``max_cluster`` (round-3 verdict item 8) bounds per-shingle pair
    expansion — see :func:`_pair_intersections`."""
    j = _pair_intersections(
        df, k, id_col, text_col, max_df, cache, max_cluster
    )
    jac = F.col("inter") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    )
    return j.filter(jac >= threshold).select(
        "a", "b", "inter", "n_a", "n_b", F.round(jac, 6).alias("jaccard")
    )


def _pair_intersections(
    df: DataFrame,
    k: int,
    id_col: str,
    text_col: str,
    max_df: int | None,
    cache: ShingleCache | None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Shared core of the exact set-similarity family: canonical pairs
    (a < b) with shingle-intersection size and both set sizes —
    ``(a, b, inter, n_a, n_b)``.  The stop-shingle ``max_df`` guard
    runs BEFORE the self-join (a shingle shared by d docs contributes
    d² join rows); :func:`ngram_jaccard_pairs` and
    :func:`containment_pairs` differ only in the similarity projection
    they apply on top.

    ``max_cluster`` caps the OTHER quadratic: ``max_df`` bounds how many
    docs share one shingle, but a near-dup *cluster* of c docs still
    pays c² pairs across all its shingles.  With the cap, each shingle
    expands pairs only among its ``max_cluster`` smallest doc ids
    (deterministic, partitioned window) — per-shingle pair fan-out is
    ≤ max_cluster², so a pathological 10⁶-copy corpus stays linear.
    Capped semantics, documented: pairs where BOTH endpoints are outside
    a shingle's first ``max_cluster`` ids are not emitted; emitted pairs
    keep exact ``inter``/``n_a``/``n_b`` only when both endpoints
    survive the cap for every shared shingle (true for exact-copy
    clusters).  Set sizes are always computed pre-cap.  Default None →
    exact behavior, which is what every gated oracle query uses."""
    sh = doc_shingles(df, id_col, text_col, k)
    if cache is not None:
        sh = cache.hold(sh)
    if max_df:
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    pair_src = sh
    if max_cluster:
        w = W.partitionBy("shingle").orderBy("id")
        pair_src = (
            sh.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_cluster)
            .drop("_rk")
        )
    a = pair_src.select(F.col("id").alias("a"), "shingle")
    b = pair_src.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("id").alias("b"), F.col("n_sh").alias("n_b"))
    return inter.join(na, "a").join(nb, "b")


def containment_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = 1000,
    cache: ShingleCache | None = None,
    max_cluster: int | None = None,
) -> DataFrame:
    """Asymmetric shingle-containment near-dup pairs — the doc-in-doc
    detector Jaccard misses.  A boilerplate page embedding a full
    article scores ``containment(article → page) ≈ 1`` while Jaccard
    stays below any sane threshold because the page's extra shingles
    inflate the union (Broder's containment, the signal behind
    suffix-style substring dedup).

    Emits canonical pairs (a < b) with both directed containments
    ``cont_a = |A∩B| / |A|`` and ``cont_b = |A∩B| / |B|``, kept when
    either side crosses ``threshold``.  All-integer until the final
    divisions, so values are engine-portable.

    Plan shape and skew guard come from the shared
    :func:`_pair_intersections` core (stop-shingle ``max_df`` filter
    before the self-join; optional caller-owned :class:`ShingleCache`);
    this operator only applies the containment projection, so at scale
    both set-similarity operators share one shingle-pair
    materialization."""
    j = _pair_intersections(
        df, k, id_col, text_col, max_df, cache, max_cluster
    )
    cont_a = F.col("inter") / F.col("n_a")
    cont_b = F.col("inter") / F.col("n_b")
    return (
        j.filter(F.greatest(cont_a, cont_b) >= threshold)
        .select(
            "a",
            "b",
            "inter",
            "n_a",
            "n_b",
            F.round(cont_a, 6).alias("cont_a"),
            F.round(cont_b, 6).alias("cont_b"),
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key: Column,
    window: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995): order
    records by a blocking key, emit candidate pairs only within a
    sliding window of ``window`` consecutive records — O(n·window)
    candidates instead of the O(n²) all-pairs comparison.

    The global sort is :func:`~deepie_spark.operators.dictionary.
    rank_in_order` (range-bucketed prefix-offset ranking), so there is
    NO single-partition window even at web-scale n; pairing is one
    equi-join of the ranked table with its rank-shifted explode
    (``window − 1`` shifted copies via in-row ``sequence``), shuffled
    on the rank — uniformly distributed by construction, no skew.

    Ties in ``key`` break on ``id_col``, making ranks — and therefore
    the emitted pair set — deterministic under any partitioning.
    Output: (a, b, dist) with a preceding b by ``dist`` ranks,
    1 ≤ dist < window.  Requires ``window ≥ 2``: Spark's
    ``sequence(1, 0)`` DESCENDS ([1, 0]), so window=1 would emit
    dist=0 self-pairs instead of no pairs."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from deepie_spark.operators.dictionary import rank_in_order

    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.struct(key.alias("k"), F.col(id_col).alias("i")).alias("_ord"),
    )
    ranked = rank_in_order(keyed, "_ord", start_id=0, id_col="rk").select(
        "_id", "rk"
    )
    left = ranked.select(
        F.col("_id").alias("a"),
        F.col("rk"),
        F.explode(
            F.sequence(F.lit(1), F.lit(window - 1))
        ).alias("dist"),
    ).withColumn("rk_b", F.col("rk") + F.col("dist"))
    right = ranked.select(F.col("_id").alias("b"), F.col("rk").alias("rk_b"))
    return left.join(right, "rk_b").select(
        "a", "b", F.col("dist").cast("long").alias("dist")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache: ShingleCache | None = None,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING (Chaudhuri et al. 2006 /
    PPJoin): provably complete candidate generation WITHOUT the full
    shingle self-join.

    Principle: order each doc's distinct shingles by ascending global
    document frequency (rarest first, ties by shingle); if
    J(A,B) ≥ t then A and B must share a shingle within each other's
    first ``n − ⌈t·n⌉ + 1`` shingles — so joining only on PREFIX
    shingles finds every qualifying pair.  (The prefix length is
    computed from ``⌈t·n⌉`` directly, NOT ``⌊(1−t)·n⌋``: for t=0.8/0.9
    the float ``1−t`` is below the exact value, and floor would yield a
    prefix one element SHORT of the provable bound, silently dropping
    J==t boundary pairs.  An ε is subtracted before the ceil so an
    upward-rounded integral ``t·n`` can only ever LENGTHEN the prefix —
    longer prefixes stay complete, they just admit a few extra
    candidates.)  Candidates are verified IN-ROW: the candidate pair
    joins back to the two per-doc ordered shingle arrays and the exact
    intersection is ``size(array_intersect(arr_a, arr_b))`` — O(pairs·n)
    with zero fan-out, matching PPJoin's own verify step.  (The earlier
    shingle re-join verification paid candidates² rows on any shared
    stop-shingle — the exact blowup prefix filtering exists to avoid.)

    Scale shape: the join fan-out per shingle is bounded by how many
    docs carry it IN THEIR PREFIX — rare shingles by construction —
    instead of full df² (the reason ngram_jaccard needs its max_df
    guard).  The win scales with the threshold: prefix length is
    ⌊(1−t)·n⌋+1, so at t=0.9 only ~10% of shingles join, while at
    t=0.5 half the doc is prefix and the guarded exact twin is
    competitive (measured: 9.0 s vs ngram_jaccard's 2.6-4 s at sf0.1,
    t=0.5 — the gated query pins CORRECTNESS at the twin-shared
    threshold; production near-dup thresholds of 0.8-0.9 are where
    this operator is the right plan).  Plan: one df-count agg, one sort inside the doc's own row
    (array_sort on (df, shingle) structs — in-row, no window), prefix
    explode, equi-join, then exact verification on the candidate set
    only.  Output matches :func:`ngram_jaccard_pairs` exactly
    (same (a, b, inter, n_a, n_b, jaccard) rows) — asserted by test and
    by sharing its oracle.

    The shingle table has two consumers (df counts, per-doc ordering —
    verification reads the ordered ARRAYS, not the shingle table);
    ``cache`` persists it across them, but MEASURE
    before using it — at sf0.1 the cheap JVM shingle recompute beat the
    persist by ~1.8x (6.97 s vs 12.55 s: materializing 3.9M string
    rows costs more than recomputing them, and the cache boundary
    blocks whole-stage fusion).  Caching pays only when the upstream is
    expensive (ngram_jaccard's pattern) or re-read many more times."""
    sh = doc_shingles(df, id_col, text_col, k)  # distinct per doc already
    if cache is not None:
        sh = cache.hold(sh)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("df", "shingle"))
                ),
                lambda s: s["shingle"],
            ).alias("ordered")
        )
    )
    n_sh = F.size(F.col("ordered"))
    # complete prefix length n − ⌈t·n⌉ + 1; ε keeps an upward-rounded
    # integral t·n from SHORTENING the prefix (see docstring)
    plen = (
        n_sh - F.ceil(n_sh * F.lit(threshold) - F.lit(1e-9)) + 1
    ).cast("int")
    prefixes = ranked.select(
        F.col("id"),
        F.explode(F.slice(F.col("ordered"), 1, plen)).alias("shingle"),
    )
    a = prefixes.select(F.col("id").alias("a"), "shingle")
    b = prefixes.select(F.col("id").alias("b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    # exact IN-ROW verification: each candidate pair pulls the two
    # ordered arrays and intersects them inside its own row — no
    # shingle-keyed self-join, O(pairs·n) total work
    arr_a = ranked.select(
        F.col("id").alias("a"), F.col("ordered").alias("arr_a")
    )
    arr_b = ranked.select(
        F.col("id").alias("b"), F.col("ordered").alias("arr_b")
    )
    j = (
        cand.join(arr_a, "a")
        .join(arr_b, "b")
        .select(
            "a",
            "b",
            F.size(F.array_intersect("arr_a", "arr_b")).alias("inter"),
            F.size("arr_a").alias("n_a"),
            F.size("arr_b").alias("n_b"),
        )
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return j.filter(jac >= threshold).select(
        "a",
        "b",
        F.col("inter").cast("long").alias("inter"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(jac, 6).alias("jaccard"),
    )


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, sig array<long>) minhash signatures.

    shingle → portable hash h0 → n affine permutations → min per
    permutation.  One explode + one groupBy; linear in corpus size."""
    sh = doc_shingles(df, id_col, text_col, k).withColumn(
        "h0", char_poly_hash_str(F.col("shingle"))
    )
    aggs = [
        F.min((F.col("h0") * F.lit(a) + F.lit(b)) % MOD).alias(f"h{i}")
        for i, (a, b) in enumerate(_minhash_coeffs(n_hashes))
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of their signature.

    Bands of r = n/bands rows each; bucket key = the band's value tuple.
    Self-join per band via groupBy(band_key); emits distinct (a < b)
    candidates.  This is the 100 TB dedup path: no quadratic work, and
    hot buckets are bounded by band width."""
    r = n_hashes // bands
    sig = minhash_signatures(df, n_hashes, k, id_col, text_col)
    # one explode over an in-row band array — a union of per-band selects
    # would recompute the signature aggregation once per band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.slice("sig", bi * r + 1, r)[i].cast("string")
                        for i in range(r)
                    ],
                ).alias("band_key"),
            )
            for bi in range(bands)
        ]
    )
    band_rows = sig.select("id", F.explode(band_structs).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    a = band_rows.select("band", "band_key", F.col("id").alias("a"))
    b = band_rows.select("band", "band_key", F.col("id").alias("b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash_fingerprints(
    df: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, simhash long): sign of per-bit weight sums over token hashes.

    For each distinct token with portable hash h, bit i contributes +1
    if (h >> i) & 1 else −1; fingerprint bit i = 1 iff the sum > 0.
    Near-dups share fingerprints (or differ in few bits — banding over
    bit ranges generalizes exactly like minhash LSH)."""
    df = ensure_parallelism(df)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokenize(F.col(text_col)))).alias("tok"),
    ).withColumn("h", char_poly_hash_str(F.col("tok")))
    bit_sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i) % 2 == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select("id", fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash banding: fingerprints are cut into
    ``bands`` bit-ranges; docs sharing any band are candidates, then the
    exact Hamming distance (``bit_count(xor)``) filters to
    ``max_hamming``.  Pigeonhole guarantee: any pair within
    ``bands - 1`` bits of each other shares at least one band, so for
    ``max_hamming < bands`` recall is exact — banding only prunes work,
    never answers."""
    assert bits % bands == 0
    width = bits // bands
    mask = (1 << width) - 1
    fp = simhash_fingerprints(df, bits, id_col, text_col)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                (
                    F.shiftright(F.col("simhash"), bi * width)
                    .bitwiseAND(F.lit(mask))
                ).alias("band_key"),
            )
            for bi in range(bands)
        ]
    )
    rows = fp.select(
        "id", "simhash", F.explode(band_structs).alias("bk")
    ).select("id", "simhash", "bk.band", "bk.band_key")
    a = rows.select(
        "band", "band_key", F.col("id").alias("a"), F.col("simhash").alias("fa")
    )
    b = rows.select(
        "band", "band_key", F.col("id").alias("b"), F.col("simhash").alias("fb")
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "fa", "fb")
        .distinct()
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force embedding near-dup pairs (a < b, cosine ≥ threshold).

    Quadratic — correct baseline for verification; the scale path is
    operators.similarity (LSH bucketing).  Dot products are sequential
    left-to-right folds in double precision so the DuckDB twin is
    bit-identical."""
    v = emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a = v.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    sim = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    return (
        pairs.withColumn("cosine", F.round(sim, 6))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def dup_ngram_window_rate(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicate-substring rate (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — the
    per-doc signal of their exact-substring dedup, restated over
    n-token windows).

    For every position p in a document, the window is the n tokens
    starting at p; the rate is the fraction of positions whose window
    text also occurs in at least one OTHER document.  Unlike the
    pairwise dedup family above this never self-joins documents: the
    plan is explode → two map-side-combinable aggregations → one join
    back on the window string — linear in corpus token count, and the
    per-window fan-in is the document frequency of that window (no d²
    blowup).  At petabyte scale the join key would be pre-hashed to a
    128-bit fingerprint; here the string key keeps the DuckDB oracle
    collision-free by construction.

    Documents shorter than n tokens have no windows and are omitted
    (callers wanting them back left-join on the id).
    """
    toks = tokenize(F.col(text_col))
    wins = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = docs.select(F.col(id_col).alias("doc_id"), F.explode(wins).alias("win"))
    # document frequency per window via distinct (win, doc) pairs —
    # two-level agg, both stages partial-aggregated map-side
    df_shared = (
        pos.distinct()
        .groupBy("win")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") > 1)
        .select("win")
    )
    flagged = pos.join(df_shared, "win", "left_semi").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_windows")
    )
    totals = pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_windows"))
    return (
        totals.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_rate",
            F.round(F.col("n_dup_windows").cast("double") / F.col("n_windows"), 6),
        )
    )


def symspell_pairs(
    vocab: DataFrame,
    token_col: str = "token",
    max_dist: int = 2,
) -> DataFrame:
    """All DISTINCT vocabulary pairs within Levenshtein distance
    ``max_dist`` (1 or 2) via SymSpell deletion-neighborhood joins
    (Garbe's symmetric-delete algorithm) — the scale path for fuzzy
    vocabulary matching: fuzzy_alias_match's catalog broadcast works
    for a bounded alias list, but vocab×vocab edit distance at 10⁹
    tokens needs a candidate generator.

    Guarantee: if lev(a, b) ≤ d then the depth-d deletion
    neighborhoods D_d(a) and D_d(b) intersect (every edit script can
    be replayed as ≤ d deletions on each side), so the equi-join on
    deletion variants produces a COMPLETE candidate set; a final
    ``levenshtein() ≤ d`` verify (JVM codegen) removes false
    positives.  Work per token is in-row O(len^d) variant generation
    (d ≤ 2), and the join is an equi-join on the variant string —
    never a cross product.

    Both engines implement classic Levenshtein (no transposition), so
    the verified distances are engine-identical exact ints.
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    t = vocab.select(F.col(token_col).alias("tok")).distinct()
    d1 = (
        "transform(filter(sequence(1, greatest(length(tok), 1)),"
        " i -> i <= length(tok)),"
        " i -> concat(substring(tok, 1, i - 1),"
        " substring(tok, i + 1, length(tok))))"
    )
    parts = ["array(tok)", d1]
    if max_dist == 2:
        parts.append(
            "flatten(transform(filter(sequence(1, greatest(length(tok),"
            " 1)), i -> i <= length(tok)), i ->"
            " transform(filter(sequence(1, greatest(length(tok), 1)),"
            " j -> j > i),"
            " j -> concat(substring(tok, 1, i - 1),"
            " substring(tok, i + 1, j - i - 1),"
            " substring(tok, j + 1, length(tok))))))"
        )
    variants = F.expr(
        "array_distinct(concat(" + ", ".join(parts) + "))"
    )
    ex = t.select("tok", F.explode(variants).alias("v"))
    a = ex.select(F.col("v"), F.col("tok").alias("a"))
    b = ex.select(F.col("v"), F.col("tok").alias("b"))
    cand = (
        a.join(b, "v")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    dist = F.levenshtein("a", "b")
    return cand.filter(dist <= max_dist).select(
        "a", "b", dist.cast("long").alias("dist")
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 16,
    max_len: int = 128,
    divisor: int = 64,
    window: int = 16,
) -> DataFrame:
    """Content-defined chunking (the LBFS/FastCDC rolling-window
    family, Muthitacharoen et al. SOSP 2001): cut each document at
    positions where the poly hash of the LAST ``window`` characters
    satisfies ``h mod divisor == 0`` (subject to min/max chunk
    lengths, forced cut at ``max_len``).  The cut decision depends
    only on a local window of content — NOT on the chunk start — so
    after an insertion/deletion the downstream boundaries re-align
    and most chunk hashes dedup against the unedited original (the
    property fixed-width blocks lack; asserted by the prefix-edit
    test).  Expected chunk size ≈ min_len + divisor.

    Two accumulators ride one in-row ``aggregate`` fold over
    (position, char, lagged-char) structs (collection evaluated once
    — the winnow HOF-CSE rule): the sliding hash
    ``h' = (h·B + c − c_lag·B^w) mod M`` (= the window poly hash once
    p ≥ w, the full prefix before that) decides cuts; a second
    chunk-anchored hash resets at cuts and is emitted as
    ``chunk_hash`` (the chunk's own char_poly_hash — the dedup key).
    With ``min_len ≥ window`` every cut position has a full window,
    which is what lets the DuckDB twin derive cut points per-position
    from prefix hashes.  Map-only: zero shuffles, O(len) per row.

    Returns (id, chunk_idx, start, length, chunk_hash), 1-based
    ``start``; a non-empty tail emits a final partial chunk.
    """
    if not (0 < window <= min_len <= max_len):
        raise ValueError("need 0 < window <= min_len <= max_len")
    from deepie_spark.functions.text import BASE, MOD

    bw = pow(BASE, window, MOD)
    fold = F.aggregate(
        F.expr(
            f"transform(sequence(1, length({text_col})),"
            f" i -> struct(CAST(i AS LONG) AS p,"
            f" CAST(ascii(substring({text_col}, i, 1)) AS LONG) AS c,"
            f" CAST(CASE WHEN i > {window} THEN"
            f" ascii(substring({text_col}, i - {window}, 1))"
            f" ELSE 0 END AS LONG) AS lag))"
        ),
        F.struct(
            F.lit(0).cast("long").alias("s"),
            F.lit(0).cast("long").alias("hw"),
            F.lit(0).cast("long").alias("hc"),
            F.expr(
                "CAST(array() AS"
                " array<struct<start: long, len: long, h: long>>)"
            ).alias("cs"),
        ),
        lambda acc, e: _cdc_step(acc, e, min_len, max_len, divisor, bw),
        lambda fin: F.when(
            F.length(F.col(text_col)) > fin["s"],
            F.concat(
                fin["cs"],
                F.array(
                    F.struct(
                        (fin["s"] + 1).alias("start"),
                        (F.length(F.col(text_col)) - fin["s"])
                        .cast("long")
                        .alias("len"),
                        fin["hc"].alias("h"),
                    )
                ),
            ),
        ).otherwise(fin["cs"]),
    )
    base = docs.filter(F.length(F.col(text_col)) > 0).select(
        F.col(id_col), fold.alias("chunks")
    )
    return base.select(
        id_col, F.posexplode("chunks").alias("chunk_idx", "ch")
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("ch.start").alias("start"),
        F.col("ch.len").alias("length"),
        F.col("ch.h").alias("chunk_hash"),
    )


def _cdc_step(acc, e, min_len, max_len, divisor, bw):
    """One fold step: advance both hashes, cut when the sliding hash
    divides (length permitting) or max_len forces it."""
    from deepie_spark.functions.text import BASE, MOD

    hw = (
        (acc["hw"] * BASE + e["c"] - e["lag"] * bw) % MOD + MOD
    ) % MOD
    hc = (acc["hc"] * BASE + e["c"]) % MOD
    cut = (
        (e["p"] - acc["s"] >= min_len) & (hw % divisor == 0)
    ) | (e["p"] - acc["s"] >= max_len)
    return F.when(
        cut,
        F.struct(
            e["p"].alias("s"),
            hw.alias("hw"),
            F.lit(0).cast("long").alias("hc"),
            F.concat(
                acc["cs"],
                F.array(
                    F.struct(
                        (acc["s"] + 1).alias("start"),
                        (e["p"] - acc["s"]).alias("len"),
                        hc.alias("h"),
                    )
                ),
            ).alias("cs"),
        ),
    ).otherwise(
        F.struct(
            acc["s"].alias("s"),
            hw.alias("hw"),
            hc.alias("hc"),
            acc["cs"].alias("cs"),
        )
    )


_OPH_BORROW = 1 << 40  # borrow offset: above the hash range, so a
#                        densified slot only matches an identically
#                        densified slot (same source bin AND distance)


def oph_signatures(
    df: DataFrame,
    n_bins: int = 32,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One-permutation hashing signatures (Li-Owen-Zhang) with
    rotation densification (Shrivastava-Li): ONE hash pass bins each
    shingle by h mod B and keeps min(h div B) per bin — B times
    cheaper than B-permutation minhash at the same signature length —
    and every EMPTY bin borrows from its nearest non-empty cyclic
    right neighbor at distance t, offset by t·2⁴⁰ so borrowed slots
    only collide when both docs borrowed the same value over the same
    distance.  The "first non-empty at increasing t" scan is
    reformulated ORDER-FREE as t = min over filled bins of
    ((bin−j) mod B), so both engines express densification as pure
    in-row list algebra (no sequential fold).  Everything is exact
    longs on the portable poly hash; Jaccard estimate for a pair =
    matching slots / B."""
    from deepie_spark.functions.text import char_poly_hash_str

    sh = doc_shingles(df, id_col, text_col, k).withColumn(
        "h0", char_poly_hash_str(F.col("shingle"))
    )
    binned = sh.groupBy(
        "id", (F.col("h0") % n_bins).cast("long").alias("bin")
    ).agg(
        F.min(F.expr(f"h0 div {n_bins}")).cast("long").alias("v")
    )
    ent_df = binned.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("bin", "v"))).alias("ent")
    )

    def lookup(j):
        return F.try_element_at(
            F.filter(F.col("ent"), lambda e: e["bin"] == j), F.lit(1)
        )["v"]

    def tmin(j):
        return F.array_min(
            F.transform(
                F.col("ent"),
                lambda e: ((e["bin"] - j) % n_bins + n_bins) % n_bins,
            )
        )

    def slot(j):
        tm = tmin(j)
        return F.coalesce(
            lookup(j),
            lookup((j + tm) % n_bins) + tm * F.lit(_OPH_BORROW),
        )

    sig = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(n_bins - 1).cast("long")),
        lambda j: slot(j),
    )
    return ent_df.select("id", sig.alias("sig"))
