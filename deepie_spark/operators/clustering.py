"""Distributed Lloyd k-means over an embedding column.

The canonical "cluster the corpus embeddings" step of a training-data
pipeline (e.g. cluster-balanced sampling, semantic dedup à la SemDeDup).
The design follows ``operators/similarity.py``'s IVF quantizer, which
this generalizes: centroids live driver-side (k·dim floats — bounded,
like any broadcast dimension table), each Lloyd iteration is

  * **assign**: an in-row argmin over the centroid literals — pure JVM
    codegen, no shuffle, no Python;
  * **update**: one groupBy(cluster) with per-dimension ``avg`` — a
    single map-side-combinable aggregation producing exactly k rows,
    which are collected back (k·dim doubles — the only driver traffic).

That is the plan that survives 100 TB: per iteration one narrow pass +
one k-row agg, versus MLlib's RDD path which this mirrors structurally
but keeps in the DataFrame/codegen world end-to-end.

Determinism: seeds are the first ``k`` vectors ordered by id (the same
row_number rule as the IVF oracle); argmin ties break to the smallest
cluster id via struct ordering; empty clusters are dropped (both the
DuckDB oracle and this implementation see only assigned clusters), so
iteration results are reproducible across partitionings — asserted in
tests.

Distances fold left-to-right over the vector (sequential double adds),
matching DuckDB ``list_sum(list_transform(...))`` bit-for-bit on the
first iteration; subsequent iterations' centroid means are engine-summed
(order differs in the last ulps) which is why gated outputs round to 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from deepie_spark.operators.similarity import _as_double


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def assign_clusters(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "v",
) -> DataFrame:
    """argmin_{(cid, c)} ||v - c||² as an in-row expression.

    ``centroids`` is [(cluster_id, vector), ...]; ties pick the smallest
    cluster id (struct comparison: dist2 first, cid second)."""
    choices = F.array(
        *[
            F.struct(
                _sq_dist(F.col(vec_col), c).alias("dist2"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    return emb.withColumn("cluster", F.array_min(choices)["cid"].cast("long"))


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd k-means; returns (assignment DataFrame, final centroids).

    The returned DataFrame has (vec_id, v, cluster) where ``cluster`` is
    the assignment against the RETURNED centroids (i.e. after ``iters``
    update steps there is one final assign pass, so df and centroids are
    consistent)."""
    e = emb.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    seeds = e.orderBy("vec_id").limit(k).collect()  # bounded: k rows
    centroids = [(i, [float(x) for x in r["v"]]) for i, r in enumerate(seeds)]
    dim = len(centroids[0][1])
    # persist across the Lloyd collects (pagerank lesson: iterative
    # consumers re-run the whole upstream per action otherwise), then
    # release before building the lazily-evaluated result plan so no
    # cache handle outlives this call
    e = e.persist()
    try:
        for _ in range(iters):
            assigned = assign_clusters(e, centroids)
            rows = (
                assigned.groupBy("cluster")
                .agg(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)])
                .collect()
            )  # bounded: <= k rows of dim doubles
            centroids = sorted(
                (int(r["cluster"]), [float(r[f"c{i}"]) for i in range(dim)])
                for r in rows
            )
    finally:
        e.unpersist()
    return assign_clusters(e, centroids), centroids


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-level near-duplicate
    removal — cluster the corpus embeddings with k-means, then compare
    pairs only WITHIN each cluster and drop all but one member of every
    near-identical group.  Catches paraphrases/translations that
    lexical dedup (minhash over shingles) cannot see — asserted by the
    planted-paraphrase test.

    Scale shape: the pairwise stage is bounded per cluster at
    ~(N/k)² — ``k`` is the operator's scale knob (the paper runs
    k ≈ 10⁴-10⁵ on web corpora precisely so clusters stay small); the
    clustering itself is the kmeans_fit plan (in-row assign, k-row
    update).  The within-cluster self-join shuffles on ``cluster`` —
    uniform by construction when k is sized to the corpus.

    Keeper rule (deterministic, documented deviation from the paper's
    lowest-centroid-distance keeper): a vector is DROPPED iff some
    cluster-mate with a SMALLER id is within ``threshold`` cosine —
    first-occurrence wins, the same rule as paragraph_dedup.  Cosines
    are sequential left-to-right double folds rounded to 6, so the
    keep/drop booleans are engine-portable (the emb_cosine_dup parity
    pattern).

    Output: (vec_id, cluster_id, keep) for every input vector."""
    assigned, _ = kmeans_fit(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    x = assigned.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), "cluster"
    )
    y = assigned.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "cluster"
    )
    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va")))
        * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    dropped = (
        x.join(y, "cluster")
        .filter(F.col("ib") < F.col("ia"))
        .filter(F.round(cos, 6) >= F.lit(threshold))
        .select(F.col("ia").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").alias("cluster_id"),
            F.col("_drop").isNull().alias("keep"),
        )
    )


def kmeans_cluster_summary(
    emb: DataFrame, k: int = 8, iters: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Gated surface: per-cluster size + member-mean norm after
    ``iters`` Lloyd steps.  The norm is computed wholly inside Spark
    (per-dimension avg of the final members, then a sequential
    sum-of-squares fold), rounded to 6 to absorb engine summation-order
    ulps."""
    assigned, centroids = kmeans_fit(
        emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    dim = len(centroids[0][1])
    agg = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        *[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)],
    )
    norm2 = None
    for i in range(dim):
        t = F.col(f"c{i}") * F.col(f"c{i}")
        norm2 = t if norm2 is None else norm2 + t
    return agg.select(
        F.col("cluster").alias("cluster_id"),
        "n_members",
        F.round(F.sqrt(norm2), 6).alias("centroid_norm"),
    )


def single_linkage_clusters(
    edges: DataFrame,
    threshold: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Single-linkage clustering at a distance ``threshold`` over a
    weighted similarity graph — the composition the MSF exists for
    (Gower & Ross 1969: single-linkage dendrogram == minimum spanning
    tree): build the Borůvka forest (graph.minimum_spanning_forest),
    cut every forest edge heavier than ``threshold``, and the
    surviving components ARE the single-linkage clusters at that
    level.  Against the naive formulation (threshold-filter ALL edges
    then CC) this runs CC on ≤ n−1 forest edges instead of |E| — the
    100-TB win when the similarity graph is dense — while provably
    producing the same clusters (a non-forest edge ≤ threshold lies
    on a cycle whose forest edges are all lighter, so its endpoints
    are already connected).

    Weights follow minimum_spanning_forest's contract (globally
    unique positive longs).  Returns ``(entity, cluster)`` with
    ``cluster`` the minimum member id; nodes whose forest edges are
    all cut become singleton clusters.
    """
    from deepie_spark.operators.cc import connected_components
    from deepie_spark.operators.graph import minimum_spanning_forest

    forest = minimum_spanning_forest(
        edges, src=src, dst=dst, weight=weight
    )
    nodes = (
        forest.select(F.col("a").alias("v"))
        .unionByName(forest.select(F.col("b").alias("v")))
        .unionByName(
            edges.select(F.col(src).alias("v"))
        )
        .unionByName(edges.select(F.col(dst).alias("v")))
        .distinct()
    )
    light = forest.filter(F.col("w") <= F.lit(int(threshold))).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    comp = connected_components(light).select(
        F.col("node").alias("v"), F.col("component")
    )
    return nodes.join(comp, "v", "left").select(
        F.col("v").alias("entity"),
        F.coalesce("component", F.col("v")).alias("cluster"),
    )


def dbscan_embeddings(
    emb: DataFrame,
    eps_cosine: float = 0.3,
    min_pts: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. KDD 1996) over an
    embedding column with cosine ≥ ``eps_cosine`` as the neighborhood
    relation — the clustering that finds arbitrarily-shaped dense
    regions and labels sparse points NOISE, complementing k-means
    (fixed k, convex cells) and single-linkage (no density gate).

    Semantics (exactly the paper's, deterministic by construction):
    - CORE: |N_eps(p)| ≥ min_pts (neighborhood INCLUDES p itself);
    - cluster = connected component of the core-core eps-graph
      (labels = min member id via operators/cc.py); an isolated core
      point is its own singleton cluster;
    - BORDER: non-core with ≥ 1 core neighbor — attached to the
      MINIMUM cluster label among its core neighbors (the paper
      leaves multi-assignment ambiguous; min is the pinned rule);
    - NOISE: everything else, cluster = −1.

    The neighbor stage here is the exact brute-force pair generator
    (embedding_cosine_pairs — the verification baseline); at scale the
    SAME downstream (degree gate → CC → border attach) runs unchanged
    over LSH/IVF candidate pairs (operators/similarity.py), which
    approximates only the eps-graph, not the algorithm.
    """
    from deepie_spark.operators.cc import connected_components
    from deepie_spark.operators.dedup import embedding_cosine_pairs

    ids = emb.select(F.col(id_col).alias("node")).distinct()
    pairs = embedding_cosine_pairs(
        emb, threshold=eps_cosine, id_col=id_col, vec_col=vec_col
    ).select("a", "b").localCheckpoint()
    und = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).withColumnsRenamed({"a": "node", "b": "nbr"})
    deg = und.groupBy("node").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core = deg.filter(F.col("n_nbrs") + 1 >= min_pts).select("node")
    core = core.localCheckpoint()
    ce = (
        pairs.join(core.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(core.withColumnRenamed("node", "b"), "b", "left_semi")
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    comp = connected_components(ce)
    core_lbl = (
        core.join(comp, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("cluster"),
        )
        .localCheckpoint()
    )
    border = (
        und.join(
            core_lbl.select(
                F.col("node").alias("nbr"), F.col("cluster").alias("c")
            ),
            "nbr",
        )
        .join(core, "node", "left_anti")
        .groupBy("node")
        .agg(F.min("c").alias("cluster"))
    )
    labeled = core_lbl.select(
        "node", F.lit("core").alias("role"), "cluster"
    ).unionByName(
        border.select("node", F.lit("border").alias("role"), "cluster")
    )
    return (
        ids.join(labeled, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("role"), F.lit("noise")).alias("role"),
            F.coalesce(F.col("cluster"), F.lit(-1))
            .cast("long")
            .alias("cluster"),
        )
    )


def silhouette_labels(
    emb: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Per-point silhouette coefficient s = (b − a)/max(a, b) of a
    labeled clustering under Euclidean distance (Rousseeuw 1987) —
    the internal-validity audit for kmeans_embeddings / dbscan /
    ground-truth labels: a = mean distance to own cluster (self
    excluded), b = min over other clusters of the mean distance.

    Engine-portability: each pairwise distance is ONE identical IEEE
    chain sqrt(max(⟨x,x⟩ − 2⟨x,y⟩ + ⟨y,y⟩, 0)) (dot products are
    sequential index-order folds == DuckDB list_dot_product — the
    embedding_cosine_pairs precedent; the max(·,0) guard absorbs the
    tiny negative both engines would otherwise sqrt to NaN), then
    immediately quantized floor(2^bits·d) to an EXACT LONG so the
    per-cluster sums are order-free; each mean is one divide of
    exact longs and min/max over identically-derived doubles pick
    identical values.  Singletons and single-label inputs get the
    sklearn convention s = 0.

    Scale: the pair stage is the exact quadratic baseline (the
    verification tier, like embedding_cosine_pairs); at corpus scale
    run the SAME downstream over per-cluster samples or LSH/IVF
    candidate pairs.  Pre-aggregation keeps the shuffle at
    Θ(n·k) mean rows, never Θ(n²).
    """
    v = emb.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lab"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(
            "v"
        ),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a = v.select(
        F.col("id").alias("i"),
        F.col("lab").alias("la"),
        F.col("v").alias("va"),
    )
    b = v.select(
        F.col("id").alias("j"),
        F.col("lab").alias("lb"),
        F.col("v").alias("vb"),
    )
    d2 = (
        dot(F.col("va"), F.col("va"))
        - F.lit(2.0) * dot(F.col("va"), F.col("vb"))
        + dot(F.col("vb"), F.col("vb"))
    )
    scale = F.lit(float(1 << scale_bits))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("i") != F.col("j"))
        .select(
            "i",
            "la",
            "lb",
            F.floor(F.sqrt(F.greatest(d2, F.lit(0.0))) * scale)
            .cast("long")
            .alias("dfp"),
        )
    )
    g = pairs.groupBy("i", "la", "lb").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("dfp").cast("long").alias("s"),
    )
    m = g.select(
        "i",
        "la",
        "lb",
        (F.col("s") / (F.col("cnt") * scale)).alias("mean_d"),
    )
    ab = m.groupBy("i", "la").agg(
        F.max(
            F.when(F.col("lb") == F.col("la"), F.col("mean_d"))
        ).alias("a_mean"),
        F.min(
            F.when(F.col("lb") != F.col("la"), F.col("mean_d"))
        ).alias("b_mean"),
    )
    sil = F.when(
        F.col("a_mean").isNotNull()
        & F.col("b_mean").isNotNull()
        & (F.greatest(F.col("a_mean"), F.col("b_mean")) > 0),
        (F.col("b_mean") - F.col("a_mean"))
        / F.greatest(F.col("a_mean"), F.col("b_mean")),
    ).otherwise(F.lit(0.0))
    return ab.select(
        F.col("i").alias(id_col),
        F.col("la").alias(label_col),
        F.round("a_mean", 6).alias("a_mean"),
        F.round("b_mean", 6).alias("b_mean"),
        F.round(sil, 6).alias("silhouette"),
    ).orderBy(id_col)


def cluster_agreement(
    labels: DataFrame,
    a_col: str = "label_a",
    b_col: str = "label_b",
    scale_bits: int = 20,
) -> DataFrame:
    """External cluster-validity between two labelings of the same
    items: Adjusted Rand Index and Normalized Mutual Information —
    the companion to silhouette_labels (internal validity); the
    standard audit of a clustering (k-means, DBSCAN, LSH buckets)
    against ground truth or a rival clustering.

    Engine-portability:
    - ARI rides DOUBLED pair counts x·(x−1) — exact longs, and the
      statistic is invariant to the doubling; the only products that
      could overflow (pa·pb) are taken in DOUBLE (identical IEEE
      multiply both engines), everything else exact.
    - MI = Σ (n_ij/N)·ln(n_ij·N/(a_i·b_j)) accumulates as fixed-point
      longs floor(2^bits·term) over the UNORDERED cell set (the chi2
      rule) with both ln arguments EXACT-INTEGER products
      (n_ij·N, a_i·b_j < 2⁶³ — N ≲ 3·10⁹ items); entropies via
      H = ln N − (Σ a·ln a)/2^bits/N with Σ a·ln a fixed-point too.
    - NMI = MI/√(H_a·H_b), one IEEE chain; degenerate inputs
      (single cluster on either side) yield NULL NMI, zero-den ARI
      yields NULL.

    One row: (n_items, pa, pb, sum_pairs, mi_fp, ari, nmi)."""
    scale = F.lit(float(1 << scale_bits))
    la, lb = F.col(a_col), F.col(b_col)
    cm = labels.groupBy(la.alias("la"), lb.alias("lb")).agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    am = cm.groupBy("la").agg(F.sum("nij").cast("long").alias("ai"))
    bm = cm.groupBy("lb").agg(F.sum("nij").cast("long").alias("bj"))
    nn = cm.agg(F.sum("nij").cast("long").alias("n"))

    def pairs2(x):
        return F.sum(x * (x - 1)).cast("long")

    def saln(x):
        # Σ floor(2^bits · x·ln(x)) — ln argument an exact integer
        return (
            F.sum(
                F.floor(
                    x.cast("double") * F.log(x.cast("double")) * scale
                )
            )
            .cast("long")
        )

    pa = am.agg(
        pairs2(F.col("ai")).alias("pa"),
        saln(F.col("ai")).alias("aln_fp"),
        F.count(F.lit(1)).cast("long").alias("ka"),
    )
    pb = bm.agg(
        pairs2(F.col("bj")).alias("pb"),
        saln(F.col("bj")).alias("bln_fp"),
        F.count(F.lit(1)).cast("long").alias("kb"),
    )
    mi = (
        cm.join(am, "la")
        .join(bm, "lb")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.sum(F.col("nij") * (F.col("nij") - 1))
            .cast("long")
            .alias("sum_pairs"),
            F.sum(
                F.floor(
                    (F.col("nij") / F.col("n"))
                    * (
                        F.log((F.col("nij") * F.col("n")).cast("double"))
                        - F.log((F.col("ai") * F.col("bj")).cast("double"))
                    )
                    * scale
                )
            )
            .cast("long")
            .alias("mi_fp"),
        )
    )
    j = (
        nn.crossJoin(F.broadcast(pa))
        .crossJoin(F.broadcast(pb))
        .crossJoin(F.broadcast(mi))
    )
    pn = F.col("n") * (F.col("n") - 1)
    exp = F.col("pa").cast("double") * F.col("pb") / pn
    den = (F.col("pa") + F.col("pb")) / F.lit(2.0) - exp
    ari = (F.col("sum_pairs") - exp) / den
    ha = F.log(F.col("n").cast("double")) - (
        F.col("aln_fp") / scale
    ) / F.col("n")
    hb = F.log(F.col("n").cast("double")) - (
        F.col("bln_fp") / scale
    ) / F.col("n")
    nmi = (F.col("mi_fp") / scale) / F.sqrt(ha * hb)
    return j.select(
        F.col("n").alias("n_items"),
        "pa",
        "pb",
        "sum_pairs",
        "mi_fp",
        F.when(
            (F.col("ka") > 1) | (F.col("kb") > 1), F.round(ari, 6)
        ).alias("ari"),
        F.when(
            (F.col("ka") > 1) & (F.col("kb") > 1), F.round(nmi, 6)
        ).alias("nmi"),
    )


def kcenter_sample(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale_bits: int = 40,
) -> DataFrame:
    """Greedy k-center (farthest-point-first) sampling over an
    embedding table (Gonzalez 1985's 2-approximation): seed with the
    min id, then repeatedly add the point FARTHEST (max over
    candidates of its min fixed-point cosine distance to the selected
    set, ties → min id) — the diversity-maximizing subset selection a
    training-mixture or eval-set builder wants where random sampling
    oversamples dense clusters (coverage_selection's geometric
    sibling).

    Distances are exact longs d_fp = 2^bits − floor(2^bits·cos)
    (the emb_hard_triplets quantization), argmin/argmax ride
    min(struct) / orderBy+limit(1) — fully deterministic, so the
    DuckDB twin (k−1 unrolled MATERIALIZED rounds) is hash-exact.

    Plan: per round ONE broadcast of the ≤k selected vectors against
    the candidates (anti-join + min-distance agg + a 1-row
    TakeOrderedAndProject) — k passes total, no pairwise blow-up."""
    one = 1 << scale_bits
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).localCheckpoint()

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    cos = dot(F.col("v"), F.col("sv")) / (
        F.sqrt(dot(F.col("v"), F.col("v")))
        * F.sqrt(dot(F.col("sv"), F.col("sv")))
    )
    d_fp = (F.lit(one).cast("long")
            - F.floor(cos * F.lit(float(one))).cast("long"))
    seed = base.agg(F.min("id").alias("id")).join(base, "id").select(
        F.lit(1).cast("long").alias("sel_round"),
        "id",
        F.lit(None).cast("long").alias("d_fp"),
        "v",
    )
    selected = seed.localCheckpoint(eager=True)
    for r in range(2, k + 1):
        sel = selected.select(F.col("id").alias("sid"),
                              F.col("v").alias("sv"))
        cand = base.join(
            selected.select(F.col("id")), "id", "left_anti"
        )
        scored = (
            cand.crossJoin(F.broadcast(sel))
            .select("id", "v", d_fp.alias("d"))
            .groupBy("id")
            .agg(
                F.min("d").cast("long").alias("dmin"),
                F.first("v").alias("v"),
            )
        )
        pick = (
            scored.orderBy(F.col("dmin").desc(), F.col("id").asc())
            .limit(1)
            .select(
                F.lit(r).cast("long").alias("sel_round"),
                "id",
                F.col("dmin").alias("d_fp"),
                "v",
            )
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected.select(
        "sel_round", F.col("id").alias(id_col), "d_fp"
    )


def centroid_stats(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale_bits: int = 20,
    cos_bits: int = 40,
) -> DataFrame:
    """Per-label embedding cohesion/separation audit (the
    Davies-Bouldin-flavored read on a LABELED table): each label's
    centroid, the mean member→centroid cosine (cohesion) and the
    nearest OTHER centroid with its cosine (separation) — the "are
    these labels actually geometric clusters" check a fine-tune or
    dedup pipeline runs before trusting the label column.

    Portability: centroids are EXACT-LONG per-dimension sums of
    floor(2^scale_bits·x_i) (order-free), rebuilt into index-ordered
    arrays via sort_array(collect_list(struct(dim, q))); all cosines
    then ride the established fixed-point rule (dot folds in element
    order — the list_dot_product parity every emb_* gate relies on),
    so every output value is an exact long or one rounded IEEE ratio.

    Plan: one posexplode + (label, dim) hash agg (d·n rows — at 100 TB
    this is the standard Gram-style pass), one bounded |labels|-sized
    centroid table broadcast back for the cohesion agg, one
    |labels|² centroid cross for separation."""
    base = df.select(
        F.col(label_col).alias("lbl"), _as_double(F.col(vec_col)).alias("v")
    )
    q = F.floor(F.col("x") * F.lit(float(1 << scale_bits))).cast("long")
    sums = (
        base.select("lbl", F.posexplode("v").alias("dim", "x"))
        .select("lbl", "dim", q.alias("q"))
        .groupBy("lbl", "dim")
        .agg(F.sum("q").cast("long").alias("s"))
    )
    cent = sums.groupBy("lbl").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(F.col("dim"), F.col("s")))
            ),
            lambda st: st["s"].cast("double"),
        ).alias("c")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q2: p * q2),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    def cos_fp(x, y):
        c = dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))
        return F.floor(c * F.lit(float(1 << cos_bits))).cast("long")

    intra = (
        base.join(cent, "lbl")
        .select("lbl", cos_fp(F.col("v"), F.col("c")).alias("fp"))
        .groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("fp").cast("long").alias("intra_sum_fp"),
        )
    )
    a = cent.select(F.col("lbl"), F.col("c"))
    b = cent.select(F.col("lbl").alias("olbl"), F.col("c").alias("oc"))
    sep = (
        a.join(b, F.col("lbl") != F.col("olbl"))
        .select(
            "lbl",
            "olbl",
            cos_fp(F.col("c"), F.col("oc")).alias("fp"),
        )
        .groupBy("lbl")
        .agg(
            F.min(
                F.struct((-F.col("fp")).alias("nf"), F.col("olbl").alias("o"))
            ).alias("s")
        )
        .select(
            "lbl",
            F.col("s")["o"].alias("nn_label"),
            (-F.col("s")["nf"]).cast("long").alias("nn_cos_fp"),
        )
    )
    sc = float(1 << cos_bits)
    return intra.join(sep, "lbl").select(
        F.col("lbl").alias(label_col),
        "n_vecs",
        "intra_sum_fp",
        F.round(F.col("intra_sum_fp") / F.col("n_vecs") / F.lit(sc), 6)
        .alias("cohesion"),
        "nn_label",
        "nn_cos_fp",
        F.round(F.col("nn_cos_fp") / F.lit(sc), 6).alias("separation"),
    )


def bcubed_eval(
    labels: DataFrame,
    pred_col: str = "label_a",
    gold_col: str = "label_b",
    scale_bits: int = 30,
) -> DataFrame:
    """B-cubed precision/recall/F of a predicted clustering against
    gold classes (Bagga-Baldwin — the entity-resolution evaluation
    standard beside pairwise PRF): per-item precision overlap/|pred
    cluster| and recall overlap/|gold class|, averaged.  Collapsing
    items into (pred, gold) contingency cells makes both sums
        Σ_cells n_cg² / n_c      and      Σ_cells n_cg² / n_g
    — each cell term an exact long via INTEGER DIV at 2^scale_bits
    fixed point (order-free sums, the er_bcubed rule: n_cg²·2³⁰ must
    fit int64 — fine to ~10⁵-item clusters).  One contingency agg,
    two broadcast size joins, one final row.
    """
    cells = labels.groupBy(
        F.col(pred_col).alias("c"), F.col(gold_col).alias("g")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_cg"))
    szc = cells.groupBy("c").agg(
        F.sum("n_cg").cast("long").alias("n_c")
    )
    szg = cells.groupBy("g").agg(
        F.sum("n_cg").cast("long").alias("n_g")
    )
    s = 1 << scale_bits
    j = cells.join(F.broadcast(szc), "c").join(F.broadcast(szg), "g")
    agg = j.agg(
        F.sum("n_cg").cast("long").alias("n_items"),
        F.sum(F.expr(f"(n_cg * n_cg * {s}) div n_c"))
        .cast("long")
        .alias("p_fp"),
        F.sum(F.expr(f"(n_cg * n_cg * {s}) div n_g"))
        .cast("long")
        .alias("r_fp"),
    )
    p = F.col("p_fp").cast("double") / (
        F.col("n_items") * F.lit(s)
    ).cast("double")
    r = F.col("r_fp").cast("double") / (
        F.col("n_items") * F.lit(s)
    ).cast("double")
    return agg.select(
        "n_items",
        "p_fp",
        "r_fp",
        F.round(p, 6).alias("p_b3"),
        F.round(r, 6).alias("r_b3"),
        F.round(F.lit(2.0) * p * r / (p + r), 6).alias("f_b3"),
    )
