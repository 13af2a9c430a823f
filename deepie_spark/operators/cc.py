"""Connected components for entity canonicalization (north-star stage 7).

The reference has no graph stage (single relation-mention records); the
north rule adds salted-key canonicalization via connected components over
candidate coreference edges.  This is the alternating **large-star /
small-star** algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) expressed purely as DataFrame ops — no
GraphFrames dependency:

* ``large-star``: every node points its *larger* neighbors at the
  minimum of its closed neighborhood;
* ``small-star``: every node points its smaller-or-equal neighbors at
  that minimum.

Both steps are ``groupBy(u).agg(min)`` + re-expansion joins; the min
aggregation does map-side partial aggregation, so hot head entities
(the skew case the north rule calls out) never concentrate raw edges on
one reducer — only one pre-aggregated row per (partition, node).  The
convergence loop runs O(log n) rounds; each round's result is
``localCheckpoint``-ed to truncate the lineage chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirect + dedup + drop self-loops; orient src > dst."""
    e = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    )
    return e.filter(F.col("src") != F.col("dst")).distinct()


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round over (src>dst)-oriented edges."""
    # neighborhood view from the higher node's perspective plus reverse
    both = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = both.groupBy("src").agg(F.min("dst").alias("m"))
    mins = mins.withColumn("m", F.least("src", "m"))
    joined = both.join(mins, "src")
    if large:
        # large-star(v): {(u, m) : u ∈ N>(v)}
        moved = joined.filter(F.col("dst") > F.col("src")).select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
    else:
        # small-star(v): {(u, m) : u ∈ N≤(v) ∪ {v}} — each smaller
        # neighbor AND v itself link to the minimum (dropping the
        # neighbors here would disconnect star leaves)
        neighbors = joined.filter(F.col("dst") <= F.col("src")).select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
        self_links = mins.select(F.col("src"), F.col("m").alias("dst"))
        moved = neighbors.unionByName(self_links)
    return _canonical_edges(moved)


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(src long, dst long) edge list → (node, component) with component =
    min node id of the component.

    Deterministic; converges when the edge set is a star forest (every
    node directly linked to its component minimum).
    """
    e = _canonical_edges(edges).localCheckpoint()
    for _ in range(max_iter):
        e2 = _star_round(e, large=True)
        e2 = _star_round(e2, large=False).localCheckpoint()
        # converged when every src's dst equals the global min reachable:
        # fixed point == edge multiset unchanged
        if e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
            e = e2
            break
        e = e2
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def alias_overlap_edges(catalog: DataFrame) -> DataFrame:
    """Candidate coref edges between catalog entities whose aliases share
    a token (e.g. 'table' ↔ 'table scan').  Broadcast-scale input; the
    same plan shape applies to billion-row mention tables, where the
    token explode + self-join would instead be salted on hot tokens."""
    toks = catalog.select(
        F.col("entity_id"),
        F.explode(F.split(F.col("alias"), " ")).alias("token"),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        a.join(b, "token")
        .filter(F.col("a.entity_id") < F.col("b.entity_id"))
        .select(
            F.col("a.entity_id").alias("src"),
            F.col("b.entity_id").alias("dst"),
        )
        .distinct()
    )


def canonicalize_triples(
    triples: DataFrame, mapping: DataFrame, catalog: DataFrame
) -> DataFrame:
    """Rewrite subj/obj aliases to canonical entity representatives.

    ``mapping`` is the (node=entity_id, component) output of
    :func:`connected_components`; the representative surface form is the
    alias of the component-minimum entity.  Both joins broadcast (the
    catalog is small); at web scale the mapping table is still tiny
    relative to triples, so the broadcasts hold.
    """
    rep = (
        mapping.join(
            catalog.select(
                F.col("entity_id").alias("component"),
                F.col("alias").alias("canon"),
            ),
            "component",
        )
        .join(catalog.select("entity_id", "alias"), mapping.node == F.col("entity_id"))
        .select(F.col("alias"), F.col("canon"))
        .distinct()
    )
    t = triples
    for side in ("subj", "obj"):
        r = rep.select(
            F.col("alias").alias(side), F.col("canon").alias(f"{side}_canon")
        )
        t = t.join(F.broadcast(r), side, "left").withColumn(
            f"{side}_canon", F.coalesce(F.col(f"{side}_canon"), F.col(side))
        )
    return t
