"""Connected-components canonicalization tests (north-star stage 7)
against a pure-python union-find oracle.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deepie_spark.datagen.catalog import ENTITY_CATALOG, catalog_df
from deepie_spark.operators.cc import (
    alias_overlap_edges,
    canonicalize_triples,
    connected_components,
)


def union_find(edges, nodes=None):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    all_nodes = set(parent)
    if nodes:
        all_nodes |= set(nodes)
    return {n: find(n) for n in all_nodes}


def run_cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_chain(spark):
    assert run_cc(spark, [(1, 2), (2, 3), (3, 4)]) == {1: 1, 2: 1, 3: 1, 4: 1}


def test_two_components_and_self_loop(spark):
    got = run_cc(spark, [(1, 2), (5, 6), (6, 7), (3, 3)])
    assert got[1] == got[2] == 1
    assert got[5] == got[6] == got[7] == 5
    # pure self-loop nodes drop out (no edges after cleanup)
    assert 3 not in got


def test_star_and_direction_invariance(spark):
    a = run_cc(spark, [(10, 1), (10, 2), (10, 3)])
    b = run_cc(spark, [(1, 10), (2, 10), (3, 10)])
    assert a == b == {1: 1, 2: 1, 3: 1, 10: 1}


def test_random_graph_matches_union_find(spark):
    rng = np.random.RandomState(99)
    edges = [
        (int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(80)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    want = union_find(edges)
    got = run_cc(spark, edges)
    assert got == want


def test_long_path_converges_within_iterations(spark):
    """O(log n) convergence claim: a 64-node path needs few rounds."""
    edges = [(i, i + 1) for i in range(63)]
    got = run_cc(spark, edges)
    assert set(got.values()) == {0}


def test_alias_overlap_edges(spark):
    edges = {
        (r["src"], r["dst"])
        for r in alias_overlap_edges(catalog_df(spark)).collect()
    }
    # 'table'(3) ↔ 'table scan'(14) share token 'table'
    assert (3, 14) in edges
    # 'hash join'(13) and 'sort merge'(15) share nothing
    assert (13, 15) not in edges
    assert all(a < b for a, b in edges)


def test_canonicalize_triples_rewrites_to_component_min(spark):
    cat = catalog_df(spark)
    edges = alias_overlap_edges(cat)
    mapping = connected_components(edges)
    triples = spark.createDataFrame(
        [("table scan", "PHYS", "customer"), ("spark", "ORG-AFF", "row")],
        "subj string, pred string, obj string",
    )
    out = {
        (r["subj_canon"], r["obj_canon"])
        for r in canonicalize_triples(triples, mapping, cat).collect()
    }
    # 'table scan'(14) is in 'table'(3)'s component → canon 'table'
    assert ("table", "customer") in out
    # 'spark'(2) has no overlap edges → unchanged
    assert ("spark", "row") in out


def test_er_type_conflicts_audit(spark):
    """Every catalog entity lands in exactly one cluster (singletons
    included), and the known multi-token overlaps produce at least
    one cross-type cluster — the merge-safety red flag."""
    from __spark_entry__ import q_er_type_conflicts
    from deepie_spark.datagen.catalog import ENTITY_CATALOG

    rows = q_er_type_conflicts(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_members for r in rows) == len(ENTITY_CATALOG)
    assert all(
        (r.n_types > 1) == r.conflict
        and len(r.types.split("|")) == r.n_types
        for r in rows
    )
    # this catalog is merge-safe: its one multi-member cluster
    # ('table' + 'table scan') is same-typed — the audit must say so
    two = [r for r in rows if r.n_members == 2]
    assert two and two[0].types == "FAC" and not two[0].conflict
    assert not any(r.conflict for r in rows)
    # and a constructed cross-type overlap DOES flag
    from pyspark.sql import functions as F2

    from deepie_spark.operators.cc import (
        alias_overlap_edges,
        connected_components,
    )

    cat = spark.createDataFrame(
        [(1, "acme corp", "ORG"), (2, "acme", "PER"), (3, "zed", "GPE")],
        ["entity_id", "alias", "entity_type"],
    )
    comp = connected_components(alias_overlap_edges(cat))
    full = cat.join(
        comp.withColumnRenamed("node", "entity_id"), "entity_id", "left"
    ).select(
        F2.coalesce(F2.col("component"), F2.col("entity_id")).alias("c"),
        "entity_type",
    )
    agg = {
        r.c: r.n
        for r in full.groupBy("c")
        .agg(F2.countDistinct("entity_type").alias("n"))
        .collect()
    }
    assert 2 in agg.values()  # the acme ORG/PER cluster conflicts
