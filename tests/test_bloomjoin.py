"""Bloom runtime filter: no false negatives (exactness of the final
join), real pruning on the fact side, and bounded bloom size.
"""

import os

import __spark_entry__ as entry
from pyspark.sql import functions as F

from deepie_spark.operators.bloomjoin import (
    bloom_build,
    bloom_filtered_join,
    bloom_prune,
)

M = 1 << 14


def test_bloom_never_drops_members(spark):
    keys = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", M)
    # every member survives the probe
    assert bloom_prune(keys, bloom, "k", M).count() == keys.count()


def test_bloom_prunes_nonmembers(spark):
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", M)
    probe = spark.range(100_000, 140_000).select(F.col("id").alias("k"))
    fp = bloom_prune(probe, bloom, "k", M).count()
    # 1000 keys in 16384 bits, 3 hashes → fpr ≈ (1-e^-0.18)^3 ≈ 0.5%
    assert fp < probe.count() * 0.05, f"false-positive count {fp}"


def test_bloom_join_equals_plain_join(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
        F.col("o_totalprice") > entry._BLOOM_PRICE_TH
    ).select("o_orderkey")
    got = bloom_filtered_join(li, o, "l_orderkey", "o_orderkey")
    want = li.join(o, li.l_orderkey == o.o_orderkey)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # and the filter actually prunes: fact rows surviving the bloom are
    # far fewer than the fact table (selective dim predicate)
    bloom = bloom_build(o, "o_orderkey", 1 << 16)
    survived = bloom_prune(li, bloom, "l_orderkey", 1 << 16).count()
    assert survived < li.count() * 0.5
    assert survived >= want.count()


def test_bloom_fpr_matches_theory(spark):
    """Measured FPR tracks (1 − e^{−kn/m})^k within sampling noise;
    true keys ALWAYS pass (n_pass >= n_true — no false negatives)."""
    import math

    from __spark_entry__ import q_bloom_fpr

    r = q_bloom_fpr(spark, "/root/testdata/sf0.01").collect()[0]
    assert r.n_true <= r.n_pass <= r.n_probes
    k, m = 3, 4096
    theo = (1.0 - math.exp(-k * r.n_dim / m)) ** k
    if r.fpr is not None and r.n_probes - r.n_true > 50:
        assert theo / 4 <= max(r.fpr, 1e-6) <= theo * 4 + 0.01
