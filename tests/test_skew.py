"""Salted join / two-stage aggregation tests: result equivalence with
the plain plans, plus the distribution property salting exists for.
"""

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.skew import (
    SALT_COL,
    deterministic_salt,
    salted_count,
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """1000 rows, 90% on one hot key."""
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    return df.cache()


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [(0, "hot"), (10, "a"), (20, "b"), (999, "zzz")], "k long, name string"
    ).cache()


def test_salted_join_equals_plain_join(spark, skewed, dim):
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, "k", n_salt=8).select("k", "v", "name")
    assert plain.exceptAll(salted).isEmpty()
    assert salted.exceptAll(plain).isEmpty()
    assert salted.count() == plain.count() > 0


def test_salted_join_multi_key(spark):
    l = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 11), (2, "x", 12)], "a long, b string, v long"
    )
    r = spark.createDataFrame(
        [(1, "x", "m1"), (2, "x", "m2")], "a long, b string, m string"
    )
    plain = l.join(r, ["a", "b"]).select("a", "b", "v", "m")
    salted = salted_join(l, r, ["a", "b"], n_salt=4).select("a", "b", "v", "m")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_spreads_hot_key(skewed):
    """The hot key's rows must land in several salt buckets."""
    salted = skewed.withColumn(SALT_COL, deterministic_salt(skewed, 8))
    buckets = (
        salted.filter(F.col("k") == 0)
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert buckets >= 6  # 900 rows across 8 buckets: all/nearly all hit


def test_salt_is_deterministic(skewed):
    a = skewed.withColumn(SALT_COL, deterministic_salt(skewed, 8)).collect()
    b = skewed.withColumn(SALT_COL, deterministic_salt(skewed, 8)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_count_equals_plain(skewed):
    plain = {
        (r["k"],): r["n"]
        for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    two_stage = {
        (r["k"],): r["n"] for r in salted_count(skewed, ["k"]).collect()
    }
    assert plain == two_stage


def test_zipf_domain_distribution_and_determinism(spark):
    """zipf_domain: d0 carries ~61% at s=2.0 (the Zipf head), the draw
    is deterministic per id, and salted_join over the Zipf corpus
    equals the plain join exactly."""
    from deepie_spark.datagen.skewed import zipf_cumulative, zipf_domain
    from deepie_spark.operators.skew import salted_join

    n = 20000
    df = spark.range(n).select(
        F.col("id"), zipf_domain(F.col("id"), 64, 2.0).alias("domain")
    )
    counts = {r["domain"]: r["count"] for r in df.groupBy("domain").count().collect()}
    expect_head = zipf_cumulative(64, 2.0)[0]
    assert abs(counts["d0"] / n - expect_head) < 0.03
    assert df.collect() == df.collect()  # pure function of id

    right = spark.range(0, 64, 1, 1).select(
        F.concat(F.lit("d"), F.col("id").cast("string")).alias("domain"),
        (F.col("id") * 10).alias("w"),
    )
    small = df.filter(F.col("id") < 2000)
    plain = sorted(
        map(tuple, small.join(right, "domain").select("id", "w").collect())
    )
    salted = sorted(
        map(tuple, salted_join(small, right, "domain").select("id", "w").collect())
    )
    assert plain == salted
