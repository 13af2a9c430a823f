"""Bucketed-table co-located join: persisting both sides bucketed on
the join key removes the shuffle from every subsequent join — the
pre-partitioning strategy for repeatedly-joined 100 TB tables.
"""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Save orders + lineitem bucketed by the join key."""
    # external tables via explicit paths — the session's static
    # warehouse dir cannot change, and doesn't need to
    wh = str(tmp_path_factory.mktemp("warehouse"))
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(wh, "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(wh, "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, warehouse, sf_dir):
    # hint forces the sort-merge path (these sizes would broadcast) —
    # the point is that bucketing removes the SMJ's exchanges, which is
    # what matters when BOTH sides are far beyond broadcast size
    o = spark.table("orders_b").hint("merge")
    li = spark.table("lineitem_b")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("Join")[1] if "Join" in plan else plan
    # the join's children read bucketed data: no Exchange below the join
    pre_agg = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "SelectedBucketsCount" in plan  # bucket pruning metadata


def test_bucketed_join_matches_plain_join(spark, warehouse, sf_dir):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    got = (
        spark.table("lineitem_b")
        .join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
