"""Type-2 SCD build (q_user_scd2): handcrafted run-collapse semantics +
interval invariants on the driver events table.
"""

from datetime import datetime

import __spark_entry__ as entry
from pyspark.sql import functions as F


def test_scd2_collapses_runs_exactly(spark, tmp_path):
    rows = [
        # user 1: A A B A  → versions A[t0,t2) B[t2,t3) A[t3,∞)
        (0, datetime(2024, 1, 1, 0, 0), 1, "A", 0.0, "{}"),
        (1, datetime(2024, 1, 1, 0, 1), 1, "A", 0.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 2), 1, "B", 0.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 3), 1, "A", 0.0, "{}"),
        # user 2: single event → one open version
        (4, datetime(2024, 1, 1, 1, 0), 2, "C", 0.0, "{}"),
        # user 3: ts tie broken by event_id (B then A)
        (5, datetime(2024, 1, 1, 2, 0), 3, "B", 0.0, "{}"),
        (6, datetime(2024, 1, 1, 2, 0), 3, "A", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf")
    df.write.parquet(sf + "/events.parquet")
    out = entry.q_user_scd2(spark, sf).collect()
    got = {
        (r["user_id"], r["version"]): (
            r["event_type"],
            r["valid_from"],
            r["valid_to"],
            r["n_events"],
        )
        for r in out
    }
    t = lambda m: datetime(2024, 1, 1, 0, m)  # noqa: E731
    assert got[(1, 1)] == ("A", t(0), t(2), 2)
    assert got[(1, 2)] == ("B", t(2), t(3), 1)
    assert got[(1, 3)] == ("A", t(3), None, 1)
    assert got[(2, 1)] == ("C", datetime(2024, 1, 1, 1, 0), None, 1)
    assert got[(3, 1)][0] == "B" and got[(3, 2)][0] == "A"


def test_scd2_interval_invariants_on_testdata(spark, sf_dir):
    out = entry.q_user_scd2(spark, sf_dir).cache()
    n_events = (
        out.agg(F.sum("n_events").cast("long").alias("s")).first()["s"]
    )
    assert n_events == entry._events(spark, sf_dir).count()
    # exactly one open version per user, and it is the max version
    per_user = out.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.max("version").alias("maxv"),
        F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias(
            "n_open"
        ),
    )
    bad = per_user.filter(F.col("n_open") != 1).count()
    assert bad == 0
    assert out.filter(
        F.col("valid_to").isNull() & (F.col("version") != F.col("version"))
    ).count() == 0
    # versions are dense 1..n per user
    assert per_user.filter(F.col("maxv") != F.col("n")).count() == 0
    # intervals chain: valid_to(v) == valid_from(v+1)
    a = out.select("user_id", "version", "valid_to")
    b = out.select(
        "user_id",
        (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    chained = a.join(b, ["user_id", "version"])
    assert chained.filter(F.col("valid_to") != F.col("next_from")).count() == 0
    out.unpersist()


def test_scd2_lookup_point_in_time_unique(spark, sf_dir):
    """Every purchase event routes to EXACTLY one version row, and that
    row's type is 'purchase' (a purchase event is inside its own run)."""
    out = entry.q_scd2_lookup(spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["event_type"] == "purchase" for r in rows)
    n_purchases = (
        entry._events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r["n_purchases"] for r in rows) == n_purchases
