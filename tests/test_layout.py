"""Z-order layout keys: python twin, roundtrip, and the locality
property that justifies the whole exercise (range-bucketing the z-key
gives tight per-bucket min/max on BOTH dimensions)."""

import random

from pyspark.sql import functions as F

from deepie_spark.plans.layout import deinterleave2, zorder_key2

BITS = 16


def _py_z(x: int, y: int) -> int:
    k = 0
    for i in range(BITS):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def test_zorder_matches_python_and_roundtrips(spark):
    rng = random.Random(19)
    rows = [
        (i, rng.randrange(1 << BITS), rng.randrange(1 << BITS))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    key = zorder_key2(F.col("x"), F.col("y"), BITS)
    xb, yb = deinterleave2(F.col("zkey"), BITS)
    out = df.withColumn("zkey", key).withColumn("x2", xb).withColumn("y2", yb)
    for r in out.collect():
        assert r["zkey"] == _py_z(r["x"], r["y"])
        assert (r["x2"], r["y2"]) == (r["x"], r["y"])


def test_zorder_range_buckets_bound_both_dims(spark):
    """Split the z-key range into contiguous buckets (what
    repartitionByRange(zkey) does): every bucket's x-range AND y-range
    must be far tighter than the full domain — the file-stat pruning
    property a single-column sort cannot give on the second column."""
    n_side = 64  # full grid, 4096 points
    rows = [
        (x, y) for x in range(n_side) for y in range(n_side)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.withColumn(
        "zkey", zorder_key2(F.col("x"), F.col("y"), BITS)
    ).collect()
    pts = sorted((r["zkey"], r["x"], r["y"]) for r in out)
    n_buckets = 16
    per = len(pts) // n_buckets
    worst_x = worst_y = 0
    for b in range(n_buckets):
        chunk = pts[b * per : (b + 1) * per]
        xs = [p[1] for p in chunk]
        ys = [p[2] for p in chunk]
        worst_x = max(worst_x, max(xs) - min(xs))
        worst_y = max(worst_y, max(ys) - min(ys))
    # 16 z-buckets of a 64x64 grid are 16x16 quadrants: both spans = 15.
    # A plain sort by x would give worst_y = 63 (no pruning on y).
    assert worst_x <= 16 and worst_y <= 16, (worst_x, worst_y)
