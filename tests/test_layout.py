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


def test_hilbert_bijection_and_adjacency(spark):
    """hilbert_key2 over the full 64x64 grid: a bijection onto
    0..4095 whose consecutive cells are Manhattan-distance-1 apart
    (the property Morton does NOT have), and matches the classic
    python xy2d walk cell-for-cell."""
    from pyspark.sql import functions as F

    from deepie_spark.plans.layout import hilbert_key2

    def xy2d(order, x, y):
        s = (1 << order) // 2
        d = 0
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = grid.select(
        "x", "y", hilbert_key2(F.col("x"), F.col("y"), order=6).alias("h")
    ).collect()
    got = {(r.x, r.y): r.h for r in rows}
    assert sorted(got.values()) == list(range(n * n))
    by_d = {h: xy for xy, h in got.items()}
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    for (x, y), h in list(got.items())[::97]:
        assert h == xy2d(6, x, y)


def test_layout_pruning_curves_beat_naive(spark):
    """On the sf0.001 events the space-filling-curve layouts prune
    most secondary-dimension probes; naive row-major prunes none."""
    import __spark_entry__ as entry

    got = {r.layout: r for r in entry.q_layout_pruning(
        spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == {"naive", "zorder", "hilbert"}
    assert got["naive"].prune_ratio == 0.0
    assert got["hilbert"].prune_ratio > 0.5
    assert got["zorder"].prune_ratio > 0.5
    assert all(r.n_probes == 64 for r in got.values())
