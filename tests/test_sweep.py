"""Bucketed global prefix sums + interval concurrency
(operators/sweep.py): single-window equivalence, bucket-count
invariance, and the hand-checked sweep profile."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from deepie_spark.operators.sweep import (
    interval_concurrency,
    prefix_sum_in_order,
)


def test_prefix_sum_matches_single_window(spark):
    import random

    rng = random.Random(17)
    rows = [(k, rng.randrange(-50, 50)) for k in rng.sample(range(10_000), 500)]
    df = spark.createDataFrame(rows, "k long, x long")
    got = {
        r.k: r.cum
        for r in prefix_sum_in_order(df, "k", "x", buckets=8).collect()
    }
    w = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r.k: r.cum
        for r in df.withColumn(
            "cum", F.sum("x").over(w).cast("long")
        ).collect()
    }
    assert got == want
    # invariant to the bucket count (exact integer adds)
    for b in (1, 3, 17):
        gb = {
            r.k: r.cum
            for r in prefix_sum_in_order(df, "k", "x", buckets=b).collect()
        }
        assert gb == want


def test_interval_concurrency_hand_case(spark):
    iv = spark.createDataFrame(
        [(0, 10), (5, 15), (10, 20)], "start_s long, end_s long"
    )
    out = {
        r.t: (r.net, r.concurrency)
        for r in interval_concurrency(iv).collect()
    }
    # t=10: one interval ends AND one starts → net 0, count stays 2
    assert out == {
        0: (1, 1),
        5: (1, 2),
        10: (0, 2),
        15: (-1, 1),
        20: (-1, 0),
    }


def test_interval_concurrency_invariants(spark):
    import random

    rng = random.Random(23)
    iv = [
        (s, s + rng.randrange(1, 40))
        for s in (rng.randrange(0, 300) for _ in range(200))
    ]
    df = spark.createDataFrame(iv, "start_s long, end_s long")
    rows = sorted(interval_concurrency(df).collect(), key=lambda r: r.t)
    # never negative, ends at zero, sum of nets telescopes to zero
    assert all(r.concurrency >= 0 for r in rows)
    assert rows[-1].concurrency == 0
    assert sum(r.net for r in rows) == 0
    # python sweep twin
    from collections import Counter

    c = Counter()
    for s, e in iv:
        c[s] += 1
        c[e] -= 1
    run, want = 0, {}
    for t in sorted(c):
        run += c[t]
        want[t] = (c[t], run)
    assert {r.t: (r.net, r.concurrency) for r in rows} == want


def test_prefix_sum_deterministic_buckets(spark):
    """Regression for the sampled-range-exchange divergence: the
    bucket key must be a pure function of the order key (literal
    driver-pinned boundaries), never ``spark_partition_id()`` after a
    sampled ``repartitionByRange`` — column pruning can specialize the
    offsets branch and the window branch into different subplans,
    ReusedExchange then fails to deduplicate them, and each branch
    re-samples its own boundaries (observed: nondeterministically
    wrong totals at 8 cores).  Guard: no rangepartitioning exchange
    anywhere in the plan, and the result equals the single-window
    formulation on a shuffled input."""
    import random

    from deepie_spark.operators.sweep import prefix_sum_in_order

    rng = random.Random(7)
    rows = [(k, rng.randrange(1, 100)) for k in rng.sample(range(10_000), 500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    out = prefix_sum_in_order(df, "k", "v", out_col="cum", buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    want, run = {}, 0
    for k, v in sorted(rows):
        run += v
        want[k] = run
    assert {r.k: r.cum for r in out.collect()} == want
