"""Incremental view maintenance (plans/ivm.py): merge == recompute."""

import numpy as np
from pyspark.sql import functions as F

from deepie_spark.plans.ivm import agg_state, merge_agg_state


def _rows(rng, n, groups):
    return [
        (f"g{rng.randint(groups)}", int(rng.randint(-500, 500)))
        for _ in range(n)
    ]


def test_merge_equals_recompute(spark):
    rng = np.random.RandomState(17)
    base = _rows(rng, 400, 6)
    delta = _rows(rng, 90, 8)  # includes groups ABSENT from base
    b = spark.createDataFrame(base, ["g0", "v"])
    d = spark.createDataFrame(delta, ["g0", "v"])
    merged = merge_agg_state(
        agg_state(b, "g0", "v"), agg_state(d, "g0", "v")
    )
    full = agg_state(b.unionByName(d), "g0", "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_merge_handles_one_sided_groups(spark):
    b = spark.createDataFrame([("only_base", 5)], ["g0", "v"])
    d = spark.createDataFrame([("only_delta", -3)], ["g0", "v"])
    got = {
        r.g: (r.n, r.total, r.mn, r.mx)
        for r in merge_agg_state(
            agg_state(b, "g0", "v"), agg_state(d, "g0", "v")
        ).collect()
    }
    assert got == {
        "only_base": (1, 5, 5, 5),
        "only_delta": (1, -3, -3, -3),
    }


def test_merge_is_associative_across_batches(spark):
    rng = np.random.RandomState(3)
    parts = [_rows(rng, 120, 5) for _ in range(3)]
    dfs = [spark.createDataFrame(p, ["g0", "v"]) for p in parts]
    s = agg_state(dfs[0], "g0", "v")
    for nxt in dfs[1:]:
        s = merge_agg_state(s, agg_state(nxt, "g0", "v"))
    full = agg_state(
        dfs[0].unionByName(dfs[1]).unionByName(dfs[2]), "g0", "v"
    )
    assert sorted(map(tuple, s.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_join_delta_invariant(spark):
    """V_old ∪ ΔV == (A_old ∪ ΔA) ⋈ (B_old ∪ ΔB), exactly — the
    insert delta rule; legs are disjoint so no row double-counts."""
    import numpy as np

    from deepie_spark.plans.ivm import join_delta

    rng = np.random.RandomState(41)
    a_rows = [(int(rng.randint(0, 30)), i) for i in range(200)]
    b_rows = [(k, f"v{k}", k % 7) for k in range(0, 30, 1)]
    a = spark.createDataFrame(a_rows, ["k", "a_id"])
    b = spark.createDataFrame(b_rows, ["k", "name", "grp"])
    a_old = a.filter(F.col("a_id") % 3 != 0)
    a_new = a.filter(F.col("a_id") % 3 == 0)
    b_old = b.filter(F.col("k") % 5 != 0)
    b_new = b.filter(F.col("k") % 5 == 0)

    v_old = a_old.join(b_old, ["k"])
    dv = join_delta(a_old, a_new, b_old, b_new, ["k"])
    got = sorted(
        tuple(r) for r in v_old.unionByName(dv).collect()
    )
    want = sorted(tuple(r) for r in a.join(b, ["k"]).collect())
    assert got == want and len(got) == 200
    # one-sided deltas degenerate correctly
    empty_b = b_new.filter(F.lit(False))
    dv2 = join_delta(a_old, a_new, b, empty_b, ["k"])
    got2 = sorted(
        tuple(r) for r in a_old.join(b, ["k"]).unionByName(dv2).collect()
    )
    assert got2 == want
