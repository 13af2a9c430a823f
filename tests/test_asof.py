"""As-of join: hand-built edge cases, a pandas merge_asof twin on
random data, and a no-join-node plan guard."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, ts)
            (1, "a", 10),   # exact-ts match with right @10
            (2, "a", 15),   # matches right @10 (latest <= 15)
            (3, "a", 5),    # before first right row -> null
            (4, "a", 30),   # matches right @25
            (5, "b", 100),  # other key: matches b@90, never a's rows
            (6, "c", 50),   # key with no right rows at all -> null
            (7, "a", 15),   # duplicate left (key, ts): same match as 2
        ],
        "id int, key string, ts long",
    )
    right = spark.createDataFrame(
        [
            ("a", 10, 111),
            ("a", 25, 222),
            ("a", 40, 333),  # after every left row -> never matched
            ("b", 90, 444),
        ],
        "key string, ts long, val int",
    )
    return left, right


def test_asof_edges(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        payload_cols=["val"], matched_ts_col="rts",
    )
    got = {r["id"]: (r["rts"], r["val"]) for r in out.collect()}
    assert got == {
        1: (10, 111),
        2: (10, 111),
        3: (None, None),
        4: (25, 222),
        5: (90, 444),
        6: (None, None),
        7: (10, 111),
    }
    assert out.count() == left.count()  # left-outer: no drops, no fan-out


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        payload_cols=["val"], tolerance=5, matched_ts_col="rts",
    )
    got = {r["id"]: (r["rts"], r["val"]) for r in out.collect()}
    # id=2 (lag 5) kept at tolerance=5 (inclusive); id=4 (lag 5) kept;
    # id=5 (lag 10) nulled out
    assert got[1] == (10, 111)
    assert got[2] == (10, 111)
    assert got[4] == (25, 222)
    assert got[5] == (None, None)
    assert got[3] == (None, None)


def test_asof_matches_pandas_merge_asof(spark):
    rng = np.random.RandomState(42)
    n_l, n_r, n_keys = 400, 300, 7
    lpdf = pd.DataFrame(
        {
            "id": np.arange(n_l),
            "key": rng.randint(0, n_keys, n_l),
            "ts": rng.randint(0, 1000, n_l).astype("int64"),
        }
    )
    rpdf = (
        pd.DataFrame(
            {
                "key": rng.randint(0, n_keys, n_r),
                "ts": rng.randint(0, 1000, n_r).astype("int64"),
                "val": rng.randint(0, 10**6, n_r),
            }
        )
        # contract: right unique per (key, ts) — keep max val
        .groupby(["key", "ts"], as_index=False)["val"].max()
    )
    expected = pd.merge_asof(
        lpdf.sort_values(["ts", "id"]).reset_index(drop=True),
        rpdf.sort_values("ts").reset_index(drop=True),
        on="ts", by="key", direction="backward", tolerance=200,
    ).set_index("id")["val"]

    out = asof_join(
        spark.createDataFrame(lpdf),
        spark.createDataFrame(rpdf),
        on="key", left_ts="ts", right_ts="ts",
        payload_cols=["val"], tolerance=200,
    )
    got = {r["id"]: r["val"] for r in out.collect()}
    assert len(got) == n_l
    for i in range(n_l):
        exp = expected.loc[i]
        exp = None if pd.isna(exp) else int(exp)
        assert got[i] == exp, f"id {i}: spark {got[i]} != pandas {exp}"


def test_asof_plan_has_no_join(spark):
    """The whole point vs the naive inequality-join rewrite: one
    shuffle + per-key window, ZERO join nodes, no cartesian."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        payload_cols=["val"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    # the window must be key-partitioned, never a global sort
    assert "hashpartitioning(key" in plan


def test_asof_payload_nulls_dont_shadow(spark):
    """A right row whose payload VALUE is null still counts as the
    match (it is the latest observation); it must not fall through to
    an older non-null row."""
    left = spark.createDataFrame([(1, "a", 20)], "id int, key string, ts long")
    right = spark.createDataFrame(
        [("a", 10, 111), ("a", 15, None)], "key string, ts long, val int"
    )
    out = asof_join(
        left, right, on="key", left_ts="ts", right_ts="ts",
        payload_cols=["val"], matched_ts_col="rts",
    )
    row = out.collect()[0]
    assert row["rts"] == 15 and row["val"] is None
