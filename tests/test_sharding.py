"""Rendezvous sharding — python twin, the move-to-new-shard-only
invariant, and movement-fraction bounds."""

import pytest

from deepie_spark.functions.text import BASE, MOD


def _ph(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


def test_rendezvous_assign_python_twin(spark):
    from deepie_spark.plans.sharding import rendezvous_assign

    keys = [f"k{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r.key: r.shard for r in rendezvous_assign(df, 8).collect()}
    want = {
        k: min(range(8), key=lambda s: (-_ph(f"{s}#{k}"), s))
        for k in keys
    }
    assert got == want
    with pytest.raises(ValueError):
        rendezvous_assign(df, 0)


def test_rebalance_moves_only_to_new_shard(spark):
    from deepie_spark.plans.sharding import (
        rebalance_audit,
        rendezvous_assign,
    )

    keys = [f"doc{i}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    a = {r.key: r.shard for r in rendezvous_assign(df, 8).collect()}
    b = {r.key: r.shard for r in rendezvous_assign(df, 9).collect()}
    movers = {k for k in keys if a[k] != b[k]}
    # THE rendezvous invariant: growing the ring only moves keys to
    # the NEW shard — existing shards never exchange keys
    assert all(b[k] == 8 for k in movers)

    r = rebalance_audit(df, 8, 9).collect()[0]
    assert r.n_keys == 500 and r.rdv_moved == len(movers)
    # rendezvous ~1/9 of keys; mod moves most — strict ordering and
    # loose bands around the expectations
    assert r.rdv_moved_frac < 0.25
    assert r.mod_moved_frac > 0.6
    assert r.rdv_moved_frac < r.mod_moved_frac
    assert r.max_load >= r.min_load > 0
