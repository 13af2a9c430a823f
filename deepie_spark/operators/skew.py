"""Explicit skew handling: salted joins and two-stage aggregations.

The north rule calls out hot domains / head entities as the skew case:
a handful of keys (popular doc_ids, head entities, stop-shingles)
concentrate a quadratic share of join/agg work on one reducer.  Three
complementary defenses, layered:

1. **AQE skew-join splitting** (session.py) — runtime re-plan, free.
2. **Broadcast joins** for small build sides — no shuffle at all, so no
   skew (the catalog/rules joins in plans.pipeline).
3. **Explicit salting** (this module) — for large⋈large equi-joins and
   low-cardinality aggregations where the key distribution is known to
   be pathological before runtime.

``salted_join`` replicates the right side across ``n_salt`` buckets and
splits each left key's rows across them: a key with R matching right
rows and L left rows still produces L·R output rows, but no single task
processes more than ~L/n_salt of the left side.  Results are exactly
those of the plain join (each left row carries one salt; the right side
covers every salt), so the same DuckDB oracle applies — asserted in
__spark_entry__ by running a salted twin of a plain-join query against
the identical oracle SQL.

``salted_count`` is the two-stage aggregation pattern for aggregations
with very few groups (a 10-bucket histogram over 10^12 rows would
otherwise end in 10 reduce tasks): partial count per (key, salt), then
final sum per key.  Spark's hash aggregate already does map-side partial
aggregation; the explicit form additionally spreads the *reduce* side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _hashable_columns(df: DataFrame) -> list[str]:
    """xxhash64 rejects MAP-typed inputs; restrict the salt to
    hash-safe columns (wide corpus tables carry map columns, e.g. the
    parsed corpus's kernel_score)."""

    def ok(dt) -> bool:
        from pyspark.sql import types as T

        if isinstance(dt, T.MapType):
            return False
        if isinstance(dt, T.ArrayType):
            return ok(dt.elementType)
        if isinstance(dt, T.StructType):
            return all(ok(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if ok(f.dataType)]
    if not cols:
        raise ValueError("no hash-safe columns available for salting")
    return cols


def deterministic_salt(df: DataFrame, n_salt: int) -> Column:
    """Salt derived from the row's own content (xxhash64 of the
    hash-safe columns): deterministic across retries/partitionings —
    never rand(), which breaks task-retry idempotence."""
    return F.pmod(
        F.xxhash64(*[F.col(c) for c in _hashable_columns(df)]),
        F.lit(n_salt),
    ).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salt: int = 8,
) -> DataFrame:
    """Inner equi-join with the left side salted and the right side
    replicated across all salts.  Output equals ``left.join(right, on)``
    exactly; only the physical distribution changes.
    """
    keys = [on] if isinstance(on, str) else list(on)
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    l = left.withColumn(SALT_COL, deterministic_salt(left, n_salt))
    r = right.withColumn(SALT_COL, F.explode(salts))
    out = l.join(r, keys + [SALT_COL])
    return out.drop(SALT_COL)


def salted_count(
    df: DataFrame, keys: list[str], n_salt: int = 16
) -> DataFrame:
    """Two-stage count: groupBy(keys + salt) partial counts, then
    groupBy(keys) sum — spreads a few-group aggregation over
    ``n_salt`` reducers before the (tiny) final combine."""
    salt = deterministic_salt(df, n_salt)
    partial = (
        df.withColumn(SALT_COL, salt)
        .groupBy(*keys, SALT_COL)
        .agg(F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("_partial_n").alias("n")
    )
