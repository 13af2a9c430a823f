"""Z-order (Morton) layout keys — multi-dimensional data clustering.

At 100 TB, scan pruning is the cheapest optimization there is, but
min/max file statistics only prune on the sort column.  Z-ordering
(Delta's OPTIMIZE ZORDER, Iceberg's sort-order z-curve) interleaves the
bits of several columns so that RANGE-partitioning by the single z-key
co-locates rows that are close in EVERY dimension — each file then gets
tight min/max ranges on all z-ordered columns at once, and point/range
filters on any of them prune files.

The key is a pure integer expression (unrolled bit interleave — no
lambda, no Python, exact in any engine), so the whole layout step is
``repartitionByRange(zkey) + sortWithinPartitions(zkey) + write``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key2(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave two non-negative ints (each masked to ``bits``
    low bits) into one long: bit i of x → bit 2i, bit i of y → bit
    2i+1.  Unrolled constant shifts (Spark's shiftleft/shiftright take
    only literal shift amounts) — 2·bits codegen terms, exact longs."""
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key + (
            F.shiftright(xm, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        key = key + (
            F.shiftright(ym, i).bitwiseAND(F.lit(1))
            * F.lit(1 << (2 * i + 1))
        )
    return key


def deinterleave2(key: Column, bits: int = 16) -> tuple[Column, Column]:
    """Inverse of :func:`zorder_key2` (for tests / file-stat probes)."""
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for i in range(bits):
        x = x + (
            F.shiftright(key, 2 * i).bitwiseAND(F.lit(1)) * F.lit(1 << i)
        )
        y = y + (
            F.shiftright(key, 2 * i + 1).bitwiseAND(F.lit(1))
            * F.lit(1 << i)
        )
    return x, y


def hilbert_key2(x: Column, y: Column, order: int = 6) -> Column:
    """Hilbert-curve index of (x, y) on the 2^order × 2^order grid —
    the locality-tighter alternative to :func:`zorder_key2` (every
    consecutive Hilbert step moves exactly one cell in ONE dimension,
    so range-partitioning the key never cuts across the big Morton
    "jumps"; Delta/Iceberg expose the same choice as Z-order vs
    Hilbert clustering).

    Unrolled quadrant-rotation recursion (the classic xy2d walk,
    one level per bit, most-significant first): per level,
    rx/ry = the tested bits, the quadrant digit is
    ``rx == 0 ? ry : 3 − ry`` (the (3·rx)⊕ry table without XOR — kept
    XOR-free so the DuckDB twin avoids the dialect split where ``^``
    means power), d += s²·digit, then the flip-and-swap rotation.
    Intermediate cx/cy can go negative after a flip; only low bits
    are ever tested (single-bit AND), which is two's-complement-stable
    across engines.  Pure integer expressions — map-only, exact —
    ~3^order codegen nodes, fine for the practical order ≤ 16."""
    cx = x.cast("long")
    cy = y.cast("long")
    d = F.lit(0).cast("long")
    for lvl in range(order - 1, -1, -1):
        s = 1 << lvl
        rx = (
            F.when(cx.bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        ry = (
            F.when(cy.bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        digit = F.when(rx == 0, ry).otherwise(F.lit(3) - ry)
        d = d + F.lit(s * s).cast("long") * digit
        fx = F.when(rx == F.lit(1), F.lit(s - 1) - cx).otherwise(cx)
        fy = F.when(rx == F.lit(1), F.lit(s - 1) - cy).otherwise(cy)
        ncx = F.when(ry == F.lit(0), fy).otherwise(cx)
        ncy = F.when(ry == F.lit(0), fx).otherwise(cy)
        cx, cy = ncx, ncy
    return d


def rle_audit(df, id_col: str, cols: list[str]):
    """Run-length-encoding effectiveness audit: for each candidate
    column, how many value RUNS the table's physical order (dense
    ``id_col``) produces — the writer-side layout statistic behind
    Parquet RLE/dictionary page sizing and sort-order advice (a
    column with n_runs ≈ n_rows gains nothing from RLE; sorting by it
    first collapses runs to its distinct count, the lower bound).

    Boundary counting uses a CONSECUTIVE-ID EQUI-JOIN (id = id+1),
    never a global-order window — the rank_in_order lesson: a
    corpus-wide ORDER BY window is a single-partition serialization
    point, while the self-join shuffles on the id key.  Rows are
    pure integer counts.

    Output per column: (column, n_rows, n_distinct, n_runs,
    runs_per_row) — runs_per_row = n_runs/n_rows, one IEEE divide."""
    from pyspark.sql import DataFrame  # noqa: F401 (doc symmetry)

    out = None
    base = df.select(F.col(id_col).alias("_id"), *cols)
    n_rows = base.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    nxt = base.select(
        (F.col("_id") - 1).alias("_id"),
        *[F.col(c).alias(f"_n_{c}") for c in cols],
    )
    j = base.join(nxt, "_id", "left")
    for c in cols:
        stats = j.agg(
            F.sum(
                F.when(
                    F.col(f"_n_{c}").isNotNull()
                    & (F.col(c) != F.col(f"_n_{c}")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_boundaries")
        ).crossJoin(
            F.broadcast(
                base.agg(
                    F.count_distinct(F.col(c))
                    .cast("long")
                    .alias("n_distinct")
                )
            )
        )
        row = stats.crossJoin(F.broadcast(n_rows)).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            "n_distinct",
            (F.col("n_boundaries") + 1).cast("long").alias("n_runs"),
            F.round(
                (F.col("n_boundaries") + 1).cast("double")
                / F.col("n_rows").cast("double"),
                6,
            ).alias("runs_per_row"),
        )
        out = row if out is None else out.unionByName(row)
    return out
