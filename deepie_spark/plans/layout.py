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
