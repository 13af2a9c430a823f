"""Skyline (Pareto-optimal set) over numeric criteria.

The skyline of a table under "maximize every dimension" is the set of
rows not DOMINATED by any other row — ``q`` dominates ``p`` when
``q ≥ p`` on all dimensions and ``q > p`` on at least one (Börzsönyi,
Kossmann & Stocker, ICDE 2001).  In a curation pipeline this is the
multi-criteria document frontier ("no other document is at least as
long AND at least as diverse AND at least as large"), the
preference-query analog of top-k that needs no weight vector.

Distributed plan (two stages, the standard one):

1. **Local prune** — per-Arrow-batch skyline via ``mapInPandas`` with
   the sort-filter-skyline scan (Chomicki, Godfrey, Gryz & Liang,
   SFS, ICDE 2003): process points in descending coordinate-sum order;
   a point can only be dominated by one with a ≥ sum, so testing
   against already-kept points suffices (ties in sum can never
   dominate — equal sum + ``≥`` everywhere forces equality, and
   dominance needs one strict ``>``).  Dominance is transitive, so a
   batch's skyline is a CORRECT SUPERSET filter: any point pruned
   locally is dominated by a survivor, hence not in the global
   skyline.  The inner test is a vectorized numpy comparison against
   the kept set — no per-element Python beyond the scan loop, whose
   length is bounded by the local skyline size.

2. **Global prune** — the pruned union (skyline-sized, small for
   correlated dimensions; this is the quantity every distributed
   skyline algorithm bets on) is broadcast and anti-joined against
   itself on the dominance predicate: a survivor is a row no other
   survivor dominates.  |S|² comparisons, distributed, no driver
   collect.

The result is a SET — unique regardless of partitioning, batch
boundaries or visit order — so the operator is deterministic by
construction and oracle-gateable with a ``NOT EXISTS`` twin
(independent formulation).  Duplicated criterion vectors survive
together (neither strictly dominates).

All-integer criteria keep the gate engine-portable; nothing here
requires it (doubles work), but the gated query uses exact longs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sfs_mask(X: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the skyline of ``X`` (rows = points,
    maximize all columns) via the SFS scan."""
    n = len(X)
    keep = np.zeros(n, dtype=bool)
    order = np.argsort(-X.sum(axis=1), kind="stable")
    kept: list[np.ndarray] = []
    kmat = np.empty((0, X.shape[1]), dtype=X.dtype)
    for idx in order:
        x = X[idx]
        if len(kept) != len(kmat):
            kmat = np.asarray(kept)
        if len(kmat) and bool(
            ((kmat >= x).all(axis=1) & (kmat > x).any(axis=1)).any()
        ):
            continue
        kept.append(x)
        keep[idx] = True
    return keep


def skyline(df: DataFrame, dims: list[str]) -> DataFrame:
    """Rows of ``df`` not dominated on the ``dims`` columns (all
    maximized; negate a column to minimize it).  Returns ``df``'s full
    schema, filtered."""
    if not dims:
        raise ValueError("skyline needs at least one dimension")
    schema = df.schema

    def _local(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pdf[_sfs_mask(pdf[dims].to_numpy())]

    loc = df.mapInPandas(_local, schema=schema)
    l, r = loc.alias("l"), loc.alias("r")
    ge = [F.col(f"r.{d}") >= F.col(f"l.{d}") for d in dims]
    gt = [F.col(f"r.{d}") > F.col(f"l.{d}") for d in dims]
    dominates = ge[0]
    for c in ge[1:]:
        dominates = dominates & c
    strictly = gt[0]
    for c in gt[1:]:
        strictly = strictly | c
    return l.join(F.broadcast(r), dominates & strictly, "left_anti")
