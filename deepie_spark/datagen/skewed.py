"""Deterministic Zipf-skewed domain synthesis (north-rule skew case).

Hot domains / head entities concentrate join and aggregation work on a
handful of keys; the north rule requires the engine to handle that with
explicit salting + AQE.  This module derives a Zipf-distributed
``domain`` column from any integer id — pure column expressions, no
RNG, reproducible across engines and partitionings — so skew defenses
can be *measured* on a corpus whose key distribution is pathological by
construction (SURVEY.md §7.4 risk 6: "validated with a skewed synthetic
distribution (Zipf domains) in the generator").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_U_MOD = 1_000_003  # prime; uniform grid for the inverse-CDF draw


def zipf_cumulative(n_domains: int, s: float) -> list[float]:
    """Normalized cumulative Zipf weights: P(k) ∝ 1/(k+1)^s, k=0..n-1."""
    w = [1.0 / (k + 1) ** s for k in range(n_domains)]
    total = sum(w)
    cum, acc = [], 0.0
    for x in w:
        acc += x / total
        cum.append(acc)
    return cum


def zipf_domain(
    id_col: Column, n_domains: int = 64, s: float = 2.0
) -> Column:
    """id → 'd{k}' with k Zipf-distributed (k=0 is the hot head).

    Inverse-CDF over a hash-derived uniform draw, evaluated as an
    in-row array scan over the ``n_domains`` cumulative weights — JVM
    column expressions only, deterministic per id.  With s=2.0 and 64
    domains, d0 carries ~61% of rows — a single hot key that breaks a
    naive shuffle join.
    """
    cum = zipf_cumulative(n_domains, s)
    u = F.pmod(F.xxhash64(id_col), F.lit(_U_MOD)).cast("double") / _U_MOD
    cum_arr = F.array(*[F.lit(c) for c in cum])
    idx = F.size(F.filter(cum_arr, lambda c: c < u))
    return F.concat(F.lit("d"), idx.cast("string"))
