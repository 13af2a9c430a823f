"""Scalar quantization codes (operators/quantize.py): range/clamp
invariants, a numpy twin, and the reconstruction-error bound that
makes SQ8 usable as an ANN pre-filter."""

import numpy as np
import pytest

from deepie_spark.operators.quantize import scalar_quantize


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


def test_scalar_quantize_numpy_twin_and_bounds(spark):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(40, 6)).astype(np.float32)
    out = scalar_quantize(_emb_df(spark, mat)).collect()
    assert len(out) == 40 * 6
    codes = {(r.vec_id, r.dim): r.code for r in out}
    lo = mat.astype(np.float64).min(axis=0)
    hi = mat.astype(np.float64).max(axis=0)
    for (vid, dim), code in codes.items():
        x = np.float64(mat[vid, dim])
        expect = int(min(255, np.floor((x - lo[dim]) / (hi[dim] - lo[dim]) * 256.0)))
        assert code == expect
        assert 0 <= code <= 255
        # dequantized midpoint error is bounded by one cell width
        deq = lo[dim] + (code + 0.5) / 256.0 * (hi[dim] - lo[dim])
        assert abs(deq - x) <= (hi[dim] - lo[dim]) / 256.0


def test_scalar_quantize_extremes_and_constant_dim(spark):
    mat = [[0.0, 7.5], [1.0, 7.5], [0.5, 7.5]]
    out = {(r.vec_id, r.dim): r.code
           for r in scalar_quantize(_emb_df(spark, mat)).collect()}
    assert out[(0, 0)] == 0       # x == lo → 0
    assert out[(1, 0)] == 255     # x == hi → clamped top code
    assert out[(2, 0)] == 128
    # constant dimension codes to 0 everywhere
    assert out[(0, 1)] == out[(1, 1)] == out[(2, 1)] == 0


def test_scalar_quantize_levels_guard(spark):
    with pytest.raises(ValueError, match="levels"):
        scalar_quantize(_emb_df(spark, [[0.0]]), levels=1)
