"""Model-zoo (M1–M20) and trainer tests.

Each kernel is checked against an independent naive implementation
(explicit loops) on small random inputs — the zoo's vectorized numpy must
reproduce the cited recurrence/convolution semantics, not merely run.
"""

import numpy as np
import pytest

from deepie_spark.model import zoo
from deepie_spark.model.train import (
    predict_loglinear,
    score_py,
    train_loglinear,
)

RNG = np.random.RandomState(1234)


def rand(*shape, scale=0.5):
    return (RNG.randn(*shape) * scale).astype(np.float64)


# ---------------------------------------------------------------------------
# M1/M2

def test_embed_concat_gather_and_pad_row():
    W1 = rand(5, 3)
    W1[0] = 0.0  # pad row
    W2 = rand(4, 2)
    W2[0] = 0.0
    ids1 = np.array([[1, 2, 0], [3, 0, 0]])
    ids2 = np.array([[2, 1, 0], [1, 0, 0]])
    out = zoo.embed_concat([ids1, ids2], [W1, W2])
    assert out.shape == (2, 3, 5)
    assert np.allclose(out[0, 0, :3], W1[1])
    assert np.allclose(out[0, 0, 3:], W2[2])
    assert np.allclose(out[0, 2], 0.0)  # pad position is all-zero


def test_outer_rep():
    a, b = rand(2, 3, 4), rand(2, 3, 5)
    out = zoo.outer_rep(a, b)
    assert out.shape == (2, 3, 20)
    assert np.allclose(out[1, 2], np.outer(a[1, 2], b[1, 2]).ravel())


# ---------------------------------------------------------------------------
# M3/M4/M5 — recurrences vs naive step-by-step loops

def test_rnn_ff_matches_naive():
    b, t, d, h = 3, 5, 4, 6
    x, Wx, Wh, bh = rand(b, t, d), rand(d, h), rand(h, h), rand(h)
    got = zoo.rnn_ff(x, Wx, Wh, bh)
    prev = np.zeros((b, h))
    for i in range(t):
        prev = 1 / (1 + np.exp(-(x[:, i] @ Wx + prev @ Wh + bh)))
        assert np.allclose(got[:, i], prev)


def test_rnn_gru_matches_naive():
    b, t, d, h = 2, 4, 3, 5
    x = rand(b, t, d)
    Wc, bc = rand(d, 2 * h), rand(2 * h)
    U = rand(h, 2 * h)
    Wx, Ux, bx = rand(d, h), rand(h, h), rand(h)
    got = zoo.rnn_gru(x, Wc, bc, U, Wx, Ux, bx)
    prev = np.zeros((b, h))
    for i in range(t):
        pre = prev @ U + x[:, i] @ Wc + bc
        r = 1 / (1 + np.exp(-pre[:, :h]))
        u = 1 / (1 + np.exp(-pre[:, h:]))
        hbar = np.tanh((prev @ Ux) * r + x[:, i] @ Wx + bx)
        prev = u * prev + (1 - u) * hbar
        assert np.allclose(got[:, i], prev)


def test_bidirectional_concat_and_reversal():
    b, t, d, h = 2, 4, 3, 5
    x = rand(b, t, d)
    fwd = (rand(d, h), rand(h, h), rand(h))
    bwd = (rand(d, h), rand(h, h), rand(h))
    out = zoo.bidirectional(x, fwd, bwd, cell=zoo.rnn_ff)
    assert out.shape == (b, t, 2 * h)
    assert np.allclose(out[:, :, :h], zoo.rnn_ff(x, *fwd))
    # backward half: run on reversed input, re-reversed in time
    back = zoo.rnn_ff(x[:, ::-1], *bwd)[:, ::-1]
    assert np.allclose(out[:, :, h:], back)


# ---------------------------------------------------------------------------
# M6/M7 — convolutions vs naive loops

def naive_conv_valid(x, W):
    """Theano conv2d semantics: correlation with doubly-flipped filters."""
    b, t, d = x.shape
    maps, window, dim = W.shape
    out_t = t - window + 1
    out = np.zeros((b, out_t, maps))
    Wf = W[:, ::-1, ::-1]
    for bi in range(b):
        for ti in range(out_t):
            for m in range(maps):
                out[bi, ti, m] = (x[bi, ti : ti + window] * Wf[m]).sum()
    return out


@pytest.mark.parametrize("window", [2, 3, 4])
def test_conv_same_tanh_matches_naive(window):
    b, t, d, maps = 2, 7, 3, 4
    x, W, bb = rand(b, t, d), rand(maps, window, d), rand(maps)
    got = zoo.conv_same_tanh(x, W, bb)
    assert got.shape == (b, t, maps)
    down = window // 2
    up = window - down - 1
    xp = np.concatenate(
        [np.zeros((b, up, d)), x, np.zeros((b, down, d))], axis=1
    )
    want = np.tanh(naive_conv_valid(xp, W) + bb)
    assert np.allclose(got, want)


@pytest.mark.parametrize("window", [2, 3, 5])
def test_conv_maxpool_matches_naive(window):
    b, t, d, maps = 3, 8, 4, 5
    x, W, bb = rand(b, t, d), rand(maps, window, d), rand(maps)
    got = zoo.conv_maxpool(x, W, bb)
    want = np.tanh(naive_conv_valid(x, W) + bb).max(axis=1)
    assert got.shape == (b, maps)
    assert np.allclose(got, want)


def test_multi_window_conv_concat():
    x = rand(2, 9, 3)
    filters = [(rand(4, w, 3), rand(4)) for w in (2, 3, 4, 5)]
    pooled = zoo.multi_window_conv(x, filters, pool=True)
    assert pooled.shape == (2, 16)
    seq = zoo.multi_window_conv(x, filters, pool=False)
    assert seq.shape == (2, 9, 16)


# ---------------------------------------------------------------------------
# M8–M15

def test_mlp_and_dropout_scale():
    x = rand(3, 4)
    layers = [(rand(4, 6), rand(6)), (rand(6, 2), rand(2))]
    out = zoo.mlp(x, layers)
    assert out.shape == (3, 2)
    assert ((out > 0) & (out < 1)).all()  # sigmoid range
    W = rand(4, 4)
    assert np.allclose(zoo.dropout_scale(W, 0.25), 0.75 * W)


def test_pooling_heads():
    h = rand(3, 6, 4)
    pos1 = np.array([0, 2, 5])
    pos2 = np.array([3, 4, 1])
    hp = zoo.head_pool(h, pos1, pos2)
    assert hp.shape == (3, 8)
    assert np.allclose(hp[1, :4], h[1, 2])
    assert np.allclose(hp[1, 4:], h[1, 4])
    assert np.allclose(zoo.max_pool(h), h.max(axis=1))
    assert np.allclose(zoo.mean_pool(h), h.mean(axis=1))
    mask = (RNG.rand(3, 6) > 0.5).astype(float)
    ms = zoo.masked_sum_pool(h, mask)
    assert np.allclose(ms[0], (h[0] * mask[0][:, None]).sum(axis=0))


def test_attention_pool_is_convex_combination():
    h = rand(2, 5, 3)
    IW, Ib = rand(3, 1), rand(1)
    out = zoo.attention_pool(h, IW, Ib)
    assert out.shape == (2, 3)
    # output lies inside the convex hull per dim: between min and max
    assert (out <= h.max(axis=1) + 1e-12).all()
    assert (out >= h.min(axis=1) - 1e-12).all()


def test_dynamic_pool3_segments():
    h = rand(1, 6, 2)
    pos1, pos2 = np.array([1]), np.array([4])
    out = zoo.dynamic_pool3(h, pos1, pos2)[0]
    # segment maxes clamp at 0: the reference pools a zeroed full-length
    # copy with only the segment filled (rnnReModels.py:1509-1569)
    segs = [
        np.maximum(h[0, :1].max(0), 0),      # before
        h[0, 1],                             # [pos1] (unclamped gather)
        np.maximum(h[0, 2:4].max(0), 0),     # between
        h[0, 4],                             # [pos2]
        np.maximum(h[0, 5:].max(0), 0),      # after
    ]
    assert np.allclose(out, np.concatenate(segs))
    # empty segments (adjacent heads at the edges) pool to zero
    out2 = zoo.dynamic_pool3(h, np.array([0]), np.array([5]))[0]
    assert np.allclose(out2[:2], 0.0)
    assert np.allclose(out2[-2:], 0.0)


# ---------------------------------------------------------------------------
# M17–M20

def test_softmax_classifier_and_argmax():
    f, W, b = rand(4, 3), rand(3, 5), rand(5)
    p = zoo.softmax_classifier(f, W, b)
    assert np.allclose(p.sum(axis=1), 1.0)
    assert np.allclose(zoo.argmax_decode(p), (f @ W + b).argmax(axis=1))


def test_sparse_loglinear_logits():
    W, b = rand(6, 3), rand(3)
    rows = np.array(
        [
            [2, 1, 4, -1, -1],
            [0, -1, -1, -1, -1],
            [3, 0, 2, 5, -1],
        ]
    )
    out = zoo.sparse_loglinear_logits(rows, W, b)
    assert np.allclose(out[0], W[1] + W[4] + b)
    assert np.allclose(out[1], b)
    assert np.allclose(out[2], W[0] + W[2] + W[5] + b)


def test_product_of_experts():
    l1, l2 = rand(3, 4), rand(3, 4)
    p = zoo.product_of_experts(l1, l2)
    assert np.allclose(p, zoo.softmax(l1 + l2, axis=-1))
    assert np.allclose(p.sum(axis=1), 1.0)


# ---------------------------------------------------------------------------
# trainer (driver-side M18 fit) + scorer twin

def test_train_loglinear_fits_separable_data():
    """Feature id == class id: a trivially separable sparse problem the
    log-linear expert must learn perfectly."""
    n, n_classes = 200, 4
    labels = RNG.randint(0, n_classes, n)
    rows = np.full((n, 3), -1, dtype=np.int64)
    rows[:, 0] = 1
    rows[:, 1] = labels  # single feature identifying the class
    w = train_loglinear(rows, labels, n_classes, n_features=n_classes)
    pred, p = predict_loglinear(rows, w)
    assert (pred == labels).all()
    assert np.allclose(p.sum(axis=1), 1.0)


def test_alternate_stacks_shapes_and_composition():
    b, t, d = 2, 7, 3
    x = rand(b, t, d)
    filters = [(rand(4, w, d), rand(4)) for w in (2, 3)]  # 8 maps total
    hid = 5
    def gru_params(in_dim):
        return (
            rand(in_dim, 2 * hid), rand(2 * hid), rand(hid, 2 * hid),
            rand(in_dim, hid), rand(hid, hid), rand(hid),
        )
    gf, gb = gru_params(8), gru_params(8)
    pos1, pos2 = np.array([0, 3]), np.array([6, 5])
    out = zoo.alternate_head(x, filters, gf, gb, pos1, pos2)
    assert out.shape == (b, 4 * hid)  # biGRU(2h) heads concat
    # composition check: equals manual stage chaining
    h = zoo.multi_window_conv(x, filters, pool=False)
    h = zoo.bidirectional(h, gf, gb, cell=zoo.rnn_gru)
    assert np.allclose(out, zoo.head_pool(h, pos1, pos2))
    assert zoo.alternate_max(x, filters, gf, gb).shape == (b, 2 * hid)
    gf3, gb3 = gru_params(d), gru_params(d)
    filters10 = [(rand(6, w, 2 * hid), rand(6)) for w in (2, 3, 4)]
    assert zoo.alternate_conv(x, gf3, gb3, filters10).shape == (b, 18)


def test_model_registry_dispatch():
    assert zoo.resolve_model("rnnMaxIn") is zoo.max_pool
    assert zoo.resolve_model("alternateHead") is zoo.alternate_head
    with pytest.raises(KeyError, match="unknown model"):
        zoo.resolve_model("notAModel")


def test_score_py_reference_semantics():
    # pred/gold with id 0 = NONE: P over predicted-nonzero, R over gold-nonzero
    pred = np.array([1, 2, 0, 3, 1, 0])
    gold = np.array([1, 0, 2, 3, 2, 0])
    p, r, f1 = score_py(pred, gold)
    # num_pred=4, num_key=4, correct=2
    assert p == pytest.approx(50.0)
    assert r == pytest.approx(50.0)
    assert f1 == pytest.approx(50.0)
    assert score_py(np.zeros(3, int), np.zeros(3, int)) == (0.0, 0.0, 0.0)
